"""SLat decoders: per-voxel 3D Gaussians and SDF-grid mesh extraction.

Parity targets: TRELLIS's SLat decoders (`trellis_image_to_3d.py:199-218`):
  * Gaussian decoder — each active voxel emits K Gaussians (offsets,
    scales, rotations, opacity, color) rendered by the splat rasterizer;
  * mesh decoder — FlexiCubes in the reference; here per-voxel SDF corner
    offsets scattered into a dense grid and extracted with
    `ops.marching_cubes` (same role: latent -> watertight surface).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class GaussianSet(NamedTuple):
    means: jnp.ndarray       # (N*K, 3) in [0, 1]^3 object space
    scales: jnp.ndarray      # (N*K, 3)
    rotations: jnp.ndarray   # (N*K, 4) wxyz
    opacities: jnp.ndarray   # (N*K,)
    colors: jnp.ndarray      # (N*K, 3)
    valid: jnp.ndarray       # (N*K,)


@dataclasses.dataclass(frozen=True)
class GaussianDecoderConfig:
    latent_channels: int = 8
    gaussians_per_voxel: int = 4
    grid_size: int = 64
    hidden: int = 64
    max_scale_voxels: float = 2.0   # gaussian scale cap in voxel units
    dtype: Any = jnp.float32


class SLatGaussianDecoder(nn.Module):
    cfg: GaussianDecoderConfig

    @nn.compact
    def __call__(self, feats, coords, valid) -> GaussianSet:
        cfg = self.cfg
        k = cfg.gaussians_per_voxel
        h = nn.Dense(cfg.hidden, dtype=cfg.dtype, name="fc1")(feats)
        h = nn.gelu(h)
        h = nn.Dense(cfg.hidden, dtype=cfg.dtype, name="fc2")(h)
        h = nn.gelu(h)
        out = nn.Dense(k * 14, dtype=cfg.dtype, name="head")(h)  # 3+3+4+1+3
        n = feats.shape[0]
        out = out.reshape(n, k, 14)

        voxel = 1.0 / cfg.grid_size
        centers = (coords.astype(jnp.float32) + 0.5) * voxel
        offsets = jnp.tanh(out[..., 0:3]) * voxel  # within +-1 voxel
        means = centers[:, None, :] + offsets
        scales = jax.nn.sigmoid(out[..., 3:6]) * (cfg.max_scale_voxels * voxel)
        rotations = out[..., 6:10] + jnp.array([1.0, 0, 0, 0])
        opacities = jax.nn.sigmoid(out[..., 10])
        colors = jax.nn.sigmoid(out[..., 11:14])
        vmask = jnp.repeat(valid, k)
        return GaussianSet(
            means=means.reshape(-1, 3),
            scales=scales.reshape(-1, 3),
            rotations=rotations.reshape(-1, 4),
            opacities=jnp.where(vmask, opacities.reshape(-1), 0.0),
            colors=colors.reshape(-1, 3),
            valid=vmask,
        )


@dataclasses.dataclass(frozen=True)
class MeshDecoderConfig:
    latent_channels: int = 8
    grid_size: int = 64
    hidden: int = 64
    dtype: Any = jnp.float32


class SLatMeshDecoder(nn.Module):
    """Per-voxel SDF prediction -> dense grid -> iso-surface.

    Produces a (G+1)^3 SDF whose default is +1 (outside); each active voxel
    writes its predicted corner SDF offsets. Marching-tetrahedra extraction
    happens outside (host/compile-time static shapes).
    """

    cfg: MeshDecoderConfig

    @nn.compact
    def __call__(self, feats, coords, valid) -> jnp.ndarray:
        cfg = self.cfg
        h = nn.Dense(cfg.hidden, dtype=cfg.dtype, name="fc1")(feats)
        h = nn.gelu(h)
        corner_sdf = nn.Dense(8, dtype=cfg.dtype, name="head")(h)
        corner_sdf = jnp.tanh(corner_sdf)  # in (-1, 1)

        g = cfg.grid_size + 1
        grid = jnp.full((g, g, g), 1.0, jnp.float32)
        counts = jnp.zeros((g, g, g), jnp.float32)
        corners = jnp.asarray(
            [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
             [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], jnp.int32
        )
        base = jnp.where(valid[:, None], coords, g)  # invalid -> dropped
        acc = jnp.zeros((g, g, g), jnp.float32)
        for c in range(8):
            pos = base + corners[c]
            acc = acc.at[pos[:, 0], pos[:, 1], pos[:, 2]].add(
                corner_sdf[:, c], mode="drop"
            )
            counts = counts.at[pos[:, 0], pos[:, 1], pos[:, 2]].add(1.0, mode="drop")
        written = counts > 0
        grid = jnp.where(written, acc / jnp.maximum(counts, 1.0), grid)
        return grid
