"""Sparse-structure flow model: image -> 16^3 latent -> 64^3 occupancy.

Parity target: TRELLIS's `SparseStructureFlowModel` + sparse-structure VAE
decoder (`trellis_image_to_3d.py:164-196`): a DiT flow model generates a
16^3 x C structure latent conditioned on image tokens; a conv decoder
upsamples it to 64^3 occupancy logits whose argwhere gives the active
voxel coordinates.

TPU-native: the latent is flattened to 4096 tokens for the dense DiT (fused
SDPA); the decoder is three stride-2 transposed 3D convs (XLA conv_general);
`decode_occupancy` returns *fixed-slot* coordinates (top-K by logit with a
validity mask) instead of argwhere, keeping downstream shapes static.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from labelany3d_tpu.models.trellis.dit import DenseDiT3D, DiTConfig


@dataclasses.dataclass(frozen=True)
class SparseStructureConfig:
    latent_res: int = 16
    latent_channels: int = 8
    grid_size: int = 64
    decoder_width: int = 32
    dit: DiTConfig = dataclasses.field(default_factory=DiTConfig)
    dtype: Any = jnp.bfloat16

    @staticmethod
    def tiny_test() -> "SparseStructureConfig":
        return SparseStructureConfig(
            latent_res=4, latent_channels=4, grid_size=16, decoder_width=8,
            dit=DiTConfig.tiny_test(),
        )


class SparseStructureFlowModel(nn.Module):
    """Velocity field over the flattened structure latent."""

    cfg: SparseStructureConfig

    @nn.compact
    def __call__(self, latent: jnp.ndarray, t: jnp.ndarray, cond_tokens: jnp.ndarray):
        """latent (B, R^3, C); t (B,); cond_tokens (B, M, D) -> velocity."""
        cfg = self.cfg
        return DenseDiT3D(
            cfg.dit, cfg.latent_channels, cfg.latent_channels, name="dit"
        )(latent, t, cond_tokens)


class StructureDecoder(nn.Module):
    """16^3 latent -> 64^3 occupancy logits (stride-2 conv-transpose x2 +
    trilinear x upsample to the final factor)."""

    cfg: SparseStructureConfig

    @nn.compact
    def __call__(self, latent: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        b = latent.shape[0]
        r = cfg.latent_res
        x = latent.reshape(b, r, r, r, cfg.latent_channels).astype(cfg.dtype)
        w = cfg.decoder_width
        factor = cfg.grid_size // cfg.latent_res
        n_up = max(1, factor.bit_length() - 1)  # log2(factor)
        for i in range(n_up):
            x = nn.ConvTranspose(
                w, (4, 4, 4), strides=(2, 2, 2), dtype=cfg.dtype, name=f"up{i}"
            )(x)
            x = nn.gelu(x, approximate=True)
        x = nn.Conv(w, (3, 3, 3), dtype=cfg.dtype, name="post")(x)
        x = nn.gelu(x, approximate=True)
        logits = nn.Conv(1, (3, 3, 3), dtype=jnp.float32, param_dtype=jnp.float32, name="out")(x)
        return logits[..., 0]  # (B, G, G, G)


def decode_occupancy(
    logits: jnp.ndarray,
    max_voxels: int,
    threshold: float = 0.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Occupancy logits -> fixed-slot voxel coords.

    TPU replacement for `torch.argwhere` (`trellis_image_to_3d.py:190-196`):
    take the top-`max_voxels` cells by logit, valid where above threshold.

    Returns coords (B, max_voxels, 3) int32, valid (B, max_voxels).
    """
    b = logits.shape[0]
    g = logits.shape[1]
    flat = logits.reshape(b, -1)
    top, idx = jax.lax.top_k(flat, max_voxels)
    valid = top > threshold
    z = idx % g
    y = (idx // g) % g
    x = idx // (g * g)
    coords = jnp.stack([x, y, z], axis=-1).astype(jnp.int32)
    return coords, valid
