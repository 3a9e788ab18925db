"""Structured-latent (SLat) flow model over active voxels.

Parity target: TRELLIS's `SLatFlowModel` (`trellis_image_to_3d.py:220-252`):
a sparse DiT generates per-voxel latent features on the active voxel set,
conditioned on DINOv2 image tokens, using serialized/windowed sparse
attention. Fixed voxel-slot arrays replace varlen batching.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from labelany3d_tpu.models.trellis.dit import DiTConfig, SparseDiT


@dataclasses.dataclass(frozen=True)
class SLatConfig:
    latent_channels: int = 8
    grid_size: int = 64
    dit: DiTConfig = dataclasses.field(default_factory=DiTConfig)
    dtype: Any = jnp.bfloat16

    @staticmethod
    def tiny_test() -> "SLatConfig":
        return SLatConfig(
            latent_channels=4, grid_size=16,
            dit=DiTConfig.tiny_test(grid_size=16, serialized_window=64, spatial_window=4),
        )


class SLatFlowModel(nn.Module):
    """Velocity field over per-voxel latents.

    Inputs: feats (B, N, C) latent slots, coords (B, N, 3), valid (B, N),
    t (B,), cond_tokens (B, M, D). Output: (B, N, C) velocity (invalid
    slots' outputs are ignored downstream; masked here for cleanliness).
    """

    cfg: SLatConfig

    @nn.compact
    def __call__(self, feats, coords, valid, t, cond_tokens):
        cfg = self.cfg
        v = SparseDiT(cfg.dit, cfg.latent_channels, cfg.latent_channels, name="dit")(
            feats, coords, valid, t, cond_tokens
        )
        return jnp.where(valid[..., None], v, 0.0)
