"""Sparse-structure flow model: image -> 16^3 latent -> 64^3 occupancy.

Checkpoint-faithful to TRELLIS (`trellis/models/sparse_structure_flow.py:
55-200` and the VAE decoder `trellis/models/sparse_structure_vae.py:
209-290`): a DiT flow model generates a 16^3 x 8 structure latent
conditioned on DINOv2 image tokens; a conv decoder (res blocks +
pixel-shuffle upsamples) expands it to 64^3 occupancy logits. Released
`TRELLIS-image-large` weights load via
`models/convert_trellis.py::{convert_trellis_ss_flow,convert_trellis_ss_decoder}`.

TPU-native departures: the latent rides as (B, R^3, C) row-major tokens
(fused flash SDPA); the conv decoder is NDHWC (XLA conv_general);
`decode_occupancy` replaces `torch.argwhere` (`trellis_image_to_3d.py:
190-196`) with fixed-slot top-K so downstream shapes stay static.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from labelany3d_tpu.models.trellis.dit import (
    DiTConfig,
    TimestepEmbedder,
    AdaLNModulation,
    DiTBlock,
    ape_3d,
)


@dataclasses.dataclass(frozen=True)
class SparseStructureConfig:
    """SS flow-model hyperparameters (ss_flow_img_dit_L_16l8_fp16 shapes)."""

    latent_res: int = 16
    latent_channels: int = 8
    out_channels: int = 8
    patch_size: int = 1
    grid_size: int = 64
    dit: DiTConfig = dataclasses.field(
        default_factory=lambda: DiTConfig(qk_rms_norm=True))
    dtype: Any = jnp.bfloat16

    @staticmethod
    def tiny_test() -> "SparseStructureConfig":
        return SparseStructureConfig(
            latent_res=4, latent_channels=4, out_channels=4, grid_size=16,
            dit=DiTConfig.tiny_test(),
        )


def patchify_tokens(latent: jnp.ndarray, res: int, p: int) -> jnp.ndarray:
    """(B, R^3, C) row-major latent tokens -> (B, (R/p)^3, C*p^3) patches.

    Feature layout [c, px, py, pz] and token order row-major over the
    coarse grid — matching `modules/spatial.py::patchify` + the
    view/permute at `sparse_structure_flow.py:180-181`.
    """
    b, _, c = latent.shape
    h = res // p
    x = latent.reshape(b, h, p, h, p, h, p, c)
    x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6)  # b, hx, hy, hz, c, px, py, pz
    return x.reshape(b, h * h * h, c * p**3)


def unpatchify_tokens(tokens: jnp.ndarray, res: int, p: int, out_ch: int) -> jnp.ndarray:
    """Inverse of `patchify_tokens`: -> (B, R^3, out_ch) row-major."""
    b = tokens.shape[0]
    h = res // p
    x = tokens.reshape(b, h, h, h, out_ch, p, p, p)
    x = x.transpose(0, 1, 5, 2, 6, 3, 7, 4)  # b, hx, px, hy, py, hz, pz, c
    return x.reshape(b, res * res * res, out_ch)


class SparseStructureFlowModel(nn.Module):
    """Velocity field over the structure latent.

    Input latent (B, R^3, C) row-major (x, y, z), t already scaled by 1000
    (reference `FlowEulerSampler._inference_model`), cond (B, M, D).
    """

    cfg: SparseStructureConfig

    @nn.compact
    def __call__(self, latent: jnp.ndarray, t: jnp.ndarray, cond_tokens: jnp.ndarray):
        cfg = self.cfg
        dit = cfg.dit
        p = cfg.patch_size
        h_res = cfg.latent_res // p

        x = patchify_tokens(latent, cfg.latent_res, p)
        x = nn.Dense(dit.width, dtype=dit.dtype, name="input_layer")(x)

        # Computed sinusoidal APE over the coarse token grid (the reference
        # registers this as a buffer; identical values, nothing to convert).
        g = jnp.arange(h_res)
        gx, gy, gz = jnp.meshgrid(g, g, g, indexing="ij")
        coords = jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
        x = x + ape_3d(coords, dit.width)[None].astype(dit.dtype)

        t_emb = TimestepEmbedder(dit.width, name="t_embedder")(t)
        mods = None
        if dit.share_mod:
            mods = AdaLNModulation(dit.width, name="adaln")(t_emb)
        cond_tokens = cond_tokens.astype(dit.dtype)
        for i in range(dit.depth):
            x = DiTBlock(dit, name=f"block{i}")(
                x, t_emb=t_emb, cond_tokens=cond_tokens, mods=mods)
        x = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-5,
                         dtype=jnp.float32, name="norm_out")(x)
        x = nn.Dense(cfg.out_channels * p**3, dtype=jnp.float32,
                     kernel_init=nn.initializers.zeros, name="out_layer")(x)
        return unpatchify_tokens(x, cfg.latent_res, p, cfg.out_channels)


# ---------------------------------------------------------------------------
# Sparse-structure VAE decoder (16^3 latent -> 64^3 occupancy logits)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SSDecoderConfig:
    """`SparseStructureDecoder` shapes (ss_dec_conv3d_16l8 defaults)."""

    latent_channels: int = 8
    out_channels: int = 1
    channels: Sequence[int] = (512, 128, 32)
    num_res_blocks: int = 2
    num_res_blocks_middle: int = 2
    norm_type: str = "layer"        # 'layer' (ChannelLayerNorm32) | 'group'
    dtype: Any = jnp.bfloat16

    @staticmethod
    def tiny_test() -> "SSDecoderConfig":
        return SSDecoderConfig(latent_channels=4, channels=(16, 8, 8),
                               num_res_blocks=1, num_res_blocks_middle=1)


def _norm(cfg: SSDecoderConfig, name: str):
    if cfg.norm_type == "layer":
        # ChannelLayerNorm32 == LayerNorm over channels; NDHWC -> last axis.
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name=name)
    return nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.float32, name=name)


class ResBlock3d(nn.Module):
    """`sparse_structure_vae.py:22-47`: norm-silu-conv3 x2 + (1x1) skip."""

    cfg: SSDecoderConfig
    channels: int
    out_channels: int

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        h = _norm(cfg, "norm1")(x)
        h = nn.silu(h).astype(cfg.dtype)
        h = nn.Conv(self.out_channels, (3, 3, 3), dtype=cfg.dtype, name="conv1")(h)
        h = _norm(cfg, "norm2")(h)
        h = nn.silu(h).astype(cfg.dtype)
        h = nn.Conv(self.out_channels, (3, 3, 3), dtype=cfg.dtype,
                    kernel_init=nn.initializers.zeros, name="conv2")(h)
        if self.out_channels != self.channels:
            x = nn.Conv(self.out_channels, (1, 1, 1), dtype=cfg.dtype, name="skip")(x)
        return h + x


def pixel_shuffle_3d(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """NDHWC 3D pixel shuffle, channel layout (C_, s, s, s) c-major —
    matching `modules/spatial.py::pixel_shuffle_3d` after NCDHW->NDHWC."""
    b, d, h, w, c = x.shape
    c_ = c // s**3
    x = x.reshape(b, d, h, w, c_, s, s, s)
    x = x.transpose(0, 1, 5, 2, 6, 3, 7, 4)  # b, d, s1, h, s2, w, s3, c_
    return x.reshape(b, d * s, h * s, w * s, c_)


class StructureDecoder(nn.Module):
    """`SparseStructureDecoder` (`sparse_structure_vae.py:209-290`)."""

    cfg: SSDecoderConfig
    latent_res: int = 16

    @nn.compact
    def __call__(self, latent: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        b = latent.shape[0]
        r = self.latent_res
        x = latent.reshape(b, r, r, r, cfg.latent_channels)
        x = nn.Conv(cfg.channels[0], (3, 3, 3), dtype=jnp.float32, name="input_layer")(x)
        x = x.astype(cfg.dtype)
        for m in range(cfg.num_res_blocks_middle):
            x = ResBlock3d(cfg, cfg.channels[0], cfg.channels[0], name=f"middle{m}")(x)
        for i, ch in enumerate(cfg.channels):
            for j in range(cfg.num_res_blocks):
                x = ResBlock3d(cfg, ch, ch, name=f"stage{i}_res{j}")(x)
            if i < len(cfg.channels) - 1:
                nxt = cfg.channels[i + 1]
                x = nn.Conv(nxt * 8, (3, 3, 3), dtype=cfg.dtype, name=f"stage{i}_up")(x)
                x = pixel_shuffle_3d(x, 2)
        x = _norm(cfg, "norm_out")(x.astype(jnp.float32))
        x = nn.silu(x)
        logits = nn.Conv(cfg.out_channels, (3, 3, 3), dtype=jnp.float32,
                         name="out_layer")(x)
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
