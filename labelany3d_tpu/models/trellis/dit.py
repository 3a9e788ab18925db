"""DiT blocks for the image->3D flow models (dense 3D and sparse voxel).

Parity targets in the reference tree: TRELLIS's `SparseStructureFlowModel`
and `SLatFlowModel` transformer blocks — adaLN-zero timestep modulation,
self-attention (dense, or serialized/windowed over sparse voxels) and
cross-attention to DINOv2 image tokens.

TPU-first: fused SDPA everywhere; the sparse attention modes come from
`labelany3d_tpu.ops.attention` (static-slot replacements for varlen
flash-attn); all modulation math fuses into the surrounding matmuls.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from labelany3d_tpu.ops.attention import serialized_attention, windowed_attention_3d


@dataclasses.dataclass(frozen=True)
class DiTConfig:
    width: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    cond_dim: int = 1024           # image-conditioning token dim
    dtype: Any = jnp.bfloat16
    # sparse-attention schedule: mode per block cycles through this list
    sparse_modes: tuple = ("serialized", "serialized", "windowed")
    serialized_window: int = 512
    spatial_window: int = 8
    grid_size: int = 64

    @staticmethod
    def tiny_test(**kw) -> "DiTConfig":
        return DiTConfig(width=32, depth=2, num_heads=2, cond_dim=16, **kw)


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal timestep embedding (DiT convention); t in [0, 1]."""
    half = dim // 2
    freqs = jnp.exp(-jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t[..., None].astype(jnp.float32) * freqs * 1000.0
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class AdaLNModulation(nn.Module):
    width: int
    n_chunks: int
    dtype: Any

    @nn.compact
    def __call__(self, cond_vec):
        h = nn.silu(cond_vec)
        out = nn.Dense(
            self.n_chunks * self.width, dtype=jnp.float32,
            kernel_init=nn.initializers.zeros, name="mod",
        )(h)
        return jnp.split(out, self.n_chunks, axis=-1)


class _Attention(nn.Module):
    cfg: DiTConfig

    @nn.compact
    def __call__(self, x, kv=None, sparse=None):
        cfg = self.cfg
        hd = cfg.width // cfg.num_heads
        kv_in = x if kv is None else kv
        q = nn.Dense(cfg.width, dtype=cfg.dtype, name="q")(x)
        k = nn.Dense(cfg.width, dtype=cfg.dtype, name="k")(kv_in)
        v = nn.Dense(cfg.width, dtype=cfg.dtype, name="v")(kv_in)

        def heads(tr):
            return tr.reshape(tr.shape[:-1] + (cfg.num_heads, hd))

        qh, kh, vh = heads(q), heads(k), heads(v)
        if sparse is None:
            # dense path (sparse-structure flow, cross-attention to cond
            # tokens): VMEM-resident flash kernel on TPU, XLA sdpa elsewhere.
            from labelany3d_tpu.ops.attention import flash_sdpa

            out = flash_sdpa(qh, kh, vh)
        else:
            # coords (B, N, 3) / valid (B, N): each batch element carries its
            # own slot layout; vmap maps attention over them jointly.
            mode, coords, valid, shift = sparse

            def one(qv, kvv, vvv, cv, vv):
                if mode == "serialized":
                    return serialized_attention(
                        qv, kvv, vvv, cv, vv,
                        window_size=cfg.serialized_window, shift=shift,
                    )
                return windowed_attention_3d(
                    qv, kvv, vvv, cv, vv,
                    grid_size=cfg.grid_size, window_size=cfg.spatial_window,
                    shift=shift,
                )

            out = jax.vmap(one)(qh, kh, vh, coords, valid)
        out = out.reshape(x.shape[:-1] + (cfg.width,))
        return nn.Dense(cfg.width, dtype=cfg.dtype, name="proj")(out)


class DiTBlock(nn.Module):
    """adaLN-zero block: modulated self-attn, cross-attn to cond, MLP."""

    cfg: DiTConfig

    @nn.compact
    def __call__(self, x, cond_vec, cond_tokens=None, sparse=None):
        cfg = self.cfg
        mods = AdaLNModulation(cfg.width, 6, cfg.dtype, name="adaln")(cond_vec)
        shift_sa, scale_sa, gate_sa, shift_mlp, scale_mlp, gate_mlp = mods

        def mod(h, shift, scale):
            return h * (1 + scale[..., None, :]) + shift[..., None, :]

        h = nn.LayerNorm(use_bias=False, use_scale=False, dtype=jnp.float32, name="norm1")(x)
        h = mod(h, shift_sa, scale_sa).astype(cfg.dtype)
        x = x + gate_sa[..., None, :] * _Attention(cfg, name="self_attn")(h, sparse=sparse)

        if cond_tokens is not None:
            h = nn.LayerNorm(dtype=jnp.float32, name="norm_cross")(x).astype(cfg.dtype)
            ct = nn.Dense(cfg.width, dtype=cfg.dtype, name="cond_proj")(cond_tokens)
            x = x + _Attention(cfg, name="cross_attn")(h, kv=ct)

        h = nn.LayerNorm(use_bias=False, use_scale=False, dtype=jnp.float32, name="norm2")(x)
        h = mod(h, shift_mlp, scale_mlp).astype(cfg.dtype)
        h = nn.Dense(int(cfg.width * cfg.mlp_ratio), dtype=cfg.dtype, name="fc1")(h)
        h = nn.gelu(h, approximate=True)
        h = nn.Dense(cfg.width, dtype=cfg.dtype, name="fc2")(h)
        return x + gate_mlp[..., None, :] * h


class DenseDiT3D(nn.Module):
    """DiT over a dense (B, N_tokens, C_in) token field (16^3 latent)."""

    cfg: DiTConfig
    in_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, tokens, t, cond_tokens):
        cfg = self.cfg
        x = nn.Dense(cfg.width, dtype=cfg.dtype, name="in_proj")(tokens)
        n = x.shape[-2]
        pos = self.param("pos_embed", nn.initializers.normal(0.02), (1, n, cfg.width))
        x = x + pos.astype(cfg.dtype)
        temb = timestep_embedding(t, cfg.width)
        cond_vec = nn.Dense(cfg.width, dtype=jnp.float32, name="t_proj")(temb)
        for i in range(cfg.depth):
            x = DiTBlock(cfg, name=f"block{i}")(x, cond_vec, cond_tokens)
        x = nn.LayerNorm(dtype=jnp.float32, name="norm_out")(x)
        return nn.Dense(
            self.out_channels, dtype=jnp.float32,
            kernel_init=nn.initializers.zeros, name="out_proj",
        )(x.astype(jnp.float32))


class SparseDiT(nn.Module):
    """DiT over sparse voxel slots (B, N_slots, C_in) with coords/valid.

    Attention mode cycles per block through cfg.sparse_modes with a
    sequence shift every other serialized block (TRELLIS's layer schedule
    shape, `serialized_attn.py` shift rotation).
    """

    cfg: DiTConfig
    in_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, feats, coords, valid, t, cond_tokens):
        cfg = self.cfg
        x = nn.Dense(cfg.width, dtype=cfg.dtype, name="in_proj")(feats)
        # Positional encoding from voxel coordinates (sinusoidal per axis).
        third = cfg.width // 3
        pe = []
        for axis in range(3):
            pe.append(timestep_embedding(coords[..., axis].astype(jnp.float32) / cfg.grid_size,
                                         third))
        pe = jnp.concatenate(pe, axis=-1)
        pe = jnp.pad(pe, ((0, 0),) * (pe.ndim - 1) + ((0, cfg.width - pe.shape[-1]),))
        x = x + pe.astype(cfg.dtype)

        temb = timestep_embedding(t, cfg.width)
        cond_vec = nn.Dense(cfg.width, dtype=jnp.float32, name="t_proj")(temb)

        def batch_block(i):
            mode = cfg.sparse_modes[i % len(cfg.sparse_modes)]
            shift = (cfg.serialized_window // 2) if (mode == "serialized" and i % 2 == 1) else 0
            return mode, shift

        # Per-element slot layouts: broadcast unbatched coords/valid to the
        # feats batch so each element attends within its own voxel set.
        b = x.shape[0]
        coords_b = coords if coords.ndim == 3 else jnp.broadcast_to(coords, (b, *coords.shape))
        valid_b = valid if valid.ndim == 2 else jnp.broadcast_to(valid, (b, *valid.shape))
        for i in range(cfg.depth):
            mode, shift = batch_block(i)
            sparse = (mode, coords_b, valid_b, shift)
            x = DiTBlock(cfg, name=f"block{i}")(x, cond_vec, cond_tokens, sparse=sparse)
        x = nn.LayerNorm(dtype=jnp.float32, name="norm_out")(x)
        return nn.Dense(
            self.out_channels, dtype=jnp.float32,
            kernel_init=nn.initializers.zeros, name="out_proj",
        )(x.astype(jnp.float32))
