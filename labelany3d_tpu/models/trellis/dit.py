"""DiT primitives for the image->3D flow models (dense 3D and sparse voxel).

Checkpoint-faithful to TRELLIS's transformer modules so released weights
convert one-to-one (see `models/convert_trellis.py`):

  * `ModulatedTransformerCrossBlock` (`trellis/modules/transformer/
    modulated.py:78-180`): adaLN-zero self-attention -> plain (affine-LN)
    cross-attention to image tokens -> adaLN-zero MLP;
  * `TransformerBlock` / `SparseTransformerBlock` (`trellis/modules/
    transformer/blocks.py:63-113`, `sparse/transformer/blocks.py:24-80`):
    non-affine pre-LN attention + MLP (the SLat VAE decoders);
  * `MultiHeadAttention` (`trellis/modules/attention/modules.py:65-175`):
    fused qkv self / q+kv cross projections with optional per-head RMS
    q/k norm; here q/k/v are separate Dense modules (the converter splits
    the fused torch weights — numerically identical);
  * `TimestepEmbedder` (`trellis/models/sparse_structure_flow.py:11-52`)
    and `AbsolutePositionEmbedder` (`transformer/blocks.py:8-46`).

TPU-first: dense attention runs the Pallas flash kernel (VMEM-resident
K/V); sparse attention modes come from `labelany3d_tpu.ops.attention`
(static-slot replacements for varlen flash-attn); modulation math fuses
into the surrounding matmuls under XLA.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from labelany3d_tpu.ops.attention import (
    flash_sdpa,
    serialized_attention,
    windowed_attention_3d,
)


@dataclasses.dataclass(frozen=True)
class DiTConfig:
    """Transformer-torso hyperparameters shared by the flow models."""

    width: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    cond_dim: int = 1024           # image-conditioning token dim (DINOv2)
    qk_rms_norm: bool = False      # per-head RMS norm on self-attn q/k
    qk_rms_norm_cross: bool = False
    share_mod: bool = False        # one adaLN modulation shared by all blocks
    dtype: Any = jnp.bfloat16

    @staticmethod
    def tiny_test(**kw) -> "DiTConfig":
        return DiTConfig(width=36, depth=2, num_heads=2, cond_dim=16, **kw)


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal timestep embedding, glide convention ([cos | sin]).

    Parity: `sparse_structure_flow.py:25-47`. `t` is the already-scaled
    timestep (the samplers pass 1000 * t like the reference's
    `FlowEulerSampler._inference_model`).
    """
    half = dim // 2
    freqs = jnp.exp(-jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t[..., None].astype(jnp.float32) * freqs
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[..., :1])], axis=-1)
    return emb


class TimestepEmbedder(nn.Module):
    """256-dim sinusoid -> Linear -> SiLU -> Linear (t_embedder.mlp.{0,2})."""

    width: int
    freq_dim: int = 256

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        h = timestep_embedding(t, self.freq_dim)
        h = nn.Dense(self.width, dtype=jnp.float32, name="fc1")(h)
        h = nn.silu(h)
        return nn.Dense(self.width, dtype=jnp.float32, name="fc2")(h)


def ape_3d(coords: jnp.ndarray, channels: int) -> jnp.ndarray:
    """Absolute sinusoidal position embedding over (..., 3) coordinates.

    Parity: `AbsolutePositionEmbedder` (`transformer/blocks.py:8-46`):
    freq_dim = channels // 3 // 2, freqs = 10000^-(i/freq_dim), per-point
    layout [sin(x) | cos(x) | sin(y) | cos(y) | sin(z) | cos(z)],
    zero-padded to `channels`.
    """
    in_ch = coords.shape[-1]
    freq_dim = channels // in_ch // 2
    freqs = 1.0 / (10000.0 ** (jnp.arange(freq_dim, dtype=jnp.float32) / freq_dim))
    x = coords[..., None].astype(jnp.float32) * freqs       # (..., 3, fd)
    emb = jnp.concatenate([jnp.sin(x), jnp.cos(x)], axis=-1)  # (..., 3, 2fd)
    emb = emb.reshape(*coords.shape[:-1], in_ch * 2 * freq_dim)
    pad = channels - emb.shape[-1]
    if pad:
        emb = jnp.concatenate([emb, jnp.zeros((*emb.shape[:-1], pad), emb.dtype)], axis=-1)
    return emb


class MultiHeadRMSNorm(nn.Module):
    """Per-head RMS q/k norm (`attention/modules.py:8-15`):
    normalize(x) * gamma * sqrt(head_dim)."""

    head_dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        gamma = self.param("gamma", nn.initializers.ones, (self.num_heads, self.head_dim))
        xf = x.astype(jnp.float32)
        normed = xf * jax.lax.rsqrt(jnp.sum(xf * xf, axis=-1, keepdims=True) + 1e-12)
        return (normed * gamma * (self.head_dim**0.5)).astype(x.dtype)


def _run_attention(qh, kh, vh, attn_spec):
    """Dispatch heads (B, N, H, D) through the mode selected by attn_spec.

    attn_spec:
      None                                  dense full attention
      ("masked", valid)                     full attention, invalid keys masked
      ("windowed", coords, valid, shift, grid, window)   swin 3D windows
      ("serialized", coords, valid, shift, window)       space-filling curve
    """
    if attn_spec is None:
        return flash_sdpa(qh, kh, vh)
    mode = attn_spec[0]
    if mode == "masked":
        valid = attn_spec[1]
        seg = jnp.where(valid, 0, 1).astype(jnp.int32)
        return flash_sdpa(qh, kh, vh, segment_ids=seg)
    if mode == "windowed":
        _, coords, valid, shift, grid, window = attn_spec

        def one(q, k, v, c, m):
            return windowed_attention_3d(q, k, v, c, m, grid_size=grid,
                                         window_size=window, shift=shift)

        return jax.vmap(one)(qh, kh, vh, coords, valid)
    if mode == "serialized":
        _, coords, valid, shift, window = attn_spec

        def one(q, k, v, c, m):
            return serialized_attention(q, k, v, c, m, window_size=window, shift=shift)

        return jax.vmap(one)(qh, kh, vh, coords, valid)
    raise ValueError(f"unknown attention mode {mode}")


class Attention(nn.Module):
    """MultiHeadAttention parity: separate q/k/v Dense (converter splits the
    fused torch to_qkv / to_kv), optional per-head RMS norm, output proj."""

    cfg: DiTConfig
    cross: bool = False

    @nn.compact
    def __call__(self, x, context=None, attn_spec=None):
        cfg = self.cfg
        hd = cfg.width // cfg.num_heads
        src = x if context is None else context
        q = nn.Dense(cfg.width, dtype=cfg.dtype, name="q")(x)
        k = nn.Dense(cfg.width, dtype=cfg.dtype, name="k")(src)
        v = nn.Dense(cfg.width, dtype=cfg.dtype, name="v")(src)

        def heads(t):
            return t.reshape(t.shape[:-1] + (cfg.num_heads, hd))

        qh, kh, vh = heads(q), heads(k), heads(v)
        use_rms = cfg.qk_rms_norm_cross if self.cross else cfg.qk_rms_norm
        if use_rms:
            qh = MultiHeadRMSNorm(hd, cfg.num_heads, name="q_rms")(qh)
            kh = MultiHeadRMSNorm(hd, cfg.num_heads, name="k_rms")(kh)
        out = _run_attention(qh, kh, vh, attn_spec)
        out = out.reshape(x.shape[:-1] + (cfg.width,))
        return nn.Dense(cfg.width, dtype=cfg.dtype, name="proj")(out)


class FeedForward(nn.Module):
    """FeedForwardNet parity: Linear -> tanh-GELU -> Linear (mlp.mlp.{0,2})."""

    cfg: DiTConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        h = nn.Dense(int(cfg.width * cfg.mlp_ratio), dtype=cfg.dtype, name="fc1")(x)
        h = nn.gelu(h, approximate=True)
        return nn.Dense(cfg.width, dtype=cfg.dtype, name="fc2")(h)


class AdaLNModulation(nn.Module):
    """SiLU -> zero-init Dense(6 * width) (adaLN_modulation.{0,1})."""

    width: int

    @nn.compact
    def __call__(self, t_emb):
        h = nn.silu(t_emb.astype(jnp.float32))
        out = nn.Dense(6 * self.width, dtype=jnp.float32,
                       kernel_init=nn.initializers.zeros, name="mod")(h)
        return jnp.split(out, 6, axis=-1)


class DiTBlock(nn.Module):
    """ModulatedTransformerCrossBlock parity (`modulated.py:78-180`).

    Order: norm1 (non-affine) -> mod -> self-attn -> gate; norm2 (affine)
    -> cross-attn (no modulation, no gate); norm3 (non-affine) -> mod ->
    MLP -> gate. With cfg.share_mod the 6 modulation chunks are computed
    once at the model level and passed in via `mods`.
    """

    cfg: DiTConfig

    @nn.compact
    def __call__(self, x, t_emb=None, cond_tokens=None, attn_spec=None, mods=None):
        cfg = self.cfg
        if mods is None:
            mods = AdaLNModulation(cfg.width, name="adaln")(t_emb)
        shift_sa, scale_sa, gate_sa, shift_mlp, scale_mlp, gate_mlp = mods

        def mod(h, shift, scale):
            return h * (1 + scale[..., None, :]) + shift[..., None, :]

        h = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                         dtype=jnp.float32, name="norm1")(x)
        h = mod(h, shift_sa, scale_sa).astype(cfg.dtype)
        h = Attention(cfg, name="self_attn")(h, attn_spec=attn_spec)
        x = x + gate_sa[..., None, :] * h

        if cond_tokens is not None:
            h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(x)
            h = Attention(cfg, cross=True, name="cross_attn")(
                h.astype(cfg.dtype), context=cond_tokens)
            x = x + h

        h = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                         dtype=jnp.float32, name="norm3")(x)
        h = mod(h, shift_mlp, scale_mlp).astype(cfg.dtype)
        h = FeedForward(cfg, name="mlp")(h)
        return x + gate_mlp[..., None, :] * h


class TransformerBlock(nn.Module):
    """Plain (non-modulated) pre-LN block, non-affine norms — the SLat VAE
    decoder block (`sparse/transformer/blocks.py:24-80`, ln_affine=False)."""

    cfg: DiTConfig

    @nn.compact
    def __call__(self, x, attn_spec=None):
        cfg = self.cfg
        h = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                         dtype=jnp.float32, name="norm1")(x)
        x = x + Attention(cfg, name="attn")(h.astype(cfg.dtype), attn_spec=attn_spec)
        h = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                         dtype=jnp.float32, name="norm2")(x)
        return x + FeedForward(cfg, name="mlp")(h.astype(cfg.dtype))
