"""SD-class conditional UNet (Flax, TPU-first).

Stable-Diffusion-1.5-shaped: ResBlocks with timestep injection, transformer
blocks (self + cross attention on context tokens) at the lower resolutions,
stride-2 down/up path with skips. bfloat16 compute, f32 norms; attention
through the fused SDPA. `in_channels` is configurable so the same module
serves txt2img (4), InstructPix2Pix-style editing (8 = latent + image
latent) and Zero123 (8 + camera tokens in context).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from labelany3d_tpu.models.trellis.dit import timestep_embedding


def _num_groups(ch: int, target: int = 32) -> int:
    """Largest group count <= target dividing ch (GroupNorm constraint)."""
    g = min(target, ch)
    while ch % g:
        g -= 1
    return g


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    widths: Sequence[int] = (320, 640, 1280, 1280)
    # SD-1.5 layout: transformer blocks at down levels 0-2; the deepest
    # level (8x8 latents) is conv-only (diffusers: 3x CrossAttnDownBlock2D
    # + DownBlock2D).
    attn_levels: Sequence[int] = (0, 1, 2)
    num_res_blocks: int = 2
    num_heads: int = 8
    context_dim: int = 768
    dtype: Any = jnp.bfloat16

    @staticmethod
    def tiny_test() -> "UNetConfig":
        return UNetConfig(
            widths=(16, 32), attn_levels=(1,), num_res_blocks=1,
            num_heads=2, context_dim=16,
        )


class ResBlock(nn.Module):
    out_ch: int
    dtype: Any

    @nn.compact
    def __call__(self, x, temb):
        # eps 1e-5 matches torch GroupNorm default (diffusers ResnetBlock2D).
        h = nn.GroupNorm(num_groups=_num_groups(x.shape[-1]), epsilon=1e-5, dtype=jnp.float32, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), dtype=self.dtype, name="conv1")(h.astype(self.dtype))
        t = nn.Dense(self.out_ch, dtype=self.dtype, name="temb_proj")(nn.silu(temb))
        h = h + t[:, None, None, :]
        h = nn.GroupNorm(num_groups=_num_groups(self.out_ch), epsilon=1e-5, dtype=jnp.float32, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), dtype=self.dtype, name="conv2")(h.astype(self.dtype))
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype, name="skip")(x.astype(self.dtype))
        return x + h


class TransformerBlock(nn.Module):
    heads: int
    context_dim: int
    dtype: Any

    def _attn(self, q_in, kv_in, name):
        # k/v project the kv input directly (context_dim -> ch for cross
        # attention), diffusers Attention convention: to_q/to_k/to_v no bias.
        ch = q_in.shape[-1]
        hd = ch // self.heads
        q = nn.Dense(ch, use_bias=False, dtype=self.dtype, name=f"{name}_q")(q_in)
        k = nn.Dense(ch, use_bias=False, dtype=self.dtype, name=f"{name}_k")(kv_in)
        v = nn.Dense(ch, use_bias=False, dtype=self.dtype, name=f"{name}_v")(kv_in)

        def heads(t):
            return t.reshape(t.shape[:-1] + (self.heads, hd))

        out = jax.nn.dot_product_attention(heads(q), heads(k), heads(v))
        out = out.reshape(q_in.shape[:-1] + (ch,))
        return nn.Dense(ch, dtype=self.dtype, name=f"{name}_proj")(out)

    @nn.compact
    def __call__(self, x, context):
        b, h, w, c = x.shape
        residual = x
        t = nn.GroupNorm(num_groups=_num_groups(c), dtype=jnp.float32, name="norm")(x)
        t = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_in")(t.astype(self.dtype))
        t = t.reshape(b, h * w, c)

        tn = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln1")(t).astype(self.dtype)
        t = t + self._attn(tn, tn, "self")
        tn = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln2")(t).astype(self.dtype)
        t = t + self._attn(tn, context.astype(self.dtype), "cross")
        tn = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln3")(t).astype(self.dtype)
        g = nn.Dense(c * 8, dtype=self.dtype, name="geglu")(tn)
        a, gate = jnp.split(g, 2, axis=-1)
        t = t + nn.Dense(c, dtype=self.dtype, name="ff_out")(a * nn.gelu(gate))

        t = t.reshape(b, h, w, c)
        t = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(t)
        return residual + t


class UNet2D(nn.Module):
    cfg: UNetConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray, context: jnp.ndarray) -> jnp.ndarray:
        """x (B, H, W, C_in) latents; t (B,) in [0, 1]; context (B, M, D)."""
        cfg = self.cfg
        temb = timestep_embedding(t, cfg.widths[0])
        temb = nn.Dense(cfg.widths[0] * 4, dtype=cfg.dtype, name="t1")(temb.astype(cfg.dtype))
        temb = nn.Dense(cfg.widths[0] * 4, dtype=cfg.dtype, name="t2")(nn.silu(temb))

        h = nn.Conv(cfg.widths[0], (3, 3), dtype=cfg.dtype, name="in_conv")(x.astype(cfg.dtype))
        skips = [h]
        # Down path
        for lvl, width in enumerate(cfg.widths):
            for i in range(cfg.num_res_blocks):
                h = ResBlock(width, cfg.dtype, name=f"down{lvl}_res{i}")(h, temb)
                if lvl in cfg.attn_levels:
                    h = TransformerBlock(cfg.num_heads, cfg.context_dim, cfg.dtype,
                                         name=f"down{lvl}_attn{i}")(h, context)
                skips.append(h)
            if lvl < len(cfg.widths) - 1:
                # Explicit (1,1) padding: torch Conv2d(k=3,s=2,p=1) semantics
                # (XLA 'SAME' would pad (0,1) at stride 2 — different taps).
                h = nn.Conv(width, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                            dtype=cfg.dtype, name=f"down{lvl}_ds")(h)
                skips.append(h)

        # Middle
        h = ResBlock(cfg.widths[-1], cfg.dtype, name="mid_res1")(h, temb)
        h = TransformerBlock(cfg.num_heads, cfg.context_dim, cfg.dtype, name="mid_attn")(h, context)
        h = ResBlock(cfg.widths[-1], cfg.dtype, name="mid_res2")(h, temb)

        # Up path
        for lvl in reversed(range(len(cfg.widths))):
            width = cfg.widths[lvl]
            for i in range(cfg.num_res_blocks + 1):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = ResBlock(width, cfg.dtype, name=f"up{lvl}_res{i}")(h, temb)
                if lvl in cfg.attn_levels:
                    h = TransformerBlock(cfg.num_heads, cfg.context_dim, cfg.dtype,
                                         name=f"up{lvl}_attn{i}")(h, context)
            if lvl > 0:
                b, hh, ww, c = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, c), method="nearest")
                h = nn.Conv(width, (3, 3), dtype=cfg.dtype, name=f"up{lvl}_us")(h)

        h = nn.GroupNorm(num_groups=_num_groups(h.shape[-1]), epsilon=1e-5, dtype=jnp.float32, name="norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(
            cfg.out_channels, (3, 3), dtype=jnp.float32, param_dtype=jnp.float32,
            kernel_init=nn.initializers.zeros, name="out_conv",
        )(h.astype(jnp.float32))
