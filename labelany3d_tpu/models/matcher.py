"""Two-view correspondence model (MASt3R/DUSt3R-equivalent, Flax).

Behavioral parity target: `external/mast3r/mast3r/model.py:40`
(AsymmetricMASt3R) + `dust3r/inference.py:56-72` in the reference tree — a
shared ViT encoder over both views, two cross-attending decoder streams, and
per-view heads predicting a 3D point map, confidence, and a matching
descriptor map; descriptors feed reciprocal-NN matching.

TPU-first: both views run through the encoder as one batched call; decoder
cross-attention uses the fused SDPA; 2D RoPE (ops.rope2d — the curope CUDA
kernel's replacement) injects geometry into decoder attention. The matching
itself is `labelany3d_tpu.ops.reciprocal_nn` (one matmul-argmax program)
instead of the reference's CUDA block loop.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from labelany3d_tpu.models.vit import Mlp, ViT, ViTConfig
from labelany3d_tpu.ops.reciprocal_nn import MatchResult, reciprocal_nn_match
from labelany3d_tpu.ops.rope2d import apply_rope_2d, rope_2d_freqs


@dataclasses.dataclass(frozen=True)
class MatcherConfig:
    encoder: ViTConfig = dataclasses.field(default_factory=ViTConfig.large)
    dec_width: int = 768
    dec_depth: int = 12
    dec_heads: int = 12
    desc_dim: int = 24
    dtype: Any = jnp.bfloat16

    @staticmethod
    def tiny_test() -> "MatcherConfig":
        return MatcherConfig(
            encoder=ViTConfig.tiny_test(),
            dec_width=64,
            dec_depth=2,
            dec_heads=2,
            desc_dim=8,
        )


class CrossBlock(nn.Module):
    """Decoder block: self-attention, cross-attention to the other view, MLP.

    RoPE rotates queries/keys of both attentions by token (y, x) positions.
    """

    cfg: MatcherConfig

    def _attn(self, q_tokens, kv_tokens, q_pos_cs, kv_pos_cs, name):
        cfg = self.cfg
        head_dim = cfg.dec_width // cfg.dec_heads
        q = nn.Dense(cfg.dec_width, dtype=cfg.dtype, name=f"{name}_q")(q_tokens)
        k = nn.Dense(cfg.dec_width, dtype=cfg.dtype, name=f"{name}_k")(kv_tokens)
        v = nn.Dense(cfg.dec_width, dtype=cfg.dtype, name=f"{name}_v")(kv_tokens)

        def heads(t):
            return t.reshape(t.shape[:-1] + (cfg.dec_heads, head_dim))

        qh, kh, vh = heads(q), heads(k), heads(v)
        qh = apply_rope_2d(qh, *q_pos_cs).astype(cfg.dtype)
        kh = apply_rope_2d(kh, *kv_pos_cs).astype(cfg.dtype)
        out = jax.nn.dot_product_attention(qh, kh, vh)
        out = out.reshape(q_tokens.shape[:-1] + (cfg.dec_width,))
        return nn.Dense(cfg.dec_width, dtype=cfg.dtype, name=f"{name}_proj")(out)

    @nn.compact
    def __call__(self, x, other, pos_cs, other_pos_cs):
        cfg = self.cfg
        h = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x).astype(cfg.dtype)
        x = x + self._attn(h, h, pos_cs, pos_cs, "self")
        h = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x).astype(cfg.dtype)
        ho = nn.LayerNorm(dtype=jnp.float32, name="norm_other")(other).astype(cfg.dtype)
        x = x + self._attn(h, ho, pos_cs, other_pos_cs, "cross")
        h = nn.LayerNorm(dtype=jnp.float32, name="norm3")(x).astype(cfg.dtype)
        mlp_cfg = ViTConfig(
            width=cfg.dec_width, depth=1, num_heads=cfg.dec_heads, dtype=cfg.dtype
        )
        x = x + Mlp(mlp_cfg, name="mlp")(h)
        return x


class MatcherHead(nn.Module):
    """Token -> per-pixel (pts3d + conf, desc) maps via linear + pixelshuffle."""

    cfg: MatcherConfig
    patch: int

    @nn.compact
    def __call__(self, tokens, grid, out_hw):
        cfg = self.cfg
        gh, gw = grid
        p = self.patch
        b = tokens.shape[0]
        # DPT-lite: linear projection to patch^2 x channels, then unshuffle.
        ch = 4 + cfg.desc_dim  # xyz + conf + desc
        x = nn.Dense(p * p * ch, dtype=jnp.float32, param_dtype=jnp.float32, name="proj")(
            tokens.astype(jnp.float32)
        )
        x = x.reshape(b, gh, gw, p, p, ch)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * p, gw * p, ch)
        if (gh * p, gw * p) != tuple(out_hw):
            x = jax.image.resize(x, (b, out_hw[0], out_hw[1], ch), method="bilinear")
        pts = x[..., :3]
        conf = jax.nn.softplus(x[..., 3])
        desc = x[..., 4:]
        desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8)
        return pts, conf, desc


class TwoViewMatcher(nn.Module):
    cfg: MatcherConfig

    @nn.compact
    def __call__(self, img0: jnp.ndarray, img1: jnp.ndarray) -> dict:
        """img0/img1: (B, H, W, 3) -> per-view pts3d/conf/desc maps."""
        cfg = self.cfg
        b, h, w, _ = img0.shape
        enc = ViT(cfg.encoder, name="encoder")(jnp.concatenate([img0, img1], axis=0))
        gh, gw = enc["grid"]
        t0, t1 = jnp.split(enc["tokens"], 2, axis=0)

        proj = nn.Dense(cfg.dec_width, dtype=cfg.dtype, name="dec_embed")
        x0 = proj(t0)
        x1 = proj(t1)

        ys = jnp.arange(gh, dtype=jnp.int32)
        xs = jnp.arange(gw, dtype=jnp.int32)
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        pos = jnp.stack([gy, gx], axis=-1).reshape(1, gh * gw, 2)
        pos_cs = rope_2d_freqs(cfg.dec_width // cfg.dec_heads, pos)

        for i in range(cfg.dec_depth):
            blk0 = CrossBlock(cfg, name=f"dec0_block{i}")
            blk1 = CrossBlock(cfg, name=f"dec1_block{i}")
            x0n, x1n = blk0(x0, x1, pos_cs, pos_cs), blk1(x1, x0, pos_cs, pos_cs)
            x0, x1 = x0n, x1n

        head0 = MatcherHead(cfg, cfg.encoder.patch_size, name="head0")
        head1 = MatcherHead(cfg, cfg.encoder.patch_size, name="head1")
        pts0, conf0, desc0 = head0(x0, (gh, gw), (h, w))
        pts1, conf1, desc1 = head1(x1, (gh, gw), (h, w))
        return {
            "pts3d0": pts0, "conf0": conf0, "desc0": desc0,
            "pts3d1": pts1, "conf1": conf1, "desc1": desc1,
        }


def match_images(
    model: TwoViewMatcher,
    params,
    img0: jnp.ndarray,
    img1: jnp.ndarray,
    subsample: int = 8,
) -> MatchResult:
    """Run the matcher + reciprocal NN on one image pair ((H, W, 3) each).

    Pipeline parity: `src/matching/matcher.py:13-92` minus the PyTorch3D
    coordinate flips (our renderer is already OpenCV-convention).
    """
    out = model.apply({"params": params}, img0[None], img1[None])
    return reciprocal_nn_match(out["desc0"][0], out["desc1"][0], subsample=subsample)
