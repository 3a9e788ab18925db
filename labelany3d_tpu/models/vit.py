"""DINOv2-style Vision Transformer encoder (Flax).

The backbone family behind every perception model in the labeling pipeline
(MoGe and DepthPro encoders, MASt3R's two-view encoder, TRELLIS's DINOv2
conditioner — see SURVEY.md §2C). Written TPU-first:

  * attention through `jax.nn.dot_product_attention` (lowers to the fused
    TPU attention path; no handwritten softmax chains for XLA to re-fuse);
  * bfloat16 activations/params by default with float32 layernorm/softmax
    accumulation — MXU-native;
  * static shapes per resolution bucket; position embeddings are resized
    once per bucket (bicubic, antialiased, matching DINOv2's interpolation
    semantics) at parameter-load time rather than per call;
  * tensor-parallel friendly: attention heads and MLP hidden dim are the
    natural shard axes; see `labelany3d_tpu.parallel.sharding` for rules.

Weight-conversion note: the layer layout (patch embed, cls + register
tokens, pre-norm blocks with LayerScale, SwiGLU-or-GELU MLP) matches
DINOv2 checkpoints module-for-module so torch weights map by name; see
`labelany3d_tpu/models/convert.py`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    patch_size: int = 14
    width: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    num_register_tokens: int = 0
    use_class_token: bool = True
    layerscale_init: float | None = 1e-5
    swiglu: bool = False
    pos_embed: str = "learned"      # 'learned' | 'rope2d' (CroCo/MASt3R) 
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    out_indices: Sequence[int] = ()  # intermediate block outputs to return
    # Apply the final LayerNorm (shared params) to each intermediate output,
    # matching DINOv2 get_intermediate_layers(norm=True) semantics
    # (vision_transformer.py:298-311) — required by the MoGe reference head.
    norm_hiddens: bool = False
    # Native grid of the learned pos_embed (e.g. (37, 37) for DINOv2-L/14 at
    # 518). None = the first input's grid. When the live grid differs, the
    # embedding is bicubic-interpolated (DINOv2 interpolate_pos_encoding).
    pos_grid: tuple | None = None
    # Use the Pallas flash-attention kernel on TPU (falls back to the XLA
    # fused sdpa on other backends). See ops/attention.py::flash_sdpa.
    fused_attn: bool = True

    @staticmethod
    def small(**kw) -> "ViTConfig":
        return ViTConfig(width=384, depth=12, num_heads=6, **kw)

    @staticmethod
    def base(**kw) -> "ViTConfig":
        return ViTConfig(width=768, depth=12, num_heads=12, **kw)

    @staticmethod
    def large(**kw) -> "ViTConfig":
        return ViTConfig(width=1024, depth=24, num_heads=16, **kw)

    @staticmethod
    def giant(**kw) -> "ViTConfig":
        return ViTConfig(width=1536, depth=40, num_heads=24, swiglu=True, **kw)

    @staticmethod
    def tiny_test(**kw) -> "ViTConfig":
        """Small config for unit tests / dry runs."""
        return ViTConfig(width=64, depth=2, num_heads=2, patch_size=8, **kw)


def _gelu_fast(x: jnp.ndarray) -> jnp.ndarray:
    """Exact-erf GELU for f32 paths; tanh form (f32 internals) for bf16.

    The erf transcendental costs ~0.4 ms/layer of VPU time at ViT-L/518
    shapes even when fused into the fc1 epilogue; the clamped tanh form
    runs at matmul speed (35.9 -> 26.5 ms over a 24-layer stack,
    `scripts/bench_mlp_fusion.py`). The swap is gated to bfloat16
    activations, where it is sub-noise: exhaustively over every finite
    bf16 input, the two forms' bf16-rounded outputs differ on 397 of
    65280 values (0.6%), each by exactly one ulp — below the rounding
    noise bf16 matmul reassociation already introduces. f32 configs (the
    tiny parity/replica tests and the geometric core) keep exact erf.
    """
    if x.dtype != jnp.bfloat16:
        return nn.gelu(x, approximate=False)
    z = jnp.clip(x.astype(jnp.float32), -10.0, 10.0)
    inner = 0.7978845608 * z + 0.035677408136 * (z * z * z)
    out = 0.5 * z * (1.0 + jnp.tanh(inner))
    out = jnp.where(jnp.abs(z) >= 10.0, jnp.maximum(z, 0.0), out)
    return out.astype(x.dtype)


class Mlp(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        hidden = int(cfg.width * cfg.mlp_ratio)
        if cfg.swiglu:
            # DINOv2-giant SwiGLU ffn: hidden rounded as in the reference impl.
            hidden = (int(hidden * 2 / 3) + 7) // 8 * 8
            x12 = nn.Dense(2 * hidden, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="w12")(x)
            x1, x2 = jnp.split(x12, 2, axis=-1)
            x = nn.silu(x1) * x2
            return nn.Dense(cfg.width, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="w3")(x)
        x = nn.Dense(hidden, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="fc1")(x)
        # Keep the GELU out of fc2's OPERAND fusion: there it stalls the
        # MXU pipeline on VPU work (round-4 ViT-L/518 profile: fc2 at 91
        # TFLOP/s vs fc1's 171 with identical FLOPs). Fused into fc1's
        # output EPILOGUE it rides the result tiles for free — measured
        # 43.6 -> 35.9 ms (exact erf) / 26.5 ms (tanh form) over a
        # 24-layer MLP stack at (8, 1408) (`scripts/bench_mlp_fusion.py`;
        # the r4 both-sides barrier paid a separate HBM-rate pass).
        x = _gelu_fast(x)
        x = jax.lax.optimization_barrier(x)
        return nn.Dense(cfg.width, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="fc2")(x)


class Attention(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x, rope=None, seg=None, n_real=None):
        cfg = self.cfg
        head_dim = cfg.width // cfg.num_heads
        qkv = nn.Dense(3 * cfg.width, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="qkv")(x)

        # Packed fast path: the Pallas kernel reads q/k/v as lane-offset
        # views of the fused Dense output, skipping the split + head
        # reshape + BSHD->BHSD transposes (~13 ms/batch on ViT-L/518,
        # docs/PERF.md). Needs 128-aligned heads and a lane-padded
        # sequence (the encoder pre-pads when fused_attn is on).
        d_ok = head_dim % 128 == 0 or (
            128 % head_dim == 0 and cfg.num_heads % (128 // head_dim) == 0)
        if (cfg.fused_attn and rope is None and n_real is not None and d_ok
                and x.shape[1] % 128 == 0 and jax.default_backend() == "tpu"):
            from labelany3d_tpu.ops.attention import packed_flash_sdpa

            out = packed_flash_sdpa(qkv, cfg.num_heads, n_real)
            return nn.Dense(cfg.width, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="proj")(out)

        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(t.shape[:-1] + (cfg.num_heads, head_dim))

        qh, kh, vh = heads(q), heads(k), heads(v)
        if rope is not None:
            # 2D rotary embeddings on q/k (curope-equivalent; patch tokens
            # only — prefix tokens get identity rotation via zero positions).
            from labelany3d_tpu.ops.rope2d import apply_rope_2d

            cos, sin = rope
            qh = apply_rope_2d(qh, cos, sin).astype(cfg.dtype)
            kh = apply_rope_2d(kh, cos, sin).astype(cfg.dtype)
        if cfg.fused_attn:
            # VMEM-resident flash kernel on TPU (ops/attention.py); XLA
            # sdpa elsewhere. ~1.8x ViT-L encoder speedup at 518^2.
            from labelany3d_tpu.ops.attention import flash_sdpa

            out = flash_sdpa(qh, kh, vh, segment_ids=seg)
        else:
            out = jax.nn.dot_product_attention(qh, kh, vh)
        out = out.reshape(x.shape[:-1] + (cfg.width,))
        return nn.Dense(cfg.width, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="proj")(out)


class LayerScale(nn.Module):
    dim: int
    init_value: float
    param_dtype: Any

    @nn.compact
    def __call__(self, x):
        gamma = self.param(
            "gamma", lambda k, s: jnp.full(s, self.init_value, self.param_dtype), (self.dim,)
        )
        return x * gamma.astype(x.dtype)


class Block(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x, rope=None, seg=None, n_real=None):
        cfg = self.cfg
        h = nn.LayerNorm(dtype=jnp.float32, param_dtype=cfg.param_dtype, name="norm1")(x)
        h = Attention(cfg, name="attn")(h.astype(cfg.dtype), rope=rope, seg=seg, n_real=n_real)
        if cfg.layerscale_init is not None:
            h = LayerScale(cfg.width, cfg.layerscale_init, cfg.param_dtype, name="ls1")(h)
        x = x + h
        h = nn.LayerNorm(dtype=jnp.float32, param_dtype=cfg.param_dtype, name="norm2")(x)
        h = Mlp(cfg, name="mlp")(h.astype(cfg.dtype))
        if cfg.layerscale_init is not None:
            h = LayerScale(cfg.width, cfg.layerscale_init, cfg.param_dtype, name="ls2")(h)
        return x + h


class ViT(nn.Module):
    """Patchify -> transformer; returns final and requested block outputs.

    Input: (B, H, W, 3) images (any H, W divisible by patch_size within a
    bucket). Output dict:
      tokens      (B, N, C) final-norm patch tokens (no cls/registers)
      cls         (B, C) class token (if enabled)
      grid        (h, w) token grid shape
      hiddens     list of (B, N, C) pre-norm outputs at cfg.out_indices
    """

    cfg: ViTConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> dict:
        cfg = self.cfg
        b, h, w, _ = images.shape
        gh, gw = h // cfg.patch_size, w // cfg.patch_size

        x = nn.Conv(
            cfg.width,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            padding="VALID",  # torch patch embeds pad nothing: floor(h/p)
            dtype=cfg.dtype,
            param_dtype=cfg.param_dtype,
            name="patch_embed",
        )(images.astype(cfg.dtype))
        x = x.reshape(b, gh * gw, cfg.width)

        rope = None
        if cfg.pos_embed == "learned":
            pgh, pgw = cfg.pos_grid or (gh, gw)
            pos = self.param(
                "pos_embed",
                nn.initializers.normal(0.02, dtype=jnp.float32),
                (1, pgh, pgw, cfg.width),
            )
            if (pgh, pgw) != (gh, gw):
                pos = resize_pos_embed(pos, gh, gw)
            x = x + pos.reshape(1, gh * gw, cfg.width).astype(cfg.dtype)
        elif cfg.pos_embed == "rope2d":
            # CroCo/MASt3R-style rotary positions applied inside attention;
            # prefix tokens get position (0, 0) == identity rotation.
            from labelany3d_tpu.ops.rope2d import rope_2d_freqs

            gy, gx = jnp.meshgrid(jnp.arange(gh), jnp.arange(gw), indexing="ij")
            patch_pos = jnp.stack([gy, gx], axis=-1).reshape(1, gh * gw, 2)
        else:
            raise ValueError(f"Unknown pos_embed mode: {cfg.pos_embed}")

        n_prefix = 0
        prefix_tokens = []
        if cfg.use_class_token:
            cls = self.param("cls_token", nn.initializers.zeros, (1, 1, cfg.width))
            prefix_tokens.append(jnp.broadcast_to(cls.astype(cfg.dtype), (b, 1, cfg.width)))
            n_prefix += 1
        if cfg.num_register_tokens:
            reg = self.param(
                "register_tokens", nn.initializers.zeros,
                (1, cfg.num_register_tokens, cfg.width),
            )
            prefix_tokens.append(
                jnp.broadcast_to(reg.astype(cfg.dtype), (b, cfg.num_register_tokens, cfg.width))
            )
            n_prefix += cfg.num_register_tokens
        if prefix_tokens:
            x = jnp.concatenate(prefix_tokens + [x], axis=1)

        # Pad the token sequence once to a lane multiple for the flash
        # kernel (pad keys masked via segment ids); avoids per-layer
        # pad/unpad HBM round-trips. Pad rows carry garbage and are
        # sliced off at every output below.
        n_real = x.shape[1]
        seg = None
        if cfg.fused_attn and jax.default_backend() == "tpu":
            n_full = -(-n_real // 128) * 128
            if n_full != n_real:
                x = jnp.pad(x, ((0, 0), (0, n_full - n_real), (0, 0)))
                seg = jnp.broadcast_to(
                    (jnp.arange(n_full) >= n_real).astype(jnp.int32)[None],
                    (b, n_full),
                )
                if cfg.pos_embed == "rope2d":
                    patch_pos = jnp.concatenate(
                        [patch_pos,
                         jnp.zeros((1, n_full - n_real, 2), jnp.int32)],
                        axis=1,
                    )

        if cfg.pos_embed == "rope2d":
            from labelany3d_tpu.ops.rope2d import rope_2d_freqs

            all_pos = jnp.concatenate(
                [jnp.zeros((1, n_prefix, 2), jnp.int32), patch_pos], axis=1
            )
            rope = rope_2d_freqs(cfg.width // cfg.num_heads, all_pos)

        final_norm = nn.LayerNorm(dtype=jnp.float32, param_dtype=cfg.param_dtype, name="norm")
        hiddens = []
        want = set(i % cfg.depth for i in cfg.out_indices)
        for i in range(cfg.depth):
            x = Block(cfg, name=f"block{i}")(x, rope=rope, seg=seg, n_real=n_real)
            if i in want:
                h = final_norm(x[:, :n_real]) if cfg.norm_hiddens else x[:, :n_real]
                hiddens.append(h[:, n_prefix:])

        x_prenorm = x[:, :n_real]
        x = final_norm(x_prenorm)
        out = {
            "tokens": x[:, n_prefix:].astype(cfg.dtype),
            "grid": (gh, gw),
            "hiddens": hiddens,
            # Full pre-final-norm sequence (cls + registers + patches) —
            # DINOv2 `is_training=True` x_prenorm; TRELLIS conditions on
            # layer_norm(x_prenorm) (`trellis_image_to_3d.py:145-147`).
            "all_prenorm": x_prenorm.astype(cfg.dtype),
        }
        if cfg.use_class_token:
            out["cls"] = x[:, 0].astype(cfg.dtype)
        return out


def resize_pos_embed(pos: jnp.ndarray, new_gh: int, new_gw: int) -> jnp.ndarray:
    """Bicubic position-embedding interpolation between resolution buckets.

    (1, gh, gw, C) -> (1, new_gh, new_gw, C); mirrors DINOv2's antialiased
    bicubic interpolation (reference behavior noted at SURVEY.md §7 hard
    part 4).
    """
    return jax.image.resize(
        pos, (1, new_gh, new_gw, pos.shape[-1]), method="bicubic", antialias=True
    )
