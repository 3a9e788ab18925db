"""CLIP text + vision encoders (Flax), HF-checkpoint compatible.

The reference conditions its diffusion models on real CLIP encoders:
InstructPix2Pix amodal completion and SD-turbo/InvSR take CLIP text
embeddings (`src/model_wrappers.py:638-662`, `external/InvSR/
sampler_invsr.py:111`), Zero123 conditions on CLIP vision image embeds
(`external/dreamgaussian/zero123.py`), and the OVSAM-role tagger scores
masks against a text vocabulary (`src/model_wrappers.py:616-632`).

TPU-first notes: attention through `jax.nn.dot_product_attention`
(is_causal for text), bf16 activations with f32 layernorms, static
sequence lengths (the 77-token context is a fixed shape — ideal for XLA).
Layer layout matches `transformers` CLIP module-for-module so released
checkpoints load by rename (`convert_clip_text` / `convert_clip_vision`
below); parity is tested against a randomly-initialized
`transformers.CLIPTextModel`/`CLIPVisionModel` oracle in
`tests/test_clip.py`.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    width: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    max_len: int = 77
    eos_token_id: int = 49407
    projection_dim: int | None = None  # text_projection (similarity models)
    hidden_act: str = "quick_gelu"
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @staticmethod
    def sd15(**kw) -> "CLIPTextConfig":
        """openai/clip-vit-large-patch14 text tower — the SD 1.x /
        InstructPix2Pix / Zero123 conditioning encoder."""
        return CLIPTextConfig(**kw)

    @staticmethod
    def sd2(**kw) -> "CLIPTextConfig":
        """OpenCLIP ViT-H text tower (SD 2.x): gelu activation."""
        return CLIPTextConfig(
            width=1024, depth=23, num_heads=16, hidden_act="gelu", **kw
        )

    @staticmethod
    def tiny_test(**kw) -> "CLIPTextConfig":
        return CLIPTextConfig(
            vocab_size=64, width=32, depth=2, num_heads=2, max_len=16,
            eos_token_id=63, **kw,
        )


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    width: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    projection_dim: int | None = 768  # visual_projection -> image_embeds
    hidden_act: str = "quick_gelu"
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @staticmethod
    def vitl14(**kw) -> "CLIPVisionConfig":
        """openai/clip-vit-large-patch14 vision tower (Zero123's image
        conditioner at 224^2)."""
        return CLIPVisionConfig(**kw)

    @staticmethod
    def bigg14(**kw) -> "CLIPVisionConfig":
        """laion/CLIP-ViT-bigG-14 vision tower (SDXL's second image/text
        conditioner family; Hunyuan3D mvd_std `vision_encoder_2`,
        `mvd/hunyuan3d_mvd_std_pipeline.py:196-198`). gelu (not quick_gelu)
        activation, 1280-dim projection."""
        return CLIPVisionConfig(
            width=1664, depth=48, num_heads=16, mlp_ratio=8192 / 1664,
            projection_dim=1280, hidden_act="gelu", **kw,
        )

    @staticmethod
    def tiny_test(**kw) -> "CLIPVisionConfig":
        kw.setdefault("projection_dim", 16)
        return CLIPVisionConfig(
            image_size=32, patch_size=8, width=32, depth=2, num_heads=2, **kw,
        )


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name == "gelu":
        return lambda x: nn.gelu(x, approximate=False)
    raise ValueError(f"Unknown hidden_act: {name}")


class _CLIPAttention(nn.Module):
    width: int
    num_heads: int
    dtype: Any
    param_dtype: Any

    @nn.compact
    def __call__(self, x, is_causal: bool):
        head_dim = self.width // self.num_heads
        dense = lambda name: nn.Dense(  # noqa: E731
            self.width, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        q, k, v = dense("q_proj")(x), dense("k_proj")(x), dense("v_proj")(x)

        def heads(t):
            return t.reshape(t.shape[:-1] + (self.num_heads, head_dim))

        out = jax.nn.dot_product_attention(
            heads(q), heads(k), heads(v), is_causal=is_causal
        )
        out = out.reshape(x.shape[:-1] + (self.width,))
        return dense("out_proj")(out)


class _CLIPBlock(nn.Module):
    width: int
    num_heads: int
    mlp_ratio: float
    hidden_act: str
    dtype: Any
    param_dtype: Any

    @nn.compact
    def __call__(self, x, is_causal: bool):
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=self.param_dtype,
                         name="layer_norm1")(x)
        h = _CLIPAttention(self.width, self.num_heads, self.dtype,
                           self.param_dtype, name="self_attn")(
            h.astype(self.dtype), is_causal
        )
        x = x + h
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=self.param_dtype,
                         name="layer_norm2")(x)
        h = nn.Dense(int(self.width * self.mlp_ratio), dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc1")(h.astype(self.dtype))
        h = _act(self.hidden_act)(h)
        h = nn.Dense(self.width, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="fc2")(h)
        return x + h


class CLIPTextEncoder(nn.Module):
    """Token ids (B, L) int32 -> dict:

      last_hidden  (B, L, D) final-layernormed sequence (the SD/IP2P
                   cross-attention conditioning)
      pooled       (B, D) hidden at the EOT position
      text_embeds  (B, P) pooled @ text_projection (when projection_dim)
    """

    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, ids: jnp.ndarray) -> dict:
        cfg = self.cfg
        tok = self.param(
            "token_embedding", nn.initializers.normal(0.02, dtype=jnp.float32),
            (cfg.vocab_size, cfg.width),
        )
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.01, dtype=jnp.float32),
            (cfg.max_len, cfg.width),
        )
        L = ids.shape[-1]
        x = tok[ids].astype(cfg.dtype) + pos[:L].astype(cfg.dtype)
        for i in range(cfg.depth):
            x = _CLIPBlock(cfg.width, cfg.num_heads, cfg.mlp_ratio,
                           cfg.hidden_act, cfg.dtype, cfg.param_dtype,
                           name=f"layer{i}")(x, is_causal=True)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=cfg.param_dtype,
                         name="final_layer_norm")(x)
        # EOT pooling: first occurrence of eos_token_id per row (HF CLIP
        # semantics); rows without EOS fall back to the highest-id token
        # (classic CLIP argmax behavior).
        has_eos = (ids == cfg.eos_token_id).any(axis=-1)
        eot = jnp.where(
            has_eos,
            jnp.argmax((ids == cfg.eos_token_id).astype(jnp.int32), axis=-1),
            jnp.argmax(ids, axis=-1),
        )
        pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
        out = {"last_hidden": x.astype(cfg.dtype), "pooled": pooled.astype(cfg.dtype)}
        if cfg.projection_dim is not None:
            proj = nn.Dense(cfg.projection_dim, use_bias=False, dtype=cfg.dtype,
                            param_dtype=cfg.param_dtype, name="text_projection")
            out["text_embeds"] = proj(pooled.astype(cfg.dtype))
        return out


class CLIPVisionEncoder(nn.Module):
    """Images (B, H, W, 3), CLIP-normalized, -> dict:

      tokens        (B, 1+N, D) last hidden states (cls first)
      pooled        (B, D) post-layernormed class token
      image_embeds  (B, P) pooled @ visual_projection (when projection_dim)
    """

    cfg: CLIPVisionConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> dict:
        cfg = self.cfg
        b, h, w, _ = images.shape
        gh, gw = h // cfg.patch_size, w // cfg.patch_size
        x = nn.Conv(
            cfg.width, kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
            use_bias=False, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            name="patch_embedding",
        )(images.astype(cfg.dtype))
        x = x.reshape(b, gh * gw, cfg.width)
        cls = self.param("class_embedding",
                         nn.initializers.normal(0.02, dtype=jnp.float32),
                         (cfg.width,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(cfg.dtype), (b, 1, cfg.width)), x], axis=1
        )
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.01, dtype=jnp.float32),
            (1 + (cfg.image_size // cfg.patch_size) ** 2, cfg.width),
        )
        x = x + pos[: x.shape[1]].astype(cfg.dtype)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=cfg.param_dtype,
                         name="pre_layernorm")(x).astype(cfg.dtype)
        for i in range(cfg.depth):
            x = _CLIPBlock(cfg.width, cfg.num_heads, cfg.mlp_ratio,
                           cfg.hidden_act, cfg.dtype, cfg.param_dtype,
                           name=f"layer{i}")(x, is_causal=False)
        pooled = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=cfg.param_dtype,
                              name="post_layernorm")(x[:, 0])
        out = {"tokens": x.astype(cfg.dtype), "pooled": pooled.astype(cfg.dtype)}
        if cfg.projection_dim is not None:
            proj = nn.Dense(cfg.projection_dim, use_bias=False, dtype=cfg.dtype,
                            param_dtype=cfg.param_dtype, name="visual_projection")
            out["image_embeds"] = proj(pooled.astype(cfg.dtype))
        return out


# CLIP's released preprocessing constants (image normalization).
CLIP_IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def preprocess_clip_image(rgb01: np.ndarray, size: int = 224) -> np.ndarray:
    """[0,1] RGB (H, W, 3) -> CLIP-normalized (size, size, 3) float32."""
    from PIL import Image

    img = Image.fromarray((np.clip(rgb01, 0, 1) * 255).astype(np.uint8))
    img = img.resize((size, size), Image.BICUBIC)
    x = np.asarray(img, np.float32) / 255.0
    return (x - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD


# --------------------------------------------------------------- converters


def _t(w):
    return np.asarray(w).T


def _ln(state, pre):
    return {"scale": np.asarray(state[pre + ".weight"]),
            "bias": np.asarray(state[pre + ".bias"])}


def _lin(state, pre):
    d = {"kernel": _t(state[pre + ".weight"])}
    if pre + ".bias" in state:
        d["bias"] = np.asarray(state[pre + ".bias"])
    return d


def _clip_block(state, pre):
    return {
        "layer_norm1": _ln(state, pre + ".layer_norm1"),
        "layer_norm2": _ln(state, pre + ".layer_norm2"),
        "self_attn": {
            "q_proj": _lin(state, pre + ".self_attn.q_proj"),
            "k_proj": _lin(state, pre + ".self_attn.k_proj"),
            "v_proj": _lin(state, pre + ".self_attn.v_proj"),
            "out_proj": _lin(state, pre + ".self_attn.out_proj"),
        },
        "fc1": _lin(state, pre + ".mlp.fc1"),
        "fc2": _lin(state, pre + ".mlp.fc2"),
    }


def convert_clip_text(state: dict, cfg: CLIPTextConfig) -> dict:
    """transformers CLIPTextModel(WithProjection) state_dict -> Flax params.

    Accepts keys with or without the `text_model.` prefix.
    """
    if any(k.startswith("text_model.") for k in state):
        state = {k[len("text_model."):]: v for k, v in state.items()
                 if k.startswith("text_model.")} | {
            k: v for k, v in state.items() if not k.startswith("text_model.")}
    params = {
        "token_embedding": np.asarray(state["embeddings.token_embedding.weight"]),
        "position_embedding": np.asarray(state["embeddings.position_embedding.weight"]),
        "final_layer_norm": _ln(state, "final_layer_norm"),
    }
    for i in range(cfg.depth):
        params[f"layer{i}"] = _clip_block(state, f"encoder.layers.{i}")
    if cfg.projection_dim is not None:
        if "text_projection.weight" not in state:
            raise KeyError(
                "checkpoint has no text_projection (plain CLIPTextModel); "
                "use CLIPTextConfig(projection_dim=None)"
            )
        params["text_projection"] = {"kernel": _t(state["text_projection.weight"])}
    return params


def convert_clip_vision(state: dict, cfg: CLIPVisionConfig) -> dict:
    """transformers CLIPVisionModel(WithProjection) state_dict -> Flax params.

    Accepts keys with or without the `vision_model.` prefix. The HF conv
    patch embed is (D, 3, P, P); Flax wants (P, P, 3, D).
    """
    if any(k.startswith("vision_model.") for k in state):
        state = {k[len("vision_model."):]: v for k, v in state.items()
                 if k.startswith("vision_model.")} | {
            k: v for k, v in state.items() if not k.startswith("vision_model.")}
    pe = np.asarray(state["embeddings.patch_embedding.weight"])
    params = {
        "patch_embedding": {"kernel": pe.transpose(2, 3, 1, 0)},
        "class_embedding": np.asarray(state["embeddings.class_embedding"]),
        "position_embedding": np.asarray(state["embeddings.position_embedding.weight"]),
        # HF spells it `pre_layrnorm` (sic); accept both.
        "pre_layernorm": _ln(
            state, "pre_layrnorm" if "pre_layrnorm.weight" in state else "pre_layernorm"
        ),
        "post_layernorm": _ln(state, "post_layernorm"),
    }
    for i in range(cfg.depth):
        params[f"layer{i}"] = _clip_block(state, f"encoder.layers.{i}")
    if cfg.projection_dim is not None:
        if "visual_projection.weight" not in state:
            raise KeyError(
                "checkpoint has no visual_projection (plain CLIPVisionModel); "
                "use CLIPVisionConfig(projection_dim=None)"
            )
        params["visual_projection"] = {"kernel": _t(state["visual_projection.weight"])}
    return params
