"""Segment-Anything-class promptable instance segmentation (Flax).

Fills the reference's wild-mode class-agnostic segmenter role
(EntityV2/CropFormer, `src/model_wrappers.py:482-543`): a ViTDet image
encoder + prompt encoder + two-way-transformer mask decoder, driven by a
point grid to produce instance masks without labels. The module layout
matches `transformers.SamModel` module-for-module so released SAM
checkpoints (facebook/sam-vit-base/large/huge) load by rename
(`convert_sam` below); forward parity is tested against a transformers
oracle in tests/test_sam.py.

TPU-first notes:
  * windowed attention via static reshapes (window partition is pure
    layout; pad amounts are Python ints per bucket);
  * decomposed relative-position bias built as one einsum pair and fed to
    `jax.nn.dot_product_attention` as a bias tensor (fused softmax path);
  * the point grid for automatic mask generation runs as ONE decoder call
    over the prompt batch dimension — no per-prompt Python loop;
  * bf16 activations, f32 layernorms/softmax.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SamConfig:
    # vision encoder (ViTDet)
    width: int = 768
    depth: int = 12
    num_heads: int = 12
    image_size: int = 1024
    patch_size: int = 16
    window_size: int = 14
    global_attn_indexes: Sequence[int] = (2, 5, 8, 11)
    out_channels: int = 256
    mlp_ratio: float = 4.0
    # prompt encoder / mask decoder
    prompt_dim: int = 256
    num_pos_feats: int = 128
    mask_input_channels: int = 16
    decoder_depth: int = 2
    decoder_heads: int = 8
    decoder_mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @staticmethod
    def vit_base(**kw) -> "SamConfig":
        """facebook/sam-vit-base."""
        return SamConfig(**kw)

    @staticmethod
    def vit_large(**kw) -> "SamConfig":
        return SamConfig(width=1024, depth=24, num_heads=16,
                         global_attn_indexes=(5, 11, 17, 23), **kw)

    @staticmethod
    def vit_huge(**kw) -> "SamConfig":
        return SamConfig(width=1280, depth=32, num_heads=16,
                         global_attn_indexes=(7, 15, 23, 31), **kw)

    @staticmethod
    def tiny_test(**kw) -> "SamConfig":
        return SamConfig(
            width=32, depth=2, num_heads=2, image_size=64, patch_size=8,
            window_size=4, global_attn_indexes=(1,), out_channels=16,
            prompt_dim=16, num_pos_feats=8, mask_input_channels=4,
            decoder_heads=2, decoder_mlp_dim=32, iou_head_hidden_dim=16,
            **kw,
        )


# ------------------------------------------------------------ vision encoder


def _get_rel_pos(q_size: int, k_size: int, rel_pos: jnp.ndarray) -> jnp.ndarray:
    """Per-axis relative-position table lookup (HF get_rel_pos parity)."""
    max_rel_dist = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel_dist:
        rel_pos = jax.image.resize(
            rel_pos.astype(jnp.float32), (max_rel_dist, rel_pos.shape[1]),
            method="linear",
        )
    q_coords = np.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = np.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.astype(np.int64)]  # (q, k, C) — static index table


class _VisionAttention(nn.Module):
    """Global MHA with decomposed 2D relative position bias (ViTDet)."""

    cfg: SamConfig

    @nn.compact
    def __call__(self, x):  # (B, H, W, C) token grid
        cfg = self.cfg
        b, h, w, _ = x.shape
        head_dim = cfg.width // cfg.num_heads
        qkv = nn.Dense(3 * cfg.width, dtype=cfg.dtype,
                       param_dtype=cfg.param_dtype, name="qkv")(x)
        qkv = qkv.reshape(b, h * w, 3, cfg.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, h, d)

        rel_h = self.param("rel_pos_h", nn.initializers.zeros,
                           (2 * h - 1, head_dim))
        rel_w = self.param("rel_pos_w", nn.initializers.zeros,
                           (2 * w - 1, head_dim))
        rh = _get_rel_pos(h, h, rel_h)  # (h, h, d)
        rw = _get_rel_pos(w, w, rel_w)  # (w, w, d)
        qg = q.reshape(b, h, w, cfg.num_heads, head_dim).astype(jnp.float32)
        bias_h = jnp.einsum("bhwnc,hkc->bnhwk", qg, rh.astype(jnp.float32))
        bias_w = jnp.einsum("bhwnc,wkc->bnhwk", qg, rw.astype(jnp.float32))
        # bias_h (b,n,h,w,kh) broadcasts over kw; bias_w (b,n,h,w,kw) over
        # kh -> (B, heads, h, w, kh, kw) -> (B, heads, N, N)
        bias = bias_h[:, :, :, :, :, None] + bias_w[:, :, :, :, None, :]
        bias = bias.reshape(b, cfg.num_heads, h * w, h * w)

        out = jax.nn.dot_product_attention(
            q, k, v, bias=bias.astype(q.dtype)
        )
        out = out.reshape(b, h, w, cfg.width)
        return nn.Dense(cfg.width, dtype=cfg.dtype,
                        param_dtype=cfg.param_dtype, name="proj")(out)


class _VisionBlock(nn.Module):
    cfg: SamConfig
    window: int  # 0 = global

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        cfg = self.cfg
        res = x
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                         param_dtype=cfg.param_dtype, name="norm1")(x)
        x = x.astype(cfg.dtype)
        b, h, w, c = x.shape
        if self.window:
            ws = self.window
            ph, pw = (-h) % ws, (-w) % ws
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
            hp, wp = h + ph, w + pw
            x = x.reshape(b, hp // ws, ws, wp // ws, ws, c)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c)
        x = _VisionAttention(cfg, name="attn")(x)
        if self.window:
            x = x.reshape(b, hp // ws, wp // ws, ws, ws, c)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
            x = x[:, :h, :w]
        x = res + x
        y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                         param_dtype=cfg.param_dtype, name="norm2")(x)
        y = nn.Dense(int(cfg.width * cfg.mlp_ratio), dtype=cfg.dtype,
                     param_dtype=cfg.param_dtype, name="lin1")(y.astype(cfg.dtype))
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(cfg.width, dtype=cfg.dtype,
                     param_dtype=cfg.param_dtype, name="lin2")(y)
        return x + y


class SamVisionEncoder(nn.Module):
    """(B, S, S, 3) preprocessed pixels -> (B, g, g, out_channels)."""

    cfg: SamConfig

    @nn.compact
    def __call__(self, pixels):
        cfg = self.cfg
        b = pixels.shape[0]
        x = nn.Conv(cfg.width, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
                    dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                    name="patch_embed")(pixels.astype(cfg.dtype))
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, cfg.grid, cfg.grid, cfg.width))
        if pos.shape[1:3] != x.shape[1:3]:
            pos = jax.image.resize(
                pos, (1, x.shape[1], x.shape[2], cfg.width), method="bicubic"
            )
        x = x + pos.astype(cfg.dtype)
        for i in range(cfg.depth):
            win = 0 if i in cfg.global_attn_indexes else cfg.window_size
            x = _VisionBlock(cfg, win, name=f"block{i}")(x)
        # neck: 1x1 conv + LN + 3x3 conv + LN (channel-axis LN == HF's
        # channels_first SamLayerNorm on NCHW)
        x = nn.Conv(cfg.out_channels, (1, 1), use_bias=False, dtype=cfg.dtype,
                    param_dtype=cfg.param_dtype, name="neck_conv1")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                         param_dtype=cfg.param_dtype, name="neck_norm1")(x)
        x = nn.Conv(cfg.out_channels, (3, 3), padding=1, use_bias=False,
                    dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                    name="neck_conv2")(x.astype(cfg.dtype))
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                         param_dtype=cfg.param_dtype, name="neck_norm2")(x)
        return x.astype(cfg.dtype)


# --------------------------------------------------- prompts + mask decoder


class _FourierPE(nn.Module):
    """Random-Fourier point encoding shared by prompts and the image grid."""

    num_pos_feats: int

    @nn.compact
    def __call__(self, coords01):  # (..., 2) in [0, 1]
        mat = self.param("positional_embedding",
                         nn.initializers.normal(1.0, dtype=jnp.float32),
                         (2, self.num_pos_feats))
        c = 2.0 * coords01.astype(jnp.float32) - 1.0
        c = (2.0 * np.pi) * (c @ mat)
        return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)


class _DownAttention(nn.Module):
    """Attention with internal-dim downsampling (SamAttention parity)."""

    cfg: SamConfig
    downsample: int

    @nn.compact
    def __call__(self, q, k, v):  # (B, P, T, C) each
        cfg = self.cfg
        inner = cfg.prompt_dim // self.downsample
        heads = cfg.decoder_heads
        hd = inner // heads
        dense = lambda n, d: nn.Dense(  # noqa: E731
            d, dtype=jnp.float32, param_dtype=cfg.param_dtype, name=n
        )
        qp, kp, vp = dense("q_proj", inner)(q), dense("k_proj", inner)(k), dense("v_proj", inner)(v)

        def split(t):
            b, p, n, _ = t.shape
            return t.reshape(b * p, n, heads, hd)

        out = jax.nn.dot_product_attention(split(qp), split(kp), split(vp))
        out = out.reshape(q.shape[:3] + (inner,))
        return dense("out_proj", cfg.prompt_dim)(out)


class _TwoWayBlock(nn.Module):
    cfg: SamConfig
    skip_first_pe: bool

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        cfg = self.cfg
        ln = lambda n: nn.LayerNorm(  # noqa: E731
            epsilon=1e-6, dtype=jnp.float32, param_dtype=cfg.param_dtype, name=n
        )
        if self.skip_first_pe:
            queries = _DownAttention(cfg, 1, name="self_attn")(queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + _DownAttention(cfg, 1, name="self_attn")(q, q, queries)
        queries = ln("norm1")(queries)

        q, k = queries + query_pe, keys + key_pe
        queries = queries + _DownAttention(
            cfg, cfg.attention_downsample_rate, name="cross_attn_t2i")(q, k, keys)
        queries = ln("norm2")(queries)

        m = nn.Dense(cfg.decoder_mlp_dim, dtype=jnp.float32,
                     param_dtype=cfg.param_dtype, name="mlp_lin1")(queries)
        m = nn.relu(m)
        m = nn.Dense(cfg.prompt_dim, dtype=jnp.float32,
                     param_dtype=cfg.param_dtype, name="mlp_lin2")(m)
        queries = ln("norm3")(queries + m)

        q, k = queries + query_pe, keys + key_pe
        keys = keys + _DownAttention(
            cfg, cfg.attention_downsample_rate, name="cross_attn_i2t")(k, q, queries)
        keys = ln("norm4")(keys)
        return queries, keys


class _FeedForward(nn.Module):
    hidden: int
    out: int
    layers: int
    sigmoid_output: bool = False

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.hidden, dtype=jnp.float32, name="proj_in")(x))
        for i in range(self.layers - 2):
            x = nn.relu(nn.Dense(self.hidden, dtype=jnp.float32, name=f"layer{i}")(x))
        x = nn.Dense(self.out, dtype=jnp.float32, name="proj_out")(x)
        return jax.nn.sigmoid(x) if self.sigmoid_output else x


class SamMaskDecoder(nn.Module):
    cfg: SamConfig

    @nn.compact
    def __call__(self, image_embeddings, image_pe, sparse_embeddings,
                 dense_embeddings, multimask_output: bool = True):
        """image_embeddings (B, g, g, C); image_pe (1, g, g, C);
        sparse (B, P, T, C); dense (B, g, g, C) -> masks (B, P, M, 4g, 4g)
        logits + iou predictions (B, P, M)."""
        cfg = self.cfg
        b, gh, gw, c = image_embeddings.shape
        p = sparse_embeddings.shape[1]
        num_mask_tokens = cfg.num_multimask_outputs + 1

        iou_token = self.param("iou_token", nn.initializers.normal(1.0, jnp.float32),
                               (1, cfg.prompt_dim))
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(1.0, jnp.float32),
                                 (num_mask_tokens, cfg.prompt_dim))
        out_tokens = jnp.concatenate([iou_token, mask_tokens], axis=0)
        out_tokens = jnp.broadcast_to(out_tokens, (b, p) + out_tokens.shape)
        tokens = jnp.concatenate(
            [out_tokens, sparse_embeddings.astype(jnp.float32)], axis=2
        )

        src = (image_embeddings + dense_embeddings).astype(jnp.float32)
        keys = jnp.broadcast_to(
            src.reshape(b, 1, gh * gw, c), (b, p, gh * gw, c)
        )
        key_pe = jnp.broadcast_to(
            image_pe.reshape(1, 1, gh * gw, c), (b, p, gh * gw, c)
        ).astype(jnp.float32)

        queries, keys = tokens, keys
        for i in range(cfg.decoder_depth):
            queries, keys = _TwoWayBlock(cfg, skip_first_pe=(i == 0),
                                         name=f"layer{i}")(queries, keys, tokens, key_pe)
        q = queries + tokens
        k = keys + key_pe
        queries = queries + _DownAttention(
            cfg, cfg.attention_downsample_rate, name="final_attn")(q, k, keys)
        queries = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                               param_dtype=cfg.param_dtype,
                               name="norm_final")(queries)

        iou_out = queries[:, :, 0]
        mask_out = queries[:, :, 1 : 1 + num_mask_tokens]

        up = keys.reshape(b * p, gh, gw, c)
        up = nn.ConvTranspose(c // 4, (2, 2), strides=(2, 2), dtype=jnp.float32,
                              param_dtype=cfg.param_dtype, name="upscale_conv1")(up)
        up = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                          param_dtype=cfg.param_dtype, name="upscale_norm")(up)
        up = nn.gelu(up, approximate=False)
        up = nn.ConvTranspose(c // 8, (2, 2), strides=(2, 2), dtype=jnp.float32,
                              param_dtype=cfg.param_dtype, name="upscale_conv2")(up)
        up = nn.gelu(up, approximate=False)  # (B*P, 4g, 4g, c/8)

        hyper = jnp.stack(
            [
                _FeedForward(cfg.prompt_dim, c // 8, 3, name=f"hyper{i}")(mask_out[:, :, i])
                for i in range(num_mask_tokens)
            ],
            axis=2,
        )  # (B, P, M, c/8)
        up = up.reshape(b, p, 4 * gh * 4 * gw, c // 8)
        masks = jnp.einsum("bpmc,bpnc->bpmn", hyper, up)
        masks = masks.reshape(b, p, num_mask_tokens, 4 * gh, 4 * gw)

        iou_pred = _FeedForward(cfg.iou_head_hidden_dim, num_mask_tokens,
                                cfg.iou_head_depth, name="iou_head")(iou_out)
        sl = slice(1, None) if multimask_output else slice(0, 1)
        return masks[:, :, sl], iou_pred[:, :, sl]


class SamCore(nn.Module):
    """Full promptable model: pixels + point prompts -> mask logits.

    input_points (B, P, N, 2) in pixel coords of the model input frame;
    input_labels (B, P, N): 1 fg / 0 bg / -1 not-a-point / -10 pad.
    """

    cfg: SamConfig

    def setup(self):
        cfg = self.cfg
        self.vision = SamVisionEncoder(cfg, name="vision")
        self.pe = _FourierPE(cfg.num_pos_feats, name="shared_pe")
        self.decoder = SamMaskDecoder(cfg, name="decoder")
        self.point_embed = self.param(
            "point_embed", nn.initializers.normal(1.0, jnp.float32),
            (4, cfg.prompt_dim),
        )
        self.not_a_point = self.param(
            "not_a_point", nn.initializers.normal(1.0, jnp.float32),
            (cfg.prompt_dim,),
        )
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0, jnp.float32),
            (cfg.prompt_dim,),
        )

    def _image_pe(self, g: int):
        ar = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
        yy, xx = jnp.meshgrid(ar, ar, indexing="ij")
        return self.pe(jnp.stack([xx, yy], axis=-1))[None]  # (1, g, g, C)

    def _embed_points(self, points, labels, pad: bool):
        cfg = self.cfg
        pts = points.astype(jnp.float32) + 0.5
        if pad:
            pts = jnp.concatenate(
                [pts, jnp.zeros(pts.shape[:2] + (1, 2), jnp.float32)], axis=2
            )
            labels = jnp.concatenate(
                [labels, -jnp.ones(labels.shape[:2] + (1,), labels.dtype)], axis=2
            )
        emb = self.pe(pts / cfg.image_size)
        lab = labels[..., None]
        emb = jnp.where(lab == -1, self.not_a_point, emb)
        emb = jnp.where(lab == -10, 0.0, emb)
        emb = jnp.where(lab == 0, emb + self.point_embed[0], emb)
        emb = jnp.where(lab == 1, emb + self.point_embed[1], emb)
        return emb

    def __call__(self, pixels, input_points, input_labels,
                 multimask_output: bool = True):
        image_embeddings = self.vision(pixels)
        g = image_embeddings.shape[1]
        sparse = self._embed_points(input_points, input_labels, pad=True)
        dense = jnp.broadcast_to(
            self.no_mask_embed.reshape(1, 1, 1, -1), image_embeddings.shape
        )
        return self.decoder(
            image_embeddings, self._image_pe(g), sparse, dense,
            multimask_output=multimask_output,
        )

    def decode(self, image_embeddings, input_points, input_labels,
               multimask_output: bool = True):
        """Decoder-only path over precomputed image embeddings (the encoder
        runs once per image; prompts batch over P)."""
        g = image_embeddings.shape[1]
        sparse = self._embed_points(input_points, input_labels, pad=True)
        dense = jnp.broadcast_to(
            self.no_mask_embed.reshape(1, 1, 1, -1), image_embeddings.shape
        )
        return self.decoder(
            image_embeddings, self._image_pe(g), sparse, dense,
            multimask_output=multimask_output,
        )


# --------------------------------------------------------------- converter


def _t(w):
    return np.asarray(w).T


def _lin(state, pre):
    d = {"kernel": _t(state[pre + ".weight"])}
    if pre + ".bias" in state:
        d["bias"] = np.asarray(state[pre + ".bias"])
    return d


def _ln(state, pre):
    return {"scale": np.asarray(state[pre + ".weight"]),
            "bias": np.asarray(state[pre + ".bias"])}


def _conv_k(w):
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def _deconv_k(w):
    k = np.transpose(np.asarray(w), (2, 3, 0, 1))
    return np.ascontiguousarray(k[::-1, ::-1])


def _down_attn(state, pre):
    return {
        "q_proj": _lin(state, pre + ".q_proj"),
        "k_proj": _lin(state, pre + ".k_proj"),
        "v_proj": _lin(state, pre + ".v_proj"),
        "out_proj": _lin(state, pre + ".out_proj"),
    }


def _feed_forward(state, pre, num_layers):
    d = {"proj_in": _lin(state, pre + ".proj_in"),
         "proj_out": _lin(state, pre + ".proj_out")}
    for i in range(num_layers - 2):
        d[f"layer{i}"] = _lin(state, pre + f".layers.{i}")
    return d


def convert_sam(state: dict, cfg: SamConfig) -> dict:
    """transformers SamModel state_dict -> SamCore Flax params."""
    state = {k: v for k, v in state.items()}
    num_mask_tokens = cfg.num_multimask_outputs + 1

    vision = {
        "patch_embed": {
            "kernel": _conv_k(state["vision_encoder.patch_embed.projection.weight"]),
            "bias": np.asarray(state["vision_encoder.patch_embed.projection.bias"]),
        },
        "pos_embed": np.asarray(state["vision_encoder.pos_embed"]),
        "neck_conv1": {"kernel": _conv_k(state["vision_encoder.neck.conv1.weight"])},
        "neck_norm1": _ln(state, "vision_encoder.neck.layer_norm1"),
        "neck_conv2": {"kernel": _conv_k(state["vision_encoder.neck.conv2.weight"])},
        "neck_norm2": _ln(state, "vision_encoder.neck.layer_norm2"),
    }
    for i in range(cfg.depth):
        pre = f"vision_encoder.layers.{i}"
        vision[f"block{i}"] = {
            "norm1": _ln(state, pre + ".layer_norm1"),
            "norm2": _ln(state, pre + ".layer_norm2"),
            "attn": {
                "qkv": _lin(state, pre + ".attn.qkv"),
                "proj": _lin(state, pre + ".attn.proj"),
                "rel_pos_h": np.asarray(state[pre + ".attn.rel_pos_h"]),
                "rel_pos_w": np.asarray(state[pre + ".attn.rel_pos_w"]),
            },
            "lin1": _lin(state, pre + ".mlp.lin1"),
            "lin2": _lin(state, pre + ".mlp.lin2"),
        }

    def two_way(pre):
        return {
            "self_attn": _down_attn(state, pre + ".self_attn"),
            "cross_attn_t2i": _down_attn(state, pre + ".cross_attn_token_to_image"),
            "cross_attn_i2t": _down_attn(state, pre + ".cross_attn_image_to_token"),
            "norm1": _ln(state, pre + ".layer_norm1"),
            "norm2": _ln(state, pre + ".layer_norm2"),
            "norm3": _ln(state, pre + ".layer_norm3"),
            "norm4": _ln(state, pre + ".layer_norm4"),
            "mlp_lin1": _lin(state, pre + ".mlp.lin1"),
            "mlp_lin2": _lin(state, pre + ".mlp.lin2"),
        }

    decoder = {
        "iou_token": np.asarray(state["mask_decoder.iou_token.weight"]),
        "mask_tokens": np.asarray(state["mask_decoder.mask_tokens.weight"]),
        "final_attn": _down_attn(
            state, "mask_decoder.transformer.final_attn_token_to_image"),
        "norm_final": _ln(state, "mask_decoder.transformer.layer_norm_final_attn"),
        "upscale_conv1": {
            "kernel": _deconv_k(state["mask_decoder.upscale_conv1.weight"]),
            "bias": np.asarray(state["mask_decoder.upscale_conv1.bias"]),
        },
        "upscale_conv2": {
            "kernel": _deconv_k(state["mask_decoder.upscale_conv2.weight"]),
            "bias": np.asarray(state["mask_decoder.upscale_conv2.bias"]),
        },
        "upscale_norm": _ln(state, "mask_decoder.upscale_layer_norm"),
        "iou_head": _feed_forward(
            state, "mask_decoder.iou_prediction_head", cfg.iou_head_depth),
    }
    for i in range(cfg.decoder_depth):
        decoder[f"layer{i}"] = two_way(f"mask_decoder.transformer.layers.{i}")
    for i in range(num_mask_tokens):
        decoder[f"hyper{i}"] = _feed_forward(
            state, f"mask_decoder.output_hypernetworks_mlps.{i}", 3)

    return {
        "vision": vision,
        "decoder": decoder,
        "shared_pe": {
            "positional_embedding": np.asarray(
                state["shared_image_embedding.positional_embedding"]
            )
        },
        "point_embed": np.stack(
            [np.asarray(state[f"prompt_encoder.point_embed.{i}.weight"])[0]
             for i in range(4)]
        ),
        "not_a_point": np.asarray(
            state["prompt_encoder.not_a_point_embed.weight"])[0],
        "no_mask_embed": np.asarray(
            state["prompt_encoder.no_mask_embed.weight"])[0],
    }


# ------------------------------------------------- automatic mask generation

SAM_IMAGE_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
SAM_IMAGE_STD = np.array([58.395, 57.12, 57.375], np.float32)


class SamAutoSegmentation:
    """Class-agnostic instance masks from a point grid (the EntityV2 role).

    One encoder pass per image; the grid prompts run through the decoder in
    fixed-size chunks of `prompt_chunk` (one compiled program, reused across
    chunks), then IoU-ordered NMS dedup on host. Matches the segment-anything
    automatic mask generator's structure with TPU-friendly static shapes.

    `points_per_side` is the coverage/cost knob: segment-anything defaults to
    32 (1024 prompts); 16 (256 prompts, 4 decoder calls) recovers most small
    objects in wild photos; 8 (64 prompts, 1 call) is the cheap setting and
    can miss small/thin instances. Decoder cost scales linearly with
    points_per_side**2; the encoder pass is shared.
    """

    def __init__(self, cfg: SamConfig | None = None, params=None,
                 points_per_side: int = 16, pred_iou_thresh: float = 0.7,
                 stability_offset: float = 1.0, stability_thresh: float = 0.95,
                 nms_iou: float = 0.7,
                 min_area_frac: float = 0.0005, seed: int = 0,
                 prompt_chunk: int = 64):
        self.cfg = cfg or SamConfig.vit_base()
        self.model = SamCore(self.cfg)
        self.params = params
        self.points_per_side = points_per_side
        self.pred_iou_thresh = pred_iou_thresh
        self.stability_offset = stability_offset
        self.stability_thresh = stability_thresh
        self.nms_iou = nms_iou
        self.min_area_frac = min_area_frac
        self.prompt_chunk = prompt_chunk
        self._seed = seed
        self._encode = None
        self._decode = None

    def _ensure(self):
        if self.params is None:
            from labelany3d_tpu.utils.logging import warn_once

            warn_once(
                "sam_random",
                "SAM segmenter runs with random-initialized weights (no "
                "converted checkpoint) — wild-mode instances are not "
                "meaningful; see docs/WEIGHTS.md",
            )
            s = self.cfg.image_size
            pts = jnp.zeros((1, 1, 1, 2), jnp.float32)
            labs = jnp.ones((1, 1, 1), jnp.int32)
            self.params = self.model.init(
                jax.random.PRNGKey(self._seed), jnp.zeros((1, s, s, 3)),
                pts, labs,
            )["params"]
        if self._encode is None:
            venc = SamVisionEncoder(self.cfg)
            self._encode = jax.jit(lambda p, x: venc.apply({"params": p}, x))
            self._decode = jax.jit(
                lambda p, emb, pts, labs: self.model.apply(
                    {"params": p}, emb, pts, labs, method=SamCore.decode
                )
            )

    def segment(self, image: np.ndarray) -> list[np.ndarray]:
        """uint8 RGB (H, W, 3) -> list of boolean instance masks (H, W)."""
        from PIL import Image

        self._ensure()
        h, w = image.shape[:2]
        s = self.cfg.image_size
        proc = np.asarray(Image.fromarray(image).resize((s, s), Image.BILINEAR))
        x = (proc.astype(np.float32) - SAM_IMAGE_MEAN) / SAM_IMAGE_STD

        g = self.points_per_side
        ar = (np.arange(g) + 0.5) / g * s
        xx, yy = np.meshgrid(ar, ar)
        pts = np.stack([xx.ravel(), yy.ravel()], axis=-1)  # (g*g, 2)

        emb = self._encode(self.params["vision"], jnp.asarray(x)[None])
        # Decode in fixed-size prompt chunks: every call has the identical
        # (1, prompt_chunk, 1, 2) shape, so one compiled program serves all
        # chunks and points_per_side can grow without re-jitting or a single
        # oversized decoder batch.
        chunk = min(self.prompt_chunk, g * g)
        n_pad = -len(pts) % chunk
        pts_pad = np.concatenate([pts, np.zeros((n_pad, 2), np.float32)])
        mask_chunks, iou_chunks = [], []
        labs = jnp.ones((1, chunk, 1), jnp.int32)
        for c0 in range(0, len(pts_pad), chunk):
            cp = jnp.asarray(pts_pad[None, c0:c0 + chunk, None, :], jnp.float32)
            m, i = self._decode(self.params, emb, cp, labs)
            mask_chunks.append(np.asarray(m[0], np.float32))
            iou_chunks.append(np.asarray(i[0], np.float32))
        masks = np.concatenate(mask_chunks)[:len(pts)]  # (P, 3, 4g, 4g) logits
        iou = np.concatenate(iou_chunks)[:len(pts)]     # (P, 3)

        best = iou.argmax(axis=1)
        sel_masks = masks[np.arange(masks.shape[0]), best]
        sel_iou = iou[np.arange(iou.shape[0]), best]
        # Stability score (segment-anything's second quality filter): how
        # little the mask area changes when the logit threshold moves by
        # +/- stability_offset around 0.
        hi = (sel_masks > self.stability_offset).sum(axis=(-1, -2))
        lo = (sel_masks > -self.stability_offset).sum(axis=(-1, -2))
        stability = hi / np.maximum(lo, 1)

        min_area = self.min_area_frac * sel_masks.shape[-1] * sel_masks.shape[-2]
        bin_masks = sel_masks > 0.0
        areas = bin_masks.sum(axis=(-1, -2)).astype(np.float64)
        ok = ((sel_iou >= self.pred_iou_thresh)
              & (stability >= self.stability_thresh)
              & (areas >= min_area))
        cand = np.nonzero(ok)[0]
        cand = cand[np.argsort(-sel_iou[cand])]
        # Greedy NMS with a precomputed pairwise IoU matrix: survivors'
        # masks are 4x-strided (dedup at 0.7 IoU is insensitive to that)
        # and intersections come from one float matmul instead of the
        # O(n^2) Python mask-pair loop.
        kept_idx: list[int] = []
        if len(cand):
            flat = bin_masks[cand][:, ::4, ::4].reshape(len(cand), -1).astype(np.float32)
            inter = flat @ flat.T
            ar = flat.sum(axis=1)
            iou_mat = inter / (ar[:, None] + ar[None, :] - inter + 1e-9)
            kept_pos: list[int] = []
            for j in range(len(cand)):
                if all(iou_mat[j, k] <= self.nms_iou for k in kept_pos):
                    kept_pos.append(j)
            kept_idx = [int(cand[j]) for j in kept_pos]
        out = []
        for i in kept_idx:
            m = bin_masks[i]
            mi = np.asarray(
                Image.fromarray(m.astype(np.uint8) * 255).resize((w, h), Image.NEAREST)
            ) > 127
            out.append(mi)
        return out
