"""SegFormer semantic segmentation (Flax) — the ADE20K thing/stuff filter.

Fills the reference's OneFormer role (`src/model_wrappers.py:588-610`,
thing/stuff overrides :91-119): a hierarchical MiT encoder + all-MLP decode
head producing ADE20K-150 semantic logits, used to decide which wild-mode
instance masks sit on "thing" pixels. The module layout matches
`transformers.SegformerForSemanticSegmentation` module-for-module so
released ADE20K checkpoints (nvidia/segformer-b{0..5}-finetuned-ade-512-512)
load by rename (`convert_segformer`); parity is tested against a
transformers oracle in tests/test_segformer.py.

TPU-first notes: the efficient attention's sequence reduction is a strided
conv (static shapes per stage); attention via
`jax.nn.dot_product_attention`; BatchNorm folds to an affine at inference.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SegFormerConfig:
    hidden_sizes: Sequence[int] = (32, 64, 160, 256)
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (1, 2, 5, 8)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    patch_sizes: Sequence[int] = (7, 3, 3, 3)
    strides: Sequence[int] = (4, 2, 2, 2)
    mlp_ratios: Sequence[int] = (4, 4, 4, 4)
    decoder_hidden: int = 256
    num_labels: int = 150
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @staticmethod
    def b0(**kw) -> "SegFormerConfig":
        """nvidia/segformer-b0-finetuned-ade-512-512."""
        return SegFormerConfig(**kw)

    @staticmethod
    def b2(**kw) -> "SegFormerConfig":
        return SegFormerConfig(
            hidden_sizes=(64, 128, 320, 512), depths=(3, 4, 6, 3),
            decoder_hidden=768, **kw,
        )

    @staticmethod
    def tiny_test(**kw) -> "SegFormerConfig":
        return SegFormerConfig(
            hidden_sizes=(8, 16), depths=(1, 1), num_heads=(1, 2),
            sr_ratios=(2, 1), patch_sizes=(7, 3), strides=(4, 2),
            mlp_ratios=(2, 2), decoder_hidden=16, num_labels=6, **kw,
        )


class _EfficientAttention(nn.Module):
    cfg: SegFormerConfig
    dim: int
    heads: int
    sr: int

    @nn.compact
    def __call__(self, x, h, w):  # x (B, N, C)
        cfg = self.cfg
        b, n, c = x.shape
        hd = self.dim // self.heads
        q = nn.Dense(self.dim, dtype=jnp.float32, param_dtype=cfg.param_dtype,
                     name="query")(x)
        kv_in = x
        if self.sr > 1:
            g = x.reshape(b, h, w, c)
            g = nn.Conv(self.dim, (self.sr, self.sr), strides=(self.sr, self.sr),
                        dtype=jnp.float32, param_dtype=cfg.param_dtype,
                        name="sr")(g)
            kv_in = g.reshape(b, -1, self.dim)
            kv_in = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                 param_dtype=cfg.param_dtype, name="sr_norm")(kv_in)
        k = nn.Dense(self.dim, dtype=jnp.float32, param_dtype=cfg.param_dtype,
                     name="key")(kv_in)
        v = nn.Dense(self.dim, dtype=jnp.float32, param_dtype=cfg.param_dtype,
                     name="value")(kv_in)

        def split(t):
            return t.reshape(t.shape[0], t.shape[1], self.heads, hd)

        out = jax.nn.dot_product_attention(split(q), split(k), split(v))
        out = out.reshape(b, n, self.dim)
        return nn.Dense(self.dim, dtype=jnp.float32, param_dtype=cfg.param_dtype,
                        name="out")(out)


class _MixFFN(nn.Module):
    cfg: SegFormerConfig
    dim: int
    hidden: int

    @nn.compact
    def __call__(self, x, h, w):
        cfg = self.cfg
        b, n, c = x.shape
        x = nn.Dense(self.hidden, dtype=jnp.float32, param_dtype=cfg.param_dtype,
                     name="dense1")(x)
        g = x.reshape(b, h, w, self.hidden)
        g = nn.Conv(self.hidden, (3, 3), padding=1,
                    feature_group_count=self.hidden, dtype=jnp.float32,
                    param_dtype=cfg.param_dtype, name="dwconv")(g)
        x = g.reshape(b, n, self.hidden)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.dim, dtype=jnp.float32, param_dtype=cfg.param_dtype,
                        name="dense2")(x)


class _Stage(nn.Module):
    cfg: SegFormerConfig
    idx: int

    @nn.compact
    def __call__(self, x):  # (B, H, W, Cin) pixels or previous stage map
        cfg = self.cfg
        i = self.idx
        p, s = cfg.patch_sizes[i], cfg.strides[i]
        x = nn.Conv(cfg.hidden_sizes[i], (p, p), strides=(s, s), padding=p // 2,
                    dtype=jnp.float32, param_dtype=cfg.param_dtype,
                    name="patch_proj")(x)
        b, h, w, c = x.shape
        x = x.reshape(b, h * w, c)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=cfg.param_dtype, name="patch_norm")(x)
        for j in range(cfg.depths[i]):
            y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                             param_dtype=cfg.param_dtype, name=f"norm1_{j}")(x)
            y = _EfficientAttention(cfg, c, cfg.num_heads[i], cfg.sr_ratios[i],
                                    name=f"attn_{j}")(y, h, w)
            x = x + y
            y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                             param_dtype=cfg.param_dtype, name=f"norm2_{j}")(x)
            y = _MixFFN(cfg, c, c * cfg.mlp_ratios[i], name=f"ffn_{j}")(y, h, w)
            x = x + y
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=cfg.param_dtype, name="stage_norm")(x)
        return x.reshape(b, h, w, c)


class SegFormer(nn.Module):
    """(B, H, W, 3) preprocessed pixels -> (B, H/4, W/4, num_labels) logits."""

    cfg: SegFormerConfig

    @nn.compact
    def __call__(self, pixels):
        cfg = self.cfg
        feats = []
        x = pixels.astype(jnp.float32)
        for i in range(len(cfg.depths)):
            x = _Stage(cfg, i, name=f"stage{i}")(x)
            feats.append(x)
        th, tw = feats[0].shape[1:3]
        ups = []
        for i, f in enumerate(feats):
            f = nn.Dense(cfg.decoder_hidden, dtype=jnp.float32,
                         param_dtype=cfg.param_dtype, name=f"linear_c{i}")(f)
            if f.shape[1:3] != (th, tw):
                f = jax.image.resize(
                    f, (f.shape[0], th, tw, cfg.decoder_hidden), method="bilinear"
                )
            ups.append(f)
        x = jnp.concatenate(ups[::-1], axis=-1)
        x = nn.Conv(cfg.decoder_hidden, (1, 1), use_bias=False,
                    dtype=jnp.float32, param_dtype=cfg.param_dtype,
                    name="linear_fuse")(x)
        # Inference-mode BatchNorm: affine with running statistics.
        mean = self.param("bn_mean", nn.initializers.zeros, (cfg.decoder_hidden,))
        var = self.param("bn_var", nn.initializers.ones, (cfg.decoder_hidden,))
        scale = self.param("bn_scale", nn.initializers.ones, (cfg.decoder_hidden,))
        bias = self.param("bn_bias", nn.initializers.zeros, (cfg.decoder_hidden,))
        x = (x - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias
        x = nn.relu(x)
        return nn.Conv(cfg.num_labels, (1, 1), dtype=jnp.float32,
                       param_dtype=cfg.param_dtype, name="classifier")(x)


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


def _conv(state, pre, bias=True):
    d = {"kernel": np.ascontiguousarray(
        np.transpose(np.asarray(state[pre + ".weight"]), (2, 3, 1, 0)))}
    if bias and pre + ".bias" in state:
        d["bias"] = np.asarray(state[pre + ".bias"])
    return d


def convert_segformer(state: dict, cfg: SegFormerConfig) -> dict:
    """transformers SegformerForSemanticSegmentation state_dict -> params."""
    params: dict = {}
    enc = "segformer.encoder"
    for i in range(len(cfg.depths)):
        stage: dict = {
            "patch_proj": _conv(state, f"{enc}.patch_embeddings.{i}.proj"),
            "patch_norm": _ln(state, f"{enc}.patch_embeddings.{i}.layer_norm"),
            "stage_norm": _ln(state, f"{enc}.layer_norm.{i}"),
        }
        for j in range(cfg.depths[i]):
            blk = f"{enc}.block.{i}.{j}"
            stage[f"norm1_{j}"] = _ln(state, blk + ".layer_norm_1")
            stage[f"norm2_{j}"] = _ln(state, blk + ".layer_norm_2")
            attn = {
                "query": _lin(state, blk + ".attention.self.query"),
                "key": _lin(state, blk + ".attention.self.key"),
                "value": _lin(state, blk + ".attention.self.value"),
                "out": _lin(state, blk + ".attention.output.dense"),
            }
            if cfg.sr_ratios[i] > 1:
                attn["sr"] = _conv(state, blk + ".attention.self.sr")
                attn["sr_norm"] = _ln(state, blk + ".attention.self.layer_norm")
            stage[f"attn_{j}"] = attn
            dw = np.asarray(state[blk + ".mlp.dwconv.dwconv.weight"])
            stage[f"ffn_{j}"] = {
                "dense1": _lin(state, blk + ".mlp.dense1"),
                "dense2": _lin(state, blk + ".mlp.dense2"),
                # torch depthwise (C, 1, 3, 3) -> flax grouped (3, 3, 1, C)
                "dwconv": {
                    "kernel": np.ascontiguousarray(dw.transpose(2, 3, 1, 0)),
                    "bias": np.asarray(state[blk + ".mlp.dwconv.dwconv.bias"]),
                },
            }
        params[f"stage{i}"] = stage
    for i in range(len(cfg.depths)):
        params[f"linear_c{i}"] = _lin(state, f"decode_head.linear_c.{i}.proj")
    params["linear_fuse"] = _conv(state, "decode_head.linear_fuse", bias=False)
    params["bn_scale"] = np.asarray(state["decode_head.batch_norm.weight"])
    params["bn_bias"] = np.asarray(state["decode_head.batch_norm.bias"])
    params["bn_mean"] = np.asarray(state["decode_head.batch_norm.running_mean"])
    params["bn_var"] = np.asarray(state["decode_head.batch_norm.running_var"])
    params["classifier"] = _conv(state, "decode_head.classifier")
    return params


# ------------------------------------------------------- thing/stuff filter

# ADE20K-150 id2label as shipped in the HF SegFormer ADE checkpoints'
# config.json (nvidia/segformer-*-finetuned-ade-512-512). Used as the
# fallback when no config.json rides next to the installed .pth; public
# constant table.
ADE20K_ID2LABEL = {i: n for i, n in enumerate([
    "wall", "building", "sky", "floor", "tree", "ceiling", "road", "bed ",
    "windowpane", "grass", "cabinet", "sidewalk", "person", "earth", "door",
    "table", "mountain", "plant", "curtain", "chair", "car", "water",
    "painting", "sofa", "shelf", "house", "sea", "mirror", "rug", "field",
    "armchair", "seat", "fence", "desk", "rock", "wardrobe", "lamp",
    "bathtub", "railing", "cushion", "base", "box", "column", "signboard",
    "chest of drawers", "counter", "sand", "sink", "skyscraper",
    "fireplace", "refrigerator", "grandstand", "path", "stairs", "runway",
    "case", "pool table", "pillow", "screen door", "stairway", "river",
    "bridge", "bookcase", "blind", "coffee table", "toilet", "flower",
    "book", "hill", "bench", "countertop", "stove", "palm",
    "kitchen island", "computer", "swivel chair", "boat", "bar",
    "arcade machine", "hovel", "bus", "towel", "light", "truck", "tower",
    "chandelier", "awning", "streetlight", "booth", "television receiver",
    "airplane", "dirt track", "apparel", "pole", "land", "bannister",
    "escalator", "ottoman", "bottle", "buffet", "poster", "stage", "van",
    "ship", "fountain", "conveyer belt", "canopy", "washer", "plaything",
    "swimming pool", "stool", "barrel", "basket", "waterfall", "tent",
    "bag", "minibike", "cradle", "oven", "ball", "food", "step", "tank",
    "trade name", "microwave", "pot", "animal", "bicycle", "lake",
    "dishwasher", "screen", "blanket", "sculpture", "hood", "sconce",
    "vase", "traffic light", "tray", "ashcan", "fan", "pier", "crt screen",
    "plate", "monitor", "bulletin board", "shower", "radiator", "glass",
    "clock", "flag",
])}


def _norm_label(name: str) -> str:
    """Normalize a class name across naming conventions (HF short names vs
    detectron2's comma lists like 'column, pillar'): first comma segment,
    stripped, lowercased."""
    return name.split(",")[0].strip().lower()


# ADE20K "stuff" classes (amorphous regions, detectron2 isthing=0) in
# normalized short names, adjusted exactly as the reference adjusts
# OneFormer's metadata (`src/model_wrappers.py:91-119`): its `my_stuff`
# names demoted from thing to stuff, `my_thing` names promoted back.
_BASE_STUFF = {
    "wall", "building", "sky", "floor", "tree", "ceiling", "road", "grass",
    "sidewalk", "earth", "mountain", "water", "sea", "field", "sand",
    "hill", "path", "runway", "dirt track", "land", "lake", "river",
    "stage", "waterfall", "swimming pool",
}
# my_stuff (model_wrappers.py:92-104), normalized: 'window ' matches both
# HF 'windowpane' and detectron2 'window'; 'rail' matches 'railing';
# 'column, pillar' -> 'column'; etc.
_MY_STUFF = {
    "window", "windowpane", "door", "curtain", "mirror", "fence", "rail",
    "railing", "column", "stairs", "screen door", "bannister", "step",
    "stairway", "escalator", "bridge", "fountain", "pier",
}
# my_thing promotions (model_wrappers.py:106-112).
_MY_THING = {"plant", "tent", "crt screen", "cradle", "blanket"}

ADE20K_STUFF_NAMES = frozenset((_BASE_STUFF | _MY_STUFF) - _MY_THING)


def thing_ids_from_id2label(id2label: dict) -> "np.ndarray":
    """Class indices whose (normalized) name is a thing under the
    reference-adjusted ADE20K split."""
    return np.array(
        [int(i) for i, name in id2label.items()
         if _norm_label(name) not in ADE20K_STUFF_NAMES],
        np.int64,
    )


class SegformerForeground:
    """ForegroundBackend serving the OneFormer fg/bg-filter role: a pixel is
    foreground when its argmax semantic class is a thing class."""

    def __init__(self, cfg: SegFormerConfig | None = None, params=None,
                 id2label: dict[int, str] | None = None,
                 input_size: int = 512, seed: int = 0):
        self.cfg = cfg or SegFormerConfig.b0()
        self.model = SegFormer(self.cfg)
        self.params = params
        self.input_size = input_size
        self._seed = seed
        self._jit = None
        if id2label is None and self.cfg.num_labels == len(ADE20K_ID2LABEL):
            id2label = ADE20K_ID2LABEL  # the shipped ADE20K-150 mapping
        if id2label is None:
            id2label = {i: f"class_{i}" for i in range(self.cfg.num_labels)}
        self.thing_ids = thing_ids_from_id2label(id2label)
        if len(self.thing_ids) >= self.cfg.num_labels:
            from labelany3d_tpu.utils.logging import warn_once

            warn_once(
                "segformer_all_things",
                "thing/stuff filter covers every class (no stuff name "
                "matched id2label) — foreground() degenerates to all-True; "
                "check the checkpoint's id2label naming",
            )

    def _ensure(self):
        if self.params is None:
            from labelany3d_tpu.utils.logging import warn_once

            warn_once(
                "segformer_random",
                "semantic filter runs a random-initialized SegFormer (no "
                "ADE20K checkpoint) — thing/stuff filtering is not "
                "meaningful; see docs/WEIGHTS.md",
            )
            s = self.input_size
            self.params = self.model.init(
                jax.random.PRNGKey(self._seed), jnp.zeros((1, s, s, 3))
            )["params"]
        if self._jit is None:
            self._jit = jax.jit(
                lambda p, x: jnp.argmax(
                    self.model.apply({"params": p}, x), axis=-1
                )
            )

    def semantic(self, image: np.ndarray) -> np.ndarray:
        """uint8 RGB (H, W, 3) -> (H, W) int class map."""
        from PIL import Image

        self._ensure()
        h, w = image.shape[:2]
        s = self.input_size
        proc = np.asarray(Image.fromarray(image).resize((s, s), Image.BILINEAR))
        x = (proc.astype(np.float32) / 255.0 - np.array([0.485, 0.456, 0.406]))
        x = x / np.array([0.229, 0.224, 0.225])
        cls = np.asarray(self._jit(self.params, jnp.asarray(x, jnp.float32)[None])[0])
        return np.asarray(
            Image.fromarray(cls.astype(np.int32), mode="I").resize((w, h), Image.NEAREST)
        )

    def foreground(self, image: np.ndarray) -> np.ndarray:
        cls = self.semantic(image)
        return np.isin(cls, self.thing_ids)
