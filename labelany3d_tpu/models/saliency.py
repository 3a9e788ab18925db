"""IS-Net salient-object segmentation (the reference's rembg role).

Parity targets:
  * `src/util.py:163-168` `segment_completed`: after amodal completion the
    reference re-segments the completed crop with
    `rembg.remove(..., new_session("isnet-general-use"), post_process_mask=True)`
    and forces original-mask pixels opaque.
  * `external/TRELLIS/trellis/pipelines/trellis_image_to_3d.py:103-105` and
    `external/Hunyuan3D-1/infer/removebg.py:6-12`: background removal
    before reconstruction when the crop has no alpha channel.

The model is the public IS-Net / DIS architecture (ISNetDIS: a U^2-Net of
RSU "residual U-blocks"), re-implemented NHWC in Flax with inference-mode
BatchNorm (running stats as explicit params, like `models/segformer.py`).
`convert_isnet` renames the released `isnet-general-use.pth` torch
state-dict. TPU-first notes: the whole forward is one fused XLA program —
dilated 3x3 convs lower onto the MXU, bilinear `jax.image.resize`
upsampling matches torch `interpolate(align_corners=False)`, and the
pooling ladder stays static-shaped for any /64-divisible input.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# (block_kind, mid_channels, out_channels) per stage. Kind "4F" is the
# fully-dilated RSU (no pooling); integers are the RSU depth L.
_Stage = tuple[Any, int, int]


@dataclasses.dataclass(frozen=True)
class ISNetConfig:
    conv_in: int = 64
    # encoder stage1..stage6 (ISNetDIS.__init__)
    enc: Sequence[_Stage] = (
        (7, 32, 64), (6, 32, 128), (5, 64, 256),
        (4, 128, 512), ("4F", 256, 512), ("4F", 256, 512),
    )
    # decoder stage5d..stage1d
    dec: Sequence[_Stage] = (
        ("4F", 256, 512), (4, 128, 256), (5, 64, 128),
        (6, 32, 64), (7, 16, 64),
    )
    param_dtype: Any = jnp.float32

    @staticmethod
    def general_use(**kw) -> "ISNetConfig":
        """isnet-general-use.pth shape (input 1024^2)."""
        return ISNetConfig(**kw)

    @staticmethod
    def tiny_test(**kw) -> "ISNetConfig":
        return ISNetConfig(
            conv_in=8,
            enc=((7, 4, 8), (6, 4, 16), (5, 8, 32),
                 (4, 16, 64), ("4F", 32, 64), ("4F", 32, 64)),
            dec=(("4F", 32, 64), (4, 16, 32), (5, 8, 16),
                 (6, 4, 8), (7, 2, 8)),
            **kw,
        )


class _REBNConv(nn.Module):
    """REBNCONV: dilated 3x3 conv + BatchNorm(affine, running stats) + ReLU."""

    out_ch: int
    dirate: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_ch, (3, 3), padding=self.dirate,
                    kernel_dilation=(self.dirate, self.dirate),
                    name="conv_s1")(x)
        mean = self.param("bn_mean", nn.initializers.zeros, (self.out_ch,))
        var = self.param("bn_var", nn.initializers.ones, (self.out_ch,))
        scale = self.param("bn_scale", nn.initializers.ones, (self.out_ch,))
        bias = self.param("bn_bias", nn.initializers.zeros, (self.out_ch,))
        x = (x - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias
        return nn.relu(x)


def _pool2(x):
    """MaxPool2d(2, stride=2, ceil_mode=True): pad odd dims with -inf."""
    b, h, w, c = x.shape
    if h % 2 or w % 2:
        x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)),
                    constant_values=-jnp.inf)
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def _up_like(src, tar):
    """F.interpolate(src, size=tar, mode='bilinear', align_corners=False)."""
    if src.shape[1:3] == tar.shape[1:3]:
        return src
    return jax.image.resize(
        src, (src.shape[0],) + tar.shape[1:3] + (src.shape[-1],),
        method="bilinear",
    )


class _RSU(nn.Module):
    """Residual U-block RSU-L: an L-level mini U-Net with a residual from
    the stage-input projection (DIS models/isnet.py RSU7..RSU4)."""

    depth: int
    mid_ch: int
    out_ch: int

    @nn.compact
    def __call__(self, x):
        hxin = _REBNConv(self.out_ch, name="rebnconvin")(x)
        L = self.depth
        # encoder: rebnconv1..L-1 with pools after 1..L-2
        feats = []
        h = hxin
        for i in range(1, L):
            h = _REBNConv(self.mid_ch, name=f"rebnconv{i}")(h)
            feats.append(h)
            if i <= L - 2:
                h = _pool2(h)
        h = _REBNConv(self.mid_ch, dirate=2, name=f"rebnconv{L}")(h)
        # decoder: rebnconv{L-1}d..1d over cat(up(prev), enc_feat)
        for i in range(L - 1, 0, -1):
            out = self.out_ch if i == 1 else self.mid_ch
            h = _REBNConv(out, name=f"rebnconv{i}d")(
                jnp.concatenate([_up_like(h, feats[i - 1]), feats[i - 1]], -1)
            )
        return h + hxin


class _RSU4F(nn.Module):
    """Fully-dilated RSU: dilation ladder 1,2,4,8 instead of pooling."""

    mid_ch: int
    out_ch: int

    @nn.compact
    def __call__(self, x):
        hxin = _REBNConv(self.out_ch, name="rebnconvin")(x)
        h1 = _REBNConv(self.mid_ch, dirate=1, name="rebnconv1")(hxin)
        h2 = _REBNConv(self.mid_ch, dirate=2, name="rebnconv2")(h1)
        h3 = _REBNConv(self.mid_ch, dirate=4, name="rebnconv3")(h2)
        h4 = _REBNConv(self.mid_ch, dirate=8, name="rebnconv4")(h3)
        h3d = _REBNConv(self.mid_ch, dirate=4, name="rebnconv3d")(
            jnp.concatenate([h4, h3], -1))
        h2d = _REBNConv(self.mid_ch, dirate=2, name="rebnconv2d")(
            jnp.concatenate([h3d, h2], -1))
        h1d = _REBNConv(self.out_ch, dirate=1, name="rebnconv1d")(
            jnp.concatenate([h2d, h1], -1))
        return h1d + hxin


def _make_stage(spec: _Stage, name: str):
    kind, mid, out = spec
    if kind == "4F":
        return _RSU4F(mid, out, name=name)
    return _RSU(int(kind), mid, out, name=name)


class ISNet(nn.Module):
    """(B, H, W, 3) in [-0.5, 0.5]-ish (see `preprocess`) -> side logits.

    Returns d1..d6 logits, each upsampled to (B, H, W, 1); sigmoid(d1) is
    the saliency matte (ISNetDIS.forward returns sigmoided sides; we keep
    logits and sigmoid at the call site for numerical freedom).
    """

    cfg: ISNetConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        hx = nn.Conv(cfg.conv_in, (3, 3), strides=(2, 2), padding=1,
                     name="conv_in")(x)
        # encoder
        enc_feats = []
        for i, spec in enumerate(cfg.enc):
            hx = _make_stage(spec, f"stage{i + 1}")(hx)
            enc_feats.append(hx)
            if i < len(cfg.enc) - 1:
                hx = _pool2(hx)
        # decoder (stage5d..stage1d), skip-concat with encoder feats
        h = enc_feats[-1]
        dec_feats = []
        for j, spec in enumerate(cfg.dec):
            skip = enc_feats[len(cfg.enc) - 2 - j]
            h = _make_stage(spec, f"stage{len(cfg.dec) - j}d")(
                jnp.concatenate([_up_like(h, skip), skip], -1)
            )
            dec_feats.append(h)
        # side heads: side1..side5 on decoder feats (reversed), side6 on hx6
        sides = []
        heads = dec_feats[::-1] + [enc_feats[-1]]
        for i, f in enumerate(heads):
            d = nn.Conv(1, (3, 3), padding=1, name=f"side{i + 1}")(f)
            sides.append(_up_like(d, x))
        return sides


def convert_isnet(state: dict, cfg: ISNetConfig) -> dict:
    """isnet-general-use.pth (DIS ISNetDIS state-dict) -> ISNet params."""

    def conv(pre):
        p = {"kernel": np.transpose(np.asarray(state[pre + "weight"]), (2, 3, 1, 0))}
        if pre + "bias" in state:
            p["bias"] = np.asarray(state[pre + "bias"])
        return p

    def rebn(pre):
        return {
            "conv_s1": conv(pre + "conv_s1."),
            "bn_scale": np.asarray(state[pre + "bn_s1.weight"]),
            "bn_bias": np.asarray(state[pre + "bn_s1.bias"]),
            "bn_mean": np.asarray(state[pre + "bn_s1.running_mean"]),
            "bn_var": np.asarray(state[pre + "bn_s1.running_var"]),
        }

    def rsu(pre, spec):
        kind = spec[0]
        p = {"rebnconvin": rebn(pre + "rebnconvin.")}
        n = 4 if kind == "4F" else int(kind)
        for i in range(1, n + 1):
            p[f"rebnconv{i}"] = rebn(pre + f"rebnconv{i}.")
        for i in range(1, n):
            p[f"rebnconv{i}d"] = rebn(pre + f"rebnconv{i}d.")
        return p

    params: dict = {"conv_in": conv("conv_in.")}
    for i, spec in enumerate(cfg.enc):
        params[f"stage{i + 1}"] = rsu(f"stage{i + 1}.", spec)
    for j, spec in enumerate(cfg.dec):
        name = f"stage{len(cfg.dec) - j}d"
        params[name] = rsu(name + ".", spec)
    for i in range(6):
        params[f"side{i + 1}"] = conv(f"side{i + 1}.")
    return params


def post_process_mask(mask_u8: np.ndarray) -> np.ndarray:
    """rembg's `post_process(mask)`: 3x3-ellipse morphological open +
    5x5 Gaussian blur (sigma 2) + re-binarize at 127."""
    import cv2

    kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (3, 3))
    m = cv2.morphologyEx(mask_u8, cv2.MORPH_OPEN, kernel)
    m = cv2.GaussianBlur(m, (5, 5), sigmaX=2, sigmaY=2,
                         borderType=cv2.BORDER_DEFAULT)
    return np.where(m < 127, 0, 255).astype(np.uint8)


class RembgSegmenter:
    """`rembg.remove(...)` role: ISNet saliency matte -> RGBA cutout.

    Session preprocessing parity (rembg IsnetSession): resize to
    `input_size`^2 bilinear, x/255 - 0.5 (std 1), forward, min-max
    normalize sigmoid(d1), resize back.
    """

    def __init__(self, cfg: ISNetConfig | None = None, params=None,
                 input_size: int = 1024, post_process: bool = True,
                 seed: int = 0):
        self.cfg = cfg or ISNetConfig.general_use()
        self.model = ISNet(self.cfg)
        self.params = params
        self.input_size = input_size
        self.post_process = post_process
        self.seed = seed
        self._fn = None

    def _ensure(self):
        if self.params is None:
            from labelany3d_tpu.utils.logging import warn_once

            warn_once(
                "isnet_random",
                "ISNet saliency segmenter runs random-initialized (no "
                "converted isnet-general-use checkpoint) — masks are "
                "meaningless until weights are installed",
            )
            s = self.input_size
            self.params = self.model.init(
                jax.random.PRNGKey(self.seed), jnp.zeros((1, s, s, 3))
            )["params"]
        if self._fn is None:
            self._fn = jax.jit(
                lambda p, x: jax.nn.sigmoid(
                    self.model.apply({"params": p}, x)[0][..., 0]
                )
            )

    def mask(self, rgb: np.ndarray) -> np.ndarray:
        """uint8 (H, W, 3) -> float32 saliency matte (H, W) in [0, 1]."""
        from PIL import Image

        self._ensure()
        h, w = rgb.shape[:2]
        s = self.input_size
        proc = np.asarray(
            Image.fromarray(rgb).resize((s, s), Image.BILINEAR), np.float32
        )
        x = proc[None] / 255.0 - 0.5
        pred = np.asarray(self._fn(self.params, jnp.asarray(x)))[0]
        lo, hi = float(pred.min()), float(pred.max())
        pred = (pred - lo) / max(hi - lo, 1e-8)
        m = np.asarray(
            Image.fromarray((pred * 255).astype(np.uint8)).resize(
                (w, h), Image.BILINEAR
            )
        )
        if self.post_process:
            m = post_process_mask(m)
        return m.astype(np.float32) / 255.0

    def remove(self, rgb: np.ndarray) -> np.ndarray:
        """uint8 (H, W, 3) -> RGBA uint8 cutout (alpha = matte)."""
        rgb = np.asarray(rgb)
        if rgb.shape[-1] == 4:
            rgb = rgb[..., :3]
        a = (self.mask(rgb) * 255).astype(np.uint8)
        return np.concatenate([rgb, a[..., None]], axis=-1)


def segment_completed(completed_rgb: np.ndarray, original_rgba: np.ndarray,
                      segmenter) -> np.ndarray:
    """`src/util.py:163-168`: re-segment the completed crop for the amodal
    mask, forcing original-mask pixels opaque with the completed RGB."""
    completed_rgb = np.asarray(completed_rgb)
    if completed_rgb.shape[-1] == 4:
        completed_rgb = completed_rgb[..., :3]
    orig_mask = np.asarray(original_rgba)[..., -1].astype(np.float32) / 255.0 > 0.5
    out = segmenter.remove(completed_rgb)
    out[..., :3][orig_mask] = completed_rgb[orig_mask]
    out[..., 3][orig_mask] = 255
    return out
