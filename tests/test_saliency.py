"""ISNet saliency parity vs a torch ISNetDIS replica + rembg-role tests.

The torch replica below follows the public DIS `models/isnet.py`
architecture (REBNCONV / RSU-L / RSU4F / ISNetDIS) and emits the released
checkpoint's state-dict names, so `convert_isnet` is exercised exactly as
it would be on `isnet-general-use.pth`.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from labelany3d_tpu.models.saliency import (  # noqa: E402
    ISNet,
    ISNetConfig,
    RembgSegmenter,
    convert_isnet,
    post_process_mask,
    segment_completed,
)


class _REBNCONV(tnn.Module):
    def __init__(self, c_in, c_out, dirate=1):
        super().__init__()
        self.conv_s1 = tnn.Conv2d(c_in, c_out, 3, padding=dirate, dilation=dirate)
        self.bn_s1 = tnn.BatchNorm2d(c_out)

    def forward(self, x):
        return F.relu(self.bn_s1(self.conv_s1(x)))


def _up_like(src, tar):
    return F.interpolate(src, size=tar.shape[2:], mode="bilinear")


class _RSU(tnn.Module):
    def __init__(self, depth, c_in, mid, out):
        super().__init__()
        self.depth = depth
        self.rebnconvin = _REBNCONV(c_in, out)
        self.pool = tnn.MaxPool2d(2, stride=2, ceil_mode=True)
        setattr(self, "rebnconv1", _REBNCONV(out, mid))
        for i in range(2, depth):
            setattr(self, f"rebnconv{i}", _REBNCONV(mid, mid))
        setattr(self, f"rebnconv{depth}", _REBNCONV(mid, mid, dirate=2))
        for i in range(depth - 1, 1, -1):
            setattr(self, f"rebnconv{i}d", _REBNCONV(mid * 2, mid))
        self.rebnconv1d = _REBNCONV(mid * 2, out)

    def forward(self, x):
        hxin = self.rebnconvin(x)
        feats = []
        h = hxin
        for i in range(1, self.depth):
            h = getattr(self, f"rebnconv{i}")(h)
            feats.append(h)
            if i <= self.depth - 2:
                h = self.pool(h)
        h = getattr(self, f"rebnconv{self.depth}")(h)
        for i in range(self.depth - 1, 0, -1):
            h = getattr(self, f"rebnconv{i}d")(
                torch.cat((_up_like(h, feats[i - 1]), feats[i - 1]), 1)
            )
        return h + hxin


class _RSU4F(tnn.Module):
    def __init__(self, c_in, mid, out):
        super().__init__()
        self.rebnconvin = _REBNCONV(c_in, out)
        self.rebnconv1 = _REBNCONV(out, mid, 1)
        self.rebnconv2 = _REBNCONV(mid, mid, 2)
        self.rebnconv3 = _REBNCONV(mid, mid, 4)
        self.rebnconv4 = _REBNCONV(mid, mid, 8)
        self.rebnconv3d = _REBNCONV(mid * 2, mid, 4)
        self.rebnconv2d = _REBNCONV(mid * 2, mid, 2)
        self.rebnconv1d = _REBNCONV(mid * 2, out, 1)

    def forward(self, x):
        hxin = self.rebnconvin(x)
        h1 = self.rebnconv1(hxin)
        h2 = self.rebnconv2(h1)
        h3 = self.rebnconv3(h2)
        h4 = self.rebnconv4(h3)
        h3d = self.rebnconv3d(torch.cat((h4, h3), 1))
        h2d = self.rebnconv2d(torch.cat((h3d, h2), 1))
        h1d = self.rebnconv1d(torch.cat((h2d, h1), 1))
        return h1d + hxin


def _mk(spec, c_in):
    kind, mid, out = spec
    if kind == "4F":
        return _RSU4F(c_in, mid, out)
    return _RSU(int(kind), c_in, mid, out)


class _ISNetDIS(tnn.Module):
    def __init__(self, cfg: ISNetConfig):
        super().__init__()
        self.cfg = cfg
        self.conv_in = tnn.Conv2d(3, cfg.conv_in, 3, stride=2, padding=1)
        self.pool = tnn.MaxPool2d(2, stride=2, ceil_mode=True)
        c = cfg.conv_in
        for i, spec in enumerate(cfg.enc):
            setattr(self, f"stage{i + 1}", _mk(spec, c))
            c = spec[2]
        enc_outs = [s[2] for s in cfg.enc]
        for j, spec in enumerate(cfg.dec):
            prev = enc_outs[-1] if j == 0 else cfg.dec[j - 1][2]
            skip = enc_outs[len(cfg.enc) - 2 - j]
            setattr(self, f"stage{len(cfg.dec) - j}d", _mk(spec, prev + skip))
        dec_outs = [s[2] for s in cfg.dec]
        side_chs = dec_outs[::-1] + [enc_outs[-1]]
        for i, ch in enumerate(side_chs):
            setattr(self, f"side{i + 1}", tnn.Conv2d(ch, 1, 3, padding=1))

    def forward(self, x):
        hx = self.conv_in(x)
        enc = []
        for i in range(len(self.cfg.enc)):
            hx = getattr(self, f"stage{i + 1}")(hx)
            enc.append(hx)
            if i < len(self.cfg.enc) - 1:
                hx = self.pool(hx)
        h = enc[-1]
        dec = []
        for j in range(len(self.cfg.dec)):
            skip = enc[len(self.cfg.enc) - 2 - j]
            h = getattr(self, f"stage{len(self.cfg.dec) - j}d")(
                torch.cat((_up_like(h, skip), skip), 1)
            )
            dec.append(h)
        sides = []
        for i, f in enumerate(dec[::-1] + [enc[-1]]):
            d = getattr(self, f"side{i + 1}")(f)
            sides.append(_up_like(d, x))
        return sides


def _oracle_pair():
    cfg = ISNetConfig.tiny_test()
    torch.manual_seed(0)
    oracle = _ISNetDIS(cfg).eval()
    # non-trivial BatchNorm running stats so conversion is actually tested
    for m in oracle.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.normal_(0.0, 0.3)
            m.running_var.uniform_(0.5, 2.0)
    params = convert_isnet(
        {k: v.numpy() for k, v in oracle.state_dict().items()}, cfg
    )
    return oracle, cfg, params


@pytest.mark.heavy
def test_isnet_matches_torch_replica():
    oracle, cfg, params = _oracle_pair()
    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = [d.numpy() for d in oracle(torch.from_numpy(img))]
    model = ISNet(cfg)
    out = model.apply({"params": params}, jnp.asarray(img.transpose(0, 2, 3, 1)))
    assert len(out) == 6
    for d_jax, d_ref in zip(out, ref):
        np.testing.assert_allclose(
            np.asarray(d_jax).transpose(0, 3, 1, 2), d_ref, atol=5e-5, rtol=1e-4
        )


@pytest.mark.slow
def test_isnet_nonsquare_non_pow2():
    """Odd pooled sizes exercise the ceil_mode padding path."""
    oracle, cfg, params = _oracle_pair()
    rng = np.random.default_rng(1)
    img = rng.normal(size=(1, 3, 96, 72)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(img))[0].numpy()
    out = ISNet(cfg).apply({"params": params}, jnp.asarray(img.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(out[0]).transpose(0, 3, 1, 2), ref, atol=5e-5, rtol=1e-4
    )


@pytest.mark.heavy
def test_rembg_segmenter_shapes_and_warn():
    from labelany3d_tpu.utils.logging import reset_warnings

    reset_warnings()
    seg = RembgSegmenter(ISNetConfig.tiny_test(), input_size=64)
    rgb = np.random.default_rng(0).integers(0, 255, (50, 70, 3), np.uint8)
    rgba = seg.remove(rgb)
    assert rgba.shape == (50, 70, 4) and rgba.dtype == np.uint8
    m = seg.mask(rgb)
    assert m.shape == (50, 70) and 0.0 <= m.min() and m.max() <= 1.0


def test_post_process_mask_binarizes_and_denoises():
    m = np.zeros((40, 40), np.uint8)
    m[10:30, 10:30] = 255
    m[2, 2] = 255  # single-pixel speckle: must be opened away
    out = post_process_mask(m)
    assert set(np.unique(out)) <= {0, 255}
    assert out[2, 2] == 0
    assert out[20, 20] == 255


def test_segment_completed_union_semantics():
    """util.py:163-168: original-mask pixels stay opaque with completed RGB;
    outside pixels take the segmenter's alpha."""

    class _SegStub:
        def remove(self, rgb):
            a = np.zeros(rgb.shape[:2], np.uint8)
            a[:, 16:] = 255  # segmenter finds only the right half
            dim = (rgb // 2).astype(np.uint8)
            return np.concatenate([dim, a[..., None]], axis=-1)

    completed = np.full((8, 32, 3), 200, np.uint8)
    original = np.zeros((8, 32, 4), np.uint8)
    original[..., :3] = 100
    original[:, :8, 3] = 255  # original mask: left quarter

    out = segment_completed(completed, original, _SegStub())
    assert out.shape == (8, 32, 4)
    # original-mask pixels: completed RGB, forced opaque
    assert (out[:, :8, :3] == 200).all() and (out[:, :8, 3] == 255).all()
    # segmenter-found region outside the original mask keeps segmenter output
    assert (out[:, 16:, 3] == 255).all() and (out[:, 16:, :3] == 100).all()
    # region neither found nor original: transparent
    assert (out[:, 8:16, 3] == 0).all()
