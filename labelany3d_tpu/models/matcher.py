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

from labelany3d_tpu.models.vit import Mlp, ViT, ViTConfig, _gelu_fast
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
    # Head style: 'pixelshuffle' = fast TPU redesign; 'catmlpdpt' =
    # checkpoint-faithful MASt3R head (`mast3r/catmlp_dpt_head.py:44-100`)
    # so released weights convert 1:1 via `convert.convert_mast3r_head`.
    head_style: str = "pixelshuffle"
    # catmlpdpt hyperparameters (mast3r_head_factory, catmlp_dpt_head.py:208)
    feature_dim: int = 256
    last_dim: int = 128
    layer_dims: tuple = (96, 192, 384, 768)
    two_confs: bool = True
    conf_vmin: float = 1.0       # conf_mode ('exp', 1, inf)
    desc_conf_vmin: float = 0.0  # desc_conf_mode ('exp', 0, inf)

    @staticmethod
    def tiny_test() -> "MatcherConfig":
        return MatcherConfig(
            encoder=ViTConfig.tiny_test(),
            dec_width=64,
            dec_depth=2,
            dec_heads=2,
            desc_dim=8,
        )

    @staticmethod
    def tiny_catmlpdpt_test() -> "MatcherConfig":
        # DPT resolution algebra needs a 16-px patch; encoder settings
        # mirror the CroCo checkpoint (rope, no cls, no layerscale).
        return MatcherConfig(
            encoder=dataclasses.replace(
                ViTConfig.tiny_test(), patch_size=16, pos_embed="rope2d",
                use_class_token=False, layerscale_init=None,
            ),
            dec_width=32, dec_depth=4, dec_heads=2, desc_dim=8,
            head_style="catmlpdpt",
            feature_dim=16, last_dim=8, layer_dims=(8, 8, 8, 16),
        )

    @staticmethod
    def mast3r_vitl() -> "MatcherConfig":
        """Shape of `MASt3R_ViTLarge_BaseDecoder_512_catmlpdpt_metric`:
        CroCo ViT-L/16 RoPE encoder, 12-block base decoder, catmlp+dpt head
        with desc24 (`mast3r/model.py`, head factory)."""
        return MatcherConfig(
            encoder=ViTConfig.large(
                patch_size=16, pos_embed="rope2d",
                use_class_token=False, layerscale_init=None,
            ),
            head_style="catmlpdpt",
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
        # VMEM-resident flash kernel on TPU (self- and cross-attention both
        # run 1024-token views at 512^2); XLA sdpa elsewhere.
        from labelany3d_tpu.ops.attention import flash_sdpa

        out = flash_sdpa(qh, kh, vh)
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


def _ac_resize_matrix(in_size: int, out_size: int):
    """Align-corners bilinear taps as a static two-banded (out, in) matrix
    (torch `align_corners=True`; jax.image.resize is half-pixel only).
    Rows sum to 1; coincident taps (exact-integer positions) merge."""
    import numpy as np

    pos = (np.arange(out_size) * ((in_size - 1) / (out_size - 1))
           if out_size > 1 else np.zeros(out_size))
    i0 = np.floor(pos).astype(np.int32)
    i1 = np.minimum(i0 + 1, in_size - 1)
    f = (pos - i0).astype(np.float32)
    g = np.zeros((out_size, in_size), np.float32)
    rows = np.arange(out_size)
    np.add.at(g, (rows, i0), 1 - f)
    np.add.at(g, (rows, i1), f)
    return g


def _resize_bilinear_ac(x: jnp.ndarray, oh: int, ow: int) -> jnp.ndarray:
    """Bilinear resize (align_corners=True) as two separable CONTRACTIONS
    against static two-banded tap matrices, not gather+blend chains: the
    gather form was 14.3 ms/orbit of HBM-bound time on the round-5 matcher
    profile (`head1/gather` 9.8 + `refine1/gather` 4.5 — gathers don't
    stream), while the matmul form is ~0.2 TFLOP of MXU work per orbit
    plus one streamed write per pass. Each output row is the same two-term
    convex blend (the other in_size-2 products are exact zeros),
    f32-accumulated on the MXU. Same trick as MoGe's
    `_resize_bilinear_pad` (models/moge.py:238)."""
    gh = jnp.asarray(_ac_resize_matrix(x.shape[1], oh), x.dtype)
    gw = jnp.asarray(_ac_resize_matrix(x.shape[2], ow), x.dtype)
    t = jnp.einsum("oh,bhwc->bowc", gh, x,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    return jnp.einsum("ow,bhwc->bhoc", gw, t,
                      preferred_element_type=jnp.float32).astype(x.dtype)


class _ResConvUnit(nn.Module):
    """DPT ResidualConvUnit_custom (`dpt_block.py:79-129`): ReLU-conv3 x2
    + identity."""

    features: int
    dtype: Any

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.features, (3, 3), dtype=self.dtype, name="conv1")(nn.relu(x))
        h = nn.Conv(self.features, (3, 3), dtype=self.dtype, name="conv2")(nn.relu(h))
        return x + h


class _DPTFusion(nn.Module):
    """FeatureFusionBlock_custom (`dpt_block.py:140-218`): optional skip via
    res-unit 1, res-unit 2, x2 bilinear (align_corners=True), 1x1 out conv."""

    features: int
    dtype: Any

    @nn.compact
    def __call__(self, x, skip=None):
        if skip is not None:
            x = x + _ResConvUnit(self.features, self.dtype, name="res1")(skip)
        x = _ResConvUnit(self.features, self.dtype, name="res2")(x)
        b, h, w, c = x.shape
        x = _resize_bilinear_ac(x, 2 * h, 2 * w)
        return nn.Conv(self.features, (1, 1), dtype=self.dtype, name="out_conv")(x)


class CatMLPDPTHead(nn.Module):
    """Checkpoint-faithful MASt3R head (`catmlp_dpt_head.py:44-100` +
    `dpt_block.py` DPTOutputAdapter): a DPT branch over [encoder, three
    decoder hook layers] regressing pts3d+conf, and an MLP+pixel-shuffle
    branch over cat(enc, dec) producing desc (+desc_conf), merged through
    the reference `postprocess` (exp point/conf modes)."""

    cfg: MatcherConfig
    patch: int

    @nn.compact
    def __call__(self, layers, enc_tokens, dec_tokens, grid, out_hw):
        cfg = self.cfg
        gh, gw = grid
        b = enc_tokens.shape[0]
        dt = cfg.dtype
        ld = cfg.layer_dims
        fd = cfg.feature_dim

        def g(t, c):
            return t.reshape(b, gh, gw, c)

        # act_postprocess: per-hook resamplers (dpt_block.py:356-403).
        l0 = nn.Conv(ld[0], (1, 1), dtype=dt, name="act0_proj")(g(layers[0], layers[0].shape[-1]))
        l0 = nn.ConvTranspose(ld[0], (4, 4), strides=(4, 4), dtype=dt, name="act0_deconv")(l0)
        l1 = nn.Conv(ld[1], (1, 1), dtype=dt, name="act1_proj")(g(layers[1], layers[1].shape[-1]))
        l1 = nn.ConvTranspose(ld[1], (2, 2), strides=(2, 2), dtype=dt, name="act1_deconv")(l1)
        l2 = nn.Conv(ld[2], (1, 1), dtype=dt, name="act2_proj")(g(layers[2], layers[2].shape[-1]))
        l3 = nn.Conv(ld[3], (1, 1), dtype=dt, name="act3_proj")(g(layers[3], layers[3].shape[-1]))
        l3 = nn.Conv(ld[3], (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                     dtype=dt, name="act3_conv")(l3)

        # scratch.layer_rn 3x3 bias-free projections to feature_dim.
        rn = [nn.Conv(fd, (3, 3), use_bias=False, dtype=dt, name=f"rn{i}")(l)
              for i, l in enumerate((l0, l1, l2, l3))]

        # refinenet4..1; path_4 cropped to layers[2]'s grid (dpt_head.py:57).
        p4 = _DPTFusion(fd, dt, name="refine4")(rn[3])[:, :rn[2].shape[1], :rn[2].shape[2]]
        p3 = _DPTFusion(fd, dt, name="refine3")(p4, rn[2])
        p2 = _DPTFusion(fd, dt, name="refine2")(p3, rn[1])
        p1 = _DPTFusion(fd, dt, name="refine1")(p2, rn[0])

        # regression head (dpt_block.py:316-325).
        h = nn.Conv(fd // 2, (3, 3), dtype=dt, name="head_c1")(p1)
        h = _resize_bilinear_ac(h, 2 * h.shape[1], 2 * h.shape[2])
        h = nn.Conv(cfg.last_dim, (3, 3), dtype=dt, name="head_c2")(h)
        pts_conf = nn.Conv(4, (1, 1), dtype=jnp.float32, param_dtype=jnp.float32,
                           name="head_c3")(nn.relu(h).astype(jnp.float32))

        # MLP local-features branch (catmlp_dpt_head.py:69-89).
        p = self.patch
        n_out = cfg.desc_dim + int(cfg.two_confs)
        cat = jnp.concatenate([enc_tokens, dec_tokens], axis=-1)
        idim = cat.shape[-1]
        hcat = nn.Dense(4 * idim, dtype=dt, name="mlp_fc1")(cat)
        # fc2 + the pixel-shuffle run in the model dtype: the downstream
        # consumer (reciprocal-NN scoring) casts descriptors to bf16 on the
        # MXU anyway, and the descriptor is L2-normalized in f32 below. In
        # hard f32 this dense was 9.4 ms/orbit on the matcher profile and
        # the (B, gh, gw, n_out, p, p) shuffle layout pass another 4.3.
        feat = nn.Dense(n_out * p * p, dtype=dt, param_dtype=jnp.float32,
                        name="mlp_fc2")(_gelu_fast(hcat))
        # torch pixel_shuffle layout: channel = c*p^2 + dy*p + dx.
        feat = feat.reshape(b, gh, gw, n_out, p, p)
        feat = feat.transpose(0, 1, 4, 2, 5, 3).reshape(b, gh * p, gw * p, n_out)

        if pts_conf.shape[1:3] != feat.shape[1:3]:
            pts_conf = jax.image.resize(
                pts_conf, (b, feat.shape[1], feat.shape[2], 4), method="bilinear")
        pts_conf = pts_conf.astype(jnp.float32)

        # postprocess (catmlp_dpt_head.py:27-42): exp point mode, exp confs,
        # L2-normalized descriptors. The two branches stay SEPARATE — the
        # old `concatenate([pts_conf, feat.astype(f32)])` materialized a
        # full-res f32 fmap (the convert alone was 8.6 ms/orbit on the r5
        # profile); normalizing straight off the bf16 shuffle output fuses
        # the f32 cast into the normalize's output write instead.
        xyz = pts_conf[..., 0:3]
        d = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
        pts = xyz / jnp.maximum(d, 1e-8) * jnp.expm1(d)
        conf = cfg.conf_vmin + jnp.exp(pts_conf[..., 3])
        desc_raw = feat[..., : cfg.desc_dim]
        sq = jnp.einsum("...c,...c->...", desc_raw, desc_raw,
                        preferred_element_type=jnp.float32)[..., None]
        desc = desc_raw.astype(jnp.float32) * jax.lax.rsqrt(
            jnp.maximum(sq, 1e-16))
        if cfg.two_confs:
            desc_conf = cfg.desc_conf_vmin + jnp.exp(
                feat[..., cfg.desc_dim].astype(jnp.float32))
        else:
            desc_conf = conf
        return pts, conf, desc, desc_conf


class TwoViewMatcher(nn.Module):
    cfg: MatcherConfig

    @nn.compact
    def __call__(self, img0: jnp.ndarray, img1: jnp.ndarray,
                 ref_index: jnp.ndarray | None = None) -> dict:
        """img0/img1: (B, H, W, 3) -> per-view pts3d/conf/desc maps.

        When img0 has batch 1 and img1 batch V > 1 (the registration orbit:
        one reference crop against V rendered views,
        `process_image_space.py:72-101`), the shared view is encoded ONCE
        and its tokens broadcast — V+1 encoder rows instead of 2V. The
        decoder/heads still run per pair (cross-attention differs per
        view). Outputs are bitwise those of pre-broadcasting img0.

        `ref_index` (P,) generalizes to MANY references: img0 has R rows,
        img1 has P rows, and pair p matches img1[p] against
        img0[ref_index[p]] — R + P encoder rows instead of 2P. This is the
        whole-image registration batch (all of an image's objects x their
        orbit views in one forward); the reference runs each pair as a
        separate bs=1 MASt3R call.
        """
        cfg = self.cfg
        b, h, w, _ = img0.shape
        b1 = img1.shape[0]
        enc = ViT(cfg.encoder, name="encoder")(jnp.concatenate([img0, img1], axis=0))
        gh, gw = enc["grid"]
        t0, t1 = jnp.split(enc["tokens"], [b], axis=0)
        if ref_index is not None:
            t0 = jnp.take(t0, jnp.asarray(ref_index, jnp.int32), axis=0)
        elif b == 1 and b1 > 1:
            t0 = jnp.broadcast_to(t0, (b1,) + t0.shape[1:])

        proj = nn.Dense(cfg.dec_width, dtype=cfg.dtype, name="dec_embed")
        x0 = proj(t0)
        x1 = proj(t1)

        ys = jnp.arange(gh, dtype=jnp.int32)
        xs = jnp.arange(gw, dtype=jnp.int32)
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        pos = jnp.stack([gy, gx], axis=-1).reshape(1, gh * gw, 2)
        pos_cs = rope_2d_freqs(cfg.dec_width // cfg.dec_heads, pos)

        # DPT hooks over decout = [enc, dec_1..dec_N] at
        # [0, 2N/4, 3N/4, N] (dpt_head.py:110); the last entry is the
        # dec_norm-ed output (croco.py:105, model.py:189).
        want = {cfg.dec_depth * 2 // 4, cfg.dec_depth * 3 // 4}
        hooks0, hooks1 = [], []
        for i in range(cfg.dec_depth):
            blk0 = CrossBlock(cfg, name=f"dec0_block{i}")
            blk1 = CrossBlock(cfg, name=f"dec1_block{i}")
            x0n, x1n = blk0(x0, x1, pos_cs, pos_cs), blk1(x1, x0, pos_cs, pos_cs)
            x0, x1 = x0n, x1n
            if (i + 1) in want:
                hooks0.append(x0)
                hooks1.append(x1)
        dec_norm = nn.LayerNorm(dtype=jnp.float32, name="dec_norm")
        x0 = dec_norm(x0).astype(cfg.dtype)
        x1 = dec_norm(x1).astype(cfg.dtype)
        hooks0.append(x0)
        hooks1.append(x1)

        if cfg.head_style == "catmlpdpt":
            head0 = CatMLPDPTHead(cfg, cfg.encoder.patch_size, name="head0")
            head1 = CatMLPDPTHead(cfg, cfg.encoder.patch_size, name="head1")
            pts0, conf0, desc0, dconf0 = head0([t0] + hooks0, t0, x0, (gh, gw), (h, w))
            pts1, conf1, desc1, dconf1 = head1([t1] + hooks1, t1, x1, (gh, gw), (h, w))
            return {
                "pts3d0": pts0, "conf0": conf0, "desc0": desc0, "desc_conf0": dconf0,
                "pts3d1": pts1, "conf1": conf1, "desc1": desc1, "desc_conf1": dconf1,
            }
        if cfg.head_style != "pixelshuffle":
            raise ValueError(f"Unknown head_style: {cfg.head_style!r}")
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
    if img0.ndim != 3 or img1.ndim != 3:
        raise ValueError(
            f"match_images takes unbatched (H, W, 3) images; got "
            f"{img0.shape} / {img1.shape}"
        )
    out = model.apply({"params": params}, img0[None], img1[None])
    return reciprocal_nn_match(out["desc0"][0], out["desc1"][0], subsample=subsample)
