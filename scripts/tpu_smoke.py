"""One-forward-per-family TPU smoke: compile + run every model graph once.

Mosaic/XLA-TPU failures are shape- and backend-specific (scoped-VMEM
limits, 128-lane block constraints, slow-path contractions) and stay
latent under the CPU test suite — two such bugs shipped before the
generative bench first exercised SLat/SVRM shapes on-chip (see
`ops/attention.py::flash_sdpa` block_k notes). This script runs each
family's forward at a small-but-TPU-realistic shape (real sequence
lengths where attention kernels are involved, narrow widths elsewhere)
and reports ok/error per family. Weights are zeros — a smoke test of
compilation + execution, not of outputs.

Usage:  python scripts/tpu_smoke.py [family ...]   (default: all)
Exit code = number of failing families.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _zeros_params(model, *args, method=None):
    import jax
    import jax.numpy as jnp

    # method must stay out of eval_shape's traced kwargs.
    init = (lambda k, *a: model.init(k, *a, method=method)) if method else model.init
    shapes = jax.eval_shape(init, jax.random.PRNGKey(0), *args)["params"]
    return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)


def _s(out):
    """Scalar from any pytree of arrays (model outputs vary dict/tuple)."""
    import jax

    return sum(x.sum() for x in jax.tree_util.tree_leaves(out))


def _run(fn):
    """jit, execute, fetch a scalar; returns seconds.

    LA3D_SMOKE_DRY=1 traces only (jax.eval_shape): a fast CPU-side check
    that every family's constructor/signature in this file is current."""
    import os

    import jax

    t0 = time.perf_counter()
    if os.environ.get("LA3D_SMOKE_DRY"):
        jax.eval_shape(fn)
        return time.perf_counter() - t0
    out = jax.jit(fn)()
    float(np.asarray(out).ravel()[0])
    return time.perf_counter() - t0


def smoke_moge():
    import jax.numpy as jnp

    from labelany3d_tpu.models.moge import MoGeConfig, MoGeModel, moge_infer

    m = MoGeModel(MoGeConfig.vitl())
    x = jnp.zeros((1, 518, 518, 3))
    p = _zeros_params(m, x)
    return _run(lambda: moge_infer(m, p, x)["depth"].sum())


def smoke_depth_pro35():
    import jax.numpy as jnp

    from labelany3d_tpu.models.depth_pro import DepthPro35, DepthPro35Config, depth_pro35_infer

    cfg = DepthPro35Config()
    m = DepthPro35(cfg)
    x = jnp.zeros((1, cfg.img_size, cfg.img_size, 3))
    p = _zeros_params(m, x)
    return _run(lambda: depth_pro35_infer(m, p, x, f_px=jnp.full((1,), 500.0))["depth"].sum())


def smoke_matcher():
    import jax.numpy as jnp

    from labelany3d_tpu.models.matcher import MatcherConfig, TwoViewMatcher

    m = TwoViewMatcher(MatcherConfig.mast3r_vitl())
    a = jnp.zeros((1, 512, 512, 3))
    p = _zeros_params(m, a, a)
    return _run(lambda: m.apply({"params": p}, a, a)["desc0"].sum())


def smoke_sam():
    import jax.numpy as jnp

    from labelany3d_tpu.models.sam import SamConfig, SamCore

    cfg = SamConfig()  # ViT-B production
    m = SamCore(cfg)
    img = jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
    pts = jnp.zeros((1, 64, 1, 2))
    lbl = jnp.ones((1, 64, 1), jnp.int32)
    p = _zeros_params(m, img, pts, lbl)
    return _run(lambda: _s(m.apply({"params": p}, img, pts, lbl)))


def smoke_segformer():
    import jax.numpy as jnp

    from labelany3d_tpu.models.segformer import SegFormer, SegFormerConfig

    m = SegFormer(SegFormerConfig.b0())
    x = jnp.zeros((1, 512, 512, 3))
    p = _zeros_params(m, x)
    return _run(lambda: m.apply({"params": p}, x).sum())


def smoke_isnet():
    import jax.numpy as jnp

    from labelany3d_tpu.models.saliency import ISNet, ISNetConfig

    m = ISNet(ISNetConfig())
    x = jnp.zeros((1, 1024, 1024, 3))
    p = _zeros_params(m, x)
    return _run(lambda: m.apply({"params": p}, x)[0].sum())


def smoke_clip():
    import jax.numpy as jnp

    from labelany3d_tpu.models.clip import (
        CLIPTextConfig, CLIPTextEncoder, CLIPVisionConfig, CLIPVisionEncoder,
    )

    t = CLIPTextEncoder(CLIPTextConfig())
    ids = jnp.zeros((2, 77), jnp.int32)
    pt = _zeros_params(t, ids)
    s1 = _run(lambda: _s(t.apply({"params": pt}, ids)))
    v = CLIPVisionEncoder(CLIPVisionConfig())
    img = jnp.zeros((1, 224, 224, 3))
    pv = _zeros_params(v, img)
    s2 = _run(lambda: _s(v.apply({"params": pv}, img)))
    return s1 + s2


def smoke_sd_unet():
    import jax.numpy as jnp

    from labelany3d_tpu.models.diffusion.unet import UNet2D, UNetConfig

    m = UNet2D(UNetConfig())
    x = jnp.zeros((1, 64, 64, 4))
    tt = jnp.full((1,), 500.0)
    ctx = jnp.zeros((1, 77, 768))
    p = _zeros_params(m, x, tt, ctx)
    return _run(lambda: m.apply({"params": p}, x, tt, ctx).sum())


def smoke_sd_vae():
    import jax.numpy as jnp

    from labelany3d_tpu.models.diffusion.vae import Decoder, VAEConfig

    m = Decoder(VAEConfig())
    z = jnp.zeros((1, 64, 64, 4))
    p = _zeros_params(m, z)
    return _run(lambda: m.apply({"params": p}, z).sum())


def smoke_noise_predictor():
    import jax.numpy as jnp

    from labelany3d_tpu.models.diffusion.noise_predictor import (
        NoisePredictor, NoisePredictorConfig,
    )

    m = NoisePredictor(NoisePredictorConfig())
    x = jnp.zeros((1, 128, 128, 3))
    tt = jnp.full((1,), 200.0)
    p = _zeros_params(m, x, tt)
    return _run(lambda: _s(m.apply({"params": p}, x, tt)))


def smoke_trellis():
    import jax.numpy as jnp

    from labelany3d_tpu.models.trellis.sparse_structure import (
        SparseStructureConfig, SparseStructureFlowModel, StructureDecoder,
        SSDecoderConfig,
    )
    from labelany3d_tpu.models.trellis.slat import SLatConfig, SLatFlowModel

    ss_cfg = SparseStructureConfig()
    ss = SparseStructureFlowModel(ss_cfg)
    x = jnp.zeros((1, ss_cfg.latent_res**3, ss_cfg.latent_channels))
    cond = jnp.zeros((1, 1374, 1024))
    tt = jnp.full((1,), 500.0)
    p = _zeros_params(ss, x, tt, cond)
    s1 = _run(lambda: ss.apply({"params": p}, x, tt, cond).sum())

    dec = StructureDecoder(SSDecoderConfig())
    z = jnp.zeros((1, ss_cfg.latent_res, ss_cfg.latent_res, ss_cfg.latent_res,
                   ss_cfg.latent_channels))
    pd = _zeros_params(dec, z)
    s2 = _run(lambda: _s(dec.apply({"params": pd}, z)))

    sl_cfg = SLatConfig()
    sl = SLatFlowModel(sl_cfg)
    n = 8192
    xs = jnp.zeros((1, n, sl_cfg.latent_channels))
    coords = jnp.zeros((1, n, 3), jnp.int32)
    valid = jnp.ones((1, n), bool)
    ps = _zeros_params(sl, xs, coords, valid, tt, cond)
    s3 = _run(lambda: sl.apply({"params": ps}, xs, coords, valid, tt, cond).sum())
    return s1 + s2 + s3


def smoke_svrm():
    import jax.numpy as jnp

    from labelany3d_tpu.models.svrm import SVRM, SVRMConfig

    cfg = SVRMConfig()
    m = SVRM(cfg)
    views = jnp.zeros((1, cfg.num_views, cfg.image_size, cfg.image_size, 3))
    cams = jnp.zeros((1, cfg.num_views, cfg.cam_dim))
    p = _zeros_params(m, views, cams, method=SVRM.init_all)
    return _run(lambda: m.apply({"params": p}, views, cams).sum())


def smoke_zero123():
    # cc_projection over [CLIP image embed, 4-dof camera]; the vision
    # tower and UNet are smoked by the clip and sd_unet families.
    import jax.numpy as jnp

    from labelany3d_tpu.models.diffusion.pipelines import _CCProjection

    m = _CCProjection(768)
    emb = jnp.zeros((1, 768))
    cam = jnp.zeros((1, 4))
    p = _zeros_params(m, emb, cam)
    return _run(lambda: _s(m.apply({"params": p}, emb, cam)))


def smoke_geometry_core():
    import jax
    import jax.numpy as jnp

    from labelany3d_tpu.pipeline.labeling import labeling_step

    rel = jnp.ones((2, 512, 512))
    met = jnp.ones((2, 512, 512)) * 2
    dm = jnp.ones((2, 512, 512), bool)
    K = jnp.broadcast_to(jnp.eye(3) * 500.0, (2, 3, 3))
    masks = jnp.ones((2, 16, 512, 512), bool)
    key = jax.random.PRNGKey(0)
    return _run(lambda: labeling_step(rel, met, dm, K, masks, key,
                                      num_points=512)[1].boxes.center_cam.sum())


FAMILIES = {
    "geometry_core": smoke_geometry_core,
    "moge": smoke_moge,
    "depth_pro35": smoke_depth_pro35,
    "matcher": smoke_matcher,
    "sam": smoke_sam,
    "segformer": smoke_segformer,
    "isnet": smoke_isnet,
    "clip": smoke_clip,
    "sd_unet": smoke_sd_unet,
    "sd_vae": smoke_sd_vae,
    "noise_predictor": smoke_noise_predictor,
    "trellis": smoke_trellis,
    "svrm": smoke_svrm,
    "zero123": smoke_zero123,
}


def main() -> int:
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/la3d_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
    names = sys.argv[1:] or list(FAMILIES)
    print(f"backend: {jax.default_backend()}", flush=True)
    failures = 0
    for name in names:
        t0 = time.perf_counter()
        try:
            FAMILIES[name]()
            print(f"[ok]   {name}  ({time.perf_counter() - t0:.1f}s)", flush=True)
        except Exception as e:  # noqa: BLE001
            failures += 1
            print(f"[FAIL] {name}: {type(e).__name__}: {e}"[:300], flush=True)
    return failures


if __name__ == "__main__":
    raise SystemExit(main())
