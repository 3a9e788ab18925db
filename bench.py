"""Benchmark: TPU throughput of the labeling pipeline's compute paths.

Covers BASELINE.json configs 1-5:
  * configs 1+2 (headline `value`): the fused labeling core — RANSAC depth
    alignment -> back-projection -> per-instance point extraction ->
    oriented 3D box fit at production shapes (512x512, 16 instance slots,
    512 points/instance), one jitted XLA program per image batch
    (`labelany3d_tpu.pipeline.labeling.labeling_step`).
  * config 3 (`extra.depth_model_images_per_sec`): the production depth
    models — MoGe ViT-L/14 at 518^2 (batch 4) and DepthPro35 35-patch
    pyramid at 1536^2 (batch 1) — reported separately and as the fused
    per-image rate 1/(1/moge + 1/dp35), matching the reference stage-1 cost
    shape (`src/batch_scripts/depth.py:120-167`: both models per image).
  * config 4 (`extra.registration_ms_per_object`): MASt3R-ViT-L-shaped
    two-view matcher forward at 512^2 + reciprocal-NN + RANSAC PnP; the
    reference runs ~8 view pairs + 2 PnP solves per object
    (`src/matching/process_image_space.py:34-159`).
  * config 5 (`extra.e2e_fast_images_per_sec`): end-to-end depth-labeling
    shard — DepthStage (real ViT-L backend) + BoxStage + export on a
    synthetic COCO-layout dataset, *including* host artifact IO.

Prints ONE JSON line:
  {"metric": ..., "value": images/sec on TPU, "unit": "images/s",
   "vs_baseline": speedup over the PINNED host baseline, "extra": {...}}

`vs_baseline` divides by PINNED_HOST_IPS — a host-loop rate recorded once
on a quiet machine (see below), NOT re-measured per run, so the ratio no
longer moves with background host load. `python bench.py --rebaseline`
re-measures the host loop and prints the suggested new constant.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

B, H, W, I, PTS = 8, 512, 512, 16, 512
TPU_WARMUP_ITERS = 10   # tunnel cold-start; see bench_tpu timing notes
TPU_TIMED_ITERS = 50
HOST_TIMED_IMAGES = 3
# Wall-clock budget for the whole bench (headline + config 3-5 +
# generative). The headline gets its OWN alarm (HEADLINE_BUDGET_S) and each
# sub-bench both (a) only starts if its floor remains and (b) runs under an
# alarm that reserves the floors of the sections AFTER it — so one degraded
# section can never eat every later section's window (r03 failure mode:
# the headline ran under the full 1700s alarm on a sick tunnel, consumed
# ~1600s, and all four sub-benches were skipped). Warm-cache full run is
# ~600s; cold compiles persist to /tmp/la3d_jax_cache.
EXTRA_BUDGET_S = 2150.0  # r5: +450 for the full `all`-route section
# Headline cap: 3 timed windows of 50 iters @ ~0.015s/batch is ~30s warm;
# 420s absorbs a cold compile + slow program load with a wide margin.
HEADLINE_BUDGET_S = 420.0
HEADLINE_RETRY_S = 180.0
# Internal gate for bench_generative's per-model sections (each model is a
# separate tunnel program load; a degraded tunnel should yield a partial
# record, not eat the whole extras budget).
GENERATIVE_BUDGET_S = 600.0
_T_START = time.perf_counter()

# When a section runs as a `--section` child process (see main), the parent
# passes how much of the SHARED extras budget is left; gates inside section
# fns must see that, not the child's own (fresh) clock.
_GLOBAL_LEFT_OVERRIDE: float | None = None


def _global_left() -> float:
    if _GLOBAL_LEFT_OVERRIDE is not None:
        return _GLOBAL_LEFT_OVERRIDE - (time.perf_counter() - _T_START)
    return EXTRA_BUDGET_S - (time.perf_counter() - _T_START)


# In `--sections` child mode this prints a {"__partial__": name, ...} line;
# sections call it at internal milestones so a section killed mid-flight
# still lands its primary numbers in the parent's record.
_PARTIAL_EMIT = None


def _emit_partial(d: dict) -> None:
    if _PARTIAL_EMIT is not None:
        _PARTIAL_EMIT(dict(d))


def _enable_compile_cache():
    """Persistent XLA compilation cache: the big ViT-L programs compile
    once per machine, not once per bench run."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/la3d_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass  # older jax or read-only tmp: run uncached

# Reference-shaped host loop (sklearn RANSAC + numpy backprojection + PCA
# box fit per image, mirroring `src/batch_scripts/depth.py:52-92`,
# `src/util.py:52-75`, `src/util_3dbox.py:106-178`), measured with
# `--rebaseline` on a quiet machine. Best window observed across sessions
# (conservative: a generous host rate LOWERS vs_baseline):
#   2026-08-16 r01 driver run: 0.751 im/s; 2026-08-16 10-window quiet
#   re-measure: 0.687 im/s max. Pinned at the best of these.
PINNED_HOST_IPS = 0.751

# Config-5 host divisor: the same synthetic 8-image shard as
# `bench_e2e_fast` run as a reference-shaped single-image host loop
# (sklearn RANSAC align + numpy backprojection + PCA box fit + the same
# artifact IO: depth npy, cam json, input PNG, bbox/export json) — i.e.
# everything in the shard EXCEPT the neural depth forwards, which on the
# reference's A40 only add cost, so the ratio is conservative. Measured
# with `--rebaseline-e2e` on a quiet machine (2026-08-17: 0.52 im/s).
PINNED_HOST_E2E_IPS = 0.52


def _tunnel_probe(iters: int = 10) -> float:
    """Milliseconds per tiny chained matmul step — a fixed-cost canary for
    tunnel health. Recorded before/after the benches so a BENCH record can
    be read against tunnel weather (PERF.md: throughput intermittently
    collapses ~100x for a stretch)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def step(x):
        return x @ x + 1.0

    x = jnp.ones((256, 256), jnp.float32)
    x = step(x)
    float(x[0, 0])  # force compile + load
    x = jnp.ones((256, 256), jnp.float32)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(x)
    float(x[0, 0])
    return (time.perf_counter() - t0) / iters * 1000.0


def make_batch(rng):
    """Synthetic scene batch: planar background + I box objects per image."""
    rel = rng.uniform(2.0, 9.0, size=(B, H, W)).astype(np.float32)
    metric = rel * 2.0 + rng.normal(0, 0.02, size=(B, H, W)).astype(np.float32)
    # outliers
    idx = rng.uniform(size=(B, H, W)) < 0.05
    metric[idx] += rng.uniform(5, 20, size=int(idx.sum()))
    dmask = np.ones((B, H, W), bool)
    K = np.tile(np.array([[500.0, 0, W / 2], [0, 500.0, H / 2], [0, 0, 1]], np.float32), (B, 1, 1))
    masks = np.zeros((B, I, H, W), bool)
    side = H // 8
    for b in range(B):
        for i in range(I):
            y = (i // 4) * (H // 4) + 16
            x = (i % 4) * (W // 4) + 16
            masks[b, i, y : y + side, x : x + side] = True
    return rel, metric, dmask, K, masks


def _zeros_params(model, *example_args):
    """eval_shape + zeros: benchmarks time compute, not random init."""
    import jax
    import jax.numpy as jnp

    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), *example_args)["params"]
    return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)


def _timed_chain(fn, args_fn, iters, warmup=2):
    """Time `iters` chained executions of fn(acc, *args) -> acc.

    The tunnel backend executes lazily — dispatch and even block_until_ready
    can return before remote execution. Each step folds its outputs into an
    accumulator consumed by the next step, and the wall clock closes over a
    host fetch of the final value, forcing the whole chain.
    """
    import jax.numpy as jnp

    acc = jnp.float32(0.0)
    for it in range(warmup):
        acc = fn(acc, *args_fn(it))
    float(acc)
    acc = jnp.float32(0.0)
    t0 = time.perf_counter()
    for it in range(iters):
        acc = fn(acc, *args_fn(100 + it))
    float(acc)
    return time.perf_counter() - t0


def bench_tpu(rel, metric, dmask, K, masks) -> float:
    import jax
    import jax.numpy as jnp

    from labelany3d_tpu.pipeline.labeling import labeling_step

    def step(acc, r, m, dm, k, msk, key):
        aligned, out = labeling_step(r, m, dm, k, msk, key, num_points=PTS)
        return acc + out.boxes.center_cam.sum() + aligned[0, 0, 0]

    fn = jax.jit(step)
    key = jax.random.PRNGKey(0)
    args = tuple(map(jax.numpy.asarray, (rel, metric, dmask, K, masks)))

    acc = jnp.float32(0.0)
    for it in range(TPU_WARMUP_ITERS):
        acc = fn(acc, *args, jax.random.fold_in(key, 10000 + it))
    float(acc)  # force the warmup chain
    rates = []
    for window in range(3):
        dt = _timed_chain(
            lambda acc, *a: fn(acc, *a),
            lambda it: args + (jax.random.fold_in(key, it),),
            TPU_TIMED_ITERS,
            warmup=0,
        )
        rates.append(B * TPU_TIMED_ITERS / dt)
    rates.sort()
    return rates[1]  # median of 3 windows


def bench_depth_models() -> dict:
    """Config 3: production depth-model forwards (random weights — timing
    is weight-value independent for dense ViTs)."""
    import jax
    import jax.numpy as jnp

    from labelany3d_tpu.models.depth_pro import (
        DepthPro35,
        DepthPro35Config,
        depth_pro35_infer,
    )
    from labelany3d_tpu.models.moge import MoGeConfig, MoGeModel, moge_infer

    rng = np.random.default_rng(0)

    # MoGe ViT-L/14 at the production 518^2 bucket; batch 8 is the
    # measured throughput sweet spot (packed-qkv flash + fused dual-head
    # conv: 70.1 img/s at b8).
    bm, sm = 8, 518
    moge = MoGeModel(MoGeConfig.vitl())
    imgs_m = jnp.asarray(rng.uniform(size=(bm, sm, sm, 3)).astype(np.float32))
    pm = _zeros_params(moge, imgs_m[:1])

    def moge_step(acc, p, x):
        out = moge_infer(moge, p, x, apply_mask=True)
        return acc + out["depth"].sum() + out["intrinsics"].sum()

    fm = jax.jit(moge_step)
    dt = _timed_chain(fm, lambda it: (pm, imgs_m), iters=10)
    moge_ips = bm * 10 / dt
    _emit_partial({"moge_vitl518_images_per_sec": round(moge_ips, 2)})

    # DepthPro35 35-patch pyramid at its native 1536^2, batch 1.
    cfg = DepthPro35Config()
    dp = DepthPro35(cfg)
    sd = cfg.img_size
    imgs_d = jnp.asarray(rng.uniform(size=(1, sd, sd, 3)).astype(np.float32))
    pd = _zeros_params(dp, imgs_d)
    fpx = jnp.full((1,), 1000.0)

    def dp_step(acc, p, x):
        out = depth_pro35_infer(dp, p, x, f_px=fpx)
        return acc + out["depth"].sum()

    fd = jax.jit(dp_step)
    dt = _timed_chain(fd, lambda it: (pd, imgs_d), iters=6)
    dp_ips = 6 / dt

    # Reference stage-1 runs both models per image (depth.py:144-153).
    fused = 1.0 / (1.0 / moge_ips + 1.0 / dp_ips)
    return {
        "moge_vitl518_images_per_sec": round(moge_ips, 2),
        "depthpro35_1536_images_per_sec": round(dp_ips, 2),
        "depth_model_images_per_sec": round(fused, 2),
    }


def bench_registration() -> dict:
    """Config 4: matcher forward (MASt3R-ViT-L shape, 512^2 pairs) +
    reciprocal-NN + hypothesis-batch RANSAC PnP, as jitted programs.

    Per object (`process_image_space.py:34-159`): stage A matches the crop
    against 8 orbit renders — here ONE batch-8 forward + 8 unrolled NN
    kernels + one PnP over the pooled matches (the `match_batch` path in
    `pipeline/backends.py`) — plus a stage-B single-pair re-match + 2nd
    PnP. Both stages are measured directly."""
    import jax
    import jax.numpy as jnp

    from labelany3d_tpu.geometry.pnp import solve_pnp_ransac
    from labelany3d_tpu.models.matcher import MatcherConfig, TwoViewMatcher
    from labelany3d_tpu.ops.reciprocal_nn import reciprocal_nn_match

    rng = np.random.default_rng(0)
    s, n_views = 512, 8
    model = TwoViewMatcher(MatcherConfig.mast3r_vitl())
    img0 = jnp.asarray(rng.uniform(size=(1, s, s, 3)).astype(np.float32))
    img1 = jnp.asarray(rng.uniform(size=(1, s, s, 3)).astype(np.float32))
    params = _zeros_params(model, img0, img1)
    refs = img0  # batch-1 ref: the matcher encodes it once per orbit
    views = jnp.asarray(rng.uniform(size=(n_views, s, s, 3)).astype(np.float32))
    K = jnp.asarray([[560.44, 0, 256.0], [0, 560.44, 256.0], [0, 0, 1]], jnp.float32)

    def lift(m):
        # Lift matched render pixels to a synthetic depth plane -> 3D.
        return jnp.concatenate(
            [(m.xy1 - 256.0) / 560.44 * 2.0, jnp.full((m.xy1.shape[0], 1), 2.0)],
            axis=-1,
        )

    def pair_step(acc, p, a, b, key):
        out = model.apply({"params": p}, a, b)
        m = reciprocal_nn_match(out["desc0"][0], out["desc1"][0])
        pnp = solve_pnp_ransac(lift(m), m.xy0, K, valid=m.valid, key=key)
        return acc + pnp.rotation.sum() + pnp.translation.sum() + m.xy0.sum()

    def orbit_step(acc, p, a, b, key):
        out = model.apply({"params": p}, a, b)
        ms = [reciprocal_nn_match(out["desc0"][v], out["desc1"][v])
              for v in range(n_views)]
        pts3d = jnp.concatenate([lift(m) for m in ms])
        xy = jnp.concatenate([m.xy0 for m in ms])
        valid = jnp.concatenate([m.valid for m in ms])
        pnp = solve_pnp_ransac(pts3d, xy, K, valid=valid, key=key)
        return acc + pnp.rotation.sum() + pnp.translation.sum() + xy.sum()

    key = jax.random.PRNGKey(0)
    iters = 8
    dt_pair = _timed_chain(
        jax.jit(pair_step),
        lambda it: (params, img0, img1, jax.random.fold_in(key, it)), iters=iters
    )
    ms_per_pair = dt_pair / iters * 1000.0
    dt_orbit = _timed_chain(
        jax.jit(orbit_step),
        lambda it: (params, refs, views, jax.random.fold_in(key, it)), iters=4
    )
    ms_orbit = dt_orbit / 4 * 1000.0
    out = {
        "match_pnp_ms_per_view_pair": round(ms_per_pair, 1),
        "orbit8_match_pnp_ms": round(ms_orbit, 1),
        # stage A (batched orbit) + stage B (re-render single pair + PnP)
        "registration_ms_per_object": round(ms_orbit + ms_per_pair, 1),
    }
    _emit_partial(out)
    return out


def bench_registration_amortized() -> dict:
    """Amortized cost when a whole image registers at once
    (`registration/process.py::register_objects`): stage A is ONE matcher
    forward over all objects' 8 orbit pairs + a vmapped hypothesis-batch
    PnP over objects; stage B one batch-I forward + a second vmapped PnP.

    Runs as the LAST bench section: its batch-32 matcher forward is a new
    large tunnel program whose first load can wedge for minutes on a
    degraded tunnel (r04 self-run: 762s past its alarm), so it only ever
    burns leftover budget — a kill here costs nothing downstream."""
    import jax
    import jax.numpy as jnp

    from labelany3d_tpu.geometry.pnp import solve_pnp_ransac
    from labelany3d_tpu.models.matcher import MatcherConfig, TwoViewMatcher
    from labelany3d_tpu.ops.reciprocal_nn import reciprocal_nn_match

    rng = np.random.default_rng(0)
    s, n_views = 512, 8
    model = TwoViewMatcher(MatcherConfig.mast3r_vitl())
    img0 = jnp.asarray(rng.uniform(size=(1, s, s, 3)).astype(np.float32))
    img1 = jnp.asarray(rng.uniform(size=(1, s, s, 3)).astype(np.float32))
    params = _zeros_params(model, img0, img1)
    K = jnp.asarray([[560.44, 0, 256.0], [0, 560.44, 256.0], [0, 0, 1]], jnp.float32)

    out: dict = {}
    key = jax.random.PRNGKey(0)
    n_obj = 4
    views_all = jnp.asarray(
        rng.uniform(size=(n_obj * n_views, s, s, 3)).astype(np.float32))
    refs_all = jnp.asarray(rng.uniform(size=(n_obj, s, s, 3)).astype(np.float32))
    ref_index = jnp.repeat(jnp.arange(n_obj, dtype=jnp.int32), n_views)

    def _nn_all(out):
        # One compiled NN body mapped over pairs — NOT unrolled per pair
        # (mirrors `backends.py::step_pairs`; the unrolled variant's HLO
        # crashed the remote compile helper in r04 runs 4-5).
        return jax.lax.map(
            lambda dd: reciprocal_nn_match(dd[0], dd[1]),
            (out["desc0"], out["desc1"]),
        )

    def _lift(xy1):
        return jnp.concatenate(
            [(xy1 - 256.0) / 560.44 * 2.0, jnp.full(xy1.shape[:-1] + (1,), 2.0)],
            axis=-1,
        )

    def orbit_step_multi(acc, p, a, b, idx, key):
        # match_pairs path: R refs + P views encode as R+P rows in ONE
        # forward; pair p matches views[p] against refs[idx[p]].
        out = model.apply({"params": p}, a, b, ref_index=idx)
        ms = _nn_all(out)
        s_m = ms.xy0.shape[1]
        pts = _lift(ms.xy1).reshape(n_obj, n_views * s_m, 3)
        xys = ms.xy0.reshape(n_obj, n_views * s_m, 2)
        vals = ms.valid.reshape(n_obj, n_views * s_m)
        keys = jax.random.split(key, n_obj)
        pnp = jax.vmap(
            lambda p3, xy, v, k: solve_pnp_ransac(p3, xy, K, valid=v, key=k)
        )(pts, xys, vals, keys)
        return acc + pnp.rotation.sum() + pnp.translation.sum() + xys.sum()

    def stage_b_multi(acc, p, a, b, key):
        out = model.apply({"params": p}, a, b)
        ms = _nn_all(out)
        keys = jax.random.split(key, n_obj)
        pnp = jax.vmap(
            lambda p3, xy, v, k: solve_pnp_ransac(p3, xy, K, valid=v, key=k)
        )(_lift(ms.xy1), ms.xy0, ms.valid, keys)
        return acc + pnp.rotation.sum() + pnp.translation.sum() + ms.xy0.sum()

    try:
        dt_a = _timed_chain(
            jax.jit(orbit_step_multi),
            lambda it: (params, refs_all, views_all, ref_index,
                        jax.random.fold_in(key, it)),
            iters=2, warmup=1,
        )
        dt_b = _timed_chain(
            jax.jit(stage_b_multi),
            lambda it: (params, refs_all, refs_all, jax.random.fold_in(key, it)),
            iters=2, warmup=1,
        )
        out["registration_ms_per_object_amortized4"] = round(
            (dt_a + dt_b) / 2 / n_obj * 1000.0, 1)
    except Exception as e:
        out["registration_amortized_error"] = f"{type(e).__name__}: {e}"[:200]
    return out


def bench_e2e_fast() -> dict:
    """Config 5: end-to-end depth-labeling shard including host IO.

    Synthetic COCO-layout scenes -> DepthStage (MoGe ViT-L 518 + DepthPro35
    backend) -> BoxStage -> Omni3D export, timed over the full shard (minus
    the first flush, which carries the jit compile)."""
    import shutil
    import tempfile

    from labelany3d_tpu.data.rle import mask_to_rle, rle_to_string
    from labelany3d_tpu.models.fakes import FakeScene
    from labelany3d_tpu.pipeline.backends import JaxDepthBackend
    from labelany3d_tpu.pipeline.config import PipelineConfig
    from labelany3d_tpu.pipeline.stages.boxes import BoxStage
    from labelany3d_tpu.pipeline.stages.common import ArrayImageSource
    from labelany3d_tpu.pipeline.stages.depth import DepthStage
    from labelany3d_tpu.pipeline.stages.export import ExportStage
    from labelany3d_tpu.models.depth_pro import DepthProConfig
    from labelany3d_tpu.models.moge import MoGeConfig

    n_images = 8
    size = 512  # the DEFAULT_CONFIG production bucket (and /4-divisible)
    scene = FakeScene(width=size, height=size, fx=500.0, fy=500.0)
    img, depth, masks, _ = scene.make(
        [{"z": 4.0, "rect": (80, 90, 230, 260)}, {"z": 6.0, "rect": (280, 120, 460, 380)}]
    )

    class _Loader:
        def __init__(self):
            self.images = [
                {"id": i + 1, "file_name": f"{i + 1:012d}.jpg", "height": size, "width": size}
                for i in range(n_images)
            ]

        def get_image_by_index(self, i):
            return self.images[i]

        def get_annotations(self, image_id):
            annos = []
            for j, m in enumerate(masks):
                ys, xs = np.nonzero(m)
                annos.append(
                    {
                        "image_id": image_id,
                        "category_id": 62,
                        "iscrowd": 0,
                        "bbox": [float(xs.min()), float(ys.min()),
                                 float(xs.max() - xs.min() + 1), float(ys.max() - ys.min() + 1)],
                        "segmentation": {
                            "size": [size, size],
                            "counts": rle_to_string(mask_to_rle(m)).decode(),
                        },
                    }
                )
            return annos

        def __len__(self):
            return len(self.images)

    loader = _Loader()
    source = ArrayImageSource({i + 1: img for i in range(n_images)})
    cfg = PipelineConfig(
        batch_size=4, max_instances=8, num_points=512,
        image_height=size, image_width=size,
    )
    # Production-default backend: MoGe ViT-L + the fast 2x2 DepthPro
    # redesign (the checkpoint-faithful DepthPro35's cost is measured
    # separately in config 3; using it here would add a second multi-minute
    # compile for the same information).
    backend = JaxDepthBackend(
        MoGeConfig.vitl(), DepthProConfig(), pin_hw=(size, size), use_mesh=False
    )

    from labelany3d_tpu.pipeline.stages.fused import FusedFastStage

    res: dict = {}
    t_sect = time.perf_counter()
    tmp = tempfile.mkdtemp(prefix="la3d_bench_")
    try:
        # PRIMARY FIRST — the runner's production `fast` mode: depth + boxes
        # fused into one device pass per batch, artifacts written once
        # (stages/fused.py). Warm carries the jit compile + program load;
        # the headline e2e number is emitted as a partial the moment it
        # exists so a section kill/overrun cannot lose it (r04 v2 run: the
        # old tail-ordered version timed out with NOTHING recorded).
        FusedFastStage(cfg, backend, loader, source, tmp + "/warmf", "val").run(0, min(4, n_images))
        # Best of two timed shards: the warm shard is only ~1 s of wall
        # clock, so a single window is at the mercy of tunnel weather
        # (observed 6.0-11.3 img/s across otherwise identical r5 full
        # runs); the second shard costs ~1 s and bounds the noise. Each
        # window is emitted as it lands so a kill keeps the first.
        fused_dt = None
        for w in range(2):
            tf0 = time.perf_counter()
            fstage = FusedFastStage(cfg, backend, loader, source,
                                    tmp + f"/runf{w}", "val")
            fstage.run(0, n_images)
            ExportStage(tmp + f"/runf{w}", "val").run()
            dt = time.perf_counter() - tf0
            if fused_dt is None or dt < fused_dt:
                fused_dt = dt
                res["e2e_fast_images_per_sec"] = round(n_images / dt, 2)
                res["e2e_vs_host"] = round(
                    (n_images / dt) / PINNED_HOST_E2E_IPS, 2)
                # Overlapped-phase breakdown (threads overlap, so parts can
                # sum past the wall time): where a slow shard spends it.
                res["e2e_fused_dispatch_s"] = round(fstage.stats["dispatch_s"], 2)
                res["e2e_fused_fetch_s"] = round(fstage.stats["fetch_s"], 2)
                res["e2e_fused_write_s"] = round(fstage.stats["write_s"], 2)
            _emit_partial(res)

        # Depth forward alone (device roofline of the same shard): the
        # backend program over the same batches, accumulator-chained. Runs
        # BEFORE the stage chain — it rides the already-warm forward (~2 s)
        # so it should land even when the chain's gate doesn't.
        if time.perf_counter() - t_sect < 390.0:
            import jax.numpy as jnp

            batch = np.stack([img] * cfg.batch_size)  # uint8; device-normalized
            xb = jnp.asarray(batch)
            out = backend.infer(xb)
            acc = out["relative_depth"].sum()
            float(acc)  # warm
            tf = time.perf_counter()
            acc = jnp.float32(0.0)
            for _ in range(n_images // cfg.batch_size):
                out = backend.infer(xb)
                acc = acc + out["relative_depth"].sum()
            float(acc)
            res["e2e_depth_forward_s"] = round(time.perf_counter() - tf, 2)
            _emit_partial(res)

        # Secondary (gated on section elapsed — program loads dominate on a
        # slow tunnel): the resumable stage chain with the per-phase
        # breakdown (round-2 verdict: the shard was timed as one block;
        # nothing said where the wall clock went). Gate 420: the primary's
        # warm pass alone takes ~380 s of program loads on a healthy
        # tunnel (r5 record), so the old 240 gate could never pass; the
        # chain itself adds ~150 s (label/fusion program loads) which the
        # shared-child budget covers.
        if time.perf_counter() - t_sect < 420.0:
            DepthStage(cfg, backend, loader, source, tmp + "/warm", "val").run(0, min(4, n_images))
            BoxStage(cfg, loader, tmp + "/warm", "val").run(0, min(4, n_images))
            t0 = time.perf_counter()
            DepthStage(cfg, backend, loader, source, tmp + "/run", "val").run(0, n_images)
            t1 = time.perf_counter()
            BoxStage(cfg, loader, tmp + "/run", "val").run(0, n_images)
            t2 = time.perf_counter()
            ExportStage(tmp + "/run", "val").run()
            t3 = time.perf_counter()
            res["e2e_stagechain_images_per_sec"] = round(n_images / (t3 - t0), 2)
            res["e2e_depth_stage_s"] = round(t1 - t0, 2)
            res["e2e_box_stage_s"] = round(t2 - t1, 2)
            res["e2e_export_s"] = round(t3 - t2, 2)
            if "e2e_depth_forward_s" in res:
                res["e2e_host_overhead_s"] = round(
                    res["e2e_depth_stage_s"] - res["e2e_depth_forward_s"], 2)
            _emit_partial(res)
        else:
            res["e2e_stagechain_skipped"] = (
                f"section elapsed {time.perf_counter() - t_sect:.0f}s")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return res


def bench_generative() -> dict:
    """On-chip per-step costs of the generative stack at production shapes
    (random/zeros weights — dense compute cost is weight-value independent):
    TRELLIS SS + SLat CFG velocity steps, the SD UNet step at 64^2 latents,
    SVRM views->triplane, and flash vs XLA attention at the DiT shape.
    These are the stages that dominate the reference's wall clock
    (SURVEY.md section 3B); each model is internally budget-gated so a slow
    tunnel load yields a partial record instead of none."""
    import jax
    import jax.numpy as jnp

    out: dict = {}
    t_start = time.perf_counter()
    rng = np.random.default_rng(0)

    def left() -> float:
        return GENERATIVE_BUDGET_S - (time.perf_counter() - t_start)

    def run_sect(name, min_left, body):
        # Per-section budget gate + fault isolation: a section that fails
        # to build or compile records an error string instead of sinking
        # the whole generative record (several latent TPU-only paths get
        # their first real exercise here).
        if left() <= min_left:
            out[f"{name}_skipped"] = f"budget ({left():.0f}s left)"
            return
        try:
            body()
            _emit_partial(out)
        except Exception as e:  # noqa: BLE001
            out[f"{name}_error"] = f"{type(e).__name__}: {e}"[:160]

    # --- TRELLIS sparse-structure flow: one CFG velocity step (2 model
    # evals + euler update) at ss_flow_img_dit_L shapes: 4096 latent
    # tokens, DiT-L torso, DINOv2-L conditioning (1374 tokens).
    from labelany3d_tpu.models.trellis.sparse_structure import (
        SparseStructureConfig,
        SparseStructureFlowModel,
    )

    ss_cfg = SparseStructureConfig()
    ss = SparseStructureFlowModel(ss_cfg)
    r3 = ss_cfg.latent_res**3
    x_ss = jnp.asarray(rng.normal(size=(1, r3, ss_cfg.latent_channels)).astype(np.float32))
    cond = jnp.asarray(rng.normal(size=(1, 1374, 1024)).astype(np.float32))
    uncond = jnp.zeros_like(cond)
    t1 = jnp.full((1,), 500.0)
    p_ss = _zeros_params(ss, x_ss, t1, cond)

    cond2 = jnp.concatenate([cond, uncond], axis=0)
    t2 = jnp.full((2,), 500.0)

    def ss_step(acc, x, p):
        # Production CFG shape (pipeline.sample_sparse_structure): one
        # batch-2 eval (cond | uncond) instead of two sequential evals.
        v = ss.apply({"params": p}, jnp.broadcast_to(x, (2, *x.shape[1:])), t2, cond2)
        v2 = (1.0 + 7.5) * v[:1] - 7.5 * v[1:]
        x2 = x + (1.0 / 25.0) * v2
        return acc + x2.sum(), x2

    f_ss = jax.jit(ss_step)

    def chain2(fn, x0, iters, *extra):
        # Params ride as explicit jit ARGUMENTS: closing over multi-GB
        # zeros trees bakes them into the HLO as captured constants
        # (measured 2.2 GB lowered for the SS DiT alone), exploding
        # compile + program-load time over the tunnel.
        acc, x = jnp.float32(0.0), x0
        acc, x = fn(acc, x, *extra)
        float(acc)  # compile + program load
        acc, x = jnp.float32(0.0), x0
        t0 = time.perf_counter()
        for _ in range(iters):
            acc, x = fn(acc, x, *extra)
        float(acc)
        return (time.perf_counter() - t0) / iters * 1000.0

    run_sect("trellis_ss", 0, lambda: out.update(
        trellis_ss_cfg_step_ms=round(chain2(f_ss, x_ss, 6, p_ss), 1)))

    # --- TRELLIS SLat flow step at max_voxels=8192 on a production-like
    # voxel set (SS decodes object SURFACES, not uniform noise): a sphere
    # shell filling all 8192 fine slots, whose factor-2 parent count sets
    # the torso bucket exactly as `TrellisPipeline.sample_slat` does.
    def _sec_slat():
        from labelany3d_tpu.models.trellis.pipeline import TrellisPipeline
        from labelany3d_tpu.models.trellis.slat import SLatConfig, SLatFlowModel

        sl_cfg = SLatConfig()
        sl = SLatFlowModel(sl_cfg)
        n = 8192
        g = sl_cfg.resolution
        ax = np.arange(g)
        gg = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"), -1).reshape(-1, 3)
        r = np.linalg.norm(gg - g / 2, axis=1)
        # Largest COMPLETE shell that fits the slot budget (a real object's
        # decoded surface is contiguous; a random subsample would overstate
        # the parent-cell count and understate production compaction).
        for frac in np.linspace(0.45, 0.2, 26):
            shell = gg[np.abs(r - g * frac) < 0.9]
            if len(shell) <= n:
                break
        coords_np = np.zeros((1, n, 3), np.int32)
        coords_np[0, : len(shell)] = shell
        valid_np = (np.arange(n) < len(shell))[None]
        n_fine, torso = TrellisPipeline._slat_buckets(coords_np, valid_np, n)
        out["trellis_slat_torso_slots"] = torso
        coords = jnp.asarray(coords_np[:, :n_fine])
        valid = jnp.asarray(valid_np[:, :n_fine])
        coords2 = jnp.broadcast_to(coords, (2, n_fine, 3))
        valid2 = jnp.broadcast_to(valid, (2, n_fine))
        x_sl = jnp.asarray(
            rng.normal(size=(1, n_fine, sl_cfg.latent_channels)).astype(np.float32))
        p_sl = _zeros_params(sl, x_sl[:1], coords, valid, t1, cond)

        def sl_step(acc, x, p):
            v = sl.apply({"params": p}, jnp.broadcast_to(x, (2, *x.shape[1:])),
                         coords2, valid2, t2, cond2, torso_slots=torso)
            v2 = (1.0 + 3.0) * v[:1] - 3.0 * v[1:]
            x2 = x + (1.0 / 25.0) * v2
            return acc + x2.sum(), x2

        f_sl = jax.jit(sl_step)
        out["trellis_slat_cfg_step_ms"] = round(chain2(f_sl, x_sl, 4, p_sl), 1)

    run_sect("trellis_slat", 180, _sec_slat)

    # --- SD UNet (InvSR/completion backbone) CFG step at 64^2 latents.
    def _sec_unet():
        from labelany3d_tpu.models.diffusion.unet import UNet2D, UNetConfig

        u_cfg = UNetConfig()  # SD-1.5 production layout
        unet = UNet2D(u_cfg)
        x_u = jnp.asarray(rng.normal(size=(2, 64, 64, u_cfg.in_channels)).astype(np.float32))
        t_u = jnp.full((2,), 500.0)
        ctx = jnp.asarray(rng.normal(size=(2, 77, u_cfg.context_dim)).astype(np.float32))
        p_u = _zeros_params(unet, x_u, t_u, ctx)

        def u_step(acc, x, p):
            eps = unet.apply({"params": p}, x, t_u, ctx)
            x2 = x - 0.1 * eps
            return acc + x2.sum(), x2

        f_u = jax.jit(u_step)
        out["sd_unet_step_ms"] = round(chain2(f_u, x_u, 8, p_u), 1)

    run_sect("sd_unet", 150, _sec_unet)

    # --- SVRM views->triplane at the mvd_std layout (7 views, 504^2).
    def _sec_svrm():
        from labelany3d_tpu.models.svrm import SVRM, SVRMConfig

        s_cfg = SVRMConfig()
        svrm = SVRM(s_cfg)
        views = jnp.asarray(
            rng.uniform(size=(1, s_cfg.num_views, s_cfg.image_size,
                              s_cfg.image_size, 3)).astype(np.float32))
        cams = jnp.asarray(rng.normal(size=(1, s_cfg.num_views, s_cfg.cam_dim)).astype(np.float32))
        p_s = _zeros_params(svrm, views, cams)

        def s_step(acc, v, p):
            planes = svrm.apply({"params": p}, v, cams)
            return acc + planes.sum(), v

        f_s = jax.jit(s_step)
        out["svrm_views_to_triplane_ms"] = round(chain2(f_s, views, 2, p_s), 1)

    run_sect("svrm", 150, _sec_svrm)

    # --- Flash vs XLA attention at the DiT shape (16 heads x 4096 x 64):
    # the routing added for SVRM/TRELLIS dense attention, measured.
    def _sec_attn():
        from labelany3d_tpu.ops.attention import flash_sdpa

        q = jnp.asarray(rng.normal(size=(1, 4096, 16, 64)).astype(np.float32))

        def a_flash(acc, x):
            o = flash_sdpa(x.astype(jnp.bfloat16), x.astype(jnp.bfloat16),
                           x.astype(jnp.bfloat16))
            return acc + o.astype(jnp.float32).sum(), x

        def a_xla(acc, x):
            o = jax.nn.dot_product_attention(
                x.astype(jnp.bfloat16), x.astype(jnp.bfloat16),
                x.astype(jnp.bfloat16))
            return acc + o.astype(jnp.float32).sum(), x

        out["attn_dit_flash_ms"] = round(chain2(jax.jit(a_flash), q, 16), 2)
        out["attn_dit_xla_ms"] = round(chain2(jax.jit(a_xla), q, 16), 2)

    run_sect("attn_dit", 90, _sec_attn)
    return out


def bench_e2e_full() -> dict:
    """The FULL `runner.py all` route on-chip (VERDICT r4 ask #2): synthetic
    2-image shard through depth -> enhance (InvSR) -> crops -> completion
    (SD UNet dual-CFG) -> elevation (Zero123) -> reconstruction (TRELLIS,
    production 25+25 schedule, random weights) -> layout (matcher
    registration) -> export, with per-stage seconds. Every stage's time is
    partial-emitted the moment it lands, so a killed section still records
    the stages that ran. Random weights: dense device cost is weight-value
    independent; quality is not measured here."""
    import shutil
    import tempfile

    from labelany3d_tpu.data.rle import mask_to_rle, rle_to_string
    from labelany3d_tpu.models.depth_pro import DepthProConfig
    from labelany3d_tpu.models.fakes import FakeScene
    from labelany3d_tpu.models.moge import MoGeConfig
    from labelany3d_tpu.models.registry import get_model
    from labelany3d_tpu.pipeline.backends import (
        JaxDepthBackend,
        register_default_backends,
    )
    from labelany3d_tpu.pipeline.config import PipelineConfig
    from labelany3d_tpu.pipeline.stages import (
        CompletionStage,
        CropStage,
        DepthStage,
        ElevationStage,
        EnhanceStage,
        ExportStage,
        LayoutStage,
        ReconstructionStage,
    )
    from labelany3d_tpu.pipeline.stages.common import ArrayImageSource

    register_default_backends()
    # 4 images / batch 4 on purpose: identical PipelineConfig + backend
    # shapes to bench_e2e_fast, so in the shared --sections child the
    # depth forward rides the program the e2e section already LOADED
    # (tunnel program load is per-process and was 440s of this section's
    # first standalone run; the XLA disk cache does not cover it).
    n_images = 4
    size = 512
    scene = FakeScene(width=size, height=size, fx=500.0, fy=500.0)
    img, depth, masks, _ = scene.make(
        [{"z": 4.0, "rect": (80, 90, 230, 260)}, {"z": 6.0, "rect": (280, 120, 460, 380)}]
    )
    n_objects = n_images * len(masks)

    class _Loader:
        def __init__(self):
            self.images = [
                {"id": i + 1, "file_name": f"{i + 1:012d}.jpg", "height": size, "width": size}
                for i in range(n_images)
            ]

        def get_image_by_index(self, i):
            return self.images[i]

        def get_annotations(self, image_id):
            annos = []
            for m in masks:
                ys, xs = np.nonzero(m)
                annos.append({
                    "image_id": image_id,
                    "category_id": 62,
                    "iscrowd": 0,
                    "bbox": [float(xs.min()), float(ys.min()),
                             float(xs.max() - xs.min() + 1), float(ys.max() - ys.min() + 1)],
                    "segmentation": {
                        "size": [size, size],
                        "counts": rle_to_string(mask_to_rle(m)).decode(),
                    },
                })
            return annos

        def __len__(self):
            return len(self.images)

    loader = _Loader()
    source = ArrayImageSource({i + 1: img for i in range(n_images)})
    cfg = PipelineConfig(batch_size=4, max_instances=8, num_points=512,
                         image_height=size, image_width=size)
    res: dict = {}
    tmp = tempfile.mkdtemp(prefix="la3d_benchfull_")

    def stage(name, fn, prefix=""):
        import gc

        from labelany3d_tpu.models.registry import unload_all_models

        t0 = time.perf_counter()
        fn()
        res[f"e2e_full_{prefix}{name}_s"] = round(time.perf_counter() - t0, 2)
        _emit_partial(res)
        # Route-style unload (mirrors runner.py): even with the shipping
        # default backends + in-init bf16 casting, keeping the depth
        # stack resident OOM'd TRELLIS's sample_slat on the 16 GB chip
        # (retested r5) — the per-stage unload is load-bearing.
        unload_all_models()
        gc.collect()
    # Enhance/elevation run the SHIPPING defaults (configs/image.yaml:
    # bicubic / zero). The reference-production InvSR and Zero123
    # backends measured 776 s and 634 s of PER-PROCESS tunnel program
    # load on this section's standalone runs (r5) — pure load, not
    # compute (identical cold vs warm-disk-cache) — which no section
    # window can absorb; their per-step device costs are benched in
    # the generative section instead (sd_unet_step_ms et al).
    res["e2e_full_backends"] = (
        "enhance=bicubic completion=passthrough elevation=zero "
        "(shipping defaults; the invsr/our/zero123 SD-class backends "
        "measured 776/1304/634s of per-process tunnel program load — "
        "their per-step device costs are in the generative section) "
        "reconstruction=trellis")

    def route(sd, prefix=""):
        # Backend constructed INSIDE the stage so its ViT-L weights free
        # with the stage (same shapes as bench_e2e_fast -> shared program).
        stage("depth", lambda: DepthStage(
            cfg, JaxDepthBackend(MoGeConfig.vitl(), DepthProConfig(),
                                 pin_hw=(size, size), use_mesh=False),
            loader, source, sd, "val").run(0, n_images),
            prefix)
        stage("enhance", lambda: EnhanceStage(
            cfg, loader, source, sd, "val",
            backend=get_model("enhance", backend="bicubic")).run(0, n_images),
            prefix)
        stage("crops", lambda: CropStage(
            cfg, loader, source, sd, "val").run(0, n_images), prefix)
        stage("completion", lambda: CompletionStage(
            cfg, loader, sd, "val",
            backend=get_model("completion", backend="none")).run(0, n_images),
            prefix)
        stage("elevation", lambda: ElevationStage(
            cfg, loader, sd, "val",
            backend=get_model("elevation", backend="zero")).run(0, n_images),
            prefix)
        stage("reconstruction", lambda: ReconstructionStage(
            cfg, loader, sd, "val",
            backend=get_model("reconstruction", backend="trellis")).run(0, n_images),
            prefix)
        stage("layout", lambda: LayoutStage(
            cfg, loader, sd, "val",
            matcher=get_model("matcher")).run(0, n_images), prefix)
        stage("export", lambda: ExportStage(sd, "val").run(), prefix)

    try:
        t_route = time.perf_counter()
        try:
            route(tmp + "/run")
        except Exception as e:  # noqa: BLE001 — keep completed stage splits
            res["e2e_full_route_error"] = f"{type(e).__name__}: {e}"[:160]
            return res
        total = time.perf_counter() - t_route
        res["e2e_full_images_per_sec"] = round(n_images / total, 3)
        res["e2e_full_objects_per_sec"] = round(n_objects / total, 3)
        res["e2e_full_total_s"] = round(total, 1)
        # Per-stage share of the route (cold: includes compile+program load;
        # the XLA disk cache persists across runs, the tunnel load doesn't).
        shares = {k: v for k, v in res.items()
                  if k.startswith("e2e_full_") and k.endswith("_s")
                  and k != "e2e_full_total_s"}
        top = max(shares, key=shares.get)
        res["e2e_full_dominant_stage"] = (
            f"{top.removeprefix('e2e_full_').removesuffix('_s')} "
            f"({100 * shares[top] / max(total, 1e-9):.0f}%)")
        _emit_partial(res)
        # (A warm second route pass was tried for a steady-state number:
        # with models resident it OOMs — see the stage() note — and with
        # per-stage unloads it would re-pay every weight init, measuring
        # nothing useful. Steady-state per-stage costs are derivable from
        # the depth/registration/generative sections instead.)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return res


def bench_host_e2e() -> float:
    """Measured config-5 host divisor (see PINNED_HOST_E2E_IPS): the same
    synthetic shard as `bench_e2e_fast` as a single-image host loop with
    the reference's stage structure and artifact IO, minus the neural depth
    forwards (which only add cost on the reference side)."""
    import io as _io
    import json as _json
    import tempfile
    import shutil

    from PIL import Image
    from sklearn.decomposition import PCA
    from sklearn.linear_model import LinearRegression, RANSACRegressor

    from labelany3d_tpu.data.rle import mask_to_rle, rle_decode, rle_to_string
    from labelany3d_tpu.models.fakes import FakeScene

    n_images, size = 8, 512
    scene = FakeScene(width=size, height=size, fx=500.0, fy=500.0)
    img, depth_gt, masks, _ = scene.make(
        [{"z": 4.0, "rect": (80, 90, 230, 260)}, {"z": 6.0, "rect": (280, 120, 460, 380)}]
    )
    rng = np.random.default_rng(0)
    rel = depth_gt / 2.0 + rng.normal(0, 0.01, depth_gt.shape).astype(np.float32)
    rles = [rle_to_string(mask_to_rle(m)).decode() for m in masks]
    K = scene.intrinsics()

    tmp = tempfile.mkdtemp(prefix="la3d_hoste2e_")
    try:
        t0 = time.perf_counter()
        all_boxes = []
        for b in range(n_images):
            # stage 1: align + artifacts (depth.py:52-92,156-167 shape)
            # residual_threshold pinned: FakeScene's planar background makes
            # MAD(y) degenerate (constant-depth majority).
            reg = RANSACRegressor(estimator=LinearRegression(fit_intercept=False),
                                  min_samples=0.2, residual_threshold=0.05)
            valid = depth_gt < 400.0
            reg.fit(rel[valid].reshape(-1, 1), depth_gt[valid].reshape(-1, 1))
            depth = np.full_like(rel, 10000.0)
            depth[valid] = reg.predict(rel[valid].reshape(-1, 1)).ravel()
            np.save(f"{tmp}/depth_{b}.npy", depth)
            with open(f"{tmp}/cam_{b}.json", "w") as f:
                _json.dump({"K": K.tolist()}, f)
            buf = _io.BytesIO()
            Image.fromarray(img).save(buf, format="PNG")
            # stage 7-lite: read back, decode, backproject, fit, write
            depth = np.load(f"{tmp}/depth_{b}.npy")
            Kinv = np.linalg.inv(K)
            xs, ys = np.meshgrid(np.arange(size), np.arange(size))
            coords = np.stack([xs, ys, np.ones_like(xs)], -1).astype(np.float32)
            pts = depth[..., None] * (coords @ Kinv.T)
            boxes = []
            for r in rles:
                m = rle_decode({"size": [size, size], "counts": r})
                obj = pts[m.astype(bool)]
                if obj.shape[0] > 500:
                    obj = obj[rng.integers(0, obj.shape[0], 500)]
                pca = PCA(2)
                pca.fit(obj[:, [0, 2]])
                v = pca.components_[0]
                yaw = np.arctan2(v[1], v[0])
                cth, sth = np.cos(yaw), np.sin(yaw)
                R = np.array([[cth, 0, sth], [0, 1, 0], [-sth, 0, cth]])
                rp = (R @ obj.T).T
                mins, maxs = rp.min(0), rp.max(0)
                boxes.append({"center_cam": ((mins + maxs) / 2).tolist(),
                              "dimensions": (maxs - mins).tolist()})
            with open(f"{tmp}/bbox_{b}.json", "w") as f:
                _json.dump(boxes, f)
            all_boxes.append(boxes)
        # stage 8: combine
        with open(f"{tmp}/export.json", "w") as f:
            _json.dump({"annotations": all_boxes}, f)
        dt = time.perf_counter() - t0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return n_images / dt


def bench_host(rel, metric, dmask, K, masks) -> float:
    """Reference-shaped single-image host loop (sklearn + numpy); used only
    by --rebaseline to refresh PINNED_HOST_IPS."""
    rng = np.random.default_rng(0)
    best = 0.0
    for _window in range(10):
        best = max(best, _bench_host_window(rel, metric, dmask, K, masks, rng))
    return best


def _bench_host_window(rel, metric, dmask, K, masks, rng) -> float:
    from sklearn.decomposition import PCA
    from sklearn.linear_model import LinearRegression, RANSACRegressor

    t0 = time.perf_counter()
    for b in range(HOST_TIMED_IMAGES):
        # stage-1 alignment (depth.py:52-92 shape: RANSAC over all px)
        reg = RANSACRegressor(estimator=LinearRegression(fit_intercept=False), min_samples=0.2)
        valid = dmask[b] & (metric[b] < 400.0)
        reg.fit(rel[b][valid].reshape(-1, 1), metric[b][valid].reshape(-1, 1))
        depth = np.full_like(rel[b], 10000.0)
        depth[valid] = reg.predict(rel[b][valid].reshape(-1, 1)).ravel()
        # back-projection (util.py:52-75 shape)
        Kinv = np.linalg.inv(K[b])
        xs, ys = np.meshgrid(np.arange(W), np.arange(H))
        coords = np.stack([xs, ys, np.ones_like(xs)], -1).astype(np.float32)
        pts = depth[..., None] * (coords @ Kinv.T)
        # per-object extraction + box fit (util_3dbox.py:106-178 shape)
        for i in range(I):
            obj = pts[masks[b, i]]
            if obj.shape[0] > 500:
                obj = obj[rng.integers(0, obj.shape[0], 500)]
            pca = PCA(2)
            pca.fit(obj[:, [0, 2]])
            v = pca.components_[0]
            yaw = np.arctan2(v[1], v[0])
            c, s = np.cos(yaw), np.sin(yaw)
            R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
            rp = (R @ obj.T).T
            mins, maxs = rp.min(0), rp.max(0)
            _center = (mins + maxs) / 2
            _dims = maxs - mins
    dt = time.perf_counter() - t0
    return HOST_TIMED_IMAGES / dt


class _Alarm:
    """Hard wall-clock bound on a sub-bench via SIGALRM: a wedged remote
    compile service would otherwise hang the whole bench past the driver's
    timeout and lose the record entirely."""

    def __init__(self, seconds: float):
        self.seconds = max(int(seconds), 1)

    def __enter__(self):
        import signal

        def _raise(signum, frame):
            raise TimeoutError(f"sub-bench exceeded {self.seconds}s")

        self._prev = signal.signal(signal.SIGALRM, _raise)
        signal.alarm(self.seconds)

    def __exit__(self, *exc):
        import signal

        signal.alarm(0)
        signal.signal(signal.SIGALRM, self._prev)
        return False


def main():
    rng = np.random.default_rng(0)
    rel, metric, dmask, K, masks = make_batch(rng)

    if "--rebaseline" in sys.argv:
        host_ips = bench_host(rel, metric, dmask, K, masks)
        print(json.dumps({"suggested_PINNED_HOST_IPS": round(host_ips, 3),
                          "current": PINNED_HOST_IPS}))
        return
    if "--rebaseline-e2e" in sys.argv:
        best = max(bench_host_e2e() for _ in range(3))
        print(json.dumps({"suggested_PINNED_HOST_E2E_IPS": round(best, 3),
                          "current": PINNED_HOST_E2E_IPS}))
        return
    if "--sections" in sys.argv:
        # Child mode: run the listed sub-benches IN ORDER in one process
        # (tunnel program loads stay warm across sections), streaming each
        # section's dict as a {"__section__": name, ...} stdout line the
        # moment it completes. The PARENT enforces per-section deadlines
        # with a kill — the only bound a C-blocked tunnel program load
        # cannot sail past (r04 self-runs: a matcher load overran its
        # SIGALRM window by 560s; a per-section child re-paid 650s of
        # program loads its in-process run got in 16s).
        global _GLOBAL_LEFT_OVERRIDE, _PARTIAL_EMIT
        names = sys.argv[sys.argv.index("--sections") + 1].split(",")
        _GLOBAL_LEFT_OVERRIDE = float(sys.argv[sys.argv.index("--global-left") + 1])
        _enable_compile_cache()
        fns = {"depth": bench_depth_models, "registration": bench_registration,
               "generative": bench_generative, "e2e": bench_e2e_fast,
               "e2e_full": bench_e2e_full,
               "registration_amortized": bench_registration_amortized}
        for name in names:
            _PARTIAL_EMIT = (lambda d, _n=name:
                             print(json.dumps({"__partial__": _n, **d}), flush=True))
            t_sub = time.perf_counter()
            try:
                res = fns[name]()
            except Exception as e:  # noqa: BLE001 — partial beats nothing
                res = {f"{name}_error": f"{type(e).__name__}: {e}"[:200]}
            res[f"{name}_window_s"] = round(time.perf_counter() - t_sub, 1)
            res["__section__"] = name
            print(json.dumps(res), flush=True)
        return

    _enable_compile_cache()
    extra: dict = {}
    tpu_ips = 0.0
    # Backend-init pre-flight IN A SUBPROCESS: a dead tunnel hangs
    # `jax.devices()` inside C (gRPC wait) where SIGALRM cannot interrupt —
    # observed for hours at a stretch. Probing in a child under a hard kill
    # lets a degraded record land instead of hanging past the driver's
    # timeout and losing the record entirely.
    import subprocess

    try:
        probe = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=180.0, capture_output=True,
        )
        backend_ok = probe.returncode == 0
    except subprocess.TimeoutExpired:
        backend_ok = False
    if not backend_ok:
        extra["tunnel_dead"] = True
        extra["tunnel_degraded"] = True
        print(json.dumps({
            "metric": "labeling_core_images_per_sec_512px_16inst",
            "value": 0.0, "unit": "images/s", "vs_baseline": 0.0,
            "extra": extra,
        }))
        return
    try:
        with _Alarm(120):
            extra["tunnel_probe_ms_pre"] = round(_tunnel_probe(), 2)
    except Exception as e:
        extra["tunnel_probe_ms_pre"] = f"{type(e).__name__}"[:40]
    try:
        # Own alarm — NOT the full budget (r03: a degraded-tunnel headline
        # under _Alarm(EXTRA_BUDGET_S) starved every sub-bench).
        with _Alarm(HEADLINE_BUDGET_S):
            tpu_ips = bench_tpu(rel, metric, dmask, K, masks)
    except Exception as e:  # value 0.0 + error beats a hung, lost record
        extra["headline_error"] = f"{type(e).__name__}: {e}"[:200]
        # Degraded-tunnel fallback: one short window still beats 0.0.
        global TPU_WARMUP_ITERS, TPU_TIMED_ITERS
        TPU_WARMUP_ITERS, TPU_TIMED_ITERS = 1, 5
        try:
            with _Alarm(HEADLINE_RETRY_S):
                tpu_ips = bench_tpu(rel, metric, dmask, K, masks)
            extra["headline_note"] = "short-window fallback (5 iters)"
        except Exception as e2:
            extra["headline_retry_error"] = f"{type(e2).__name__}: {e2}"[:200]
    # Sub-benches run in ONE killable child that streams each section's
    # result as a JSON line. Two failure modes shaped this design:
    # (a) SIGALRM cannot interrupt a tunnel program load blocked in C, so
    #     in-process alarm windows are advisory (r03: headline starved all
    #     extras; r04 self-run: registration overran its window by 560s and
    #     starved generative's tail + all of e2e) — only a subprocess kill
    #     is a hard bound;
    # (b) a child PER section re-pays every tunnel program load (measured:
    #     a fresh registration child spent ~650s re-loading programs its
    #     in-process run had in 16s) — so all sections share one child.
    # The parent kills the child only when a section truly overruns its
    # window, then respawns it for the remaining sections; floors of later
    # sections stay reserved. Sections emit __partial__ lines at internal
    # milestones so even a killed section lands its primary numbers. e2e
    # runs before generative: no driver-recorded e2e since r02, while the
    # TRELLIS step costs have a committed self-run record.
    import os
    import threading

    sections = [("depth", 220.0),
                ("registration", 220.0),
                ("e2e", 400.0),
                ("generative", 280.0),
                # The full `all`-route record (VERDICT r4 ask #2). After
                # generative so its TRELLIS programs enter warm, before the
                # amortized tail so a wedged matcher load can't starve it.
                ("e2e_full", 540.0),
                # Last on purpose: its batch-32 matcher program load can
                # wedge on a degraded tunnel; here it only burns leftovers.
                ("registration_amortized", 100.0)]
    pending = list(sections)
    while pending:
        left = EXTRA_BUDGET_S - (time.perf_counter() - _T_START)
        if left < pending[0][1]:
            extra[f"{pending[0][0]}_skipped"] = f"budget ({left:.0f}s left)"
            pending.pop(0)
            continue
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--sections", ",".join(n for n, _ in pending),
             "--global-left", f"{left:.0f}"],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True)
        finals: dict = {}
        partials: dict = {}

        def _reader(stream=proc.stdout, fin=finals, par=partials):
            for ln in stream:
                try:
                    d = json.loads(ln)
                except ValueError:
                    continue
                if "__section__" in d:
                    fin[d.pop("__section__")] = d
                elif "__partial__" in d:
                    par[d.pop("__partial__")] = d

        threading.Thread(target=_reader, daemon=True).start()

        spawned = list(pending)
        for idx, (name, floor) in enumerate(spawned):
            left = EXTRA_BUDGET_S - (time.perf_counter() - _T_START)
            reserved_later = sum(f for _, f in spawned[idx + 1:])
            window = max(floor, left - reserved_later)
            deadline = time.perf_counter() + window
            while (name not in finals and proc.poll() is None
                   and time.perf_counter() < deadline):
                time.sleep(2.0)
            if name not in finals and proc.poll() is not None:
                time.sleep(2.0)  # let the reader drain the pipe tail
            if name in finals:
                pending.pop(0)
                continue
            if proc.poll() is not None:
                extra[f"{name}_error"] = f"child exited rc={proc.returncode}"
            else:
                proc.kill()
                proc.wait()
                extra[f"{name}_error"] = f"hard timeout (window {window:.0f}s)"
            pending.pop(0)  # respawn the child for the remaining sections
            break
        else:
            try:
                proc.wait(timeout=30)
            except subprocess.TimeoutExpired:
                proc.kill()
        for name, _ in spawned:
            if name in finals:
                extra.update(finals[name])
            elif name in partials:
                extra.update(partials[name])
                extra[f"{name}_partial"] = True
    try:
        with _Alarm(60):
            extra["tunnel_probe_ms_post"] = round(_tunnel_probe(), 2)
    except Exception as e:
        extra["tunnel_probe_ms_post"] = f"{type(e).__name__}"[:40]
    # Self-explaining health flag: a quiet tunnel probes ~1-5 ms. A probe
    # that RAISED (recorded as a string) is the strongest degradation
    # signal of all — r03 shipped tunnel_degraded=false on a run whose
    # pre-probe timed out because raised probes were filtered out here.
    probes = [extra.get("tunnel_probe_ms_pre"), extra.get("tunnel_probe_ms_post")]
    extra["tunnel_degraded"] = any(
        not isinstance(v, (int, float)) or v > 25.0 for v in probes
    )
    print(
        json.dumps(
            {
                "metric": "labeling_core_images_per_sec_512px_16inst",
                "value": round(tpu_ips, 2),
                "unit": "images/s",
                "vs_baseline": round(tpu_ips / PINNED_HOST_IPS, 2),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
