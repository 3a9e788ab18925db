"""Profile the registration matcher pair-forward + reciprocal NN on TPU.

The per-object registration cost (~428 ms over 9 pairs) is dominated by
the TwoViewMatcher forward (~32 ms/pair at ~21% MFU per docs/PERF.md) and
the reciprocal-NN pass (~20 ms/pair). This captures a device trace of the
production `step_batch` program (1 ref x 8 views, MASt3R ViT-L/16 shapes
at 512^2) and prints per-op self-times so the round-5 optimization pass
(VERDICT r4 ask #4) targets measured costs.

Usage: python scripts/profile_matcher.py [--views 8] [--iters 4] [--nn/--no-nn]
"""

from __future__ import annotations

import argparse
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from scripts.profile_trellis import dump_op_stats  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=8)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--top", type=int, default=45)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--nn", action=argparse.BooleanOptionalAction, default=True)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from labelany3d_tpu.models.matcher import MatcherConfig, TwoViewMatcher
    from labelany3d_tpu.ops.reciprocal_nn import reciprocal_nn_match

    jax.config.update("jax_compilation_cache_dir", "/tmp/la3d_jax_cache")
    rng = np.random.default_rng(0)
    model = TwoViewMatcher(MatcherConfig.mast3r_vitl())
    s, v = args.size, args.views
    ref = jnp.asarray(rng.uniform(size=(1, s, s, 3)).astype(np.float32))
    views = jnp.asarray(rng.uniform(size=(v, s, s, 3)).astype(np.float32))
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), ref, views)["params"]
    params = jax.tree.map(lambda sd: jnp.zeros(sd.shape, sd.dtype), shapes)

    def step(acc, p, r, vw):
        out = model.apply({"params": p}, r, vw)
        if args.nn:
            res = [reciprocal_nn_match(out["desc0"][i], out["desc1"][i])
                   for i in range(v)]
            stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *res)
            return acc + stacked.xy0.sum() + out["pts3d1"].sum()
        return acc + out["desc0"].sum() + out["pts3d1"].sum()

    f = jax.jit(step)
    t0 = time.perf_counter()
    acc = f(jnp.float32(0.0), params, ref, views)
    print(f"warm acc: {float(acc)} ({time.perf_counter() - t0:.1f}s)", flush=True)
    t0 = time.perf_counter()
    acc = jnp.float32(0.0)
    for _ in range(args.iters):
        acc = f(acc, params, ref, views)
    float(acc)
    per = (time.perf_counter() - t0) / args.iters * 1000
    print(f"untraced: {per:.1f} ms / {v}-view orbit = {per / v:.1f} ms/pair",
          flush=True)

    logdir = tempfile.mkdtemp(prefix="matcher_prof_")
    jax.profiler.start_trace(logdir)
    acc = jnp.float32(0.0)
    for _ in range(args.iters):
        acc = f(acc, params, ref, views)
    _ = float(acc)
    jax.profiler.stop_trace()
    print("trace at", logdir, flush=True)
    dump_op_stats(logdir, args.top)
    print(f"(divide self_us by {args.iters} iters for per-orbit cost)")


if __name__ == "__main__":
    main()
