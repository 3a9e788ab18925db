"""Profile the MoGe ViT-L/518 production forward on the real TPU chip.

Captures a device trace of the jitted `moge_infer` step (the bench's
config-3 program) and prints the top ops by device self-time with their
bound-by classification, so head-optimization work (docs/PERF.md
"remaining headroom") targets measured costs, not guesses.

Usage (on the tunnel TPU):
    python scripts/profile_moge.py [--batch 8] [--size 518] [--iters 6]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import tempfile

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=518)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/la3d_jax_cache")

    from labelany3d_tpu.models.moge import MoGeConfig, MoGeModel, moge_infer

    model = MoGeModel(MoGeConfig.vitl())
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(size=(args.batch, args.size, args.size, 3))
                       .astype(np.float32))
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), imgs[:1])
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes)["params"]

    def step(acc, p, x):
        out = moge_infer(model, p, x, apply_mask=True)
        return acc + out["depth"].sum() + out["intrinsics"].sum()

    f = jax.jit(step)
    # Warm: compile + tunnel program load, chained through the accumulator
    # (tunnel executes lazily; block_until_ready is not a barrier).
    acc = jnp.float32(0.0)
    for _ in range(3):
        acc = f(acc, params, imgs)
    print("warm acc:", float(acc), flush=True)

    logdir = tempfile.mkdtemp(prefix="moge_prof_")
    jax.profiler.start_trace(logdir)
    acc = jnp.float32(0.0)
    for _ in range(args.iters):
        acc = f(acc, params, imgs)
    _ = float(acc)  # host fetch = real barrier
    jax.profiler.stop_trace()
    print("trace at", logdir, flush=True)

    xplanes = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                        recursive=True)
    if not xplanes:
        print("no xplane captured", file=sys.stderr)
        return
    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([xplanes[0]], "framework_op_stats", {})
    import gzip
    import json
    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except OSError:
            pass
        data = data.decode()
    obj = json.loads(data)
    # Two observed shapes: a flat list of row dicts, or a gviz-style list
    # of {cols: [{id,...}], rows: [{c: [{v}, ...]}]} tables.
    rows = []
    for t in obj if isinstance(obj, list) else [obj]:
        if isinstance(t, dict) and "cols" in t:
            ids = [c["id"] for c in t["cols"]]
            rows += [dict(zip(ids, [c.get("v") for c in r["c"]]))
                     for r in t["rows"]]
            break  # duplicate tables per device plane
        if isinstance(t, dict):
            rows.append(t)
    dev = [r for r in rows if isinstance(r, dict)
           and r.get("host_or_device") == "Device"]
    dev.sort(key=lambda r: -float(r.get("total_self_time") or 0.0))
    total = sum(float(r.get("total_self_time") or 0.0) for r in dev)
    print(f"{'op':<58} {'self_us':>12} {'%':>6} {'bound':>10} {'occ':>6}")
    for r in dev[: args.top]:
        st = float(r.get("total_self_time") or 0.0)
        print(f"{str(r.get('operation', r.get('type')))[:58]:<58} "
              f"{st:>12.0f} {100 * st / max(total, 1e-9):>6.1f} "
              f"{str(r.get('bound_by', ''))[:10]:>10} "
              f"{int(float(r.get('occurrences') or 0)):>6}")
    print(f"total device self-time: {total / 1e6:.3f} s over {args.iters} iters "
          f"-> {args.batch * args.iters / max(total / 1e6, 1e-9):.1f} img/s device-only")


if __name__ == "__main__":
    main()
