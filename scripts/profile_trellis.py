"""Profile the TRELLIS SS / SLat CFG flow steps on the real TPU chip.

Captures a device trace of the jitted CFG velocity step (the bench's
generative-section programs at production shapes) and prints the top ops
by device self-time with their bound-by classification, so the round-5
optimization pass (VERDICT.md next #1) targets measured costs.

Usage (on the tunnel TPU):
    python scripts/profile_trellis.py [--model slat|ss] [--iters 4]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile

import numpy as np


def zeros_params(model, *example_args):
    import jax
    import jax.numpy as jnp

    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), *example_args)["params"]
    return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)


def dump_op_stats(logdir: str, top: int) -> None:
    xplanes = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    if not xplanes:
        print("no xplane captured", file=sys.stderr)
        return
    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([xplanes[0]], "framework_op_stats", {})
    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except OSError:
            pass
        data = data.decode()
    obj = json.loads(data)
    rows = []
    for t in obj if isinstance(obj, list) else [obj]:
        if isinstance(t, dict) and "cols" in t:
            ids = [c["id"] for c in t["cols"]]
            rows += [dict(zip(ids, [c.get("v") for c in r["c"]])) for r in t["rows"]]
            break
        if isinstance(t, dict):
            rows.append(t)
    dev = [r for r in rows if isinstance(r, dict) and r.get("host_or_device") == "Device"]
    dev.sort(key=lambda r: -float(r.get("total_self_time") or 0.0))
    total = sum(float(r.get("total_self_time") or 0.0) for r in dev)
    print(f"{'op':<66} {'self_us':>12} {'%':>6} {'bound':>10} {'occ':>6}")
    for r in dev[:top]:
        st = float(r.get("total_self_time") or 0.0)
        print(f"{str(r.get('operation', r.get('type')))[:66]:<66} "
              f"{st:>12.0f} {100 * st / max(total, 1e-9):>6.1f} "
              f"{str(r.get('bound_by', ''))[:10]:>10} "
              f"{int(float(r.get('occurrences') or 0)):>6}")
    print(f"total device self-time: {total / 1e6:.3f} s")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="slat", choices=["slat", "ss"])
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/la3d_jax_cache")
    rng = np.random.default_rng(0)
    cond = jnp.asarray(rng.normal(size=(1, 1374, 1024)).astype(np.float32))
    uncond = jnp.zeros_like(cond)
    t1 = jnp.full((1,), 500.0)

    if args.model == "ss":
        from labelany3d_tpu.models.trellis.sparse_structure import (
            SparseStructureConfig,
            SparseStructureFlowModel,
        )

        cfg = SparseStructureConfig()
        model = SparseStructureFlowModel(cfg)
        x0 = jnp.asarray(rng.normal(
            size=(1, cfg.latent_res**3, cfg.latent_channels)).astype(np.float32))
        params = zeros_params(model, x0, t1, cond)
        t2 = jnp.full((2,), 500.0)
        cond2 = jnp.concatenate([cond, uncond], axis=0)

        def step(acc, x, p):
            v = model.apply({"params": p}, jnp.broadcast_to(x, (2, *x.shape[1:])), t2, cond2)
            v2 = (1.0 + 7.5) * v[:1] - 7.5 * v[1:]
            x2 = x + (1.0 / 25.0) * v2
            return acc + x2.sum(), x2
    else:
        from labelany3d_tpu.models.trellis.pipeline import TrellisPipeline
        from labelany3d_tpu.models.trellis.slat import SLatConfig, SLatFlowModel

        cfg = SLatConfig()
        model = SLatFlowModel(cfg)
        n, g = 8192, cfg.resolution
        ax = np.arange(g)
        gg = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"), -1).reshape(-1, 3)
        rr = np.linalg.norm(gg - g / 2, axis=1)
        for frac in np.linspace(0.45, 0.2, 26):
            shell = gg[np.abs(rr - g * frac) < 0.9]
            if len(shell) <= n:
                break
        coords_np = np.zeros((1, n, 3), np.int32)
        coords_np[0, : len(shell)] = shell
        valid_np = (np.arange(n) < len(shell))[None]
        n_fine, torso = TrellisPipeline._slat_buckets(coords_np, valid_np, n)
        print(f"shell={len(shell)} n_fine={n_fine} torso={torso}")
        coords2 = jnp.broadcast_to(jnp.asarray(coords_np[:, :n_fine]), (2, n_fine, 3))
        valid2 = jnp.broadcast_to(jnp.asarray(valid_np[:, :n_fine]), (2, n_fine))
        t2 = jnp.full((2,), 500.0)
        cond2 = jnp.concatenate([cond, uncond], axis=0)
        x0 = jnp.asarray(rng.normal(size=(1, n_fine, cfg.latent_channels)).astype(np.float32))
        params = zeros_params(model, x0, coords2[:1], valid2[:1], t1, cond)

        def step(acc, x, p):
            v = model.apply({"params": p}, jnp.broadcast_to(x, (2, *x.shape[1:])),
                            coords2, valid2, t2, cond2, torso_slots=torso)
            v2 = (1.0 + 3.0) * v[:1] - 3.0 * v[1:]
            x2 = x + (1.0 / 25.0) * v2
            return acc + x2.sum(), x2

    f = jax.jit(step)
    import time

    acc, x = jnp.float32(0.0), x0
    t0 = time.perf_counter()
    acc, x = f(acc, x, params)
    print(f"warm acc: {float(acc)} ({time.perf_counter() - t0:.1f}s compile+load)",
          flush=True)
    # Timed pass without tracing first (trace adds overhead).
    acc, x = jnp.float32(0.0), x0
    t0 = time.perf_counter()
    for _ in range(args.iters):
        acc, x = f(acc, x, params)
    float(acc)
    per = (time.perf_counter() - t0) / args.iters * 1000
    print(f"untraced: {per:.1f} ms/step", flush=True)

    logdir = tempfile.mkdtemp(prefix=f"trellis_{args.model}_prof_")
    jax.profiler.start_trace(logdir)
    acc, x = jnp.float32(0.0), x0
    for _ in range(args.iters):
        acc, x = f(acc, x, params)
    _ = float(acc)
    jax.profiler.stop_trace()
    print("trace at", logdir, flush=True)
    dump_op_stats(logdir, args.top)
    print(f"(divide self_us by {args.iters} iters for per-step cost)")


if __name__ == "__main__":
    main()
