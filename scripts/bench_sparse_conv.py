"""Micro-bench: subm sparse conv formulations on the real TPU.

Compares the production per-offset loop (27 gathers / 27 dots) against a
stacked variant (ONE gather of (27, N) indices + one batched einsum) for
the SLat shapes, to decide the kernel layout from measurement.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main() -> None:
    import jax
    import jax.numpy as jnp

    from labelany3d_tpu.ops.sparse_conv import build_index_grid, subm_sparse_conv3d

    jax.config.update("jax_compilation_cache_dir", "/tmp/la3d_jax_cache")
    rng = np.random.default_rng(0)
    g = 64
    ax = np.arange(g)
    gg = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"), -1).reshape(-1, 3)
    rr = np.linalg.norm(gg - g / 2, axis=1)
    shell = gg[np.abs(rr - g * 0.42) < 0.9][:8192]
    n = 8192
    coords = np.zeros((n, 3), np.int32)
    coords[: len(shell)] = shell
    valid = np.arange(n) < len(shell)
    cj = jnp.asarray(coords)
    vj = jnp.asarray(valid)

    def stacked(features, coords, valid, weights, grid_size):
        nrows, cin = features.shape
        k = weights.shape[0]
        cout = weights.shape[-1]
        half = k // 2
        grid = build_index_grid(coords, valid, grid_size)
        offs = jnp.asarray(
            [[dx - half, dy - half, dz - half]
             for dz in range(k) for dy in range(k) for dx in range(k)], jnp.int32)
        nb = coords[None] + offs[:, None]                       # (27, N, 3)
        inside = jnp.all((nb >= 0) & (nb < grid_size), -1) & valid[None]
        nbc = jnp.clip(nb, 0, grid_size - 1)
        idx = grid[nbc[..., 0], nbc[..., 1], nbc[..., 2]]
        idx = jnp.where(inside & (idx >= 0), idx, nrows)
        w = weights.transpose(2, 1, 0, 3, 4).reshape(k**3, cin, cout)
        feats0 = jnp.concatenate([features, jnp.zeros((1, cin), features.dtype)], 0)
        if cout < cin:
            prod = jnp.einsum("nc,ocd->ond", feats0, w)         # (27, N+1, Co)
            out = jnp.take_along_axis(prod, idx[..., None], axis=1).sum(0)
        else:
            gathered = feats0[idx]                              # (27, N, Ci)
            out = jnp.einsum("onc,ocd->nd", gathered, w)
        return jnp.where(valid[:, None], out, 0.0)

    for cin, cout in [(128, 128), (2048, 128), (1024, 1024)]:
        x = jnp.asarray(rng.standard_normal((n, cin)).astype(np.float32)).astype(jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, 3, cin, cout)).astype(np.float32) * 0.05)

        for name, fn in [("loop", subm_sparse_conv3d), ("stacked", stacked)]:
            f = jax.jit(lambda a, x, fn=fn: (a + fn(x, cj, vj, w, grid_size=g).astype(jnp.float32).sum(), x))

            acc = jnp.float32(0.0)
            acc, x2 = f(acc, x)
            float(acc)
            t0 = time.perf_counter()
            acc = jnp.float32(0.0)
            for _ in range(20):
                acc, x2 = f(acc, x2)
            float(acc)
            per = (time.perf_counter() - t0) / 20 * 1000
            print(f"{cin:5d}->{cout:5d}  {name:8s} {per:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
