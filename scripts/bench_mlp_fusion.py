"""Micro-bench: where the ViT MLP's exact-erf GELU should live.

Round-4 found that letting XLA fuse the GELU into fc2's OPERAND stalls the
MXU (fc2 91 vs 171 TFLOP/s), so `models/vit.py::Mlp` barriers it out on
both sides — which also blocks fusing it into fc1's output EPILOGUE.
Measures all three placements at ViT-L/518 shapes (8, 1408, 1024).
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/la3d_jax_cache")
    rng = np.random.default_rng(0)
    b, n, w, h = 8, 1408, 1024, 4096
    x0 = jnp.asarray(rng.standard_normal((b, n, w)).astype(np.float32)).astype(jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((w, h)).astype(np.float32) * 0.02).astype(jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32) * 0.02).astype(jnp.bfloat16)

    def mlp(x, mode):
        for _ in range(24):
            hdd = x @ w1
            if mode == "both_barriers":
                hdd = jax.lax.optimization_barrier(hdd)
                hdd = jax.nn.gelu(hdd, approximate=False)
                hdd = jax.lax.optimization_barrier(hdd)
            elif mode == "post_barrier":
                hdd = jax.nn.gelu(hdd, approximate=False)
                hdd = jax.lax.optimization_barrier(hdd)
            elif mode == "no_barrier":
                hdd = jax.nn.gelu(hdd, approximate=False)
            elif mode == "tanh_post":
                hdd = jax.nn.gelu(hdd, approximate=True)
                hdd = jax.lax.optimization_barrier(hdd)
            x = hdd @ w2
        return x

    for mode in ["both_barriers", "post_barrier", "no_barrier", "tanh_post"]:
        f = jax.jit(lambda a, x, m=mode: (a + mlp(x, m).astype(jnp.float32).sum(), x))
        acc = jnp.float32(0.0)
        acc, x = f(acc, x0)
        float(acc)
        t0 = time.perf_counter()
        acc = jnp.float32(0.0)
        for _ in range(10):
            acc, x = f(acc, x)
        float(acc)
        per = (time.perf_counter() - t0) / 10 * 1000
        flops = 24 * 2 * 2 * b * n * w * h
        print(f"{mode:14s} {per:7.2f} ms  {flops / per / 1e9:6.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main()
