"""Benchmark: fused labeling core throughput on TPU vs reference-shaped host.

Measures the geometric heart of the pipeline (BASELINE.json configs 1+2):
RANSAC depth alignment -> back-projection -> per-instance point extraction
-> oriented 3D box fit, at production shapes (512x512 images, 16 instance
slots, 512 points/instance).

  * TPU path: `labelany3d_tpu.pipeline.labeling.labeling_step` — one jitted
    XLA program per image batch.
  * Baseline: the same algorithm reference-shaped — per-image host loop with
    sklearn RANSACRegressor alignment, numpy back-projection, per-object
    boolean indexing + 500-pt subsample + PCA box fit, mirroring
    `src/batch_scripts/depth.py:52-92`, `src/util.py:52-75`,
    `src/util_3dbox.py:106-178` of the reference.

Prints ONE JSON line:
  {"metric": ..., "value": images/sec on TPU, "unit": "images/s",
   "vs_baseline": speedup over the host reference-shaped loop}

`value` (TPU images/s) is the stable metric of record (540-543 across
runs). `vs_baseline` divides by a host measurement and inflates under
concurrent host load despite the best-of-3 window minimum — quiet-host
readings are ~650-800x; treat larger ratios as load artifacts.
"""

from __future__ import annotations

import json
import time

import numpy as np


B, H, W, I, PTS = 8, 512, 512, 16, 512
TPU_WARMUP_ITERS = 10   # tunnel cold-start; see bench_tpu timing notes
TPU_TIMED_ITERS = 50
HOST_TIMED_IMAGES = 3


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


def bench_tpu(rel, metric, dmask, K, masks) -> float:
    import jax
    import jax.numpy as jnp

    from labelany3d_tpu.pipeline.labeling import labeling_step

    # Timing methodology: the tunnel backend executes lazily — dispatch and
    # even block_until_ready can return before remote execution, inflating
    # naive loop timings by orders of magnitude. Each step therefore folds
    # its outputs into an accumulator consumed by the next step, and the
    # wall clock closes over a host fetch of the final value, which forces
    # the whole chain.
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
        acc = jnp.float32(0.0)
        t0 = time.perf_counter()
        for it in range(TPU_TIMED_ITERS):
            acc = fn(acc, *args, jax.random.fold_in(key, window * 1000 + it))
        float(acc)  # forces all TPU_TIMED_ITERS executions
        rates.append(B * TPU_TIMED_ITERS / (time.perf_counter() - t0))
    rates.sort()
    return rates[1]  # median of 3 windows


def bench_host(rel, metric, dmask, K, masks) -> float:
    """Reference-shaped single-image host loop (sklearn + numpy)."""
    rng = np.random.default_rng(0)
    # Best of 3 windows: the fastest window has the least interference from
    # concurrent host load, giving a conservative (stable) vs_baseline.
    best = 0.0
    for _window in range(3):
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


def main():
    rng = np.random.default_rng(0)
    rel, metric, dmask, K, masks = make_batch(rng)
    tpu_ips = bench_tpu(rel, metric, dmask, K, masks)
    host_ips = bench_host(rel, metric, dmask, K, masks)
    print(
        json.dumps(
            {
                "metric": "labeling_core_images_per_sec_512px_16inst",
                "value": round(tpu_ips, 2),
                "unit": "images/s",
                "vs_baseline": round(tpu_ips / host_ips, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
