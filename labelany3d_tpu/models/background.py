"""Background SDF model: positional-encoded MLP + marching-cubes mesh.

Parity target: `src/background_model.py:11-125` in the reference repo —
a NeRF-style Embedder + small MLP fit to background scene points (used by
the in-the-wild mode to close the scene behind objects), extracted with
PyMCubes. Here: Flax MLP + optax fit (jitted scan), extraction via
`labelany3d_tpu.ops.marching_cubes`.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax


def positional_encoding(x: jnp.ndarray, num_freqs: int = 6) -> jnp.ndarray:
    """NeRF embedder parity (`background_model.py:11-41`): [x, sin/cos(2^k x)]."""
    outs = [x]
    for k in range(num_freqs):
        outs.append(jnp.sin((2.0**k) * x))
        outs.append(jnp.cos((2.0**k) * x))
    return jnp.concatenate(outs, axis=-1)


@dataclasses.dataclass(frozen=True)
class BackgroundConfig:
    num_freqs: int = 6
    width: int = 128
    depth: int = 4
    learning_rate: float = 1e-3
    fit_steps: int = 500
    truncation: float = 0.05   # SDF supervision band


class SDFMLP(nn.Module):
    cfg: BackgroundConfig

    @nn.compact
    def __call__(self, x):
        h = positional_encoding(x, self.cfg.num_freqs)
        for i in range(self.cfg.depth):
            h = nn.Dense(self.cfg.width, name=f"fc{i}")(h)
            h = nn.relu(h)
        return nn.Dense(1, name="out")(h)[..., 0]


class BackgroundModel:
    """Fit an SDF to background surface points; extract a mesh."""

    def __init__(self, cfg: BackgroundConfig | None = None, seed: int = 0):
        self.cfg = cfg or BackgroundConfig()
        self.model = SDFMLP(self.cfg)
        self.params = None
        self._seed = seed
        self.bounds = (np.zeros(3), np.ones(3))

    def fit(self, points: np.ndarray) -> float:
        """Fit the zero level set to `points` (surface samples) with
        off-surface regularization; returns the final loss.

        Reference shape (`background_model.py:82-102`): surface points at
        sdf=0 plus random off-surface points pushed away, Adam optimizer.
        """
        cfg = self.cfg
        pts = np.asarray(points, np.float32)
        lo = pts.min(axis=0) - 0.1
        hi = pts.max(axis=0) + 0.1
        self.bounds = (lo, hi)
        norm = (pts - lo) / (hi - lo)  # fit in [0, 1]^3

        key = jax.random.PRNGKey(self._seed)
        params = self.model.init(key, jnp.zeros((1, 3)))["params"]
        tx = optax.adam(cfg.learning_rate)
        opt = tx.init(params)

        data = jnp.asarray(norm)

        def loss_fn(p, k):
            on = self.model.apply({"params": p}, data)
            k1, k2 = jax.random.split(k)
            off = jax.random.uniform(k1, (data.shape[0], 3))
            off_sdf = self.model.apply({"params": p}, off)
            # nearest-surface distance proxy for off-surface supervision
            d = jnp.min(
                jnp.linalg.norm(off[:, None, : ] - data[None, :256], axis=-1), axis=-1
            )
            return jnp.mean(on**2) + jnp.mean((off_sdf - jnp.minimum(d, cfg.truncation * 4)) ** 2)

        @jax.jit
        def step(carry, k):
            p, o = carry
            loss, g = jax.value_and_grad(loss_fn)(p, k)
            up, o = tx.update(g, o, p)
            return (optax.apply_updates(p, up), o), loss

        keys = jax.random.split(key, cfg.fit_steps)
        (params, opt), losses = jax.lax.scan(step, (params, opt), keys)
        self.params = params
        return float(losses[-1])

    def extract_mesh(self, resolution: int = 64):
        """Marching cubes over the fitted SDF; returns (vertices, faces) in
        the original coordinate frame (`background_model.py:104-125`)."""
        from labelany3d_tpu.ops.marching_cubes import marching_cubes_mesh

        assert self.params is not None, "fit() first"
        ts = np.linspace(0.0, 1.0, resolution, dtype=np.float32)
        gx, gy, gz = np.meshgrid(ts, ts, ts, indexing="ij")
        grid = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
        sdf = np.asarray(
            jax.jit(lambda p, x: self.model.apply({"params": p}, x))(self.params, jnp.asarray(grid))
        ).reshape(resolution, resolution, resolution)
        verts, faces = marching_cubes_mesh(sdf, iso=0.0)
        lo, hi = self.bounds
        verts = verts / (resolution - 1) * (hi - lo) + lo
        return verts, faces
