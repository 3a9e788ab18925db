"""Sequence-parallel attention vs dense single-device reference."""

import numpy as np
import jax
import jax.numpy as jnp

from labelany3d_tpu.parallel.mesh import make_mesh
from labelany3d_tpu.parallel.sp import make_sp_attention


def _dense_reference(q, k, v):
    scale = 1.0 / np.sqrt(q.shape[-1])
    logits = np.einsum("qhd,khd->hqk", q, k) * scale
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    return np.einsum("hqk,khd->qhd", p, v)


def test_sp_attention_modes_match_dense(rng):
    s, h, d = 64, 2, 16  # 8 tokens per device on the 8-dev mesh
    q = rng.normal(size=(s, h, d)).astype(np.float32)
    k = rng.normal(size=(s, h, d)).astype(np.float32)
    v = rng.normal(size=(s, h, d)).astype(np.float32)
    ref = _dense_reference(q, k, v)

    mesh = make_mesh(data=8, model=1)
    for mode in ("gathered", "ring"):
        fn = make_sp_attention(mesh, axis="data", mode=mode)
        with mesh:
            out = np.asarray(fn(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-4), mode
