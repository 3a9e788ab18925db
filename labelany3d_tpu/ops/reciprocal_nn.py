"""Reciprocal nearest-neighbor descriptor matching (fast_nn equivalent).

Parity target: `external/mast3r/mast3r/fast_nn.py:109`
(`fast_reciprocal_NNs`) in the reference tree — iterative NN ping-pong
between two descriptor maps starting from a subsampled pixel grid, keeping
cycle-consistent pairs; executed there as a CUDA block loop.

TPU-native: each iteration is one (S, C) x (C, HW) matmul + argmax — pure
MXU work with static shapes. A fixed iteration budget replaces the
data-dependent convergence loop (converged points are frozen via masking;
fast_nn converges in a handful of iterations in practice).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class MatchResult(NamedTuple):
    xy0: jnp.ndarray     # (S, 2) pixel coords in image 0
    xy1: jnp.ndarray     # (S, 2) pixel coords in image 1
    valid: jnp.ndarray   # (S,) cycle-consistent flags
    score: jnp.ndarray   # (S,) dot similarity of the final pair


def _argmax_nn(query: jnp.ndarray, bank: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Nearest bank row per query row by dot similarity; (S,), (S,)."""
    sim = jnp.einsum(
        "sc,nc->sn", query, bank, precision=jax.lax.Precision.HIGHEST
    )
    idx = jnp.argmax(sim, axis=-1)
    best = jnp.take_along_axis(sim, idx[:, None], axis=-1)[:, 0]
    return idx.astype(jnp.int32), best


def reciprocal_nn_match(
    desc0: jnp.ndarray,
    desc1: jnp.ndarray,
    subsample: int = 8,
    iterations: int = 6,
    border: int = 3,
) -> MatchResult:
    """Cycle-consistent matches between (H0, W0, C) and (H1, W1, C) maps.

    Starts from every `subsample`-strided pixel of image 0 (parity with
    `subsample_or_initxy1=8` at `src/matching/matcher.py:36`), ping-pongs
    0->1->0 for `iterations` rounds, then keeps fixed points. Border matches
    are invalidated (parity: +-3 px filter at `matcher.py:44-57`).
    """
    h0, w0, c = desc0.shape
    h1, w1, _ = desc1.shape
    d0 = desc0.reshape(-1, c)
    d1 = desc1.reshape(-1, c)

    ys = jnp.arange(subsample // 2, h0, subsample, dtype=jnp.int32)
    xs = jnp.arange(subsample // 2, w0, subsample, dtype=jnp.int32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    idx0 = (gy * w0 + gx).reshape(-1)  # (S,)

    def body(carry, _):
        cur0, _prev1, frozen = carry
        q0 = d0[cur0]
        idx1, _ = _argmax_nn(q0, d1)
        q1 = d1[idx1]
        back0, _ = _argmax_nn(q1, d0)
        converged = back0 == cur0
        new0 = jnp.where(frozen | converged, cur0, back0)
        return (new0, idx1, frozen | converged), None

    init = (idx0, jnp.zeros_like(idx0), jnp.zeros_like(idx0, dtype=bool))
    (final0, final1, frozen), _ = jax.lax.scan(body, init, None, length=iterations)

    # Final pairing + cycle check at the fixed point.
    idx1, score = _argmax_nn(d0[final0], d1)
    back0, _ = _argmax_nn(d1[idx1], d0)
    valid = back0 == final0

    x0 = (final0 % w0).astype(jnp.float32)
    y0 = (final0 // w0).astype(jnp.float32)
    x1 = (idx1 % w1).astype(jnp.float32)
    y1 = (idx1 // w1).astype(jnp.float32)
    in_border0 = (x0 >= border) & (x0 < w0 - border) & (y0 >= border) & (y0 < h0 - border)
    in_border1 = (x1 >= border) & (x1 < w1 - border) & (y1 >= border) & (y1 < h1 - border)
    valid = valid & in_border0 & in_border1

    return MatchResult(
        xy0=jnp.stack([x0, y0], axis=-1),
        xy1=jnp.stack([x1, y1], axis=-1),
        valid=valid,
        score=score,
    )
