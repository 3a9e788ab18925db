"""IoU-based bipartite matching: JAX auction solver + exact host solver.

Parity target: `src/tools/combine_results.py:111-144` (`iou2D`,
`hungarian_matching` on -IoU with scipy's `linear_sum_assignment`).

For the export stage's small per-scene problems the exact host solver is
used; the Jacobi-auction solver (`auction_assignment`, vmap over scenes)
provides the same matching fully on-device for the fused pipeline,
converging to an assignment within N*eps of optimal — exact for IoU
matrices once eps is below the IoU resolution that distinguishes candidates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def iou2d_matrix(boxes0: jnp.ndarray, boxes1: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU of (..., N, 4) x (..., M, 4) xyxy boxes -> (..., N, M).

    Matches `iou2D` (`combine_results.py:111-123`) including its 1e-6
    denominator epsilon and the absence of degenerate-box clamping.
    """
    b0 = jnp.asarray(boxes0, jnp.float32)[..., :, None, :]
    b1 = jnp.asarray(boxes1, jnp.float32)[..., None, :, :]
    x1 = jnp.maximum(b0[..., 0], b1[..., 0])
    y1 = jnp.maximum(b0[..., 1], b1[..., 1])
    x2 = jnp.minimum(b0[..., 2], b1[..., 2])
    y2 = jnp.minimum(b0[..., 3], b1[..., 3])
    inter = jnp.maximum(0.0, x2 - x1) * jnp.maximum(0.0, y2 - y1)
    a0 = (b0[..., 2] - b0[..., 0]) * (b0[..., 3] - b0[..., 1])
    a1 = (b1[..., 2] - b1[..., 0]) * (b1[..., 3] - b1[..., 1])
    return inter / (a0 + a1 - inter + 1e-6)


def hungarian_match(boxes0: np.ndarray, boxes1: np.ndarray) -> list[tuple[int, int, float]]:
    """Exact IoU matching on host; returns [(i, j, iou), ...].

    Drop-in equivalent of `hungarian_matching` (`combine_results.py:126-144`).
    Pure numpy: this runs per scene on the export host path, where eager
    jnp ops would pay one device dispatch per arithmetic op.
    """
    from scipy.optimize import linear_sum_assignment

    b0 = np.asarray(boxes0, np.float32)[:, None, :]
    b1 = np.asarray(boxes1, np.float32)[None, :, :]
    x1 = np.maximum(b0[..., 0], b1[..., 0])
    y1 = np.maximum(b0[..., 1], b1[..., 1])
    x2 = np.minimum(b0[..., 2], b1[..., 2])
    y2 = np.minimum(b0[..., 3], b1[..., 3])
    inter = np.maximum(0.0, x2 - x1) * np.maximum(0.0, y2 - y1)
    a0 = (b0[..., 2] - b0[..., 0]) * (b0[..., 3] - b0[..., 1])
    a1 = (b1[..., 2] - b1[..., 0]) * (b1[..., 3] - b1[..., 1])
    iou = inter / (a0 + a1 - inter + 1e-6)
    rows, cols = linear_sum_assignment(-iou)
    return [(int(i), int(j), float(iou[i, j])) for i, j in zip(rows, cols)]


def auction_assignment(
    benefit: jnp.ndarray,
    row_valid: jnp.ndarray | None = None,
    col_valid: jnp.ndarray | None = None,
    num_iters: int = 256,
    eps: float = 1e-4,
) -> jnp.ndarray:
    """Jacobi auction algorithm for one (N, M) assignment problem.

    Maximizes total benefit assigning each valid row a distinct valid column
    (requires #valid rows <= #valid cols to terminate fully). Static shapes;
    `jax.vmap` over a batch of padded scenes, using `row_valid`/`col_valid`
    to mask padding slots.

    Returns (N,) int32: assigned column per row; -1 for invalid rows or rows
    still unassigned after `num_iters` rounds.
    """
    b = jnp.asarray(benefit, jnp.float32)
    n, m = b.shape
    neg = jnp.float32(-1e30)
    if row_valid is None:
        row_valid = jnp.ones(n, bool)
    if col_valid is None:
        col_valid = jnp.ones(m, bool)
    b = jnp.where(col_valid[None, :], b, neg)

    def body(_, carry):
        prices, assigned = carry
        net = b - prices[None, :]  # (N, M)
        order = jnp.argsort(-net, axis=-1)
        best_j = order[:, 0]
        best_v = jnp.take_along_axis(net, best_j[:, None], axis=-1)[:, 0]
        second_v = jnp.take_along_axis(net, order[:, 1:2], axis=-1)[:, 0] if m > 1 else best_v - eps
        bid = best_v - second_v + eps

        bidding = (assigned < 0) & row_valid
        # Highest bid per column wins this round.
        col_bid = jnp.where(
            bidding[:, None] & (jax.nn.one_hot(best_j, m, dtype=bool)),
            bid[:, None],
            neg,
        )  # (N, M)
        win_bid = jnp.max(col_bid, axis=0)
        win_row = jnp.argmax(col_bid, axis=0).astype(jnp.int32)
        has_bid = win_bid > neg / 2

        prices = jnp.where(has_bid, prices + win_bid, prices)
        # Rows dethroned from columns that changed hands lose their slot;
        # winners take them. Express as a per-row recomputation from the
        # column-ownership map to avoid scatters.
        col_of_row = assigned  # (N,)
        col_taken = has_bid  # columns reassigned this round
        lost = jnp.where(col_of_row >= 0, col_taken[jnp.clip(col_of_row, 0, m - 1)], False)
        assigned = jnp.where(lost, -1, assigned)
        col_idx = jnp.arange(m, dtype=jnp.int32)
        # Out-of-range index for columns without a bid -> write dropped, so
        # no stale-value duplicate writes can clobber winners.
        win_row_safe = jnp.where(has_bid, win_row, n)
        assigned = assigned.at[win_row_safe].set(col_idx, mode="drop")
        return prices, assigned

    prices0 = jnp.zeros(m, jnp.float32)
    assigned0 = jnp.full(n, -1, jnp.int32)
    _, assigned = jax.lax.fori_loop(0, num_iters, body, (prices0, assigned0))
    # A valid row whose every valid column is masked (or when valid rows
    # outnumber valid columns) can still have bid on a neg-masked column;
    # gate the result on column validity too, not just row validity.
    assigned_ok = jnp.where(
        assigned >= 0, col_valid[jnp.clip(assigned, 0, m - 1)], False
    )
    return jnp.where(row_valid & assigned_ok, assigned, -1)
