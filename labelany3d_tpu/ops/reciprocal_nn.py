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


def nn_argmax_tiled(
    query: jnp.ndarray,
    bank: jnp.ndarray,
    block_s: int = 1024,
    block_n: int = 1024,
    inner_tiles: int = 8,
    precision: str = "bf16",
    interpret: bool = False,
    n_real: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pallas argmax-NN: per query row, the best bank row by dot similarity.

    XLA fuses `argmax(query @ bank.T)` by recomputing the dot inside the
    reduce — every score is a C-length VPU dot product and the MXU never
    runs (profiled at ~120 ms per call for 4k x 262k x 24 on v5e).
    This kernel tiles the score matrix through VMEM: MXU dot per
    (block_s, block_n) tile, on-chip running max/argmax across bank tiles,
    only (best, idx) per query ever touching HBM. Tie-breaking matches
    `jnp.argmax` (first maximum).

    Two-level reduction: each grid step streams `inner_tiles` bank
    sub-tiles through an in-kernel fori_loop, carrying (best, idx) in
    registers and touching the output refs once per step. Round-2
    profiling showed per-grid-step overhead dominating at 1024 steps
    (64 ms/call vs a ~5 ms roofline); the inner loop cuts the step count
    by `inner_tiles` at the same VMEM footprint for the score tile.
    Defaults are the measured v5e optimum for the production 4k x 262k
    shape (5.4 ms/call); block_n * inner_tiles > 8192 rows exceeds the
    16 MB scoped-VMEM limit (Mosaic stack OOM), so keep the bank block
    at <= 4 MB.

    precision: 'bf16' (default) is a single bf16 MXU pass — the same
    precision class as the reference's TF32 CUDA matmuls (A40), may flip
    near-tie matches vs f32 (cycle-consistency filters those). 'bf16x3'
    splits each f32 operand into bf16 high+low parts and evaluates
    hi@hi + hi@lo + lo@hi (~f32-accurate) as ONE dot over the
    concatenated contraction dim [qh|qh|ql] @ [bh|bl|bh]^T — three
    separate in-kernel dots and Mosaic's f32 HIGHEST path both measured
    ~1000x slower; the concat form is still several-x slower than bf16,
    so it is opt-in.
    """
    from jax.experimental import pallas as pl

    s, c = query.shape
    n = n_real if n_real is not None else bank.shape[0]
    block_o = block_n * inner_tiles       # bank rows per grid step
    sp = -(-s // block_s) * block_s
    np_ = -(-n // block_o) * block_o
    cp = -(-c // 128) * 128  # full-lane contraction: degenerate K stalls MXU
    qp = jnp.pad(query, ((0, sp - s), (0, cp - c)))
    if n_real is None:
        bp = jnp.pad(bank, ((0, np_ - n), (0, cp - c)))
    else:
        # Caller pre-padded the bank (pad_bank_for_nn) — loop callers hoist
        # this 100+ MB HBM pass out of their iteration bodies (profiled at
        # 6.6 ms per round on the 262k x 24 matcher bank).
        assert bank.shape == (np_, cp), (bank.shape, np_, cp)
        bp = bank
    if precision == "bf16x3":
        qh = qp.astype(jnp.bfloat16)
        ql = (qp - qh.astype(jnp.float32)).astype(jnp.bfloat16)
        bh = bp.astype(jnp.bfloat16)
        bl = (bp - bh.astype(jnp.float32)).astype(jnp.bfloat16)
        qp = jnp.concatenate([qh, qh, ql], axis=1)
        bp = jnp.concatenate([bh, bl, bh], axis=1)
        cp *= 3
    grid = (sp // block_s, np_ // block_o)

    exact_fit = np_ == n  # no pad rows -> the col<n mask is dead weight
                          # (measured 12% of call time at 4k x 262k)

    def kernel(q_ref, b_ref, best_ref, idx_ref):
        i, j = pl.program_id(0), pl.program_id(1)
        qf = q_ref[...]
        if precision == "bf16":
            # Cast in-kernel: f32 HBM blocks, bf16 MXU operands (the
            # measured-fast layout; pre-cast bf16 inputs ran slower).
            qf = qf.astype(jnp.bfloat16)

        def sub(t, carry):
            run_best, run_idx = carry
            bf = b_ref[pl.ds(t * block_n, block_n), :]
            if precision == "bf16":
                bf = bf.astype(jnp.bfloat16)
            sim = jax.lax.dot_general(
                qf, bf, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            col = (jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1)
                   + j * block_o + t * block_n)
            if not exact_fit:
                sim = jnp.where(col < n, sim, -jnp.inf)
            lmax = jnp.max(sim, axis=1)                      # (block_s,)
            lidx = jnp.min(
                jnp.where(sim == lmax[:, None], col, jnp.int32(2**30)), axis=1
            )
            take = lmax > run_best
            return (jnp.where(take, lmax, run_best),
                    jnp.where(take, lidx, run_idx))

        neg = jnp.full((block_s,), -jnp.inf, jnp.float32)
        zero = jnp.zeros((block_s,), jnp.int32)
        lbest, lidx = jax.lax.fori_loop(0, inner_tiles, sub, (neg, zero))
        lbest, lidx = lbest[None, :], lidx[None, :]
        row = pl.ds(i, 1)

        @pl.when(j == 0)
        def _first():
            best_ref[row] = lbest
            idx_ref[row] = lidx

        @pl.when(j != 0)
        def _update():
            prev_best = best_ref[row]
            prev_idx = idx_ref[row]
            take = lbest > prev_best
            best_ref[row] = jnp.where(take, lbest, prev_best)
            idx_ref[row] = jnp.where(take, lidx, prev_idx)

    # The (rows, block_s) result arrays are tiny; keep them fully VMEM
    # resident (block = whole array) and row-address by program id.
    rows = sp // block_s
    best, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_s, cp), lambda i, j: (i, 0)),
            pl.BlockSpec((block_o, cp), lambda i, j: (j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((rows, block_s), lambda i, j: (0, 0)),
            pl.BlockSpec((rows, block_s), lambda i, j: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, block_s), jnp.float32),
            jax.ShapeDtypeStruct((rows, block_s), jnp.int32),
        ],
        interpret=interpret,
    )(qp, bp)
    return idx.reshape(-1)[:s], best.reshape(-1)[:s]


def pad_bank_for_nn(
    bank: jnp.ndarray, block_n: int = 1024, inner_tiles: int = 8,
) -> tuple[jnp.ndarray, int]:
    """Pre-pad a bank to `nn_argmax_tiled`'s (row-block, 128-lane) layout.

    Returns (padded_bank, n_real). Callers that query the same bank many
    times (the reciprocal-NN rounds) pad once and pass `n_real` through —
    the matcher profile showed the in-loop pad of the 262k x 24 descriptor
    bank costing 6.6 ms (HBM) per round."""
    n, c = bank.shape
    block_o = block_n * inner_tiles
    np_ = -(-n // block_o) * block_o
    cp = -(-c // 128) * 128
    return jnp.pad(bank, ((0, np_ - n), (0, cp - c))), n


def _argmax_nn(
    query: jnp.ndarray,
    bank: jnp.ndarray,
    n_real: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Nearest bank row per query row by dot similarity; (S,), (S,).

    `n_real` marks `bank` as pre-padded via `pad_bank_for_nn`."""
    if jax.default_backend() == "tpu":
        return nn_argmax_tiled(query, bank, n_real=n_real)
    if n_real is not None:
        bank = bank[:n_real, : query.shape[1]]
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
    compact: int = 1024,
) -> MatchResult:
    """Cycle-consistent matches between (H0, W0, C) and (H1, W1, C) maps.

    Starts from every `subsample`-strided pixel of image 0 (parity with
    `subsample_or_initxy1=8` at `src/matching/matcher.py:36`), ping-pongs
    0->1->0 for `iterations` rounds, then keeps fixed points. Border matches
    are invalidated (parity: +-3 px filter at `matcher.py:44-57`).

    The reference re-queries only not-yet-converged points each round
    (`fast_nn.py:153-160`, dynamic shapes). TPU analog: iteration 1 runs
    all S queries; iterations 2+ gather the (stable-ordered) unconverged
    queries into a static `compact`-row buffer — most points fix after one
    round, so the tail rounds run ~4x smaller NN kernels at identical
    results. If more than `compact` points are still live after round 1
    the overflow never converges and is filtered by `valid` (recall loss
    only on near-textureless pairs; set compact=0 to disable). A frozen
    point re-queries to the same pair every round (the NN maps are
    deterministic), so the last round's pairing + cycle flags ARE the
    final values — the old separate "final pairing + cycle check" pass
    recomputed two full-S NN calls for nothing.
    """
    h0, w0, c = desc0.shape
    h1, w1, _ = desc1.shape
    d0 = desc0.reshape(-1, c)
    d1 = desc1.reshape(-1, c)

    ys = jnp.arange(subsample // 2, h0, subsample, dtype=jnp.int32)
    xs = jnp.arange(subsample // 2, w0, subsample, dtype=jnp.int32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    idx0 = (gy * w0 + gx).reshape(-1)  # (S,)
    s = idx0.shape[0]

    # Pad both banks ONCE — every NN round queries the same two banks, and
    # the (N, 24) -> (N_pad, 128) pad is a 100+ MB HBM pass that the scan
    # body would otherwise repeat (profiled: 6.6 ms x 2 banks x rounds).
    d0p, n0 = pad_bank_for_nn(d0)
    d1p, n1 = pad_bank_for_nn(d1)

    # Round 1: every query.
    idx1, score = _argmax_nn(d0[idx0], d1p, n_real=n1)
    back0, _ = _argmax_nn(d1[idx1], d0p, n_real=n0)
    frozen = back0 == idx0
    cur0 = jnp.where(frozen, idx0, back0)

    sub_s = s if compact <= 0 else min(compact, s)

    def body(carry, _):
        cur0, idx1, score, frozen = carry
        sel = jnp.argsort(frozen, stable=True)[:sub_s]  # live queries first
        qidx = cur0[sel]
        idx1_s, score_s = _argmax_nn(d0[qidx], d1p, n_real=n1)
        back0_s, _ = _argmax_nn(d1[idx1_s], d0p, n_real=n0)
        conv = back0_s == qidx
        act = ~frozen[sel]
        cur0 = cur0.at[sel].set(jnp.where(act & ~conv, back0_s, qidx))
        idx1 = idx1.at[sel].set(jnp.where(act, idx1_s, idx1[sel]))
        score = score.at[sel].set(jnp.where(act, score_s, score[sel]))
        frozen = frozen.at[sel].set(frozen[sel] | conv)
        return (cur0, idx1, score, frozen), None

    (final0, idx1, score, valid), _ = jax.lax.scan(
        body, (cur0, idx1, score, frozen), None, length=max(iterations - 1, 0)
    )

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
