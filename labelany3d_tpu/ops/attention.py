"""Sparse-voxel attention patterns (TRELLIS serialized/windowed equivalent).

Parity targets in the reference tree:
  * serialized attention — active voxels ordered along a space-filling
    curve, partitioned into fixed windows with sequence shift, run as
    varlen flash-attn (`external/TRELLIS/trellis/modules/sparse/attention/
    serialized_attn.py:21-180`, CUDA codes from vox2seq);
  * shifted 3D window attention (`windowed_attn.py:20-110`).

TPU-native: both become *static-shape gather -> fused SDPA -> scatter*
programs. Serialized windows are equal-sized by construction (pad to a
window multiple); spatial windows get fixed occupancy slots (bounded
points-per-window, overflow dropped with a mask — TRELLIS's varlen
flash-attn is replaced by masked dense windows, which is MXU-dense and
static). `jax.nn.dot_product_attention` lowers to the fused TPU attention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from labelany3d_tpu.ops.morton import hilbert_encode_3d, morton_encode_3d


def _sdpa(q, k, v, mask=None):
    # q/k/v: (B, S, H, D); mask (B, 1, S, S) boolean or None.
    return jax.nn.dot_product_attention(q, k, v, mask=mask)


def _flash_block_q(n_pad: int) -> int:
    """Largest n_pad divisor <= 768 among n_pad / 2^k (q blocks need not be
    128-aligned; measured optimum for ViT-L/518 (n_pad=1408) is 704)."""
    bq = n_pad
    while bq > 768 and bq % 2 == 0:
        bq //= 2
    return bq


def flash_sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    segment_ids: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Fused self-attention, (B, S, H, D) layout like `jax.nn.dot_product_attention`.

    On TPU this runs the Pallas flash kernel with the full K/V block
    resident in VMEM, so the (S, S) score tensor never touches HBM —
    XLA's stock attention materializes it twice (softmax + scores@V),
    which profiling shows is ~55% of a ViT-L encoder's wall-clock at
    518^2 (HBM-bound). Sequences are padded to a lane multiple and the
    pad masked via segment ids. Non-TPU backends (tests, the virtual CPU
    mesh) fall back to the XLA path — bitwise parity there, ~1e-3 bf16
    difference on TPU.

    segment_ids: optional (B, S) int32, 0 = real token, nonzero = pad;
    callers that pre-pad their sequence to a 128 multiple (e.g. the ViT
    encoder) pass it to skip the per-call pad/unpad round-trip.
    """
    if jax.default_backend() != "tpu":
        if segment_ids is not None:
            mask = (segment_ids == 0)[:, None, None, :]  # (B, 1, 1, S) keys
            return jax.nn.dot_product_attention(q, k, v, mask=mask)
        return jax.nn.dot_product_attention(q, k, v)
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    b, n, h, d = q.shape
    nk = k.shape[1]
    n_pad = -(-n // 128) * 128
    nk_pad = -(-nk // 128) * 128
    bq = _flash_block_q(n_pad)

    def _block_k(nkp: int) -> int:
        # Largest 128-multiple divisor of nkp whose (block_q, block_k)
        # f32 score tile stays <= 4 MB: full K/V resident when it fits
        # (the measured ViT-L/518 optimum), split otherwise — Mosaic's
        # 16 MB scoped-VMEM stack overflows past ~4 MB score tiles
        # (TRELLIS SLat at 8192 tokens: 512 x 8192 x 4 B = 16 MB).
        m = nkp // 128
        dmax = max(1, min(m, (1 << 20) // bq // 128))
        return 128 * next(dd for dd in range(dmax, 0, -1) if m % dd == 0)

    bk = _block_k(nk_pad)
    if bk < min(512, nk_pad):
        # Divisor-starved length (e.g. 9088 = 128 * 71 prime -> bk 128):
        # re-pad K/V to a 512 multiple for a workable split; the extra
        # <= 511 pad keys are masked via segment ids.
        nk_pad = -(-nk // 512) * 512
        bk = _block_k(nk_pad)
    pad_q, pad_k = n_pad - n, nk_pad - nk

    def prep(t, pad):
        if pad:
            t = jnp.pad(t, ((0, 0), (0, pad), (0, 0), (0, 0)))
        return t.transpose(0, 2, 1, 3)  # BSHD -> BHSD

    def pad_ids(ids, length, pad):
        if not pad:
            return ids
        tail = jnp.ones((b, pad), jnp.int32)
        head = jnp.zeros((b, length), jnp.int32) if ids is None else ids
        return jnp.concatenate([head, tail], 1)

    q_ids = pad_ids(segment_ids, n, pad_q)
    kv_ids = pad_ids(segment_ids if nk == n else None, nk, pad_k)
    seg = None
    if q_ids is not None or kv_ids is not None:
        seg = SegmentIds(
            jnp.zeros((b, n_pad), jnp.int32) if q_ids is None else q_ids,
            jnp.zeros((b, nk_pad), jnp.int32) if kv_ids is None else kv_ids,
        )
    bs = BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bk,
        block_q_dkv=bq, block_k_dkv=bk,
        block_q_dq=bq, block_k_dq=bk, block_k_major_dq=bk,
    )
    out = flash_attention(
        prep(q, pad_q), prep(k, pad_k), prep(v, pad_k), segment_ids=seg,
        causal=False, sm_scale=1.0 / float(d) ** 0.5, block_sizes=bs,
    )
    out = out.transpose(0, 2, 1, 3)
    return out[:, :n] if pad_q else out


def _packed_flash_fwd(qkv, num_heads, n_real, block_q):
    """Forward kernel: (B, Npad, 3W) packed qkv -> (B, Npad, W) attention.

    The three operands are BlockSpec *views* of the same packed array
    (q at lane offset 0, k at W, v at 2W), so the Dense(3W) output feeds
    the MXU directly — no split/reshape/transpose layout pass over HBM.
    Heads are processed in 128-lane groups (2 heads at D=64) to satisfy
    the TPU's 128-aligned output-block constraint.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n_pad, w3 = qkv.shape
    w = w3 // 3
    d = w // num_heads
    hpb = max(1, 128 // d)            # heads per 128-lane block
    lanes = hpb * d                    # 128 (or d when d >= 128)
    scale = 1.0 / float(d) ** 0.5
    grid = (b, num_heads // hpb, n_pad // block_q)

    def kernel(q_ref, k_ref, v_ref, o_ref):
        outs = []
        for j in range(hpb):
            sl = slice(j * d, (j + 1) * d)
            q = q_ref[0, :, sl].astype(jnp.bfloat16)
            k = k_ref[0, :, sl].astype(jnp.bfloat16)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            if n_real < n_pad:
                col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                s = jnp.where(col < n_real, s, -jnp.inf)
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=1, keepdims=True)
            v = v_ref[0, :, sl].astype(jnp.bfloat16)
            outs.append(jax.lax.dot_general(
                p.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
        o = outs[0] if hpb == 1 else jnp.concatenate(outs, axis=-1)
        o_ref[0] = o.astype(o_ref.dtype)

    flops = 4 * b * num_heads * n_pad * n_pad * d
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, lanes), lambda bi, hi, qi: (bi, qi, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, lanes),
                         lambda bi, hi, qi, _h=num_heads // hpb: (bi, 0, _h + hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, lanes),
                         lambda bi, hi, qi, _h=num_heads // hpb: (bi, 0, 2 * _h + hi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, lanes),
                               lambda bi, hi, qi: (bi, qi, hi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, w), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=qkv.size * qkv.dtype.itemsize,
            transcendentals=b * num_heads * n_pad * n_pad),
    )(qkv, qkv, qkv)


def _packed_reference(qkv, num_heads, n_real):
    """XLA reference path for the packed layout (non-TPU backends and the
    custom-vjp backward): split -> heads -> fused SDPA -> merge."""
    b, n_pad, w3 = qkv.shape
    w = w3 // 3
    d = w // num_heads
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(b, n_pad, num_heads, d)

    seg = None
    if n_real < n_pad:
        seg = (jnp.arange(n_pad) >= n_real)[None].astype(jnp.int32)
        seg = jnp.broadcast_to(seg, (b, n_pad))
        mask = (seg == 0)[:, None, None, :]
        out = jax.nn.dot_product_attention(heads(q), heads(k), heads(v), mask=mask)
    else:
        out = jax.nn.dot_product_attention(heads(q), heads(k), heads(v))
    return out.reshape(b, n_pad, w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def packed_flash_sdpa(qkv, num_heads: int, n_real: int, block_q: int = 0):
    """Self-attention straight from the packed (B, Npad, 3W) qkv tensor.

    TPU: a Pallas kernel whose q/k/v operands are three BlockSpec views of
    the same packed array, eliminating the split + head-reshape +
    BSHD->BHSD transposes that cost ~13 ms/batch on the ViT-L/518 encoder
    (docs/PERF.md headroom list). Npad must be a multiple of 128 (callers
    pre-pad, like the ViT encoder); tokens at index >= n_real are masked
    as pad. Other backends fall back to the fused XLA path.

    The backward pass recomputes attention via XLA (flash backward adds
    nothing single-chip at these sizes; training paths run on CPU meshes).
    """
    if jax.default_backend() != "tpu":
        return _packed_reference(qkv, num_heads, n_real)
    n_pad = qkv.shape[1]
    bq = block_q or _flash_block_q(n_pad)
    d = qkv.shape[2] // 3 // num_heads
    if (128 % d and d % 128) or (d < 128 and num_heads % (128 // d)):
        return _packed_reference(qkv, num_heads, n_real)
    return _packed_flash_fwd(qkv, num_heads, n_real, bq)


def _packed_fwd_rule(qkv, num_heads, n_real, block_q):
    return packed_flash_sdpa(qkv, num_heads, n_real, block_q), qkv


def _packed_bwd_rule(num_heads, n_real, block_q, qkv, g):
    _, vjp = jax.vjp(lambda t: _packed_reference(t, num_heads, n_real), qkv)
    return (vjp(g)[0],)


packed_flash_sdpa.defvjp(_packed_fwd_rule, _packed_bwd_rule)


def serialized_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    coords: jnp.ndarray,
    valid: jnp.ndarray,
    window_size: int = 512,
    shift: int = 0,
    curve: str = "z_order",
) -> jnp.ndarray:
    """Space-filling-curve windowed attention over sparse voxels.

    Args:
      q, k, v: (N, H, D) per-voxel heads (N = padded voxel slots).
      coords: (N, 3) int voxel coordinates.
      valid: (N,) real-voxel flags.
      window_size: tokens per attention window.
      shift: sequence shift (TRELLIS rotates the serialized order between
        layers, `serialized_attn.py` shift_sequence).
      curve: 'z_order' | 'hilbert'.

    Returns (N, H, D) attended values in the original voxel order.
    """
    n, h, d = q.shape
    code = morton_encode_3d(coords) if curve == "z_order" else hilbert_encode_3d(coords)
    # Push padding slots to the end of the serialization.
    sort_key = jnp.where(valid, code, jnp.int32(2**30))
    order = jnp.argsort(sort_key)
    inv = jnp.argsort(order)

    def serialize(t):
        s = t[order]
        if shift:
            s = jnp.roll(s, -shift, axis=0)
        return s

    pad = (-n) % window_size
    def window(t):
        t = serialize(t)
        t = jnp.pad(t, ((0, pad),) + ((0, 0),) * (t.ndim - 1))
        return t.reshape(-1, window_size, *t.shape[1:])

    qw, kw, vw = window(q), window(k), window(v)
    vmask = window(valid.astype(jnp.int32))[..., 0] if valid.ndim > 1 else window(valid)
    vmask = vmask.astype(bool)  # (B, W)
    attn_mask = vmask[:, None, None, :] & vmask[:, None, :, None]  # (B,1,W,W)
    out = _sdpa(qw, kw, vw, mask=attn_mask)
    out = out.reshape(-1, h, d)[:n]
    if shift:
        out = jnp.roll(out, shift, axis=0)
    return out[inv]


def windowed_attention_3d(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    coords: jnp.ndarray,
    valid: jnp.ndarray,
    grid_size: int,
    window_size: int = 8,
    shift: int = 0,
    max_per_window: int = 512,
) -> jnp.ndarray:
    """Shifted 3D spatial window attention over sparse voxels.

    Voxels attend within their (window_size^3) spatial cell (optionally
    shifted by `shift` along each axis). Each cell gets `max_per_window`
    static slots; overflow voxels fall back to identity (v passthrough).
    """
    n, h, d = q.shape
    shifted = coords + shift
    wcoord = shifted // window_size
    w_per_axis = (grid_size + window_size - 1) // window_size + (1 if shift else 0)
    wid = (
        wcoord[:, 0] * w_per_axis * w_per_axis + wcoord[:, 1] * w_per_axis + wcoord[:, 2]
    ).astype(jnp.int32)
    num_windows = w_per_axis**3

    wid = jnp.where(valid, wid, num_windows)  # padding slots -> overflow bin
    order = jnp.argsort(wid)
    sorted_wid = wid[order]
    # Rank within each window: position minus index of the window's first
    # element in the sorted array.
    first_idx = jnp.searchsorted(sorted_wid, sorted_wid, side="left")
    rank = jnp.arange(n, dtype=jnp.int32) - first_idx.astype(jnp.int32)

    in_slot = (rank < max_per_window) & (sorted_wid < num_windows)
    slot = jnp.where(in_slot, sorted_wid * max_per_window + rank, num_windows * max_per_window)

    def scatter(t):
        buf = jnp.zeros((num_windows * max_per_window + 1,) + t.shape[1:], t.dtype)
        return buf.at[slot].set(t[order], mode="drop")

    qs = scatter(q)[:-1].reshape(num_windows, max_per_window, h, d)
    ks = scatter(k)[:-1].reshape(num_windows, max_per_window, h, d)
    vs = scatter(v)[:-1].reshape(num_windows, max_per_window, h, d)
    occ = jnp.zeros((num_windows * max_per_window + 1,), bool).at[slot].set(in_slot, mode="drop")
    occ = occ[:-1].reshape(num_windows, max_per_window)
    mask = occ[:, None, None, :] & occ[:, None, :, None]
    # Guard fully-empty windows (softmax over -inf rows) by opening the
    # diagonal.
    eye = jnp.eye(max_per_window, dtype=bool)[None, None]
    out_w = _sdpa(qs, ks, vs, mask=mask | eye)

    # Gather back to sorted order, then invert the sort; overflow voxels
    # pass v through unchanged.
    flat = out_w.reshape(num_windows * max_per_window, h, d)
    flat = jnp.concatenate([flat, jnp.zeros((1, h, d), flat.dtype)], axis=0)
    sorted_out = flat[jnp.where(in_slot, slot, num_windows * max_per_window)]
    sorted_out = jnp.where(in_slot[:, None, None], sorted_out, v[order])
    inv = jnp.argsort(order)
    return sorted_out[inv]
