"""Sequence-parallel attention over a mesh axis (shard_map + collectives).

SURVEY.md §5: the reference's only sequence-length scaling is TRELLIS's
single-GPU serialized attention; voxel counts beyond one chip would need
the sequence sharded across devices. This module provides that path:

  * `sp_attention_gathered` — Q stays sharded; K/V are all-gathered over
    the sequence axis (one `all_gather` per layer; right when the KV bytes
    fit HBM — the common case for 64^3-sparse voxel counts);
  * `sp_attention_ring` — ring attention: K/V blocks rotate around the
    axis via `ppermute` with online-softmax accumulation (O(S/d) memory,
    overlappable; right when KV does not fit or ICI overlap is needed).

Both are exact (match dense attention bit-for-bit up to reduction order)
and tested against the single-device result on the CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def sp_attention_gathered(q, k, v, axis_name: str = "data"):
    """Attention with the sequence sharded over `axis_name`.

    q/k/v: (S_local, H, D) per-device shards (use under shard_map). K/V are
    all-gathered; Q stays local, so the output is sequence-sharded like Q.
    """
    k_full = jax.lax.all_gather(k, axis_name, axis=0, tiled=True)
    v_full = jax.lax.all_gather(v, axis_name, axis=0, tiled=True)
    scale = 1.0 / jnp.sqrt(q.shape[-1]).astype(q.dtype)
    logits = jnp.einsum("qhd,khd->hqk", q, k_full) * scale
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("hqk,khd->qhd", w, v_full)


def sp_attention_ring(q, k, v, axis_name: str = "data"):
    """Ring attention: K/V blocks rotate via ppermute; online softmax.

    Exact; memory O(S_local) per device. q/k/v: (S_local, H, D) shards.
    """
    n = jax.lax.psum(1, axis_name)
    scale = 1.0 / jnp.sqrt(q.shape[-1]).astype(jnp.float32)
    qf = q.astype(jnp.float32)

    def step(carry, _):
        k_blk, v_blk, acc, den, m_run = carry
        logits = jnp.einsum("qhd,khd->qhk", qf, k_blk.astype(jnp.float32)) * scale
        m_blk = jnp.max(logits, axis=-1, keepdims=True)          # (q,h,1)
        m_new = jnp.maximum(m_run, m_blk)
        p = jnp.exp(logits - m_new)                              # (q,h,k)
        corr = jnp.exp(m_run - m_new)
        acc = acc * corr + jnp.einsum("qhk,khd->qhd", p, v_blk.astype(jnp.float32))
        den = den * corr + jnp.sum(p, axis=-1, keepdims=True)
        # rotate K/V to the next device
        perm = [(i, (i + 1) % n) for i in range(n)]
        k_next = jax.lax.ppermute(k_blk, axis_name, perm)
        v_next = jax.lax.ppermute(v_blk, axis_name, perm)
        return (k_next, v_next, acc, den, m_new), None

    # Derive the initial carries from q so they are marked as varying over
    # the shard_map axis (fresh constants would be 'unvarying' and trip the
    # scan carry type check).
    acc0 = qf * 0.0
    den0 = qf[..., :1] * 0.0
    m0 = qf[..., :1] * 0.0 - jnp.inf
    (k_f, v_f, acc, den, m_run), _ = jax.lax.scan(
        step, (k, v, acc0, den0, m0), None, length=n
    )
    return (acc / jnp.maximum(den, 1e-30)).astype(q.dtype)


def make_sp_attention(mesh: Mesh, axis: str = "data", mode: str = "gathered"):
    """shard_map-wrapped sequence-parallel attention on `mesh`.

    Returns fn(q, k, v) over (S, H, D) arrays sharded on axis 0.
    """
    from jax.experimental.shard_map import shard_map

    inner = sp_attention_gathered if mode == "gathered" else sp_attention_ring
    spec = P(axis, None, None)
    fn = shard_map(
        functools.partial(inner, axis_name=axis),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return jax.jit(fn)
