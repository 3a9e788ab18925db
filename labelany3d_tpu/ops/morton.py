"""Space-filling-curve codes for voxel serialization (vox2seq equivalent).

The reference's TRELLIS sparse transformer serializes active voxels along
Z-order or Hilbert curves with a CUDA extension
(`external/TRELLIS/extensions/vox2seq/src/{z_order.cu, hilbert.cu}`; used by
`trellis/modules/sparse/attention/serialized_attn.py:62-78`). Both curves
are pure integer bit manipulation, so on TPU they are plain vectorized jnp
int32 ops — no kernel needed; XLA fuses them into the surrounding sort.

10 bits per axis (grids up to 1024^3; TRELLIS uses 64^3) -> 30-bit codes in
int32.
"""

from __future__ import annotations

import jax.numpy as jnp

BITS = 10


def _part1by2(x: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of x so there are 2 zero bits between each."""
    x = x.astype(jnp.uint32) & 0x3FF
    x = (x | (x << 16)) & 0x30000FF
    x = (x | (x << 8)) & 0x300F00F
    x = (x | (x << 4)) & 0x30C30C3
    x = (x | (x << 2)) & 0x9249249
    return x


def _compact1by2(x: jnp.ndarray) -> jnp.ndarray:
    x = x.astype(jnp.uint32) & 0x9249249
    x = (x | (x >> 2)) & 0x30C30C3
    x = (x | (x >> 4)) & 0x300F00F
    x = (x | (x >> 8)) & 0x30000FF
    x = (x | (x >> 16)) & 0x3FF
    return x


def morton_encode_3d(coords: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) int voxel coords -> (...,) int32 Morton (z-order) codes."""
    coords = jnp.asarray(coords)
    x = _part1by2(coords[..., 0])
    y = _part1by2(coords[..., 1])
    z = _part1by2(coords[..., 2])
    return (x | (y << 1) | (z << 2)).astype(jnp.int32)


def morton_decode_3d(codes: jnp.ndarray) -> jnp.ndarray:
    """(...,) Morton codes -> (..., 3) int32 coords."""
    c = jnp.asarray(codes).astype(jnp.uint32)
    x = _compact1by2(c)
    y = _compact1by2(c >> 1)
    z = _compact1by2(c >> 2)
    return jnp.stack([x, y, z], axis=-1).astype(jnp.int32)


def hilbert_encode_3d(coords: jnp.ndarray, bits: int = BITS) -> jnp.ndarray:
    """(..., 3) coords -> Hilbert-curve indices (Skilling's transpose method).

    Matches the standard axes->transposed-Gray->index construction used by
    vox2seq's hilbert.cu. Fixed `bits` iterations -> fully unrolled, all
    vectorized int ops.
    """
    x = jnp.asarray(coords).astype(jnp.uint32)
    X = [x[..., 0], x[..., 1], x[..., 2]]
    n = 3

    # Inverse undo of Gray code: axes -> transpose.
    M = jnp.uint32(1 << (bits - 1))
    q = M
    for _ in range(bits - 1):
        p = q - 1
        for i in range(n):
            cond = (X[i] & q) != 0
            # invert low bits of X[0] where cond else exchange low bits of
            # X[i] and X[0] via t = (X[0] ^ X[i]) & p
            t_ex = (X[0] ^ X[i]) & p
            X0_ex = X[0] ^ t_ex
            Xi_ex = X[i] ^ t_ex
            X0_inv = X[0] ^ p
            X[0] = jnp.where(cond, X0_inv, X0_ex)
            X[i] = jnp.where(cond, X[i], Xi_ex)
        q = q >> 1

    # Gray encode
    for i in range(1, n):
        X[i] = X[i] ^ X[i - 1]
    t = jnp.zeros_like(X[0])
    q = M
    for _ in range(bits - 1):
        t = jnp.where((X[n - 1] & q) != 0, t ^ (q - 1), t)
        q = q >> 1
    for i in range(n):
        X[i] = X[i] ^ t

    # Interleave the transposed bits into a single index (x-major).
    code = jnp.zeros_like(X[0])
    for b in range(bits - 1, -1, -1):
        for i in range(n):
            bit = (X[i] >> b) & 1
            code = (code << 1) | bit
    return code.astype(jnp.int32)


def hilbert_decode_3d(codes: jnp.ndarray, bits: int = BITS) -> jnp.ndarray:
    """Hilbert indices -> (..., 3) coords (inverse of hilbert_encode_3d)."""
    c = jnp.asarray(codes).astype(jnp.uint32)
    n = 3
    # De-interleave into the transposed form.
    X = [jnp.zeros_like(c) for _ in range(n)]
    for b in range(bits):
        for i in range(n):
            shift = (bits - 1 - b) * n + (n - 1 - i)
            bit = (c >> shift) & 1
            X[i] = X[i] | (bit << (bits - 1 - b))

    # Gray decode
    N = jnp.uint32(2 << (bits - 1))
    t = X[n - 1] >> 1
    for i in range(n - 1, 0, -1):
        X[i] = X[i] ^ X[i - 1]
    X[0] = X[0] ^ t

    # Undo excess work
    q = jnp.uint32(2)
    while int(q) != int(N):
        p = q - 1
        for i in range(n - 1, -1, -1):
            cond = (X[i] & q) != 0
            t_ex = (X[0] ^ X[i]) & p
            X0_ex = X[0] ^ t_ex
            Xi_ex = X[i] ^ t_ex
            X0_inv = X[0] ^ p
            X[0] = jnp.where(cond, X0_inv, X0_ex)
            X[i] = jnp.where(cond, X[i], Xi_ex)
        q = q << 1

    return jnp.stack(X, axis=-1).astype(jnp.int32)
