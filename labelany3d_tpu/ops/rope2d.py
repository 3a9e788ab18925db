"""2D rotary position embeddings (curope equivalent).

Parity target: `external/mast3r/dust3r/croco/models/curope/` in the
reference tree — a fused CUDA kernel applying RoPE over (y, x) token
positions for the DUSt3R/MASt3R ViT: the head dim splits in half, the first
half rotated by y-position frequencies, the second by x. On TPU the rotate
is elementwise mul/add that XLA fuses into the surrounding matmuls — the
CUDA fusion is the compiler's job here.
"""

from __future__ import annotations

import jax.numpy as jnp


def rope_2d_freqs(dim: int, positions: jnp.ndarray, base: float = 100.0) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables for 2D RoPE.

    Args:
      dim: per-head feature dim (divisible by 4).
      positions: (..., N, 2) integer (y, x) token positions.
      base: frequency base (croco uses 100).

    Returns (cos, sin) of shape (..., N, dim): the first dim/2 channels
    carry y-frequencies, the second dim/2 carry x-frequencies, each half
    internally duplicated pairwise as in standard RoPE.
    """
    assert dim % 4 == 0, "2D RoPE needs dim divisible by 4"
    quarter = dim // 4
    inv_freq = 1.0 / (base ** (jnp.arange(quarter, dtype=jnp.float32) / quarter))
    y = positions[..., 0:1].astype(jnp.float32) * inv_freq  # (..., N, q)
    x = positions[..., 1:2].astype(jnp.float32) * inv_freq
    # each half: [f0, f1, ..., f0, f1, ...] (rotate-half convention)
    cos = jnp.concatenate([jnp.cos(y), jnp.cos(y), jnp.cos(x), jnp.cos(x)], axis=-1)
    sin = jnp.concatenate([jnp.sin(y), jnp.sin(y), jnp.sin(x), jnp.sin(x)], axis=-1)
    return cos, sin


def _rotate_half_sectioned(t: jnp.ndarray) -> jnp.ndarray:
    """Rotate-half applied independently to the y-half and x-half."""
    d = t.shape[-1]
    h = d // 2
    q = d // 4

    def rot(u):
        a, b = u[..., : u.shape[-1] // 2], u[..., u.shape[-1] // 2 :]
        return jnp.concatenate([-b, a], axis=-1)

    return jnp.concatenate([rot(t[..., :h]), rot(t[..., h:])], axis=-1)


def apply_rope_2d(tokens: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Apply 2D RoPE: tokens (..., N, H, D) or (..., N, D) with matching
    cos/sin (..., N, D) (broadcast over heads)."""
    if tokens.ndim == cos.ndim + 1:  # heads axis present
        cos = cos[..., :, None, :]
        sin = sin[..., :, None, :]
    return tokens * cos + _rotate_half_sectioned(tokens) * sin
