"""Matmul precision control for the geometric core.

TPU MXU matmuls default to bfloat16 input precision, which costs ~3 decimal
digits — fine for neural nets, ruinous for pose/box geometry (a 3x3 rotation
chain drifts by ~1e-2). Model code keeps the fast default; every public
geometry function is wrapped with `f32_precision` so its dot/einsum ops run
at full float32 (six-pass) precision regardless of backend defaults.
"""

from __future__ import annotations

import functools

import jax


def f32_precision(fn):
    """Decorator: run `fn` under float32 (highest) matmul precision."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapper
