"""Small logging helpers: one-shot runtime degradation warnings.

The reference fails silently when a model is missing (per-object
try/except, `src/batch_scripts/whole.py:104-107`); here every backend that
runs with random-initialized weights or a stand-in component says so once,
so a production run can never mistake placeholder output for real labels.
"""

from __future__ import annotations

import sys

_seen: set[str] = set()


def warn_once(key: str, message: str) -> None:
    """Print `message` to stderr the first time `key` is seen."""
    if key in _seen:
        return
    _seen.add(key)
    print(f"[labelany3d_tpu] WARNING: {message}", file=sys.stderr)


def reset_warnings() -> None:
    """Test hook: clear the seen-key set."""
    _seen.clear()
