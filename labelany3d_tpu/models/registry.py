"""Lazy model registry with pluggable (and fakeable) backends.

Parity target: `src/model_wrappers.py` in the reference repo — a module-level
`_loaded_models` dict (:27) with per-model `load_*`/`infer_with_*` functions
and `unload_model`/`unload_all_models` (:435-451) for memory management.

Here the same contract is a small class: backends register factories under
string keys ('moge', 'depth_pro', 'matcher', 'enhance', 'completion',
'elevation', 'reconstruction', ...), models are built on first `get`, and
tests swap any backend for a fake via `register_model(name, factory,
override=True)` — which is how the full pipeline runs hermetically on CPU
(SURVEY.md §4's fixture strategy).
"""

from __future__ import annotations

import threading
from typing import Any, Callable


class ModelRegistry:
    def __init__(self) -> None:
        self._factories: dict[str, Callable[..., Any]] = {}
        self._loaded: dict[str, Any] = {}
        self._lock = threading.Lock()

    def register(self, name: str, factory: Callable[..., Any], override: bool = False) -> None:
        with self._lock:
            if name in self._factories and not override:
                raise ValueError(f"Model backend '{name}' already registered")
            self._factories[name] = factory
            self._loaded.pop(name, None)

    def get(self, name: str, **kwargs) -> Any:
        with self._lock:
            if name in self._loaded:
                return self._loaded[name]
            if name not in self._factories:
                raise KeyError(
                    f"No backend registered for '{name}'. "
                    f"Available: {sorted(self._factories)}"
                )
            factory = self._factories[name]
        model = factory(**kwargs)
        with self._lock:
            self._loaded[name] = model
        return model

    def unload(self, name: str) -> bool:
        """Drop a loaded model (its device buffers become collectable).

        Parity: `src/model_wrappers.py:435-445`.
        """
        with self._lock:
            return self._loaded.pop(name, None) is not None

    def unload_all(self) -> None:
        """Parity: `src/model_wrappers.py:448-451`."""
        with self._lock:
            self._loaded.clear()

    def loaded(self) -> list[str]:
        with self._lock:
            return sorted(self._loaded)

    def available(self) -> list[str]:
        with self._lock:
            return sorted(self._factories)


registry = ModelRegistry()


def register_model(name: str, factory: Callable[..., Any], override: bool = False) -> None:
    registry.register(name, factory, override=override)


def get_model(name: str, **kwargs) -> Any:
    return registry.get(name, **kwargs)


def unload_model(name: str) -> bool:
    return registry.unload(name)


def unload_all_models() -> None:
    registry.unload_all()
