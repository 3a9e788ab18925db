"""Cross-cutting utilities: precision control, config, profiling, logging."""

from labelany3d_tpu.utils.precision import f32_precision

__all__ = ["f32_precision"]
