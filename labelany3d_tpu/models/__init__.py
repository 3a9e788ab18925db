"""Flax inference models and the lazy model registry.

Replaces reference layers L2/L3 for the geometric labeling path:
  * `vit`        — DINOv2-style ViT encoder (the backbone family used by
                   MoGe, DepthPro, MASt3R and TRELLIS conditioning).
  * `moge`       — MoGe-equivalent affine point-map model with on-device
                   focal/shift recovery (`external/MoGe/moge/model/
                   moge_model.py:298-393` behavior).
  * `depth_pro`  — DepthPro-equivalent metric depth (canonical inverse
                   depth x W/f_px, `external/ml-depth-pro/src/depth_pro/
                   depth_pro.py:244-299` behavior).
  * `matcher`    — MASt3R-style two-view correspondence model.
  * `registry`   — lazy load/unload keyed registry mirroring
                   `src/model_wrappers.py:27,435-451`, with fake backends so
                   the full pipeline runs hermetically in tests.
"""

from labelany3d_tpu.models.vit import ViT, ViTConfig
from labelany3d_tpu.models.moge import MoGeModel, MoGeConfig, moge_infer
from labelany3d_tpu.models.depth_pro import DepthProModel, DepthProConfig, depth_pro_infer
from labelany3d_tpu.models.registry import (
    ModelRegistry,
    registry,
    register_model,
    get_model,
    unload_model,
    unload_all_models,
)

__all__ = [
    "ViT", "ViTConfig", "MoGeModel", "MoGeConfig", "moge_infer",
    "DepthProModel", "DepthProConfig", "depth_pro_infer",
    "ModelRegistry", "registry", "register_model", "get_model",
    "unload_model", "unload_all_models",
]
