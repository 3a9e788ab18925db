"""Pipeline orchestration: fused device programs + host stage runner.

Replaces reference layer L5 (`src/batch_scripts/*.py`, eight per-image
processes relaying through files) with:
  * `labeling`  — the fused batched device program: depth maps + instance
    masks -> per-instance point clouds -> oriented boxes, one XLA program
    for a whole image batch (the reference's stages 1+7's geometric core);
  * `scene`     — the on-disk scene-directory contract (artifact names,
    skip-if-exists resume) kept bit-compatible as the public surface;
  * `stages`    — stage implementations matching the reference CLIs;
  * `runner`    — argparse CLI with the reference's shared flags
    (--start_index/--end_index/--split/--save_dir/--config);
  * `config`    — YAML + dotted CLI override merge (OmegaConf-style).
"""

from labelany3d_tpu.pipeline.labeling import (
    label_instances,
    depth_fusion,
    LabelingOutput,
)
from labelany3d_tpu.pipeline.scene import SceneDir
from labelany3d_tpu.pipeline.config import PipelineConfig, load_config

__all__ = [
    "label_instances", "depth_fusion", "LabelingOutput", "SceneDir",
    "PipelineConfig", "load_config",
]
