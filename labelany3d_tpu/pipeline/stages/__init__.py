"""Stage implementations (CLI-parity with the reference's batch_scripts).

Implemented in the depth-only labeling path (the minimum end-to-end slice,
SURVEY.md §7): DepthStage (stage 1), CropStage (stage 3), BoxStage (the
geometric half of stage 7 driven directly by scene depth), ExportStage
(stage 8). The generative stages (enhance / completion / elevation /
reconstruction / mesh layout) plug into the same runner via the model
registry as their backends land.
"""

from labelany3d_tpu.pipeline.stages.depth import DepthStage
from labelany3d_tpu.pipeline.stages.boxes import BoxStage
from labelany3d_tpu.pipeline.stages.crops import CropStage
from labelany3d_tpu.pipeline.stages.export import ExportStage

__all__ = ["DepthStage", "BoxStage", "CropStage", "ExportStage"]
