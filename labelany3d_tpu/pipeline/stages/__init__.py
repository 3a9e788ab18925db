"""Stage implementations (CLI-parity with the reference's batch_scripts).

Full 8-stage path: DepthStage (1) -> EnhanceStage (2) -> CropStage (3) ->
CompletionStage (4) -> ElevationStage (5) -> ReconstructionStage (6) ->
LayoutStage (7) -> ExportStage (8). BoxStage is the depth-only fast path
(the geometric half of stage 7 driven directly by scene depth).

Generative backends (super-resolution, amodal completion, elevation,
image->3D, two-view matching) are pluggable via the model registry; each
stage ships an honest non-generative default so the whole pipeline runs
end to end without pretrained weights.
"""

from labelany3d_tpu.pipeline.stages.depth import DepthStage
from labelany3d_tpu.pipeline.stages.boxes import BoxStage
from labelany3d_tpu.pipeline.stages.crops import CropStage
from labelany3d_tpu.pipeline.stages.export import ExportStage
from labelany3d_tpu.pipeline.stages.generative import (
    EnhanceStage,
    CompletionStage,
    ElevationStage,
    ReconstructionStage,
    BicubicEnhance,
    PassthroughCompletion,
    ZeroElevation,
    SilhouetteExtrude,
)
from labelany3d_tpu.pipeline.stages.layout import LayoutStage

__all__ = [
    "DepthStage", "BoxStage", "CropStage", "ExportStage", "EnhanceStage",
    "CompletionStage", "ElevationStage", "ReconstructionStage",
    "LayoutStage", "BicubicEnhance", "PassthroughCompletion",
    "ZeroElevation", "SilhouetteExtrude",
]
