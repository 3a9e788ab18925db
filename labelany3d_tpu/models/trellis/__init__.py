"""TRELLIS-equivalent image->3D generative stack (Flax, TPU-native).

Checkpoint-faithful parity target: `external/TRELLIS/trellis/` in the
reference tree (`TrellisImageTo3DPipeline.run`, `trellis_image_to_3d.py:
256-283`):

  image -> DINOv2 conditioning -> SparseStructureFlowModel (DiT flow over
  a 16^3 latent) -> 64^3 occupancy coords -> SLatFlowModel (sparse UNet +
  DiT over active voxels) -> decoders (3D Gaussians / FlexiCubes mesh) ->
  GLB. Released `TRELLIS-image-large` weights convert via
  `models/convert_trellis.py` (every module maps one-to-one).

TPU-native re-design:
  * sparse voxels ride fixed slot arrays + valid masks (static shapes);
    swin/serialized attention from `ops.attention` replaces varlen
    flash-attn + CUDA vox2seq; pooling is a segment reduction
    (`ops.sparse_conv.sparse_pool_pair`), convs the gather/matmul
    submanifold kernel;
  * dense DiT attention runs the Pallas flash kernel;
  * flow-matching Euler sampler with CFG, fully jittable (lax.scan);
  * decoders: per-voxel Gaussians (rendered by `ops.splat`) and
    FlexiCubes-style features -> host marching-tetrahedra extraction;
  * GLB bake via UV atlas + multi-view splat render (`trellis/bake.py`).
"""

from labelany3d_tpu.models.trellis.dit import (
    DiTBlock,
    DiTConfig,
    TimestepEmbedder,
    TransformerBlock,
    ape_3d,
)
from labelany3d_tpu.models.trellis.samplers import flow_euler_sample, FlowSamplerConfig
from labelany3d_tpu.models.trellis.sparse_structure import (
    SparseStructureConfig,
    SparseStructureFlowModel,
    SSDecoderConfig,
    StructureDecoder,
    decode_occupancy,
)
from labelany3d_tpu.models.trellis.slat import SLatConfig, SLatFlowModel
from labelany3d_tpu.models.trellis.decoders import (
    GaussianRepConfig,
    SLatDecoderConfig,
    SLatGaussianDecoder,
    SLatMeshDecoder,
    flexicubes_to_mesh,
)
from labelany3d_tpu.models.trellis.pipeline import (
    TrellisPipeline,
    TrellisPipelineConfig,
)

__all__ = [
    "DiTBlock", "DiTConfig", "TimestepEmbedder", "TransformerBlock", "ape_3d",
    "flow_euler_sample", "FlowSamplerConfig",
    "SparseStructureConfig", "SparseStructureFlowModel", "SSDecoderConfig",
    "StructureDecoder", "decode_occupancy",
    "SLatConfig", "SLatFlowModel",
    "GaussianRepConfig", "SLatDecoderConfig", "SLatGaussianDecoder",
    "SLatMeshDecoder", "flexicubes_to_mesh",
    "TrellisPipeline", "TrellisPipelineConfig",
]
