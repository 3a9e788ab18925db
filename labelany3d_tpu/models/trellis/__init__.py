"""TRELLIS-equivalent image->3D generative stack (Flax, TPU-native).

Behavioral parity target: `external/TRELLIS/trellis/` in the reference tree
(`TrellisImageTo3DPipeline.run`, `trellis_image_to_3d.py:256-283`):

  image -> DINOv2 conditioning -> SparseStructureFlowModel (dense DiT flow
  over a 16^3 latent) -> 64^3 occupancy coords -> SLatFlowModel (sparse DiT
  over active voxels) -> decoders (3D Gaussians / mesh) -> GLB.

TPU-native re-design:
  * dense 3D DiT tokens = 16^3 latent patches, fused SDPA attention;
  * sparse DiT = fixed voxel-slot arrays + serialized/windowed attention
    (`ops.attention`) with Morton/Hilbert orders (`ops.morton`) instead of
    varlen flash-attn + CUDA vox2seq;
  * flow-matching Euler sampler with CFG, fully jittable (lax.scan);
  * decoders: per-voxel Gaussians (rendered by `ops.splat`) and per-voxel
    SDF -> `ops.marching_cubes` (FlexiCubes-extraction equivalent);
  * GLB bake via vertex-color transfer from the Gaussians.
"""

from labelany3d_tpu.models.trellis.dit import DiTConfig, DenseDiT3D, SparseDiT
from labelany3d_tpu.models.trellis.samplers import flow_euler_sample, FlowSamplerConfig
from labelany3d_tpu.models.trellis.sparse_structure import (
    SparseStructureConfig,
    SparseStructureFlowModel,
    decode_occupancy,
)
from labelany3d_tpu.models.trellis.slat import SLatConfig, SLatFlowModel
from labelany3d_tpu.models.trellis.decoders import (
    GaussianDecoderConfig,
    SLatGaussianDecoder,
    MeshDecoderConfig,
    SLatMeshDecoder,
)
from labelany3d_tpu.models.trellis.pipeline import (
    TrellisPipeline,
    TrellisPipelineConfig,
)

__all__ = [
    "DiTConfig", "DenseDiT3D", "SparseDiT", "flow_euler_sample",
    "FlowSamplerConfig", "SparseStructureConfig", "SparseStructureFlowModel",
    "decode_occupancy", "SLatConfig", "SLatFlowModel",
    "GaussianDecoderConfig", "SLatGaussianDecoder", "MeshDecoderConfig",
    "SLatMeshDecoder", "TrellisPipeline", "TrellisPipelineConfig",
]
