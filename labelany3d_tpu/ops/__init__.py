"""TPU-native compute primitives replacing the reference's CUDA extensions.

Mapping to the reference's native components (SURVEY.md §2B):

| reference CUDA/C++           | here                                   |
|------------------------------|----------------------------------------|
| vox2seq (z-order/hilbert)    | ops.morton (int bit-ops, vmapped)      |
| mast3r fast_nn CUDA loop     | ops.reciprocal_nn (matmul + argmax)    |
| simple-knn                   | ops.knn (tiled pairwise + top-k)       |
| curope (fused 2D RoPE)       | ops.rope2d (fuses under XLA)           |
| ms_deform_attn               | ops.sampling.deformable_sample         |
| NeuS grid_sample             | ops.sampling.grid_sample               |
| flash-attn / serialized attn | ops.attention (fused SDPA + windows)   |
| (box fit inner loop)         | ops.boxfit_pallas (Pallas VMEM kernel) |
"""

from labelany3d_tpu.ops.morton import (
    morton_encode_3d,
    morton_decode_3d,
    hilbert_encode_3d,
    hilbert_decode_3d,
)
from labelany3d_tpu.ops.reciprocal_nn import reciprocal_nn_match
from labelany3d_tpu.ops.knn import knn_distances, mean_knn_distance
from labelany3d_tpu.ops.rope2d import rope_2d_freqs, apply_rope_2d
from labelany3d_tpu.ops.sampling import grid_sample, deformable_sample
from labelany3d_tpu.ops.attention import (
    windowed_attention_3d,
    serialized_attention,
)

__all__ = [
    "morton_encode_3d", "morton_decode_3d", "hilbert_encode_3d",
    "hilbert_decode_3d", "reciprocal_nn_match", "knn_distances",
    "mean_knn_distance", "rope_2d_freqs", "apply_rope_2d", "grid_sample",
    "deformable_sample", "windowed_attention_3d", "serialized_attention",
]
