"""LabelAny3D-TPU: a TPU-native auto-labeling framework for 3D bounding boxes.

A ground-up JAX/XLA/Pallas re-design of the LabelAny3D auto-labeling pipeline
(reference: UVA-Computer-Vision-Lab/LabelAny3D). Produces Omni3D-format 3D
bounding-box pseudo-annotations ("COCO3D") for 2D-annotated image datasets.

Design stance (vs the reference's 8-process CUDA/torch file relay):
  * geometry is batched jnp, vmapped over padded per-image instance slots,
    executed under jit on a `jax.sharding.Mesh`;
  * model inference (depth / matching backbones) is Flax on the same mesh;
  * hot reductions (oriented-box yaw search, reciprocal NN matching) are
    Pallas TPU kernels;
  * the host-side orchestrator handles variable-length I/O, the on-disk
    scene-directory contract, resume, and Omni3D JSON export.

Subpackages
-----------
geometry   Pure-jnp batched geometric core (back-projection, depth alignment,
           crop bookkeeping, box fitting, PnP, Procrustes).
ops        Pallas TPU kernels + XLA-friendly primitives (yaw search,
           reciprocal NN, Morton/Hilbert codes, attention helpers).
models     Flax inference models (DINOv2-style ViT backbones, MoGe-style
           point-map head, DepthPro-style metric depth) and the lazy
           model registry with fakeable backends.
parallel   Mesh construction, sharding rules, pjit pipeline steps.
pipeline   Stage orchestration, scene-directory contract, CLI entry points.
data       COCONUT/COCO loaders, RLE codec, category tables.
export     Omni3D JSON aggregation, Hungarian matching.
utils      Config, profiling, logging.
"""

__version__ = "0.1.0"
