"""SPMD parallelism: device meshes, sharding rules, pjit steps.

The reference's only parallelism is SLURM-array index sharding with no
inter-process communication (SURVEY.md §2D). The TPU-native design replaces
it with a `jax.sharding.Mesh` ('data', 'model'):

  * inference/labeling: image batch sharded over 'data' (pure DP — the
    pipeline is embarrassingly parallel over images, so DP over ICI is the
    roofline-optimal layout; collectives only appear in reductions);
  * model params optionally tensor-sharded over 'model' (attention heads /
    MLP hidden) for backbones that exceed one chip's HBM;
  * fine-tuning (`parallel.train`): dp x tp training step with XLA
    collectives inserted by the partitioner (psum of grads over 'data',
    all-reduce of activations over 'model').

Cross-host scaling runs the same SPMD program over DCN with the batch axis
spanning hosts (the host-side stage runner feeds per-host shards).
"""

from labelany3d_tpu.parallel.mesh import make_mesh, data_sharding, replicated
from labelany3d_tpu.parallel.sharding import vit_param_spec, shard_params, param_pspecs
from labelany3d_tpu.parallel.train import (
    TrainState,
    make_train_step,
    init_train_state,
    depth_loss,
)

__all__ = [
    "make_mesh", "data_sharding", "replicated", "vit_param_spec",
    "shard_params", "param_pspecs", "TrainState", "make_train_step",
    "init_train_state", "depth_loss",
]
