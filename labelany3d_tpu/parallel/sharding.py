"""Tensor-parallel sharding rules for the Flax model stack.

Megatron-style layout for the ViT family (`labelany3d_tpu.models.vit`):
  * attention `qkv` kernel: shard the fused output dim (heads) -> 'model';
  * attention `proj` kernel: shard the input dim (heads) -> 'model'
    (row-parallel; XLA inserts the all-reduce after the contraction);
  * MLP `fc1`/`w12` kernel: shard hidden (output) dim;
  * MLP `fc2`/`w3` kernel: shard hidden (input) dim;
  * everything else (norms, biases, embeddings, conv heads): replicated.

These rules drive both inference pjit (big backbones that exceed one chip's
HBM) and the fine-tuning step in `parallel.train`.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path-suffix match, kernel spec) — applied to 2D 'kernel' params only.
_COL_PARALLEL = ("qkv", "fc1", "w12")   # shard output dim
_ROW_PARALLEL = ("proj", "fc2", "w3")   # shard input dim


def vit_param_spec(path: tuple[str, ...], value) -> P:
    """PartitionSpec for one parameter, by its flax path."""
    names = [getattr(p, "key", str(p)) for p in path]
    leaf = names[-1] if names else ""
    parent = names[-2] if len(names) >= 2 else ""
    if leaf == "kernel" and getattr(value, "ndim", 0) == 2:
        if parent in _COL_PARALLEL:
            return P(None, "model")
        if parent in _ROW_PARALLEL:
            return P("model", None)
    if leaf == "bias" and parent in _COL_PARALLEL:
        return P("model")
    return P()


def param_pspecs(params) -> dict:
    """Pytree of PartitionSpecs matching `params`' structure."""
    return jax.tree_util.tree_map_with_path(vit_param_spec, params)


def shard_params(mesh: Mesh, params):
    """Device-put params with the TP layout on `mesh`."""
    specs = param_pspecs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )
