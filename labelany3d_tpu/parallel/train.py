"""Sharded fine-tuning step for the depth model (dp x tp over a Mesh).

The reference never trains (inference-only pipeline), but COCO3D's stated
purpose is to fine-tune 3D detectors on the pseudo-labels, and pseudo-label
quality improves by adapting the depth backbone. This module provides the
framework's training path: a scale-invariant log-depth objective (the
standard monocular-depth fine-tuning loss) with an optax optimizer, jit'ed
over a ('data', 'model') mesh:

  * batch sharded over 'data' — gradient psum inserted by the partitioner;
  * ViT params tensor-sharded over 'model' per `sharding.vit_param_spec`;
  * optimizer state inherits the param shardings (optax init on committed
    sharded params propagates their layout; the jit partitioner keeps it).

This is also the program `__graft_entry__.dryrun_multichip` compiles to
validate the multi-chip path.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from labelany3d_tpu.models.moge import MoGeModel
from labelany3d_tpu.parallel.mesh import shard_batch
from labelany3d_tpu.parallel.sharding import shard_params


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def depth_loss(pred_depth: jnp.ndarray, target_depth: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Scale-invariant log-depth loss (Eigen et al.), masked.

    L = mean(d^2) - lambda * mean(d)^2, d = log(pred) - log(target),
    lambda = 0.5, over valid pixels.
    """
    d = jnp.log(jnp.maximum(pred_depth, 1e-6)) - jnp.log(jnp.maximum(target_depth, 1e-6))
    w = valid.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(w), 1.0)
    m1 = jnp.sum(d * w) / n
    m2 = jnp.sum(d * d * w) / n
    return m2 - 0.5 * m1 * m1


def init_train_state(
    model: MoGeModel,
    rng,
    sample_images: jnp.ndarray,
    learning_rate: float = 1e-4,
    mesh: Mesh | None = None,
) -> tuple[TrainState, optax.GradientTransformation]:
    """Init params (+ optimizer) — tensor-sharded over `mesh` when given.

    Sharding flows by commitment: params are device_put with the TP layout,
    so `tx.init`'s zeros_like moments inherit it, and the jitted step's
    partitioner propagates everything else.
    """
    params = model.init(rng, sample_images)["params"]
    if mesh is not None:
        params = shard_params(mesh, params)
    tx = optax.adamw(learning_rate)
    opt_state = tx.init(params)
    return TrainState(params=params, opt_state=opt_state, step=jnp.zeros((), jnp.int32)), tx


def make_train_step(model: MoGeModel, tx: optax.GradientTransformation):
    """Jitted train step: (state, images, target_depth, valid) -> (state, loss).

    Mesh-agnostic: run it on sharded arrays (see `init_train_state` and
    `prepare_batch`) and the SPMD partitioner inserts the collectives —
    grad psum over 'data', activation all-reduces over 'model'.
    """

    def loss_fn(params, images, target_depth, valid):
        out = model.apply({"params": params}, images)
        pred = out["points"][..., 2]  # model z-channel as (affine) depth
        return depth_loss(pred, target_depth, valid)

    @jax.jit
    def step(state: TrainState, images, target_depth, valid):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, images, target_depth, valid)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return step


def prepare_batch(mesh: Mesh, images, target_depth, valid):
    """Device-put a host batch with axis-0 'data' sharding."""
    return shard_batch(mesh, (images, target_depth, valid))
