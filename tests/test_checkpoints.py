"""Orbax parameter checkpointing tests."""

import numpy as np
import jax
import jax.numpy as jnp

from labelany3d_tpu.models.checkpoints import load_params, save_params
from labelany3d_tpu.models.vit import ViT, ViTConfig


def test_save_load_roundtrip(tmp_path):
    cfg = ViTConfig.tiny_test()
    model = ViT(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))["params"]
    save_params(str(tmp_path), "vit_test", params)
    restored = load_params(str(tmp_path), "vit_test", like=params)
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(restored)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_missing_returns_none(tmp_path):
    assert load_params(str(tmp_path), "nope") is None
