"""TRELLIS-equivalent generative stack tests (tiny configs)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from labelany3d_tpu.models.trellis import (
    DiTConfig,
    DenseDiT3D,
    FlowSamplerConfig,
    SLatConfig,
    SLatFlowModel,
    SparseStructureConfig,
    SparseStructureFlowModel,
    TrellisPipeline,
    TrellisPipelineConfig,
    decode_occupancy,
    flow_euler_sample,
)
from labelany3d_tpu.models.trellis.samplers import cfg_velocity


def test_flow_euler_integrates_linear_field():
    # v(x, t) = x1 - x0 with x0 = target: for rectified flow from noise x1,
    # constant velocity v = x1 - x0 reaches x0 exactly at t=0.
    target = jnp.full((1, 4, 2), 3.0)
    noise = jnp.zeros((1, 4, 2))
    vel = lambda x, t: noise - target  # v = x1 - x0
    out = flow_euler_sample(vel, noise, FlowSamplerConfig(steps=8, rescale_t=1.0))
    np.testing.assert_allclose(np.asarray(out), 3.0, atol=1e-5)


def test_cfg_velocity_mixing():
    calls = []

    def model(x, t, tok):
        calls.append(tok)
        return jnp.full_like(x, float(tok[0, 0, 0]))

    cond = jnp.full((1, 1, 1), 2.0)
    uncond = jnp.zeros((1, 1, 1))
    v = cfg_velocity(model, cond, uncond, strength=1.0)(jnp.zeros((1, 2, 2)), jnp.zeros(1))
    # (1+1)*2 - 1*0 = 4
    np.testing.assert_allclose(np.asarray(v), 4.0)


def test_dense_dit_shapes_and_zero_init():
    cfg = DiTConfig.tiny_test()
    model = DenseDiT3D(cfg, in_channels=4, out_channels=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 4))
    cond = jax.random.normal(jax.random.PRNGKey(1), (2, 5, cfg.cond_dim))
    t = jnp.array([0.5, 0.1])
    params = model.init(jax.random.PRNGKey(2), x, t, cond)
    out = model.apply(params, x, t, cond)
    assert out.shape == (2, 64, 4)
    # adaLN-zero + zero-init output head -> the initial velocity is 0.
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_sparse_structure_and_occupancy():
    cfg = SparseStructureConfig.tiny_test()
    from labelany3d_tpu.models.trellis.sparse_structure import StructureDecoder

    dec = StructureDecoder(cfg)
    latent = jax.random.normal(jax.random.PRNGKey(0), (1, cfg.latent_res**3, cfg.latent_channels))
    params = dec.init(jax.random.PRNGKey(1), latent)
    logits = dec.apply(params, latent)
    assert logits.shape == (1, cfg.grid_size, cfg.grid_size, cfg.grid_size)

    coords, valid = decode_occupancy(logits, max_voxels=64, threshold=-1e9)
    assert coords.shape == (1, 64, 3) and bool(valid.all())
    assert int(coords.max()) < cfg.grid_size
    # top-k actually picks the highest-logit cells
    flat = np.asarray(logits).reshape(-1)
    top_ref = np.sort(flat)[-64:]
    picked = np.asarray(logits)[0][tuple(np.asarray(coords[0]).T)]
    np.testing.assert_allclose(np.sort(picked), top_ref, atol=1e-6)


def test_slat_flow_model_masks_invalid():
    cfg = SLatConfig.tiny_test()
    model = SLatFlowModel(cfg)
    n = 32
    feats = jax.random.normal(jax.random.PRNGKey(0), (1, n, cfg.latent_channels))
    coords = jax.random.randint(jax.random.PRNGKey(1), (1, n, 3), 0, cfg.grid_size)
    valid = jnp.arange(n)[None, :] < 20
    t = jnp.array([0.3])
    cond = jax.random.normal(jax.random.PRNGKey(2), (1, 4, cfg.dit.cond_dim))
    params = model.init(jax.random.PRNGKey(3), feats, coords, valid, t, cond)
    out = model.apply(params, feats, coords, valid, t, cond)
    assert out.shape == feats.shape
    assert (np.asarray(out)[0, 20:] == 0).all()


def test_slat_flow_batched_matches_per_element():
    """Batched SparseDiT with DIFFERENT per-element slot layouts must equal
    running each element alone (guards the vmapped coords/valid path)."""
    cfg = SLatConfig.tiny_test()
    model = SLatFlowModel(cfg)
    n = 32
    k = jax.random.split(jax.random.PRNGKey(7), 6)
    feats = jax.random.normal(k[0], (2, n, cfg.latent_channels))
    coords = jax.random.randint(k[1], (2, n, 3), 0, cfg.grid_size)
    valid = jnp.stack([jnp.arange(n) < 20, jnp.arange(n) < 27])
    t = jnp.array([0.3, 0.7])
    cond = jax.random.normal(k[2], (2, 4, cfg.dit.cond_dim))
    params = model.init(k[3], feats, coords, valid, t, cond)
    batched = np.asarray(model.apply(params, feats, coords, valid, t, cond))
    for b in range(2):
        single = np.asarray(model.apply(
            params, feats[b:b+1], coords[b:b+1], valid[b:b+1], t[b:b+1], cond[b:b+1]))
        np.testing.assert_allclose(batched[b], single[0], atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_trellis_pipeline_end_to_end():
    pipe = TrellisPipeline(TrellisPipelineConfig.tiny_test())
    pipe.init_params()
    rng = np.random.default_rng(0)
    rgba = np.zeros((64, 64, 4), np.uint8)
    rgba[16:48, 20:44, :3] = rng.integers(0, 255, (32, 24, 3))
    rgba[16:48, 20:44, 3] = 255
    out = pipe.run(rgba, seed=1)
    coords = np.asarray(out["coords"])
    assert coords.shape[1] == pipe.cfg.max_voxels
    mesh = out["mesh"]
    # Random weights: the SDF may or may not cross zero, but the pipeline
    # must produce a well-formed (possibly empty) mesh and gaussian set.
    assert mesh.vertices.shape[1] == 3
    gs = out["gaussians"]
    assert np.asarray(gs.means).shape[1] == 3
    assert np.isfinite(np.asarray(gs.means)).all()
    # Determinism: same seed -> same coords.
    out2 = pipe.run(rgba, seed=1)
    np.testing.assert_array_equal(coords, np.asarray(out2["coords"]))
