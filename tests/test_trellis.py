"""TRELLIS-equivalent generative stack tests (tiny configs)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from labelany3d_tpu.models.trellis import (
    DiTConfig,
    FlowSamplerConfig,
    SLatConfig,
    SLatFlowModel,
    SparseStructureConfig,
    SparseStructureFlowModel,
    SSDecoderConfig,
    StructureDecoder,
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
    def model(x, t, tok):
        return jnp.full_like(x, float(tok[0, 0, 0]))

    cond = jnp.full((1, 1, 1), 2.0)
    uncond = jnp.zeros((1, 1, 1))
    v = cfg_velocity(model, cond, uncond, strength=1.0)(jnp.zeros((1, 2, 2)), jnp.zeros(1))
    # (1+1)*2 - 1*0 = 4
    np.testing.assert_allclose(np.asarray(v), 4.0)


def test_ss_flow_shapes_and_zero_init():
    cfg = SparseStructureConfig.tiny_test()
    model = SparseStructureFlowModel(cfg)
    r3 = cfg.latent_res**3
    x = jax.random.normal(jax.random.PRNGKey(0), (2, r3, cfg.latent_channels))
    cond = jax.random.normal(jax.random.PRNGKey(1), (2, 5, cfg.dit.cond_dim))
    t = jnp.array([500.0, 100.0])
    params = model.init(jax.random.PRNGKey(2), x, t, cond)
    out = model.apply(params, x, t, cond)
    assert out.shape == (2, r3, cfg.latent_channels)
    # adaLN-zero + zero-init output head -> the initial velocity is 0.
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_ss_flow_patchify_roundtrip():
    from labelany3d_tpu.models.trellis.sparse_structure import (
        patchify_tokens,
        unpatchify_tokens,
    )

    r, p, c = 8, 2, 4
    latent = jax.random.normal(jax.random.PRNGKey(0), (2, r**3, c))
    tokens = patchify_tokens(latent, r, p)
    assert tokens.shape == (2, (r // p) ** 3, c * p**3)
    back = unpatchify_tokens(tokens, r, p, c)
    np.testing.assert_allclose(np.asarray(back), np.asarray(latent), atol=1e-6)


def test_sparse_structure_and_occupancy():
    cfg = SSDecoderConfig.tiny_test()
    r = 4
    dec = StructureDecoder(cfg, latent_res=r)
    latent = jax.random.normal(jax.random.PRNGKey(0), (1, r**3, cfg.latent_channels))
    params = dec.init(jax.random.PRNGKey(1), latent)
    logits = dec.apply(params, latent)
    g = r * 2 ** (len(cfg.channels) - 1)
    assert logits.shape == (1, g, g, g)

    coords, valid = decode_occupancy(logits, max_voxels=64, threshold=-1e9)
    assert coords.shape == (1, 64, 3) and bool(valid.all())
    assert int(coords.max()) < g
    # top-k actually picks the highest-logit cells
    flat = np.asarray(logits).reshape(-1)
    top_ref = np.sort(flat)[-64:]
    picked = np.asarray(logits)[0][tuple(np.asarray(coords[0]).T)]
    np.testing.assert_allclose(np.sort(picked), top_ref, atol=1e-6)


@pytest.mark.heavy
def test_slat_flow_model_masks_invalid():
    cfg = SLatConfig.tiny_test()
    model = SLatFlowModel(cfg)
    n = 32
    feats = jax.random.normal(jax.random.PRNGKey(0), (1, n, cfg.latent_channels))
    coords = jax.random.randint(jax.random.PRNGKey(1), (1, n, 3), 0, cfg.grid_size)
    valid = jnp.arange(n)[None, :] < 20
    t = jnp.array([300.0])
    cond = jax.random.normal(jax.random.PRNGKey(2), (1, 4, cfg.dit.cond_dim))
    params = model.init(jax.random.PRNGKey(3), feats, coords, valid, t, cond)
    out = model.apply(params, feats, coords, valid, t, cond)
    assert out.shape == feats.shape
    assert (np.asarray(out)[0, 20:] == 0).all()


@pytest.mark.heavy
def test_slat_flow_batched_matches_per_element():
    """Batched SLat UNet with DIFFERENT per-element slot layouts must equal
    running each element alone (guards the vmapped coords/valid path)."""
    cfg = SLatConfig.tiny_test()
    model = SLatFlowModel(cfg)
    n = 32
    k = jax.random.split(jax.random.PRNGKey(7), 6)
    feats = jax.random.normal(k[0], (2, n, cfg.latent_channels))
    coords = jax.random.randint(k[1], (2, n, 3), 0, cfg.grid_size)
    valid = jnp.stack([jnp.arange(n) < 20, jnp.arange(n) < 27])
    t = jnp.array([300.0, 700.0])
    cond = jax.random.normal(k[2], (2, 4, cfg.dit.cond_dim))
    params = model.init(k[3], feats, coords, valid, t, cond)
    batched = np.asarray(model.apply(params, feats, coords, valid, t, cond))
    for b in range(2):
        single = np.asarray(model.apply(
            params, feats[b:b+1], coords[b:b+1], valid[b:b+1], t[b:b+1], cond[b:b+1]))
        np.testing.assert_allclose(batched[b], single[0], atol=2e-5, rtol=1e-4)


@pytest.mark.heavy
def test_slat_torso_compaction_exact():
    """Slicing the torso to a bucket >= the true parent count must be
    EXACTLY the unsliced model (the pipeline picks the bucket from the
    actual coords, so compaction is a pure layout change, not an approx)."""
    from labelany3d_tpu.ops.sparse_conv import sparse_pool_pair

    cfg = SLatConfig.tiny_test()
    model = SLatFlowModel(cfg)
    n = 64
    rng = np.random.default_rng(3)
    # Surface-like set: a thin shell -> few parent cells, front-compacted
    # validity like decode_occupancy's output.
    coords = np.stack(np.meshgrid(*([np.arange(cfg.grid_size)] * 3),
                                  indexing="ij"), -1).reshape(-1, 3)
    r = np.linalg.norm(coords - cfg.grid_size / 2, axis=1)
    shell = coords[np.abs(r - cfg.grid_size / 3) < 1.0][:n]
    n_real = len(shell)
    coords = np.zeros((1, n, 3), np.int32)
    coords[0, :n_real] = shell
    valid = (np.arange(n) < n_real)[None]
    feats = rng.standard_normal((1, n, cfg.latent_channels)).astype(np.float32)
    t = jnp.array([300.0])
    cond = jnp.asarray(rng.standard_normal((1, 4, cfg.dit.cond_dim)), jnp.float32)

    n_parent = len(np.unique((shell // 2) @ np.array([10000, 100, 1])))
    bucket = int(np.ceil((n_parent + 1) / 8) * 8)
    assert bucket < n  # compaction actually engages

    params = model.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                        jnp.asarray(coords), jnp.asarray(valid), t, cond)
    full = np.asarray(model.apply(params, jnp.asarray(feats), jnp.asarray(coords),
                                  jnp.asarray(valid), t, cond))
    sliced = np.asarray(model.apply(params, jnp.asarray(feats), jnp.asarray(coords),
                                    jnp.asarray(valid), t, cond,
                                    torso_slots=bucket))
    np.testing.assert_allclose(sliced, full, atol=1e-5, rtol=1e-5)


def test_slat_bucket_selection():
    from labelany3d_tpu.models.trellis.pipeline import TrellisPipeline

    # Prefix-valid surface set -> tight buckets.
    coords = np.zeros((1, 8192, 3), np.int32)
    g = np.stack(np.meshgrid(np.arange(40), np.arange(40), indexing="ij"), -1)
    plane = np.concatenate([g.reshape(-1, 2), np.full((1600, 1), 7)], 1)
    coords[0, :1600] = plane
    valid = (np.arange(8192) < 1600)[None]
    n_fine, torso = TrellisPipeline._slat_buckets(coords, valid, 8192)
    assert n_fine == 2048
    # 40x40 plane at z=7 -> 20*20 parent cells = 400 -> bucket 512.
    assert torso == 512
    # Non-prefix validity falls back to the full budget.
    v2 = valid.copy()
    v2[0, 0] = False
    v2[0, 4000] = True
    assert TrellisPipeline._slat_buckets(coords, v2, 8192) == (8192, 8192)
    # Empty set keeps the full budget too.
    assert TrellisPipeline._slat_buckets(
        coords, np.zeros_like(valid), 8192) == (8192, 8192)


def test_sparse_pool_pair_roundtrip():
    from labelany3d_tpu.ops.sparse_conv import sparse_pool_pair, sparse_unpool

    rng = np.random.default_rng(0)
    n, g = 24, 8
    coords = jnp.asarray(rng.integers(0, g, (n, 3)), jnp.int32)
    feats = jnp.asarray(rng.standard_normal((n, 5)), jnp.float32)
    valid = jnp.asarray(rng.random(n) < 0.8)
    pf, pc, pv, c2p = sparse_pool_pair(feats, coords, valid, 2, g)
    # Each valid child's parent cell coords match coords//2.
    pcn, c2pn = np.asarray(pc), np.asarray(c2p)
    for i in range(n):
        if bool(valid[i]):
            np.testing.assert_array_equal(pcn[c2pn[i]], np.asarray(coords[i]) // 2)
    # Mean pooling: average of children in the same cell.
    up = sparse_unpool(pf, c2p)
    for i in range(n):
        if bool(valid[i]):
            cell = np.asarray(coords) // 2
            mask = (cell == cell[i]).all(1) & np.asarray(valid)
            np.testing.assert_allclose(
                np.asarray(up[i]), np.asarray(feats)[mask].mean(0), atol=1e-6)


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
