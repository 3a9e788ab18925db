"""TRELLIS checkpoint-converter tests: torch-replica numerical parity at
tiny shapes + production-scale (TRELLIS-image-large) tree/forward checks.

The torch oracles in `tests/trellis_replica.py` register parameters under
the released checkpoints' names, so `replica.state_dict()` doubles as a
synthetic torch-shaped state dict and parity proves the math end to end.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from labelany3d_tpu.models import convert_trellis as ct
from labelany3d_tpu.models.trellis import (
    DiTBlock,
    DiTConfig,
    SLatConfig,
    SLatDecoderConfig,
    SLatFlowModel,
    SLatGaussianDecoder,
    SLatMeshDecoder,
    SparseStructureConfig,
    SparseStructureFlowModel,
    SSDecoderConfig,
    StructureDecoder,
)
from labelany3d_tpu.models.trellis.decoders import flexicubes_channels

import trellis_replica as rep

torch.manual_seed(0)


def _f32(cfg):
    return dataclasses.replace(cfg, dtype=jnp.float32)


def _dit_f32(dit, **kw):
    return dataclasses.replace(dit, dtype=jnp.float32, **kw)


# ---------------------------------------------------------------------------
# Block-level parity
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("qk_rms", [False, True])
def test_dit_block_parity(qk_rms):
    C, H, CTX, N, M = 32, 4, 24, 20, 5
    blk = rep.ModulatedTransformerCrossBlock(
        C, CTX, H, qk_rms_norm=qk_rms, qk_rms_norm_cross=qk_rms)
    x = torch.randn(1, N, C)
    mod = torch.randn(1, C)
    ctx_t = torch.randn(1, M, CTX)
    with torch.no_grad():
        ref = blk(x, mod, ctx_t).numpy()

    cfg = DiTConfig(width=C, depth=1, num_heads=H, cond_dim=CTX,
                    qk_rms_norm=qk_rms, qk_rms_norm_cross=qk_rms,
                    dtype=jnp.float32)
    params = ct._dit_block(rep.state_np(blk), "", share_mod=False)
    out = DiTBlock(cfg).apply(
        {"params": params}, jnp.asarray(x.numpy()),
        t_emb=jnp.asarray(mod.numpy()), cond_tokens=jnp.asarray(ctx_t.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-5, rtol=1e-4)


def test_timestep_embedder_parity():
    W = 48
    te = rep.TimestepEmbedder(W)
    t = torch.tensor([0.0, 123.4, 1000.0])
    with torch.no_grad():
        ref = te(t).numpy()
    from labelany3d_tpu.models.trellis import TimestepEmbedder

    params = ct._t_embedder(rep.state_np(te), pre="")
    out = TimestepEmbedder(W).apply({"params": params}, jnp.asarray(t.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)


def test_ape_parity():
    from labelany3d_tpu.models.trellis import ape_3d

    coords = torch.randint(0, 64, (17, 3))
    ref = rep.ape_torch(coords, 48).numpy()
    out = ape_3d(jnp.asarray(coords.numpy()), 48)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


# ---------------------------------------------------------------------------
# Sparse-structure flow + decoder parity
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("patch,share_mod", [(1, False), (2, True)])
def test_ss_flow_parity(patch, share_mod):
    R, CIN, W, CTX, BLOCKS, HEADS = 8, 4, 36, 24, 2, 2
    ref_m = rep.SparseStructureFlowModelRef(
        R, CIN, W, CTX, CIN, BLOCKS, HEADS, patch_size=patch,
        share_mod=share_mod, qk_rms_norm=True)
    x = torch.randn(1, CIN, R, R, R)
    t = torch.tensor([123.0])
    cond = torch.randn(1, 7, CTX)
    with torch.no_grad():
        ref = ref_m(x, t, cond).numpy()

    cfg = SparseStructureConfig(
        latent_res=R, latent_channels=CIN, out_channels=CIN, patch_size=patch,
        dit=DiTConfig(width=W, depth=BLOCKS, num_heads=HEADS, cond_dim=CTX,
                      qk_rms_norm=True, share_mod=share_mod, dtype=jnp.float32))
    params = ct.convert_trellis_ss_flow(rep.state_np(ref_m), cfg)
    latent = jnp.asarray(x.permute(0, 2, 3, 4, 1).reshape(1, R**3, CIN).numpy())
    out = SparseStructureFlowModel(cfg).apply(
        {"params": params}, latent, jnp.asarray(t.numpy()),
        jnp.asarray(cond.numpy()))
    ref_tok = ref.transpose(0, 2, 3, 4, 1).reshape(1, R**3, CIN)
    np.testing.assert_allclose(np.asarray(out), ref_tok, atol=5e-5, rtol=1e-4)
    # Tree exactness: converted == init tree.
    init = SparseStructureFlowModel(cfg).init(
        jax.random.PRNGKey(0), latent, jnp.asarray(t.numpy()),
        jnp.asarray(cond.numpy()))["params"]
    assert jax.tree.structure(init) == jax.tree.structure(params)
    for a, b in zip(jax.tree.leaves(init), jax.tree.leaves(params)):
        assert a.shape == b.shape


def test_ss_decoder_parity():
    cfg = SSDecoderConfig(latent_channels=4, out_channels=1, channels=(12, 8, 6),
                          num_res_blocks=2, num_res_blocks_middle=1,
                          dtype=jnp.float32)
    ref_m = rep.SparseStructureDecoderRef(1, 4, 2, [12, 8, 6], 1)
    R = 4
    x = torch.randn(1, 4, R, R, R)
    with torch.no_grad():
        ref = ref_m(x).numpy()[:, 0]

    params = ct.convert_trellis_ss_decoder(rep.state_np(ref_m), cfg)
    latent = jnp.asarray(x.permute(0, 2, 3, 4, 1).reshape(1, R**3, 4).numpy())
    out = StructureDecoder(cfg, latent_res=R).apply({"params": params}, latent)
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# SLat flow parity
# ---------------------------------------------------------------------------


def test_slat_flow_parity():
    G, CIN, W, CTX, BLOCKS, HEADS, C0 = 8, 4, 36, 24, 2, 2, 12
    ref_m = rep.SLatFlowModelRef(G, CIN, W, CTX, CIN, BLOCKS, HEADS, [C0],
                                 qk_rms_norm=True)
    rng = np.random.default_rng(3)
    n_active = 23
    flat = rng.choice(G**3, n_active, replace=False)
    coords_np = np.stack([flat // (G * G), (flat // G) % G, flat % G], -1)
    feats_np = rng.standard_normal((n_active, CIN)).astype(np.float32)
    t = torch.tensor([250.0])
    cond = torch.randn(1, 6, CTX)
    with torch.no_grad():
        ref = ref_m(torch.from_numpy(feats_np), torch.from_numpy(coords_np),
                    t, cond).numpy()

    cfg = SLatConfig(
        resolution=G, latent_channels=CIN, out_channels=CIN,
        io_block_channels=(C0,),
        dit=DiTConfig(width=W, depth=BLOCKS, num_heads=HEADS, cond_dim=CTX,
                      qk_rms_norm=True, dtype=jnp.float32))
    params = ct.convert_trellis_slat_flow(rep.state_np(ref_m), cfg)

    # Pad to a fixed slot budget with invalid slots interleaved at the end.
    n_slots = 32
    feats = np.zeros((1, n_slots, CIN), np.float32)
    coords = np.zeros((1, n_slots, 3), np.int32)
    valid = np.zeros((1, n_slots), bool)
    feats[0, :n_active] = feats_np
    coords[0, :n_active] = coords_np
    valid[0, :n_active] = True
    out = SLatFlowModel(cfg).apply(
        {"params": params}, jnp.asarray(feats), jnp.asarray(coords),
        jnp.asarray(valid), jnp.asarray(t.numpy()), jnp.asarray(cond.numpy()))
    np.testing.assert_allclose(np.asarray(out)[0, :n_active], ref,
                               atol=1e-4, rtol=1e-3)
    assert (np.asarray(out)[0, n_active:] == 0).all()


# ---------------------------------------------------------------------------
# SLat decoder parity
# ---------------------------------------------------------------------------


def _active_set(G, n, cin, seed=5):
    rng = np.random.default_rng(seed)
    flat = rng.choice(G**3, n, replace=False)
    coords = np.stack([flat // (G * G), (flat // G) % G, flat % G], -1)
    feats = rng.standard_normal((n, cin)).astype(np.float32)
    return feats, coords


def test_slat_gs_decoder_parity():
    # window_size == resolution -> one swin window == full attention.
    G, CIN, W, BLOCKS, HEADS, K = 4, 4, 24, 2, 2, 3
    out_ch = K * 14
    ref_m = rep.SLatGaussianDecoderRef(G, W, CIN, BLOCKS, HEADS, out_ch)
    feats_np, coords_np = _active_set(G, 11, CIN)
    with torch.no_grad():
        raw_ref = ref_m(torch.from_numpy(feats_np),
                        torch.from_numpy(coords_np)).numpy()

    from labelany3d_tpu.models.trellis import GaussianRepConfig

    # window 2G: even the odd-block half-window shift keeps all voxels in
    # one swin window, so the full-attention torch oracle is exact.
    cfg = SLatDecoderConfig(resolution=G, latent_channels=CIN, model_channels=W,
                            num_blocks=BLOCKS, num_heads=HEADS, window_size=2 * G,
                            dtype=jnp.float32)
    repc = GaussianRepConfig(num_gaussians=K)
    params = ct.convert_trellis_slat_gs(rep.state_np(ref_m), cfg)
    n_slots = 16
    feats = np.zeros((n_slots, CIN), np.float32)
    coords = np.zeros((n_slots, 3), np.int32)
    valid = np.zeros((n_slots,), bool)
    feats[:11], coords[:11], valid[:11] = feats_np, coords_np, True
    gs = SLatGaussianDecoder(cfg, rep=repc).apply(
        {"params": params}, jnp.asarray(feats), jnp.asarray(coords),
        jnp.asarray(valid))

    # Oracle activations (decoder_gs.py to_representation + gaussian_model).
    from labelany3d_tpu.models.trellis.decoders import hammersley_3d

    f_xyz = raw_ref[:, :K * 3].reshape(-1, K, 3)
    pert = np.arctanh(np.clip((hammersley_3d(K) * 2 - 1) / repc.voxel_size,
                              -0.999, 0.999))
    offset = np.tanh(f_xyz * repc.lr_xyz + pert[None]) / G * 0.5 * repc.voxel_size
    means_ref = ((coords_np.astype(np.float32) + 0.5) / G)[:, None] + offset
    np.testing.assert_allclose(
        np.asarray(gs.means).reshape(n_slots, K, 3)[:11], means_ref,
        atol=2e-5, rtol=1e-4)
    # opacity
    f_op = raw_ref[:, K * 13:K * 14]
    op_ref = 1 / (1 + np.exp(-(f_op + np.log(0.1 / 0.9))))
    np.testing.assert_allclose(
        np.asarray(gs.opacities).reshape(n_slots, K)[:11], op_ref,
        atol=2e-5, rtol=1e-4)


def test_slat_mesh_decoder_parity():
    G, CIN, W, BLOCKS, HEADS = 4, 4, 32, 1, 2
    out_ch = flexicubes_channels(True)
    ref_m = rep.SLatMeshDecoderRef(G, W, CIN, BLOCKS, HEADS, out_ch)
    feats_np, coords_np = _active_set(G, 7, CIN, seed=9)
    with torch.no_grad():
        ref_out, ref_coords = ref_m(torch.from_numpy(feats_np),
                                    torch.from_numpy(coords_np))
        ref_out, ref_coords = ref_out.numpy(), ref_coords.numpy()

    cfg = SLatDecoderConfig(resolution=G, latent_channels=CIN, model_channels=W,
                            num_blocks=BLOCKS, num_heads=HEADS, window_size=2 * G,
                            dtype=jnp.float32)
    params = ct.convert_trellis_slat_mesh(rep.state_np(ref_m), cfg)
    n_slots = 8
    feats = np.zeros((n_slots, CIN), np.float32)
    coords = np.zeros((n_slots, 3), np.int32)
    valid = np.zeros((n_slots,), bool)
    feats[:7], coords[:7], valid[:7] = feats_np, coords_np, True
    out, out_coords, out_valid = SLatMeshDecoder(cfg).apply(
        {"params": params}, jnp.asarray(feats), jnp.asarray(coords),
        jnp.asarray(valid))
    got = np.asarray(out)[np.asarray(out_valid)]
    np.testing.assert_allclose(got, ref_out, atol=2e-4, rtol=1e-3)
    np.testing.assert_array_equal(
        np.asarray(out_coords)[np.asarray(out_valid)], ref_coords)


# ---------------------------------------------------------------------------
# Production-scale (TRELLIS-image-large) tree + forward
# ---------------------------------------------------------------------------


def _rand_state_like(module):
    """Shape-faithful random state (values don't matter for tree checks)."""
    return {k: np.random.default_rng(1).standard_normal(v.shape).astype(
        np.float32) * 0.02 for k, v in module.state_dict().items()}


@pytest.mark.slow
def test_ss_flow_production_tree():
    # ss_flow_img_dit_L_16l8: 1024 wide, 24 blocks, cond 1024, patch 1.
    # Tree/shape check at full image-large scale (the forward numerics are
    # proven at tiny scale above; a 24x1024 CPU forward is minutes-long).
    ref_m = rep.SparseStructureFlowModelRef(
        16, 8, 1024, 1024, 8, 24, 16, patch_size=1, qk_rms_norm=True)
    cfg = ct.ss_flow_config_from_json({
        "resolution": 16, "in_channels": 8, "out_channels": 8,
        "model_channels": 1024, "cond_channels": 1024, "num_blocks": 24,
        "num_heads": 16, "patch_size": 1, "qk_rms_norm": True})
    params = ct.convert_trellis_ss_flow(rep.state_np(ref_m), cfg)
    latent = jnp.zeros((1, 16**3, 8))
    t = jnp.asarray([500.0])
    cond = jnp.zeros((1, 1374, 1024))
    init = jax.eval_shape(
        lambda: SparseStructureFlowModel(cfg).init(
            jax.random.PRNGKey(0), latent, t, cond)["params"])
    assert jax.tree.structure(init) == jax.tree.structure(params)
    for a, b in zip(jax.tree.leaves(init), jax.tree.leaves(params)):
        assert a.shape == b.shape


@pytest.mark.slow
def test_slat_flow_production_tree():
    ref_m = rep.SLatFlowModelRef(64, 8, 1024, 1024, 8, 24, 16, [128],
                                 qk_rms_norm=True)
    cfg = ct.slat_flow_config_from_json({
        "resolution": 64, "in_channels": 8, "out_channels": 8,
        "model_channels": 1024, "cond_channels": 1024, "num_blocks": 24,
        "num_heads": 16, "patch_size": 2, "io_block_channels": [128],
        "qk_rms_norm": True})
    params = ct.convert_trellis_slat_flow(rep.state_np(ref_m), cfg)
    n = 512
    feats = jnp.zeros((1, n, 8))
    coords = jnp.zeros((1, n, 3), jnp.int32)
    valid = jnp.ones((1, n), bool)
    t = jnp.asarray([500.0])
    cond = jnp.zeros((1, 1374, 1024))
    init = jax.eval_shape(
        lambda: SLatFlowModel(cfg).init(
            jax.random.PRNGKey(0), feats, coords, valid, t, cond)["params"])
    assert jax.tree.structure(init) == jax.tree.structure(params)
    for a, b in zip(jax.tree.leaves(init), jax.tree.leaves(params)):
        assert a.shape == b.shape


@pytest.mark.slow
def test_decoders_production_tree():
    out_gs = 32 * 14
    gs_ref = rep.SLatGaussianDecoderRef(64, 768, 8, 12, 12, out_gs)
    cfg = ct.slat_decoder_config_from_json({
        "resolution": 64, "model_channels": 768, "latent_channels": 8,
        "num_blocks": 12, "num_heads": 12, "window_size": 8})
    params = ct.convert_trellis_slat_gs(rep.state_np(gs_ref), cfg)
    feats = jnp.zeros((64, 8))
    coords = jnp.zeros((64, 3), jnp.int32)
    valid = jnp.ones((64,), bool)
    init = jax.eval_shape(
        lambda: SLatGaussianDecoder(cfg).init(
            jax.random.PRNGKey(0), feats, coords, valid)["params"])
    assert jax.tree.structure(init) == jax.tree.structure(params)

    mesh_ref = rep.SLatMeshDecoderRef(64, 768, 8, 12, 12,
                                      flexicubes_channels(True))
    params_m = ct.convert_trellis_slat_mesh(rep.state_np(mesh_ref), cfg)
    init_m = jax.eval_shape(
        lambda: SLatMeshDecoder(cfg).init(
            jax.random.PRNGKey(0), feats, coords, valid)["params"])
    assert jax.tree.structure(init_m) == jax.tree.structure(params_m)


def test_ss_decoder_production_tree():
    ref_m = rep.SparseStructureDecoderRef(1, 8, 2, [512, 128, 32], 2)
    cfg = ct.ss_decoder_config_from_json({
        "out_channels": 1, "latent_channels": 8, "num_res_blocks": 2,
        "channels": [512, 128, 32]})
    params = ct.convert_trellis_ss_decoder(rep.state_np(ref_m), cfg)
    latent = jnp.zeros((1, 16**3, 8))
    init = jax.eval_shape(
        lambda: StructureDecoder(cfg).init(jax.random.PRNGKey(0), latent)["params"])
    assert jax.tree.structure(init) == jax.tree.structure(params)
    for a, b in zip(jax.tree.leaves(init), jax.tree.leaves(params)):
        assert a.shape == b.shape


def test_cond_backbone_configs():
    from labelany3d_tpu.models.convert_trellis import cond_backbone_config

    large = cond_backbone_config("dinov2_vitl14_reg")
    assert large.width == 1024 and large.num_register_tokens == 4
    giant = cond_backbone_config("dinov2_vitg14_reg")
    assert giant.width == 1536 and giant.swiglu and giant.num_register_tokens == 4
