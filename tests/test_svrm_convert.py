"""SVRM checkpoint-converter tests: torch-replica parity at tiny shapes +
production (svrm.yaml) tree check.

Oracles in `tests/svrm_replica.py` register parameters under the released
`svrm.safetensors` names (img_encoder.model.*, img_to_triplane_decoder.*,
render.decoder.net.*).
"""

import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from labelany3d_tpu.models.svrm import (
    SVRM,
    SVRMConfig,
    TriplaneField,
    convert_svrm,
)

import svrm_replica as rep

torch.manual_seed(0)

TINY = SVRMConfig(
    num_views=2, image_size=16, enc_width=32, enc_depth=2, enc_heads=2,
    enc_patch=8, enc_pos_grid=2,  # matches 16/8 -> no pos interpolation
    plane_size=4, token_dim=24, depth=2, num_heads=2, context_dim=32,
    triplane_dim=6, upsample_ratio=2, field_hidden=16, grid_size=12,
    dtype=jnp.float32,
)


def _replica(cfg: SVRMConfig):
    return rep.SVRMModelRef(
        enc_kw=dict(width=cfg.enc_width, depth=cfg.enc_depth,
                    heads=cfg.enc_heads, patch=cfg.enc_patch,
                    pos_grid=cfg.enc_pos_grid, cam_dim=cfg.cam_dim),
        tri_kw=dict(pos_emb_size=cfg.plane_size, pos_emb_dim=cfg.token_dim,
                    n_heads=cfg.num_heads, d_head=cfg.token_dim // cfg.num_heads,
                    depth=cfg.depth, context_dim=cfg.context_dim,
                    triplane_dim=cfg.triplane_dim,
                    upsample_ratio=cfg.upsample_ratio),
        render_kw=dict(triplane_dim=cfg.triplane_dim,
                       hidden_dim=cfg.field_hidden,
                       num_layers=cfg.field_layers),
    ).eval()


def test_svrm_triplane_parity():
    """Full views->triplane path matches the torch oracle under converted
    weights (encoder AdaNorm modulation, LRM blocks, pixel-shuffle up)."""
    cfg = TINY
    ref_m = _replica(cfg)
    rng = np.random.default_rng(0)
    views = rng.normal(size=(1, cfg.num_views, cfg.image_size,
                             cfg.image_size, 3)).astype(np.float32)
    cams = rng.normal(size=(1, cfg.num_views, cfg.cam_dim)).astype(np.float32)
    with torch.no_grad():
        ref = ref_m(torch.from_numpy(views.transpose(0, 1, 4, 2, 3)),
                    torch.from_numpy(cams)).numpy()

    params = convert_svrm(rep.state_np(ref_m), cfg)
    planes = SVRM(cfg).apply({"params": params}, jnp.asarray(views),
                             jnp.asarray(cams))
    # torch planes (1, 3, C, H, W) -> (1, 3, H, W, C)
    ref_hw = ref.transpose(0, 1, 3, 4, 2)
    np.testing.assert_allclose(np.asarray(planes), ref_hw, atol=2e-4, rtol=1e-3)


def test_svrm_field_parity():
    """OSG field (plane projection + grid_sample + MLP) matches the
    reference's EG3D sampling conventions."""
    cfg = TINY
    ref_m = _replica(cfg)
    rng = np.random.default_rng(1)
    r = cfg.plane_size * cfg.upsample_ratio
    planes = rng.normal(size=(1, 3, cfg.triplane_dim, r, r)).astype(np.float32)
    pts = (rng.random((40, 3)).astype(np.float32) - 0.5) * 2 * cfg.aabb
    with torch.no_grad():
        ref = ref_m.render.forward_points(
            torch.from_numpy(planes), torch.from_numpy(pts),
            box_warp=cfg.box_warp)
        ref_sdf, ref_rgb = ref["sdf"].numpy(), ref["rgb"].numpy()

    params = convert_svrm(rep.state_np(ref_m), cfg)
    planes_hw = jnp.asarray(planes[0].transpose(0, 2, 3, 1))  # (3, H, W, C)
    out = TriplaneField(cfg).apply({"params": params["field"]},
                                   planes_hw, jnp.asarray(pts))
    np.testing.assert_allclose(np.asarray(out["sdf"]), ref_sdf,
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out["rgb"]), ref_rgb,
                               atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_svrm_production_tree():
    """Tree/shape coverage at the released svrm.yaml shapes (dinov2_vitb14
    encoder, 64^2 x 1024 plane tokens, 16 blocks, 120-dim triplane)."""
    cfg = SVRMConfig()
    ref_m = _replica(cfg)
    params = convert_svrm(rep.state_np(ref_m), cfg)
    views = jnp.zeros((1, cfg.num_views, cfg.image_size, cfg.image_size, 3))
    cams = jnp.zeros((1, cfg.num_views, cfg.cam_dim))
    init = jax.eval_shape(
        lambda: SVRM(cfg).init(jax.random.PRNGKey(0), views, cams,
                               method=SVRM.init_all)["params"])
    assert jax.tree.structure(init) == jax.tree.structure(params)
    for a, b in zip(jax.tree.leaves(init), jax.tree.leaves(params)):
        assert a.shape == b.shape
