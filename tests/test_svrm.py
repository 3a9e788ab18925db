"""SVRM neural reconstructor: triplane shapes, field semantics, extraction.

Reference behavior: `external/Hunyuan3D-1/svrm/ldm/models/svrm.py:109-259`
(views -> triplane -> NeuS field -> marching mesh). The analytic anchor is
the spherical SDF bias (synthesizer.py `get_shifted_sdf`): with the field
MLP's output zeroed, sdf(p) = |p| - radius exactly, so the extracted mesh
must be that sphere.
"""

import jax
import jax.numpy as jnp
import numpy as np

from labelany3d_tpu.models.svrm import SVRM, SVRMConfig, SVRMReconstruction


def _tiny_model():
    cfg = SVRMConfig.tiny_test()
    model = SVRM(cfg)
    views = jnp.zeros((1, cfg.num_views, cfg.image_size, cfg.image_size, 3))
    cams = jnp.zeros((1, cfg.num_views, cfg.cam_dim))
    params = model.init(jax.random.PRNGKey(0), views, cams,
                        method=SVRM.init_all)["params"]
    return cfg, model, params, views, cams


def test_svrm_triplane_shapes():
    cfg, model, params, views, cams = _tiny_model()
    planes = model.apply({"params": params}, views, cams)
    r = cfg.plane_size * cfg.upsample_ratio
    assert planes.shape == (1, 3, r, r, cfg.triplane_dim)
    sdf, rgb = model.apply({"params": params}, planes[0], method=SVRM.grid)
    g = cfg.grid_size
    assert sdf.shape == (g, g, g)
    assert rgb.shape == (g, g, g, 3)
    assert np.isfinite(np.asarray(sdf)).all()
    assert (np.asarray(rgb) >= -0.0011).all() and (np.asarray(rgb) <= 1.0011).all()


def test_svrm_sphere_bias_extraction():
    """Zeroed field MLP -> sdf = |p| - 0.5 -> extracted mesh is the
    radius-0.5 sphere (|v| = 0.5/(2*aabb) in the [-0.5, 0.5] object frame)."""
    cfg, model, params, views, cams = _tiny_model()
    params = jax.tree.map(lambda x: x, params)  # shallow copy
    params["field"]["out"] = jax.tree.map(jnp.zeros_like, params["field"]["out"])

    recon = SVRMReconstruction(novel_views=None, cfg=cfg, params=params)
    rgba = np.full((24, 24, 4), 255, np.uint8)
    mesh = recon.reconstruct(rgba)
    assert len(mesh.vertices) > 0 and len(mesh.faces) > 0
    radii = np.linalg.norm(mesh.vertices, axis=1)
    expected = 0.5 / (2 * cfg.aabb)
    assert abs(radii.mean() - expected) < 0.05
    assert radii.std() < 0.05
    assert mesh.colors is not None and mesh.colors.shape == (len(mesh.vertices), 3)


def test_svrm_reconstruction_backend_protocol():
    """Registry-facing contract: reconstruct() returns a Mesh with the
    generative-output normalization (object roughly inside [-0.5, 0.5])."""
    from labelany3d_tpu.utils.logging import reset_warnings

    reset_warnings()
    cfg = SVRMConfig.tiny_test()
    recon = SVRMReconstruction(novel_views=None, cfg=cfg)
    rng = np.random.default_rng(0)
    rgba = (rng.uniform(size=(32, 32, 4)) * 255).astype(np.uint8)
    mesh = recon.reconstruct(rgba)
    if len(mesh.vertices):
        assert np.abs(mesh.vertices).max() <= 0.501
