"""SVRM neural reconstructor: triplane shapes, field semantics, extraction.

Reference behavior: `external/Hunyuan3D-1/svrm/ldm/models/svrm.py:109-259`
(views -> triplane -> OSG field -> marching mesh). The analytic anchor is a
handcrafted field whose sdf equals a sampled plane feature: positive inside
a disc, so the extracted surface is a cylinder with a known radius — this
pins the positive-inside convention (`mcubes(0 - sdf, 0)`), the lattice
ordering (x, y, z), and the final (y, z, x) OBJ axis permutation.
"""

import numpy as np
import jax
import jax.numpy as jnp

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


def test_svrm_cylinder_extraction_conventions():
    """Handcraft the field so sdf(p) = plane0(x, y) = r0 - |(x, y)|:
    positive inside the disc -> extraction must yield a z-axis cylinder of
    radius r0 whose axis lands on output coordinate 1 after the reference's
    (y, z, x) export permutation."""
    cfg, model, params, views, cams = _tiny_model()
    r = cfg.plane_size * cfg.upsample_ratio
    c = cfg.triplane_dim
    r0 = 0.3  # cylinder radius in world units

    # Plane 0 (x, y projection): feature ch0 = r0 - |xy|; other planes zero.
    # Pixel centers in sampling coords (align_corners=False).
    uv = (np.arange(r) + 0.5) / r * 2 - 1            # [-1, 1] grid coords
    # world = sample_coord * box_warp / 2
    wx = uv * cfg.box_warp / 2
    gy, gx = np.meshgrid(wx, wx, indexing="ij")      # row = y (H), col = x
    # Shift the stored feature so the sampler's zero padding decodes to a
    # strictly-negative sdf (no spurious crossing at the sampling border).
    shift = 0.35
    disc = (r0 - np.sqrt(gx**2 + gy**2)) + shift
    planes = np.zeros((3, r, r, c), np.float32)
    planes[0, :, :, 0] = disc

    # Field: fc0 passes +-feature through two relus; out recombines and
    # removes the shift: sdf = f - shift.
    fp = jax.tree.map(np.array, params["field"])
    fp["fc0"]["kernel"][:] = 0
    fp["fc0"]["bias"][:] = 0
    fp["fc0"]["kernel"][0, 0] = 1.0
    fp["fc0"]["kernel"][0, 1] = -1.0
    fp["out"]["kernel"][:] = 0
    fp["out"]["bias"][:] = 0
    fp["out"]["kernel"][0, 0] = 1.0
    fp["out"]["kernel"][1, 0] = -1.0
    fp["out"]["bias"][0] = -shift

    params = dict(params)
    params["field"] = fp
    out = model.apply({"params": params}, jnp.asarray(planes),
                      jnp.asarray([[0.1, 0.2, 0.0]]), method=SVRM.query)
    # Spot-check the field itself: sdf(0.1, 0.2, 0) ~ r0 - |(0.1, 0.2)|.
    np.testing.assert_allclose(float(out["sdf"][0]),
                               r0 - np.hypot(0.1, 0.2), atol=0.02)

    # Extraction conventions, hermetically: query the HANDCRAFTED planes on
    # the grid lattice (the full reconstruct() path goes through the neural
    # triplane transformer, whose random-weight planes are not analytic) and
    # run the lattice->mesh export step on the result.
    sdf, rgb = model.apply({"params": params}, jnp.asarray(planes),
                           method=SVRM.grid)
    recon = SVRMReconstruction(novel_views=None, cfg=cfg, params=params)
    mesh = recon.mesh_from_lattice(np.asarray(sdf), np.asarray(rgb))
    assert len(mesh.vertices) > 0
    # After verts[:, [1, 2, 0]], the original z axis is coordinate 1; the
    # cylinder's radial plane (x, y) lands on coordinates (2, 0).
    side = mesh.vertices[np.abs(mesh.vertices[:, 1]) < cfg.aabb * 0.8]
    radii = np.hypot(side[:, 2], side[:, 0])
    assert abs(np.median(radii) - r0) < 0.06

    # The full neural path still runs end to end and yields a finite mesh.
    rgba = np.full((24, 24, 4), 255, np.uint8)
    full = recon.reconstruct(rgba)
    assert np.isfinite(full.vertices).all()


def test_svrm_camera_vector_layout():
    """20-dim cam: flattened 4x4 c2w + [35/32, 35/32, .5, .5]; the input
    view rides a zero camera (predictor.py:110-127)."""
    v = SVRMReconstruction.camera_vector(0.0, 0.0)
    assert v.shape == (20,)
    c2w = v[:16].reshape(4, 4)
    # Camera at (1.5, 0, 0) looking at origin, z-up.
    np.testing.assert_allclose(c2w[:3, 3], [1.5, 0, 0], atol=1e-6)
    np.testing.assert_allclose(v[16:], [35 / 32, 35 / 32, 0.5, 0.5], atol=1e-6)
    # -forward = +x is the camera z column
    np.testing.assert_allclose(c2w[:3, 2], [1.0, 0, 0], atol=1e-6)


def test_svrm_reconstruction_backend_protocol():
    """Registry-facing contract: reconstruct() returns a Mesh with the
    generative-output normalization (object roughly inside the aabb)."""
    from labelany3d_tpu.utils.logging import reset_warnings

    reset_warnings()
    cfg = SVRMConfig.tiny_test()
    recon = SVRMReconstruction(novel_views=None, cfg=cfg)
    rng = np.random.default_rng(0)
    rgba = (rng.uniform(size=(32, 32, 4)) * 255).astype(np.uint8)
    mesh = recon.reconstruct(rgba)
    if len(mesh.vertices):
        assert np.abs(mesh.vertices).max() <= cfg.aabb + 1e-5
