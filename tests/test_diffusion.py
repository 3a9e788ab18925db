"""Diffusion family + elevation estimator tests (tiny configs)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from labelany3d_tpu.models.diffusion import (
    AmodalCompletion,
    AutoencoderKL,
    DDIMConfig,
    InvSREnhance,
    UNet2D,
    UNetConfig,
    VAEConfig,
    Zero123NovelView,
    add_noise,
    ddim_sample,
    make_alphas,
)


@pytest.mark.heavy
def test_unet_shapes_and_zero_init():
    cfg = UNetConfig.tiny_test()
    model = UNet2D(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, cfg.in_channels))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 6, cfg.context_dim))
    t = jnp.array([0.5, 0.2])
    params = model.init(jax.random.PRNGKey(2), x, t, ctx)["params"]
    out = model.apply({"params": params}, x, t, ctx)
    assert out.shape == (2, 16, 16, cfg.out_channels)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)  # zero-init head


def test_vae_roundtrip_shapes():
    vae = AutoencoderKL(VAEConfig.tiny_test())
    vae.init_params(image_size=32)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 32, 32, 3)) * 2 - 1
    lat = vae.encode(x)
    assert lat.shape == (1, 16, 16, 4)
    out = vae.decode(lat)
    assert out.shape == (1, 32, 32, 3)


def test_ddim_perfect_eps_recovers_x0():
    # If eps_fn returns the exact noise used in add_noise, DDIM must walk
    # back to x0 (the DDIM ODE is exact for constant eps).
    x0 = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t_start = 600
    xt = add_noise(x0, noise, t_start)
    out = ddim_sample(lambda x, t: noise, xt, DDIMConfig(steps=10, start_timestep=t_start))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-4)


def test_alphas_monotone():
    ab = np.asarray(make_alphas())
    assert ab[0] > 0.99 and ab[-1] < 0.01
    assert (np.diff(ab) < 0).all()


@pytest.mark.slow
def test_enhance_pipeline_shapes():
    be = InvSREnhance(tiny=True, image_size=32, steps=2)
    img = np.random.default_rng(0).integers(0, 255, (24, 20, 3)).astype(np.uint8)
    out = be.enhance(img)
    assert out.shape == (96, 80, 3) and out.dtype == np.uint8


@pytest.mark.slow
def test_completion_pipeline_shapes():
    be = AmodalCompletion(tiny=True, image_size=32, steps=2)
    crop = np.random.default_rng(0).integers(0, 255, (48, 48, 4)).astype(np.uint8)
    out = be.complete(crop, "chair")
    assert out.shape == (48, 48, 4) and out.dtype == np.uint8


@pytest.mark.slow
def test_zero123_pipeline_shapes():
    be = Zero123NovelView(tiny=True, image_size=32, steps=2)
    crop = np.random.default_rng(0).integers(0, 255, (40, 40, 4)).astype(np.uint8)
    out = be.generate(crop, d_elev=10.0, d_azim=0.0)
    assert out.shape == (32, 32, 3)
    out2 = be.generate(crop, d_elev=10.0, d_azim=0.0)
    np.testing.assert_array_equal(out, out2)  # deterministic


def test_elevation_estimator_recovers_known_elevation():
    """Epipolar grid search with oracle matches from true orbit geometry."""
    from labelany3d_tpu.models.elevation import (
        VIEW_DELTAS,
        MatchingElevationEstimator,
    )
    from labelany3d_tpu.registration.cameras import opencv_orbit_pose

    K = np.array([[300.0, 0, 128], [0, 300.0, 128], [0, 0, 1]])
    true_elev = 24.0
    rng = np.random.default_rng(0)
    pts3d = rng.uniform(-0.4, 0.4, (200, 3))

    def project(elev, azim):
        R, t = opencv_orbit_pose(elev, azim, 1.5)
        cam = pts3d @ R.T + t
        uv = cam @ K.T
        return uv[:, :2] / uv[:, 2:3], cam[:, 2] > 0

    class Views:
        def generate(self, crop, de, da, seed=0):
            return (de, da)  # token passed through to the matcher

    class Matcher:
        def __call__(self, v0, v1):
            xy0, ok0 = project(true_elev + v0[0], v0[1])
            xy1, ok1 = project(true_elev + v1[0], v1[1])
            valid = ok0 & ok1
            return xy0.astype(np.float32), xy1.astype(np.float32), valid

    est = MatchingElevationEstimator(Views(), Matcher(), K)
    out = est.estimate(np.zeros((8, 8, 4), np.uint8))
    assert out == pytest.approx(true_elev, abs=2.0)


def test_elevation_estimator_fallback_no_matches():
    from labelany3d_tpu.models.elevation import MatchingElevationEstimator

    class Views:
        def generate(self, crop, de, da, seed=0):
            return None

    class NoMatcher:
        def __call__(self, v0, v1):
            z = np.zeros((4, 2), np.float32)
            return z, z, np.zeros(4, bool)

    est = MatchingElevationEstimator(Views(), NoMatcher(), np.eye(3))
    assert est.estimate(np.zeros((8, 8, 4))) == 0.0
