"""Model layer tests: ViT, MoGe, DepthPro (tiny configs), registry."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from labelany3d_tpu.models import (
    DepthProConfig,
    DepthProModel,
    MoGeConfig,
    MoGeModel,
    ViT,
    ViTConfig,
    depth_pro_infer,
    get_model,
    moge_infer,
    register_model,
    registry,
    unload_all_models,
    unload_model,
)
from labelany3d_tpu.models.vit import resize_pos_embed


def test_vit_forward_shapes():
    cfg = ViTConfig.tiny_test(out_indices=(0, 1), num_register_tokens=2)
    model = ViT(cfg)
    x = jnp.zeros((2, 32, 40, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    out = model.apply({"params": params}, x)
    gh, gw = 32 // cfg.patch_size, 40 // cfg.patch_size
    assert out["grid"] == (gh, gw)
    assert out["tokens"].shape == (2, gh * gw, cfg.width)
    assert out["cls"].shape == (2, cfg.width)
    assert len(out["hiddens"]) == 2
    assert out["hiddens"][0].shape == (2, gh * gw, cfg.width)


def test_vit_jits_and_is_finite():
    cfg = ViTConfig.tiny_test()
    model = ViT(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    fn = jax.jit(lambda p, im: model.apply({"params": p}, im)["tokens"])
    out = fn(params, x)
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_vit_swiglu_variant():
    cfg = ViTConfig.tiny_test(swiglu=True)
    model = ViT(cfg)
    x = jnp.zeros((1, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    out = model.apply({"params": params}, x)
    assert out["tokens"].shape[-1] == cfg.width


def test_resize_pos_embed():
    pos = jnp.ones((1, 4, 4, 8))
    out = resize_pos_embed(pos, 6, 7)
    assert out.shape == (1, 6, 7, 8)


def test_moge_forward_and_infer():
    cfg = MoGeConfig.tiny_test()
    model = MoGeModel(cfg)
    h, w = 48, 64
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, h, w, 3))
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    out = model.apply({"params": params}, x)
    assert out["points"].shape == (2, h, w, 3)
    assert (np.asarray(out["points"][..., 2]) > 0).all()  # exp remap

    res = moge_infer(model, params, x)
    assert res["depth"].shape == (2, h, w)
    assert res["intrinsics"].shape == (2, 3, 3)
    K = np.asarray(res["intrinsics"])
    np.testing.assert_allclose(K[:, 0, 2], 0.5, atol=1e-5)
    # Projection consistency: x/z * fx + 0.5 should recover pixel coords on
    # unmasked pixels.
    pts = np.asarray(res["points"])
    depth = np.asarray(res["depth"])
    valid = np.isfinite(depth)
    assert valid.any()


def test_moge_infer_with_known_fov():
    cfg = MoGeConfig.tiny_test()
    model = MoGeModel(cfg)
    x = jnp.zeros((1, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    res = moge_infer(model, params, x, fov_x_degrees=jnp.array([60.0]))
    # fx_norm = 0.5 / tan(fov/2) for square images
    fx = float(res["intrinsics"][0, 0, 0])
    assert fx == pytest.approx(0.5 / np.tan(np.deg2rad(30.0)), rel=1e-3)


def test_depth_pro_infer_focal_scaling():
    cfg = DepthProConfig.tiny_test()
    model = DepthProModel(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    out1 = depth_pro_infer(model, params, x, f_px=jnp.array([100.0]))
    out2 = depth_pro_infer(model, params, x, f_px=jnp.array([200.0]))
    d1 = np.asarray(out1["depth"])
    d2 = np.asarray(out2["depth"])
    assert d1.shape == (1, 64, 64)
    # doubling the focal doubles the metric depth (inverse_depth ~ W/f)
    np.testing.assert_allclose(d2, 2.0 * d1, rtol=1e-4)


def test_registry_lazy_load_and_unload():
    calls = {"n": 0}

    def factory(value=7):
        calls["n"] += 1
        return {"value": value}

    register_model("_test_model", factory, override=True)
    m1 = get_model("_test_model")
    m2 = get_model("_test_model")
    assert m1 is m2 and calls["n"] == 1
    assert "_test_model" in registry.loaded()
    assert unload_model("_test_model")
    assert not unload_model("_test_model")
    get_model("_test_model")
    unload_all_models()
    assert registry.loaded() == []


def test_registry_unknown_backend():
    with pytest.raises(KeyError):
        get_model("_no_such_backend_")


def test_registry_override_protection():
    register_model("_prot", lambda: 1, override=True)
    with pytest.raises(ValueError):
        register_model("_prot", lambda: 2)
    register_model("_prot", lambda: 2, override=True)
    assert get_model("_prot") == 2
    unload_all_models()


def test_vit_rope2d_mode():
    cfg = ViTConfig.tiny_test(pos_embed="rope2d", use_class_token=True)
    model = ViT(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 24, 32, 3))
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    assert "pos_embed" not in params  # no learned positions in rope mode
    out = model.apply({"params": params}, x)
    assert out["tokens"].shape == (1, (24 // cfg.patch_size) * (32 // cfg.patch_size), cfg.width)
    assert np.isfinite(np.asarray(out["tokens"], np.float32)).all()
    # RoPE's defining property: attention depends on *relative* positions,
    # so translating the input translates the output (up to the wrapped
    # column and the global cls token).
    x2 = jnp.roll(x, cfg.patch_size, axis=2)
    out2 = model.apply({"params": params}, x2)
    grid = out["tokens"].reshape(1, 3, 4, -1)
    grid2 = out2["tokens"].reshape(1, 3, 4, -1)
    rolled = jnp.roll(grid, 1, axis=2)
    interior = np.asarray(grid2[:, :, 1:3], np.float32)
    expect = np.asarray(rolled[:, :, 1:3], np.float32)
    np.testing.assert_allclose(interior, expect, atol=5e-2)
    # whereas a learned-pos model is NOT translation-equivariant
    cfg_l = ViTConfig.tiny_test(pos_embed="learned")
    model_l = ViT(cfg_l)
    params_l = model_l.init(jax.random.PRNGKey(1), x)["params"]
    o1 = model_l.apply({"params": params_l}, x)["tokens"].reshape(1, 3, 4, -1)
    o2 = model_l.apply({"params": params_l}, x2)["tokens"].reshape(1, 3, 4, -1)
    diff = np.abs(np.asarray(o2[:, :, 1:3], np.float32) -
                  np.asarray(jnp.roll(o1, 1, axis=2)[:, :, 1:3], np.float32)).max()
    assert diff > 5e-2
