"""Checkpoint-faithful DepthPro (35-patch pyramid) tests.

Covers the reference split/merge layout (`encoder.py:170-217`) against a
numpy oracle, the tiny end-to-end forward (canonical inverse depth + FoV),
the FoV->focal inference rule, and that `convert_depth_pro` produces exactly
the flax parameter tree from a torch-shaped state dict (every name and every
shape transform checked).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from labelany3d_tpu.models.depth_pro import (
    DepthPro35,
    DepthPro35Config,
    depth_pro35_infer,
    merge_overlap,
    split_overlap,
)


def test_split_merge_reference_layout():
    rng = np.random.default_rng(0)
    b, size, patch = 2, 40, 16
    x = rng.normal(size=(b, size, size, 3)).astype(np.float32)
    stride = 12  # 3x3 grid, overlap 4
    patches = np.asarray(split_overlap(jnp.asarray(x), patch, stride))
    assert patches.shape == (9 * b, patch, patch, 3)
    # reference layout: index (row*steps+col)*B + b
    np.testing.assert_array_equal(patches[2 * b], x[0, 0:16, 24:40])   # row0,col2
    np.testing.assert_array_equal(patches[3 * b + 1], x[1, 12:28, 0:16])  # row1,col0

    merged = np.asarray(merge_overlap(jnp.asarray(patches), b, padding=2))
    # each seam loses 2 px per side: 14 + 12 + 14 = 40
    assert merged.shape == (b, 40, 40, 3)
    np.testing.assert_array_equal(merged[:, :8, :8], x[:, :8, :8])     # corner intact
    np.testing.assert_array_equal(merged[:, 20:24, 20:24], x[:, 20:24, 20:24])


@pytest.mark.heavy
def test_depth_pro35_tiny_forward_and_infer():
    cfg = DepthPro35Config.tiny_test()
    model = DepthPro35(cfg)
    x = jnp.asarray(np.random.default_rng(0).uniform(size=(1, 512, 512, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    out = model.apply({"params": params}, x)
    assert out["canonical_inverse_depth"].shape == (1, 512, 512)
    assert (np.asarray(out["canonical_inverse_depth"]) >= 0).all()
    assert out["fov_deg"].shape == (1,)

    res = depth_pro35_infer(model, params, x, f_px=None)
    assert res["depth"].shape == (1, 512, 512)
    # FoV -> focal rule: f = 0.5 W / tan(fov/2)
    fov = float(res["fov_deg"][0])
    np.testing.assert_allclose(
        float(res["f_px"][0]), 0.5 * 512 / np.tan(0.5 * np.deg2rad(fov)), rtol=1e-5
    )
    # explicit focal overrides the head
    res2 = depth_pro35_infer(model, params, x, f_px=300.0)
    assert float(res2["f_px"][0]) == 300.0


def _vit_state(cfg, gh):
    """timm-DINOv2-shaped random state dict matching a tiny ViTConfig."""
    rng = np.random.default_rng(1)
    c = cfg.width
    hid = int(c * cfg.mlp_ratio)

    def rnd(*s):
        return rng.normal(size=s).astype(np.float32) * 0.02

    st = {
        "patch_embed.proj.weight": rnd(c, 3, cfg.patch_size, cfg.patch_size),
        "patch_embed.proj.bias": rnd(c),
        "pos_embed": rnd(1, 1 + gh * gh, c),
        "cls_token": rnd(1, 1, c),
        "norm.weight": rnd(c) + 1.0, "norm.bias": rnd(c),
    }
    for i in range(cfg.depth):
        pre = f"blocks.{i}."
        st.update({
            pre + "norm1.weight": rnd(c) + 1.0, pre + "norm1.bias": rnd(c),
            pre + "norm2.weight": rnd(c) + 1.0, pre + "norm2.bias": rnd(c),
            pre + "attn.qkv.weight": rnd(3 * c, c), pre + "attn.qkv.bias": rnd(3 * c),
            pre + "attn.proj.weight": rnd(c, c), pre + "attn.proj.bias": rnd(c),
            pre + "mlp.fc1.weight": rnd(hid, c), pre + "mlp.fc1.bias": rnd(hid),
            pre + "mlp.fc2.weight": rnd(c, hid), pre + "mlp.fc2.bias": rnd(c),
            pre + "ls1.gamma": rnd(c) + 1.0, pre + "ls2.gamma": rnd(c) + 1.0,
        })
    return st


def test_convert_depth_pro_tree_matches_init():
    from labelany3d_tpu.models.convert import convert_depth_pro

    cfg = DepthPro35Config.tiny_test()
    gh = cfg.patch_res // cfg.patch_encoder.patch_size
    rng = np.random.default_rng(2)

    def rnd(*s):
        return rng.normal(size=s).astype(np.float32) * 0.02

    state = {}
    for prefix, vcfg in [("encoder.patch_encoder.", cfg.patch_encoder),
                         ("encoder.image_encoder.", cfg.image_encoder),
                         ("fov.encoder.0.", cfg.fov_encoder)]:
        state.update({prefix + k: v for k, v in _vit_state(vcfg, gh).items()})

    C = cfg.patch_encoder.width
    de, df = cfg.dims_encoder, cfg.decoder_features

    def deconv(pre, cin, cout, bias=False):
        state[pre + ".weight"] = rnd(cin, cout, 2, 2)
        if bias:
            state[pre + ".bias"] = rnd(cout)

    def conv(pre, cin, cout, k, bias=True):
        state[pre + ".weight"] = rnd(cout, cin, k, k)
        if bias:
            state[pre + ".bias"] = rnd(cout)

    # encoder upsample blocks (proj + deconvs, bias-free)
    conv("encoder.upsample_latent0.0", C, de[0], 1, bias=False)
    deconv("encoder.upsample_latent0.1", de[0], df)
    deconv("encoder.upsample_latent0.2", df, df)
    deconv("encoder.upsample_latent0.3", df, df)
    conv("encoder.upsample_latent1.0", C, de[0], 1, bias=False)
    deconv("encoder.upsample_latent1.1", de[0], de[0])
    deconv("encoder.upsample_latent1.2", de[0], de[0])
    for i, d in [(0, de[1]), (1, de[2]), (2, de[3])]:
        conv(f"encoder.upsample{i}.0", C, d, 1, bias=False)
        deconv(f"encoder.upsample{i}.1", d, d)
    deconv("encoder.upsample_lowres", cfg.image_encoder.width, de[3], bias=True)
    conv("encoder.fuse_lowres", 2 * de[3], de[3], 1)

    # decoder convs + fusions
    for i, d in [(1, de[0]), (2, de[1]), (3, de[2]), (4, de[3])]:
        conv(f"decoder.convs.{i}", d, df, 3 if i > 0 else 1, bias=False)
    for i in range(5):
        pre = f"decoder.fusions.{i}"
        for rn in ("resnet1", "resnet2"):
            conv(f"{pre}.{rn}.residual.1", df, df, 3)
            conv(f"{pre}.{rn}.residual.3", df, df, 3)
        if i != 0:
            deconv(f"{pre}.deconv", df, df)
        conv(f"{pre}.out_conv", df, df, 1)

    # head + fov head
    conv("head.0", df, df // 2, 3)
    deconv("head.1", df // 2, df // 2, bias=True)
    conv("head.2", df // 2, cfg.last_dims[0], 3)
    conv("head.4", cfg.last_dims[0], cfg.last_dims[1], 1)
    state["fov.encoder.1.weight"] = rnd(df // 2, cfg.fov_encoder.width)
    state["fov.encoder.1.bias"] = rnd(df // 2)
    conv("fov.downsample.0", df, df // 2, 3)
    conv("fov.head.0", df // 2, df // 4, 3)
    conv("fov.head.2", df // 4, max(df // 8, 1), 3)
    conv("fov.head.4", max(df // 8, 1), 1, cfg.fov_final_kernel)

    params = convert_depth_pro(state, cfg)
    model = DepthPro35(cfg)
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 512, 512, 3)))["params"]
    conv_shapes = jax.tree_util.tree_map(lambda a: np.asarray(a).shape, params)
    init_shapes = jax.tree_util.tree_map(lambda a: a.shape, init)
    assert conv_shapes == init_shapes

    out = model.apply({"params": params}, jnp.zeros((1, 512, 512, 3)))
    assert out["canonical_inverse_depth"].shape == (1, 512, 512)
