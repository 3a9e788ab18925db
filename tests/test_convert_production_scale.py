"""Converter validation at PRODUCTION scale (slow).

The tiny-config parity tests (test_moge_checkpoint_head, test_depth_pro35,
test_catmlpdpt, test_aux) validate numerics and naming; this file
instantiates the real checkpoint-sized configs through the converters so
layout/shape surprises at 300M+ params are caught before weights land:

  * MoGe ViT-L (`MoGeConfig.vitl()`, `Ruicheng/moge-vitl` shape,
    moge_model.py:298-393): full synthetic torch-named state dict ->
    `convert_moge_checkpoint` -> tree must equal the model's init tree;
    forward at a production-width bucket stays finite. Plus numerical
    backbone parity vs the torch DINOv2 replica at ViT-L width.
  * DepthPro35 (`DepthPro35Config()`, depth_pro.py:244-299): full-size
    state dict -> `convert_depth_pro` -> exact tree.
  * MASt3R-L (`MatcherConfig.mast3r_vitl()`, mast3r/model.py:40): full
    state dict -> `convert_mast3r` -> exact tree + finite forward.

Run with `-m slow` excluded for the fast loop; CI runs them nightly-style.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from labelany3d_tpu.models.depth_pro import DepthPro35, DepthPro35Config
from labelany3d_tpu.models.matcher import MatcherConfig, TwoViewMatcher
from labelany3d_tpu.models.moge import MoGeConfig, MoGeModel
from labelany3d_tpu.models.vit import ViT, ViTConfig

pytestmark = pytest.mark.slow

_rng = np.random.default_rng(7)


def rnd(*s):
    return _rng.normal(size=s).astype(np.float32) * 0.02


def _dinov2_state(cfg: ViTConfig, gh: int, gw: int | None = None) -> dict:
    """timm/DINOv2-named random state dict at arbitrary ViTConfig size."""
    gw = gh if gw is None else gw
    c = cfg.width
    hid = int(c * cfg.mlp_ratio)
    st = {
        "patch_embed.proj.weight": rnd(c, 3, cfg.patch_size, cfg.patch_size),
        "patch_embed.proj.bias": rnd(c),
        "pos_embed": rnd(1, 1 + gh * gw, c),
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
        })
        if cfg.layerscale_init is not None:
            st[pre + "ls1.gamma"] = rnd(c) + 1.0
            st[pre + "ls2.gamma"] = rnd(c) + 1.0
    return st


def _group_norm(state, pre, ch):
    state[pre + "weight"] = rnd(ch) + 1.0
    state[pre + "bias"] = rnd(ch)


def _conv(state, pre, cin, cout, k, bias=True):
    state[pre + "weight"] = rnd(cout, cin, k, k)
    if bias:
        state[pre + "bias"] = rnd(cout)


def _res_block_state(state, pre, cin, cout, hidden):
    _group_norm(state, pre + "layers.0.", cin)
    _conv(state, pre + "layers.2.", cin, hidden, 3)
    _group_norm(state, pre + "layers.3.", hidden)
    _conv(state, pre + "layers.5.", hidden, cout, 3)
    if cin != cout:
        _conv(state, pre + "skip_connection.", cin, cout, 1)


def _moge_state(cfg: MoGeConfig, grid: int) -> dict:
    """Full released-MoGe-shaped state dict (backbone.* + head.*)."""
    state = {f"backbone.{k}": v
             for k, v in _dinov2_state(cfg.backbone, grid).items()}
    w = cfg.backbone.width
    for i in range(len(cfg.backbone.out_indices)):
        _conv(state, f"head.projects.{i}.", w, cfg.dim_proj, 1)
    ch = cfg.dim_proj
    for i, out_ch in enumerate(cfg.dim_upsample):
        pre = f"head.upsample_blocks.{i}."
        # UV concat adds 2 channels before the 2x deconv.
        state[pre + "0.0.weight"] = rnd(ch + 2, out_ch, 2, 2)
        state[pre + "0.0.bias"] = rnd(out_ch)
        _conv(state, pre + "0.1.", out_ch, out_ch, 3)
        for r in range(cfg.num_res_blocks):
            _res_block_state(state, pre + f"{1 + r}.", out_ch, out_ch, out_ch)
        ch = out_ch
    dim_out = [3, 1] if (cfg.output_mask and cfg.split_head) else \
        [4] if cfg.output_mask else [3]
    for j, d in enumerate(dim_out):
        pre = f"head.output_block.{j}." if len(dim_out) > 1 else "head.output_block."
        _conv(state, pre + "0.", ch + 2, cfg.last_conv_channels, 3)
        for r in range(cfg.last_res_blocks):
            _res_block_state(state, pre + f"{1 + r}.", cfg.last_conv_channels,
                             cfg.last_conv_channels, cfg.last_conv_channels)
        _conv(state, pre + f"{cfg.last_res_blocks + 2}.",
              cfg.last_conv_channels, d, cfg.last_conv_size)
    return state


def _shapes(tree):
    return jax.tree_util.tree_map(lambda a: tuple(np.shape(a)), tree)


def test_moge_vitl_converter_and_forward():
    from labelany3d_tpu.models.convert import convert_moge_checkpoint

    cfg = MoGeConfig.vitl()
    state = _moge_state(cfg, grid=37)  # DINOv2-L/14 518px checkpoint grid
    params = convert_moge_checkpoint(state, cfg, grid_hw=(37, 37))

    model = MoGeModel(cfg)
    # eval_shape: full init tree at the production bucket without compute.
    init = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), jnp.zeros((1, 518, 518, 3))
    )["params"]
    assert _shapes(params) == _shapes(init)

    n_params = sum(int(np.prod(np.shape(a))) for a in jax.tree_util.tree_leaves(params))
    assert n_params > 300e6  # ViT-L backbone + reference head

    # Forward at a production-width, small-spatial bucket (126 = 9 patches):
    # exercises every layer's layout at real channel dims cheaply.
    out = model.apply({"params": params},
                      jnp.zeros((1, 126, 126, 3), jnp.float32))
    assert out["points"].shape == (1, 126, 126, 3)
    assert np.isfinite(np.asarray(out["points"])).all()
    assert np.isfinite(np.asarray(out["mask"])).all()


def test_vitl_backbone_numerical_parity_vs_torch():
    """convert_dinov2_vit numerics at REAL ViT-L width/depth (the tiny test
    in test_aux.py covers the naming; this covers 1024x24 accumulations)."""
    torch = pytest.importorskip("torch")  # noqa: F841
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from test_aux import _torch_dinov2_tiny

    from labelany3d_tpu.models.convert import convert_dinov2_vit

    cfg = ViTConfig.large(dtype=jnp.float32)
    gh = 9  # 126px at patch 14
    state = _dinov2_state(cfg, gh)
    params = convert_dinov2_vit(state, cfg, grid_hw=(gh, gh))
    x = _rng.normal(size=(1, gh * 14, gh * 14, 3)).astype(np.float32) * 0.5
    ours = ViT(cfg).apply({"params": params}, jnp.asarray(x))["tokens"]
    ref = _torch_dinov2_tiny(state, x, cfg)
    # depth-24 width-1024 accumulation noise: f32 vs torch op ordering
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-3, rtol=5e-3)


def test_depth_pro35_converter_production_tree():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from test_depth_pro35 import _vit_state

    from labelany3d_tpu.models.convert import convert_depth_pro

    cfg = DepthPro35Config()
    gh = cfg.patch_res // cfg.patch_encoder.patch_size
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
    init = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.img_size, cfg.img_size, 3)),
    )["params"]
    assert _shapes(params) == _shapes(init)
    n_params = sum(int(np.prod(np.shape(a))) for a in jax.tree_util.tree_leaves(params))
    assert n_params > 900e6  # three ViT-L towers + DPT decoder


def test_mast3r_vitl_converter_and_forward():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from test_catmlpdpt import _mast3r_head_state

    from labelany3d_tpu.models.convert import convert_mast3r

    cfg = MatcherConfig.mast3r_vitl()
    ed, dd = cfg.encoder.width, cfg.dec_width
    state = {
        "patch_embed.proj.weight": rnd(ed, 3, cfg.encoder.patch_size, cfg.encoder.patch_size),
        "patch_embed.proj.bias": rnd(ed),
        "enc_norm.weight": rnd(ed) + 1.0, "enc_norm.bias": rnd(ed),
        "decoder_embed.weight": rnd(dd, ed), "decoder_embed.bias": rnd(dd),
        "dec_norm.weight": rnd(dd) + 1.0, "dec_norm.bias": rnd(dd),
    }
    for i in range(cfg.encoder.depth):
        pre = f"enc_blocks.{i}."
        hid = int(ed * cfg.encoder.mlp_ratio)
        state.update({
            pre + "norm1.weight": rnd(ed) + 1.0, pre + "norm1.bias": rnd(ed),
            pre + "norm2.weight": rnd(ed) + 1.0, pre + "norm2.bias": rnd(ed),
            pre + "attn.qkv.weight": rnd(3 * ed, ed), pre + "attn.qkv.bias": rnd(3 * ed),
            pre + "attn.proj.weight": rnd(ed, ed), pre + "attn.proj.bias": rnd(ed),
            pre + "mlp.fc1.weight": rnd(hid, ed), pre + "mlp.fc1.bias": rnd(hid),
            pre + "mlp.fc2.weight": rnd(ed, hid), pre + "mlp.fc2.bias": rnd(ed),
        })
    for i in range(cfg.dec_depth):
        pre = f"dec_blocks.{i}."
        hid = dd * 4
        state.update({
            pre + "norm1.weight": rnd(dd) + 1.0, pre + "norm1.bias": rnd(dd),
            pre + "norm2.weight": rnd(dd) + 1.0, pre + "norm2.bias": rnd(dd),
            pre + "norm3.weight": rnd(dd) + 1.0, pre + "norm3.bias": rnd(dd),
            pre + "norm_y.weight": rnd(dd) + 1.0, pre + "norm_y.bias": rnd(dd),
            pre + "attn.qkv.weight": rnd(3 * dd, dd), pre + "attn.qkv.bias": rnd(3 * dd),
            pre + "attn.proj.weight": rnd(dd, dd), pre + "attn.proj.bias": rnd(dd),
            pre + "cross_attn.projq.weight": rnd(dd, dd), pre + "cross_attn.projq.bias": rnd(dd),
            pre + "cross_attn.projk.weight": rnd(dd, dd), pre + "cross_attn.projk.bias": rnd(dd),
            pre + "cross_attn.projv.weight": rnd(dd, dd), pre + "cross_attn.projv.bias": rnd(dd),
            pre + "cross_attn.proj.weight": rnd(dd, dd), pre + "cross_attn.proj.bias": rnd(dd),
            pre + "mlp.fc1.weight": rnd(hid, dd), pre + "mlp.fc1.bias": rnd(hid),
            pre + "mlp.fc2.weight": rnd(dd, hid), pre + "mlp.fc2.bias": rnd(dd),
        })
    _mast3r_head_state(state, "downstream_head1.", cfg)
    _mast3r_head_state(state, "downstream_head2.", cfg)

    params = convert_mast3r(state, cfg)
    model = TwoViewMatcher(cfg)
    img = jnp.zeros((1, 64, 64, 3))
    init = jax.eval_shape(model.init, jax.random.PRNGKey(0), img, img)["params"]
    assert _shapes(params) == _shapes(init)

    out = model.apply({"params": params}, img, img)
    assert np.isfinite(np.asarray(out["desc0"])).all()
