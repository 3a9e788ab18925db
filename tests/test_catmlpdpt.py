"""Checkpoint-faithful MASt3R catmlp+dpt head tests.

Tiny end-to-end forward through TwoViewMatcher (reference postprocess
invariants: exp-mode confidences, unit descriptors), align_corners bilinear
oracle vs torch, and converter tree coverage against a torch-shaped
synthetic state dict.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from labelany3d_tpu.models.matcher import (
    CatMLPDPTHead,
    MatcherConfig,
    TwoViewMatcher,
    _resize_bilinear_ac,
)


def test_resize_align_corners_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 5, 7, 3)).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                        scale_factor=2, mode="bilinear", align_corners=True)
    ref = ref.numpy().transpose(0, 2, 3, 1)
    out = np.asarray(_resize_bilinear_ac(jnp.asarray(x), 10, 14))
    np.testing.assert_allclose(out, ref, atol=1e-6)


@pytest.mark.heavy
def test_catmlpdpt_matcher_forward():
    cfg = MatcherConfig.tiny_catmlpdpt_test()
    model = TwoViewMatcher(cfg)
    rng = np.random.default_rng(0)
    img0 = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)), jnp.float32)
    img1 = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img0, img1)["params"]
    out = model.apply({"params": params}, img0, img1)
    assert out["pts3d0"].shape == (1, 64, 64, 3)
    assert out["conf0"].shape == (1, 64, 64)
    assert out["desc0"].shape == (1, 64, 64, cfg.desc_dim)
    assert out["desc_conf0"].shape == (1, 64, 64)
    # reference postprocess invariants
    assert (np.asarray(out["conf0"]) >= cfg.conf_vmin).all()      # 1 + exp(x)
    assert (np.asarray(out["desc_conf0"]) >= cfg.desc_conf_vmin).all()
    norms = np.linalg.norm(np.asarray(out["desc0"]), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)             # unit desc
    # exp point mode: |pts| = expm1(|raw|) >= 0, direction preserved
    assert np.isfinite(np.asarray(out["pts3d0"])).all()


def _mast3r_head_state(state, pre, cfg):
    rng = np.random.default_rng(3)

    def rnd(*s):
        return rng.normal(size=s).astype(np.float32) * 0.02

    ed, dd = cfg.encoder.width, cfg.dec_width
    ld, fd, p = cfg.layer_dims, cfg.feature_dim, cfg.encoder.patch_size

    def conv(name, cin, cout, k, bias=True):
        state[pre + name + ".weight"] = rnd(cout, cin, k, k)
        if bias:
            state[pre + name + ".bias"] = rnd(cout)

    def deconv(name, cin, cout, k):
        state[pre + name + ".weight"] = rnd(cin, cout, k, k)
        state[pre + name + ".bias"] = rnd(cout)

    dims_in = (ed, dd, dd, dd)
    conv("dpt.act_postprocess.0.0", dims_in[0], ld[0], 1)
    deconv("dpt.act_postprocess.0.1", ld[0], ld[0], 4)
    conv("dpt.act_postprocess.1.0", dims_in[1], ld[1], 1)
    deconv("dpt.act_postprocess.1.1", ld[1], ld[1], 2)
    conv("dpt.act_postprocess.2.0", dims_in[2], ld[2], 1)
    conv("dpt.act_postprocess.3.0", dims_in[3], ld[3], 1)
    conv("dpt.act_postprocess.3.1", ld[3], ld[3], 3)
    for i in range(4):
        conv(f"dpt.scratch.layer{i + 1}_rn", ld[i], fd, 3, bias=False)
    for k in range(1, 5):
        for rn in ("resConfUnit1", "resConfUnit2"):
            conv(f"dpt.scratch.refinenet{k}.{rn}.conv1", fd, fd, 3)
            conv(f"dpt.scratch.refinenet{k}.{rn}.conv2", fd, fd, 3)
        conv(f"dpt.scratch.refinenet{k}.out_conv", fd, fd, 1)
    conv("dpt.head.0", fd, fd // 2, 3)
    conv("dpt.head.2", fd // 2, cfg.last_dim, 3)
    conv("dpt.head.4", cfg.last_dim, 4, 1)
    idim = ed + dd
    n_out = (cfg.desc_dim + 1) * p * p
    state[pre + "head_local_features.fc1.weight"] = rnd(4 * idim, idim)
    state[pre + "head_local_features.fc1.bias"] = rnd(4 * idim)
    state[pre + "head_local_features.fc2.weight"] = rnd(n_out, 4 * idim)
    state[pre + "head_local_features.fc2.bias"] = rnd(n_out)


def test_convert_mast3r_full_tree_matches_init():
    """Full-model converter: torch-shaped state dict (croco names, fused
    enc/dec qkv, shared dec_blocks fallback) -> exact TwoViewMatcher tree."""
    from labelany3d_tpu.models.convert import convert_mast3r

    cfg = MatcherConfig.tiny_catmlpdpt_test()
    rng = np.random.default_rng(4)

    def rnd(*s):
        return rng.normal(size=s).astype(np.float32) * 0.02

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
    for i in range(cfg.dec_depth):  # dec_blocks only: dec_blocks2 fallback path
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
    init = model.init(jax.random.PRNGKey(0), img, img)["params"]
    conv_shapes = jax.tree_util.tree_map(lambda a: np.asarray(a).shape, params)
    init_shapes = jax.tree_util.tree_map(lambda a: a.shape, init)
    assert conv_shapes == init_shapes

    out = model.apply({"params": params}, img, img)
    assert out["pts3d0"].shape == (1, 64, 64, 3)


def test_convert_mast3r_head_tree_matches_init():
    from labelany3d_tpu.models.convert import convert_mast3r_head

    cfg = MatcherConfig.tiny_catmlpdpt_test()
    rng = np.random.default_rng(1)

    def rnd(*s):
        return rng.normal(size=s).astype(np.float32) * 0.02

    ed = cfg.encoder.width
    dd = cfg.dec_width
    ld, fd = cfg.layer_dims, cfg.feature_dim
    p = cfg.encoder.patch_size
    state = {}
    pre = "downstream_head1."

    def conv(name, cin, cout, k, bias=True):
        state[pre + name + ".weight"] = rnd(cout, cin, k, k)
        if bias:
            state[pre + name + ".bias"] = rnd(cout)

    def deconv(name, cin, cout, k):
        state[pre + name + ".weight"] = rnd(cin, cout, k, k)
        state[pre + name + ".bias"] = rnd(cout)

    dims_in = (ed, dd, dd, dd)
    conv("dpt.act_postprocess.0.0", dims_in[0], ld[0], 1)
    deconv("dpt.act_postprocess.0.1", ld[0], ld[0], 4)
    conv("dpt.act_postprocess.1.0", dims_in[1], ld[1], 1)
    deconv("dpt.act_postprocess.1.1", ld[1], ld[1], 2)
    conv("dpt.act_postprocess.2.0", dims_in[2], ld[2], 1)
    conv("dpt.act_postprocess.3.0", dims_in[3], ld[3], 1)
    conv("dpt.act_postprocess.3.1", ld[3], ld[3], 3)
    for i in range(4):
        conv(f"dpt.scratch.layer{i + 1}_rn", ld[i], fd, 3, bias=False)
    for k in range(1, 5):
        for rn in ("resConfUnit1", "resConfUnit2"):
            conv(f"dpt.scratch.refinenet{k}.{rn}.conv1", fd, fd, 3)
            conv(f"dpt.scratch.refinenet{k}.{rn}.conv2", fd, fd, 3)
        conv(f"dpt.scratch.refinenet{k}.out_conv", fd, fd, 1)
    conv("dpt.head.0", fd, fd // 2, 3)
    conv("dpt.head.2", fd // 2, cfg.last_dim, 3)
    conv("dpt.head.4", cfg.last_dim, 4, 1)
    idim = ed + dd
    n_out = (cfg.desc_dim + 1) * p * p
    state[pre + "head_local_features.fc1.weight"] = rnd(4 * idim, idim)
    state[pre + "head_local_features.fc1.bias"] = rnd(4 * idim)
    state[pre + "head_local_features.fc2.weight"] = rnd(n_out, 4 * idim)
    state[pre + "head_local_features.fc2.bias"] = rnd(n_out)

    params = convert_mast3r_head(state, cfg)

    # init the head standalone with matching input dims
    head = CatMLPDPTHead(cfg, p)
    gh = 4
    enc = jnp.zeros((1, gh * gh, ed))
    dec = jnp.zeros((1, gh * gh, dd))
    layers = [enc, dec, dec, dec]
    init = head.init(jax.random.PRNGKey(0), layers, enc, dec, (gh, gh), (64, 64))["params"]
    conv_shapes = jax.tree_util.tree_map(lambda a: np.asarray(a).shape, params)
    init_shapes = jax.tree_util.tree_map(lambda a: a.shape, init)
    assert conv_shapes == init_shapes

    out = head.apply({"params": params}, layers, enc, dec, (gh, gh), (64, 64))
    assert out[0].shape == (1, 64, 64, 3)
