"""Aux subsystems: scenes, panoptic conversion, 3D IoU, profiling, convert."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from labelany3d_tpu.data.panoptic import convert_panoptic_item, panoptic_rgb_to_ids
from labelany3d_tpu.data.rle import rle_decode
from labelany3d_tpu.data.scenes import ArrayScene, get_scene, register_scene_type
from labelany3d_tpu.export.iou3d import box3d_iou, mean_iou3d
from labelany3d_tpu.geometry import convert_box_vertices
from labelany3d_tpu.models.convert import convert_dinov2_vit
from labelany3d_tpu.models.vit import ViT, ViTConfig
from labelany3d_tpu.utils.profiling import StageTimer


def test_scene_factory(tmp_path):
    from PIL import Image

    img = np.random.default_rng(0).integers(0, 255, (32, 48, 3)).astype(np.uint8)
    path = tmp_path / "img.png"
    Image.fromarray(img).save(path)
    scene = get_scene("InTheWild", {"img_path": str(path)})
    assert scene.image_np.shape == (32, 48, 3)
    np.testing.assert_allclose(scene.c2w, np.eye(4))
    arr = get_scene("Array", {"image": img})
    assert isinstance(arr, ArrayScene)
    with pytest.raises(KeyError):
        get_scene("Nope", {})
    register_scene_type("Custom", lambda image: ArrayScene(image))
    assert get_scene("Custom", {"image": img}).image_np.shape == (32, 48, 3)


def test_panoptic_conversion():
    # Build an RGB panoptic mask: two segments (ids 5 and 300).
    h, w = 40, 50
    ids = np.zeros((h, w), np.int32)
    ids[5:20, 5:25] = 5
    ids[25:38, 30:48] = 300
    rgb = np.stack([ids % 256, (ids // 256) % 256, ids // 65536], axis=-1).astype(np.uint8)
    np.testing.assert_array_equal(panoptic_rgb_to_ids(rgb), ids)

    segments = [
        {"id": 5, "category_id": 62, "isthing": 1},
        {"id": 300, "category_id": 3, "isthing": 1},
        {"id": 0, "category_id": 184, "isthing": 0},  # stuff -> dropped
    ]
    annos = convert_panoptic_item(rgb, segments, image_id=7)
    assert len(annos) == 2
    a = annos[0]
    assert a["category_id"] == 62 and a["image_id"] == 7
    assert a["bbox"] == [5.0, 5.0, 19.0, 14.0]
    mask = rle_decode({"size": a["segmentation"]["size"],
                       "counts": a["segmentation"]["counts"]})
    np.testing.assert_array_equal(mask, ids == 5)


def test_box3d_iou_identical_and_disjoint():
    c = convert_box_vertices(jnp.array([0.0, 0.0, 5.0]), jnp.array([2.0, 1.0, 3.0]), 0.3)
    assert float(box3d_iou(c, c)) == pytest.approx(1.0, abs=0.02)
    c2 = convert_box_vertices(jnp.array([10.0, 0.0, 5.0]), jnp.array([2.0, 1.0, 3.0]), 0.3)
    assert float(box3d_iou(c, c2)) == pytest.approx(0.0, abs=1e-6)


def test_box3d_iou_known_overlap():
    # Axis-aligned unit cubes offset by half along x: inter 0.5, union 1.5.
    a = convert_box_vertices(jnp.zeros(3), jnp.ones(3), 0.0)
    b = convert_box_vertices(jnp.array([0.5, 0.0, 0.0]), jnp.ones(3), 0.0)
    assert float(box3d_iou(a, b, grid=48)) == pytest.approx(1 / 3, abs=0.02)
    # rotation-aware: rotating b by 90 deg about y leaves the cube identical
    b90 = convert_box_vertices(jnp.array([0.5, 0.0, 0.0]), jnp.ones(3), np.pi / 2)
    assert float(box3d_iou(a, b90, grid=48)) == pytest.approx(1 / 3, abs=0.02)


def test_mean_iou3d_batched():
    a = jnp.stack([
        convert_box_vertices(jnp.zeros(3), jnp.ones(3), 0.0),
        convert_box_vertices(jnp.zeros(3), jnp.ones(3), 0.0),
    ])
    b = jnp.stack([
        convert_box_vertices(jnp.zeros(3), jnp.ones(3), 0.0),
        convert_box_vertices(jnp.array([10.0, 0, 0]), jnp.ones(3), 0.0),
    ])
    assert float(mean_iou3d(a, b)) == pytest.approx(0.5, abs=0.02)


def test_stage_timer():
    t = StageTimer()
    with t.measure("depth", items=8):
        pass
    with t.measure("depth", items=8):
        pass
    assert t.stats["depth"].calls == 2 and t.stats["depth"].items == 16
    assert "depth" in t.report()


def _torch_dinov2_tiny(state, x, cfg):
    """Minimal torch DINOv2-style forward mirroring our ViT semantics."""
    import torch
    import torch.nn.functional as F

    tt = {k: torch.tensor(v) for k, v in state.items()}
    b = x.shape[0]
    patches = F.conv2d(torch.tensor(x).permute(0, 3, 1, 2),
                       tt["patch_embed.proj.weight"], tt["patch_embed.proj.bias"],
                       stride=cfg.patch_size)
    bb, c, gh, gw = patches.shape
    tokens = patches.flatten(2).transpose(1, 2)  # (B, N, C)
    pos = tt["pos_embed"]
    tokens = tokens + pos[:, 1:]
    cls = tt["cls_token"] + pos[:, :1]
    h = torch.cat([cls.expand(b, 1, c), tokens], dim=1)
    for i in range(cfg.depth):
        pre = f"blocks.{i}."
        hn = F.layer_norm(h, (c,), tt[pre + "norm1.weight"], tt[pre + "norm1.bias"])
        qkv = hn @ tt[pre + "attn.qkv.weight"].T + tt[pre + "attn.qkv.bias"]
        q, k, v = qkv.chunk(3, dim=-1)
        nh = cfg.num_heads
        hd = c // nh

        def heads(t):
            return t.view(b, -1, nh, hd).transpose(1, 2)

        attn = F.scaled_dot_product_attention(heads(q), heads(k), heads(v))
        attn = attn.transpose(1, 2).reshape(b, -1, c)
        attn = attn @ tt[pre + "attn.proj.weight"].T + tt[pre + "attn.proj.bias"]
        h = h + attn * tt[pre + "ls1.gamma"]
        hn = F.layer_norm(h, (c,), tt[pre + "norm2.weight"], tt[pre + "norm2.bias"])
        m = hn @ tt[pre + "mlp.fc1.weight"].T + tt[pre + "mlp.fc1.bias"]
        m = F.gelu(m)
        m = m @ tt[pre + "mlp.fc2.weight"].T + tt[pre + "mlp.fc2.bias"]
        h = h + m * tt[pre + "ls2.gamma"]
    h = F.layer_norm(h, (c,), tt["norm.weight"], tt["norm.bias"])
    return h[:, 1:].numpy()


def test_convert_dinov2_numerical_parity(rng):
    cfg = ViTConfig(width=32, depth=2, num_heads=2, patch_size=8,
                    dtype=jnp.float32, layerscale_init=1e-5)
    gh = gw = 3
    c = cfg.width
    hid = int(c * cfg.mlp_ratio)

    def rnd(*shape):
        return rng.normal(0, 0.05, shape).astype(np.float32)

    state = {
        "patch_embed.proj.weight": rnd(c, 3, 8, 8),
        "patch_embed.proj.bias": rnd(c),
        "pos_embed": rnd(1, 1 + gh * gw, c),
        "cls_token": rnd(1, 1, c),
        "norm.weight": 1 + rnd(c), "norm.bias": rnd(c),
    }
    for i in range(cfg.depth):
        pre = f"blocks.{i}."
        state.update({
            pre + "norm1.weight": 1 + rnd(c), pre + "norm1.bias": rnd(c),
            pre + "norm2.weight": 1 + rnd(c), pre + "norm2.bias": rnd(c),
            pre + "attn.qkv.weight": rnd(3 * c, c), pre + "attn.qkv.bias": rnd(3 * c),
            pre + "attn.proj.weight": rnd(c, c), pre + "attn.proj.bias": rnd(c),
            pre + "mlp.fc1.weight": rnd(hid, c), pre + "mlp.fc1.bias": rnd(hid),
            pre + "mlp.fc2.weight": rnd(c, hid), pre + "mlp.fc2.bias": rnd(c),
            pre + "ls1.gamma": rnd(c) + 1.0, pre + "ls2.gamma": rnd(c) + 1.0,
        })

    params = convert_dinov2_vit(state, cfg, (gh, gw))
    x = rng.uniform(0, 1, (2, gh * 8, gw * 8, 3)).astype(np.float32)

    model = ViT(cfg)
    init_params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    # converted tree matches the model's structure & shapes
    conv_shapes = jax.tree_util.tree_map(lambda a: np.asarray(a).shape, params)
    init_shapes = jax.tree_util.tree_map(lambda a: a.shape, init_params)
    assert conv_shapes == init_shapes

    ours = np.asarray(model.apply({"params": params}, jnp.asarray(x))["tokens"])
    ref = _torch_dinov2_tiny(state, x, cfg)
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-3)
