"""SAM segmenter parity vs the transformers implementation.

Oracle: a randomly-initialized `transformers.SamModel` at a tiny config
(the module the reference's EntityV2/CropFormer role maps onto for released
SAM checkpoints); its state_dict converts by rename and the mask logits +
IoU predictions must match.
"""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from labelany3d_tpu.models.sam import (  # noqa: E402
    SamAutoSegmentation,
    SamConfig,
    SamCore,
    convert_sam,
)


def _tiny_pair():
    hf_cfg = transformers.SamConfig(
        vision_config=dict(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
            image_size=64, patch_size=8, window_size=4,
            global_attn_indexes=[1], output_channels=16, mlp_ratio=4.0,
            num_pos_feats=8,
        ),
        prompt_encoder_config=dict(
            hidden_size=16, image_size=64, patch_size=8,
            mask_input_channels=4,
        ),
        mask_decoder_config=dict(
            hidden_size=16, num_hidden_layers=2, num_attention_heads=2,
            mlp_dim=32, iou_head_hidden_dim=16,
        ),
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    oracle = transformers.SamModel(hf_cfg).eval()
    cfg = SamConfig.tiny_test(dtype=jnp.float32)
    params = convert_sam(
        {k: v.numpy() for k, v in oracle.state_dict().items()}, cfg
    )
    return oracle, cfg, params


def test_sam_matches_transformers():
    oracle, cfg, params = _tiny_pair()
    rng = np.random.default_rng(0)
    img = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
    # two prompt groups x two points (one fg, one bg) in input-frame pixels
    pts = np.array([[[[12.0, 20.0], [40.0, 8.0]],
                     [[50.0, 50.0], [10.0, 60.0]]]], np.float32)
    labs = np.array([[[1, 0], [1, 1]]], np.int64)

    with torch.no_grad():
        ref = oracle(
            pixel_values=torch.from_numpy(img),
            input_points=torch.from_numpy(pts),
            input_labels=torch.from_numpy(labs),
            multimask_output=True,
        )

    model = SamCore(cfg)
    out_masks, out_iou = model.apply(
        {"params": params}, jnp.asarray(img.transpose(0, 2, 3, 1)),
        jnp.asarray(pts), jnp.asarray(labs, jnp.int32),
    )
    np.testing.assert_allclose(
        np.asarray(out_iou), ref.iou_scores.numpy(), atol=3e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_masks), ref.pred_masks.numpy(), atol=3e-4, rtol=1e-3
    )


def test_sam_single_mask_output():
    oracle, cfg, params = _tiny_pair()
    rng = np.random.default_rng(1)
    img = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
    pts = np.array([[[[32.0, 32.0]]]], np.float32)
    labs = np.array([[[1]]], np.int64)
    with torch.no_grad():
        ref = oracle(
            pixel_values=torch.from_numpy(img),
            input_points=torch.from_numpy(pts),
            input_labels=torch.from_numpy(labs),
            multimask_output=False,
        )
    model = SamCore(cfg)
    masks, iou = model.apply(
        {"params": params}, jnp.asarray(img.transpose(0, 2, 3, 1)),
        jnp.asarray(pts), jnp.asarray(labs, jnp.int32),
        multimask_output=False,
    )
    assert masks.shape[2] == 1
    np.testing.assert_allclose(
        np.asarray(masks), ref.pred_masks.numpy(), atol=3e-4, rtol=1e-3
    )


def test_sam_auto_segmentation_runs():
    """Grid-prompt automatic mask generation: shape/NMS contract (random
    weights; content meaningless but the machinery must hold)."""
    from labelany3d_tpu.utils.logging import reset_warnings

    reset_warnings()
    seg = SamAutoSegmentation(
        SamConfig.tiny_test(), points_per_side=4,
        pred_iou_thresh=-1e9, min_area_frac=0.0,
    )
    rng = np.random.default_rng(0)
    image = (rng.uniform(size=(48, 72, 3)) * 255).astype(np.uint8)
    masks = seg.segment(image)
    assert isinstance(masks, list)
    for m in masks:
        assert m.shape == (48, 72) and m.dtype == bool
    # NMS: no two kept masks overlap above the threshold
    for i in range(len(masks)):
        for j in range(i + 1, len(masks)):
            a, b = masks[i], masks[j]
            inter = np.logical_and(a, b).sum()
            union = a.sum() + b.sum() - inter
            if union > 0:
                assert inter / union <= seg.nms_iou + 1e-6


def test_sam_auto_segmentation_chunked_matches_single_call():
    """The chunked prompt decode (prompt_chunk < P, with pad on the last
    chunk) must produce the same masks as one full-batch decoder call."""
    from labelany3d_tpu.utils.logging import reset_warnings

    rng = np.random.default_rng(1)
    image = (rng.uniform(size=(40, 64, 3)) * 255).astype(np.uint8)
    outs = []
    for chunk in (16, 6):  # 6 does not divide 16 prompts -> padded tail
        reset_warnings()
        seg = SamAutoSegmentation(
            SamConfig.tiny_test(), points_per_side=4,
            pred_iou_thresh=-1e9, stability_thresh=0.0, min_area_frac=0.0,
            prompt_chunk=chunk, seed=3,
        )
        outs.append(seg.segment(image))
    a, b = outs
    assert len(a) == len(b) and len(a) >= 1
    for ma, mb in zip(a, b):
        np.testing.assert_array_equal(ma, mb)
