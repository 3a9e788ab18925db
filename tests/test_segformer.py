"""SegFormer semantic head parity vs the transformers implementation."""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from labelany3d_tpu.models.segformer import (  # noqa: E402
    SegFormerConfig,
    SegFormer,
    SegformerForeground,
    convert_segformer,
)


def _tiny_pair():
    hf_cfg = transformers.SegformerConfig(
        num_encoder_blocks=2, depths=[1, 1], sr_ratios=[2, 1],
        hidden_sizes=[8, 16], patch_sizes=[7, 3], strides=[4, 2],
        num_attention_heads=[1, 2], mlp_ratios=[2, 2],
        decoder_hidden_size=16, num_labels=6,
        drop_path_rate=0.0, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, classifier_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    oracle = transformers.SegformerForSemanticSegmentation(hf_cfg).eval()
    # exercise non-trivial BatchNorm running stats
    oracle.decode_head.batch_norm.running_mean.normal_(0.0, 0.5)
    oracle.decode_head.batch_norm.running_var.uniform_(0.5, 2.0)
    cfg = SegFormerConfig.tiny_test()
    params = convert_segformer(
        {k: v.numpy() for k, v in oracle.state_dict().items()}, cfg
    )
    return oracle, cfg, params


def test_segformer_matches_transformers():
    oracle, cfg, params = _tiny_pair()
    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, 3, 32, 48)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(pixel_values=torch.from_numpy(img)).logits.numpy()
    model = SegFormer(cfg)
    out = model.apply({"params": params}, jnp.asarray(img.transpose(0, 2, 3, 1)))
    # ours is NHWC
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, atol=3e-5, rtol=1e-4
    )


def test_segformer_foreground_filter():
    from labelany3d_tpu.utils.logging import reset_warnings

    reset_warnings()
    id2label = {0: "wall", 1: "chair", 2: "floor", 3: "person", 4: "sky", 5: "car"}
    fg = SegformerForeground(
        SegFormerConfig.tiny_test(), id2label=id2label, input_size=32
    )
    assert set(fg.thing_ids.tolist()) == {1, 3, 5}
    rng = np.random.default_rng(0)
    image = (rng.uniform(size=(40, 56, 3)) * 255).astype(np.uint8)
    mask = fg.foreground(image)
    assert mask.shape == (40, 56) and mask.dtype == bool
    cls = fg.semantic(image)
    np.testing.assert_array_equal(mask, np.isin(cls, [1, 3, 5]))


def test_ade20k_stuff_overrides_match_reference():
    """The reference's my_stuff/my_thing adjustments
    (model_wrappers.py:91-119) survive name normalization: both the
    detectron2 comma forms and the HF short names resolve correctly."""
    from labelany3d_tpu.models.segformer import ADE20K_STUFF_NAMES, _norm_label

    for demoted in ("window ", "door", "curtain", "mirror", "fence",
                    "stairs", "step, stair", "column, pillar",
                    "screen door, screen",
                    "bannister, banister, balustrade, balusters, handrail"):
        assert _norm_label(demoted) in ADE20K_STUFF_NAMES, demoted
    # HF short names of the same classes
    for demoted_hf in ("windowpane", "railing", "screen door", "bannister"):
        assert _norm_label(demoted_hf) in ADE20K_STUFF_NAMES, demoted_hf
    for promoted in ("plant", "tent", "crt screen", "cradle", "blanket, cover"):
        assert _norm_label(promoted) not in ADE20K_STUFF_NAMES, promoted


def test_ade20k_id2label_thing_split_nontrivial():
    """With the shipped ADE20K-150 id2label the filter must keep a real
    thing/stuff split (the advisor's round-2 no-op regression)."""
    from labelany3d_tpu.models.segformer import (
        ADE20K_ID2LABEL,
        thing_ids_from_id2label,
    )

    assert len(ADE20K_ID2LABEL) == 150
    things = thing_ids_from_id2label(ADE20K_ID2LABEL)
    assert 60 < len(things) < 150
    names = {ADE20K_ID2LABEL[int(i)] for i in things}
    # canonical things survive, canonical stuff doesn't
    for t in ("person", "car", "chair", "bed ", "sofa", "plant", "tent"):
        assert t in names, t
    for s in ("wall", "sky", "floor", "road", "windowpane", "railing",
              "stairs", "door"):
        assert s not in names, s
