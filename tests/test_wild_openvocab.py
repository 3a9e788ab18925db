"""Wild-mode open-vocab adapters (CLIPSeg foreground filter, CLIP tagger).

Drives the transformers-backed adapters with tiny random-weight configs and
a minimal character-level CLIP BPE tokenizer (no network / no checkpoints),
validating the adapter plumbing and the reference's exact threshold/OR
semantics (`model_wrappers.py:549-582`). Real checkpoints plug in via
`model_path` at deployment.
"""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from labelany3d_tpu.data.wild import (
    ClipSegForeground,
    ClipTagger,
    WildInstanceSource,
    ColorSegmentation,
    combine_prompt_maps,
)


def _tiny_tokenizer(tmp_path):
    """Character-level CLIP tokenizer: every ascii letter, bare + </w>."""
    from transformers import CLIPTokenizer

    chars = list("abcdefghijklmnopqrstuvwxyz0123456789")
    vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1}
    for c in chars:
        vocab[c] = len(vocab)
        vocab[c + "</w>"] = len(vocab)
    vf = tmp_path / "vocab.json"
    vf.write_text(json.dumps(vocab))
    mf = tmp_path / "merges.txt"
    mf.write_text("#version: 0.2\n")
    return CLIPTokenizer(str(vf), str(mf), model_max_length=77)


def _tiny_clipseg(tmp_path):
    from transformers import (
        CLIPSegConfig,
        CLIPSegForImageSegmentation,
        CLIPSegProcessor,
        CLIPSegTextConfig,
        CLIPSegVisionConfig,
        ViTImageProcessor,
    )

    cfg = CLIPSegConfig.from_text_vision_configs(
        CLIPSegTextConfig(
            vocab_size=80, hidden_size=16, intermediate_size=32,
            num_hidden_layers=2, num_attention_heads=2, projection_dim=16,
        ),
        CLIPSegVisionConfig(
            hidden_size=16, intermediate_size=32, num_hidden_layers=2,
            num_attention_heads=2, image_size=32, patch_size=16,
        ),
        projection_dim=16, reduce_dim=8, extract_layers=[0, 1],
        decoder_num_attention_heads=2, decoder_intermediate_size=16,
    )
    torch.manual_seed(0)
    model = CLIPSegForImageSegmentation(cfg)
    proc = CLIPSegProcessor(
        image_processor=ViTImageProcessor(size={"height": 32, "width": 32}),
        tokenizer=_tiny_tokenizer(tmp_path),
    )
    return model, proc


def test_combine_prompt_maps_reference_semantics():
    # 2 bg prompts + 1 fg prompt over a 1x2 map
    maps = np.array([
        [[0.9, 0.2]],   # bg A: pixel0 background
        [[0.3, 0.4]],   # bg B: none
        [[0.05, 0.3]],  # fg: pixel1 foreground (0.3 > 0.1)
    ])
    fg = combine_prompt_maps(maps, n_background=2)
    # pixel0: bg hit (0.9>0.5) and no fg (0.05<0.1) -> background
    # pixel1: no bg hit -> foreground regardless
    assert fg.tolist() == [[False, True]]
    # fg prompt overrides a bg hit
    maps[2, 0, 0] = 0.5
    assert combine_prompt_maps(maps, 2).tolist() == [[True, True]]


def test_clipseg_foreground_runs_tiny(tmp_path):
    model, proc = _tiny_clipseg(tmp_path)
    seg = ClipSegForeground(model=model, processor=proc)
    img = (np.random.default_rng(0).uniform(0, 255, (48, 64, 3))).astype(np.uint8)
    fg = seg.foreground(img)
    assert fg.shape == (48, 64)
    assert fg.dtype == bool


def test_clip_tagger_runs_tiny(tmp_path):
    from transformers import (
        CLIPConfig, CLIPImageProcessor, CLIPModel, CLIPProcessor,
        CLIPTextConfig, CLIPVisionConfig,
    )

    cfg = CLIPConfig.from_text_vision_configs(
        CLIPTextConfig(vocab_size=80, hidden_size=16, intermediate_size=32,
                       num_hidden_layers=2, num_attention_heads=2,
                       projection_dim=16),
        CLIPVisionConfig(hidden_size=16, intermediate_size=32,
                         num_hidden_layers=2, num_attention_heads=2,
                         image_size=32, patch_size=16, projection_dim=16),
        projection_dim=16,
    )
    torch.manual_seed(0)
    model = CLIPModel(cfg)
    proc = CLIPProcessor(
        image_processor=CLIPImageProcessor(
            size={"shortest_edge": 32}, crop_size={"height": 32, "width": 32}
        ),
        tokenizer=_tiny_tokenizer(tmp_path),
    )
    tagger = ClipTagger(model=model, processor=proc, vocabulary=["chair", "car", "sofa"])
    img = np.full((40, 40, 3), 128, np.uint8)
    masks = np.zeros((2, 40, 40), bool)
    masks[0, 5:20, 5:20] = True
    masks[1, 25:39, 10:30] = True
    tags = tagger.tag(img, masks)
    assert len(tags) == 2
    assert all(t in ("chair", "car", "sofa") for t in tags)
    assert tagger.tag(img, np.zeros((0, 40, 40), bool)) == []


def test_wild_source_with_openvocab_backends(tmp_path):
    """Full wild front-end with the CLIPSeg filter in the loop."""
    model, proc = _tiny_clipseg(tmp_path)
    from labelany3d_tpu.data.wild import ConstantTagger

    src = WildInstanceSource(
        ColorSegmentation(min_area=50),
        ClipSegForeground(model=model, processor=proc),
        ConstantTagger(),
    )
    img = np.zeros((64, 64, 3), np.uint8)
    img[:] = 230
    img[10:30, 10:30] = (200, 30, 30)
    img[35:60, 30:60] = (30, 30, 200)
    inst = src.read_instances(img)
    # contract holds regardless of what the random model keeps
    assert inst.masks.shape[1:] == (64, 64)
    assert len(inst.labels) == len(inst.masks) == len(inst.bboxes)
