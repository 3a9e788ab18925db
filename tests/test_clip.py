"""CLIP text/vision encoder parity vs the transformers implementation.

The oracle is a randomly-initialized `transformers.CLIPTextModelWithProjection`
/ `CLIPVisionModelWithProjection` (the exact module the reference's
diffusion stack conditions through, `src/model_wrappers.py:638-662`); its
state_dict converts by rename and the forward must match. The BPE
tokenizer is checked against `transformers.CLIPTokenizer` built from the
same vocab/merges files.
"""

import json

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from labelany3d_tpu.models.clip import (  # noqa: E402
    CLIPTextConfig,
    CLIPTextEncoder,
    CLIPVisionConfig,
    CLIPVisionEncoder,
    convert_clip_text,
    convert_clip_vision,
)


def test_clip_text_matches_transformers():
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=64, hidden_size=32, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=16, projection_dim=24,
        eos_token_id=63, bos_token_id=62, hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    oracle = transformers.CLIPTextModelWithProjection(hf_cfg).eval()

    ids = np.array([[62, 5, 9, 11, 30, 63, 63, 63],
                    [62, 40, 2, 63, 63, 63, 63, 63]], np.int64)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(ids))

    cfg = CLIPTextConfig(
        vocab_size=64, width=32, depth=2, num_heads=2, max_len=16,
        eos_token_id=63, projection_dim=24, dtype=jnp.float32,
    )
    model = CLIPTextEncoder(cfg)
    params = convert_clip_text(
        {k: v.numpy() for k, v in oracle.state_dict().items()}, cfg
    )
    out = model.apply({"params": params}, jnp.asarray(ids, jnp.int32))

    np.testing.assert_allclose(
        np.asarray(out["last_hidden"]), ref.last_hidden_state.numpy(),
        atol=2e-5, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["text_embeds"]), ref.text_embeds.numpy(),
        atol=2e-5, rtol=1e-4,
    )


def test_clip_vision_matches_transformers():
    hf_cfg = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=2, image_size=32, patch_size=8,
        projection_dim=16, hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    oracle = transformers.CLIPVisionModelWithProjection(hf_cfg).eval()

    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(img))

    cfg = CLIPVisionConfig(
        image_size=32, patch_size=8, width=32, depth=2, num_heads=2,
        projection_dim=16, dtype=jnp.float32,
    )
    model = CLIPVisionEncoder(cfg)
    params = convert_clip_vision(
        {k: v.numpy() for k, v in oracle.state_dict().items()}, cfg
    )
    out = model.apply({"params": params}, jnp.asarray(img.transpose(0, 2, 3, 1)))

    np.testing.assert_allclose(
        np.asarray(out["tokens"]), ref.last_hidden_state.numpy(),
        atol=2e-5, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["image_embeds"]), ref.image_embeds.numpy(),
        atol=2e-5, rtol=1e-4,
    )


def _toy_vocab_files(tmp_path):
    """A small but real BPE vocabulary covering ascii lowercase words."""
    import labelany3d_tpu.data.bpe as bpe

    alphabet = [c for c in "abcdefghijklmnopqrstuvwxyz"]
    vocab = {}
    for c in alphabet:
        vocab[c] = len(vocab)
        vocab[c + "</w>"] = len(vocab)
    merges = [("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o</w>"),
              ("w", "o"), ("r", "l"), ("wo", "rl"), ("worl", "d</w>")]
    for a, b in merges:
        vocab[a + b] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    vocab_path = tmp_path / "vocab.json"
    merges_path = tmp_path / "merges.txt"
    vocab_path.write_text(json.dumps(vocab))
    merges_path.write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges)
    )
    return str(tmp_path), vocab


def test_bpe_matches_transformers_tokenizer(tmp_path):
    from labelany3d_tpu.data.bpe import CLIPTokenizer

    path, vocab = _toy_vocab_files(tmp_path)
    ours = CLIPTokenizer.from_files(path)
    theirs = transformers.CLIPTokenizer(
        vocab_file=f"{path}/vocab.json", merges_file=f"{path}/merges.txt"
    )
    for text in ["hello world", "hello", "abc xyz hello", "HELLO  World "]:
        ref = theirs(text)["input_ids"]
        got = ours.encode(text)
        assert got == ref, (text, got, ref)


def test_bpe_fixed_length_padding(tmp_path):
    from labelany3d_tpu.data.bpe import CLIPTokenizer

    path, _ = _toy_vocab_files(tmp_path)
    tok = CLIPTokenizer.from_files(path)
    ids = tok("hello world", length=12)
    assert len(ids) == 12
    assert ids[0] == tok.sot
    assert tok.eot in ids
    assert all(i == tok.pad for i in ids[ids.index(tok.eot) + 1 :])
    # truncation keeps a trailing EOT
    long = tok("hello " * 40, length=8)
    assert len(long) == 8 and long[-1] == tok.eot


def test_hash_tokenizer_fallback():
    from labelany3d_tpu.data.bpe import HashTokenizer, load_tokenizer

    tok = load_tokenizer(None)
    assert isinstance(tok, HashTokenizer) and tok.is_fallback
    a = tok("a photo of a chair", 77)
    b = tok("a photo of a chair", 77)
    assert a == b and len(a) == 77
    assert a != tok("a photo of a car", 77)


def test_text_conditioner_shapes():
    from labelany3d_tpu.models.diffusion.pipelines import TextConditioner
    from labelany3d_tpu.utils.logging import reset_warnings

    reset_warnings()
    tc = TextConditioner.for_context_dim(16)
    ctx = tc.embed("a chair")
    assert ctx.shape == (1, tc.cfg.max_len, 16)
    # cache hit returns the identical array
    assert tc.embed("a chair") is ctx
