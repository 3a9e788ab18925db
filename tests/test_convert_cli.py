"""convert_cli end-to-end: torch checkpoint file -> orbax -> loaded params.

Uses the tiny ISNet torch replica from test_saliency (released-checkpoint
names) so the CLI's load -> convert -> save -> load_params loop is
exercised with a real file on disk.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402


def test_convert_cli_isnet_roundtrip(tmp_path):
    from tests.test_saliency import _oracle_pair

    from labelany3d_tpu.models.checkpoints import load_params
    from labelany3d_tpu.models.convert_cli import main
    from labelany3d_tpu.models.saliency import ISNet, ISNetConfig

    oracle, cfg, expect_params = _oracle_pair()
    ckpt = tmp_path / "isnet-general-use.pth"
    torch.save(oracle.state_dict(), ckpt)

    path = main(["isnet", str(ckpt), "--out", str(tmp_path / "ckpts"), "--tiny"])
    assert str(tmp_path / "ckpts") in path

    params = load_params(str(tmp_path / "ckpts"), "isnet")
    assert params is not None
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    model = ISNet(ISNetConfig.tiny_test())
    out_loaded = model.apply({"params": params}, img)[0]
    out_direct = model.apply({"params": expect_params}, img)[0]
    np.testing.assert_allclose(
        np.asarray(out_loaded), np.asarray(out_direct), atol=1e-6
    )


def test_convert_cli_safetensors(tmp_path):
    from safetensors.numpy import save_file

    from tests.test_saliency import _oracle_pair

    from labelany3d_tpu.models.convert_cli import main

    oracle, cfg, _ = _oracle_pair()
    ckpt = tmp_path / "isnet.safetensors"
    save_file({k: v.numpy() for k, v in oracle.state_dict().items()}, str(ckpt))
    path = main(["isnet", str(ckpt), "--out", str(tmp_path / "c2"), "--tiny"])
    assert "isnet" in path


def test_convert_cli_unknown_model():
    from labelany3d_tpu.models.convert_cli import main

    with pytest.raises(SystemExit):
        main(["nope", "x.pt"])


@pytest.mark.heavy
def test_convert_cli_mvd_dir_roundtrip(tmp_path):
    """diffusers-layout mvd_std pipeline dir -> orbax -> MVDStdViews runs
    with the converted UNet (parity of the graph itself is covered by
    tests/test_mvd_convert.py)."""
    import json

    from safetensors.numpy import save_file

    from tests.test_mvd_convert import CFG, TMVDUNet, _state_numpy

    from labelany3d_tpu.models.checkpoints import load_params
    from labelany3d_tpu.models.convert_cli import main
    from labelany3d_tpu.models.diffusion.mvd import MVDStdViews

    torch.manual_seed(1)
    tm = TMVDUNet(CFG).eval()
    root = tmp_path / "mvd_std"
    (root / "unet").mkdir(parents=True)
    save_file(_state_numpy(tm), str(root / "unet" / "diffusion_pytorch_model.safetensors"))
    with open(root / "unet" / "config.json", "w") as f:
        json.dump({
            "block_out_channels": list(CFG.widths),
            "down_block_types": ["DownBlock2D", "CrossAttnDownBlock2D"],
            "transformer_layers_per_block": list(CFG.transformer_depth),
            "attention_head_dim": [w // CFG.head_dim for w in CFG.widths],
            "layers_per_block": CFG.num_res_blocks,
            "cross_attention_dim": CFG.context_dim,
            "projection_class_embeddings_input_dim":
                CFG.pooled_dim + 6 * CFG.addition_time_embed_dim,
            "addition_time_embed_dim": CFG.addition_time_embed_dim,
            "in_channels": CFG.in_channels, "out_channels": CFG.out_channels,
        }, f)
    torch.save(torch.zeros(1, 7, CFG.context_dim), root / "uc_text_emb.pt")
    torch.save(torch.zeros(1, CFG.pooled_dim), root / "uc_text_emb_2.pt")
    with open(root / "model_index.json", "w") as f:
        json.dump({"ramping_coefficients": list(np.linspace(0, 1, 7))}, f)

    path = main(["mvd", str(root), "--out", str(tmp_path / "ckpts"), "--tiny"])
    assert "mvd" in path
    trees = load_params(str(tmp_path / "ckpts"), "mvd")
    assert set(trees) >= {"unet", "uc_text_emb", "uc_text_emb_2",
                          "ramping_coefficients"}

    m = MVDStdViews(tiny=True).set_params(trees)
    rgba = np.random.default_rng(3).integers(0, 255, (24, 24, 4), dtype=np.uint8)
    views = m.generate_views(rgba, seed=0)
    assert len(views) == 6 and views[0].dtype == np.uint8
