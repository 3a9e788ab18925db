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
