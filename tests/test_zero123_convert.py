"""Zero123 assembled-converter tests.

The released `ashawkey/zero123-xl-diffusers` pipeline has four weighted
components (unet with 8-ch conv_in, vae, CLIP vision tower,
clip_camera_projection — `external/dreamgaussian/zero123.py:80-170`).
`convert_zero123` maps all four in one call; these tests verify the
cc-projection numerically, the 8-channel UNet against the diffusers-shaped
torch replica, and the full assembly through `Zero123NovelView.set_params`
(tiny shapes, finite generate()).
"""

import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn

import jax.numpy as jnp

from labelany3d_tpu.models.diffusion.convert import convert_sd_unet, convert_zero123
from labelany3d_tpu.models.diffusion.unet import UNet2D, UNetConfig

from test_sd_convert import TUNet, TVAE


def test_cc_projection_parity():
    torch.manual_seed(1)
    emb = 16
    lin = tnn.Linear(emb + 4, emb)
    x_img = torch.randn(2, emb)
    x_cam = torch.randn(2, 4)
    with torch.no_grad():
        ref = lin(torch.cat([x_img, x_cam], dim=-1)).numpy()

    cc_state = {("proj." + k): v.numpy() for k, v in lin.state_dict().items()}
    trees = convert_zero123(unet_state=None, cc_state=cc_state)
    from labelany3d_tpu.models.diffusion.pipelines import _CCProjection

    out = _CCProjection(emb).apply(
        {"params": trees["cc"]}, jnp.asarray(x_img.numpy()),
        jnp.asarray(x_cam.numpy()))
    np.testing.assert_allclose(np.asarray(out)[:, 0], ref, atol=1e-5, rtol=1e-5)


def test_zero123_unet_8ch_parity():
    """The widened (4 noise + 4 image-latent) conv_in converts and matches
    the diffusers-shaped replica."""
    torch.manual_seed(0)
    cfg = UNetConfig(
        in_channels=8, out_channels=4, widths=(16, 32), attn_levels=(1,),
        num_res_blocks=1, num_heads=2, context_dim=16, dtype=jnp.float32)
    replica = TUNet(cfg).eval()
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 16, 16, 8)).astype(np.float32)
    ctx = rng.normal(size=(1, 1, 16)).astype(np.float32)
    t = np.asarray([400.0], np.float32)
    with torch.no_grad():
        ref = replica(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(t),
            torch.from_numpy(ctx)).numpy().transpose(0, 2, 3, 1)
    state = {k: v.numpy() for k, v in replica.state_dict().items()}
    params = convert_sd_unet(state, cfg)
    out = UNet2D(cfg).apply({"params": params}, jnp.asarray(x),
                            jnp.asarray(t / 1000.0), jnp.asarray(ctx))
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-4, rtol=1e-3)


@pytest.mark.slow
def test_zero123_assembled_set_params():
    """convert_zero123 on synthetic component state dicts installs into
    Zero123NovelView and generate() runs with the converted weights."""
    transformers = pytest.importorskip("transformers")

    from labelany3d_tpu.models.diffusion.pipelines import Zero123NovelView
    from labelany3d_tpu.models.diffusion.vae import VAEConfig

    nv = Zero123NovelView(tiny=True, image_size=64, steps=2)

    torch.manual_seed(0)
    unet_replica = TUNet(nv.unet_cfg).eval()
    vae_replica = TVAE(widths=tuple(nv.vae_cfg.widths), lpb=nv.vae_cfg.layers_per_block,
                       latent=nv.vae_cfg.latent_channels).eval()
    hf_cfg = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=2, image_size=32, patch_size=8,
        projection_dim=16, hidden_act="quick_gelu")
    vision_oracle = transformers.CLIPVisionModelWithProjection(hf_cfg).eval()
    cc = tnn.Linear(16 + 4, nv.unet_cfg.context_dim)

    vcfg = dataclasses.replace(nv.vision_cfg, dtype=jnp.float32)
    trees = convert_zero123(
        unet_state={k: v.numpy() for k, v in unet_replica.state_dict().items()},
        vae_state={k: v.numpy() for k, v in vae_replica.state_dict().items()},
        vision_state={k: v.numpy() for k, v in vision_oracle.state_dict().items()},
        cc_state={("proj." + k): v.numpy() for k, v in cc.state_dict().items()},
        unet_cfg=nv.unet_cfg, vae_cfg=nv.vae_cfg, vision_cfg=vcfg)
    assert set(trees) == {"unet", "vae", "vision", "cc"}
    nv.set_params(trees)
    nv.init_params()

    rgba = np.zeros((48, 48, 4), np.uint8)
    rgba[8:40, 8:40] = [180, 90, 40, 255]
    out = nv.generate(rgba, d_elev=10.0, d_azim=-10.0, seed=0)
    assert out.shape == (64, 64, 3)
    assert np.isfinite(out.astype(np.float32)).all()
