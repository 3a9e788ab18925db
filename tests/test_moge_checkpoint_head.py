"""Torch-parity test for the checkpoint-faithful MoGe head + converter.

Builds a torch replica of the reference head architecture
(`moge_model.py:23-141` — our own construction, same module graph and
state-dict names as the release), converts its random weights with
`convert_moge_head`, and checks the flax head reproduces the torch forward.
This is the gate that makes round-2 weight conversion a pure name-mapping
exercise.
"""

import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

import jax.numpy as jnp

from labelany3d_tpu.models.convert import convert_moge_head
from labelany3d_tpu.models.moge import MoGeCheckpointHead, MoGeConfig
from labelany3d_tpu.models.vit import ViTConfig

CFG = MoGeConfig(
    backbone=ViTConfig.tiny_test(out_indices=(0, 1)),
    head_style="reference",
    dim_proj=16,
    dim_upsample=(8, 8),
    num_res_blocks=1,
    last_res_blocks=1,
    last_conv_channels=8,
    last_conv_size=1,
    output_mask=True,
    split_head=True,
    dtype=jnp.float32,
)
DIM_IN = 16  # per-level token width fed to the head


class TorchResBlock(tnn.Module):
    def __init__(self, c_in, c_out, hidden):
        super().__init__()
        self.layers = tnn.Sequential(
            tnn.GroupNorm(1, c_in),
            tnn.ReLU(),
            tnn.Conv2d(c_in, hidden, 3, padding=1, padding_mode="replicate"),
            tnn.GroupNorm(max(hidden // 32, 1), hidden),
            tnn.ReLU(),
            tnn.Conv2d(hidden, c_out, 3, padding=1, padding_mode="replicate"),
        )
        self.skip_connection = (
            tnn.Conv2d(c_in, c_out, 1) if c_in != c_out else tnn.Identity()
        )

    def forward(self, x):
        return self.layers(x) + self.skip_connection(x)


class TorchHead(tnn.Module):
    """Same module graph / state-dict names as the reference Head."""

    def __init__(self, cfg, dim_in, n_levels):
        super().__init__()
        self.projects = tnn.ModuleList(
            [tnn.Conv2d(dim_in, cfg.dim_proj, 1) for _ in range(n_levels)]
        )
        chans = [cfg.dim_proj] + list(cfg.dim_upsample[:-1])
        self.upsample_blocks = tnn.ModuleList(
            [
                tnn.Sequential(
                    tnn.Sequential(
                        tnn.ConvTranspose2d(c_in + 2, c_out, 2, stride=2),
                        tnn.Conv2d(c_out, c_out, 3, padding=1, padding_mode="replicate"),
                    ),
                    *(TorchResBlock(c_out, c_out, c_out) for _ in range(cfg.num_res_blocks)),
                )
                for c_in, c_out in zip(chans, cfg.dim_upsample)
            ]
        )
        self.output_block = tnn.ModuleList(
            [
                tnn.Sequential(
                    tnn.Conv2d(cfg.dim_upsample[-1] + 2, cfg.last_conv_channels, 3,
                               padding=1, padding_mode="replicate"),
                    *(TorchResBlock(cfg.last_conv_channels, cfg.last_conv_channels,
                                    cfg.last_conv_channels)
                      for _ in range(cfg.last_res_blocks)),
                    tnn.ReLU(),
                    tnn.Conv2d(cfg.last_conv_channels, d, cfg.last_conv_size,
                               padding=cfg.last_conv_size // 2),
                )
                for d in ([3, 1] if cfg.split_head else [4])
            ]
        )

    def forward(self, hiddens, grid, out_hw):
        gh, gw = grid
        img_h, img_w = out_hw
        aspect = img_w / img_h
        x = torch.stack(
            [
                proj(h.permute(0, 2, 1).reshape(h.shape[0], h.shape[2], gh, gw))
                for proj, h in zip(self.projects, hiddens)
            ],
            dim=1,
        ).sum(dim=1)

        def uv(hh, ww):
            sx = aspect / (1 + aspect**2) ** 0.5
            sy = 1 / (1 + aspect**2) ** 0.5
            u = torch.linspace(-sx * (ww - 1) / ww, sx * (ww - 1) / ww, ww)
            v = torch.linspace(-sy * (hh - 1) / hh, sy * (hh - 1) / hh, hh)
            uu, vv = torch.meshgrid(u, v, indexing="xy")
            g = torch.stack([uu, vv], dim=0)[None]
            return g.expand(x.shape[0], -1, -1, -1)

        for block in self.upsample_blocks:
            x = torch.cat([x, uv(x.shape[-2], x.shape[-1])], dim=1)
            x = block(x)
        x = F.interpolate(x, (img_h, img_w), mode="bilinear", align_corners=False)
        x = torch.cat([x, uv(img_h, img_w)], dim=1)
        return torch.cat([blk(x) for blk in self.output_block], dim=1)


@pytest.mark.parametrize("gh,gw,img_h,img_w", [(4, 4, 32, 32), (4, 6, 32, 48)])
@pytest.mark.parametrize("last_res_blocks", [1, 0])
def test_checkpoint_head_matches_torch_replica(gh, gw, img_h, img_w,
                                               last_res_blocks):
    # The rectangular case exercises the aspect-dependent view-plane UV
    # spans (geometry_torch.py:45-46) in every concat site.
    # last_res_blocks=0 is the PRODUCTION epilogue shape (vitl config):
    # it takes the merged block-diagonal out-conv fast path in
    # MoGeCheckpointHead.
    cfg = dataclasses.replace(CFG, last_res_blocks=last_res_blocks)
    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    b = 2
    n_levels = len(cfg.backbone.out_indices)

    replica = TorchHead(cfg, DIM_IN, n_levels).eval()
    hiddens_np = [rng.normal(size=(b, gh * gw, DIM_IN)).astype(np.float32)
                  for _ in range(n_levels)]

    with torch.no_grad():
        ref = replica(
            [torch.from_numpy(h) for h in hiddens_np], (gh, gw), (img_h, img_w)
        ).numpy().transpose(0, 2, 3, 1)  # NCHW -> NHWC

    state = {"head." + k: v.numpy() for k, v in replica.state_dict().items()}
    params = convert_moge_head(state, cfg)

    head = MoGeCheckpointHead(cfg)
    out = head.apply(
        {"params": params},
        [jnp.asarray(h) for h in hiddens_np], (gh, gw), (img_h, img_w),
    )
    out = np.asarray(out)
    assert out.shape == ref.shape == (b, img_h, img_w, 4)
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("in_hw,out_hw", [((16, 16), (28, 28)),   # 7/4: the
                                          # production 296->518 tap pattern
                                          ((12, 20), (30, 44)),   # rect, odd
                                          ((8, 8), (16, 16))])    # exact 2x
def test_resize_bilinear_pad_matches_torch(in_hw, out_hw):
    """`_resize_bilinear_pad` == F.interpolate(align_corners=False) + 1px
    replicate pad, bit-near, at non-integer ratios (the head parity tests
    above only exercise exact-2x resizes)."""
    from labelany3d_tpu.models.moge import _resize_bilinear_pad

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, *in_hw, 5)).astype(np.float32)
    got = np.asarray(_resize_bilinear_pad(jnp.asarray(x), out_hw))
    with torch.no_grad():
        ref = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), out_hw,
                            mode="bilinear", align_corners=False)
        ref = F.pad(ref, (1, 1, 1, 1), mode="replicate")
        ref = ref.permute(0, 2, 3, 1).numpy()
    assert got.shape == ref.shape
    # atol: f32 lerp-ordering noise (x0*(1-w)+x1*w vs torch's form).
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-4)


def test_checkpoint_head_param_tree_initializable():
    """Random init of the flax head produces exactly the converted tree
    structure (guards against name/shape drift breaking conversion)."""
    import jax

    cfg = MoGeConfig.tiny_reference_test()
    from labelany3d_tpu.models.moge import MoGeModel

    model = MoGeModel(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]
    head = params["head"]
    n_levels = len(cfg.backbone.out_indices)
    for i in range(n_levels):
        assert f"project{i}" in head
    for i in range(len(cfg.dim_upsample)):
        assert f"up{i}_deconv" in head and f"up{i}_conv" in head
    assert "out0_conv_out" in head and "out1_conv_out" in head
    out = model.apply({"params": params}, jnp.zeros((2, 32, 32, 3)))
    assert out["points"].shape == (2, 32, 32, 3)
    assert out["mask"].shape == (2, 32, 32)
