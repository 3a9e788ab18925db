"""InvSR noise-predictor parity vs a torch replica with diffusers naming.

Replica mirrors InvSR's TimeAwareEncoder (AttnDownBlock2D levels + UNet mid
block; `external/InvSR/src/diffusers/models/autoencoders/vae.py:185`,
`autoencoder_kl.py:512`): group norms at eps 1e-6, time-conditioned
resnets, residual group-norm attention, asymmetric-padded downsample.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from labelany3d_tpu.models.diffusion.noise_predictor import (  # noqa: E402
    NoisePredictor,
    NoisePredictorConfig,
    convert_noise_predictor,
)

CFG = NoisePredictorConfig.tiny_test()


def _groups(ch):
    return min(CFG.norm_num_groups, ch)


class TResnet(tnn.Module):
    def __init__(self, c_in, c_out, temb):
        super().__init__()
        self.norm1 = tnn.GroupNorm(_groups(c_in), c_in, eps=1e-6)
        self.conv1 = tnn.Conv2d(c_in, c_out, 3, padding=1)
        self.time_emb_proj = tnn.Linear(temb, c_out)
        self.norm2 = tnn.GroupNorm(_groups(c_out), c_out, eps=1e-6)
        self.conv2 = tnn.Conv2d(c_out, c_out, 3, padding=1)
        self.conv_shortcut = tnn.Conv2d(c_in, c_out, 1) if c_in != c_out else None

    def forward(self, x, temb):
        h = self.conv1(F.silu(self.norm1(x)))
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        skip = x if self.conv_shortcut is None else self.conv_shortcut(x)
        return skip + h


class TAttn(tnn.Module):
    def __init__(self, ch, head_dim):
        super().__init__()
        self.heads = max(ch // head_dim, 1)
        self.group_norm = tnn.GroupNorm(_groups(ch), ch, eps=1e-6)
        self.to_q = tnn.Linear(ch, ch)
        self.to_k = tnn.Linear(ch, ch)
        self.to_v = tnn.Linear(ch, ch)
        self.to_out = tnn.ModuleList([tnn.Linear(ch, ch)])

    def forward(self, x):
        b, c, hh, ww = x.shape
        t = self.group_norm(x).flatten(2).transpose(1, 2)
        hd = c // self.heads

        def split(z):
            return z.reshape(b, -1, self.heads, hd).transpose(1, 2)

        q, k, v = split(self.to_q(t)), split(self.to_k(t)), split(self.to_v(t))
        a = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(hd), dim=-1)
        o = (a @ v).transpose(1, 2).reshape(b, -1, c)
        o = self.to_out[0](o).transpose(1, 2).reshape(b, c, hh, ww)
        return x + o


class TDownBlock(tnn.Module):
    def __init__(self, c_in, c_out, layers, temb, head_dim, has_ds):
        super().__init__()
        self.resnets = tnn.ModuleList(
            [TResnet(c_in if j == 0 else c_out, c_out, temb) for j in range(layers)]
        )
        self.attentions = tnn.ModuleList(
            [TAttn(c_out, head_dim) for _ in range(layers)]
        )
        self.downsamplers = None
        if has_ds:
            ds = tnn.Module()
            ds.conv = tnn.Conv2d(c_out, c_out, 3, stride=2, padding=0)
            self.downsamplers = tnn.ModuleList([ds])

    def forward(self, x, temb):
        for r, a in zip(self.resnets, self.attentions):
            x = a(r(x, temb))
        if self.downsamplers is not None:
            x = F.pad(x, (0, 1, 0, 1))
            x = self.downsamplers[0].conv(x)
        return x


class TNoisePredictor(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        w = cfg.widths
        te = tnn.Module()
        te.linear_1 = tnn.Linear(max(128, w[0]), cfg.temb_channels)
        te.linear_2 = tnn.Linear(cfg.temb_channels, cfg.temb_channels)
        self.time_embedding = te
        self.conv_in = tnn.Conv2d(cfg.in_channels, w[0], 3, padding=1)
        self.down_blocks = tnn.ModuleList([
            TDownBlock(w[max(i - 1, 0)], w[i], cfg.layers_per_block[i],
                       cfg.temb_channels, cfg.attention_head_dim,
                       has_ds=(i != len(w) - 1))
            for i in range(len(w))
        ])
        mid = tnn.Module()
        mid.resnets = tnn.ModuleList([
            TResnet(w[-1], w[-1], cfg.temb_channels),
            TResnet(w[-1], w[-1], cfg.temb_channels),
        ])
        mid.attentions = tnn.ModuleList([TAttn(w[-1], cfg.attention_head_dim)])
        self.mid_block = mid
        self.conv_norm_out = tnn.GroupNorm(_groups(w[-1]), w[-1], eps=1e-6)
        self.conv_out = tnn.Conv2d(w[-1], 2 * cfg.latent_channels, 3, padding=1)
        self.cfg = cfg

    def forward(self, image01, timestep):
        x = 2.0 * image01 - 1.0
        tdim = max(128, self.cfg.widths[0])
        half = tdim // 2
        freqs = torch.exp(
            -math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half
        )
        args = timestep[:, None].float() * freqs[None]
        temb = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
        temb = self.time_embedding.linear_2(F.silu(self.time_embedding.linear_1(temb)))
        h = self.conv_in(x)
        for blk in self.down_blocks:
            h = blk(h, temb)
        h = self.mid_block.resnets[0](h, temb)
        h = self.mid_block.attentions[0](h)
        h = self.mid_block.resnets[1](h, temb)
        h = self.conv_out(F.silu(self.conv_norm_out(h)))
        mean, logvar = h.chunk(2, dim=1)
        return mean, logvar


def test_noise_predictor_matches_torch_replica():
    torch.manual_seed(0)
    oracle = TNoisePredictor(CFG).eval()
    state = {k: v.numpy() for k, v in oracle.state_dict().items()}
    params = convert_noise_predictor(state, CFG)
    model = NoisePredictor(CFG)

    rng = np.random.default_rng(0)
    img = rng.uniform(size=(2, 16, 16, 3)).astype(np.float32)
    t = np.array([250.0, 100.0], np.float32)
    with torch.no_grad():
        ref_mean, ref_logvar = oracle(
            torch.from_numpy(img.transpose(0, 3, 1, 2)), torch.from_numpy(t)
        )
    out = model.apply({"params": params}, jnp.asarray(img), jnp.asarray(t))
    np.testing.assert_allclose(
        np.asarray(out["mean"]), ref_mean.numpy().transpose(0, 2, 3, 1),
        atol=2e-5, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["logvar"]), ref_logvar.numpy().transpose(0, 2, 3, 1),
        atol=2e-5, rtol=1e-4,
    )
    # encoder.* prefixed checkpoints (the released file nests everything
    # under NoisePredictor.encoder) convert too
    params2 = convert_noise_predictor(
        {"encoder." + k: v for k, v in state.items()}, CFG,
    )
    out2 = model.apply({"params": params2}, jnp.asarray(img), jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(out2["mean"]), np.asarray(out["mean"]))


@pytest.mark.heavy
def test_invsr_uses_predicted_noise():
    """InvSREnhance with a noise predictor draws its inversion noise from
    the predictor posterior (machinery contract; random weights)."""
    from labelany3d_tpu.models.diffusion import InvSREnhance
    from labelany3d_tpu.utils.logging import reset_warnings

    reset_warnings()
    rng = np.random.default_rng(0)
    img = (rng.uniform(size=(16, 16, 3)) * 255).astype(np.uint8)
    with_np = InvSREnhance(tiny=True, image_size=32, noise_predictor=True)
    out = with_np.enhance(img)
    assert out.shape == (64, 64, 3)
    assert with_np._np_params is not None
    without = InvSREnhance(tiny=True, image_size=32)
    out2 = without.enhance(img)
    assert out2.shape == (64, 64, 3)
    # different noise source -> different hallucinated details
    assert not np.array_equal(out, out2)
