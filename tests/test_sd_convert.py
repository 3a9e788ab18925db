"""Torch-parity test for the diffusers-name SD UNet converter.

Builds a torch replica of diffusers' `UNet2DConditionModel` graph at tiny
dims (our own construction with diffusers state-dict names — resnets /
attentions / transformer_blocks / ff.net GEGLU / down-up samplers), converts
its random weights with `convert_sd_unet`, and checks the flax `UNet2D`
reproduces the torch forward. Makes round-2 SD checkpoint loading a pure
download step.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

import jax.numpy as jnp

from labelany3d_tpu.models.diffusion.convert import convert_sd_unet
from labelany3d_tpu.models.diffusion.unet import UNet2D, UNetConfig, _num_groups

CFG = UNetConfig(
    in_channels=4,
    out_channels=4,
    widths=(16, 32),
    attn_levels=(0,),
    num_res_blocks=2,
    num_heads=2,
    context_dim=12,   # != model channels, catches cross-attn dim bugs
    dtype=jnp.float32,
)


class TResnet(tnn.Module):
    def __init__(self, c_in, c_out, temb_ch):
        super().__init__()
        self.norm1 = tnn.GroupNorm(_num_groups(c_in), c_in, eps=1e-5)
        self.conv1 = tnn.Conv2d(c_in, c_out, 3, padding=1)
        self.time_emb_proj = tnn.Linear(temb_ch, c_out)
        self.norm2 = tnn.GroupNorm(_num_groups(c_out), c_out, eps=1e-5)
        self.conv2 = tnn.Conv2d(c_out, c_out, 3, padding=1)
        self.conv_shortcut = tnn.Conv2d(c_in, c_out, 1) if c_in != c_out else None

    def forward(self, x, temb):
        h = self.conv1(F.silu(self.norm1(x)))
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        skip = x if self.conv_shortcut is None else self.conv_shortcut(x)
        return skip + h


class TAttention(tnn.Module):
    def __init__(self, ch, kv_dim, heads):
        super().__init__()
        self.heads = heads
        self.to_q = tnn.Linear(ch, ch, bias=False)
        self.to_k = tnn.Linear(kv_dim, ch, bias=False)
        self.to_v = tnn.Linear(kv_dim, ch, bias=False)
        self.to_out = tnn.ModuleList([tnn.Linear(ch, ch)])

    def forward(self, x, kv):
        b, n, c = x.shape
        hd = c // self.heads

        def split(t):
            return t.reshape(b, -1, self.heads, hd).transpose(1, 2)

        q, k, v = split(self.to_q(x)), split(self.to_k(kv)), split(self.to_v(kv))
        a = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(hd), dim=-1)
        out = (a @ v).transpose(1, 2).reshape(b, n, c)
        return self.to_out[0](out)


class TGEGLU(tnn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = tnn.Linear(dim, inner * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)


class TBasicBlock(tnn.Module):
    def __init__(self, ch, ctx_dim, heads):
        super().__init__()
        self.norm1 = tnn.LayerNorm(ch)
        self.attn1 = TAttention(ch, ch, heads)
        self.norm2 = tnn.LayerNorm(ch)
        self.attn2 = TAttention(ch, ctx_dim, heads)
        self.norm3 = tnn.LayerNorm(ch)
        self.ff = tnn.Module()
        self.ff.net = tnn.ModuleList(
            [TGEGLU(ch, ch * 4), tnn.Dropout(0.0), tnn.Linear(ch * 4, ch)]
        )

    def forward(self, x, ctx):
        x = x + self.attn1(self.norm1(x), self.norm1(x))
        x = x + self.attn2(self.norm2(x), ctx)
        h = self.ff.net[0](self.norm3(x))
        return x + self.ff.net[2](h)


class TTransformer2D(tnn.Module):
    def __init__(self, ch, ctx_dim, heads):
        super().__init__()
        self.norm = tnn.GroupNorm(_num_groups(ch), ch, eps=1e-6)
        self.proj_in = tnn.Conv2d(ch, ch, 1)
        self.transformer_blocks = tnn.ModuleList([TBasicBlock(ch, ctx_dim, heads)])
        self.proj_out = tnn.Conv2d(ch, ch, 1)

    def forward(self, x, ctx):
        b, c, h, w = x.shape
        res = x
        t = self.proj_in(self.norm(x))
        t = t.permute(0, 2, 3, 1).reshape(b, h * w, c)
        t = self.transformer_blocks[0](t, ctx)
        t = t.reshape(b, h, w, c).permute(0, 3, 1, 2)
        return res + self.proj_out(t)


class TDownBlock(tnn.Module):
    def __init__(self, c_in, c_out, temb_ch, cfg, has_attn, has_ds):
        super().__init__()
        self.resnets = tnn.ModuleList(
            [TResnet(c_in if i == 0 else c_out, c_out, temb_ch)
             for i in range(cfg.num_res_blocks)]
        )
        self.attentions = tnn.ModuleList(
            [TTransformer2D(c_out, cfg.context_dim, cfg.num_heads)
             for _ in range(cfg.num_res_blocks)]
        ) if has_attn else None
        if has_ds:
            ds = tnn.Module()
            ds.conv = tnn.Conv2d(c_out, c_out, 3, stride=2, padding=1)
            self.downsamplers = tnn.ModuleList([ds])
        else:
            self.downsamplers = None


class TUpBlock(tnn.Module):
    def __init__(self, c_skips, c_out, temb_ch, cfg, has_attn, has_us):
        super().__init__()
        self.resnets = tnn.ModuleList(
            [TResnet(c_prev + c_skip, c_out, temb_ch)
             for c_prev, c_skip in c_skips]
        )
        self.attentions = tnn.ModuleList(
            [TTransformer2D(c_out, cfg.context_dim, cfg.num_heads)
             for _ in range(len(c_skips))]
        ) if has_attn else None
        if has_us:
            us = tnn.Module()
            us.conv = tnn.Conv2d(c_out, c_out, 3, padding=1)
            self.upsamplers = tnn.ModuleList([us])
        else:
            self.upsamplers = None


class TMid(tnn.Module):
    def __init__(self, ch, temb_ch, cfg):
        super().__init__()
        self.resnets = tnn.ModuleList(
            [TResnet(ch, ch, temb_ch), TResnet(ch, ch, temb_ch)]
        )
        self.attentions = tnn.ModuleList(
            [TTransformer2D(ch, cfg.context_dim, cfg.num_heads)]
        )


class TUNet(tnn.Module):
    """diffusers-shaped SD UNet replica (state-dict names match)."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        w = list(cfg.widths)
        temb_ch = w[0] * 4
        self.conv_in = tnn.Conv2d(cfg.in_channels, w[0], 3, padding=1)
        self.time_embedding = tnn.Module()
        self.time_embedding.linear_1 = tnn.Linear(w[0], temb_ch)
        self.time_embedding.linear_2 = tnn.Linear(temb_ch, temb_ch)

        self.down_blocks = tnn.ModuleList()
        ch = w[0]
        self.skip_chans = [ch]
        for lvl, width in enumerate(w):
            blk = TDownBlock(ch, width, temb_ch, cfg,
                             lvl in cfg.attn_levels, lvl < len(w) - 1)
            self.down_blocks.append(blk)
            ch = width
            self.skip_chans += [width] * cfg.num_res_blocks
            if lvl < len(w) - 1:
                self.skip_chans.append(width)

        self.mid_block = TMid(w[-1], temb_ch, cfg)

        self.up_blocks = tnn.ModuleList()
        skip_chans = list(self.skip_chans)
        prev = w[-1]
        for u, lvl in enumerate(reversed(range(len(w)))):
            width = w[lvl]
            pairs = []
            for i in range(cfg.num_res_blocks + 1):
                pairs.append((prev if i == 0 else width, skip_chans.pop()))
            self.up_blocks.append(
                TUpBlock(pairs, width, temb_ch, cfg, lvl in cfg.attn_levels, lvl > 0)
            )
            prev = width

        self.conv_norm_out = tnn.GroupNorm(_num_groups(w[0]), w[0], eps=1e-5)
        self.conv_out = tnn.Conv2d(w[0], cfg.out_channels, 3, padding=1)

    def time_proj(self, timesteps):
        # diffusers Timesteps(flip_sin_to_cos=True, downscale_freq_shift=0)
        half = self.cfg.widths[0] // 2
        exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half
        emb = timesteps[:, None].float() * torch.exp(exponent)[None]
        return torch.cat([torch.cos(emb), torch.sin(emb)], dim=-1)

    def forward(self, x, timesteps, ctx):
        temb = self.time_embedding.linear_2(
            F.silu(self.time_embedding.linear_1(self.time_proj(timesteps)))
        )
        h = self.conv_in(x)
        skips = [h]
        for blk in self.down_blocks:
            for i, res in enumerate(blk.resnets):
                h = res(h, temb)
                if blk.attentions is not None:
                    h = blk.attentions[i](h, ctx)
                skips.append(h)
            if blk.downsamplers is not None:
                h = blk.downsamplers[0].conv(h)
                skips.append(h)
        h = self.mid_block.resnets[0](h, temb)
        h = self.mid_block.attentions[0](h, ctx)
        h = self.mid_block.resnets[1](h, temb)
        for blk in self.up_blocks:
            for i, res in enumerate(blk.resnets):
                h = torch.cat([h, skips.pop()], dim=1)
                h = res(h, temb)
                if blk.attentions is not None:
                    h = blk.attentions[i](h, ctx)
            if blk.upsamplers is not None:
                h = F.interpolate(h, scale_factor=2.0, mode="nearest")
                h = blk.upsamplers[0].conv(h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


# ---------------------------------------------------------------- VAE ----

class TVAERes(tnn.Module):
    def __init__(self, c_in, c_out):
        super().__init__()
        self.norm1 = tnn.GroupNorm(_num_groups(c_in), c_in, eps=1e-6)
        self.conv1 = tnn.Conv2d(c_in, c_out, 3, padding=1)
        self.norm2 = tnn.GroupNorm(_num_groups(c_out), c_out, eps=1e-6)
        self.conv2 = tnn.Conv2d(c_out, c_out, 3, padding=1)
        self.conv_shortcut = tnn.Conv2d(c_in, c_out, 1) if c_in != c_out else None

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        return (x if self.conv_shortcut is None else self.conv_shortcut(x)) + h


class TVAEAttn(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.group_norm = tnn.GroupNorm(_num_groups(ch), ch, eps=1e-6)
        self.to_q = tnn.Linear(ch, ch)
        self.to_k = tnn.Linear(ch, ch)
        self.to_v = tnn.Linear(ch, ch)
        self.to_out = tnn.ModuleList([tnn.Linear(ch, ch)])

    def forward(self, x):
        b, c, h, w = x.shape
        t = self.group_norm(x).permute(0, 2, 3, 1).reshape(b, h * w, c)
        q, k, v = self.to_q(t), self.to_k(t), self.to_v(t)
        a = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(c), dim=-1)
        t = self.to_out[0](a @ v)
        return x + t.reshape(b, h, w, c).permute(0, 3, 1, 2)


class TVAEMid(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.resnets = tnn.ModuleList([TVAERes(ch, ch), TVAERes(ch, ch)])
        self.attentions = tnn.ModuleList([TVAEAttn(ch)])

    def forward(self, x):
        return self.resnets[1](self.attentions[0](self.resnets[0](x)))


class TVAE(tnn.Module):
    """diffusers-shaped AutoencoderKL replica (state-dict names match)."""

    def __init__(self, widths=(8, 16), lpb=1, latent=4):
        super().__init__()
        self.widths, self.lpb = widths, lpb
        self.encoder = tnn.Module()
        e = self.encoder
        e.conv_in = tnn.Conv2d(3, widths[0], 3, padding=1)
        e.down_blocks = tnn.ModuleList()
        ch = widths[0]
        for i, w in enumerate(widths):
            blk = tnn.Module()
            blk.resnets = tnn.ModuleList(
                [TVAERes(ch if r == 0 else w, w) for r in range(lpb)]
            )
            if i < len(widths) - 1:
                ds = tnn.Module()
                ds.conv = tnn.Conv2d(w, w, 3, stride=2, padding=0)
                blk.downsamplers = tnn.ModuleList([ds])
            else:
                blk.downsamplers = None
            e.down_blocks.append(blk)
            ch = w
        e.mid_block = TVAEMid(widths[-1])
        e.conv_norm_out = tnn.GroupNorm(_num_groups(widths[-1]), widths[-1], eps=1e-6)
        e.conv_out = tnn.Conv2d(widths[-1], 2 * latent, 3, padding=1)
        self.quant_conv = tnn.Conv2d(2 * latent, 2 * latent, 1)

        self.post_quant_conv = tnn.Conv2d(latent, latent, 1)
        self.decoder = tnn.Module()
        d = self.decoder
        d.conv_in = tnn.Conv2d(latent, widths[-1], 3, padding=1)
        d.mid_block = TVAEMid(widths[-1])
        d.up_blocks = tnn.ModuleList()
        ch = widths[-1]
        for j, w in enumerate(reversed(widths)):
            blk = tnn.Module()
            blk.resnets = tnn.ModuleList(
                [TVAERes(ch if r == 0 else w, w) for r in range(lpb + 1)]
            )
            if j < len(widths) - 1:
                us = tnn.Module()
                us.conv = tnn.Conv2d(w, w, 3, padding=1)
                blk.upsamplers = tnn.ModuleList([us])
            else:
                blk.upsamplers = None
            d.up_blocks.append(blk)
            ch = w
        d.conv_norm_out = tnn.GroupNorm(_num_groups(widths[0]), widths[0], eps=1e-6)
        d.conv_out = tnn.Conv2d(widths[0], 3, 3, padding=1)

    def encode(self, x):
        h = self.encoder.conv_in(x)
        for blk in self.encoder.down_blocks:
            for res in blk.resnets:
                h = res(h)
            if blk.downsamplers is not None:
                h = blk.downsamplers[0].conv(F.pad(h, (0, 1, 0, 1)))
        h = self.encoder.mid_block(h)
        h = self.encoder.conv_out(F.silu(self.encoder.conv_norm_out(h)))
        return self.quant_conv(h)

    def decode(self, z):
        h = self.decoder.conv_in(self.post_quant_conv(z))
        h = self.decoder.mid_block(h)
        for blk in self.decoder.up_blocks:
            for res in blk.resnets:
                h = res(h)
            if blk.upsamplers is not None:
                h = F.interpolate(h, scale_factor=2.0, mode="nearest")
                h = blk.upsamplers[0].conv(h)
        return self.decoder.conv_out(F.silu(self.decoder.conv_norm_out(h)))


def test_sd_vae_matches_torch_replica():
    from labelany3d_tpu.models.diffusion.convert import convert_sd_vae
    from labelany3d_tpu.models.diffusion.vae import AutoencoderKL, VAEConfig

    torch.manual_seed(1)
    rng = np.random.default_rng(1)
    cfg = VAEConfig(widths=(8, 16), layers_per_block=1, dtype=jnp.float32)
    replica = TVAE(widths=cfg.widths, lpb=cfg.layers_per_block).eval()

    img = rng.normal(size=(2, 16, 16, 3)).astype(np.float32)
    with torch.no_grad():
        moments = replica.encode(torch.from_numpy(img.transpose(0, 3, 1, 2)))
        mean_ref = moments.numpy().transpose(0, 2, 3, 1)[..., :4]
        rec_ref = replica.decode(
            torch.from_numpy(mean_ref.transpose(0, 3, 1, 2))
        ).numpy().transpose(0, 2, 3, 1)

    state = {k: v.numpy() for k, v in replica.state_dict().items()}
    vae = AutoencoderKL(cfg)
    vae.params = convert_sd_vae(state, cfg)

    from labelany3d_tpu.models.diffusion.vae import SD_LATENT_SCALE

    lat = np.asarray(vae.encode(jnp.asarray(img)))
    np.testing.assert_allclose(lat / SD_LATENT_SCALE, mean_ref, atol=3e-4, rtol=1e-3)
    rec = np.asarray(vae.decode(jnp.asarray(mean_ref) * SD_LATENT_SCALE))
    np.testing.assert_allclose(rec, rec_ref, atol=3e-4, rtol=1e-3)


def test_sd_unet_matches_torch_replica():
    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    replica = TUNet(CFG).eval()

    b, hw = 2, 16
    x = rng.normal(size=(b, hw, hw, CFG.in_channels)).astype(np.float32)
    ctx = rng.normal(size=(b, 5, CFG.context_dim)).astype(np.float32)
    timesteps = np.asarray([37.0, 512.0], np.float32)

    with torch.no_grad():
        ref = replica(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            torch.from_numpy(timesteps),
            torch.from_numpy(ctx),
        ).numpy().transpose(0, 2, 3, 1)

    state = {k: v.numpy() for k, v in replica.state_dict().items()}
    params = convert_sd_unet(state, CFG)

    model = UNet2D(CFG)
    out = model.apply(
        {"params": params},
        jnp.asarray(x), jnp.asarray(timesteps / 1000.0), jnp.asarray(ctx),
    )
    out = np.asarray(out)
    assert out.shape == ref.shape == (b, hw, hw, CFG.out_channels)
    np.testing.assert_allclose(out, ref, atol=3e-4, rtol=1e-3)
