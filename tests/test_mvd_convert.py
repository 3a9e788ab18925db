"""Torch-parity tests for the Hunyuan3D mvd_std (SDXL) UNet converter.

Builds a torch replica of diffusers' SDXL `UNet2DConditionModel` graph at
tiny dims — per-level transformer depth, linear proj_in/out, 'text_time'
add_embedding — plus the reference-only attention protocol of
`mvd/hunyuan3d_mvd_std_pipeline.py:95-185` (write pass records each attn1's
normed hidden states; read pass attends over [own | recorded]). Converts
the replica's random weights with `convert_mvd_unet` and checks the Flax
`MVDUNet` reproduces the torch forward in plain mode AND through a full
write->read reference round, making mvd_std checkpoint loading a pure
download step.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

import jax.numpy as jnp

from labelany3d_tpu.models.diffusion.convert import convert_mvd, convert_mvd_unet
from labelany3d_tpu.models.diffusion.mvd import MVDUNet, MVDUNetConfig
from labelany3d_tpu.models.diffusion.unet import _num_groups
from tests.test_sd_convert import TGEGLU, TResnet

CFG = MVDUNetConfig(
    in_channels=4,
    out_channels=4,
    widths=(16, 32),
    attn_levels=(1,),
    transformer_depth=(0, 2),
    num_res_blocks=1,
    head_dim=8,
    context_dim=24,
    pooled_dim=12,
    addition_time_embed_dim=8,
    dtype=jnp.float32,
)


class TAttn(tnn.Module):
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


class TXLBasicBlock(tnn.Module):
    """BasicTransformerBlock with the ReferenceOnlyAttnProc behavior on
    attn1: mode 'w' records the normed hidden states, mode 'r' attends
    over [own | recorded]."""

    def __init__(self, ch, ctx_dim, heads):
        super().__init__()
        self.norm1 = tnn.LayerNorm(ch)
        self.attn1 = TAttn(ch, ch, heads)
        self.norm2 = tnn.LayerNorm(ch)
        self.attn2 = TAttn(ch, ctx_dim, heads)
        self.norm3 = tnn.LayerNorm(ch)
        self.ff = tnn.Module()
        self.ff.net = tnn.ModuleList(
            [TGEGLU(ch, ch * 4), tnn.Dropout(0.0), tnn.Linear(ch * 4, ch)]
        )

    def forward(self, x, ctx, mode, refs):
        n1 = self.norm1(x)
        if mode == "w":
            refs.append(n1)
            kv = n1
        elif mode == "r":
            kv = torch.cat([n1, refs.pop(0)], dim=1)
        else:
            kv = n1
        x = x + self.attn1(n1, kv)
        x = x + self.attn2(self.norm2(x), ctx)
        return x + self.ff.net[2](self.ff.net[0](self.norm3(x)))


class TXLTransformer2D(tnn.Module):
    """SDXL Transformer2DModel: use_linear_projection=True, depth blocks."""

    def __init__(self, ch, ctx_dim, heads, depth):
        super().__init__()
        self.norm = tnn.GroupNorm(_num_groups(ch), ch, eps=1e-6)
        self.proj_in = tnn.Linear(ch, ch)
        self.transformer_blocks = tnn.ModuleList(
            [TXLBasicBlock(ch, ctx_dim, heads) for _ in range(depth)]
        )
        self.proj_out = tnn.Linear(ch, ch)

    def forward(self, x, ctx, mode, refs):
        b, c, h, w = x.shape
        res = x
        t = self.norm(x).permute(0, 2, 3, 1).reshape(b, h * w, c)
        t = self.proj_in(t)
        for blk in self.transformer_blocks:
            t = blk(t, ctx, mode, refs)
        t = self.proj_out(t)
        return res + t.reshape(b, h, w, c).permute(0, 3, 1, 2)


def _fourier(t, dim):
    """diffusers Timesteps(flip_sin_to_cos=True, shift=0): [cos | sin]."""
    half = dim // 2
    freqs = torch.exp(-math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half)
    args = t.float()[:, None] * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class TMVDUNet(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        w0 = cfg.widths[0]
        temb = w0 * 4
        self.conv_in = tnn.Conv2d(cfg.in_channels, w0, 3, padding=1)
        self.time_embedding = tnn.Module()
        self.time_embedding.linear_1 = tnn.Linear(w0, temb)
        self.time_embedding.linear_2 = tnn.Linear(temb, temb)
        self.add_embedding = tnn.Module()
        self.add_embedding.linear_1 = tnn.Linear(
            cfg.pooled_dim + 6 * cfg.addition_time_embed_dim, temb)
        self.add_embedding.linear_2 = tnn.Linear(temb, temb)

        def heads(ch):
            return max(1, ch // cfg.head_dim)

        self.down_blocks = tnn.ModuleList()
        c_prev = w0
        for lvl, width in enumerate(cfg.widths):
            blk = tnn.Module()
            blk.resnets = tnn.ModuleList(
                [TResnet(c_prev if i == 0 else width, width, temb)
                 for i in range(cfg.num_res_blocks)]
            )
            if lvl in cfg.attn_levels:
                blk.attentions = tnn.ModuleList(
                    [TXLTransformer2D(width, cfg.context_dim, heads(width),
                                      cfg.transformer_depth[lvl])
                     for _ in range(cfg.num_res_blocks)]
                )
            else:
                blk.attentions = None
            if lvl < len(cfg.widths) - 1:
                ds = tnn.Module()
                ds.conv = tnn.Conv2d(width, width, 3, stride=2, padding=1)
                blk.downsamplers = tnn.ModuleList([ds])
            else:
                blk.downsamplers = None
            self.down_blocks.append(blk)
            c_prev = width

        wl = cfg.widths[-1]
        self.mid_block = tnn.Module()
        self.mid_block.resnets = tnn.ModuleList(
            [TResnet(wl, wl, temb), TResnet(wl, wl, temb)])
        self.mid_block.attentions = tnn.ModuleList(
            [TXLTransformer2D(wl, cfg.context_dim, heads(wl),
                              cfg.transformer_depth[-1])])

        # Up path: skip channel bookkeeping mirrors diffusers.
        skip_chs = [w0]
        for lvl, width in enumerate(cfg.widths):
            skip_chs += [width] * cfg.num_res_blocks
            if lvl < len(cfg.widths) - 1:
                skip_chs.append(width)
        self.up_blocks = tnn.ModuleList()
        c_prev = wl
        for u, lvl in enumerate(reversed(range(len(cfg.widths)))):
            width = cfg.widths[lvl]
            blk = tnn.Module()
            resnets = []
            for i in range(cfg.num_res_blocks + 1):
                c_skip = skip_chs.pop()
                resnets.append(TResnet(c_prev + c_skip, width, temb))
                c_prev = width
            blk.resnets = tnn.ModuleList(resnets)
            if lvl in cfg.attn_levels:
                blk.attentions = tnn.ModuleList(
                    [TXLTransformer2D(width, cfg.context_dim, heads(width),
                                      cfg.transformer_depth[lvl])
                     for _ in range(cfg.num_res_blocks + 1)]
                )
            else:
                blk.attentions = None
            if lvl > 0:
                us = tnn.Module()
                us.conv = tnn.Conv2d(width, width, 3, padding=1)
                blk.upsamplers = tnn.ModuleList([us])
            else:
                blk.upsamplers = None
            self.up_blocks.append(blk)
        self.conv_norm_out = tnn.GroupNorm(_num_groups(w0), w0, eps=1e-5)
        self.conv_out = tnn.Conv2d(w0, cfg.out_channels, 3, padding=1)

    def forward(self, x, timesteps, ctx, pooled, time_ids, mode="plain", refs=None):
        cfg = self.cfg
        refs = list(refs) if refs else []
        out_refs = refs if mode == "r" else []
        temb = self.time_embedding.linear_2(
            F.silu(self.time_embedding.linear_1(_fourier(timesteps, cfg.widths[0]))))
        ids = _fourier(time_ids.reshape(-1), cfg.addition_time_embed_dim)
        ids = ids.reshape(time_ids.shape[0], -1)
        aug = torch.cat([pooled, ids], dim=-1)
        temb = temb + self.add_embedding.linear_2(
            F.silu(self.add_embedding.linear_1(aug)))

        h = self.conv_in(x)
        skips = [h]
        for blk in self.down_blocks:
            for i, res in enumerate(blk.resnets):
                h = res(h, temb)
                if blk.attentions is not None:
                    h = blk.attentions[i](h, ctx, mode, out_refs)
                skips.append(h)
            if blk.downsamplers is not None:
                h = blk.downsamplers[0].conv(h)
                skips.append(h)
        h = self.mid_block.resnets[0](h, temb)
        h = self.mid_block.attentions[0](h, ctx, mode, out_refs)
        h = self.mid_block.resnets[1](h, temb)
        for blk in self.up_blocks:
            for i, res in enumerate(blk.resnets):
                h = torch.cat([h, skips.pop()], dim=1)
                h = res(h, temb)
                if blk.attentions is not None:
                    h = blk.attentions[i](h, ctx, mode, out_refs)
            if blk.upsamplers is not None:
                h = F.interpolate(h, scale_factor=2.0, mode="nearest")
                h = blk.upsamplers[0].conv(h)
        h = F.silu(self.conv_norm_out(h))
        return self.conv_out(h), (out_refs if mode == "w" else [])


def _state_numpy(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


@pytest.fixture(scope="module")
def models():
    torch.manual_seed(0)
    tm = TMVDUNet(CFG).eval()
    params = convert_mvd_unet(_state_numpy(tm), CFG)
    fm = MVDUNet(CFG)
    return tm, fm, params


def _rand(*shape):
    return np.random.default_rng(sum(shape)).normal(size=shape).astype(np.float32)


def test_mvd_unet_plain_matches_torch(models):
    tm, fm, params = models
    x = _rand(2, 12, 8, 4)
    t = np.array([537.0, 221.0], np.float32)
    ctx = _rand(2, 5, CFG.context_dim)
    pooled = _rand(2, CFG.pooled_dim)
    tids = np.tile(np.array([[48.0, 32.0, 0.0, 0.0, 48.0, 32.0]], np.float32), (2, 1))

    with torch.no_grad():
        ref, _ = tm(torch.tensor(x).permute(0, 3, 1, 2), torch.tensor(t),
                    torch.tensor(ctx), torch.tensor(pooled), torch.tensor(tids))
    ours, _ = fm.apply({"params": params}, jnp.asarray(x), jnp.asarray(t) / 1000.0,
                       jnp.asarray(ctx), jnp.asarray(pooled), jnp.asarray(tids))
    np.testing.assert_allclose(
        np.asarray(ours), ref.permute(0, 2, 3, 1).numpy(), rtol=5e-4, atol=5e-4)


def test_mvd_unet_reference_round_matches_torch(models):
    """Full write->read protocol: the read pass on the grid latent must see
    exactly the cond pass's recorded tokens (different spatial sizes)."""
    tm, fm, params = models
    cond = _rand(2, 8, 8, 4)     # reference latent rows (uncond, cond)
    x = _rand(2, 12, 8, 4)       # grid latent rows
    t = np.array([410.0, 410.0], np.float32)
    ctx = _rand(2, 5, CFG.context_dim)
    pooled = _rand(2, CFG.pooled_dim)
    tids = np.tile(np.array([[48.0, 32.0, 0.0, 0.0, 48.0, 32.0]], np.float32), (2, 1))

    with torch.no_grad():
        targs = (torch.tensor(t), torch.tensor(ctx), torch.tensor(pooled),
                 torch.tensor(tids))
        _, trefs = tm(torch.tensor(cond).permute(0, 3, 1, 2), *targs, mode="w")
        ref, _ = tm(torch.tensor(x).permute(0, 3, 1, 2), *targs,
                    mode="r", refs=trefs)

    fargs = (jnp.asarray(t) / 1000.0, jnp.asarray(ctx), jnp.asarray(pooled),
             jnp.asarray(tids))
    _, frefs = fm.apply({"params": params}, jnp.asarray(cond), *fargs, mode="write")
    assert len(frefs) == len(trefs) > 0
    for fr, tr in zip(frefs, trefs):
        np.testing.assert_allclose(np.asarray(fr), tr.numpy(), rtol=5e-4, atol=5e-4)
    ours, _ = fm.apply({"params": params}, jnp.asarray(x), *fargs,
                       mode="read", refs=frefs)
    np.testing.assert_allclose(
        np.asarray(ours), ref.permute(0, 2, 3, 1).numpy(), rtol=5e-4, atol=5e-4)


def test_convert_mvd_assembles_components():
    out = convert_mvd(
        uc_text_emb=np.zeros((1, 7, CFG.context_dim)),
        uc_text_emb_2=np.zeros((1, CFG.pooled_dim)),
        ramping_coefficients=np.linspace(0, 1, 7),
    )
    assert set(out) == {"uc_text_emb", "uc_text_emb_2", "ramping_coefficients"}
    assert out["uc_text_emb"].dtype == np.float32


def test_mvd_config_from_hf_json():
    cfg = MVDUNetConfig.from_hf_json({
        "block_out_channels": [320, 640, 1280],
        "down_block_types": ["DownBlock2D", "CrossAttnDownBlock2D",
                             "CrossAttnDownBlock2D"],
        "transformer_layers_per_block": [1, 2, 10],
        "attention_head_dim": [5, 10, 20],
        "layers_per_block": 2,
        "cross_attention_dim": 2048,
        "projection_class_embeddings_input_dim": 2816,
        "addition_time_embed_dim": 256,
        "in_channels": 4,
        "out_channels": 4,
    })
    assert cfg.widths == (320, 640, 1280)
    assert cfg.attn_levels == (1, 2)
    assert cfg.transformer_depth == (1, 2, 10)
    assert cfg.head_dim == 64
    assert cfg.pooled_dim == 1280


@pytest.mark.heavy
def test_mvd_views_pipeline_tiny():
    """End-to-end tiny run: six deterministic uint8 tiles in the
    [0,2,4,5,3,1]-reordered azimuth order; the novel_views protocol indexes
    them by azimuth."""
    from labelany3d_tpu.models.diffusion.mvd import MVDStdViews

    m = MVDStdViews(tiny=True)
    rgba = np.random.default_rng(0).integers(0, 255, (40, 40, 4), dtype=np.uint8)
    views = m.generate_views(rgba, seed=0)
    assert len(views) == 6
    assert all(v.shape == (m.cfg.tile, m.cfg.tile, 3) and v.dtype == np.uint8
               for v in views)
    again = m.generate_views(rgba, seed=0)
    assert all(np.array_equal(a, b) for a, b in zip(views, again))
    # generate() serves cached views by azimuth
    assert np.array_equal(m.generate(rgba, 0.0, 120.0), views[2])
    assert np.array_equal(m.generate(rgba, 0.0, 300.0), views[5])
