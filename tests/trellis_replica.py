"""Torch oracle replicas of the TRELLIS model family (test-only).

Minimal torch reimplementations of the reference modules (state-dict names
and math follow `external/TRELLIS/trellis/models/*` and
`trellis/modules/{transformer,attention,norm}.py`) used to:

  * generate synthetic torch-shaped state dicts (via `.state_dict()`) for
    the converter tests — the names come from real torch module trees, so
    a converter that consumes them consumes the released layout;
  * compute oracle outputs for numerical parity checks against the Flax
    models under converted weights.

Sparse ops are emulated densely (scatter -> conv3d -> gather at active
sites == submanifold conv; mean-pool over present children == spconv
SparseDownsample), which is exact for the shapes used in tests.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# Attention / transformer pieces
# ---------------------------------------------------------------------------


class MultiHeadRMSNorm(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.scale = dim**0.5
        self.gamma = nn.Parameter(torch.ones(heads, dim))

    def forward(self, x):
        return (F.normalize(x.float(), dim=-1) * self.gamma * self.scale).to(x.dtype)


class MultiHeadAttention(nn.Module):
    """Full-attention subset of the reference MultiHeadAttention."""

    def __init__(self, channels, num_heads, ctx_channels=None, type="self",
                 qk_rms_norm=False):
        super().__init__()
        self.channels = channels
        self.num_heads = num_heads
        self.head_dim = channels // num_heads
        self._type = type
        self.qk_rms_norm = qk_rms_norm
        if type == "self":
            self.to_qkv = nn.Linear(channels, channels * 3, bias=True)
        else:
            self.to_q = nn.Linear(channels, channels, bias=True)
            self.to_kv = nn.Linear(ctx_channels or channels, channels * 2, bias=True)
        if qk_rms_norm:
            self.q_rms_norm = MultiHeadRMSNorm(self.head_dim, num_heads)
            self.k_rms_norm = MultiHeadRMSNorm(self.head_dim, num_heads)
        self.to_out = nn.Linear(channels, channels)

    def forward(self, x, context=None, mask=None):
        b, l, _ = x.shape
        if self._type == "self":
            qkv = self.to_qkv(x).reshape(b, l, 3, self.num_heads, self.head_dim)
            q, k, v = qkv.unbind(dim=2)
        else:
            lk = context.shape[1]
            q = self.to_q(x).reshape(b, l, self.num_heads, self.head_dim)
            kv = self.to_kv(context).reshape(b, lk, 2, self.num_heads, self.head_dim)
            k, v = kv.unbind(dim=2)
        if self.qk_rms_norm:
            q = self.q_rms_norm(q)
            k = self.k_rms_norm(k)
        q, k, v = (t.permute(0, 2, 1, 3) for t in (q, k, v))
        attn_mask = None
        if mask is not None:  # (b, Lk) True = keep
            attn_mask = torch.zeros(b, 1, 1, k.shape[2])
            attn_mask = attn_mask.masked_fill(~mask[:, None, None, :], float("-inf"))
        h = F.scaled_dot_product_attention(q, k, v, attn_mask=attn_mask)
        h = h.permute(0, 2, 1, 3).reshape(b, l, self.channels)
        return self.to_out(h)


class FeedForwardNet(nn.Module):
    def __init__(self, channels, mlp_ratio=4.0):
        super().__init__()
        self.mlp = nn.Sequential(
            nn.Linear(channels, int(channels * mlp_ratio)),
            nn.GELU(approximate="tanh"),
            nn.Linear(int(channels * mlp_ratio), channels),
        )

    def forward(self, x):
        return self.mlp(x)


class ModulatedTransformerCrossBlock(nn.Module):
    def __init__(self, channels, ctx_channels, num_heads, mlp_ratio=4.0,
                 share_mod=False, qk_rms_norm=False, qk_rms_norm_cross=False):
        super().__init__()
        self.share_mod = share_mod
        self.norm1 = nn.LayerNorm(channels, elementwise_affine=False, eps=1e-6)
        self.norm2 = nn.LayerNorm(channels, elementwise_affine=True, eps=1e-6)
        self.norm3 = nn.LayerNorm(channels, elementwise_affine=False, eps=1e-6)
        self.self_attn = MultiHeadAttention(channels, num_heads, qk_rms_norm=qk_rms_norm)
        self.cross_attn = MultiHeadAttention(
            channels, num_heads, ctx_channels=ctx_channels, type="cross",
            qk_rms_norm=qk_rms_norm_cross)
        self.mlp = FeedForwardNet(channels, mlp_ratio)
        if not share_mod:
            self.adaLN_modulation = nn.Sequential(
                nn.SiLU(), nn.Linear(channels, 6 * channels, bias=True))

    def forward(self, x, mod, context, mask=None):
        if self.share_mod:
            s_msa, sc_msa, g_msa, s_mlp, sc_mlp, g_mlp = mod.chunk(6, dim=1)
        else:
            s_msa, sc_msa, g_msa, s_mlp, sc_mlp, g_mlp = \
                self.adaLN_modulation(mod).chunk(6, dim=1)
        h = self.norm1(x) * (1 + sc_msa.unsqueeze(1)) + s_msa.unsqueeze(1)
        x = x + self.self_attn(h, mask=mask) * g_msa.unsqueeze(1)
        h = self.norm2(x)
        x = x + self.cross_attn(h, context)
        h = self.norm3(x) * (1 + sc_mlp.unsqueeze(1)) + s_mlp.unsqueeze(1)
        x = x + self.mlp(h) * g_mlp.unsqueeze(1)
        return x


class TransformerBlock(nn.Module):
    """Non-modulated block, ln_affine=False (VAE decoder block)."""

    def __init__(self, channels, num_heads, mlp_ratio=4.0, qk_rms_norm=False):
        super().__init__()
        self.norm1 = nn.LayerNorm(channels, elementwise_affine=False, eps=1e-6)
        self.norm2 = nn.LayerNorm(channels, elementwise_affine=False, eps=1e-6)
        self.attn = MultiHeadAttention(channels, num_heads, qk_rms_norm=qk_rms_norm)
        self.mlp = FeedForwardNet(channels, mlp_ratio)

    def forward(self, x, mask=None):
        x = x + self.attn(self.norm1(x), mask=mask)
        return x + self.mlp(self.norm2(x))


class TimestepEmbedder(nn.Module):
    def __init__(self, hidden_size, frequency_embedding_size=256):
        super().__init__()
        self.mlp = nn.Sequential(
            nn.Linear(frequency_embedding_size, hidden_size, bias=True),
            nn.SiLU(),
            nn.Linear(hidden_size, hidden_size, bias=True),
        )
        self.frequency_embedding_size = frequency_embedding_size

    @staticmethod
    def timestep_embedding(t, dim, max_period=10000):
        half = dim // 2
        freqs = torch.exp(-math.log(max_period)
                          * torch.arange(half, dtype=torch.float32) / half)
        args = t[:, None].float() * freqs[None]
        emb = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
        if dim % 2:
            emb = torch.cat([emb, torch.zeros_like(emb[:, :1])], dim=-1)
        return emb

    def forward(self, t):
        return self.mlp(self.timestep_embedding(t, self.frequency_embedding_size))


def ape_torch(coords, channels):
    """AbsolutePositionEmbedder oracle: (N, D) -> (N, channels)."""
    n, d = coords.shape
    freq_dim = channels // d // 2
    freqs = 1.0 / (10000 ** (torch.arange(freq_dim, dtype=torch.float32) / freq_dim))
    out = torch.outer(coords.reshape(-1).float(), freqs)
    out = torch.cat([torch.sin(out), torch.cos(out)], dim=-1).reshape(n, -1)
    if out.shape[1] < channels:
        out = torch.cat([out, torch.zeros(n, channels - out.shape[1])], dim=-1)
    return out


# ---------------------------------------------------------------------------
# Sparse-structure flow + decoder
# ---------------------------------------------------------------------------


def patchify(x, p):
    b, c = x.shape[:2]
    r = x.shape[2]
    h = r // p
    x = x.reshape(b, c, h, p, h, p, h, p)
    x = x.permute(0, 1, 3, 5, 7, 2, 4, 6).reshape(b, c * p**3, h, h, h)
    return x


def unpatchify(x, p):
    b, cp = x.shape[:2]
    h = x.shape[2]
    c = cp // p**3
    x = x.reshape(b, c, p, p, p, h, h, h)
    x = x.permute(0, 1, 5, 2, 6, 3, 7, 4).reshape(b, c, h * p, h * p, h * p)
    return x


class SparseStructureFlowModelRef(nn.Module):
    def __init__(self, resolution, in_channels, model_channels, cond_channels,
                 out_channels, num_blocks, num_heads, mlp_ratio=4.0,
                 patch_size=1, share_mod=False, qk_rms_norm=False,
                 qk_rms_norm_cross=False):
        super().__init__()
        self.resolution = resolution
        self.patch_size = patch_size
        self.share_mod = share_mod
        self.t_embedder = TimestepEmbedder(model_channels)
        if share_mod:
            self.adaLN_modulation = nn.Sequential(
                nn.SiLU(), nn.Linear(model_channels, 6 * model_channels, bias=True))
        h = resolution // patch_size
        g = torch.meshgrid(*[torch.arange(h)] * 3, indexing="ij")
        coords = torch.stack(g, dim=-1).reshape(-1, 3)
        self.register_buffer("pos_emb", ape_torch(coords, model_channels))
        self.input_layer = nn.Linear(in_channels * patch_size**3, model_channels)
        self.blocks = nn.ModuleList([
            ModulatedTransformerCrossBlock(
                model_channels, cond_channels, num_heads, mlp_ratio,
                share_mod=share_mod, qk_rms_norm=qk_rms_norm,
                qk_rms_norm_cross=qk_rms_norm_cross)
            for _ in range(num_blocks)
        ])
        self.out_layer = nn.Linear(model_channels, out_channels * patch_size**3)

    def forward(self, x, t, cond):
        h = patchify(x, self.patch_size)
        h = h.view(*h.shape[:2], -1).permute(0, 2, 1).contiguous()
        h = self.input_layer(h) + self.pos_emb[None]
        t_emb = self.t_embedder(t)
        if self.share_mod:
            t_emb = self.adaLN_modulation(t_emb)
        for block in self.blocks:
            h = block(h, t_emb, cond)
        h = F.layer_norm(h, h.shape[-1:])
        h = self.out_layer(h)
        h = h.permute(0, 2, 1).view(
            h.shape[0], h.shape[2], *[self.resolution // self.patch_size] * 3)
        return unpatchify(h, self.patch_size)


def pixel_shuffle_3d(x, s):
    b, c, H, W, D = x.shape
    c_ = c // s**3
    x = x.reshape(b, c_, s, s, s, H, W, D)
    x = x.permute(0, 1, 5, 2, 6, 3, 7, 4)
    return x.reshape(b, c_, H * s, W * s, D * s)


class ResBlock3d(nn.Module):
    def __init__(self, channels, out_channels):
        super().__init__()
        self.norm1 = nn.LayerNorm(channels)      # ChannelLayerNorm32 role
        self.norm2 = nn.LayerNorm(out_channels)
        self.conv1 = nn.Conv3d(channels, out_channels, 3, padding=1)
        self.conv2 = nn.Conv3d(out_channels, out_channels, 3, padding=1)
        self.skip_connection = (nn.Conv3d(channels, out_channels, 1)
                                if channels != out_channels else nn.Identity())

    @staticmethod
    def _cln(norm, x):  # channels-last layer norm on NCDHW
        return norm(x.permute(0, 2, 3, 4, 1)).permute(0, 4, 1, 2, 3)

    def forward(self, x):
        h = F.silu(self._cln(self.norm1, x))
        h = self.conv1(h)
        h = F.silu(self._cln(self.norm2, h))
        h = self.conv2(h)
        return h + self.skip_connection(x)


class UpsampleBlock3d(nn.Module):
    def __init__(self, in_channels, out_channels):
        super().__init__()
        self.conv = nn.Conv3d(in_channels, out_channels * 8, 3, padding=1)

    def forward(self, x):
        return pixel_shuffle_3d(self.conv(x), 2)


class SparseStructureDecoderRef(nn.Module):
    def __init__(self, out_channels, latent_channels, num_res_blocks, channels,
                 num_res_blocks_middle=2):
        super().__init__()
        self.input_layer = nn.Conv3d(latent_channels, channels[0], 3, padding=1)
        self.middle_block = nn.Sequential(*[
            ResBlock3d(channels[0], channels[0])
            for _ in range(num_res_blocks_middle)])
        blocks = []
        for i, ch in enumerate(channels):
            blocks.extend([ResBlock3d(ch, ch) for _ in range(num_res_blocks)])
            if i < len(channels) - 1:
                blocks.append(UpsampleBlock3d(ch, channels[i + 1]))
        self.blocks = nn.ModuleList(blocks)
        self.out_layer = nn.Sequential(
            nn.LayerNorm(channels[-1]), nn.SiLU(),
            nn.Conv3d(channels[-1], out_channels, 3, padding=1))

    def forward(self, x):
        h = self.input_layer(x)
        h = self.middle_block(h)
        for block in self.blocks:
            h = block(h)
        h = ResBlock3d._cln(self.out_layer[0], h)
        h = self.out_layer[1](h)
        return self.out_layer[2](h)


# ---------------------------------------------------------------------------
# SLat flow (dense emulation of the sparse ops)
# ---------------------------------------------------------------------------


class SpConv3dEmu(nn.Module):
    """Submanifold sparse conv oracle: dense scatter -> conv3d -> gather.

    Weight stored in spconv layout (out, k, k, k, in) under `.conv.weight`
    like the reference SparseConv3d wrapper.
    """

    def __init__(self, in_ch, out_ch, k=3):
        super().__init__()
        conv = nn.Module()
        conv.weight = nn.Parameter(torch.randn(out_ch, k, k, k, in_ch) * 0.05)
        conv.bias = nn.Parameter(torch.zeros(out_ch))
        self.conv = conv
        self.k = k

    def forward(self, feats, coords, grid):
        # feats (N, C), coords (N, 3) active voxels of ONE instance.
        n, c = feats.shape
        dense = torch.zeros(1, c, grid, grid, grid)
        dense[0, :, coords[:, 0], coords[:, 1], coords[:, 2]] = feats.T
        w = self.conv.weight.permute(0, 4, 1, 2, 3)  # (out, in, k, k, k)
        out = F.conv3d(dense, w, self.conv.bias, padding=self.k // 2)
        return out[0, :, coords[:, 0], coords[:, 1], coords[:, 2]].T


class SparseResBlock3dRef(nn.Module):
    def __init__(self, channels, emb_channels, out_channels=None,
                 downsample=False, upsample=False):
        super().__init__()
        out_channels = out_channels or channels
        self.out_channels = out_channels
        self.downsample, self.upsample = downsample, upsample
        self.norm1 = nn.LayerNorm(channels, eps=1e-6)
        self.norm2 = nn.LayerNorm(out_channels, elementwise_affine=False, eps=1e-6)
        self.conv1 = SpConv3dEmu(channels, out_channels)
        self.conv2 = SpConv3dEmu(out_channels, out_channels)
        self.emb_layers = nn.Sequential(
            nn.SiLU(), nn.Linear(emb_channels, 2 * out_channels, bias=True))
        self.skip_connection = (nn.Linear(channels, out_channels)
                                if channels != out_channels else nn.Identity())

    def forward(self, feats, coords, grid, emb):
        scale, shift = self.emb_layers(emb).chunk(2, dim=-1)
        h = self.conv1(F.silu(self.norm1(feats)), coords, grid)
        h = self.norm2(h) * (1 + scale) + shift
        h = self.conv2(F.silu(h), coords, grid)
        return h + self.skip_connection(feats)


def pool_children(feats, coords, factor=2):
    """spconv SparseDownsample oracle: mean over present children, parents
    ordered by ascending cell code. Returns (pfeats, pcoords, child2parent)."""
    pc = coords // factor
    gmax = int(pc.max().item()) + 1
    code = (pc[:, 0] * gmax + pc[:, 1]) * gmax + pc[:, 2]
    uniq, inv = torch.unique(code, return_inverse=True)
    m = len(uniq)
    psum = torch.zeros(m, feats.shape[1])
    psum.index_add_(0, inv, feats)
    cnt = torch.zeros(m)
    cnt.index_add_(0, inv, torch.ones(len(feats)))
    pfeats = psum / cnt[:, None]
    pcoords = torch.stack([
        uniq // (gmax * gmax), (uniq // gmax) % gmax, uniq % gmax], dim=-1)
    return pfeats, pcoords, inv


class SLatFlowModelRef(nn.Module):
    """io_block_channels=[c0], num_io_res_blocks=2 oracle (one 2x stage)."""

    def __init__(self, resolution, in_channels, model_channels, cond_channels,
                 out_channels, num_blocks, num_heads, io_block_channels,
                 num_io_res_blocks=2, share_mod=False, qk_rms_norm=False,
                 qk_rms_norm_cross=False, mlp_ratio=4.0):
        super().__init__()
        assert len(io_block_channels) == 1 and num_io_res_blocks == 2
        c0 = io_block_channels[0]
        self.resolution = resolution
        self.share_mod = share_mod
        self.t_embedder = TimestepEmbedder(model_channels)
        if share_mod:
            self.adaLN_modulation = nn.Sequential(
                nn.SiLU(), nn.Linear(model_channels, 6 * model_channels, bias=True))
        self.input_layer = nn.Linear(in_channels, c0)
        self.input_blocks = nn.ModuleList([
            SparseResBlock3dRef(c0, model_channels, c0),
            SparseResBlock3dRef(c0, model_channels, model_channels, downsample=True),
        ])
        self.blocks = nn.ModuleList([
            ModulatedTransformerCrossBlock(
                model_channels, cond_channels, num_heads, mlp_ratio,
                share_mod=share_mod, qk_rms_norm=qk_rms_norm,
                qk_rms_norm_cross=qk_rms_norm_cross)
            for _ in range(num_blocks)
        ])
        self.out_blocks = nn.ModuleList([
            SparseResBlock3dRef(model_channels * 2, model_channels, c0, upsample=True),
            SparseResBlock3dRef(c0 * 2, model_channels, c0),
        ])
        self.out_layer = nn.Linear(c0, out_channels)
        self.model_channels = model_channels

    def forward(self, feats, coords, t, cond):
        # feats (N, C), coords (N, 3), t (1,), cond (1, M, D)
        g = self.resolution
        h = self.input_layer(feats)
        t_emb = self.t_embedder(t)
        mod = self.adaLN_modulation(t_emb) if self.share_mod else t_emb

        h = self.input_blocks[0](h, coords, g, t_emb)
        skip0 = h
        ph, pcoords, inv = pool_children(h, coords)
        ph = self.input_blocks[1](ph, pcoords, g // 2, t_emb)
        skip1 = ph

        x = ph + ape_torch(pcoords, self.model_channels)
        x = x[None]
        for block in self.blocks:
            x = block(x, mod, cond)
        h = x[0]

        h = torch.cat([h, skip1], dim=1)[inv]  # concat then upsample
        h = self.out_blocks[0](h, coords, g, t_emb)
        h = torch.cat([h, skip0], dim=1)
        h = self.out_blocks[1](h, coords, g, t_emb)
        h = F.layer_norm(h, h.shape[-1:])
        return self.out_layer(h)


# ---------------------------------------------------------------------------
# SLat VAE decoders
# ---------------------------------------------------------------------------


class SLatDecoderTorsoRef(nn.Module):
    """SparseTransformerBase oracle with full attention (tests use a window
    covering the whole grid, where swin == full)."""

    def __init__(self, in_channels, model_channels, num_blocks, num_heads,
                 mlp_ratio=4.0, qk_rms_norm=False):
        super().__init__()
        self.model_channels = model_channels
        self.input_layer = nn.Linear(in_channels, model_channels)
        self.blocks = nn.ModuleList([
            TransformerBlock(model_channels, num_heads, mlp_ratio, qk_rms_norm)
            for _ in range(num_blocks)
        ])

    def forward(self, feats, coords):
        h = self.input_layer(feats) + ape_torch(coords, self.model_channels)
        h = h[None]
        for block in self.blocks:
            h = block(h)
        return h[0]


class SLatGaussianDecoderRef(nn.Module):
    def __init__(self, resolution, model_channels, latent_channels, num_blocks,
                 num_heads, out_channels, mlp_ratio=4.0, qk_rms_norm=False):
        super().__init__()
        # Reference registers torso pieces flat (input_layer/blocks at top).
        torso = SLatDecoderTorsoRef(latent_channels, model_channels, num_blocks,
                                    num_heads, mlp_ratio, qk_rms_norm)
        self.input_layer = torso.input_layer
        self.blocks = torso.blocks
        self._torso = [torso]
        self.out_layer = nn.Linear(model_channels, out_channels)

    def forward(self, feats, coords):
        h = self._torso[0](feats, coords)
        h = F.layer_norm(h, h.shape[-1:])
        return self.out_layer(h)


class SparseSubdivideBlock3dRef(nn.Module):
    def __init__(self, channels, out_channels, num_groups=32):
        super().__init__()
        g = num_groups if channels % num_groups == 0 else channels
        go = num_groups if out_channels % num_groups == 0 else out_channels
        self.act_layers = nn.Sequential(nn.GroupNorm(g, channels), nn.SiLU())
        self.out_layers = nn.Sequential(
            SpConv3dEmu(channels, out_channels),
            nn.GroupNorm(go, out_channels), nn.SiLU(),
            SpConv3dEmu(out_channels, out_channels),
        )
        skip = nn.Module()
        skip.conv = nn.Module()
        skip.conv.weight = nn.Parameter(
            torch.randn(out_channels, 1, 1, 1, channels) * 0.05)
        skip.conv.bias = nn.Parameter(torch.zeros(out_channels))
        self.skip_connection = skip

    @staticmethod
    def _gn(norm, x):
        # Instance-wide GroupNorm over (1, C, N) like SparseGroupNorm.
        return norm(x.T[None])[0].T

    @staticmethod
    def subdivide(feats, coords):
        corners = torch.tensor(
            [[0, 0, 0], [0, 0, 1], [0, 1, 0], [0, 1, 1],
             [1, 0, 0], [1, 0, 1], [1, 1, 0], [1, 1, 1]])
        n = feats.shape[0]
        nc = (coords[:, None, :] * 2 + corners[None]).reshape(n * 8, 3)
        return feats.repeat_interleave(8, dim=0), nc

    def forward(self, feats, coords, grid):
        h = F.silu(self._gn(self.act_layers[0], feats))
        h, ncoords = self.subdivide(h, coords)
        x, _ = self.subdivide(feats, coords)
        h = self.out_layers[0](h, ncoords, grid * 2)
        h = F.silu(self._gn(self.out_layers[1], h))
        h = self.out_layers[3](h, ncoords, grid * 2)
        w = self.skip_connection.conv.weight.reshape(
            self.skip_connection.conv.weight.shape[0], -1)
        x = x @ w.T + self.skip_connection.conv.bias
        return h + x, ncoords


class SLatMeshDecoderRef(nn.Module):
    def __init__(self, resolution, model_channels, latent_channels, num_blocks,
                 num_heads, out_channels, mlp_ratio=4.0, qk_rms_norm=False):
        super().__init__()
        torso = SLatDecoderTorsoRef(latent_channels, model_channels, num_blocks,
                                    num_heads, mlp_ratio, qk_rms_norm)
        self.input_layer = torso.input_layer
        self.blocks = torso.blocks
        self._torso = [torso]
        self.resolution = resolution
        self.upsample = nn.ModuleList([
            SparseSubdivideBlock3dRef(model_channels, model_channels // 4),
            SparseSubdivideBlock3dRef(model_channels // 4, model_channels // 8),
        ])
        self.out_layer = nn.Linear(model_channels // 8, out_channels)

    def forward(self, feats, coords):
        h = self._torso[0](feats, coords)
        h, coords = self.upsample[0](h, coords, self.resolution)
        h, coords = self.upsample[1](h, coords, self.resolution * 2)
        return self.out_layer(h), coords


def state_np(module: nn.Module) -> dict:
    """state_dict -> {name: np.ndarray} (the converter's input format)."""
    return {k: v.detach().numpy().copy() for k, v in module.state_dict().items()}
