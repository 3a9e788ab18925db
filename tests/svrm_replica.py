"""Torch oracle replica of the Hunyuan3D SVRM (test-only).

State-dict names and math follow `external/Hunyuan3D-1/svrm/ldm/` (models/
svrm.py, modules/attention.py, modules/translator/img_to_triplane.py,
modules/encoders/dinov2, modules/rendering_neus/synthesizer.py). Used to
generate synthetic `svrm.safetensors`-shaped state dicts and oracle
outputs for `convert_svrm` parity tests.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


def modulate(x, shift, scale):
    return x * (1 + scale.unsqueeze(1)) + shift.unsqueeze(1)


class AdaNorm(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.adaLN_modulation = nn.Sequential(
            nn.SiLU(), nn.Linear(dim, 2 * dim, bias=True))
        self.norm = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)

    def forward(self, x, c):
        shift, scale = self.adaLN_modulation(c.float()).chunk(2, dim=1)
        return modulate(self.norm(x), shift, scale)


class _Attn(nn.Module):
    def __init__(self, dim, heads, qkv_bias=True):
        super().__init__()
        self.heads = heads
        self.qkv = nn.Linear(dim, 3 * dim, bias=qkv_bias)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        b, n, c = x.shape
        qkv = self.qkv(x).reshape(b, n, 3, self.heads, c // self.heads)
        q, k, v = qkv.permute(2, 0, 3, 1, 4).unbind(0)
        h = F.scaled_dot_product_attention(q, k, v)
        return self.proj(h.transpose(1, 2).reshape(b, n, c))


class _LayerScale(nn.Module):
    def __init__(self, dim, init=1.0):
        super().__init__()
        self.gamma = nn.Parameter(torch.full((dim,), init))

    def forward(self, x):
        return x * self.gamma


class _Mlp(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.fc1 = nn.Linear(dim, 4 * dim)
        self.fc2 = nn.Linear(4 * dim, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class BlockMod(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = AdaNorm(dim)
        self.attn = _Attn(dim, heads)
        self.ls1 = _LayerScale(dim)
        self.norm2 = AdaNorm(dim)
        self.mlp = _Mlp(dim)
        self.ls2 = _LayerScale(dim)

    def forward(self, x, cam_emb):
        x = x + self.ls1(self.attn(self.norm1(x, cam_emb)))
        return x + self.ls2(self.mlp(self.norm2(x, cam_emb)))


class DinoV2Mod(nn.Module):
    """Vendored dinov2 with camera modulation (names under `model.`)."""

    def __init__(self, width, depth, heads, patch, pos_grid, cam_dim=20):
        super().__init__()
        self.patch = patch
        self.cam_embed = nn.Sequential(
            nn.Linear(cam_dim, width, bias=True), nn.SiLU(),
            nn.Linear(width, width, bias=True))
        pe = nn.Module()
        pe.proj = nn.Conv2d(3, width, patch, stride=patch)
        self.patch_embed = pe
        self.cls_token = nn.Parameter(torch.zeros(1, 1, width) + 0.01)
        self.pos_embed = nn.Parameter(
            torch.randn(1, pos_grid * pos_grid + 1, width) * 0.02)
        self.blocks = nn.ModuleList([BlockMod(width, heads) for _ in range(depth)])
        self.norm = AdaNorm(width)

    def forward_features_with_camera(self, x, cam_cond):
        cam_emb = self.cam_embed(cam_cond)
        b = x.shape[0]
        h = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        # pos grid must match the input token grid in tests (no interp).
        h = h + self.pos_embed[:, 1:]
        cls = (self.cls_token + self.pos_embed[:, :1]).expand(b, -1, -1)
        h = torch.cat([cls, h], dim=1)
        for blk in self.blocks:
            h = blk(h, cam_emb)
        return self.norm(h, cam_emb)


class FrozenDinoV2ImageEmbedder(nn.Module):
    def __init__(self, **kw):
        super().__init__()
        self.model = DinoV2Mod(**kw)

    def forward(self, x, cam):
        out = self.model.forward_features_with_camera(x, cam)
        return out  # already [cls | patch]


class CrossAttention(nn.Module):
    def __init__(self, query_dim, context_dim=None, heads=8, dim_head=64):
        super().__init__()
        inner = heads * dim_head
        context_dim = context_dim or query_dim
        self.heads = heads
        self.to_q = nn.Linear(query_dim, inner, bias=False)
        self.to_k = nn.Linear(context_dim, inner, bias=False)
        self.to_v = nn.Linear(context_dim, inner, bias=False)
        self.to_out = nn.Sequential(nn.Linear(inner, query_dim))

    def forward(self, x, context=None):
        context = x if context is None else context
        b, n, _ = x.shape
        h = self.heads
        q = self.to_q(x).reshape(b, n, h, -1).transpose(1, 2)
        k = self.to_k(context).reshape(b, context.shape[1], h, -1).transpose(1, 2)
        v = self.to_v(context).reshape(b, context.shape[1], h, -1).transpose(1, 2)
        o = F.scaled_dot_product_attention(q, k, v)
        return self.to_out(o.transpose(1, 2).reshape(b, n, -1))


class GEGLU(nn.Module):
    def __init__(self, dim_in, dim_out):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out * 2)

    def forward(self, x):
        a, gate = self.proj(x).chunk(2, dim=-1)
        return a * F.gelu(gate)


class FeedForward(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.net = nn.Sequential(GEGLU(dim, 4 * dim), nn.Identity(),
                                 nn.Linear(4 * dim, dim))

    def forward(self, x):
        return self.net(x)


class BasicTransformerBlockLRM(nn.Module):
    def __init__(self, dim, n_heads, d_head, context_dim):
        super().__init__()
        self.attn1 = CrossAttention(dim, context_dim, n_heads, d_head)
        self.attn2 = CrossAttention(dim, None, n_heads, d_head)
        self.norm1 = nn.LayerNorm(dim)
        self.norm2 = nn.LayerNorm(dim)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = FeedForward(dim)

    def forward(self, x, context):
        x = self.attn1(self.norm1(x), context=context) + x
        x = self.attn2(self.norm2(x), context=None) + x
        return self.ff(self.norm3(x)) + x


class ImgToTriplaneTransformer(nn.Module):
    def __init__(self, query_dim, n_heads, d_head, depth, context_dim):
        super().__init__()
        self.transformer_blocks = nn.ModuleList([
            BasicTransformerBlockLRM(query_dim, n_heads, d_head, context_dim)
            for _ in range(depth)])
        self.norm = nn.LayerNorm(query_dim, eps=1e-6)

    def forward(self, x, context):
        for block in self.transformer_blocks:
            x = block(x, context)
        return self.norm(x)


class ImgToTriplaneModel(nn.Module):
    def __init__(self, pos_emb_size, pos_emb_dim, n_heads, d_head, depth,
                 context_dim, triplane_dim, upsample_ratio=4):
        super().__init__()
        self.pos_emb_size = pos_emb_size
        self.pos_emb_dim = pos_emb_dim
        self.triplane_dim = triplane_dim
        self.upsample_ratio = upsample_ratio
        self.pos_emb = nn.Parameter(
            torch.randn(1, 3 * pos_emb_size**2, pos_emb_dim) * 0.02)
        self.img_to_triplane_decoder = ImgToTriplaneTransformer(
            pos_emb_dim, n_heads, d_head, depth, context_dim)
        self.upsampler = nn.Linear(pos_emb_dim, triplane_dim * upsample_ratio**2)

    def forward(self, x):
        b = x.shape[0]
        h = self.pos_emb.expand(b, -1, -1)
        h = self.img_to_triplane_decoder(h, context=x)
        h = h.view(b * 3, self.pos_emb_size, self.pos_emb_size, self.pos_emb_dim)
        h = self.upsampler(h)
        r = self.upsample_ratio
        bb, hh, wwd, _ = h.shape
        h = h.view(bb, hh, wwd, self.triplane_dim, r, r)
        h = h.permute(0, 3, 1, 4, 2, 5).contiguous()
        h = h.view(bb, self.triplane_dim, hh * r, wwd * r)
        return h.view(b, 3, self.triplane_dim, hh * r, wwd * r)


class OSGDecoder(nn.Module):
    def __init__(self, n_features, hidden_dim=64, num_layers=2):
        super().__init__()
        layers = [nn.Linear(3 * n_features, hidden_dim), nn.ReLU()]
        for _ in range(num_layers - 2):
            layers += [nn.Linear(hidden_dim, hidden_dim), nn.ReLU()]
        layers += [nn.Linear(hidden_dim, 4)]
        self.net = nn.Sequential(*layers)


class RenderRef(nn.Module):
    def __init__(self, triplane_dim, hidden_dim=64, num_layers=2):
        super().__init__()
        self.decoder = OSGDecoder(triplane_dim, hidden_dim, num_layers)

    def forward_points(self, planes, points, box_warp=1.2):
        # planes (1, 3, C, H, W); points (M, 3) -> dict(sdf, rgb)
        _, n_planes, c, hh, ww = planes.shape
        coords = points[None] * (2.0 / box_warp)
        axes = torch.tensor(
            [[[1, 0, 0], [0, 1, 0], [0, 0, 1]],
             [[1, 0, 0], [0, 0, 1], [0, 1, 0]],
             [[0, 0, 1], [0, 1, 0], [1, 0, 0]]], dtype=torch.float32)
        inv = torch.linalg.inv(axes)
        pf = planes.view(n_planes, c, hh, ww)
        proj = torch.einsum("nmc,pcd->pnmd", coords, inv)[..., :2]  # (p,1,M,2)
        sampled = F.grid_sample(pf.float(), proj.float(),
                                mode="bilinear", padding_mode="zeros",
                                align_corners=False)
        # (planes, C, 1, M) -> (M, planes*C)
        sampled = sampled.permute(0, 3, 2, 1).reshape(n_planes, -1, c)
        x = sampled.permute(1, 0, 2).reshape(-1, n_planes * c)
        x = self.decoder.net(x)
        rgb = torch.sigmoid(x[..., 1:]) * (1 + 2 * 0.001) - 0.001
        return {"sdf": x[..., 0], "rgb": rgb}


class SVRMModelRef(nn.Module):
    def __init__(self, enc_kw, tri_kw, render_kw):
        super().__init__()
        self.img_encoder = FrozenDinoV2ImageEmbedder(**enc_kw)
        self.img_to_triplane_decoder = ImgToTriplaneModel(**tri_kw)
        self.render = RenderRef(**render_kw)

    def forward(self, views, cams):
        # views (1, M, 3, H, W); cams (1, M, 20)
        b, m = views.shape[:2]
        flat = views.reshape(b * m, *views.shape[2:])
        feat = self.img_encoder(flat, cams.reshape(b * m, -1))
        # reference rearrange '(b m) l d -> b (l m) d'
        l, d = feat.shape[1], feat.shape[2]
        feat = feat.reshape(b, m, l, d).permute(0, 2, 1, 3).reshape(b, l * m, d)
        return self.img_to_triplane_decoder(feat)


def state_np(module):
    return {k: v.detach().numpy().copy() for k, v in module.state_dict().items()}
