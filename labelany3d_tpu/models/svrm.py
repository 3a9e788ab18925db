"""SVRM-style neural multi-view reconstructor (Flax): views -> triplane -> mesh.

The reference's alternate (Hunyuan3D-1) reconstruction path runs an SVRM:
multi-view images + cameras -> DINO encoder -> image-to-triplane
transformer -> NeuS/EG3D-style triplane SDF+RGB field -> marching-cubes
mesh with vertex colors (`external/Hunyuan3D-1/svrm/ldm/models/
svrm.py:109-259`, `modules/translator/img_to_triplane.py:9-130`,
`modules/rendering_neus/synthesizer.py:19-131`, driven by
`views_to_mesh.py:41-70`). This module is the TPU-native equivalent,
replacing visual-hull space carving for concave objects.

Architecture parity (module-for-module roles):
  * view encoder: DINOv2-style ViT (`models/vit.py`) with a camera
    embedding added to every patch token (the reference's dinov2_mod
    camera modulation role; cam vector = flattened 3x4 pose + 4 intrinsic
    scalars + padding = 20 dims, `views_to_mesh.py`);
  * img_to_triplane: learnable (3*S*S, D) plane tokens cross-attending to
    the concatenated view tokens over `depth` blocks, then a linear
    pixel-shuffle upsampler D -> C*(r^2) (the reference's default
    non-conv upsampler, img_to_triplane.py:92-130);
  * field: per-plane bilinear sampling (ops/sampling.grid_sample, the
    NeuS grid_sample role), 3-plane concat -> small MLP -> (sdf, rgb)
    with MipNeRF sigmoid clamping and spherical SDF bias
    (synthesizer.py:19-131);
  * extraction: dense SDF grid in the aabb -> marching tetrahedra
    (ops/marching_cubes) -> vertex colors by point queries
    (svrm.py:176-209 forward_grid/forward_points role).

TPU-first: the whole views->triplane->grid pipeline is one jitted
program; grid queries batch over a static G^3 lattice (no chunked host
loop); bf16 matmuls, f32 field head.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from labelany3d_tpu.data.meshio import Mesh
from labelany3d_tpu.models.vit import ViT, ViTConfig
from labelany3d_tpu.ops.sampling import grid_sample


@dataclasses.dataclass(frozen=True)
class SVRMConfig:
    num_views: int = 6
    image_size: int = 256
    cam_dim: int = 20
    encoder: ViTConfig = dataclasses.field(
        default_factory=lambda: ViTConfig.base(patch_size=16)
    )
    plane_size: int = 32          # pos_emb_size (pre-upsample)
    token_dim: int = 1024         # pos_emb_dim
    depth: int = 16               # transformer blocks
    num_heads: int = 16
    triplane_dim: int = 80
    upsample_ratio: int = 4
    field_hidden: int = 64
    field_layers: int = 2
    sdf_bias_radius: float = 0.5  # sphere bias (synthesizer.py sdf_bias)
    aabb: float = 0.6             # reference aabb +-0.6 (svrm.py:174)
    grid_size: int = 96
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @staticmethod
    def tiny_test(**kw) -> "SVRMConfig":
        return SVRMConfig(
            num_views=2, image_size=32,
            encoder=ViTConfig.tiny_test(),
            plane_size=4, token_dim=32, depth=2, num_heads=2,
            triplane_dim=8, upsample_ratio=2, field_hidden=16,
            grid_size=24, **kw,
        )


class _Block(nn.Module):
    """Self-attn + cross-attn(context) + FFN (BasicTransformerBlock role)."""

    dim: int
    heads: int
    dtype: Any
    param_dtype: Any

    @nn.compact
    def __call__(self, x, context):
        def attn(q_in, kv_in, name):
            hd = self.dim // self.heads
            dense = lambda n, d: nn.Dense(  # noqa: E731
                d, dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"{name}_{n}",
            )
            q = dense("q", self.dim)(q_in)
            k = dense("k", self.dim)(kv_in)
            v = dense("v", self.dim)(kv_in)

            def heads(t):
                return t.reshape(t.shape[:-1] + (self.heads, hd))

            from labelany3d_tpu.ops.attention import flash_sdpa

            o = flash_sdpa(heads(q), heads(k), heads(v))
            return dense("o", self.dim)(o.reshape(q_in.shape[:-1] + (self.dim,)))

        ln = lambda n: nn.LayerNorm(  # noqa: E731
            dtype=jnp.float32, param_dtype=self.param_dtype, name=n
        )
        x = x + attn(ln("norm1")(x).astype(self.dtype), x, "self")
        x = x + attn(ln("norm2")(x).astype(self.dtype), context, "cross")
        h = ln("norm3")(x).astype(self.dtype)
        h = nn.Dense(4 * self.dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="ff1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="ff2")(h)
        return x + h


class TriplaneField(nn.Module):
    """(3, R, R, C) planes + (..., 3) points -> dict(sdf, rgb).

    OSGDecoder parity (synthesizer.py:19-131): concat 3 plane samples,
    small ReLU MLP, sigmoid-clamped rgb, spherical SDF bias.
    """

    cfg: SVRMConfig

    @nn.compact
    def __call__(self, planes, points):
        cfg = self.cfg
        p = points / cfg.aabb  # [-1, 1] box warp
        # EG3D plane projections: XY, XZ, ZY.
        proj = [p[..., (0, 1)], p[..., (0, 2)], p[..., (2, 1)]]
        feats = [grid_sample(planes[i].astype(jnp.float32), proj[i])
                 for i in range(3)]
        x = jnp.concatenate(feats, axis=-1)
        for i in range(cfg.field_layers - 1):
            x = nn.Dense(cfg.field_hidden, dtype=jnp.float32,
                         param_dtype=cfg.param_dtype, name=f"fc{i}")(x)
            x = nn.relu(x)
        x = nn.Dense(4, dtype=jnp.float32, param_dtype=cfg.param_dtype,
                     name="out")(x)
        rgb = jax.nn.sigmoid(x[..., 1:]) * (1 + 2 * 0.001) - 0.001
        sphere = jnp.linalg.norm(points, axis=-1, keepdims=True) - cfg.sdf_bias_radius
        sdf = x[..., :1] + sphere
        return {"sdf": sdf[..., 0], "rgb": rgb}


class SVRM(nn.Module):
    """views (B, M, H, W, 3) in [0,1] + cams (B, M, cam_dim) -> triplanes.

    `__call__` returns (B, 3, R, R, C) triplanes; `query` evaluates the
    field; `grid` evaluates a dense G^3 SDF+RGB lattice in the aabb.
    """

    cfg: SVRMConfig

    def setup(self):
        cfg = self.cfg
        self.encoder = ViT(cfg.encoder, name="encoder")
        self.cam_embed = nn.Dense(cfg.encoder.width, name="cam_embed")
        self.ctx_proj = nn.Dense(cfg.token_dim, name="ctx_proj")
        self.pos_emb = self.param(
            "pos_emb",
            nn.initializers.normal(1.0 / np.sqrt(cfg.token_dim), jnp.float32),
            (1, 3 * cfg.plane_size * cfg.plane_size, cfg.token_dim),
        )
        self.blocks = [
            _Block(cfg.token_dim, cfg.num_heads, cfg.dtype, cfg.param_dtype,
                   name=f"block{i}")
            for i in range(cfg.depth)
        ]
        self.final_norm = nn.LayerNorm(dtype=jnp.float32,
                                       param_dtype=cfg.param_dtype,
                                       name="final_norm")
        self.upsampler = nn.Dense(
            cfg.triplane_dim * cfg.upsample_ratio ** 2, name="upsampler"
        )
        self.field = TriplaneField(cfg, name="field")

    def __call__(self, views, cams):
        cfg = self.cfg
        b, m = views.shape[:2]
        flat = views.reshape((b * m,) + views.shape[2:])
        tokens = self.encoder(flat)["tokens"]  # (B*M, N, We)
        tokens = tokens + self.cam_embed(cams.reshape(b * m, -1))[:, None, :].astype(tokens.dtype)
        ctx = self.ctx_proj(tokens.reshape(b, m * tokens.shape[1], -1))

        h = jnp.broadcast_to(self.pos_emb, (b,) + self.pos_emb.shape[1:]).astype(cfg.dtype)
        for blk in self.blocks:
            h = blk(h, ctx.astype(cfg.dtype))
        h = self.final_norm(h)

        s, r, c = cfg.plane_size, cfg.upsample_ratio, cfg.triplane_dim
        h = self.upsampler(h.astype(jnp.float32))
        h = h.reshape(b, 3, s, s, c, r, r)
        h = h.transpose(0, 1, 2, 5, 3, 6, 4)          # (b, 3, s, r, s, r, c)
        return h.reshape(b, 3, s * r, s * r, c)

    def query(self, planes, points):
        """(3, R, R, C) planes + (..., 3) points -> field outputs."""
        return self.field(planes, points)

    def init_all(self, views, cams):
        """Init path touching every submodule (the field is only reached
        through `query`/`grid`, which `init` would otherwise miss)."""
        planes = self(views, cams)
        self.field(planes[0], jnp.zeros((1, 3), jnp.float32))
        return planes

    def grid(self, planes):
        """Dense lattice query: (G, G, G) sdf + (G, G, G, 3) rgb."""
        g = self.cfg.grid_size
        ar = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g * 2.0 - 1.0
        ar = ar * self.cfg.aabb
        zz, yy, xx = jnp.meshgrid(ar, ar, ar, indexing="ij")
        pts = jnp.stack([xx, yy, zz], axis=-1)  # (G, G, G, 3), index order z,y,x
        out = self.field(planes, pts)
        return out["sdf"], out["rgb"]


class SVRMReconstruction:
    """Reconstruction backend (stage 6): novel views -> SVRM -> Mesh.

    The neural replacement for visual-hull space carving
    (`models/spacecarve.py`), matching the reference's Hunyuan3D path:
    multi-view diffusion (`Image2Views`) then SVRM NeuS
    (`views_to_mesh.py:41-70`). `novel_views` supplies the M orbit views
    (Zero123-equivalent); without converted weights the field is random
    and a one-shot warning fires.
    """

    ELEVATIONS = (0.0, 0.0, 0.0, 0.0, -30.0, -30.0)
    AZIMUTHS = (0.0, 60.0, 120.0, 180.0, 240.0, 300.0)  # MVD "std" orbit

    def __init__(self, novel_views=None, cfg: SVRMConfig | None = None,
                 params=None, seed: int = 0):
        self.cfg = cfg or SVRMConfig()
        self.model = SVRM(self.cfg)
        self.novel_views = novel_views
        self.params = params
        self._seed = seed
        self._jit = None

    def _ensure(self):
        if self.params is None:
            from labelany3d_tpu.utils.logging import warn_once

            warn_once(
                "svrm_random",
                "SVRM reconstructor runs with random-initialized weights "
                "(no converted checkpoint) — meshes are not meaningful; "
                "use obj_rec=hunyuan3d_carve for the deterministic "
                "baseline; see docs/WEIGHTS.md",
            )
            cfg = self.cfg
            views = jnp.zeros((1, cfg.num_views, cfg.image_size, cfg.image_size, 3))
            cams = jnp.zeros((1, cfg.num_views, cfg.cam_dim))
            self.params = self.model.init(
                jax.random.PRNGKey(self._seed), views, cams,
                method=SVRM.init_all,
            )["params"]
        if self._jit is None:
            def run(p, views, cams):
                planes = self.model.apply({"params": p}, views, cams)
                sdf, rgb = self.model.apply({"params": p}, planes[0],
                                            method=SVRM.grid)
                return sdf, rgb

            self._jit = jax.jit(run)

    @staticmethod
    def camera_vector(elev_deg: float, azim_deg: float, radius: float = 2.0,
                      fov_deg: float = 49.1, dim: int = 20) -> np.ndarray:
        """Camera conditioning: flattened 3x4 w2c + 4 intrinsics scalars,
        zero-padded to `dim` (the reference's 20-dim input_view_cam
        layout role)."""
        from labelany3d_tpu.registration.cameras import opencv_orbit_pose

        R, t = opencv_orbit_pose(elev_deg, azim_deg, radius)
        f = 0.5 / np.tan(np.deg2rad(fov_deg) / 2)
        vec = np.concatenate([
            np.concatenate([R, t[:, None]], axis=1).reshape(-1),
            [f, f, 0.5, 0.5],
        ])
        vec = vec[:dim]
        return np.pad(vec, (0, dim - len(vec))).astype(np.float32)

    def reconstruct(self, crop_rgba: np.ndarray, label: str = "") -> Mesh:
        from PIL import Image

        from labelany3d_tpu.ops.marching_cubes import marching_cubes_mesh

        self._ensure()
        cfg = self.cfg
        n = cfg.num_views
        views = []
        for i in range(n):
            if self.novel_views is not None and i > 0:
                img = self.novel_views.generate(
                    crop_rgba, self.ELEVATIONS[i % len(self.ELEVATIONS)],
                    self.AZIMUTHS[i % len(self.AZIMUTHS)],
                )
            else:
                rgba = np.asarray(crop_rgba)
                rgb = rgba[..., :3]
                if rgba.shape[-1] == 4:
                    a = rgba[..., 3:4].astype(np.float32) / 255.0
                    rgb = (rgb * a + 255 * (1 - a)).astype(np.uint8)
                img = rgb
            img = np.asarray(
                Image.fromarray(np.asarray(img, np.uint8)).resize(
                    (cfg.image_size,) * 2, Image.BILINEAR)
            )
            views.append(img.astype(np.float32) / 255.0)
        cams = np.stack([
            self.camera_vector(self.ELEVATIONS[i % len(self.ELEVATIONS)],
                               self.AZIMUTHS[i % len(self.AZIMUTHS)],
                               dim=cfg.cam_dim)
            for i in range(n)
        ])
        sdf, rgb = self._jit(
            self.params,
            jnp.asarray(np.stack(views))[None],
            jnp.asarray(cams, jnp.float32)[None],
        )
        verts, faces = marching_cubes_mesh(np.asarray(sdf), iso=0.0)
        if len(verts) == 0:
            return Mesh(np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32))
        g = cfg.grid_size
        # grid index order is (z, y, x); colors sample at vertex cells
        vi = np.clip(verts.astype(np.int64), 0, g - 1)
        colors = np.asarray(rgb)[vi[:, 0], vi[:, 1], vi[:, 2]]
        # grid coords -> object frame [-0.5, 0.5] (generative output norm)
        verts_obj = (verts / g - 0.5).astype(np.float32)
        # marching grid order (z, y, x) -> (x, y, z)
        verts_obj = verts_obj[:, ::-1]
        return Mesh(np.ascontiguousarray(verts_obj), faces,
                    colors=colors.astype(np.float32))
