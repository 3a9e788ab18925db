"""SLat decoders: per-voxel 3D Gaussians and FlexiCubes-style mesh features.

Checkpoint-faithful to TRELLIS's SLat VAE decoders:
  * `SLatGaussianDecoder` (`structured_latent_vae/decoder_gs.py:11-130`):
    sparse swin transformer -> per-voxel K Gaussians with the reference's
    exact parameter activations (tanh offsets + Hammersley perturbation,
    softplus scaling with bias, sigmoid opacity, SH-deg-0 color);
  * `SLatMeshDecoder` (`structured_latent_vae/decoder_mesh.py:70-170`):
    sparse swin transformer -> two SparseSubdivide upsample blocks
    (64 -> 256 effective res) -> FlexiCubes feature field (8-corner sdf +
    deform + weights [+ color]); surface extraction happens host-side in
    `flexicubes_to_mesh` (plain marching cubes over the deformed grid —
    the FlexiCubes dual weights only nudge vertex placement and carry no
    learned weights of their own).

TPU-native: fixed voxel slots + valid masks; swin attention from
`ops.attention.windowed_attention_3d`; instance-wide masked group norm.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from labelany3d_tpu.models.trellis.dit import Attention, DiTConfig, TransformerBlock, ape_3d
from labelany3d_tpu.models.trellis.slat import SparseConv3d


class GaussianSet(NamedTuple):
    means: jnp.ndarray       # (N*K, 3) in [0, 1]^3 object space
    scales: jnp.ndarray      # (N*K, 3)
    rotations: jnp.ndarray   # (N*K, 4) wxyz
    opacities: jnp.ndarray   # (N*K,)
    colors: jnp.ndarray      # (N*K, 3)
    valid: jnp.ndarray       # (N*K,)


def _radical_inverse(base: int, n: int) -> float:
    val, inv = 0.0, 1.0 / base
    inv_n = inv
    while n > 0:
        val += (n % base) * inv_n
        n //= base
        inv_n *= inv
    return val


def hammersley_3d(num: int) -> np.ndarray:
    """(num, 3) Hammersley points, parity with `utils/random_utils.py`."""
    pts = [[i / num, _radical_inverse(2, i), _radical_inverse(3, i)]
           for i in range(num)]
    return np.asarray(pts, np.float32)


@dataclasses.dataclass(frozen=True)
class GaussianRepConfig:
    """`representation_config` of the released gs decoder (lr scales etc.)."""

    num_gaussians: int = 32
    voxel_size: float = 1.5
    perturb_offset: bool = True
    lr_xyz: float = 1.0
    lr_features_dc: float = 1.0
    lr_scaling: float = 1.0
    lr_rotation: float = 0.1
    lr_opacity: float = 1.0
    scaling_bias: float = 4e-3
    opacity_bias: float = 0.1
    min_kernel_size: float = 2e-3
    scaling_activation: str = "softplus"   # 'softplus' | 'exp'


@dataclasses.dataclass(frozen=True)
class SLatDecoderConfig:
    """Shared torso shapes (slat_dec_*_swin8_B_64l8* defaults)."""

    resolution: int = 64
    latent_channels: int = 8
    model_channels: int = 768
    num_blocks: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    window_size: int = 8
    qk_rms_norm: bool = False
    dtype: Any = jnp.bfloat16

    def dit(self) -> DiTConfig:
        return DiTConfig(width=self.model_channels, depth=self.num_blocks,
                         num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                         qk_rms_norm=self.qk_rms_norm, dtype=self.dtype)

    @staticmethod
    def tiny_test(**kw) -> "SLatDecoderConfig":
        kw.setdefault("resolution", 16)
        kw.setdefault("latent_channels", 4)
        kw.setdefault("model_channels", 16)
        kw.setdefault("num_blocks", 2)
        kw.setdefault("num_heads", 2)
        kw.setdefault("window_size", 4)
        return SLatDecoderConfig(**kw)


class _SparseTorso(nn.Module):
    """`SparseTransformerBase` parity (`structured_latent_vae/base.py:27-117`):
    input linear + APE + swin blocks with alternating half-window shift."""

    cfg: SLatDecoderConfig

    @nn.compact
    def __call__(self, feats, coords, valid):
        cfg = self.cfg
        dit = cfg.dit()
        x = nn.Dense(cfg.model_channels, dtype=jnp.float32, name="input_layer")(feats)
        x = x + ape_3d(coords, cfg.model_channels)
        x = x.astype(cfg.dtype)[None]
        cb, vb = coords[None], valid[None]
        for i in range(cfg.num_blocks):
            shift = cfg.window_size // 2 * (i % 2)
            spec = ("windowed", cb, vb, shift, cfg.resolution, cfg.window_size)
            x = TransformerBlock(dit, name=f"block{i}")(x, attn_spec=spec)
        return x[0]


class SLatGaussianDecoder(nn.Module):
    cfg: SLatDecoderConfig
    rep: GaussianRepConfig = dataclasses.field(default_factory=GaussianRepConfig)

    @nn.compact
    def __call__(self, feats, coords, valid) -> GaussianSet:
        cfg, rep = self.cfg, self.rep
        k = rep.num_gaussians
        h = _SparseTorso(cfg, name="torso")(feats, coords, valid)
        h = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-5,
                         dtype=jnp.float32, name="norm_out")(h)
        out_ch = k * (3 + 3 + 3 + 4 + 1)
        f = nn.Dense(out_ch, dtype=jnp.float32,
                     kernel_init=nn.initializers.zeros, name="out_layer")(h)
        n = feats.shape[0]
        # Layout parity (`decoder_gs.py:_calc_layout`): contiguous blocks
        # [_xyz | _features_dc | _scaling | _rotation | _opacity].
        o = 0
        f_xyz = f[:, o:o + k * 3].reshape(n, k, 3); o += k * 3
        f_dc = f[:, o:o + k * 3].reshape(n, k, 3); o += k * 3
        f_scale = f[:, o:o + k * 3].reshape(n, k, 3); o += k * 3
        f_rot = f[:, o:o + k * 4].reshape(n, k, 4); o += k * 4
        f_op = f[:, o:o + k].reshape(n, k)

        res = float(cfg.resolution)
        offset = f_xyz * rep.lr_xyz
        if rep.perturb_offset:
            pert = np.arctanh(np.clip(
                (hammersley_3d(k) * 2.0 - 1.0) / rep.voxel_size, -0.999, 0.999))
            offset = offset + jnp.asarray(pert)[None]
        offset = jnp.tanh(offset) / res * 0.5 * rep.voxel_size
        centers = (coords.astype(jnp.float32) + 0.5) / res
        means = centers[:, None, :] + offset

        if rep.scaling_activation == "softplus":
            scale_bias = float(np.log(np.expm1(rep.scaling_bias)))  # softplus^-1
            s = jax.nn.softplus(f_scale * rep.lr_scaling + scale_bias)
        else:
            scale_bias = float(np.log(rep.scaling_bias))
            s = jnp.exp(f_scale * rep.lr_scaling + scale_bias)
        scales = jnp.sqrt(jnp.square(s) + rep.min_kernel_size**2)

        rot = f_rot * rep.lr_rotation + jnp.asarray([1.0, 0.0, 0.0, 0.0])
        rotations = rot / jnp.linalg.norm(rot, axis=-1, keepdims=True).clip(1e-8)

        op_bias = float(np.log(rep.opacity_bias / (1 - rep.opacity_bias)))
        opacities = jax.nn.sigmoid(f_op * rep.lr_opacity + op_bias)

        # SH degree 0 -> RGB.
        colors = jnp.clip(0.5 + 0.28209479177387814 * f_dc * rep.lr_features_dc, 0, 1)

        vmask = jnp.repeat(valid, k)
        return GaussianSet(
            means=means.reshape(-1, 3),
            scales=scales.reshape(-1, 3),
            rotations=rotations.reshape(-1, 4),
            opacities=jnp.where(vmask, opacities.reshape(-1), 0.0),
            colors=colors.reshape(-1, 3),
            valid=vmask,
        )


class SparseGroupNorm(nn.Module):
    """Masked instance-wide GroupNorm: statistics over (group channels x all
    valid voxels), parity with `sparse/norm.py::SparseGroupNorm` feeding
    torch GroupNorm a (1, C, N) view."""

    channels: int
    groups: int = 32

    @nn.compact
    def __call__(self, x, valid):
        g = self.groups
        cpg = self.channels // g
        n = x.shape[0]
        xf = x.astype(jnp.float32).reshape(n, g, cpg)
        m = valid.astype(jnp.float32)[:, None, None]
        cnt = jnp.maximum(m.sum() * cpg, 1.0)
        mean = (xf * m).sum(axis=(0, 2)) / cnt                   # (g,)
        var = (jnp.square(xf - mean[None, :, None]) * m).sum(axis=(0, 2)) / cnt
        y = (xf - mean[None, :, None]) * jax.lax.rsqrt(var[None, :, None] + 1e-5)
        scale = self.param("scale", nn.initializers.ones, (self.channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        y = y.reshape(n, self.channels) * scale + bias
        return jnp.where(valid[:, None], y, 0.0).astype(x.dtype)


def sparse_subdivide(feats, coords, valid):
    """Each voxel spawns its 8 children (row-major corner order), feats
    copied — `modules/sparse/spatial.py::SparseSubdivide` parity."""
    corners = jnp.asarray(
        [[0, 0, 0], [0, 0, 1], [0, 1, 0], [0, 1, 1],
         [1, 0, 0], [1, 0, 1], [1, 1, 0], [1, 1, 1]], jnp.int32)
    n = feats.shape[0]
    new_coords = (coords[:, None, :] * 2 + corners[None]).reshape(n * 8, 3)
    new_feats = jnp.repeat(feats, 8, axis=0)
    new_valid = jnp.repeat(valid, 8)
    return new_feats, new_coords, new_valid


class SparseSubdivideBlock3d(nn.Module):
    """`decoder_mesh.py:13-68`: GN+SiLU -> subdivide -> conv3 -> GN+SiLU ->
    zero-init conv3, plus a (subdivided) 1x1-conv skip."""

    channels: int
    out_channels: int
    out_resolution: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats, coords, valid):
        g_in = 32 if self.channels % 32 == 0 else self.channels
        g_out = 32 if self.out_channels % 32 == 0 else self.out_channels
        h = SparseGroupNorm(self.channels, g_in, name="norm_in")(feats, valid)
        h = nn.silu(h.astype(jnp.float32)).astype(self.dtype)
        h, new_coords, new_valid = sparse_subdivide(h, coords, valid)
        x, _, _ = sparse_subdivide(feats, coords, valid)
        h = SparseConv3d(self.channels, self.out_channels, name="conv1")(
            h[None], new_coords[None], new_valid[None], self.out_resolution)[0]
        h = SparseGroupNorm(self.out_channels, g_out, name="norm_mid")(h, new_valid)
        h = nn.silu(h.astype(jnp.float32)).astype(self.dtype)
        h = SparseConv3d(self.out_channels, self.out_channels, zero_init=True,
                         name="conv2")(
            h[None], new_coords[None], new_valid[None], self.out_resolution)[0]
        if self.out_channels != self.channels:
            x = nn.Dense(self.out_channels, dtype=self.dtype, name="skip")(x)
        return h + x, new_coords, new_valid


# FlexiCubes per-voxel feature layout (`cube2mesh.py::_calc_layout`).
def flexicubes_channels(use_color: bool) -> int:
    return 8 * 1 + 8 * 3 + 21 + (8 * 6 if use_color else 0)


class SLatMeshDecoder(nn.Module):
    cfg: SLatDecoderConfig
    use_color: bool = True

    @nn.compact
    def __call__(self, feats, coords, valid):
        """Returns (features (8N', C_fc), coords (8N', 3), valid (8N',)) at
        4x the torso resolution (two subdivides)."""
        cfg = self.cfg
        h = _SparseTorso(cfg, name="torso")(feats, coords, valid)
        c = cfg.model_channels
        h, coords, valid = SparseSubdivideBlock3d(
            c, c // 4, cfg.resolution * 2, cfg.dtype, name="up0")(h, coords, valid)
        h, coords, valid = SparseSubdivideBlock3d(
            c // 4, c // 8, cfg.resolution * 4, cfg.dtype, name="up1")(h, coords, valid)
        out = nn.Dense(flexicubes_channels(self.use_color), dtype=jnp.float32,
                       kernel_init=nn.initializers.zeros, name="out_layer")(
            h.astype(jnp.float32))
        return out, coords, valid


# ---------------------------------------------------------------------------
# Host-side surface extraction from FlexiCubes features
# ---------------------------------------------------------------------------


def flexicubes_to_mesh(features: np.ndarray, coords: np.ndarray,
                       valid: np.ndarray, res: int, use_color: bool = True):
    """Per-voxel FlexiCubes features -> (vertices, faces, vertex_colors).

    Parity with `SparseFeatures2Mesh.__call__` (`cube2mesh.py:97-145`) up to
    the dual-vertex solve: corner sdf (+ the -1/res bias), deformations and
    colors are averaged onto shared grid vertices (`sparse_cube2verts`),
    vertices are displaced by tanh(deform)/(2 res) (`get_defomed_verts`),
    and the iso-surface is extracted with the repo's marching-tetrahedra
    tables over the *active cells only* — no dense 257^3 grid. The learned
    FlexiCubes beta/alpha/gamma weights (which only re-weight dual-vertex
    placement) are dropped; sdf/deform dominate the geometry. Vertices land
    in [-0.5, 0.5]^3 like the reference.
    """
    from labelany3d_tpu.ops.marching_cubes import (
        _CORNERS, _TET_EDGES, _TET_TRI_TABLE, _TETS)

    features = np.asarray(features)[np.asarray(valid)]
    coords = np.asarray(coords)[np.asarray(valid)]
    empty = (np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32),
             np.zeros((0, 3), np.float32))
    if len(coords) == 0:
        return empty

    # Reference corner order is row-major (cube_corners, utils_cube.py:2);
    # reorder the 8-corner features to ops.marching_cubes' _CORNERS order.
    rowmajor = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0],
                         [0, 0, 1], [1, 0, 1], [0, 1, 1], [1, 1, 1]], np.int64)
    reorder = np.array([int(np.nonzero((rowmajor == c).all(1))[0][0])
                        for c in _CORNERS])

    sdf = (features[:, 0:8] - 1.0 / res)[:, reorder]
    deform = features[:, 8:32].reshape(-1, 8, 3)[:, reorder]
    color = (features[:, 53:101].reshape(-1, 8, 6)[:, reorder, :3]
             if use_color and features.shape[1] >= 101 else None)

    # Average per-corner attributes onto shared grid vertices.
    m = len(coords)
    vcoords = (coords[:, None, :] + _CORNERS[None]).reshape(-1, 3).astype(np.int64)
    key = (vcoords[:, 0] * (res + 1) + vcoords[:, 1]) * (res + 1) + vcoords[:, 2]
    uniq, inv = np.unique(key, return_inverse=True)
    nv = len(uniq)
    nattr = 4 + (3 if color is not None else 0)
    acc = np.zeros((nv, nattr), np.float64)
    cnt = np.zeros(nv, np.float64)
    attrs = np.concatenate(
        [sdf[..., None], deform] + ([color] if color is not None else []), axis=-1)
    np.add.at(acc, inv, attrs.reshape(m * 8, -1))
    np.add.at(cnt, inv, 1.0)
    acc /= cnt[:, None]
    v_sdf = acc[:, 0]
    v_col = acc[:, 4:7] if color is not None else None

    # Deformed vertex positions.
    vx = uniq // ((res + 1) * (res + 1))
    vy = (uniq // (res + 1)) % (res + 1)
    vpos = np.stack([vx, vy, uniq % (res + 1)], -1).astype(np.float64)
    vpos = vpos / res - 0.5 + (1 - 1e-8) / (2 * res) * np.tanh(acc[:, 1:4])

    # Vectorized marching tetrahedra over active cells.
    cell_vids = inv.reshape(m, 8)                      # grid-vertex ids
    tet_vids = cell_vids[:, _TETS]                     # (m, 6, 4)
    tv = v_sdf[tet_vids]                               # (m, 6, 4)
    case = ((tv < 0).astype(np.int32) * (2 ** np.arange(4))).sum(-1)
    e0 = tet_vids[:, :, _TET_EDGES[:, 0]]              # (m, 6, 6)
    e1 = tet_vids[:, :, _TET_EDGES[:, 1]]
    va, vb = v_sdf[e0], v_sdf[e1]
    denom = np.where(np.abs(vb - va) > 1e-12, vb - va, 1e-12)
    t = np.clip(-va / denom, 0.0, 1.0)[..., None]
    everts = vpos[e0] * (1 - t) + vpos[e1] * t         # (m, 6, 6, 3)
    ecols = (v_col[e0] * (1 - t) + v_col[e1] * t) if v_col is not None else None

    rows = _TET_TRI_TABLE[case].reshape(m, 6, 2, 3)    # edge ids per tri
    tri_ok = rows[..., 0] >= 0                         # (m, 6, 2)
    safe = np.maximum(rows, 0)
    # Gather triangle vertices: (m, 6, 2, 3, 3).
    tris = everts[np.arange(m)[:, None, None, None],
                  np.arange(6)[None, :, None, None], safe]
    sel = tri_ok.reshape(-1)
    vertices = tris.reshape(-1, 3, 3)[sel].reshape(-1, 3).astype(np.float32)
    if ecols is not None:
        tcols = ecols[np.arange(m)[:, None, None, None],
                      np.arange(6)[None, :, None, None], safe]
        colors = np.clip(tcols.reshape(-1, 3, 3)[sel].reshape(-1, 3), 0, 1
                         ).astype(np.float32)
    else:
        colors = np.zeros_like(vertices)
    if len(vertices) == 0:
        return empty
    faces = np.arange(len(vertices), dtype=np.int32).reshape(-1, 3)
    return vertices, faces, colors
