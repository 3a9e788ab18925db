"""Tile-based triangle rasterizer (PyTorch3D MeshRasterizer equivalent).

The reference renders object meshes with PyTorch3D's CUDA rasterizer for the
matching loop (`src/matching/renderer.py:19-106`: 512^2, fx=fy=560.44,
principal point (256,256), 8 orbit views at distance 1.5, ambient-only
shading == interpolated albedo, zbuf depth with -1 background).

TPU-native two-phase design (nvdiffrast-style coarse-to-fine, both phases
static-shape):
  1. coarse: per-tile face lists via a (tiles x faces) bbox-overlap test +
     top-k (capacity-capped, deterministic by face index);
  2. fine: per-pixel edge functions against the tile's face list,
     perspective-correct depth + barycentrics, nearest-z wins.

Camera convention is OpenCV pinhole (x right, y down, z forward) — unlike
PyTorch3D's screen convention, so the reference's 512-x/512-y coordinate
flips (`src/matching/matcher.py:79-84`) are unnecessary downstream.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from labelany3d_tpu.utils.precision import f32_precision


class RasterOut(NamedTuple):
    depth: jnp.ndarray     # (H, W) view-space z; -1 where no face (zbuf parity)
    face_id: jnp.ndarray   # (H, W) int32; -1 background
    bary: jnp.ndarray      # (H, W, 3) perspective-correct barycentrics


@f32_precision
def rasterize_mesh(
    verts_cam: jnp.ndarray,
    faces: jnp.ndarray,
    K: jnp.ndarray,
    image_size: tuple[int, int],
    tile: int = 16,
    faces_per_tile: int = 512,
    eps_z: float = 1e-6,
) -> RasterOut:
    """Rasterize camera-space triangles; see module docstring.

    verts_cam: (V, 3) view-space vertices (z forward).
    faces: (F, 3) int32.
    """
    h, w = image_size
    verts_cam = jnp.asarray(verts_cam, jnp.float32)
    faces = jnp.asarray(faces, jnp.int32)
    K = jnp.asarray(K, jnp.float32)

    z = verts_cam[:, 2]
    safe_z = jnp.where(jnp.abs(z) > eps_z, z, eps_z)
    u = K[0, 0] * verts_cam[:, 0] / safe_z + K[0, 2]
    v = K[1, 1] * verts_cam[:, 1] / safe_z + K[1, 2]

    tri_u = u[faces]          # (F, 3)
    tri_v = v[faces]
    tri_z = z[faces]
    front = jnp.all(tri_z > eps_z, axis=-1)  # near-plane clip (whole-face)

    big = jnp.float32(1e9)
    bb_x0 = jnp.where(front, jnp.min(tri_u, axis=-1), big)
    bb_x1 = jnp.where(front, jnp.max(tri_u, axis=-1), -big)
    bb_y0 = jnp.where(front, jnp.min(tri_v, axis=-1), big)
    bb_y1 = jnp.where(front, jnp.max(tri_v, axis=-1), -big)

    ty = h // tile
    tx = w // tile
    tiles_y0 = jnp.arange(ty, dtype=jnp.float32) * tile
    tiles_x0 = jnp.arange(tx, dtype=jnp.float32) * tile
    ov_y = (bb_y0[None, :] <= tiles_y0[:, None] + tile) & (bb_y1[None, :] >= tiles_y0[:, None])
    ov_x = (bb_x0[None, :] <= tiles_x0[:, None] + tile) & (bb_x1[None, :] >= tiles_x0[:, None])
    overlap = ov_y[:, None, :] & ov_x[None, :, :]          # (Ty, Tx, F)
    overlap = overlap.reshape(ty * tx, -1)

    f = faces.shape[0]
    cap = min(faces_per_tile, f)
    # Deterministic tile lists: the cap lowest-indexed overlapping faces.
    score = jnp.where(overlap, -jnp.arange(f, dtype=jnp.float32)[None, :], -jnp.inf)
    top_score, top_idx = jax.lax.top_k(score, cap)          # (T, cap)
    tile_valid = jnp.isfinite(top_score)
    tile_faces = jnp.where(tile_valid, top_idx, 0)

    # Precompute per-face raster quantities, gathered per tile.
    au, av, az = tri_u[:, 0], tri_v[:, 0], tri_z[:, 0]
    bu, bv, bz = tri_u[:, 1], tri_v[:, 1], tri_z[:, 1]
    cu, cv, cz = tri_u[:, 2], tri_v[:, 2], tri_z[:, 2]
    area = (bu - au) * (cv - av) - (bv - av) * (cu - au)    # signed 2x area

    def raster_tile(t_idx, f_idx, f_ok):
        ty_i = t_idx // tx
        tx_i = t_idx % tx
        py = ty_i * tile + jnp.arange(tile, dtype=jnp.float32) + 0.5
        px = tx_i * tile + jnp.arange(tile, dtype=jnp.float32) + 0.5
        pyy, pxx = jnp.meshgrid(py, px, indexing="ij")      # (tile, tile)
        P = tile * tile
        pxx = pxx.reshape(P, 1)
        pyy = pyy.reshape(P, 1)

        fa_u, fa_v, fa_z = au[f_idx][None], av[f_idx][None], az[f_idx][None]
        fb_u, fb_v, fb_z = bu[f_idx][None], bv[f_idx][None], bz[f_idx][None]
        fc_u, fc_v, fc_z = cu[f_idx][None], cv[f_idx][None], cz[f_idx][None]
        f_area = area[f_idx][None]

        # Edge functions -> barycentrics (sign-normalized by face area).
        w0 = (fb_u - pxx) * (fc_v - pyy) - (fb_v - pyy) * (fc_u - pxx)
        w1 = (fc_u - pxx) * (fa_v - pyy) - (fc_v - pyy) * (fa_u - pxx)
        w2 = (fa_u - pxx) * (fb_v - pyy) - (fa_v - pyy) * (fb_u - pxx)
        denom = jnp.where(jnp.abs(f_area) > 1e-12, f_area, 1e-12)
        b0 = w0 / denom
        b1 = w1 / denom
        b2 = w2 / denom
        inside = (b0 >= 0) & (b1 >= 0) & (b2 >= 0) & f_ok[None, :] & (jnp.abs(f_area) > 1e-12)

        # Perspective-correct depth: 1/z interpolates linearly in screen.
        inv_z = b0 / fa_z + b1 / fb_z + b2 / fc_z
        depth = 1.0 / jnp.maximum(inv_z, 1e-12)
        depth = jnp.where(inside, depth, jnp.inf)

        best = jnp.argmin(depth, axis=-1)                   # (P,)
        hit = jnp.isfinite(jnp.take_along_axis(depth, best[:, None], axis=-1)[:, 0])
        bsel = lambda arr: jnp.take_along_axis(arr, best[:, None], axis=-1)[:, 0]  # noqa: E731
        zbuf = jnp.where(hit, bsel(depth), -1.0)
        fid = jnp.where(hit, f_idx[best], -1)
        # Perspective-correct barycentrics for attribute interpolation.
        pb0 = bsel(b0) / bsel(jnp.broadcast_to(fa_z, depth.shape)) * zbuf
        pb1 = bsel(b1) / bsel(jnp.broadcast_to(fb_z, depth.shape)) * zbuf
        pb2 = bsel(b2) / bsel(jnp.broadcast_to(fc_z, depth.shape)) * zbuf
        bary = jnp.stack([pb0, pb1, pb2], axis=-1)
        bary = jnp.where(hit[:, None], bary, 0.0)
        return (
            zbuf.reshape(tile, tile),
            fid.reshape(tile, tile),
            bary.reshape(tile, tile, 3),
        )

    t_ids = jnp.arange(ty * tx, dtype=jnp.int32)
    zb, fid, bary = jax.vmap(raster_tile)(t_ids, tile_faces, tile_valid)
    zb = zb.reshape(ty, tx, tile, tile).transpose(0, 2, 1, 3).reshape(h, w)
    fid = fid.reshape(ty, tx, tile, tile).transpose(0, 2, 1, 3).reshape(h, w)
    bary = bary.reshape(ty, tx, tile, tile, 3).transpose(0, 2, 1, 3, 4).reshape(h, w, 3)
    return RasterOut(depth=zb, face_id=fid, bary=bary)


def shade_vertex_colors(
    raster: RasterOut,
    faces: jnp.ndarray,
    vertex_colors: jnp.ndarray | None,
    num_vertices: int | None = None,
) -> jnp.ndarray:
    """Interpolate per-vertex colors -> (H, W, 4) RGBA in [0, 1].

    Ambient-only shading parity with the reference's HardPhongShader setup
    (ambient 1, diffuse/specular 0 -> plain albedo,
    `src/matching/renderer.py:52-58`); white albedo when colors are absent.
    """
    hit = raster.face_id >= 0
    fid = jnp.maximum(raster.face_id, 0)
    tri = faces[fid]                       # (H, W, 3)
    if vertex_colors is None:
        rgb = jnp.ones(raster.depth.shape + (3,), jnp.float32)
    else:
        src = jnp.asarray(vertex_colors)
        cols = src.astype(jnp.float32)
        if jnp.issubdtype(src.dtype, jnp.integer):
            cols = cols / 255.0  # uint8 colors; float colors assumed [0, 1]
        cols = cols[..., :3]
        c = cols[tri]                      # (H, W, 3, 3)
        rgb = jnp.einsum("hwk,hwkc->hwc", raster.bary, c)
    alpha = hit.astype(jnp.float32)[..., None]
    return jnp.concatenate([rgb * alpha, alpha], axis=-1)
