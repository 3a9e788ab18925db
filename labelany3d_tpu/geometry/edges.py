"""Point-map normals, depth/normal edges, and grid meshing.

Parity target: `src/batch_scripts/depth.py:36-49` (`save_moge_data`), which
builds the edge-filtered scene mesh via MoGe's utils3d helpers:
`points_to_normals`, `depth_edge(rtol=0.03)`, `normals_edge(tol=5)` and
`image_mesh` — all host numpy in the reference. Here they are batched jnp
(reduce_window neighborhoods), so edge filtering runs on device with the
rest of stage 1; only the final mesh compaction is host-side.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _window_reduce(x: jnp.ndarray, init, op, size: int = 3) -> jnp.ndarray:
    pad = size // 2
    return jax.lax.reduce_window(
        x, init, op,
        window_dimensions=(size, size),
        window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
    )


def points_to_normals(points: jnp.ndarray, mask: jnp.ndarray | None = None):
    """Per-pixel normals of an (H, W, 3) point map via neighbor cross
    products (averaged over the four pixel quadrants, utils3d-style).

    Returns (normals (H, W, 3), normals_mask (H, W)).
    """
    p = jnp.asarray(points, jnp.float32)
    h, w, _ = p.shape
    if mask is None:
        mask = jnp.all(jnp.isfinite(p), axis=-1)
    mask = jnp.asarray(mask, bool) & jnp.all(jnp.isfinite(p), axis=-1)
    safe = jnp.where(mask[..., None], p, 0.0)

    def shift(arr, dy, dx):
        return jnp.roll(arr, (-dy, -dx), axis=(0, 1))

    # Edge vectors to the four neighbors.
    dxp = shift(safe, 0, 1) - safe   # +x neighbor
    dyp = shift(safe, 1, 0) - safe   # +y neighbor
    dxm = shift(safe, 0, -1) - safe
    dym = shift(safe, -1, 0) - safe
    mxp = shift(mask, 0, 1) & mask
    myp = shift(mask, 1, 0) & mask
    mxm = shift(mask, 0, -1) & mask
    mym = shift(mask, -1, 0) & mask

    # Quadrant normals (consistent orientation toward the camera, -z-ish).
    quads = [
        (jnp.cross(dyp, dxp), myp & mxp),
        (jnp.cross(dxp, dym), mxp & mym),
        (jnp.cross(dym, dxm), mym & mxm),
        (jnp.cross(dxm, dyp), mxm & myp),
    ]
    acc = 0.0
    cnt = 0.0
    for n, m in quads:
        norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
        unit = n / jnp.maximum(norm, 1e-12)
        acc = acc + jnp.where((m & (norm[..., 0] > 1e-12))[..., None], unit, 0.0)
        cnt = cnt + (m & (norm[..., 0] > 1e-12)).astype(jnp.float32)
    normals = acc / jnp.maximum(cnt[..., None], 1.0)
    nl = jnp.linalg.norm(normals, axis=-1, keepdims=True)
    normals = normals / jnp.maximum(nl, 1e-12)
    return normals, (cnt > 0) & mask


def depth_edge(depth: jnp.ndarray, rtol: float = 0.03, mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Relative depth-discontinuity edges (utils3d `depth_edge` semantics):
    edge where (window_max - window_min) / center > rtol."""
    d = jnp.asarray(depth, jnp.float32)
    if mask is None:
        mask = jnp.isfinite(d)
    mask = jnp.asarray(mask, bool) & jnp.isfinite(d)
    big = jnp.float32(3.4e38)
    dmax = _window_reduce(jnp.where(mask, d, -big), -big, jax.lax.max)
    dmin = _window_reduce(jnp.where(mask, d, big), big, jax.lax.min)
    rel = (dmax - dmin) / jnp.maximum(jnp.abs(d), 1e-12)
    return (rel > rtol) & mask


def normals_edge(normals: jnp.ndarray, tol_deg: float = 5.0, mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Normal-discontinuity edges: max angle to a window neighbor > tol."""
    n = jnp.asarray(normals, jnp.float32)
    if mask is None:
        mask = jnp.ones(n.shape[:2], bool)
    mask = jnp.asarray(mask, bool)
    cos_tol = jnp.cos(jnp.deg2rad(tol_deg))
    # min cosine against the 8 neighbors (masked neighbors ignored).
    min_cos = jnp.ones(n.shape[:2], jnp.float32)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            nb = jnp.roll(n, (-dy, -dx), axis=(0, 1))
            mb = jnp.roll(mask, (-dy, -dx), axis=(0, 1))
            cos = jnp.sum(n * nb, axis=-1)
            min_cos = jnp.where(mb & mask, jnp.minimum(min_cos, cos), min_cos)
    return (min_cos < cos_tol) & mask


def image_mesh(points: np.ndarray, colors: np.ndarray | None, mask: np.ndarray):
    """Grid-triangulate a point map into (vertices, faces[, colors]).

    Two triangles per pixel quad whose four corners are all valid
    (utils3d `image_mesh(tri=True)` role). Host-side compaction.
    """
    pts = np.asarray(points)
    m = np.asarray(mask, bool)
    h, w = m.shape
    idx = -np.ones((h, w), np.int64)
    ys, xs = np.nonzero(m)
    idx[ys, xs] = np.arange(len(ys))
    verts = pts[ys, xs].astype(np.float32)
    cols = None if colors is None else np.asarray(colors)[ys, xs]

    q = m[:-1, :-1] & m[:-1, 1:] & m[1:, :-1] & m[1:, 1:]
    qy, qx = np.nonzero(q)
    a = idx[qy, qx]
    b = idx[qy, qx + 1]
    c = idx[qy + 1, qx]
    d = idx[qy + 1, qx + 1]
    faces = np.concatenate(
        [np.stack([a, b, c], axis=-1), np.stack([b, d, c], axis=-1)], axis=0
    ).astype(np.int32)
    return (verts, faces) if cols is None else (verts, faces, cols)


def edge_filtered_scene_mesh(
    points: np.ndarray,
    image: np.ndarray,
    depth: np.ndarray,
    mask: np.ndarray,
    depth_rtol: float = 0.03,
    normals_tol_deg: float = 5.0,
):
    """The `save_moge_data` mesh (depth.py:36-49): keep pixels that are not
    simultaneously depth edges AND normal edges; triangulate the grid."""
    normals, nmask = points_to_normals(jnp.asarray(points), jnp.asarray(mask))
    de = depth_edge(jnp.asarray(depth), depth_rtol, jnp.asarray(mask))
    ne = normals_edge(normals, normals_tol_deg, nmask)
    keep = np.asarray(jnp.asarray(mask, bool) & ~(de & ne))
    return image_mesh(points, np.asarray(image), keep)
