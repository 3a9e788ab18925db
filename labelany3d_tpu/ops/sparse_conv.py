"""Submanifold sparse 3D convolution via dense-index gather/scatter.

Replaces spconv/torchsparse (SURVEY.md §2B): TRELLIS's SLat transformer
downsamples/convolves sparse voxel features with spconv
(`trellis/modules/sparse/__init__.py:3-27`). On TPU, hash-based neighbor
lookup becomes a dense int32 index volume (64^3 = 1 MB) built by scatter;
each kernel offset is then a gather + (N, Cin) x (Cin, Cout) matmul —
27 MXU matmuls for a 3^3 kernel, no host-side rulebooks.

Active-set semantics are *submanifold*: outputs live on the same voxel set
as inputs (TRELLIS's conv usage); a strided variant pools to a coarser
active set.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from labelany3d_tpu.utils.precision import f32_precision


def build_index_grid(coords: jnp.ndarray, valid: jnp.ndarray, grid_size: int) -> jnp.ndarray:
    """(N, 3) active voxel coords -> (G, G, G) int32 index map (-1 = empty)."""
    n = coords.shape[0]
    grid = jnp.full((grid_size, grid_size, grid_size), -1, jnp.int32)
    safe = jnp.clip(coords, 0, grid_size - 1)
    idx = jnp.arange(n, dtype=jnp.int32)
    # Invalid rows write out of range -> dropped.
    cx = jnp.where(valid, safe[:, 0], grid_size)
    return grid.at[cx, safe[:, 1], safe[:, 2]].set(idx, mode="drop")


@f32_precision
def subm_sparse_conv3d(
    features: jnp.ndarray,
    coords: jnp.ndarray,
    valid: jnp.ndarray,
    weights: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    grid_size: int = 64,
) -> jnp.ndarray:
    """Submanifold sparse conv: (N, Cin) x (K, K, K, Cin, Cout) -> (N, Cout).

    Neighbors outside the active set contribute zero (spconv subm parity).
    """
    n, cin = features.shape
    k = weights.shape[0]
    cout = weights.shape[-1]
    half = k // 2
    grid = build_index_grid(coords, valid, grid_size)
    # When the conv shrinks channels (Cout < Cin), run the matmul FIRST and
    # gather the (N, Cout) products instead of the (N, Cin) inputs: the
    # gather bytes drop by Cin/Cout (profiled 10 ms/step HBM-bound on the
    # SLat out0 2048->128 conv at 8192 voxels) at identical matmul FLOPs.
    # Neighbor indices only ever point at valid rows (the index grid is
    # built from valid coords), so masking stays on the gather side.
    matmul_first = cout < cin
    feats0 = jnp.concatenate([features, jnp.zeros((1, cin), features.dtype)], axis=0)

    out = 0.0
    for dz in range(k):
        for dy in range(k):
            for dx in range(k):
                off = jnp.array([dx - half, dy - half, dz - half], jnp.int32)
                nb = coords + off
                inside = jnp.all((nb >= 0) & (nb < grid_size), axis=-1) & valid
                nbc = jnp.clip(nb, 0, grid_size - 1)
                nb_idx = grid[nbc[:, 0], nbc[:, 1], nbc[:, 2]]
                nb_idx = jnp.where(inside & (nb_idx >= 0), nb_idx, n)  # n -> zero row
                if matmul_first:
                    prod = feats0 @ weights[dx, dy, dz]  # (N + 1, Cout)
                    out = out + prod[nb_idx]
                else:
                    gathered = feats0[nb_idx]  # (N, Cin)
                    out = out + gathered @ weights[dx, dy, dz]
    if bias is not None:
        out = out + bias
    return jnp.where(valid[:, None], out, 0.0)


def sparse_downsample(
    features: jnp.ndarray,
    coords: jnp.ndarray,
    valid: jnp.ndarray,
    factor: int = 2,
    reduce: str = "mean",
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pool active voxels to a coarser grid (strided sparse conv's role).

    Returns (pooled_features (N, C), coarse_coords (N, 3), out_valid (N,))
    on the same slot budget: each *first* voxel of a coarse cell (by slot
    order) carries the cell's reduced feature; duplicates are invalidated.
    """
    n, c = features.shape
    coarse = coords // factor
    key = (coarse[:, 0] * 100000 + coarse[:, 1] * 300 + coarse[:, 2]).astype(jnp.int32)
    key = jnp.where(valid, key, jnp.int32(2**30))
    order = jnp.argsort(key)
    sk = key[order]
    first_pos = jnp.searchsorted(sk, sk, side="left")
    is_first = first_pos == jnp.arange(n)

    # Segment-reduce features into the first slot of each cell.
    seg_start = first_pos  # index (in sorted order) of the segment head
    sorted_feats = features[order]
    sums = jnp.zeros((n, c), features.dtype).at[seg_start].add(sorted_feats)
    counts = jnp.zeros((n,), jnp.float32).at[seg_start].add(1.0)
    if reduce == "mean":
        pooled_sorted = sums / jnp.maximum(counts[:, None], 1.0)
    elif reduce == "sum":
        pooled_sorted = sums
    else:
        raise ValueError(reduce)

    inv = jnp.argsort(order)
    pooled = pooled_sorted[inv]
    out_valid = is_first[inv] & valid
    return pooled, coarse, out_valid


def sparse_pool_pair(
    features: jnp.ndarray,
    coords: jnp.ndarray,
    valid: jnp.ndarray,
    factor: int,
    grid_size: int,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Mean-pool voxels into parent cells, keeping the child->parent map.

    The fixed-slot equivalent of TRELLIS `SparseDownsample` paired with
    `SparseUpsample` (`modules/sparse/spatial.py:13-84`): parents are
    ordered by ascending linear cell code (matching the reference's
    `code.unique()` order), child slots record their parent index so the
    paired upsample is a plain gather.

    Returns (parent_feats (N, C), parent_coords (N, 3), parent_valid (N,),
    child2parent (N,) int32). Parent slots beyond the number of occupied
    cells are invalid.
    """
    n, c = features.shape
    g = grid_size // factor
    pc = coords // factor
    code = ((pc[:, 0] * g + pc[:, 1]) * g + pc[:, 2]).astype(jnp.int32)
    code = jnp.where(valid, code, jnp.int32(g * g * g))  # invalid -> sentinel
    order = jnp.argsort(code)
    sc = code[order]
    is_first = jnp.concatenate([jnp.ones((1,), bool), sc[1:] != sc[:-1]])
    pidx_sorted = jnp.cumsum(is_first) - 1  # parent slot per sorted child
    child2parent = jnp.zeros((n,), jnp.int32).at[order].set(
        pidx_sorted.astype(jnp.int32))

    vf = jnp.where(valid[:, None], features, 0.0)
    psum = jnp.zeros((n, c), features.dtype).at[child2parent].add(vf)
    pcnt = jnp.zeros((n,), jnp.float32).at[child2parent].add(
        valid.astype(jnp.float32))
    parent_feats = psum / jnp.maximum(pcnt[:, None], 1.0)
    parent_valid = pcnt > 0

    parent_coords = jnp.zeros((n, 3), jnp.int32).at[child2parent].set(
        pc.astype(jnp.int32))
    parent_coords = jnp.where(parent_valid[:, None], parent_coords, 0)
    return parent_feats, parent_coords, parent_valid, child2parent


def sparse_unpool(parent_feats: jnp.ndarray, child2parent: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor unpool: each child gathers its parent's feature
    (TRELLIS `SparseUpsample` parity).

    The parent array may be SLICED to a static torso-slot budget smaller
    than the child slot count (see `SLatFlowModel` torso compaction);
    children whose parent index falls beyond the slice (only possible when
    the caller under-budgeted, or for the pad-children's sentinel parent)
    gather zero instead of a clamped neighbor's feature.
    """
    m = parent_feats.shape[0]
    idx = jnp.minimum(child2parent, m - 1)
    out = parent_feats[idx]
    return jnp.where((child2parent < m)[:, None], out, jnp.zeros_like(out))
