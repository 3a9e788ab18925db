"""Tests for the TPU-native compute primitives (ops package)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from labelany3d_tpu.ops import (
    apply_rope_2d,
    deformable_sample,
    grid_sample,
    hilbert_decode_3d,
    hilbert_encode_3d,
    knn_distances,
    mean_knn_distance,
    morton_decode_3d,
    morton_encode_3d,
    reciprocal_nn_match,
    rope_2d_freqs,
    serialized_attention,
    windowed_attention_3d,
)


# ------------------------------------------------------------- morton/hilbert

def test_morton_roundtrip(rng):
    coords = rng.integers(0, 1024, size=(500, 3)).astype(np.int32)
    codes = morton_encode_3d(jnp.asarray(coords))
    back = np.asarray(morton_decode_3d(codes))
    np.testing.assert_array_equal(back, coords)


def test_morton_known_values():
    # (1,0,0)->1, (0,1,0)->2, (0,0,1)->4, (1,1,1)->7
    coords = jnp.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1], [2, 0, 0]])
    codes = np.asarray(morton_encode_3d(coords))
    np.testing.assert_array_equal(codes, [1, 2, 4, 7, 8])


def test_morton_locality():
    # adjacent coords differ in few bits -> codes of a 2x2x2 block are contiguous
    block = np.array([[x, y, z] for z in range(2) for y in range(2) for x in range(2)])
    codes = np.sort(np.asarray(morton_encode_3d(jnp.asarray(block))))
    np.testing.assert_array_equal(codes, np.arange(8))


def test_hilbert_roundtrip(rng):
    coords = rng.integers(0, 64, size=(300, 3)).astype(np.int32)
    codes = hilbert_encode_3d(jnp.asarray(coords), bits=6)
    back = np.asarray(hilbert_decode_3d(codes, bits=6))
    np.testing.assert_array_equal(back, coords)


def test_hilbert_is_bijective_on_small_cube():
    n = 8
    coords = np.array([[x, y, z] for x in range(n) for y in range(n) for z in range(n)])
    codes = np.asarray(hilbert_encode_3d(jnp.asarray(coords), bits=3))
    assert len(set(codes.tolist())) == n**3
    assert codes.min() == 0 and codes.max() == n**3 - 1


def test_hilbert_continuity():
    # Consecutive indices along the curve are adjacent cells (the defining
    # Hilbert property; z-order does NOT have it).
    n = 8
    coords = np.array([[x, y, z] for x in range(n) for y in range(n) for z in range(n)])
    codes = np.asarray(hilbert_encode_3d(jnp.asarray(coords), bits=3))
    order = np.argsort(codes)
    sorted_coords = coords[order]
    steps = np.abs(np.diff(sorted_coords, axis=0)).sum(axis=1)
    assert (steps == 1).all()


# ------------------------------------------------------------- reciprocal NN

def test_reciprocal_nn_identity_shift(rng):
    h, w, c = 32, 40, 16
    desc0 = rng.normal(size=(h, w, c)).astype(np.float32)
    desc0 /= np.linalg.norm(desc0, axis=-1, keepdims=True)
    shiftx = 5
    desc1 = np.roll(desc0, shiftx, axis=1)
    res = reciprocal_nn_match(jnp.asarray(desc0), jnp.asarray(desc1), subsample=8)
    v = np.asarray(res.valid)
    assert v.mean() > 0.6
    dx = np.asarray(res.xy1)[v, 0] - np.asarray(res.xy0)[v, 0]
    wrapped = np.mod(dx, w)
    assert (wrapped == shiftx).mean() > 0.95


def test_reciprocal_nn_border_filter(rng):
    desc = rng.normal(size=(16, 16, 8)).astype(np.float32)
    res = reciprocal_nn_match(jnp.asarray(desc), jnp.asarray(desc), subsample=4, border=3)
    xy = np.asarray(res.xy0)[np.asarray(res.valid)]
    assert (xy >= 3).all() and (xy < 13).all()


# ------------------------------------------------------------- knn

def test_knn_matches_bruteforce(rng):
    pts = rng.normal(size=(300, 3)).astype(np.float32)
    d2 = np.asarray(knn_distances(jnp.asarray(pts), k=3, tile=128))
    full = ((pts[:, None] - pts[None]) ** 2).sum(-1)
    np.fill_diagonal(full, np.inf)
    ref = np.sort(full, axis=1)[:, :3]
    np.testing.assert_allclose(np.sort(d2, axis=1), ref, rtol=1e-3, atol=1e-4)


def test_mean_knn_distance_grid():
    # Unit grid: each interior point's 3 NNs are at distance 1.
    pts = np.array([[x, y, 0] for x in range(10) for y in range(10)], np.float32)
    md = np.asarray(mean_knn_distance(jnp.asarray(pts), k=3))
    assert md.min() == pytest.approx(1.0, abs=1e-5)


# ------------------------------------------------------------- rope2d

def test_rope_2d_preserves_norm_and_zero_position(rng):
    n, h, d = 12, 2, 16
    tokens = rng.normal(size=(n, h, d)).astype(np.float32)
    pos = rng.integers(0, 50, size=(n, 2))
    cos, sin = rope_2d_freqs(d, jnp.asarray(pos))
    out = np.asarray(apply_rope_2d(jnp.asarray(tokens), cos, sin))
    np.testing.assert_allclose(
        np.linalg.norm(out, axis=-1), np.linalg.norm(tokens, axis=-1), rtol=1e-4
    )
    cos0, sin0 = rope_2d_freqs(d, jnp.zeros((n, 2), jnp.int32))
    out0 = np.asarray(apply_rope_2d(jnp.asarray(tokens), cos0, sin0))
    np.testing.assert_allclose(out0, tokens, atol=1e-6)


def test_rope_2d_relative_invariance(rng):
    # Dot products depend only on relative positions.
    d = 16
    a = rng.normal(size=(1, d)).astype(np.float32)
    b = rng.normal(size=(1, d)).astype(np.float32)

    def dot_at(pa, pb):
        ca, sa = rope_2d_freqs(d, jnp.asarray([pa]))
        cb, sb = rope_2d_freqs(d, jnp.asarray([pb]))
        ra = np.asarray(apply_rope_2d(jnp.asarray(a), ca, sa))
        rb = np.asarray(apply_rope_2d(jnp.asarray(b), cb, sb))
        return float((ra * rb).sum())

    assert dot_at([3, 7], [5, 9]) == pytest.approx(dot_at([13, 27], [15, 29]), abs=1e-3)


# ------------------------------------------------------------- sampling

def test_grid_sample_matches_torch(rng):
    import torch
    import torch.nn.functional as F

    img = rng.normal(size=(9, 11, 4)).astype(np.float32)
    grid = (rng.uniform(-1.2, 1.2, size=(25, 2))).astype(np.float32)
    for align in (False, True):
        ours = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid), align_corners=align))
        t_img = torch.tensor(img).permute(2, 0, 1)[None]
        t_grid = torch.tensor(grid)[None, None]
        ref = F.grid_sample(t_img, t_grid, mode="bilinear", padding_mode="zeros",
                            align_corners=align)[0, :, 0].T.numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_deformable_sample_aggregates(rng):
    lvl0 = rng.normal(size=(8, 8, 4)).astype(np.float32)
    lvl1 = rng.normal(size=(4, 4, 4)).astype(np.float32)
    q, p = 5, 3
    locs = rng.uniform(0.2, 0.8, size=(q, 2, p, 2)).astype(np.float32)
    w = rng.uniform(size=(q, 2, p)).astype(np.float32)
    w /= w.sum(axis=(1, 2), keepdims=True)
    out = np.asarray(deformable_sample([jnp.asarray(lvl0), jnp.asarray(lvl1)],
                                       jnp.asarray(locs), jnp.asarray(w)))
    assert out.shape == (q, 4)
    # weights summing to 1 over constant feature maps -> returns the constant
    const = np.full((8, 8, 4), 2.5, np.float32)
    const2 = np.full((4, 4, 4), 2.5, np.float32)
    out_c = np.asarray(deformable_sample([jnp.asarray(const), jnp.asarray(const2)],
                                         jnp.asarray(locs), jnp.asarray(w)))
    np.testing.assert_allclose(out_c, 2.5, rtol=1e-5)


# ------------------------------------------------------------- attention

def _dense_masked_attention(q, k, v, valid):
    scale = 1.0 / np.sqrt(q.shape[-1])
    out = np.zeros_like(v)
    for h in range(q.shape[1]):
        logits = (q[:, h] @ k[:, h].T) * scale
        logits = np.where(valid[None, :] & valid[:, None], logits, -1e30)
        p = np.exp(logits - logits.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        out[:, h] = p @ v[:, h]
    return out


def test_serialized_attention_single_window_matches_dense(rng):
    n, h, d = 24, 2, 8
    q = rng.normal(size=(n, h, d)).astype(np.float32)
    k = rng.normal(size=(n, h, d)).astype(np.float32)
    v = rng.normal(size=(n, h, d)).astype(np.float32)
    coords = rng.integers(0, 16, size=(n, 3)).astype(np.int32)
    valid = np.ones(n, bool)
    valid[20:] = False
    out = np.asarray(
        serialized_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                             jnp.asarray(coords), jnp.asarray(valid),
                             window_size=32)
    )
    # window covers everything -> equals dense masked attention
    ref = _dense_masked_attention(q, k, v, valid)
    np.testing.assert_allclose(out[:20], ref[:20], atol=2e-3, rtol=2e-3)


def test_serialized_attention_windows_partition(rng):
    n, h, d = 32, 1, 4
    q = rng.normal(size=(n, h, d)).astype(np.float32)
    coords = np.zeros((n, 3), np.int32)
    coords[:, 0] = np.arange(n)  # strictly increasing morton order
    valid = np.ones(n, bool)
    out = np.asarray(
        serialized_attention(jnp.asarray(q), jnp.asarray(q), jnp.asarray(q),
                             jnp.asarray(coords), jnp.asarray(valid),
                             window_size=16)
    )
    # First window's outputs must not depend on second window's tokens.
    q2 = q.copy()
    q2[16:] += 100.0
    out2 = np.asarray(
        serialized_attention(jnp.asarray(q2), jnp.asarray(q2), jnp.asarray(q2),
                             jnp.asarray(coords), jnp.asarray(valid),
                             window_size=16)
    )
    np.testing.assert_allclose(out[:16], out2[:16], atol=1e-5)
    assert np.abs(out[16:] - out2[16:]).max() > 1.0


def test_windowed_attention_3d_locality(rng):
    n, h, d = 40, 1, 4
    q = rng.normal(size=(n, h, d)).astype(np.float32)
    coords = np.zeros((n, 3), np.int32)
    coords[:20] = rng.integers(0, 4, size=(20, 3))        # window (0,0,0)
    coords[20:] = rng.integers(4, 8, size=(20, 3))        # window (1,1,1)
    valid = np.ones(n, bool)
    out = np.asarray(
        windowed_attention_3d(jnp.asarray(q), jnp.asarray(q), jnp.asarray(q),
                              jnp.asarray(coords), jnp.asarray(valid),
                              grid_size=8, window_size=4, max_per_window=32)
    )
    # Tokens of window A unaffected by perturbing window B.
    q2 = q.copy()
    q2[20:] += 50.0
    out2 = np.asarray(
        windowed_attention_3d(jnp.asarray(q2), jnp.asarray(q2), jnp.asarray(q2),
                              jnp.asarray(coords), jnp.asarray(valid),
                              grid_size=8, window_size=4, max_per_window=32)
    )
    np.testing.assert_allclose(out[:20], out2[:20], atol=1e-5)


# ------------------------------------------------------------- pallas kernel

def test_yaw_minarea_pallas_interpret_matches_jnp(rng):
    from labelany3d_tpu.geometry.boxfit import estimate_yaw_minarea
    from labelany3d_tpu.ops.boxfit_pallas import yaw_minarea_pallas
    from tests.oracles import rotate_y_np

    pts = []
    for yaw in (0.3, 1.0, -0.5, 0.0):
        cloud = (rng.uniform(-0.5, 0.5, size=(256, 3)) * np.array([3.0, 1.0, 1.2])) @ rotate_y_np(yaw).T
        pts.append(cloud[:, [0, 2]])
    pts = np.stack(pts).astype(np.float32)
    valid = np.ones(pts.shape[:2], bool)
    yaws_p = np.asarray(yaw_minarea_pallas(jnp.asarray(pts), jnp.asarray(valid), interpret=True))
    yaws_j = np.asarray(estimate_yaw_minarea(jnp.asarray(pts), jnp.asarray(valid)))

    def area(p, a):
        c, s = np.cos(a), np.sin(a)
        u = c * p[:, 0] + s * p[:, 1]
        w = -s * p[:, 0] + c * p[:, 1]
        return (u.max() - u.min()) * (w.max() - w.min())

    for i in range(4):
        assert area(pts[i], yaws_p[i]) <= area(pts[i], yaws_j[i]) * 1.01


def test_serialized_attention_shift_moves_window_boundary(rng):
    from labelany3d_tpu.ops.attention import serialized_attention

    n, h, d = 32, 1, 4
    q = rng.normal(size=(n, h, d)).astype(np.float32)
    coords = np.zeros((n, 3), np.int32)
    coords[:, 0] = np.arange(n)
    valid = np.ones(n, bool)
    base = dict(window_size=16)
    out0 = np.asarray(serialized_attention(
        jnp.asarray(q), jnp.asarray(q), jnp.asarray(q),
        jnp.asarray(coords), jnp.asarray(valid), shift=0, **base))
    out8 = np.asarray(serialized_attention(
        jnp.asarray(q), jnp.asarray(q), jnp.asarray(q),
        jnp.asarray(coords), jnp.asarray(valid), shift=8, **base))
    # With shift=8 the windows are [8:24) and [24:8) (wrapped): token 12
    # now attends with tokens 8..23 instead of 0..15 -> output changes.
    assert np.abs(out0[12] - out8[12]).max() > 1e-4
    # Determinism per configuration.
    out8b = np.asarray(serialized_attention(
        jnp.asarray(q), jnp.asarray(q), jnp.asarray(q),
        jnp.asarray(coords), jnp.asarray(valid), shift=8, **base))
    np.testing.assert_allclose(out8, out8b, atol=0)


def test_auction_tied_benefits(rng):
    from labelany3d_tpu.export.hungarian import auction_assignment

    benefit = np.ones((4, 6), np.float32)  # fully tied
    out = np.asarray(auction_assignment(jnp.asarray(benefit), eps=1e-3))
    assert (out >= 0).all()
    assert len(set(out.tolist())) == 4  # still a valid injection


def test_nn_argmax_tiled_matches_dense(rng):
    """Pallas argmax-NN kernel (interpret mode) == dense argmax, including
    tie-breaking (first max), odd sizes, and bank padding masking."""
    from labelany3d_tpu.ops.reciprocal_nn import nn_argmax_tiled

    q = rng.normal(size=(70, 24)).astype(np.float32)
    b = rng.normal(size=(300, 24)).astype(np.float32)
    b[37] = b[81]  # exact duplicate rows: ties must pick the first index
    idx, best = nn_argmax_tiled(
        jnp.asarray(q), jnp.asarray(b), block_s=32, block_n=128,
        precision="f32", interpret=True,
    )
    sim = q @ b.T
    np.testing.assert_array_equal(np.asarray(idx), sim.argmax(1))
    np.testing.assert_allclose(np.asarray(best), sim.max(1), rtol=1e-6)
    # Both reduction levels live: inner sub-tiles within a grid step AND
    # the cross-grid-step running update (n > block_n * inner_tiles).
    idx2, best2 = nn_argmax_tiled(
        jnp.asarray(q), jnp.asarray(b), block_s=32, block_n=64,
        inner_tiles=2, precision="f32", interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(idx2), sim.argmax(1))
    np.testing.assert_allclose(np.asarray(best2), sim.max(1), rtol=1e-6)


def test_nn_argmax_tiled_bf16x3_accuracy(rng):
    """bf16x3 decomposition stays ~f32-accurate on unit descriptors."""
    from labelany3d_tpu.ops.reciprocal_nn import nn_argmax_tiled

    q = rng.normal(size=(40, 24)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    b = rng.normal(size=(200, 24)).astype(np.float32)
    b /= np.linalg.norm(b, axis=-1, keepdims=True)
    idx, best = nn_argmax_tiled(
        jnp.asarray(q), jnp.asarray(b), block_s=32, block_n=128,
        precision="bf16x3", interpret=True,
    )
    sim = q @ b.T
    np.testing.assert_array_equal(np.asarray(idx), sim.argmax(1))
    np.testing.assert_allclose(np.asarray(best), sim.max(1), atol=1e-5)
