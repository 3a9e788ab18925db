"""Camera-elevation estimation from novel views (elev_est equivalent).

Parity target: `external/One-2-3-45/elevation_estimate/utils/elev_est_api.py`
(:196-205) + `src/util.py:78-107` in the reference repo: Zero123 renders 4
nearby views (d_elev +-10, d_azim +-10); LoFTR matches view pairs; the
input camera's elevation is solved from the matches; the pipeline stores
(elev - 90) and feeds -elevation to the stage-7 orbit renders.

TPU-native re-design: instead of LoFTR + nonlinear solving, correspondences
come from the framework matcher (reciprocal NN over descriptor maps) and
the elevation is recovered by a *fundamental-matrix grid search*: for each
candidate base elevation, the relative poses of the 4 views are known in
closed form (orbit geometry), so each pair's fundamental matrix is
determined; the candidate minimizing the median epipolar error wins. Fixed
candidate grid -> fully batched and jittable.
"""

from __future__ import annotations

import numpy as np

from labelany3d_tpu.registration.cameras import opencv_orbit_pose

# The 4 view deltas used by the reference (src/util.py:84-85).
VIEW_DELTAS = [(-10.0, 0.0), (10.0, 0.0), (0.0, -10.0), (0.0, 10.0)]
_PAIRS = [(0, 1), (2, 3), (0, 2), (1, 3)]


def _fundamental(K: np.ndarray, R0, t0, R1, t1) -> np.ndarray:
    """F mapping view0 pixels to view1 epipolar lines."""
    R = R1 @ R0.T
    t = t1 - R @ t0
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    Kinv = np.linalg.inv(K)
    return Kinv.T @ tx @ R @ Kinv


def epipolar_error(F: np.ndarray, xy0: np.ndarray, xy1: np.ndarray) -> np.ndarray:
    """Symmetric epipolar distance per correspondence."""
    ones = np.ones((len(xy0), 1))
    p0 = np.concatenate([xy0, ones], axis=1)
    p1 = np.concatenate([xy1, ones], axis=1)
    l1 = p0 @ F.T  # lines in image 1
    l0 = p1 @ F
    num = np.abs(np.sum(p1 * l1, axis=1))
    d1 = num / np.maximum(np.hypot(l1[:, 0], l1[:, 1]), 1e-9)
    d0 = num / np.maximum(np.hypot(l0[:, 0], l0[:, 1]), 1e-9)
    return 0.5 * (d0 + d1)


class MatchingElevationEstimator:
    """Stage-5 backend: novel views + matching -> elevation (degrees).

    `novel_views` generates the 4 delta views from the crop;
    `pair_matcher(img0, img1) -> (xy0, xy1, valid)` supplies matches.
    """

    def __init__(self, novel_views, pair_matcher, K: np.ndarray,
                 candidates=np.arange(-80.0, 81.0, 2.0), radius: float = 1.5):
        self.novel_views = novel_views
        self.pair_matcher = pair_matcher
        self.K = np.asarray(K, np.float64)
        self.candidates = np.asarray(candidates, np.float64)
        self.radius = radius

    def estimate(self, crop_rgba: np.ndarray) -> float:
        views = [
            self.novel_views.generate(crop_rgba, de, da, seed=i)
            for i, (de, da) in enumerate(VIEW_DELTAS)
        ]
        matches = []
        for i, j in _PAIRS:
            xy0, xy1, valid = self.pair_matcher(views[i], views[j])
            if valid.sum() >= 8:
                matches.append((i, j, xy0[valid], xy1[valid]))
        if not matches:
            return 0.0  # reference fallback (src/util.py:104-106)

        best_err, best_elev = np.inf, 0.0
        for elev in self.candidates:
            errs = []
            for i, j, xy0, xy1 in matches:
                de_i, da_i = VIEW_DELTAS[i]
                de_j, da_j = VIEW_DELTAS[j]
                R0, t0 = opencv_orbit_pose(elev + de_i, da_i, self.radius)
                R1, t1 = opencv_orbit_pose(elev + de_j, da_j, self.radius)
                F = _fundamental(self.K, R0, t0, R1, t1)
                errs.append(np.median(epipolar_error(F, xy0, xy1)))
            err = float(np.mean(errs))
            if err < best_err:
                best_err, best_elev = err, float(elev)
        return best_elev
