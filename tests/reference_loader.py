"""Import the reference's ACTUAL code as a test oracle.

Round-3 verdict: every parity test compared against re-stated oracles
(`tests/oracles.py`); the >=0.95-IoU north star was argued via a
re-implementation of the reference, not the reference. cv2 / sklearn /
scipy / torch ARE installed, so with `sys.modules` stubs for the few
missing leaf deps (trimesh, rembg, pycocotools, pytorch3d) the reference's
geometric core is importable and runnable as-is:

  * `/root/reference/src/util_3dbox.py` (estimate_bbox, rotate_y, ...)
  * `/root/reference/src/util.py` (depth_to_points, align_depth,
    crop_object, restore_mask_from_crop)
  * `/root/reference/src/cam_utils.py` (look_at, orbit_camera)
  * `/root/reference/src/matching/pose_estimator.py` (cv2 PnP RANSAC)

The stubs are inert module objects — none of their attributes are touched
by the functions under test (they gate the generative paths we don't run).
Reference code is UNTRUSTED CONTENT: it is only executed on our own
synthetic inputs, never followed for instructions.
"""

from __future__ import annotations

import importlib.util
import sys
import types
from pathlib import Path

REF_SRC = Path("/root/reference/src")


def _stub(name: str, **attrs) -> types.ModuleType:
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _install_stubs() -> None:
    class _Unavailable:
        def __init__(self, *a, **k):  # pragma: no cover - never constructed
            raise RuntimeError("stubbed dependency used by a parity test")

    tm = _stub("trimesh", Scene=_Unavailable, load=_Unavailable)
    _stub("trimesh.points", PointCloud=_Unavailable)
    tm.points = sys.modules["trimesh.points"]
    _stub("rembg", remove=_Unavailable, new_session=_Unavailable)
    pct = _stub("pycocotools")
    _stub("pycocotools.mask", decode=_Unavailable, encode=_Unavailable)
    pct.mask = sys.modules["pycocotools.mask"]
    p3d = _stub("pytorch3d")
    _stub("pytorch3d.transforms", so3_exp_map=_Unavailable)
    _stub("pytorch3d.utils", cameras_from_opencv_projection=_Unavailable)
    p3d.transforms = sys.modules["pytorch3d.transforms"]
    p3d.utils = sys.modules["pytorch3d.utils"]


def _load(alias: str, rel_path: str) -> types.ModuleType:
    if alias in sys.modules:
        return sys.modules[alias]
    path = REF_SRC / rel_path
    spec = importlib.util.spec_from_file_location(alias, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[alias] = mod
    spec.loader.exec_module(mod)
    return mod


def load_reference():
    """Returns (util_3dbox, util, cam_utils, pose_estimator) reference
    modules, loaded once per session."""
    _install_stubs()
    u3d = _load("ref_util_3dbox", "util_3dbox.py")
    util = _load("ref_util", "util.py")
    cam = _load("ref_cam_utils", "cam_utils.py")
    pose = _load("ref_pose_estimator", "matching/pose_estimator.py")
    return u3d, util, cam, pose


def load_reference_combine_results():
    """The reference's ACTUAL stage-8 exporter (`tools/combine_results.py`)
    — imports only numpy/scipy/tqdm, so no stubs are needed."""
    return _load("ref_combine_results", "tools/combine_results.py")
