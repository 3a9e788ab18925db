"""Batched, jit-friendly geometric core.

Every function here is pure jnp: static shapes, no data-dependent Python
control flow, explicit validity masks for padded data. All public APIs are
batched-first (leading batch dims broadcast) so the whole geometric stage of
the labeling pipeline compiles into one XLA program.

Functional parity targets are cited per-function against the reference
implementation (`/root/reference/src/...`), which runs the same math as
unbatched CPU numpy/sklearn/OpenCV.
"""

from labelany3d_tpu.geometry.transforms import (
    normalize,
    rotate_y,
    rotation_matrix_from_vectors,
    so3_exp,
    so3_log,
    skew,
)
from labelany3d_tpu.geometry.camera import (
    look_at,
    orbit_camera,
    intrinsics_from_focal_center,
    project_points,
    point_to_plane_distance,
)
from labelany3d_tpu.geometry.backproject import (
    pixel_grid,
    depth_to_points,
    backproject_directions,
)
from labelany3d_tpu.geometry.reductions import (
    masked_mean,
    masked_median,
    masked_min,
    masked_max,
    masked_mad,
)
from labelany3d_tpu.geometry.align import (
    fit_linear_1d,
    ransac_linear_1d,
    align_depth_affine,
    median_ratio_scale,
    DEPTH_SENTINEL,
)
from labelany3d_tpu.geometry.boxfit import (
    convert_box_vertices,
    estimate_yaw_pca,
    estimate_yaw_minarea,
    estimate_bbox,
    fit_boxes_batch,
    upright_rotation,
    BoxEstimate,
)
from labelany3d_tpu.geometry.crops import (
    mask_bounding_rect,
    crop_object_params,
    crop_resample,
    restore_mask_from_crop,
    crop_to_image_coords,
    CropParams,
)
from labelany3d_tpu.geometry.masks import (
    analyze_mask,
    mask_max_height,
    filter_instances,
)
from labelany3d_tpu.geometry.procrustes import (
    umeyama,
    kabsch,
)
from labelany3d_tpu.geometry.pnp import (
    solve_pnp_dlt,
    refine_pose_gauss_newton,
    solve_pnp_ransac,
    reprojection_error,
)
from labelany3d_tpu.geometry.focal import (
    normalized_view_plane_uv,
    recover_focal_shift,
)

__all__ = [
    "normalize", "rotate_y", "rotation_matrix_from_vectors", "so3_exp",
    "so3_log", "skew", "look_at", "orbit_camera",
    "intrinsics_from_focal_center", "project_points",
    "point_to_plane_distance", "pixel_grid", "depth_to_points",
    "backproject_directions", "masked_mean", "masked_median", "masked_min",
    "masked_max", "masked_mad", "fit_linear_1d", "ransac_linear_1d",
    "align_depth_affine", "median_ratio_scale", "DEPTH_SENTINEL",
    "convert_box_vertices", "estimate_yaw_pca", "estimate_yaw_minarea",
    "estimate_bbox", "fit_boxes_batch", "upright_rotation", "BoxEstimate",
    "mask_bounding_rect", "crop_object_params", "crop_resample",
    "restore_mask_from_crop", "crop_to_image_coords", "CropParams",
    "analyze_mask",
    "mask_max_height", "filter_instances", "umeyama", "kabsch",
    "solve_pnp_dlt", "refine_pose_gauss_newton", "solve_pnp_ransac",
    "reprojection_error", "normalized_view_plane_uv", "recover_focal_shift",
]
