"""Asset-to-scene registration (reference layer L4 equivalent).

Replaces `src/matching/` (GLBRenderer + ImageMatcher + PoseEstimator +
process_image_space) with a TPU-native loop: orbit-view rasterization
(`ops.rasterize`), two-view descriptor matching (`models.matcher` +
`ops.reciprocal_nn`), hypothesis-batch PnP (`geometry.pnp`), and the
median-ratio depth scale (`geometry.align`).
"""

from labelany3d_tpu.registration.cameras import opencv_orbit_pose, RENDER_K, RENDER_SIZE
from labelany3d_tpu.registration.renderer import OrbitRenderer, RenderedView
from labelany3d_tpu.registration.process import (
    register_object,
    register_objects,
    ObjectToRegister,
    align_to_depth_match,
    RegistrationResult,
)

__all__ = [
    "opencv_orbit_pose", "RENDER_K", "RENDER_SIZE", "OrbitRenderer",
    "RenderedView", "register_object", "register_objects",
    "ObjectToRegister", "align_to_depth_match", "RegistrationResult",
]
