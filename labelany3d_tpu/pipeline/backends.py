"""Model backends for pipeline stages (real Flax models or analytic fakes).

The stage code talks to a small protocol (`DepthBackend.infer`) and the
registry decides which implementation serves it — mirroring the reference's
wrapper indirection (`src/model_wrappers.py`) while making every backend
swappable in tests.
"""

from __future__ import annotations

from typing import Protocol

import jax
import jax.numpy as jnp
import numpy as np

from labelany3d_tpu.models.depth_pro import (
    DepthPro35,
    DepthPro35Config,
    DepthProConfig,
    DepthProModel,
    depth_pro35_infer,
    depth_pro_infer,
)
from labelany3d_tpu.models.moge import (
    MoGeConfig,
    MoGeModel,
    moge_infer,
    pixel_intrinsics_from_normalized,
)
from labelany3d_tpu.models.registry import register_model
from labelany3d_tpu.models.vit import ViTConfig


class DepthBackend(Protocol):
    """Batch depth inference: (B, H, W, 3) float images in [0, 1] ->
    dict(relative_depth, metric_depth, depth_mask, K_pixels)."""

    def infer(self, images: np.ndarray) -> dict: ...


class JaxDepthBackend:
    """MoGe (relative depth + intrinsics) -> DepthPro (metric, conditioned
    on MoGe's focal). One jitted program per resolution bucket.

    Stage-1 parity (`src/batch_scripts/depth.py:144-153`): MoGe recovers
    K; DepthPro gets f_px = K[0,0]; the caller aligns the two maps.
    """

    def __init__(
        self,
        moge_cfg: MoGeConfig | None = None,
        depth_pro_cfg: DepthProConfig | None = None,
        params_moge=None,
        params_depth_pro=None,
        seed: int = 0,
        use_mesh: bool | None = None,
        pin_hw: tuple | None = None,
    ):
        self.moge_cfg = moge_cfg or MoGeConfig()
        self.dp_cfg = depth_pro_cfg or DepthProConfig()
        # DepthPro35Config selects the checkpoint-faithful 35-patch model;
        # it runs at its fixed native img_size (the reference resizes
        # internally to 1536, depth_pro.py:262), so infer resizes around it.
        self._dp35 = isinstance(self.dp_cfg, DepthPro35Config)
        self.moge = MoGeModel(self.moge_cfg)
        self.depth_pro = DepthPro35(self.dp_cfg) if self._dp35 else DepthProModel(self.dp_cfg)
        self._params_moge = params_moge
        self._params_dp = params_depth_pro
        self._seed = seed
        self._jitted = {}
        # Data-parallel over all local devices when more than one is visible
        # (the batch axis shards; the partitioner replicates params).
        if use_mesh is None:
            use_mesh = jax.device_count() > 1
        self._mesh = None
        if use_mesh and jax.device_count() > 1:
            from labelany3d_tpu.parallel.mesh import make_mesh

            self._mesh = make_mesh(data=-1, model=1)
        # Pin learned pos-embed grids at construction so parameter shapes do
        # not depend on which aspect bucket reaches _ensure_params first
        # (reproducibility across dataset index ranges).
        if pin_hw is not None:
            self._pin_pos_grids(*pin_hw)

    @staticmethod
    def _cast_inference_params(params):
        """Pre-cast float32 weights to bfloat16 once: the modules compute in
        bf16 anyway, so per-call casts of hundreds of MB of f32 weights are
        pure HBM waste. Norm/scale params stay f32 (they are consumed by
        f32 norm ops)."""

        def cast(path, x):
            name = getattr(path[-1], "key", "") if path else ""
            if x.dtype == jnp.float32 and name in ("kernel", "bias"):
                return x.astype(jnp.bfloat16)
            return x

        return jax.tree_util.tree_map_with_path(cast, params)

    def _pin_pos_grids(self, h: int, w: int):
        """Pin learned pos-embed grids to the first bucket's token grid so
        later aspect buckets bicubic-interpolate (ViTConfig.pos_grid)
        instead of failing the parameter-shape check."""
        import dataclasses

        def pin(backbone, div=1):
            if backbone.pos_embed != "learned" or backbone.pos_grid is not None:
                return backbone
            p = backbone.patch_size
            return dataclasses.replace(
                backbone, pos_grid=(h // div // p, w // div // p))

        mb = pin(self.moge_cfg.backbone)
        if mb is not self.moge_cfg.backbone:
            self.moge_cfg = dataclasses.replace(self.moge_cfg, backbone=mb)
            self.moge = MoGeModel(self.moge_cfg)
        if not self._dp35:
            # DepthProModel's ViT sees half-size tiles (2x2 tiling).
            db = pin(self.dp_cfg.backbone, div=2)
            if db is not self.dp_cfg.backbone:
                self.dp_cfg = dataclasses.replace(self.dp_cfg, backbone=db)
                self.depth_pro = DepthProModel(self.dp_cfg)

    def _ensure_params(self, h: int, w: int):
        if self._params_moge is None or self._params_dp is None:
            from labelany3d_tpu.utils.logging import warn_once

            if self._params_moge is None and self._params_dp is None:
                warn_once(
                    "depth_random",
                    "depth backend runs with random-initialized weights "
                    "(no converted MoGe/DepthPro checkpoint) — depth maps "
                    "and intrinsics are not meaningful; see docs/WEIGHTS.md",
                )
        if self._params_moge is None:
            self._pin_pos_grids(h, w)
            k = jax.random.PRNGKey(self._seed)
            p = self.moge.init(k, jnp.zeros((1, h, w, 3)))["params"]
            self._params_moge = self._cast_inference_params(p)
        if self._params_dp is None:
            k = jax.random.PRNGKey(self._seed + 1)
            s = self.dp_cfg.img_size if self._dp35 else h
            p = self.depth_pro.init(
                k, jnp.zeros((1, s, s, 3) if self._dp35 else (1, h, w, 3))
            )["params"]
            self._params_dp = self._cast_inference_params(p)

    def _step(self, h: int, w: int):
        if (h, w) in self._jitted:
            return self._jitted[(h, w)]

        def step(pm, pd, images):
            if images.dtype == jnp.uint8:
                # uint8 batches normalize on device: the host keeps the
                # decoded bytes as-is and the (tunnel) transfer is 4x
                # smaller than pre-normalized f32.
                images = images.astype(jnp.float32) / 255.0
            m = moge_infer(self.moge, pm, images, apply_mask=True)
            K_pix = pixel_intrinsics_from_normalized(m["intrinsics"], w, h)
            f_px = K_pix[:, 0, 0]
            if self._dp35:
                s = self.dp_cfg.img_size
                imgs_dp = jax.image.resize(images, (images.shape[0], s, s, 3),
                                           method="bilinear")
                # focal rescales with the resize of the width axis
                d = depth_pro35_infer(self.depth_pro, pd, imgs_dp, f_px=f_px * (s / w))
                d = {"depth": jax.image.resize(d["depth"], (images.shape[0], h, w),
                                               method="bilinear")}
            else:
                d = depth_pro_infer(self.depth_pro, pd, images, f_px=f_px)
            return {
                "relative_depth": m["depth"],
                "metric_depth": d["depth"],
                "depth_mask": m["mask"],
                "K_pixels": K_pix,
            }

        fn = jax.jit(step)
        self._jitted[(h, w)] = fn
        return fn

    def infer(self, images: np.ndarray) -> dict:
        b, h, w, _ = images.shape
        self._ensure_params(h, w)
        x = jnp.asarray(images)  # uint8 stays uint8 (normalized in-step)
        if x.dtype not in (jnp.uint8, jnp.float32):
            x = x.astype(jnp.float32)
        if self._mesh is not None and b % self._mesh.shape["data"] == 0:
            from labelany3d_tpu.parallel.mesh import shard_batch

            (x,) = shard_batch(self._mesh, (x,))
        return self._step(h, w)(self._params_moge, self._params_dp, x)


class FakeDepthBackend:
    """Analytic backend for hermetic tests: the caller pre-registers the
    true depth/K for each image (by index order of `infer` calls' rows)."""

    def __init__(self, depths: np.ndarray, K: np.ndarray, relative_scale: float = 0.5):
        self.depths = np.asarray(depths, np.float32)  # (N, H, W) truth
        self.K = np.asarray(K, np.float32)
        self.relative_scale = relative_scale
        self._cursor = 0

    def infer(self, images: np.ndarray) -> dict:
        b = images.shape[0]
        sel = self.depths[self._cursor : self._cursor + b]
        self._cursor += b
        K = np.broadcast_to(self.K, (b, 3, 3))
        return {
            "relative_depth": jnp.asarray(sel * self.relative_scale),
            "metric_depth": jnp.asarray(sel),
            "depth_mask": jnp.ones_like(jnp.asarray(sel), bool),
            "K_pixels": jnp.asarray(K),
        }


class JaxMatcherBackend:
    """Production matcher: TwoViewMatcher + reciprocal NN.

    Implements the registration `MatcherBackend` protocol. Without converted
    MASt3R-equivalent weights the descriptors are untrained; registration
    then reports ok=False and the layout stage degrades gracefully.
    """

    def __init__(self, cfg=None, params=None, seed: int = 0, image_size: int = 512,
                 tiny: bool = True):
        from labelany3d_tpu.models.matcher import MatcherConfig, TwoViewMatcher

        # tiny default until converted MASt3R-equivalent weights exist —
        # random full-size descriptors match no better and cost 100x.
        self.cfg = cfg or (MatcherConfig.tiny_test() if tiny else MatcherConfig())
        self.model = TwoViewMatcher(self.cfg)
        self.params = params
        self.image_size = image_size
        self._seed = seed
        self._jitted = None
        self._jitted_batch = None

    def _ensure(self, h: int, w: int):
        if self.params is None:
            from labelany3d_tpu.utils.logging import warn_once

            warn_once(
                "matcher_random",
                "matcher backend runs with random-initialized descriptors "
                "(no converted MASt3R checkpoint) — registration poses will "
                "report ok=False; see docs/WEIGHTS.md",
            )
            self.params = self.model.init(
                jax.random.PRNGKey(self._seed),
                jnp.zeros((1, h, w, 3)), jnp.zeros((1, h, w, 3)),
            )["params"]
        if self._jitted is None:
            from labelany3d_tpu.ops.reciprocal_nn import reciprocal_nn_match

            def step(params, img0, img1):
                out = self.model.apply({"params": params}, img0[None], img1[None])
                return reciprocal_nn_match(out["desc0"][0], out["desc1"][0])

            # One forward for a whole orbit: the shared reference crop is
            # batch-1 (encoded once, tokens broadcast inside the model) and
            # the (V, H, W, 3) views batch on the MXU; the per-view
            # reciprocal-NN kernels unroll (V is static). The reference
            # runs 8 sequential bs=1 MASt3R calls per object
            # (`process_image_space.py:72-101`).
            def step_batch(params, ref, views):
                out = self.model.apply({"params": params}, ref, views)
                res = [
                    reciprocal_nn_match(out["desc0"][v], out["desc1"][v])
                    for v in range(views.shape[0])
                ]
                return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *res)

            # Whole-image batch: R reference crops x P rendered views with
            # pair p = (refs[ref_index[p]], views[p]) — R + P encoder rows
            # in ONE forward; the NN pass maps over pairs (one compiled
            # body, not P unrolled kernels).
            def step_pairs(params, refs, views, ref_index):
                out = self.model.apply({"params": params}, refs, views,
                                       ref_index=ref_index)
                return jax.lax.map(
                    lambda dd: reciprocal_nn_match(dd[0], dd[1]),
                    (out["desc0"], out["desc1"]),
                )

            self._jitted = jax.jit(step)
            self._jitted_batch = jax.jit(step_batch)
            self._jitted_pairs = jax.jit(step_pairs)

    def _prep_ref(self, ref_rgba: np.ndarray, h: int, w: int) -> np.ndarray:
        ref = np.asarray(ref_rgba, np.float32)[..., :3]
        if ref.shape[:2] != (h, w):
            from PIL import Image

            ref = np.asarray(
                Image.fromarray((ref * 255).astype(np.uint8)).resize((w, h))
            ).astype(np.float32) / 255.0
        return ref

    def match(self, ref_rgba: np.ndarray, view) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        h, w = view.rgba.shape[:2]
        self._ensure(h, w)
        ref = self._prep_ref(ref_rgba, h, w)
        res = self._jitted(
            self.params, jnp.asarray(ref), jnp.asarray(view.rgba[..., :3], jnp.float32)
        )
        return np.asarray(res.xy0), np.asarray(res.xy1), np.asarray(res.valid)

    def match_batch(self, ref_rgba: np.ndarray, views) -> list[tuple]:
        """Match the reference crop against all `views` in one forward."""
        if not views:
            return []
        h, w = views[0].rgba.shape[:2]
        self._ensure(h, w)
        ref = self._prep_ref(ref_rgba, h, w)
        refs = jnp.asarray(ref[None])  # batch-1: encoder runs it once
        imgs = jnp.asarray(
            np.stack([v.rgba[..., :3] for v in views]).astype(np.float32))
        res = self._jitted_batch(self.params, refs, imgs)
        xy0, xy1, valid = (np.asarray(res.xy0), np.asarray(res.xy1),
                           np.asarray(res.valid))
        return [(xy0[v], xy1[v], valid[v]) for v in range(len(views))]

    def match_pairs(self, refs: list[np.ndarray], views,
                    ref_index: list[int]) -> list[tuple]:
        """All of an image's (reference crop, rendered view) pairs in one
        matcher forward (`registration/process.py::register_objects`).
        Counts are bucketed (refs to a power of two, pairs to the same
        ratio) so per-image instance-count variation reuses programs."""
        if not views:
            return []
        h, w = views[0].rgba.shape[:2]
        self._ensure(h, w)
        R, P = len(refs), len(views)
        Rb = 1 << max(0, R - 1).bit_length()
        ratio = P // R if R and P % R == 0 else 0
        Pb = ratio * Rb if ratio else 1 << max(0, P - 1).bit_length()

        ref_arr = np.zeros((Rb, h, w, 3), np.float32)
        for i, r in enumerate(refs):
            ref_arr[i] = self._prep_ref(r, h, w)
        view_arr = np.zeros((Pb, h, w, 3), np.float32)
        for p, v in enumerate(views):
            view_arr[p] = v.rgba[..., :3]
        idx = np.zeros((Pb,), np.int32)
        idx[:P] = np.asarray(ref_index, np.int32)

        res = self._jitted_pairs(self.params, jnp.asarray(ref_arr),
                                 jnp.asarray(view_arr), jnp.asarray(idx))
        xy0, xy1, valid = (np.asarray(res.xy0), np.asarray(res.xy1),
                           np.asarray(res.valid))
        return [(xy0[p], xy1[p], valid[p]) for p in range(P)]


def register_default_backends() -> None:
    """Install the production factories under their registry keys."""

    def make_depth(preset: str = "large", **kw):
        if preset == "tiny_test":
            return JaxDepthBackend(MoGeConfig.tiny_test(), DepthProConfig.tiny_test(), **kw)
        if preset == "vitl_reference":
            # checkpoint-faithful graphs: load converted weights via
            # models/convert.py (docs/WEIGHTS.md) and pass params_* kwargs.
            return JaxDepthBackend(MoGeConfig.vitl(), DepthPro35Config(), **kw)
        if preset == "tiny_reference":
            return JaxDepthBackend(
                MoGeConfig.tiny_reference_test(), DepthPro35Config.tiny_test(), **kw
            )
        presets = {
            "small": ViTConfig.small,
            "base": ViTConfig.base,
            "large": ViTConfig.large,
        }
        if preset not in presets:
            raise ValueError(
                f"Unknown models.moge.preset: {preset!r} (choose small | base | "
                "large | tiny_test | vitl_reference | tiny_reference)"
            )
        backbone = presets[preset]
        return JaxDepthBackend(
            MoGeConfig(backbone=backbone(out_indices=(5, 11, 17, 23) if preset == "large" else (2, 5, 8, 11))),
            DepthProConfig(backbone=backbone()),
            **kw,
        )

    from labelany3d_tpu.pipeline.stages.generative import (
        BicubicEnhance,
        PassthroughCompletion,
        SilhouetteExtrude,
        ZeroElevation,
    )

    def make_reconstruction(backend: str = "silhouette", **kw):
        """'silhouette' (deterministic) | 'trellis' (sparse generative
        stack) | 'hunyuan3d' (multi-view diffusion + SVRM neural
        reconstructor — the reference's alternate obj_rec,
        `views_to_mesh.py:41-70`) | 'hunyuan3d_carve' (multi-view
        diffusion + deterministic visual-hull carving)."""
        if backend == "trellis":
            from labelany3d_tpu.models.trellis import TrellisPipeline, TrellisPipelineConfig

            cfg = TrellisPipelineConfig.tiny_test() if kw.get("tiny") else None
            # bf16 weight serving: the six components are 6.37 GiB in f32,
            # which with slat-program scratch OOM'd the 16 GB v5e.
            return TrellisPipeline(cfg, ckpt_dir=kw.get("ckpt_dir"),
                                   params_dtype=None if kw.get("tiny")
                                   else "bfloat16")
        if backend == "hunyuan3d":
            from labelany3d_tpu.models.svrm import SVRMConfig, SVRMReconstruction

            tiny = bool(kw.get("tiny"))
            # View source parity (`infer/image_to_views.py:50-79`): the
            # reference generates the six orbit views with the mvd_std
            # grid diffusion — the default here. views='zero123' keeps the
            # per-view Zero123 generator as an alternate.
            if kw.get("views", "mvd") == "zero123":
                from labelany3d_tpu.models.diffusion import Zero123NovelView

                nv = Zero123NovelView(tiny=tiny, image_size=64 if tiny else 256)
                nv_key = "zero123"
            else:
                from labelany3d_tpu.models.diffusion import MVDStdViews

                nv = MVDStdViews(tiny=tiny)
                nv_key = "mvd"
            params = None
            if kw.get("ckpt_dir"):
                from labelany3d_tpu.models.checkpoints import load_params

                params = load_params(kw["ckpt_dir"], "svrm")
                nv_params = load_params(kw["ckpt_dir"], nv_key)
                if nv_params is not None:
                    nv.set_params(nv_params)
            return SVRMReconstruction(
                novel_views=nv,
                cfg=SVRMConfig.tiny_test() if tiny else SVRMConfig(),
                params=params,
            )
        if backend == "hunyuan3d_carve":
            from labelany3d_tpu.models.diffusion import Zero123NovelView
            from labelany3d_tpu.models.spacecarve import SpaceCarveReconstruction

            tiny = bool(kw.get("tiny"))
            nv = Zero123NovelView(tiny=tiny, image_size=64 if tiny else 256)
            return SpaceCarveReconstruction(novel_views=nv)
        if backend != "silhouette":
            raise ValueError(
                f"Unknown obj_rec backend '{backend}' "
                "(choose trellis | hunyuan3d | hunyuan3d_carve | silhouette)"
            )
        return SilhouetteExtrude()

    def make_enhance(backend: str = "bicubic", **kw):
        if backend == "invsr":
            from labelany3d_tpu.models.diffusion import InvSREnhance

            tiny = bool(kw.get("tiny"))
            return InvSREnhance(tiny=tiny, image_size=64 if tiny else 256)
        return BicubicEnhance()

    def make_completion(backend: str = "none", **kw):
        if backend == "our":
            from labelany3d_tpu.models.diffusion import AmodalCompletion

            tiny = bool(kw.get("tiny"))
            # segment='isnet' re-segments the completed crop for the amodal
            # alpha (reference segment_completed, util.py:163-168).
            seg = kw.get("segment") in ("isnet", True)
            return AmodalCompletion(tiny=tiny, image_size=64 if tiny else 256,
                                    segmenter=True if seg else None)
        return PassthroughCompletion()

    def make_elevation(backend: str = "zero", **kw):
        if backend == "zero123":
            from labelany3d_tpu.models.diffusion import Zero123NovelView
            from labelany3d_tpu.models.elevation import MatchingElevationEstimator
            from labelany3d_tpu.registration.cameras import RENDER_K

            tiny = bool(kw.get("tiny"))
            nv = Zero123NovelView(tiny=tiny, image_size=64 if tiny else 256)
            matcher = JaxMatcherBackend()

            def pair_match(img0, img1):
                class _V:
                    rgba = np.concatenate(
                        [img1.astype(np.float32) / 255.0,
                         np.ones(img1.shape[:2] + (1,), np.float32)], axis=-1
                    )

                return matcher.match(
                    np.concatenate(
                        [img0.astype(np.float32) / 255.0,
                         np.ones(img0.shape[:2] + (1,), np.float32)], axis=-1
                    ),
                    _V(),
                )

            K = RENDER_K.copy()
            K[:2] *= nv.image_size / 512.0
            return MatchingElevationEstimator(nv, pair_match, K)
        return ZeroElevation()

    defaults = {
        "depth": make_depth,
        "enhance": make_enhance,
        "completion": make_completion,
        "elevation": make_elevation,
        "reconstruction": make_reconstruction,
        "matcher": JaxMatcherBackend,
    }
    for name, factory in defaults.items():
        try:
            register_model(name, factory)
        except ValueError:
            pass  # already registered (or overridden by a test/fake)
