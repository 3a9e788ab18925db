"""Stages 2/4/5/6: enhancement, amodal completion, elevation, reconstruction.

Each stage follows the reference CLI contract and scene-dir artifacts, with
the heavyweight generative model behind a registry backend:

  * EnhanceStage (stage 2, `src/batch_scripts/enhance.py`): 4x
    super-resolution -> `enhanced/input.png`. Default backend: antialiased
    bicubic 4x (honest non-generative baseline); an InvSR-equivalent
    diffusion SR slots in under the 'enhance' registry key.
  * CompletionStage (stage 4, `src/batch_scripts/completion.py`): amodal
    crop completion -> `crops/{id}_rgba.png`. Default: passthrough —
    exactly the reference's `run.amodal_completion=None` path
    (`src/util.py:217-224`).
  * ElevationStage (stage 5, `src/batch_scripts/elevation.py`): per-object
    camera elevation -> `object_space/{id}/estimated_elevation.npy`.
    Default: 0 deg (the reference's own failure fallback,
    `src/util.py:104-106`); a Zero123+LoFTR-equivalent slots in under
    'elevation'.
  * ReconstructionStage (stage 6, `src/batch_scripts/reconstruction.py`):
    image->3D -> `object_space/{id}.glb`. Default: silhouette extrusion
    (mask -> prism mesh), a deterministic geometric baseline; the
    TRELLIS-equivalent generative backend slots in under 'reconstruction'.
"""

from __future__ import annotations

import os

import numpy as np

from labelany3d_tpu.data.meshio import Mesh, save_glb
from labelany3d_tpu.pipeline.config import PipelineConfig
from labelany3d_tpu.pipeline.scene import SceneDir, scene_dir_name


# --------------------------------------------------------------- backends

class BicubicEnhance:
    """Non-generative 4x upscale (stage-2 default backend)."""

    def __init__(self, factor: int = 4):
        self.factor = factor

    def enhance(self, image: np.ndarray) -> np.ndarray:
        from PIL import Image

        h, w = image.shape[:2]
        return np.asarray(
            Image.fromarray(image).resize((w * self.factor, h * self.factor), Image.BICUBIC)
        )


class PassthroughCompletion:
    """Reference parity for `run.amodal_completion=None` (src/util.py:223-224)."""

    def complete(self, crop_rgba: np.ndarray, label: str) -> np.ndarray:
        return crop_rgba


class ZeroElevation:
    """Reference's elevation-failure fallback (src/util.py:104-106)."""

    def estimate(self, crop_rgba: np.ndarray) -> float:
        from labelany3d_tpu.utils.logging import warn_once

        warn_once(
            "elevation_zero",
            "elevation backend is the 0-degree fallback (no Zero123 "
            "weights) — per-object camera elevation is not estimated",
        )
        return 0.0


class SilhouetteExtrude:
    """Deterministic image->3D baseline: extrude the crop mask silhouette.

    Builds a watertight prism whose front/back faces follow the mask
    contour on a coarse grid; object is centered and unit-normalized like
    generative reconstructors' outputs, so downstream registration and box
    fitting run unchanged.
    """

    def __init__(self, grid: int = 32, depth_ratio: float = 0.4):
        self.grid = grid
        self.depth_ratio = depth_ratio

    def reconstruct(self, crop_rgba: np.ndarray, label: str = "") -> Mesh:
        alpha = crop_rgba[..., 3] > 127 if crop_rgba.dtype == np.uint8 else crop_rgba[..., 3] > 0.5
        h, w = alpha.shape
        g = self.grid
        ys = (np.arange(g) * (h / g)).astype(int)
        xs = (np.arange(g) * (w / g)).astype(int)
        occ = alpha[np.ix_(ys, xs)]
        if not occ.any():
            occ = np.zeros((g, g), bool)
            occ[g // 2, g // 2] = True

        cell = 1.0 / g
        verts: list[list[float]] = []
        faces: list[list[int]] = []
        colors: list[list[float]] = []
        rgb = crop_rgba[..., :3].astype(np.float32)
        if crop_rgba.dtype == np.uint8:
            rgb = rgb / 255.0
        half_d = self.depth_ratio / 2

        def add_quad(p0, p1, p2, p3, color):
            base = len(verts)
            verts.extend([p0, p1, p2, p3])
            colors.extend([color] * 4)
            faces.extend([[base, base + 1, base + 2], [base, base + 2, base + 3]])

        for i in range(g):
            for j in range(g):
                if not occ[i, j]:
                    continue
                # normalized object coords: x right, y up, z depth
                x0 = j * cell - 0.5
                x1 = x0 + cell
                y0 = 0.5 - (i + 1) * cell
                y1 = 0.5 - i * cell
                color = rgb[ys[i], xs[j]].tolist()
                add_quad([x0, y0, half_d], [x1, y0, half_d], [x1, y1, half_d], [x0, y1, half_d], color)
                add_quad([x0, y0, -half_d], [x0, y1, -half_d], [x1, y1, -half_d], [x1, y0, -half_d], color)

                def boundary(ii, jj):
                    return not (0 <= ii < g and 0 <= jj < g and occ[ii, jj])

                if boundary(i - 1, j):  # top edge
                    add_quad([x0, y1, -half_d], [x0, y1, half_d], [x1, y1, half_d], [x1, y1, -half_d], color)
                if boundary(i + 1, j):  # bottom
                    add_quad([x0, y0, -half_d], [x1, y0, -half_d], [x1, y0, half_d], [x0, y0, half_d], color)
                if boundary(i, j - 1):  # left
                    add_quad([x0, y0, -half_d], [x0, y0, half_d], [x0, y1, half_d], [x0, y1, -half_d], color)
                if boundary(i, j + 1):  # right
                    add_quad([x1, y0, -half_d], [x1, y1, -half_d], [x1, y1, half_d], [x1, y0, half_d], color)

        return Mesh(
            vertices=np.asarray(verts, np.float32),
            faces=np.asarray(faces, np.int32),
            colors=np.asarray(colors, np.float32),
        )


# ----------------------------------------------------------------- stages

class _PerSceneStage:
    def __init__(self, cfg: PipelineConfig, loader, save_dir: str, split: str):
        self.cfg = cfg
        self.loader = loader
        self.save_dir = save_dir
        self.split = split

    def _scene(self, info: dict) -> SceneDir:
        name = scene_dir_name(info["file_name"])
        return SceneDir(os.path.join(self.save_dir, self.split, name)).ensure()


class EnhanceStage(_PerSceneStage):
    def __init__(self, cfg, loader, image_source, save_dir, split, backend=None):
        super().__init__(cfg, loader, save_dir, split)
        self.image_source = image_source
        self.backend = backend or BicubicEnhance()

    def run(self, start_index: int, end_index: int) -> int:
        from PIL import Image

        done = 0
        for i in range(start_index, end_index):
            info = self.loader.get_image_by_index(i)
            scene = self._scene(info)
            if scene.enhanced_image.exists():  # resume parity enhance.py:62-65
                continue
            img = self.image_source.get(info)
            out = self.backend.enhance(img)
            scene.enhanced_image.parent.mkdir(exist_ok=True)
            Image.fromarray(out).save(scene.enhanced_image)
            done += 1
        return done


class CompletionStage(_PerSceneStage):
    def __init__(self, cfg, loader, save_dir, split, backend=None):
        super().__init__(cfg, loader, save_dir, split)
        self.backend = backend or PassthroughCompletion()

    def run(self, start_index: int, end_index: int) -> int:
        from PIL import Image

        done = 0
        for i in range(start_index, end_index):
            info = self.loader.get_image_by_index(i)
            scene = self._scene(info)
            for obj_id in scene.list_crop_ids():
                out_path = scene.crop_completed(obj_id)
                if out_path.exists():  # resume parity completion.py:66-70
                    continue
                crop = np.asarray(Image.open(scene.crop(obj_id)))
                label = obj_id.split("_", 1)[-1].replace("_", " ")
                completed = self.backend.complete(crop, label)
                Image.fromarray(completed.astype(np.uint8)).save(out_path)
            done += 1
        return done


class ElevationStage(_PerSceneStage):
    def __init__(self, cfg, loader, save_dir, split, backend=None):
        super().__init__(cfg, loader, save_dir, split)
        self.backend = backend or ZeroElevation()

    def run(self, start_index: int, end_index: int) -> int:
        from PIL import Image

        done = 0
        for i in range(start_index, end_index):
            info = self.loader.get_image_by_index(i)
            scene = self._scene(info)
            for obj_id in scene.list_crop_ids():
                out_path = scene.elevation(obj_id)
                if out_path.exists():  # resume parity elevation.py:69-73
                    continue
                crop_path = scene.crop_completed(obj_id)
                if not crop_path.exists():
                    crop_path = scene.crop(obj_id)
                crop = np.asarray(Image.open(crop_path))
                elev = float(self.backend.estimate(crop))
                out_path.parent.mkdir(parents=True, exist_ok=True)
                np.save(out_path, np.float64(elev))
            done += 1
        return done


class ReconstructionStage(_PerSceneStage):
    def __init__(self, cfg, loader, save_dir, split, backend=None):
        super().__init__(cfg, loader, save_dir, split)
        self.backend = backend or SilhouetteExtrude()

    def run(self, start_index: int, end_index: int) -> int:
        from PIL import Image

        done = 0
        for i in range(start_index, end_index):
            info = self.loader.get_image_by_index(i)
            scene = self._scene(info)
            for obj_id in scene.list_crop_ids():
                out_path = scene.object_mesh(obj_id)
                if out_path.exists():  # resume parity reconstruction.py:71-74
                    continue
                crop_path = scene.crop_completed(obj_id)
                if not crop_path.exists():
                    crop_path = scene.crop(obj_id)
                crop = np.asarray(Image.open(crop_path))
                label = obj_id.split("_", 1)[-1].replace("_", " ")
                mesh = self.backend.reconstruct(crop, label)
                save_glb(out_path, mesh)
            done += 1
        return done
