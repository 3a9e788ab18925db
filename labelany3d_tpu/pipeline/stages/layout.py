"""Stage 7: scene layout — register generated meshes + ground-aligned boxes.

Parity target: `src/batch_scripts/whole.py` + `src/util_3dbox.py:231-294`:
per object, restore the full-image mask from its crop, register the
generated mesh into the scene (MASt3R-match + PnP + median-depth scale),
apply the placement, the camera pose, and the convention flip
diag(-1,-1,1); export per-object and full-scene meshes; then fit
ground-aligned oriented boxes from 500 surface samples per mesh (canonical
upright = column 1 of convention @ transform) and write `3dbbox.json` plus
the overlay visualization.

TPU-native: registration runs the jnp rasterizer + hypothesis-batch PnP per
object (host loop over objects, device programs inside); the final box fit
is one vmapped `fit_boxes_batch` over every object in the scene.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from labelany3d_tpu.data.meshio import Mesh, load_glb, save_glb
from labelany3d_tpu.geometry.boxfit import fit_boxes_batch
from labelany3d_tpu.geometry.crops import restore_mask_from_crop
from labelany3d_tpu.pipeline.config import PipelineConfig
from labelany3d_tpu.pipeline.scene import SceneDir, scene_dir_name
from labelany3d_tpu.registration.process import (
    MatcherBackend,
    ObjectToRegister,
    register_objects,
)
from labelany3d_tpu.registration.renderer import OrbitRenderer

_RESTORE_PROGRAM = jax.jit(restore_mask_from_crop, static_argnames=("out_shape",))
_FIT_PROGRAM = jax.jit(fit_boxes_batch, static_argnames=("method",))

# Parity: whole.py:111-114 — camera-convention flip applied to every placed
# mesh before export.
CONVENTION_FLIP = np.diag([-1.0, -1.0, 1.0, 1.0])


class LayoutStage:
    def __init__(
        self,
        cfg: PipelineConfig,
        loader,
        save_dir: str,
        split: str,
        matcher: MatcherBackend,
        renderer: OrbitRenderer | None = None,
        num_box_points: int = 500,
    ):
        self.cfg = cfg
        self.loader = loader
        self.save_dir = save_dir
        self.split = split
        self.matcher = matcher
        if renderer is None:
            # Scale the canonical 512^2 / fx=560.44 render camera to the
            # configured resolution (smaller for CPU dry runs).
            from labelany3d_tpu.registration.cameras import RENDER_K, RENDER_SIZE

            s = cfg.render_size / RENDER_SIZE
            K = RENDER_K.copy()
            K[:2] *= s
            renderer = OrbitRenderer(image_size=cfg.render_size, K=K)
        self.renderer = renderer
        self.num_box_points = num_box_points
        self._key = jax.random.PRNGKey(cfg.seed + 21)
        # Jitted device programs (eagerly these dispatch per-op; over the
        # tunnel each op is a round trip). Crop params ride as jnp args so
        # per-object values do not retrace. Module-level wrappers: a
        # per-instance jax.jit re-traces/re-loads per stage object.
        self._restore = _RESTORE_PROGRAM
        self._fit = _FIT_PROGRAM

    def _scene(self, info: dict) -> SceneDir:
        name = scene_dir_name(info["file_name"])
        return SceneDir(os.path.join(self.save_dir, self.split, name)).ensure()

    def run(self, start_index: int, end_index: int) -> int:
        from PIL import Image

        done = 0
        for i in range(start_index, end_index):
            info = self.loader.get_image_by_index(i)
            scene = self._scene(info)
            if scene.boxes_done() or not scene.depth_done():
                continue
            cam = scene.read_cam_params()
            K_img = np.asarray(cam["K"], np.float64)
            pose = np.asarray(cam["c2w"], np.float64)
            depth_map = scene.read_depth()
            image_hw = depth_map.shape

            # Gather every registrable object first, then register the
            # whole image in ONE batched pass (one matcher forward over all
            # 8xI orbit pairs, vmapped PnP/scale) — the reference loops
            # objects with bs=1 forwards (whole.py:72-107).
            obj_ids: list[str] = []
            to_register: list[ObjectToRegister] = []
            # Reference iterates crops in reverse (whole.py:71-73).
            for obj_id in reversed(scene.list_crop_ids()):
                if not scene.crop_params(obj_id).exists():
                    continue
                crop_path = scene.crop_completed(obj_id)
                if not crop_path.exists():
                    crop_path = scene.crop(obj_id)
                crop = np.asarray(Image.open(crop_path))
                crop_params = np.load(scene.crop_params(obj_id))
                resized_mask = crop[:, :, 3] > 127
                mask = np.asarray(
                    self._restore(
                        jnp.asarray(resized_mask),
                        jnp.float32(crop_params[0]), jnp.float32(crop_params[1]),
                        jnp.float32(crop_params[2]), out_shape=image_hw,
                    )
                )
                elev_path = scene.elevation(obj_id)
                elevation = float(np.load(elev_path)) if elev_path.exists() else 0.0
                mesh_path = scene.object_mesh(obj_id)
                if not mesh_path.exists():
                    continue
                mesh = load_glb(mesh_path)
                if mesh.is_empty:
                    continue
                obj_ids.append(obj_id)
                to_register.append(ObjectToRegister(
                    mesh=mesh,
                    ref_crop_rgba=crop.astype(np.float32) / 255.0,
                    elevation_deg=elevation,
                    crop_params=(float(crop_params[0]), float(crop_params[1]),
                                 float(crop_params[2])),
                    scene_mask=mask,
                ))

            self._key, sub = jax.random.split(self._key)
            try:
                regs = register_objects(
                    to_register, K_img, image_hw, depth_map, self.matcher,
                    key=sub, renderer=self.renderer,
                )
            except Exception as e:  # per-image tolerance (whole.py:104-107)
                print(f"Error aligning scene {info['file_name']}: {e}")
                regs = []

            placed: list[tuple[str, Mesh, np.ndarray]] = []
            for obj_id, ob, reg in zip(obj_ids, to_register, regs):
                # identity on failure / empty overlap, as the reference
                # (util.py:489-493).
                transform = reg.transform if reg.ok else np.eye(4)
                mesh = ob.mesh
                mesh.apply_transform(transform)
                mesh.apply_transform(pose)
                mesh.apply_transform(CONVENTION_FLIP)
                save_glb(scene.scene_mesh(obj_id), mesh)
                canonical_upright = (CONVENTION_FLIP @ transform)[:, 1]
                np.save(scene.canonical_upright(obj_id), canonical_upright)
                placed.append((obj_id, mesh, canonical_upright))

            if not placed:
                continue

            # full_scene.glb (whole.py:123-124)
            all_v = np.concatenate([m.vertices for _, m, _ in placed])
            all_f = []
            off = 0
            for _, m, _ in placed:
                all_f.append(m.faces + off)
                off += len(m.vertices)
            save_glb(
                scene.root / "reconstruction" / "full_scene.glb",
                Mesh(all_v, np.concatenate(all_f).astype(np.int32)),
            )

            self._write_ground_boxes(scene, placed)
            try:
                from labelany3d_tpu.utils.visualization import draw_cube_overlay

                draw_cube_overlay(scene)
            except Exception as e:
                print(f"overlay failed: {e}")
            done += 1
        return done

    def _write_ground_boxes(self, scene: SceneDir, placed) -> None:
        """Batched `save_3d_with_ground_alignment_bbox` (util_3dbox.py:231-294)."""
        n = len(placed)
        pts = np.stack(
            [m.sample(self.num_box_points, seed=j) for j, (_, m, _) in enumerate(placed)]
        )
        ups = np.stack([u[:3] for _, _, u in placed]).astype(np.float32)
        valid = np.ones((n, self.num_box_points), bool)
        # Pad the object count to the config slot count so varying per-scene
        # object counts hit one compiled program.
        n_pad = max(self.cfg.max_instances, n)
        if n_pad != n:
            pts = np.concatenate([pts, np.zeros((n_pad - n, *pts.shape[1:]), pts.dtype)])
            ups = np.concatenate([ups, np.tile([[0.0, 1.0, 0.0]], (n_pad - n, 1)).astype(np.float32)])
            valid = np.concatenate([valid, np.zeros((n_pad - n, self.num_box_points), bool)])
        boxes = self._fit(
            jnp.asarray(pts, jnp.float32), jnp.asarray(valid), jnp.asarray(ups),
            method=self.cfg.bbox_method,
        )
        boxes = jax.tree_util.tree_map(np.asarray, boxes)
        bbox_list = []
        for j, (obj_id, _m, _u) in enumerate(placed):
            if not boxes.ok[j]:
                continue
            parts = obj_id.split("_", 1)
            bbox_list.append(
                {
                    "obj_id": parts[0],
                    "category_name": parts[1] if len(parts) > 1 else "unknown",
                    "center_cam": boxes.center_cam[j].tolist(),
                    "R_cam": boxes.R_cam[j].tolist(),
                    "dimensions": boxes.dimensions[j].tolist(),
                    "bbox3D_cam": boxes.vertices[j].tolist(),
                }
            )
        scene.bbox3d_ground.write_text(json.dumps(bbox_list))
        # whole.py:131-132 — rename to the canonical artifact name.
        os.replace(scene.bbox3d_ground, scene.bbox3d)
