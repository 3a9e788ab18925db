"""Image->3D pipeline (TrellisImageTo3DPipeline equivalent).

Parity target: `external/TRELLIS/trellis/pipelines/trellis_image_to_3d.py:
256-283` in the reference tree:

  preprocess (alpha crop + resize) -> DINOv2 conditioning (layer-normed
  x_prenorm, ImageNet normalization) -> sample_sparse_structure (flow DiT +
  conv decoder -> active voxels) -> sample_slat (sparse UNet flow DiT, then
  de-normalization with the pipeline's slat mean/std) -> decode (Gaussians
  + FlexiCubes mesh) -> GLB (`postprocessing_utils.to_glb` role: textured
  or vertex-colored mesh).

Every model is checkpoint-faithful; released TRELLIS-image-large weights
load through `models/convert_trellis.py` (see `models/convert_cli.py`
`trellis_*` entries). Until converted weights are installed it runs with
random weights (shapes/semantics identical).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from labelany3d_tpu.data.meshio import Mesh
from labelany3d_tpu.models.trellis.decoders import (
    GaussianRepConfig,
    SLatDecoderConfig,
    SLatGaussianDecoder,
    SLatMeshDecoder,
    flexicubes_to_mesh,
)
from labelany3d_tpu.models.trellis.samplers import (
    FlowSamplerConfig,
    flow_euler_sample,
)
from labelany3d_tpu.models.trellis.slat import SLatConfig, SLatFlowModel
from labelany3d_tpu.models.trellis.sparse_structure import (
    SparseStructureConfig,
    SparseStructureFlowModel,
    SSDecoderConfig,
    StructureDecoder,
    decode_occupancy,
)
from labelany3d_tpu.models.vit import ViT, ViTConfig

_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)


@dataclasses.dataclass(frozen=True)
class TrellisPipelineConfig:
    # dinov2_vitl14_reg: the conditioner the released image pipeline loads
    # via torch.hub (`trellis_image_to_3d.py:74-84`).
    cond_backbone: ViTConfig = dataclasses.field(
        default_factory=lambda: ViTConfig.large(
            num_register_tokens=4, pos_grid=(37, 37)))
    cond_size: int = 518            # DINOv2 processing size (parity :85-119)
    structure: SparseStructureConfig = dataclasses.field(
        default_factory=SparseStructureConfig)
    ss_dec: SSDecoderConfig = dataclasses.field(default_factory=SSDecoderConfig)
    slat: SLatConfig = dataclasses.field(default_factory=SLatConfig)
    dec_gs: SLatDecoderConfig = dataclasses.field(default_factory=SLatDecoderConfig)
    dec_mesh: SLatDecoderConfig = dataclasses.field(default_factory=SLatDecoderConfig)
    gs_rep: GaussianRepConfig = dataclasses.field(default_factory=GaussianRepConfig)
    ss_sampler: FlowSamplerConfig = FlowSamplerConfig(steps=25, cfg_strength=7.5, rescale_t=3.0)
    slat_sampler: FlowSamplerConfig = FlowSamplerConfig(steps=25, cfg_strength=3.0)
    max_voxels: int = 8192
    # Per-channel SLat de-normalization (the released pipeline.json's
    # `slat_normalization`; identity until real stats are installed).
    slat_mean: tuple = (0.0,) * 8
    slat_std: tuple = (1.0,) * 8

    @staticmethod
    def tiny_test() -> "TrellisPipelineConfig":
        return TrellisPipelineConfig(
            cond_backbone=ViTConfig.tiny_test(num_register_tokens=1),
            cond_size=32,
            structure=SparseStructureConfig.tiny_test(),
            ss_dec=SSDecoderConfig.tiny_test(),
            slat=SLatConfig.tiny_test(),
            dec_gs=SLatDecoderConfig.tiny_test(),
            dec_mesh=SLatDecoderConfig.tiny_test(),
            gs_rep=GaussianRepConfig(num_gaussians=4),
            ss_sampler=FlowSamplerConfig(steps=4, cfg_strength=3.0),
            slat_sampler=FlowSamplerConfig(steps=4, cfg_strength=1.5),
            max_voxels=256,
            slat_mean=(0.0,) * 4,
            slat_std=(1.0,) * 4,
        )


class TrellisPipeline:
    # Registry names the convert CLI writes and init_params reads back.
    CKPT_NAMES = {
        "cond": "trellis_cond",
        "ss": "trellis_ss_flow",
        "ss_dec": "trellis_ss_dec",
        "slat": "trellis_slat_flow",
        "gs": "trellis_slat_gs",
        "mesh": "trellis_slat_mesh",
    }

    def __init__(self, cfg: TrellisPipelineConfig | None = None, seed: int = 0,
                 ckpt_dir: str | None = None, params_dtype: str | None = None):
        self.cfg = cfg or TrellisPipelineConfig()
        # Serving precision for the HELD weights (compute dtype is set per
        # model). The six components are 6.37 GiB in f32 on a 16 GB v5e —
        # with program scratch that OOM'd `sample_slat` in production;
        # bf16 holds them at 3.2 GiB. None keeps init dtypes (tests).
        self._params_dtype = jnp.bfloat16 if params_dtype in (
            "bfloat16", "bf16") else None
        c = self.cfg
        self.cond_model = ViT(c.cond_backbone)
        self.ss_model = SparseStructureFlowModel(c.structure)
        self.ss_decoder = StructureDecoder(c.ss_dec, latent_res=c.structure.latent_res)
        self.slat_model = SLatFlowModel(c.slat)
        self.gs_decoder = SLatGaussianDecoder(c.dec_gs, rep=c.gs_rep)
        self.mesh_decoder = SLatMeshDecoder(c.dec_mesh)
        self.params: dict | None = None
        self._seed = seed
        self._ckpt_dir = ckpt_dir
        self._jit_cache: dict = {}

    def _jitted(self, name: str, fn):
        """Cache jitted stage programs (one trace per pipeline instance)."""
        if name not in self._jit_cache:
            self._jit_cache[name] = jax.jit(fn)
        return self._jit_cache[name]

    # -- parameters -------------------------------------------------------
    def _load_converted(self) -> dict:
        """Pull converted checkpoints (convert_cli `trellis_*`) from the
        orbax store; returns {component: params} for those present."""
        if not self._ckpt_dir:
            return {}
        from labelany3d_tpu.models.checkpoints import load_params

        found = {}
        for comp, name in self.CKPT_NAMES.items():
            p = load_params(self._ckpt_dir, name)
            if p is not None:
                found[comp] = p
        return found

    def init_params(self, key=None) -> dict:
        c = self.cfg
        key = key if key is not None else jax.random.PRNGKey(self._seed)
        ks = jax.random.split(key, 6)
        img = jnp.zeros((1, c.cond_size, c.cond_size, 3))
        cond_dim = c.cond_backbone.width
        m = (c.cond_size // c.cond_backbone.patch_size) ** 2
        cond_tokens = jnp.zeros((1, m, cond_dim))
        r3 = c.structure.latent_res**3
        latent = jnp.zeros((1, r3, c.structure.latent_channels))
        t = jnp.zeros((1,))
        n = c.max_voxels
        feats = jnp.zeros((1, n, c.slat.latent_channels))
        coords = jnp.zeros((1, n, 3), jnp.int32)
        valid = jnp.ones((1, n), bool)
        converted = self._load_converted()
        # Each init runs as ONE jitted program: the eager form dispatched
        # every param tensor (and every forward intermediate of the init
        # trace) as its own device op — 693 s over the tunnel and
        # thousands of small HBM buffers whose fragmentation contributed
        # to the production sample_slat OOM. Values are identical. The
        # serving-dtype cast happens INSIDE the init program, so the f32
        # tree never materializes in HBM (all six at once would be
        # 6.37 GiB transient — enough to OOM when other stage models are
        # resident).
        def _cast_tree(tree):
            if self._params_dtype is None:
                return tree
            return jax.tree.map(
                lambda l: l.astype(self._params_dtype)
                if l.dtype == jnp.float32 else l, tree)

        def _jit_init(fn, *args):
            return jax.jit(
                lambda *a: _cast_tree(fn(*a)["params"]))(*args)

        inits = {
            "cond": lambda: _jit_init(self.cond_model.init, ks[0], img),
            "ss": lambda: _jit_init(self.ss_model.init,
                                    ks[1], latent, t, cond_tokens),
            "ss_dec": lambda: _jit_init(self.ss_decoder.init, ks[2], latent),
            "slat": lambda: _jit_init(self.slat_model.init,
                                      ks[3], feats, coords, valid, t, cond_tokens),
            "gs": lambda: _jit_init(self.gs_decoder.init,
                                    ks[4], feats[0], coords[0], valid[0]),
            "mesh": lambda: _jit_init(self.mesh_decoder.init,
                                      ks[5], feats[0], coords[0], valid[0]),
        }
        missing = [k for k in inits if k not in converted]
        if missing and self._ckpt_dir:
            from labelany3d_tpu.utils.logging import warn_once

            warn_once(
                "trellis_partial_ckpt",
                f"TRELLIS components {missing} not found under "
                f"{self._ckpt_dir} — running those with random weights "
                "(convert with models/convert_cli.py trellis_*)",
            )
        elif missing and len(missing) == len(inits):
            from labelany3d_tpu.utils.logging import warn_once

            warn_once(
                "trellis_random",
                "TRELLIS runs with random-initialized weights (no converted "
                "checkpoint dir passed) — generated meshes are not "
                "meaningful; see docs/WEIGHTS.md",
            )
        # Converted checkpoints load as f32 from disk; cast those (random
        # inits are already cast inside their init programs above).
        def _entry(k, fn):
            if k not in converted:
                return fn()
            if self._params_dtype is None:
                return converted[k]
            return jax.jit(_cast_tree)(converted[k])

        self.params = {k: _entry(k, fn) for k, fn in inits.items()}
        return self.params

    # -- stages -----------------------------------------------------------
    def preprocess(self, rgba: np.ndarray, segmenter=None) -> jnp.ndarray:
        """Alpha-crop to the object bbox, pad square, resize to cond_size.

        Parity: `trellis_image_to_3d.py:85-119` (alpha-guided crop +
        518^2 resize; background to black via alpha-mult like :117-118).
        An alpha-less input goes through `segmenter.remove` when one is
        passed (the reference's rembg u2net fallback, :103-105 — e.g.
        `models/saliency.py::RembgSegmenter`).
        """
        from PIL import Image

        img = np.asarray(rgba)
        if img.dtype != np.uint8:
            img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        if img.shape[-1] != 4 and segmenter is not None:
            img = segmenter.remove(img)
        if img.shape[-1] == 4:
            alpha = img[..., 3] > 127
            rgb = img[..., :3] * (alpha[..., None])
        else:
            alpha = np.ones(img.shape[:2], bool)
            rgb = img[..., :3]
        ys, xs = np.nonzero(alpha)
        if len(ys):
            y0, y1 = ys.min(), ys.max() + 1
            x0, x1 = xs.min(), xs.max() + 1
            rgb = rgb[y0:y1, x0:x1]
        h, w = rgb.shape[:2]
        side = max(h, w)
        sq = np.zeros((side, side, 3), np.uint8)
        sq[(side - h) // 2 : (side - h) // 2 + h, (side - w) // 2 : (side - w) // 2 + w] = rgb
        out = np.asarray(Image.fromarray(sq).resize((self.cfg.cond_size,) * 2, Image.BILINEAR))
        return jnp.asarray(out, jnp.float32) / 255.0

    def get_cond(self, image: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(cond_tokens, uncond_tokens); tokens = non-affine layer-normed
        DINOv2 x_prenorm (cls + registers + patches), ImageNet-normalized
        input — parity with `encode_image` (:131-147); uncond = zeros."""

        def fn(p, im):
            x = (im[None] - jnp.asarray(_IMAGENET_MEAN)) / jnp.asarray(_IMAGENET_STD)
            feats = self.cond_model.apply({"params": p}, x)["all_prenorm"]
            f32 = feats.astype(jnp.float32)
            mu = f32.mean(axis=-1, keepdims=True)
            var = f32.var(axis=-1, keepdims=True)
            return (f32 - mu) * jax.lax.rsqrt(var + 1e-5)

        tokens = self._jitted("cond", fn)(self.params["cond"], image)
        return tokens, jnp.zeros_like(tokens)

    def sample_sparse_structure(self, cond, uncond, key):
        c = self.cfg

        def program(p_ss, p_dec, cond, uncond, key):
            r3 = c.structure.latent_res**3
            noise = jax.random.normal(key, (1, r3, c.structure.latent_channels))
            # CFG as one batch-2 eval (cond | uncond); models take 1000 * t
            # (FlowEulerSampler._inference_model).
            tok2 = jnp.concatenate([cond, uncond], axis=0)

            def vel(x, t):
                x2 = jnp.broadcast_to(x, (2, *x.shape[1:]))
                v = self.ss_model.apply(
                    {"params": p_ss}, x2, jnp.broadcast_to(1000.0 * t, (2,)), tok2)
                s = c.ss_sampler.cfg_strength
                return (1.0 + s) * v[:1] - s * v[1:]

            latent = flow_euler_sample(vel, noise, c.ss_sampler)
            logits = self.ss_decoder.apply({"params": p_dec}, latent)
            return decode_occupancy(logits, c.max_voxels)

        fn = self._jitted("sparse_structure", program)
        return fn(self.params["ss"], self.params["ss_dec"], cond, uncond, key)

    @staticmethod
    def _slat_buckets(coords: np.ndarray, valid: np.ndarray,
                      max_voxels: int) -> tuple[int, int]:
        """Pick static (fine, torso) slot buckets from the ACTUAL voxel set.

        `decode_occupancy` emits voxels sorted by logit, so valid slots are
        a front-compacted prefix; the fine bucket is the prefix length
        rounded up to 1024. The torso bucket is the factor-2 parent-cell
        count (what the reference's SparseDownsample leaves the torso to
        run on — surface-like sets occupy ~N/4 cells) rounded up to 512.
        Each bucket pair is one jitted program; real objects cluster in a
        handful of buckets.
        """
        v = valid.reshape(-1)
        n_real = int(v.sum())
        if n_real == 0 or (n_real < v.size and v[n_real:].any()):
            # Empty or non-prefix validity (not a decode_occupancy output):
            # keep the full slot budget.
            return max_voxels, max_voxels
        n_fine = min(max_voxels, -(-n_real // 1024) * 1024)
        pc = coords.reshape(-1, 3)[:n_real] // 2
        codes = (pc[:, 0].astype(np.int64) << 32) | (pc[:, 1].astype(np.int64) << 16) | pc[:, 2]
        n_parent = len(np.unique(codes))
        torso = min(n_fine, max(512, -(-n_parent // 512) * 512))
        return n_fine, torso

    def sample_slat(self, coords, valid, cond, uncond, key):
        c = self.cfg
        n_fine, torso = self._slat_buckets(
            np.asarray(coords), np.asarray(valid), c.max_voxels)

        def program(p, coords, valid, cond, uncond, key):
            n = coords.shape[1]
            noise = jax.random.normal(key, (1, n, c.slat.latent_channels))
            # CFG as ONE batch-2 eval (cond | uncond): same FLOPs as the
            # reference's two sequential evals, half the kernel launches
            # and half the HLO (faster tunnel program load).
            tok2 = jnp.concatenate([cond, uncond], axis=0)
            coords2 = jnp.broadcast_to(coords, (2, *coords.shape[1:]))
            valid2 = jnp.broadcast_to(valid, (2, *valid.shape[1:]))

            def vel(x, t):
                x2 = jnp.broadcast_to(x, (2, *x.shape[1:]))
                v = self.slat_model.apply(
                    {"params": p}, x2, coords2, valid2,
                    jnp.broadcast_to(1000.0 * t, (2,)), tok2,
                    torso_slots=torso)
                s = c.slat_sampler.cfg_strength
                return (1.0 + s) * v[:1] - s * v[1:]

            slat = flow_euler_sample(vel, noise, c.slat_sampler)
            # De-normalize with the released pipeline's slat statistics
            # (`trellis_image_to_3d.py` sample_slat std/mean).
            std = jnp.asarray(c.slat_std, jnp.float32)
            mean = jnp.asarray(c.slat_mean, jnp.float32)
            return slat * std + mean

        fn = self._jitted(f"slat_{n_fine}_{torso}", program)
        out = fn(self.params["slat"], coords[:, :n_fine], valid[:, :n_fine],
                 cond, uncond, key)
        if n_fine < c.max_voxels:
            out = jnp.pad(out, ((0, 0), (0, c.max_voxels - n_fine), (0, 0)))
        return out

    def decode(self, slat, coords, valid):
        fn = self._jitted(
            "decode",
            lambda pg, pm, s, cs, v: (
                self.gs_decoder.apply({"params": pg}, s[0], cs[0], v[0]),
                self.mesh_decoder.apply({"params": pm}, s[0], cs[0], v[0]),
            ),
        )
        return fn(self.params["gs"], self.params["mesh"], slat, coords, valid)

    def to_glb_mesh(self, gs, mesh_out, bake: str = "texture",
                    texture_size: int = 256) -> Mesh:
        """Surface + color bake; role parity with `postprocessing_utils.
        to_glb` (:399-444).

        The surface comes from the FlexiCubes feature field (marching
        tetrahedra over active cells). bake='texture' adds the reference's
        textured-GLB scheme (UV atlas + multi-view splat bake ->
        TEXCOORD_0 + baseColorTexture); bake='render' projects multi-view
        splat renders onto vertices; bake='vertex' keeps the mesh
        decoder's own vertex colors (no Gaussian render).
        """
        feats, coords, valid = mesh_out
        res = self.cfg.dec_mesh.resolution * 4
        verts, faces, vcols = flexicubes_to_mesh(
            np.asarray(feats), np.asarray(coords), np.asarray(valid), res)
        # Object frame [0,1]^3 for the bake (Gaussian means live there).
        mesh = Mesh(vertices=(verts + 0.5).astype(np.float32), faces=faces)
        ok = np.asarray(gs.valid) & (np.asarray(gs.opacities) > 0.01)
        if ok.any() and len(verts) and bake != "vertex":
            if bake == "texture":
                from labelany3d_tpu.models.trellis.bake import bake_texture

                mesh = bake_texture(mesh, gs, texture_size=texture_size)
            else:
                from labelany3d_tpu.models.trellis.bake import bake_vertex_colors

                mesh.colors = bake_vertex_colors(mesh, gs)
        else:
            mesh.colors = vcols
        # Center to [-0.5, 0.5] like generative reconstructors' outputs.
        mesh.vertices = mesh.vertices - 0.5
        return mesh

    def run(self, rgba: np.ndarray, seed: int = 1) -> dict:
        """Full image->3D generation; parity with `run` (:256-283)."""
        if self.params is None:
            self.init_params()
        key = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(key)
        image = self.preprocess(rgba)
        cond, uncond = self.get_cond(image)
        coords, valid = self.sample_sparse_structure(cond, uncond, k1)
        slat = self.sample_slat(coords, valid, cond, uncond, k2)
        gs, mesh_out = self.decode(slat, coords, valid)
        mesh = self.to_glb_mesh(gs, mesh_out)
        return {"mesh": mesh, "gaussians": gs, "coords": coords, "valid": valid,
                "mesh_features": mesh_out}

    # Reconstruction-backend protocol (pipeline stage 6).
    def reconstruct(self, crop_rgba: np.ndarray, label: str = "") -> Mesh:
        return self.run(crop_rgba)["mesh"]
