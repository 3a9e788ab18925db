"""Hunyuan3D-1 mvd_std multi-view diffusion (Flax, TPU-first).

The reference's Hunyuan3D path generates its six orbit views with a
fine-tuned SDXL UNet that denoises ONE 3x2 grid latent (1536x1024 px) under
Zero123++-style reference-only attention: every self-attention runs twice
per step — a "write" pass over the noised condition-image latent records
each layer's normed hidden states, and the "read" pass over the grid
latent attends over [own tokens | recorded tokens]
(`external/Hunyuan3D-1/mvd/hunyuan3d_mvd_std_pipeline.py:95-185`,
`infer/image_to_views.py:50-103`).

TPU-first differences from the torch pipeline:
  * the write pass is not a hook-patched second module call — `MVDUNet`
    takes a `mode` ('write' collects, 'read' consumes) and the recorded
    token lists ride as explicit jit-traced values, so the whole
    denoise step (write fwd + read fwd + CFG + Euler-ancestral update)
    compiles into ONE program executed under `lax.scan`;
  * both CFG halves batch through each forward (batch 2), keeping the
    MXU busy instead of diffusers' sequential uncond/cond calls —
    reference-row j pairs with sample-row j;
  * conditioning (two CLIP-vision towers, ramped into the frozen
    uc_text_emb), the VAE encode of the condition image, and the decode
    of the final grid are jitted alongside.

Conditioning parity (`hunyuan3d_mvd_std_pipeline.py:341-379`):
  prompt_embeds = uc_text_emb + concat(vision_1, vision_2) * ramp,
  pooled = uc_text_emb_2, SDXL add_time_ids = (H, W, 0, 0, H, W); CFG
  negatives are zeros and the negative reference latent encodes a black
  image. Note the reference recenters then immediately overwrites with
  `to_rgb_image(image)` (:361-362) — the recenter is dead code there, so
  the condition image here is just the white-background composite.

Weight conversion: `diffusion/convert.py::convert_mvd` maps the released
diffusers-format `weights/mvd_std` (SDXL `UNet2DConditionModel`,
`AutoencoderKL` with scaling_factor 0.13025, two
`CLIPVisionModelWithProjection` towers, `uc_text_emb{,_2}.pt`,
`ramping_coefficients` from the model_index/config json).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from labelany3d_tpu.models.clip import CLIPVisionConfig, CLIPVisionEncoder
from labelany3d_tpu.models.diffusion.unet import ResBlock, _num_groups
from labelany3d_tpu.models.diffusion.vae import AutoencoderKL, VAEConfig
from labelany3d_tpu.models.trellis.dit import timestep_embedding
from labelany3d_tpu.utils.logging import warn_once

SDXL_LATENT_SCALE = 0.13025  # SDXL vae config.json scaling_factor


def scale_latents(x):
    """Grid-latent normalization the mvd UNet was trained under
    (`hunyuan3d_mvd_std_pipeline.py:84-89`)."""
    return (x - 0.22) * 0.75


def unscale_latents(x):
    return x / 0.75 + 0.22


def unscale_image(x):
    """unscale_image(unscale_image_2(x)) composed: 0.8x + 0.5."""
    return x * 0.8 + 0.5


@dataclasses.dataclass(frozen=True)
class MVDUNetConfig:
    """SDXL-shaped UNet2DConditionModel layout (diffusers config.json of
    `weights/mvd_std/unet`): 3 levels, no attention at level 0,
    transformer depth (2, 10) at levels 1-2 and 10 in the mid block,
    linear proj_in/out, head_dim 64, context 2048, text_time additional
    embedding (pooled 1280 + 6 x 256 Fourier time-id features)."""

    in_channels: int = 4
    out_channels: int = 4
    widths: Sequence[int] = (320, 640, 1280)
    attn_levels: Sequence[int] = (1, 2)
    transformer_depth: Sequence[int] = (0, 2, 10)
    num_res_blocks: int = 2
    head_dim: int = 64
    context_dim: int = 2048
    pooled_dim: int = 1280
    addition_time_embed_dim: int = 256
    dtype: Any = jnp.bfloat16

    @staticmethod
    def tiny_test() -> "MVDUNetConfig":
        return MVDUNetConfig(
            widths=(16, 32), attn_levels=(1,), transformer_depth=(0, 2),
            num_res_blocks=1, head_dim=8, context_dim=24, pooled_dim=12,
            addition_time_embed_dim=8, dtype=jnp.float32,
        )

    @staticmethod
    def from_hf_json(cfg: dict) -> "MVDUNetConfig":
        """Build from the checkpoint's unet/config.json (the TRELLIS
        configs-from-HF-json pattern)."""
        widths = tuple(cfg["block_out_channels"])
        down = cfg["down_block_types"]
        attn_levels = tuple(i for i, t in enumerate(down) if "CrossAttn" in t)
        tdepth = cfg.get("transformer_layers_per_block", 1)
        if isinstance(tdepth, int):
            tdepth = tuple(tdepth if i in attn_levels else 0
                           for i in range(len(widths)))
        else:
            tdepth = tuple(tdepth)
        head = cfg.get("attention_head_dim", 64)
        if isinstance(head, (list, tuple)):
            # diffusers stores per-level head counts for SDXL; recover the
            # shared head_dim from the deepest attn level.
            lvl = attn_levels[-1]
            head = widths[lvl] // head[lvl]
        return MVDUNetConfig(
            in_channels=cfg.get("in_channels", 4),
            out_channels=cfg.get("out_channels", 4),
            widths=widths,
            attn_levels=attn_levels,
            transformer_depth=tdepth,
            num_res_blocks=cfg.get("layers_per_block", 2),
            head_dim=head,
            context_dim=cfg.get("cross_attention_dim", 2048),
            pooled_dim=cfg.get("projection_class_embeddings_input_dim", 2816)
            - 6 * cfg.get("addition_time_embed_dim", 256),
            addition_time_embed_dim=cfg.get("addition_time_embed_dim", 256),
        )


class MVDTransformer(nn.Module):
    """SDXL Transformer2DModel: GroupNorm -> linear proj_in -> `depth`
    basic blocks -> linear proj_out, residual. Self-attention supports the
    reference-only protocol via (mode, refs)."""

    depth: int
    head_dim: int
    context_dim: int
    dtype: Any

    def _attn(self, q_in, kv_in, name):
        ch = q_in.shape[-1]
        heads = max(1, ch // self.head_dim)
        hd = ch // heads
        q = nn.Dense(ch, use_bias=False, dtype=self.dtype, name=f"{name}_q")(q_in)
        k = nn.Dense(ch, use_bias=False, dtype=self.dtype, name=f"{name}_k")(kv_in)
        v = nn.Dense(ch, use_bias=False, dtype=self.dtype, name=f"{name}_v")(kv_in)

        def split(t):
            return t.reshape(t.shape[:-1] + (heads, hd))

        out = jax.nn.dot_product_attention(split(q), split(k), split(v))
        out = out.reshape(q_in.shape[:-1] + (ch,))
        return nn.Dense(ch, dtype=self.dtype, name=f"{name}_proj")(out)

    @nn.compact
    def __call__(self, x, context, mode: str, refs: list):
        b, h, w, c = x.shape
        residual = x
        t = nn.GroupNorm(num_groups=_num_groups(c), epsilon=1e-6,
                         dtype=jnp.float32, name="norm")(x)
        t = t.reshape(b, h * w, c)
        t = nn.Dense(c, dtype=self.dtype, name="proj_in")(t.astype(self.dtype))
        for d in range(self.depth):
            tn = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                              name=f"b{d}_ln1")(t).astype(self.dtype)
            if mode == "write":
                refs.append(tn)
                kv = tn
            elif mode == "read":
                # `ReferenceOnlyAttnProc` mode 'r': K/V over
                # [own tokens | recorded reference tokens]; to_k/to_v are
                # linear, so concat-then-project == project-then-concat.
                kv = jnp.concatenate([tn, refs.pop(0).astype(self.dtype)], axis=1)
            else:
                kv = tn
            t = t + self._attn(tn, kv, f"b{d}_self")
            tn = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                              name=f"b{d}_ln2")(t).astype(self.dtype)
            t = t + self._attn(tn, context.astype(self.dtype), f"b{d}_cross")
            tn = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                              name=f"b{d}_ln3")(t).astype(self.dtype)
            g = nn.Dense(c * 8, dtype=self.dtype, name=f"b{d}_geglu")(tn)
            a, gate = jnp.split(g, 2, axis=-1)
            t = t + nn.Dense(c, dtype=self.dtype, name=f"b{d}_ff_out")(a * nn.gelu(gate))
        t = nn.Dense(c, dtype=self.dtype, name="proj_out")(t)
        return residual + t.reshape(b, h, w, c)


class MVDUNet(nn.Module):
    """SDXL-class conditional UNet with reference-only self-attention.

    `mode`:
      * 'plain' — ordinary forward;
      * 'write' — plain self-attention, returns the per-layer normed
        hidden states (the reference records these on the noised
        condition latent, `hunyuan3d_mvd_std_pipeline.py:112-126`);
      * 'read'  — self-attention K/V get the matching write-pass tokens
        concatenated (row j of the batch pairs with ref row j).

    Returns (out, refs): refs is the recorded list in 'write' mode and
    [] otherwise.
    """

    cfg: MVDUNetConfig

    @nn.compact
    def __call__(self, x, t, context, pooled, time_ids,
                 mode: str = "plain", refs: list | None = None):
        cfg = self.cfg
        refs = list(refs) if refs else []
        out_refs: list = refs if mode == "read" else []

        temb = timestep_embedding(t * 1000.0, cfg.widths[0])
        temb = nn.Dense(cfg.widths[0] * 4, dtype=cfg.dtype, name="t1")(temb.astype(cfg.dtype))
        temb = nn.Dense(cfg.widths[0] * 4, dtype=cfg.dtype, name="t2")(nn.silu(temb))
        # SDXL 'text_time' additional embedding: Fourier features of the 6
        # time ids, flattened, concat pooled text embed, 2-layer MLP.
        ids = timestep_embedding(time_ids.reshape(-1), cfg.addition_time_embed_dim)
        ids = ids.reshape(time_ids.shape[0], -1)
        aug = jnp.concatenate([pooled, ids], axis=-1).astype(cfg.dtype)
        aug = nn.Dense(cfg.widths[0] * 4, dtype=cfg.dtype, name="add1")(aug)
        aug = nn.Dense(cfg.widths[0] * 4, dtype=cfg.dtype, name="add2")(nn.silu(aug))
        temb = temb + aug

        def transformer(lvl, name):
            return MVDTransformer(
                cfg.transformer_depth[lvl], cfg.head_dim, cfg.context_dim,
                cfg.dtype, name=name,
            )

        h = nn.Conv(cfg.widths[0], (3, 3), dtype=cfg.dtype, name="in_conv")(x.astype(cfg.dtype))
        skips = [h]
        for lvl, width in enumerate(cfg.widths):
            for i in range(cfg.num_res_blocks):
                h = ResBlock(width, cfg.dtype, name=f"down{lvl}_res{i}")(h, temb)
                if lvl in cfg.attn_levels:
                    h = transformer(lvl, f"down{lvl}_attn{i}")(h, context, mode, out_refs)
                skips.append(h)
            if lvl < len(cfg.widths) - 1:
                h = nn.Conv(width, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                            dtype=cfg.dtype, name=f"down{lvl}_ds")(h)
                skips.append(h)

        h = ResBlock(cfg.widths[-1], cfg.dtype, name="mid_res1")(h, temb)
        h = transformer(len(cfg.widths) - 1, "mid_attn")(h, context, mode, out_refs)
        h = ResBlock(cfg.widths[-1], cfg.dtype, name="mid_res2")(h, temb)

        for lvl in reversed(range(len(cfg.widths))):
            width = cfg.widths[lvl]
            for i in range(cfg.num_res_blocks + 1):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = ResBlock(width, cfg.dtype, name=f"up{lvl}_res{i}")(h, temb)
                if lvl in cfg.attn_levels:
                    h = transformer(lvl, f"up{lvl}_attn{i}")(h, context, mode, out_refs)
            if lvl > 0:
                b, hh, ww, c = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, c), method="nearest")
                h = nn.Conv(width, (3, 3), dtype=cfg.dtype, name=f"up{lvl}_us")(h)

        h = nn.GroupNorm(num_groups=_num_groups(h.shape[-1]), epsilon=1e-5,
                         dtype=jnp.float32, name="norm_out")(h)
        h = nn.silu(h)
        out = nn.Conv(cfg.out_channels, (3, 3), dtype=jnp.float32,
                      param_dtype=jnp.float32, name="out_conv")(h.astype(jnp.float32))
        return out, (out_refs if mode == "write" else [])


# --------------------------------------------------------------------------
# Euler-ancestral schedule (diffusers EulerAncestralDiscreteScheduler math)
# --------------------------------------------------------------------------


def euler_ancestral_schedule(steps: int, num_train: int = 1000,
                             timestep_spacing: str = "trailing"):
    """(timesteps, sigmas) for an epsilon-prediction Euler-ancestral run.

    sigma_t = sqrt((1-abar)/abar) over the SD scaled-linear beta schedule;
    `timestep_spacing` mirrors the checkpoint's scheduler_config.json
    ('trailing' = the Zero123++-family fix; 'linspace'/'leading'
    supported for other checkpoints). Returns float arrays of shape
    (steps,) and (steps+1,) — the final sigma is 0.
    """
    betas = np.linspace(0.00085**0.5, 0.012**0.5, num_train) ** 2
    ab = np.cumprod(1.0 - betas)
    sig = np.sqrt((1.0 - ab) / ab)
    if timestep_spacing == "linspace":
        ts = np.linspace(0, num_train - 1, steps)[::-1].copy()
    elif timestep_spacing == "trailing":
        ts = np.arange(num_train, 0, -num_train / steps) - 1.0
    else:  # leading
        ts = (np.arange(0, steps) * (num_train // steps))[::-1].astype(np.float64)
    sigmas = np.interp(ts, np.arange(num_train), sig)
    return ts.astype(np.float32), np.append(sigmas, 0.0).astype(np.float32)


def euler_ancestral_step(x, eps, sigma, sigma_next, noise):
    """x_{t-1} from epsilon prediction (ancestral variance split)."""
    pred_x0 = x - sigma * eps
    var = jnp.maximum(sigma**2 - sigma_next**2, 0.0)
    sigma_up = jnp.sqrt(sigma_next**2 * var / jnp.maximum(sigma**2, 1e-12))
    sigma_down = jnp.sqrt(jnp.maximum(sigma_next**2 - sigma_up**2, 0.0))
    d = (x - pred_x0) / jnp.maximum(sigma, 1e-12)
    return x + d * (sigma_down - sigma) + noise * sigma_up


# --------------------------------------------------------------------------
# The Image2Views-equivalent pipeline
# --------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class MVDConfig:
    tile: int = 512              # one view tile; grid = (3*tile, 2*tile)
    cond_size: int = 512         # feature_extractor_vae resize
    steps: int = 50              # image_to_views.py:92
    guidance: float = 2.0
    timestep_spacing: str = "trailing"

    @staticmethod
    def tiny_test() -> "MVDConfig":
        return MVDConfig(tile=16, cond_size=16, steps=3)


class MVDStdViews:
    """Image -> six orbit views via ONE 3x2 grid diffusion (mvd_std).

    Grid order parity (`infer/image_to_views.py:72,101-103`): the decoded
    (3H, 2W) image splits row-major into 6 tiles; tile order
    [0, 2, 4, 5, 3, 1] yields the azimuth sequence 0, 60, ..., 300 at
    elevation 0 that `views_to_mesh.py:60` feeds SVRM.

    Implements the `novel_views` protocol of `SVRMReconstruction`
    (generate(rgba, elev, azim)) with `provides_zero_view = True`: unlike
    Zero123 the azimuth-0 view is also generated, matching the reference
    predictor which never reuses the input image as an orbit view.
    """

    ORDER = (0, 2, 4, 5, 3, 1)
    AZIMUTHS = (0.0, 60.0, 120.0, 180.0, 240.0, 300.0)
    provides_zero_view = True

    def __init__(self, cfg: MVDConfig | None = None, tiny: bool = False,
                 seed: int = 0):
        self.cfg = cfg or (MVDConfig.tiny_test() if tiny else MVDConfig())
        self.unet_cfg = MVDUNetConfig.tiny_test() if tiny else MVDUNetConfig()
        self.unet = MVDUNet(self.unet_cfg)
        self.vae = AutoencoderKL(
            VAEConfig.tiny_test() if tiny else VAEConfig(),
            seed=seed, scaling_factor=SDXL_LATENT_SCALE,
        )
        d1 = self.unet_cfg.context_dim - self.unet_cfg.pooled_dim
        if tiny:
            self.vision_cfgs = (
                CLIPVisionConfig.tiny_test(projection_dim=d1),
                CLIPVisionConfig.tiny_test(projection_dim=self.unet_cfg.pooled_dim),
            )
        else:
            # vision_encoder = CLIP ViT-L/14 (768), vision_encoder_2 =
            # ViT-bigG (1280): 768 + 1280 = the 2048 context width.
            self.vision_cfgs = (CLIPVisionConfig.vitl14(),
                                CLIPVisionConfig.bigg14())
        self.vision = tuple(CLIPVisionEncoder(c) for c in self.vision_cfgs)
        self.params: dict | None = None          # unet tree
        self.vision_params: list = [None, None]
        self.uc_text_emb: np.ndarray | None = None    # (1, 77, ctx)
        self.uc_text_emb_2: np.ndarray | None = None  # (1, pooled)
        self.ramping: np.ndarray | None = None        # (77,)
        self._seed = seed
        self._jit_sample = None
        self._cache: dict[bytes, list[np.ndarray]] = {}

    # -- weights ---------------------------------------------------------

    def set_params(self, trees: dict):
        """Install converted weights (`convert.py::convert_mvd`): any
        subset of {"unet", "vae", "vision", "vision_2", "uc_text_emb",
        "uc_text_emb_2", "ramping_coefficients"}."""
        if "unet" in trees:
            self.params = trees["unet"]
        if "vae" in trees:
            self.vae.params = trees["vae"]
        if "vision" in trees:
            self.vision_params[0] = trees["vision"]
        if "vision_2" in trees:
            self.vision_params[1] = trees["vision_2"]
        for k in ("uc_text_emb", "uc_text_emb_2"):
            if k in trees:
                setattr(self, k, np.asarray(trees[k], np.float32))
        if "ramping_coefficients" in trees:
            self.ramping = np.asarray(trees["ramping_coefficients"], np.float32)
        return self

    def init_params(self):
        cfg, ucfg = self.cfg, self.unet_cfg
        lf = 2 ** (len(self.vae.cfg.widths) - 1)
        if self.params is None:
            warn_once(
                "mvd_random",
                "mvd_std multi-view diffusion runs with random-initialized "
                "weights (no converted checkpoint) — views are not "
                "meaningful; convert weights/mvd_std with convert_cli mvd",
            )
            lat = jnp.zeros((1, cfg.tile * 3 // lf, cfg.tile * 2 // lf,
                             ucfg.in_channels))
            ctx = jnp.zeros((1, 4, ucfg.context_dim))
            pooled = jnp.zeros((1, ucfg.pooled_dim))
            tid = jnp.zeros((1, 6))
            self.params = self.unet.init(
                jax.random.PRNGKey(self._seed), lat, jnp.zeros(1), ctx,
                pooled, tid)["params"]
        if self.vae.params is None:
            self.vae.init_params(cfg.cond_size)
        for i, (enc, vc) in enumerate(zip(self.vision, self.vision_cfgs)):
            if self.vision_params[i] is None:
                img = jnp.zeros((1, vc.image_size, vc.image_size, 3))
                self.vision_params[i] = enc.init(
                    jax.random.PRNGKey(self._seed + 1 + i), img)["params"]
        n_tok = 77
        if self.uc_text_emb is None:
            self.uc_text_emb = np.zeros((1, n_tok, ucfg.context_dim), np.float32)
        if self.uc_text_emb_2 is None:
            self.uc_text_emb_2 = np.zeros((1, ucfg.pooled_dim), np.float32)
        if self.ramping is None:
            # Zero123++-family ramps grow ~linearly over token index.
            self.ramping = np.linspace(0.0, 1.0, self.uc_text_emb.shape[1],
                                       dtype=np.float32)
        return self.params

    # -- sampling --------------------------------------------------------

    def _build_sample(self):
        cfg = self.cfg
        ts, sigmas = euler_ancestral_schedule(cfg.steps,
                                              timestep_spacing=cfg.timestep_spacing)
        ts_j, sig_j = jnp.asarray(ts), jnp.asarray(sigmas)
        guidance = cfg.guidance

        def sample(unet_p, lat0, cond_lat2, ctx2, pooled2, tid2, key):
            def step(carry, i):
                lat, key = carry
                key, k_ref, k_anc = jax.random.split(key, 3)
                t = ts_j[i]
                sigma, sigma_next = sig_j[i], sig_j[i + 1]
                tb = jnp.full((2,), t / 1000.0)
                # Write pass: noise BOTH reference rows at level t
                # (RefOnlyNoisedUNet.forward adds fresh noise per call).
                ref_noise = jax.random.normal(k_ref, cond_lat2.shape)
                noisy_ref = (cond_lat2 + sigma * ref_noise) / jnp.sqrt(sigma**2 + 1.0)
                _, refs = self.unet.apply(
                    {"params": unet_p}, noisy_ref, tb, ctx2, pooled2, tid2,
                    mode="write")
                # Read pass: both CFG rows of the grid latent.
                lat_in = jnp.concatenate([lat, lat], axis=0) / jnp.sqrt(sigma**2 + 1.0)
                eps2, _ = self.unet.apply(
                    {"params": unet_p}, lat_in, tb, ctx2, pooled2, tid2,
                    mode="read", refs=refs)
                eps = eps2[:1] + guidance * (eps2[1:] - eps2[:1])
                anc_noise = jax.random.normal(k_anc, lat.shape)
                lat = euler_ancestral_step(lat, eps, sigma, sigma_next, anc_noise)
                return (lat, key), None

            (lat, _), _ = jax.lax.scan(step, (lat0, key), jnp.arange(cfg.steps))
            return lat

        return jax.jit(sample)

    def generate_views(self, rgba: np.ndarray, seed: int = 0) -> list[np.ndarray]:
        """Full mvd run: six (tile, tile, 3) uint8 views in azimuth order
        0, 60, ..., 300 (the post-[0,2,4,5,3,1] reorder)."""
        from PIL import Image

        from labelany3d_tpu.models.clip import preprocess_clip_image

        self.init_params()  # no-op per already-installed component
        if self._jit_sample is None:
            self._jit_sample = self._build_sample()
        cfg, ucfg = self.cfg, self.unet_cfg
        lf = 2 ** (len(self.vae.cfg.widths) - 1)

        img = np.asarray(rgba)
        rgb = img[..., :3]
        if img.shape[-1] == 4:  # to_rgb_image: white background composite
            a = img[..., 3:4].astype(np.float32) / 255.0
            rgb = (rgb * a + 255.0 * (1.0 - a)).astype(np.uint8)
        cond = np.asarray(Image.fromarray(rgb).resize((cfg.cond_size,) * 2,
                                                      Image.BICUBIC))
        x = jnp.asarray(cond, jnp.float32)[None] / 127.5 - 1.0

        key = jax.random.PRNGKey(seed)
        k_lat, k_cond, k_run = jax.random.split(key, 3)
        # Raw (unscaled) posterior samples, negative row = black image
        # (`hunyuan3d_mvd_std_pipeline.py:365-368`).
        cond_lat = self.vae.encode(x, key=k_cond, scale=False)
        neg_lat = self.vae.encode(jnp.zeros_like(x), scale=False)
        cond_lat2 = jnp.concatenate([neg_lat, cond_lat], axis=0)

        embeds = []
        for enc, vp, vc in zip(self.vision, self.vision_params, self.vision_cfgs):
            clip_in = preprocess_clip_image(cond.astype(np.float32) / 255.0,
                                            vc.image_size)
            out = enc.apply({"params": vp}, jnp.asarray(clip_in)[None])
            embeds.append(out.get("image_embeds", out["pooled"]).astype(jnp.float32))
        global_embeds = jnp.concatenate(embeds, axis=-1)[:, None, :]  # (1,1,ctx)

        ramp = jnp.asarray(self.ramping)[None, :, None]
        prompt = jnp.asarray(self.uc_text_emb) + global_embeds * ramp
        ctx2 = jnp.concatenate([jnp.zeros_like(prompt), prompt], axis=0)
        pooled = jnp.asarray(self.uc_text_emb_2)
        pooled2 = jnp.concatenate([jnp.zeros_like(pooled), pooled], axis=0)
        gh, gw = cfg.tile * 3, cfg.tile * 2
        tid = jnp.asarray([[gh, gw, 0, 0, gh, gw]], jnp.float32)
        tid2 = jnp.concatenate([tid, tid], axis=0)

        _, sigmas = euler_ancestral_schedule(cfg.steps,
                                             timestep_spacing=cfg.timestep_spacing)
        # diffusers init_noise_sigma: sigma_max for linspace/trailing,
        # sqrt(sigma_max^2 + 1) for leading.
        init_sigma = float(sigmas[0])
        if cfg.timestep_spacing == "leading":
            init_sigma = float(np.sqrt(sigmas[0] ** 2 + 1.0))
        lat0 = jax.random.normal(k_lat, (1, gh // lf, gw // lf,
                                         ucfg.in_channels)) * init_sigma
        lat = self._jit_sample(self.params, lat0, cond_lat2, ctx2, pooled2,
                               tid2, k_run)
        lat = unscale_latents(lat)
        dec = self.vae.decode(lat)  # applies /scaling_factor
        grid = np.asarray(jnp.clip(unscale_image(dec[0]), 0.0, 1.0))
        grid = (grid * 255.0 + 0.5).astype(np.uint8)
        # (3h, 2w, c) -> 6 tiles row-major -> reference order.
        t = cfg.tile
        tiles = [grid[r * t:(r + 1) * t, c * t:(c + 1) * t]
                 for r in range(3) for c in range(2)]
        return [tiles[i] for i in self.ORDER]

    def generate(self, rgba: np.ndarray, d_elev: float, d_azim: float,
                 d_dist: float = 0.0, seed: int = 0) -> np.ndarray:
        """novel_views protocol: one cached grid run serves all six views."""
        img = np.ascontiguousarray(np.asarray(rgba))
        h = img.tobytes()[:: max(1, img.nbytes // 4096)]  # cheap content key
        key = (h, img.shape, seed)
        if key not in self._cache:
            if len(self._cache) > 4:
                self._cache.clear()
            self._cache[key] = self.generate_views(rgba, seed=seed)
        idx = int(round((d_azim % 360.0) / 60.0)) % 6
        return self._cache[key][idx]
