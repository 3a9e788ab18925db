"""Task pipelines on the diffusion family: enhance, completion, novel view.

Each class implements the corresponding stage-backend protocol and slots
into the model registry ('enhance' / 'completion' / zero123 for elevation).
Text conditioning goes through a real CLIP text encoder graph
(`models/clip.py`, HF-checkpoint loadable by rename) and Zero123's image
conditioning through a CLIP vision tower + cc_projection, matching the
reference's conditioning stack (`src/model_wrappers.py:638-662`,
`external/dreamgaussian/zero123.py`); the sampling math and guidance
scales follow the reference. Until converted weights are installed the
encoders run random-initialized and say so once at runtime.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from labelany3d_tpu.models.clip import (
    CLIPTextConfig,
    CLIPTextEncoder,
    CLIPVisionConfig,
    CLIPVisionEncoder,
)
from labelany3d_tpu.data.bpe import load_tokenizer
from labelany3d_tpu.models.diffusion.sampler import (
    DDIMConfig,
    add_noise,
    cfg_eps,
    ddim_sample,
    dual_cfg_eps,
)
from labelany3d_tpu.models.diffusion.unet import UNet2D, UNetConfig
from labelany3d_tpu.models.diffusion.vae import AutoencoderKL, VAEConfig
from labelany3d_tpu.utils.logging import warn_once


class TextConditioner:
    """Prompt -> (1, L, D) CLIP text-encoder context for UNet cross-attn.

    `for_context_dim` picks the CLIP tower whose width matches the UNet's
    context_dim (768 = the SD 1.x / InstructPix2Pix CLIP ViT-L/14 text
    tower; other dims get a width-matched small tower for tests). Converted
    checkpoints install via `params=convert_clip_text(...)` +
    `tokenizer_path=<ckpt dir>`.
    """

    def __init__(self, cfg: CLIPTextConfig, params=None, tokenizer=None,
                 tokenizer_path: str | None = None, seed: int = 0):
        self.cfg = cfg
        self.model = CLIPTextEncoder(cfg)
        self.params = params
        self.tokenizer = tokenizer or load_tokenizer(tokenizer_path, cfg.vocab_size)
        self._seed = seed
        self._jit_apply = jax.jit(
            lambda p, ids: self.model.apply({"params": p}, ids)["last_hidden"]
        )
        self._cache: dict[str, jnp.ndarray] = {}

    @staticmethod
    def for_context_dim(dim: int, max_len: int = 77, **kw) -> "TextConditioner":
        if dim == 768:
            return TextConditioner(CLIPTextConfig.sd15(), **kw)
        if dim == 1024:
            return TextConditioner(CLIPTextConfig.sd2(), **kw)
        heads = 2 if dim % 2 == 0 else 1
        return TextConditioner(
            CLIPTextConfig(vocab_size=4096, width=dim, depth=2, num_heads=heads,
                           max_len=min(max_len, 16), eos_token_id=4095),
            **kw,
        )

    def _ensure(self):
        if self.params is None:
            warn_once(
                "clip_text_random",
                "text conditioning runs a random-initialized CLIP text "
                "encoder (no converted weights installed) — diffusion "
                "outputs are not prompt-faithful",
            )
            ids = jnp.zeros((1, self.cfg.max_len), jnp.int32)
            self.params = self.model.init(jax.random.PRNGKey(self._seed), ids)["params"]
        if getattr(self.tokenizer, "is_fallback", False):
            warn_once(
                "clip_tokenizer_fallback",
                "no CLIP vocab files installed; prompts tokenize via a "
                "deterministic hash fallback",
            )

    def embed(self, prompt: str) -> jnp.ndarray:
        self._ensure()
        if prompt not in self._cache:
            ids = jnp.asarray([self.tokenizer(prompt, self.cfg.max_len)], jnp.int32)
            self._cache[prompt] = self._jit_apply(self.params, ids)
        return self._cache[prompt]


@dataclasses.dataclass
class _Base:
    unet_cfg: UNetConfig
    vae_cfg: VAEConfig
    image_size: int
    seed: int = 0

    def __post_init__(self):
        self.unet = UNet2D(self.unet_cfg)
        self.vae = AutoencoderKL(self.vae_cfg, seed=self.seed)
        self.params = None
        self.text = TextConditioner.for_context_dim(
            self.unet_cfg.context_dim, seed=self.seed
        )

    @property
    def latent_factor(self) -> int:
        return 2 ** (len(self.vae_cfg.widths) - 1)

    def init_params(self):
        k = jax.random.PRNGKey(self.seed)
        self.vae.init_params(self.image_size)
        lf = self.latent_factor
        lat = jnp.zeros((1, self.image_size // lf, self.image_size // lf,
                         self.unet_cfg.in_channels))
        ctx = jnp.zeros((1, 8, self.unet_cfg.context_dim))
        self.params = self.unet.init(k, lat, jnp.zeros(1), ctx)["params"]
        return self.params

    def _eps_model(self):
        def fn(x, t, ctx):
            return self.unet.apply({"params": self.params}, x, t / 1000.0, ctx)

        return fn


class InvSREnhance(_Base):
    """Partial-inversion super-resolution (InvSR-equivalent, stage 2).

    Scheme parity (`sampler_invsr.py:111,222`): bicubic-upscale the LR
    image, encode, forward-diffuse to a mid timestep (the 'inversion'), and
    denoise the few remaining steps — structure preserved, details
    hallucinated.
    """

    def __init__(self, factor: int = 4, start_timestep: int = 250, steps: int = 5,
                 image_size: int = 256, tiny: bool = False, seed: int = 0,
                 noise_predictor=None, noise_predictor_params=None):
        super().__init__(
            UNetConfig.tiny_test() if tiny else UNetConfig(),
            VAEConfig.tiny_test() if tiny else VAEConfig(),
            image_size, seed,
        )
        self.factor = factor
        self.cfg = DDIMConfig(steps=steps, guidance_scale=1.0, start_timestep=start_timestep)
        # InvSR's learned inversion noise (`noise_predictor_sd_turbo_v5.pth`
        # role, pipeline_stable_diffusion_inversion_sr.py:1051-1061): when
        # installed, the starting noise comes from the predictor's posterior
        # instead of a Gaussian draw. Pass noise_predictor=NoisePredictor(...)
        # + converted params, or noise_predictor=True for the default graph.
        if noise_predictor is True:
            from labelany3d_tpu.models.diffusion.noise_predictor import (
                NoisePredictor,
                NoisePredictorConfig,
            )

            noise_predictor = NoisePredictor(
                NoisePredictorConfig.tiny_test() if tiny
                else NoisePredictorConfig.sd_turbo()
            )
        self.noise_predictor = noise_predictor
        self._np_params = noise_predictor_params

    def enhance(self, image: np.ndarray) -> np.ndarray:
        from PIL import Image

        if self.params is None:
            self.init_params()
        h, w = image.shape[:2]
        up = np.asarray(
            Image.fromarray(image).resize((w * self.factor, h * self.factor), Image.BICUBIC)
        )
        # Tile to the processing size (whole-image chop parity with InvSR's
        # 128-px chopping); single tile when it fits.
        proc = np.asarray(Image.fromarray(up).resize((self.image_size,) * 2, Image.BICUBIC))
        x = jnp.asarray(proc, jnp.float32)[None] / 127.5 - 1.0
        key = jax.random.PRNGKey(self.seed)
        lat = self.vae.encode(x)
        if self.noise_predictor is not None:
            if self._np_params is None:
                warn_once(
                    "invsr_noise_predictor_random",
                    "InvSR noise predictor runs random-initialized (no "
                    "converted noise_predictor_sd_turbo checkpoint)",
                )
                self._np_params = self.noise_predictor.init(
                    jax.random.PRNGKey(self.seed + 3),
                    jnp.zeros((1, self.image_size, self.image_size, 3)),
                    jnp.zeros((1,)),
                )["params"]
            img01 = (x + 1.0) / 2.0
            t = jnp.full((1,), float(self.cfg.start_timestep))
            noise = self.noise_predictor.apply(
                {"params": self._np_params}, img01, t, key,
                method=type(self.noise_predictor).sample,
            )
            if noise.shape != lat.shape:  # latent grid mismatch: resize
                noise = jax.image.resize(noise, lat.shape, method="bilinear")
        else:
            noise = jax.random.normal(key, lat.shape)
        noised = add_noise(lat, noise, self.cfg.start_timestep)
        ctx = self.text.embed("")
        eps = cfg_eps(self._eps_model(), ctx, ctx, 1.0)
        out_lat = ddim_sample(eps, noised, self.cfg)
        out = self.vae.decode(out_lat)
        out = np.asarray((jnp.clip(out[0], -1, 1) + 1.0) * 127.5).astype(np.uint8)
        return np.asarray(Image.fromarray(out).resize((w * self.factor, h * self.factor),
                                                      Image.BICUBIC))


class AmodalCompletion(_Base):
    """InstructPix2Pix-style amodal completion (stage 4 backend).

    Parity (`src/model_wrappers.py:638-662`): prompt = category label,
    50 steps, image guidance 1.5, text guidance 8.5; masked-out pixels set
    to 0.5 gray before conditioning (:653).
    """

    def __init__(self, steps: int = 50, text_scale: float = 8.5,
                 image_scale: float = 1.5, image_size: int = 256,
                 tiny: bool = False, seed: int = 0, segmenter=None):
        ucfg = UNetConfig.tiny_test() if tiny else UNetConfig()
        ucfg = dataclasses.replace(ucfg, in_channels=2 * ucfg.in_channels)
        super().__init__(ucfg, VAEConfig.tiny_test() if tiny else VAEConfig(),
                         image_size, seed)
        self.cfg = DDIMConfig(steps=steps, guidance_scale=text_scale,
                              image_guidance_scale=image_scale)
        # `segment_completed` role (src/util.py:163-168): re-segment the
        # completed crop with ISNet saliency for the amodal alpha. True
        # builds the default RembgSegmenter; None keeps full-opaque alpha.
        if segmenter is True:
            from labelany3d_tpu.models.saliency import (
                ISNetConfig,
                RembgSegmenter,
            )

            segmenter = RembgSegmenter(
                ISNetConfig.tiny_test() if tiny else ISNetConfig.general_use(),
                input_size=64 if tiny else 1024,
            )
        self.segmenter = segmenter

    def complete(self, crop_rgba: np.ndarray, label: str) -> np.ndarray:
        from PIL import Image

        if self.params is None:
            self.init_params()
        img = np.asarray(crop_rgba)
        rgb = img[..., :3].astype(np.float32) / 255.0
        alpha = (img[..., 3:4].astype(np.float32) / 255.0) if img.shape[-1] == 4 else np.ones_like(rgb[..., :1])
        cond_img = rgb * alpha + 0.5 * (1.0 - alpha)  # gray outside mask (:653)
        proc = np.asarray(
            Image.fromarray((cond_img * 255).astype(np.uint8)).resize((self.image_size,) * 2)
        )
        x = jnp.asarray(proc, jnp.float32)[None] / 127.5 - 1.0
        img_lat = self.vae.encode(x)

        nch = self.unet_cfg.in_channels // 2
        key = jax.random.PRNGKey(self.seed)
        noise = jax.random.normal(key, img_lat.shape[:-1] + (nch,))
        ctx = self.text.embed(label)
        unctx = self.text.embed("")
        eps = dual_cfg_eps(
            self._eps_model(), ctx, unctx, img_lat, jnp.zeros_like(img_lat),
            self.cfg.guidance_scale, self.cfg.image_guidance_scale,
        )
        out_lat = ddim_sample(eps, noise, self.cfg)
        out = self.vae.decode(out_lat)
        out = np.asarray((jnp.clip(out[0], -1, 1) + 1.0) * 127.5).astype(np.uint8)
        out = np.asarray(Image.fromarray(out).resize(img.shape[1::-1]))
        if self.segmenter is not None and img.shape[-1] == 4:
            from labelany3d_tpu.models.saliency import segment_completed

            return segment_completed(out, img, self.segmenter)
        rgba = np.concatenate([out, np.full(out.shape[:2] + (1,), 255, np.uint8)], axis=-1)
        return rgba


class _CCProjection(nn.Module):
    """Zero123's cc_projection: [CLIP image embed, 4-dof camera] -> one
    cross-attention context token (`zero123.py` CCProjection)."""

    out_dim: int

    @nn.compact
    def __call__(self, image_embed: jnp.ndarray, cam: jnp.ndarray) -> jnp.ndarray:
        x = jnp.concatenate([image_embed, cam], axis=-1)
        return nn.Dense(self.out_dim, name="proj")(x)[:, None, :]


class Zero123NovelView(_Base):
    """Image + relative-camera conditioned novel views (Zero123-equivalent).

    Parity (`src/util.py:78-107`): called with 4 (d_elev, d_azim) deltas
    of +-10 deg for elevation estimation. Conditioning matches zero123:
    CLIP-vision image embedding concatenated with the camera vector
    [d_elev, sin(d_azim), cos(d_azim), d_dist] through cc_projection into
    one context token (`external/dreamgaussian/zero123.py` CCProjection).
    """

    def __init__(self, steps: int = 20, guidance: float = 3.0,
                 image_size: int = 256, tiny: bool = False, seed: int = 0):
        ucfg = UNetConfig.tiny_test() if tiny else UNetConfig()
        ucfg = dataclasses.replace(ucfg, in_channels=2 * ucfg.in_channels)
        super().__init__(ucfg, VAEConfig.tiny_test() if tiny else VAEConfig(),
                         image_size, seed)
        self.cfg = DDIMConfig(steps=steps, guidance_scale=guidance)
        self.vision_cfg = (
            CLIPVisionConfig.tiny_test() if tiny else CLIPVisionConfig.vitl14()
        )
        self.image_encoder = CLIPVisionEncoder(self.vision_cfg)
        self.cc_projection = _CCProjection(self.unet_cfg.context_dim)
        self._enc_params = None
        self._cc_params = None

    def set_params(self, trees: dict):
        """Install converted weights (`diffusion/convert.py::convert_zero123`).

        Accepts any subset of {"unet", "vae", "vision", "cc"}; missing
        components stay random-initialized (init_params warns about them).
        """
        if "unet" in trees:
            self.params = trees["unet"]
        if "vae" in trees:
            self.vae.params = trees["vae"]
        if "vision" in trees:
            self._enc_params = trees["vision"]
        if "cc" in trees:
            self._cc_params = trees["cc"]
        return self

    def init_params(self):
        if self.params is None:
            super().init_params()
            warn_once(
                "zero123_random",
                "Zero123 novel views run with random-initialized weights (no "
                "converted checkpoint) — elevation estimates derived from "
                "them are not meaningful; convert with "
                "convert_zero123 + set_params",
            )
        elif self.vae.params is None:
            self.vae.init_params(self.image_size)
        if self._enc_params is None:
            k = jax.random.PRNGKey(self.seed + 1)
            s = self.vision_cfg.image_size
            img = jnp.zeros((1, s, s, 3))
            self._enc_params = self.image_encoder.init(k, img)["params"]
        if self._cc_params is None:
            emb_dim = self.vision_cfg.projection_dim or self.vision_cfg.width
            self._cc_params = self.cc_projection.init(
                jax.random.PRNGKey(self.seed + 2),
                jnp.zeros((1, emb_dim)), jnp.zeros((1, 4)),
            )["params"]
        return self.params

    def generate(self, rgba: np.ndarray, d_elev: float, d_azim: float,
                 d_dist: float = 0.0, seed: int = 0) -> np.ndarray:
        from PIL import Image

        from labelany3d_tpu.models.clip import preprocess_clip_image

        if self.params is None or self._enc_params is None:
            self.init_params()
        img = np.asarray(rgba)
        rgb = img[..., :3]
        if img.shape[-1] == 4:
            a = img[..., 3:4].astype(np.float32) / 255.0
            rgb = (rgb * a + 255 * (1 - a)).astype(np.uint8)  # white bg (:82)
        proc = np.asarray(Image.fromarray(rgb).resize((self.image_size,) * 2))
        x = jnp.asarray(proc, jnp.float32)[None] / 127.5 - 1.0

        clip_in = preprocess_clip_image(
            proc.astype(np.float32) / 255.0, self.vision_cfg.image_size
        )
        enc = self.image_encoder.apply(
            {"params": self._enc_params}, jnp.asarray(clip_in)[None]
        )
        image_embed = enc.get("image_embeds", enc["pooled"]).astype(jnp.float32)
        cam = jnp.asarray(
            [[np.deg2rad(d_elev), np.sin(np.deg2rad(d_azim)), np.cos(np.deg2rad(d_azim)), d_dist]],
            jnp.float32,
        )
        ctx = self.cc_projection.apply({"params": self._cc_params}, image_embed, cam)

        img_lat = self.vae.encode(x)
        nch = self.unet_cfg.in_channels // 2
        noise = jax.random.normal(jax.random.PRNGKey(seed), img_lat.shape[:-1] + (nch,))

        def eps_model(z, t, c):
            z_full = jnp.concatenate([z, img_lat], axis=-1)
            return self.unet.apply({"params": self.params}, z_full, t / 1000.0, c)

        eps = cfg_eps(eps_model, ctx, jnp.zeros_like(ctx), self.cfg.guidance_scale)
        out_lat = ddim_sample(eps, noise, self.cfg)
        out = self.vae.decode(out_lat)
        return np.asarray((jnp.clip(out[0], -1, 1) + 1.0) * 127.5).astype(np.uint8)
