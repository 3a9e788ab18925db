"""Task pipelines on the diffusion family: enhance, completion, novel view.

Each class implements the corresponding stage-backend protocol and slots
into the model registry ('enhance' / 'completion' / zero123 for elevation).
Conditioning encoders are lightweight built-ins (a small ViT image encoder
and a hash-embedding text stub) — checkpoint conversion replaces them with
CLIP weights; the sampling math and guidance scales follow the reference.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from labelany3d_tpu.models.diffusion.sampler import (
    DDIMConfig,
    add_noise,
    cfg_eps,
    ddim_sample,
    dual_cfg_eps,
)
from labelany3d_tpu.models.diffusion.unet import UNet2D, UNetConfig
from labelany3d_tpu.models.diffusion.vae import AutoencoderKL, VAEConfig
from labelany3d_tpu.models.vit import ViT, ViTConfig


def _text_tokens(prompt: str, dim: int, length: int = 8) -> jnp.ndarray:
    """Deterministic hash-embedding text conditioning stub (CLIP stand-in)."""
    rngs = [abs(hash((prompt, i))) % (2**31) for i in range(length)]
    rows = [np.asarray(jax.random.normal(jax.random.PRNGKey(r), (dim,))) for r in rngs]
    return jnp.asarray(np.stack(rows))[None]  # (1, L, D)


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
                 image_size: int = 256, tiny: bool = False, seed: int = 0):
        super().__init__(
            UNetConfig.tiny_test() if tiny else UNetConfig(),
            VAEConfig.tiny_test() if tiny else VAEConfig(),
            image_size, seed,
        )
        self.factor = factor
        self.cfg = DDIMConfig(steps=steps, guidance_scale=1.0, start_timestep=start_timestep)

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
        noised = add_noise(lat, jax.random.normal(key, lat.shape), self.cfg.start_timestep)
        ctx = _text_tokens("", self.unet_cfg.context_dim)
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
                 tiny: bool = False, seed: int = 0):
        ucfg = UNetConfig.tiny_test() if tiny else UNetConfig()
        ucfg = dataclasses.replace(ucfg, in_channels=2 * ucfg.in_channels)
        super().__init__(ucfg, VAEConfig.tiny_test() if tiny else VAEConfig(),
                         image_size, seed)
        self.cfg = DDIMConfig(steps=steps, guidance_scale=text_scale,
                              image_guidance_scale=image_scale)

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
        ctx = _text_tokens(label, self.unet_cfg.context_dim)
        unctx = _text_tokens("", self.unet_cfg.context_dim)
        eps = dual_cfg_eps(
            self._eps_model(), ctx, unctx, img_lat, jnp.zeros_like(img_lat),
            self.cfg.guidance_scale, self.cfg.image_guidance_scale,
        )
        out_lat = ddim_sample(eps, noise, self.cfg)
        out = self.vae.decode(out_lat)
        out = np.asarray((jnp.clip(out[0], -1, 1) + 1.0) * 127.5).astype(np.uint8)
        out = np.asarray(Image.fromarray(out).resize(img.shape[1::-1]))
        rgba = np.concatenate([out, np.full(out.shape[:2] + (1,), 255, np.uint8)], axis=-1)
        return rgba


class Zero123NovelView(_Base):
    """Image + relative-camera conditioned novel views (Zero123-equivalent).

    Parity (`src/util.py:78-107`): called with 4 (d_elev, d_azim) deltas
    of +-10 deg for elevation estimation. Conditioning = image-encoder
    tokens + a camera token [d_elev, sin(d_azim), cos(d_azim), d_dist].
    """

    def __init__(self, steps: int = 20, guidance: float = 3.0,
                 image_size: int = 256, tiny: bool = False, seed: int = 0):
        ucfg = UNetConfig.tiny_test() if tiny else UNetConfig()
        ucfg = dataclasses.replace(ucfg, in_channels=2 * ucfg.in_channels)
        super().__init__(ucfg, VAEConfig.tiny_test() if tiny else VAEConfig(),
                         image_size, seed)
        self.cfg = DDIMConfig(steps=steps, guidance_scale=guidance)
        enc_cfg = ViTConfig.tiny_test() if tiny else ViTConfig.base(patch_size=16)
        self.image_encoder = ViT(enc_cfg)
        self._enc_params = None

    def init_params(self):
        super().init_params()
        k = jax.random.PRNGKey(self.seed + 1)
        img = jnp.zeros((1, self.image_size, self.image_size, 3))
        self._enc_params = self.image_encoder.init(k, img)["params"]
        return self.params

    def generate(self, rgba: np.ndarray, d_elev: float, d_azim: float,
                 d_dist: float = 0.0, seed: int = 0) -> np.ndarray:
        from PIL import Image

        if self.params is None or self._enc_params is None:
            self.init_params()
        img = np.asarray(rgba)
        rgb = img[..., :3]
        if img.shape[-1] == 4:
            a = img[..., 3:4].astype(np.float32) / 255.0
            rgb = (rgb * a + 255 * (1 - a)).astype(np.uint8)  # white bg (:82)
        proc = np.asarray(Image.fromarray(rgb).resize((self.image_size,) * 2))
        x = jnp.asarray(proc, jnp.float32)[None] / 127.5 - 1.0

        tokens = self.image_encoder.apply({"params": self._enc_params}, x)["tokens"]
        ctx_dim = self.unet_cfg.context_dim
        tokens = tokens[..., :ctx_dim] if tokens.shape[-1] >= ctx_dim else jnp.pad(
            tokens, ((0, 0), (0, 0), (0, ctx_dim - tokens.shape[-1]))
        )
        cam = jnp.asarray(
            [np.deg2rad(d_elev), np.sin(np.deg2rad(d_azim)), np.cos(np.deg2rad(d_azim)), d_dist],
            jnp.float32,
        )
        cam_tok = jnp.pad(cam, (0, ctx_dim - 4))[None, None, :]
        ctx = jnp.concatenate([cam_tok, tokens], axis=1)

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
