"""SD-class KL autoencoder (Flax): images <-> 4-channel latents at 1/8 res.

Graph-compatible with diffusers' `AutoencoderKL` (SD-1.x): conv_in, per-level
resnet pairs with stride-2 downsamplers (right/bottom padding), a mid block
with single-head spatial attention, quant/post_quant 1x1 convs — so released
SD VAE weights convert 1:1 via `convert.convert_sd_vae` (validated against a
torch replica in tests/test_sd_convert.py). GroupNorm eps is 1e-6 (diffusers
VAE default, unlike the UNet's 1e-5).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

SD_LATENT_SCALE = 0.18215  # SD convention: latents multiplied by this


def _num_groups(ch: int, target: int = 32) -> int:
    """Largest group count <= target dividing ch (GroupNorm constraint)."""
    g = min(target, ch)
    while ch % g:
        g -= 1
    return g


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    latent_channels: int = 4
    widths: tuple = (128, 256, 512, 512)
    layers_per_block: int = 2
    dtype: Any = jnp.bfloat16

    @staticmethod
    def tiny_test() -> "VAEConfig":
        return VAEConfig(widths=(8, 16), layers_per_block=1)


class _Res(nn.Module):
    """diffusers ResnetBlock2D without time embedding (VAE flavor, eps 1e-6)."""

    ch: int
    dtype: Any

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(num_groups=_num_groups(x.shape[-1]), dtype=jnp.float32, name="n1")(x)
        h = nn.Conv(self.ch, (3, 3), dtype=self.dtype, name="c1")(nn.silu(h).astype(self.dtype))
        h = nn.GroupNorm(num_groups=_num_groups(self.ch), dtype=jnp.float32, name="n2")(h)
        h = nn.Conv(self.ch, (3, 3), dtype=self.dtype, name="c2")(nn.silu(h).astype(self.dtype))
        if x.shape[-1] != self.ch:
            x = nn.Conv(self.ch, (1, 1), dtype=self.dtype, name="skip")(x.astype(self.dtype))
        return x + h


class _MidAttn(nn.Module):
    """Single-head spatial self-attention (diffusers VAE mid attention:
    GroupNorm + biased q/k/v/out projections, residual add)."""

    dtype: Any

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        t = nn.GroupNorm(num_groups=_num_groups(c), dtype=jnp.float32, name="gn")(x)
        t = t.reshape(b, h * w, c).astype(self.dtype)
        q = nn.Dense(c, dtype=self.dtype, name="q")(t)
        k = nn.Dense(c, dtype=self.dtype, name="k")(t)
        v = nn.Dense(c, dtype=self.dtype, name="v")(t)
        a = jax.nn.softmax(
            (q.astype(jnp.float32) @ k.astype(jnp.float32).transpose(0, 2, 1))
            / jnp.sqrt(jnp.float32(c)),
            axis=-1,
        )
        t = (a @ v.astype(jnp.float32)).astype(self.dtype)
        t = nn.Dense(c, dtype=self.dtype, name="proj")(t)
        return x + t.reshape(b, h, w, c)


class Encoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, images):
        cfg = self.cfg
        h = nn.Conv(cfg.widths[0], (3, 3), dtype=cfg.dtype, name="in")(images.astype(cfg.dtype))
        for i, w in enumerate(cfg.widths):
            for r in range(cfg.layers_per_block):
                h = _Res(w, cfg.dtype, name=f"res{i}_{r}")(h)
            if i < len(cfg.widths) - 1:
                # diffusers VAE Downsample2D: pad right/bottom by 1, VALID
                # stride-2 conv (matches XLA low=0/high=1 placement).
                h = nn.Conv(w, (3, 3), strides=(2, 2), padding=((0, 1), (0, 1)),
                            dtype=cfg.dtype, name=f"ds{i}")(h)
        h = _Res(cfg.widths[-1], cfg.dtype, name="mid_res1")(h)
        h = _MidAttn(cfg.dtype, name="mid_attn")(h)
        h = _Res(cfg.widths[-1], cfg.dtype, name="mid_res2")(h)
        h = nn.GroupNorm(num_groups=_num_groups(h.shape[-1]), dtype=jnp.float32, name="n_out")(h)
        moments = nn.Conv(2 * cfg.latent_channels, (3, 3), dtype=jnp.float32,
                          param_dtype=jnp.float32, name="out")(nn.silu(h).astype(jnp.float32))
        moments = nn.Conv(2 * cfg.latent_channels, (1, 1), dtype=jnp.float32,
                          param_dtype=jnp.float32, name="quant")(moments)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30, 20)


class Decoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, latents):
        cfg = self.cfg
        h = nn.Conv(cfg.latent_channels, (1, 1), dtype=jnp.float32,
                    param_dtype=jnp.float32, name="post_quant")(latents)
        h = nn.Conv(cfg.widths[-1], (3, 3), dtype=cfg.dtype, name="in")(h.astype(cfg.dtype))
        h = _Res(cfg.widths[-1], cfg.dtype, name="mid_res1")(h)
        h = _MidAttn(cfg.dtype, name="mid_attn")(h)
        h = _Res(cfg.widths[-1], cfg.dtype, name="mid_res2")(h)
        for j, w in enumerate(reversed(cfg.widths)):
            for r in range(cfg.layers_per_block + 1):
                h = _Res(w, cfg.dtype, name=f"res{j}_{r}")(h)
            if j < len(cfg.widths) - 1:
                b, hh, ww, c = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, c), method="nearest")
                h = nn.Conv(w, (3, 3), dtype=cfg.dtype, name=f"us{j}")(h)
        h = nn.GroupNorm(num_groups=_num_groups(h.shape[-1]), dtype=jnp.float32, name="n_out")(h)
        return nn.Conv(3, (3, 3), dtype=jnp.float32, param_dtype=jnp.float32,
                       name="out")(nn.silu(h).astype(jnp.float32))


class AutoencoderKL:
    """Paired encoder/decoder with SD latent scaling.

    `scaling_factor` defaults to the SD-1.x 0.18215; SDXL-family
    checkpoints (e.g. Hunyuan3D mvd_std's vae) ship 0.13025 in their
    config.json. `encode(scale=False)` returns the raw posterior sample
    (diffusers `encode_image(scale_factor=False)` parity,
    `mvd/hunyuan3d_mvd_std_pipeline.py:221-223`).
    """

    def __init__(self, cfg: VAEConfig | None = None, seed: int = 0,
                 scaling_factor: float = SD_LATENT_SCALE):
        self.cfg = cfg or VAEConfig()
        self.encoder = Encoder(self.cfg)
        self.decoder = Decoder(self.cfg)
        self.params: dict | None = None
        self.scaling_factor = scaling_factor
        self._seed = seed

    def init_params(self, image_size: int = 64) -> dict:
        k1, k2 = jax.random.split(jax.random.PRNGKey(self._seed))
        img = jnp.zeros((1, image_size, image_size, 3))
        enc = self.encoder.init(k1, img)["params"]
        factor = 2 ** (len(self.cfg.widths) - 1)
        lat = jnp.zeros((1, image_size // factor, image_size // factor, self.cfg.latent_channels))
        dec = self.decoder.init(k2, lat)["params"]
        self.params = {"encoder": enc, "decoder": dec}
        return self.params

    def encode(self, images: jnp.ndarray, key=None, scale: bool = True) -> jnp.ndarray:
        mean, logvar = self.encoder.apply({"params": self.params["encoder"]}, images)
        if key is not None:
            mean = mean + jnp.exp(0.5 * logvar) * jax.random.normal(key, mean.shape)
        return mean * self.scaling_factor if scale else mean

    def decode(self, latents: jnp.ndarray, scale: bool = True) -> jnp.ndarray:
        if scale:
            latents = latents / self.scaling_factor
        return self.decoder.apply({"params": self.params["decoder"]}, latents)
