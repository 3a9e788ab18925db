"""DDIM sampling with (dual) classifier-free guidance, jittable.

Covers the reference's sampler needs: 50-step DDIM-style denoising for the
amodal completion (`src/model_wrappers.py:655-659`), few-step partial
inversion for InvSR enhancement, and plain CFG for Zero123. The noise
schedule is SD's scaled-linear beta schedule; the step loop is a lax.scan.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

NUM_TRAIN_TIMESTEPS = 1000


@dataclasses.dataclass(frozen=True)
class DDIMConfig:
    steps: int = 50
    guidance_scale: float = 7.5
    image_guidance_scale: float | None = None  # InstructPix2Pix dual CFG
    eta: float = 0.0
    start_timestep: int = NUM_TRAIN_TIMESTEPS - 1  # lower for partial inversion


def make_alphas() -> jnp.ndarray:
    """SD scaled-linear schedule: alpha_bar_t over 1000 train steps."""
    betas = jnp.linspace(0.00085**0.5, 0.012**0.5, NUM_TRAIN_TIMESTEPS) ** 2
    return jnp.cumprod(1.0 - betas)


def add_noise(x0: jnp.ndarray, noise: jnp.ndarray, timestep: int,
              alphas_bar: jnp.ndarray | None = None) -> jnp.ndarray:
    """Forward-diffuse a clean latent to `timestep` (partial inversion)."""
    ab = make_alphas() if alphas_bar is None else alphas_bar
    a = ab[timestep]
    return jnp.sqrt(a) * x0 + jnp.sqrt(1.0 - a) * noise


def ddim_sample(
    eps_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    noise: jnp.ndarray,
    cfg: DDIMConfig = DDIMConfig(),
) -> jnp.ndarray:
    """Deterministic DDIM from `start_timestep` down to 0.

    `eps_fn(x, t_idx)` predicts noise at integer train-timestep t_idx
    (already guidance-mixed by the caller).
    """
    ab = make_alphas()
    ts = jnp.linspace(cfg.start_timestep, 0, cfg.steps + 1).astype(jnp.int32)

    def step(x, i):
        t = ts[i]
        t_prev = ts[i + 1]
        a_t = ab[t]
        a_prev = jnp.where(t_prev > 0, ab[t_prev], 1.0)
        eps = eps_fn(x, jnp.broadcast_to(t, x.shape[:1]))
        x0 = (x - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
        x_prev = jnp.sqrt(a_prev) * x0 + jnp.sqrt(1.0 - a_prev) * eps
        return x_prev, None

    x, _ = jax.lax.scan(step, noise, jnp.arange(cfg.steps))
    return x


def cfg_eps(
    model_fn: Callable[..., jnp.ndarray],
    cond_ctx: jnp.ndarray,
    uncond_ctx: jnp.ndarray,
    scale: float,
) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """Standard CFG: eps_u + s (eps_c - eps_u)."""

    def fn(x, t):
        e_c = model_fn(x, t, cond_ctx)
        e_u = model_fn(x, t, uncond_ctx)
        return e_u + scale * (e_c - e_u)

    return fn


def dual_cfg_eps(
    model_fn: Callable[..., jnp.ndarray],
    cond_ctx: jnp.ndarray,
    uncond_ctx: jnp.ndarray,
    image_latent: jnp.ndarray,
    zero_image_latent: jnp.ndarray,
    text_scale: float,
    image_scale: float,
) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """InstructPix2Pix dual guidance (parity `model_wrappers.py:655-659`:
    guidance 8.5, image guidance 1.5):

      eps = e(z, 0_img, 0_txt)
          + s_img (e(z, img, 0_txt) - e(z, 0_img, 0_txt))
          + s_txt (e(z, img, txt)  - e(z, img, 0_txt))

    `model_fn(x_with_image_latent, t, ctx)`; the image latent is channel-
    concatenated by this wrapper.
    """

    def fn(x, t):
        x_img = jnp.concatenate([x, image_latent], axis=-1)
        x_zero = jnp.concatenate([x, zero_image_latent], axis=-1)
        e_full = model_fn(x_img, t, cond_ctx)
        e_img = model_fn(x_img, t, uncond_ctx)
        e_none = model_fn(x_zero, t, uncond_ctx)
        return e_none + image_scale * (e_img - e_none) + text_scale * (e_full - e_img)

    return fn
