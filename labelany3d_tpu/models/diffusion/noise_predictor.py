"""InvSR noise predictor (Flax): LR image + timestep -> inversion noise.

Parity target: InvSR's `NoisePredictor` — a time-aware VAE-style encoder
(`external/InvSR/src/diffusers/models/autoencoders/autoencoder_kl.py:512`,
TimeAwareEncoder at `vae.py:185`, checkpoint
`noise_predictor_sd_turbo_v5.pth`) whose predicted posterior replaces the
random starting noise of the partial diffusion inversion
(`pipeline_stable_diffusion_inversion_sr.py:1051-1061`).

Structure (sample-sd-turbo.yaml `model_start` params): conv_in -> two
AttnDownBlock2D levels (3x [time-conditioned resnet -> group-norm
attention], downsample after the first) -> UNet mid block (resnet, attn,
resnet) -> group-norm + silu + conv_out -> (mean, logvar) over the SD
latent channels; `sample_posterior` draws the reparameterized sample.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class NoisePredictorConfig:
    in_channels: int = 3
    latent_channels: int = 4
    widths: Sequence[int] = (256, 512)
    layers_per_block: Sequence[int] = (3, 3)
    temb_channels: int = 512
    attention_head_dim: int = 64
    norm_num_groups: int = 32
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @staticmethod
    def sd_turbo(**kw) -> "NoisePredictorConfig":
        """noise_predictor_sd_turbo_v5.pth shape."""
        return NoisePredictorConfig(**kw)

    @staticmethod
    def tiny_test(**kw) -> "NoisePredictorConfig":
        return NoisePredictorConfig(
            widths=(8, 16), layers_per_block=(1, 1), temb_channels=16,
            attention_head_dim=4, norm_num_groups=4, **kw,
        )


def _groups(cfg, ch):
    return min(cfg.norm_num_groups, ch)


class _TimeResnet(nn.Module):
    cfg: NoisePredictorConfig
    c_out: int

    @nn.compact
    def __call__(self, x, temb):
        cfg = self.cfg
        c_in = x.shape[-1]
        h = nn.GroupNorm(num_groups=_groups(cfg, c_in), epsilon=1e-6,
                         name="norm1")(x)
        h = nn.Conv(self.c_out, (3, 3), padding=1, dtype=cfg.dtype,
                    name="conv1")(nn.silu(h))
        h = h + nn.Dense(self.c_out, dtype=cfg.dtype,
                         name="temb_proj")(nn.silu(temb))[:, None, None, :]
        h = nn.GroupNorm(num_groups=_groups(cfg, self.c_out), epsilon=1e-6,
                         name="norm2")(h)
        h = nn.Conv(self.c_out, (3, 3), padding=1, dtype=cfg.dtype,
                    name="conv2")(nn.silu(h))
        skip = x
        if c_in != self.c_out:
            skip = nn.Conv(self.c_out, (1, 1), dtype=cfg.dtype, name="skip")(x)
        return skip + h


class _GNAttention(nn.Module):
    """VAE-style spatial attention: group norm -> multi-head qkv (with
    bias) -> out proj -> residual (diffusers Attention with
    residual_connection=True)."""

    cfg: NoisePredictorConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        b, hh, ww, c = x.shape
        heads = max(c // cfg.attention_head_dim, 1)
        hd = c // heads
        h = nn.GroupNorm(num_groups=_groups(cfg, c), epsilon=1e-6, name="gn")(x)
        t = h.reshape(b, hh * ww, c)
        q = nn.Dense(c, dtype=cfg.dtype, name="q")(t)
        k = nn.Dense(c, dtype=cfg.dtype, name="k")(t)
        v = nn.Dense(c, dtype=cfg.dtype, name="v")(t)

        def split(z):
            return z.reshape(b, hh * ww, heads, hd)

        o = jax.nn.dot_product_attention(split(q), split(k), split(v))
        o = nn.Dense(c, dtype=cfg.dtype, name="proj")(o.reshape(b, hh * ww, c))
        return x + o.reshape(b, hh, ww, c)


def _timestep_embedding(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """diffusers Timesteps(flip_sin_to_cos=True, freq_shift=0): cos|sin."""
    half = dim // 2
    freqs = jnp.exp(-np.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class NoisePredictor(nn.Module):
    """(B, H, W, 3) image in [0, 1] + (B,) timestep -> dict:

      mean, logvar  (B, H/2^(L-1), W/2^(L-1), latent_channels)
    """

    cfg: NoisePredictorConfig

    @nn.compact
    def __call__(self, image, timestep, center_input_sample: bool = True):
        cfg = self.cfg
        x = image.astype(jnp.float32)
        if center_input_sample:
            x = 2.0 * x - 1.0

        tdim = max(128, cfg.widths[0])
        temb = _timestep_embedding(jnp.asarray(timestep), tdim)
        temb = nn.Dense(cfg.temb_channels, dtype=cfg.dtype, name="t1")(temb)
        temb = nn.Dense(cfg.temb_channels, dtype=cfg.dtype, name="t2")(nn.silu(temb))

        h = nn.Conv(cfg.widths[0], (3, 3), padding=1, dtype=cfg.dtype,
                    name="conv_in")(x)
        for i, w in enumerate(cfg.widths):
            for j in range(cfg.layers_per_block[i]):
                h = _TimeResnet(cfg, w, name=f"down{i}_res{j}")(h, temb)
                h = _GNAttention(cfg, name=f"down{i}_attn{j}")(h)
            if i != len(cfg.widths) - 1:
                # Downsample2D with padding=0: asymmetric (0, 1) pad.
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(w, (3, 3), strides=(2, 2), padding="VALID",
                            dtype=cfg.dtype, name=f"down{i}_ds")(h)
        h = _TimeResnet(cfg, cfg.widths[-1], name="mid_res1")(h, temb)
        h = _GNAttention(cfg, name="mid_attn")(h)
        h = _TimeResnet(cfg, cfg.widths[-1], name="mid_res2")(h, temb)

        h = nn.GroupNorm(num_groups=_groups(cfg, cfg.widths[-1]), epsilon=1e-6,
                         name="norm_out")(h)
        h = nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1,
                    dtype=cfg.dtype, name="conv_out")(nn.silu(h))
        mean, logvar = jnp.split(h, 2, axis=-1)
        return {"mean": mean, "logvar": jnp.clip(logvar, -30.0, 20.0)}

    def sample(self, image, timestep, key, sample_posterior: bool = True):
        out = self(image, timestep)
        if not sample_posterior:
            return out["mean"]
        std = jnp.exp(0.5 * out["logvar"])
        return out["mean"] + std * jax.random.normal(key, out["mean"].shape)


def convert_noise_predictor(state: dict, cfg: NoisePredictorConfig) -> dict:
    """`noise_predictor_sd_turbo_v5.pth` (diffusers TimeAwareEncoder names,
    `encoder.*` prefix) -> NoisePredictor params."""
    from labelany3d_tpu.models.diffusion.convert import (
        _conv,
        _lin,
        _norm,
        _resnet,
        _vae_attn,
    )

    if any(k.startswith("encoder.") for k in state):
        state = {k[len("encoder."):]: v for k, v in state.items()
                 if k.startswith("encoder.")} | {
            k: v for k, v in state.items() if not k.startswith("encoder.")}

    params: dict = {
        "conv_in": _conv(state, "conv_in."),
        "t1": _lin(state, "time_embedding.linear_1."),
        "t2": _lin(state, "time_embedding.linear_2."),
        "norm_out": _norm(state, "conv_norm_out."),
        "conv_out": _conv(state, "conv_out."),
        "mid_res1": _np_resnet(state, "mid_block.resnets.0."),
        "mid_attn": _np_attn(state, "mid_block.attentions.0."),
        "mid_res2": _np_resnet(state, "mid_block.resnets.1."),
    }
    for i in range(len(cfg.widths)):
        for j in range(cfg.layers_per_block[i]):
            params[f"down{i}_res{j}"] = _np_resnet(
                state, f"down_blocks.{i}.resnets.{j}.")
            params[f"down{i}_attn{j}"] = _np_attn(
                state, f"down_blocks.{i}.attentions.{j}.")
        if i != len(cfg.widths) - 1:
            params[f"down{i}_ds"] = _conv(
                state, f"down_blocks.{i}.downsamplers.0.conv.")
    return params


def _np_resnet(state, pre):
    from labelany3d_tpu.models.diffusion.convert import _conv, _lin, _norm

    p = {
        "norm1": _norm(state, pre + "norm1."),
        "conv1": _conv(state, pre + "conv1."),
        "temb_proj": _lin(state, pre + "time_emb_proj."),
        "norm2": _norm(state, pre + "norm2."),
        "conv2": _conv(state, pre + "conv2."),
    }
    if pre + "conv_shortcut.weight" in state:
        p["skip"] = _conv(state, pre + "conv_shortcut.")
    return p


def _np_attn(state, pre):
    from labelany3d_tpu.models.diffusion.convert import _lin, _norm

    return {
        "gn": _norm(state, pre + "group_norm."),
        "q": _lin(state, pre + "to_q."),
        "k": _lin(state, pre + "to_k."),
        "v": _lin(state, pre + "to_v."),
        "proj": _lin(state, pre + "to_out.0."),
    }
