"""Latent-diffusion family (Flax): UNet, VAE, samplers, task pipelines.

Covers three reference model roles with one TPU-native architecture family
(SURVEY.md §2C):
  * InvSR enhancement — SD-turbo partial-inversion super-resolution
    (`external/InvSR/sampler_invsr.py:111,222`);
  * amodal completion — InstructPix2Pix-style image-conditioned editing
    with dual CFG (`src/model_wrappers.py:638-662`: image guidance 1.5,
    text guidance 8.5, 50 steps);
  * Zero123 novel views — image + relative-camera conditioned generation
    (`src/util.py:78-107`: 4 views at +-10 deg elev/azim for elevation
    estimation);
  * mvd_std multi-view grid diffusion — Hunyuan3D-1's Image2Views (SDXL
    UNet + reference-only attention over a 3x2 view grid,
    `external/Hunyuan3D-1/mvd/hunyuan3d_mvd_std_pipeline.py`).

All modules run with random weights until checkpoints are converted; the
architecture matches SD-1.5-class UNets module-for-module so released
weights map by name (see models/convert.py conventions).
"""

from labelany3d_tpu.models.diffusion.unet import UNetConfig, UNet2D
from labelany3d_tpu.models.diffusion.vae import VAEConfig, Encoder, Decoder, AutoencoderKL
from labelany3d_tpu.models.diffusion.sampler import (
    DDIMConfig,
    ddim_sample,
    add_noise,
    make_alphas,
)
from labelany3d_tpu.models.diffusion.noise_predictor import (
    NoisePredictor,
    NoisePredictorConfig,
    convert_noise_predictor,
)
from labelany3d_tpu.models.diffusion.pipelines import (
    InvSREnhance,
    AmodalCompletion,
    Zero123NovelView,
)
from labelany3d_tpu.models.diffusion.mvd import (
    MVDConfig,
    MVDStdViews,
    MVDUNet,
    MVDUNetConfig,
)

__all__ = [
    "UNetConfig", "UNet2D", "VAEConfig", "Encoder", "Decoder",
    "AutoencoderKL", "DDIMConfig", "ddim_sample", "add_noise", "make_alphas",
    "InvSREnhance", "AmodalCompletion", "Zero123NovelView",
    "MVDConfig", "MVDStdViews", "MVDUNet", "MVDUNetConfig",
    "NoisePredictor", "NoisePredictorConfig", "convert_noise_predictor",
]
