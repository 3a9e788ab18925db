"""One-command checkpoint conversion: torch/safetensors -> orbax.

The reference installs weights by downloading torch checkpoints per model
(`external/checkpoints/download.sh`, HF hub calls in
`src/model_wrappers.py:201-230,482-543`). Here install is download +
one command:

    python -m labelany3d_tpu.models.convert_cli moge moge-vitl.pt \
        --out /ckpts            # -> /ckpts/moge (orbax)

Every converter is torch-replica/oracle verified in tests (see
docs/WEIGHTS.md); this CLI only wires loading, the production config,
the converter, and the orbax save together. Backends pick the result up
via `models/checkpoints.py::load_params` with the same registry name.
"""

from __future__ import annotations

import argparse


def _load_state(path: str) -> dict:
    """torch .pt/.pth/.bin or .safetensors -> {name: np.ndarray}."""
    import numpy as np

    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    from labelany3d_tpu.models.convert import load_torch_checkpoint

    state = load_torch_checkpoint(path)
    # some releases nest under 'state_dict' (InvSR noise predictor does)
    if "state_dict" in state and isinstance(state["state_dict"], dict):
        state = state["state_dict"]
    return {k: np.asarray(v) for k, v in state.items()}


def _moge(state, tiny):
    from labelany3d_tpu.models.convert import convert_moge_checkpoint
    from labelany3d_tpu.models.moge import MoGeConfig

    cfg = MoGeConfig.tiny_reference_test() if tiny else MoGeConfig.vitl()
    grid = (4, 4) if tiny else (37, 37)
    return convert_moge_checkpoint(state, cfg, grid)


def _depth_pro(state, tiny):
    from labelany3d_tpu.models.convert import convert_depth_pro
    from labelany3d_tpu.models.depth_pro import DepthPro35Config

    cfg = DepthPro35Config.tiny_test() if tiny else DepthPro35Config()
    return convert_depth_pro(state, cfg)


def _matcher(state, tiny):
    from labelany3d_tpu.models.convert import convert_mast3r
    from labelany3d_tpu.models.matcher import MatcherConfig

    cfg = MatcherConfig.tiny_test() if tiny else MatcherConfig.mast3r_vitl()
    return convert_mast3r(state, cfg)


def _sd_unet(state, tiny):
    from labelany3d_tpu.models.diffusion import UNetConfig
    from labelany3d_tpu.models.diffusion.convert import convert_sd_unet

    return convert_sd_unet(state, UNetConfig.tiny_test() if tiny else UNetConfig())


def _sd_vae(state, tiny):
    from labelany3d_tpu.models.diffusion import VAEConfig
    from labelany3d_tpu.models.diffusion.convert import convert_sd_vae

    return convert_sd_vae(state, VAEConfig.tiny_test() if tiny else VAEConfig())


def _clip_text(state, tiny):
    from labelany3d_tpu.models.clip import CLIPTextConfig, convert_clip_text

    cfg = CLIPTextConfig.tiny_test() if tiny else CLIPTextConfig.sd15()
    return convert_clip_text(state, cfg)


def _clip_vision(state, tiny):
    from labelany3d_tpu.models.clip import CLIPVisionConfig, convert_clip_vision

    cfg = CLIPVisionConfig.tiny_test() if tiny else CLIPVisionConfig.vitl14()
    return convert_clip_vision(state, cfg)


def _sam(state, tiny):
    from labelany3d_tpu.models.sam import SamConfig, convert_sam

    return convert_sam(state, SamConfig.tiny_test() if tiny else SamConfig.vit_huge())


def _segformer(state, tiny):
    from labelany3d_tpu.models.segformer import SegFormerConfig, convert_segformer

    cfg = SegFormerConfig.tiny_test() if tiny else SegFormerConfig.b2()
    return convert_segformer(state, cfg)


def _isnet(state, tiny):
    from labelany3d_tpu.models.saliency import ISNetConfig, convert_isnet

    cfg = ISNetConfig.tiny_test() if tiny else ISNetConfig.general_use()
    return convert_isnet(state, cfg)


def _noise_predictor(state, tiny):
    from labelany3d_tpu.models.diffusion.noise_predictor import (
        NoisePredictorConfig,
        convert_noise_predictor,
    )

    cfg = NoisePredictorConfig.tiny_test() if tiny else NoisePredictorConfig.sd_turbo()
    return convert_noise_predictor(state, cfg)


# registry name -> converter(state, tiny) with the production config
CONVERTERS = {
    "moge": _moge,
    "depth_pro": _depth_pro,
    "matcher": _matcher,
    "sd_unet": _sd_unet,
    "sd_vae": _sd_vae,
    "clip_text": _clip_text,
    "clip_vision": _clip_vision,
    "sam": _sam,
    "segformer": _segformer,
    "isnet": _isnet,
    "noise_predictor": _noise_predictor,
}


def main(argv=None) -> str:
    ap = argparse.ArgumentParser(
        description="Convert a released torch checkpoint to an orbax "
        "checkpoint this framework's backends load directly."
    )
    ap.add_argument("model", choices=sorted(CONVERTERS))
    ap.add_argument("checkpoint", help=".pt/.pth/.bin or .safetensors path")
    ap.add_argument("--out", default="checkpoints", help="checkpoint dir root")
    ap.add_argument("--name", default=None,
                    help="registry name (default: the model argument)")
    ap.add_argument("--tiny", action="store_true",
                    help="use the tiny test config (CI/self-test only)")
    args = ap.parse_args(argv)

    from labelany3d_tpu.models.checkpoints import save_params

    state = _load_state(args.checkpoint)
    params = CONVERTERS[args.model](state, args.tiny)

    import jax

    n_params = sum(int(p.size) for p in jax.tree.leaves(params))
    path = save_params(args.out, args.name or args.model, params)
    print(f"{args.model}: {n_params / 1e6:.1f}M params -> {path}")
    return path


if __name__ == "__main__":
    main()
