"""Parameter checkpointing (orbax) and backend weight loading.

The reference downloads torch checkpoints per model (`external/checkpoints/
download.sh`, HF hub calls in `src/model_wrappers.py`). Here converted Flax
parameters are stored as orbax checkpoints; backends accept a
`checkpoint_dir` and load what exists, falling back to random init (tests /
no-weights environments).

Layout: <checkpoint_dir>/<name>/ with orbax PyTree content, where <name> is
the registry key ('moge', 'depth_pro', 'matcher', 'trellis', ...).
"""

from __future__ import annotations

import os


def save_params(checkpoint_dir: str, name: str, params) -> str:
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(checkpoint_dir, name))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()
    return path


def load_params(checkpoint_dir: str, name: str, like=None):
    """Load a named checkpoint; returns None when absent.

    `like` (an example pytree) restores with matching structure/dtypes.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(checkpoint_dir, name))
    if not os.path.isdir(path):
        return None
    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        return ckptr.restore(path, like)
    return ckptr.restore(path)


def convert_and_save_dinov2(
    torch_checkpoint: str, checkpoint_dir: str, name: str, cfg, grid_hw
) -> str:
    """torch DINOv2-style checkpoint -> converted Flax orbax checkpoint."""
    from labelany3d_tpu.models.convert import convert_dinov2_vit, load_torch_checkpoint

    state = load_torch_checkpoint(torch_checkpoint)
    params = convert_dinov2_vit(state, cfg, grid_hw)
    return save_params(checkpoint_dir, name, params)
