"""Structured-latent (SLat) flow model over active voxels.

Checkpoint-faithful to TRELLIS's `SLatFlowModel`
(`trellis/models/structured_latent_flow.py:68-262`): a sparse UNet —
SparseLinear input, `SparseResBlock3d` stages with 2x down/upsampling and
skip concatenation around a 24-block modulated cross-attention DiT torso
(full attention over active voxels at the pooled resolution). Released
`slat_flow_img_dit_L_64l8p2` weights load via
`models/convert_trellis.py::convert_trellis_slat_flow`.

TPU-native: fixed voxel-slot arrays (N static slots + valid mask) replace
spconv varlen batching; the submanifold conv is the gather/matmul kernel in
`ops/sparse_conv.py`; down/upsampling is the `sparse_pool_pair`/`sparse_unpool`
segment reduction; the DiT torso runs masked flash attention.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from labelany3d_tpu.models.trellis.dit import (
    AdaLNModulation,
    DiTBlock,
    DiTConfig,
    TimestepEmbedder,
    ape_3d,
)
from labelany3d_tpu.ops.sparse_conv import (
    sparse_pool_pair,
    sparse_unpool,
    subm_sparse_conv3d,
)


@dataclasses.dataclass(frozen=True)
class SLatConfig:
    """SLat flow hyperparameters (slat_flow_img_dit_L_64l8p2 shapes)."""

    resolution: int = 64
    latent_channels: int = 8
    out_channels: int = 8
    io_block_channels: Sequence[int] = (128,)
    num_io_res_blocks: int = 2
    use_skip_connection: bool = True
    dit: DiTConfig = dataclasses.field(
        default_factory=lambda: DiTConfig(qk_rms_norm=True))
    dtype: Any = jnp.bfloat16

    # Back-compat alias used by the pipeline's slot bookkeeping.
    @property
    def grid_size(self) -> int:
        return self.resolution

    @staticmethod
    def tiny_test() -> "SLatConfig":
        return SLatConfig(
            resolution=16, latent_channels=4, out_channels=4,
            io_block_channels=(8,), num_io_res_blocks=2,
            dit=DiTConfig.tiny_test(),
        )


class SparseConv3d(nn.Module):
    """Batched submanifold sparse conv module (spconv SubMConv3d role)."""

    in_ch: int
    out_ch: int
    kernel: int = 3
    zero_init: bool = False

    @nn.compact
    def __call__(self, feats, coords, valid, grid_size: int):
        k = self.kernel
        init = nn.initializers.zeros if self.zero_init else nn.initializers.lecun_normal()
        w = self.param("kernel", init, (k, k, k, self.in_ch, self.out_ch))
        b = self.param("bias", nn.initializers.zeros, (self.out_ch,))

        def one(f, c, v):
            return subm_sparse_conv3d(f, c, v, w, b, grid_size=grid_size)

        return jax.vmap(one)(feats, coords, valid)


class SparseResBlock3d(nn.Module):
    """`structured_latent_flow.py:14-65`: affine-LN -> SiLU -> conv ->
    (non-affine LN * (1+scale) + shift from the t embedding) -> SiLU ->
    zero-init conv, plus a linear skip. Up/downsampling is applied by the
    caller *before* this body (the reference's `_updown` runs first)."""

    channels: int
    out_channels: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats, coords, valid, t_emb, grid_size: int):
        emb = nn.silu(t_emb.astype(jnp.float32))
        emb = nn.Dense(2 * self.out_channels, dtype=jnp.float32, name="emb")(emb)
        scale, shift = jnp.split(emb, 2, axis=-1)

        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(feats)
        h = nn.silu(h).astype(self.dtype)
        h = SparseConv3d(self.channels, self.out_channels, name="conv1")(
            h, coords, valid, grid_size)
        h = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                         dtype=jnp.float32, name="norm2")(h)
        h = h * (1 + scale[:, None, :]) + shift[:, None, :]
        h = nn.silu(h).astype(self.dtype)
        h = SparseConv3d(self.out_channels, self.out_channels, zero_init=True,
                         name="conv2")(h, coords, valid, grid_size)
        if self.out_channels != self.channels:
            feats = nn.Dense(self.out_channels, dtype=self.dtype, name="skip")(feats)
        return h + feats


class SLatFlowModel(nn.Module):
    """Velocity field over per-voxel latents.

    Inputs: feats (B, N, C) latent slots, coords (B, N, 3), valid (B, N),
    t (B,) already scaled by 1000, cond_tokens (B, M, D).
    Output: (B, N, C) velocity (invalid slots masked to 0).
    """

    cfg: SLatConfig

    @nn.compact
    def __call__(self, feats, coords, valid, t, cond_tokens,
                 torso_slots: int | None = None):
        """`torso_slots` (static) caps the slot count entering the DiT
        torso: `sparse_pool_pair` writes parents compacted at the front in
        ascending cell-code order, so for surface-like voxel sets (~4
        children per 2^3 parent cell) the coarse level occupies only ~N/4
        slots — slicing to the actual parent count cuts the torso's
        attention cost quadratically and every other coarse-level op
        linearly. The caller (`TrellisPipeline.sample_slat`) measures the
        real parent count host-side and picks a bucket; an under-budgeted
        call degrades gracefully (overflow children unpool to zero, see
        `sparse_unpool`) but is never produced by the pipeline."""
        cfg = self.cfg
        dit = cfg.dit
        b = feats.shape[0]
        coords = coords if coords.ndim == 3 else jnp.broadcast_to(
            coords, (b, *coords.shape))
        valid = valid if valid.ndim == 2 else jnp.broadcast_to(valid, (b, *valid.shape))

        io = list(cfg.io_block_channels)
        h = nn.Dense(io[0], dtype=dit.dtype, name="input_layer")(feats)
        t_emb = TimestepEmbedder(dit.width, name="t_embedder")(t)
        mods = AdaLNModulation(dit.width, name="adaln")(t_emb) if dit.share_mod else None

        gs = cfg.resolution
        cur_coords, cur_valid = coords, valid
        skips = []          # per-input-block feature skips
        levels = []         # (fine_coords, fine_valid, fine_gs, child2parent)
        bi = 0
        n_levels = len(io)
        for li, (chs, next_chs) in enumerate(zip(io, io[1:] + [dit.width])):
            for _ in range(cfg.num_io_res_blocks - 1):
                h = SparseResBlock3d(chs, chs, dit.dtype, name=f"in{bi}")(
                    h, cur_coords, cur_valid, t_emb, gs)
                skips.append(h)
                bi += 1
            # Downsample block: pool first (the reference's _updown), then
            # the res body at the coarse level.
            fine = (cur_coords, cur_valid, gs)
            pooled = jax.vmap(lambda f, c, v, g=gs: sparse_pool_pair(f, c, v, 2, g))(
                h, cur_coords, cur_valid)
            h, cur_coords, cur_valid, c2p = pooled
            if (li == n_levels - 1 and torso_slots
                    and torso_slots < h.shape[1]):
                h = h[:, :torso_slots]
                cur_coords = cur_coords[:, :torso_slots]
                cur_valid = cur_valid[:, :torso_slots]
            levels.append((*fine, c2p))
            gs //= 2
            h = SparseResBlock3d(chs, next_chs, dit.dtype, name=f"in{bi}")(
                h, cur_coords, cur_valid, t_emb, gs)
            skips.append(h)
            bi += 1

        h = h + ape_3d(cur_coords, dit.width).astype(dit.dtype)
        attn_spec = ("masked", cur_valid)
        cond_tokens = cond_tokens.astype(dit.dtype)
        for i in range(dit.depth):
            h = DiTBlock(dit, name=f"block{i}")(
                h, t_emb=t_emb, cond_tokens=cond_tokens,
                attn_spec=attn_spec, mods=mods)

        bo = 0
        for chs, prev_chs in zip(reversed(io), [dit.width] + list(reversed(io[1:]))):
            # Upsample block: concat the same-level skip, unpool to the
            # finer level (the reference's _updown), then the res body there.
            in_ch = prev_chs
            if cfg.use_skip_connection:
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                in_ch = prev_chs * 2
            else:
                skips.pop()
            cur_coords, cur_valid, gs, c2p = levels.pop()
            h = jax.vmap(sparse_unpool)(h, c2p)
            h = SparseResBlock3d(in_ch, chs, dit.dtype, name=f"out{bo}")(
                h, cur_coords, cur_valid, t_emb, gs)
            bo += 1
            for _ in range(cfg.num_io_res_blocks - 1):
                in_ch = chs
                if cfg.use_skip_connection:
                    h = jnp.concatenate([h, skips.pop()], axis=-1)
                    in_ch = chs * 2
                else:
                    skips.pop()
                h = SparseResBlock3d(in_ch, chs, dit.dtype, name=f"out{bo}")(
                    h, cur_coords, cur_valid, t_emb, gs)
                bo += 1

        h = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-5,
                         dtype=jnp.float32, name="norm_out")(h)
        v = nn.Dense(cfg.out_channels, dtype=jnp.float32,
                     kernel_init=nn.initializers.zeros, name="out_layer")(h)
        return jnp.where(valid[..., None], v, 0.0)
