"""Data-parallel labeling over the virtual 8-device mesh (SPMD claim)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from labelany3d_tpu.parallel.mesh import make_mesh, shard_batch
from labelany3d_tpu.pipeline.labeling import labeling_step


def _batch(b=8, h=64, w=96, i=4):
    rng = np.random.default_rng(0)
    rel = rng.uniform(2, 8, (b, h, w)).astype(np.float32)
    metric = rel * 2.0
    dmask = np.ones((b, h, w), bool)
    K = np.tile(np.array([[80.0, 0, w / 2], [0, 80.0, h / 2], [0, 0, 1]], np.float32), (b, 1, 1))
    masks = np.zeros((b, i, h, w), bool)
    for bb in range(b):
        for ii in range(i):
            y, x = 8 + 10 * (ii // 2), 8 + 30 * (ii % 2)
            masks[bb, ii, y : y + 12, x : x + 20] = True
    return rel, metric, dmask, K, masks


def test_labeling_step_sharded_matches_single_device():
    rel, metric, dmask, K, masks = _batch()
    key = jax.random.PRNGKey(0)

    step = lambda r, m, dm, k, msk: labeling_step(r, m, dm, k, msk, key, num_points=128)
    ref_aligned, ref_out = jax.jit(step)(rel, metric, dmask, K, masks)

    mesh = make_mesh(data=8, model=1)
    with mesh:
        sharded_args = shard_batch(mesh, (rel, metric, dmask, K, masks))
        out_sh = NamedSharding(mesh, P("data"))
        aligned, out = jax.jit(step)(*sharded_args)
        # outputs carry the data sharding end to end
        assert aligned.sharding.spec == P("data") or aligned.sharding.is_fully_replicated is False
    np.testing.assert_allclose(np.asarray(aligned), np.asarray(ref_aligned), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out.boxes.center_cam), np.asarray(ref_out.boxes.center_cam),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_array_equal(np.asarray(out.num_valid), np.asarray(ref_out.num_valid))
