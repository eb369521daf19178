"""SPMD structure lock: compile the sharded train step on the 8-device mesh
and assert the collective pattern XLA inserted.

The design contract (PARITY.md §2.h; replaces the reference's explicit
pmap+pmean, MipNeRF360/internal/train_utils.py:453-470): batch sharded on
('data',), params replicated, ONE jit — the only cross-device traffic is
the gradient/stats all-reduce. If a future change accidentally shards
params, reshards the batch, or gathers per-ray tensors, extra collectives
(all-gather / all-to-all / collective-permute) appear in the optimized HLO
and this test catches it before it costs real ICI bandwidth."""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_hugs_tpu.parallel import mesh as mesh_lib
from nerf_hugs_tpu.train import step as train_step_lib
from nerf_hugs_tpu.utils import structs
from tests.test_train_e2e import tiny_config


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() == 8, "conftest must force 8 cpu devices"
    return mesh_lib.make_mesh()


def _example_batch(batch_size, mesh):
    rng = np.random.RandomState(0)
    dirs = rng.randn(batch_size, 3).astype(np.float32)
    rays = structs.Rays(
        pix_coords=rng.rand(batch_size, 2).astype(np.float32),
        origins=0.1 * rng.randn(batch_size, 3).astype(np.float32),
        directions=dirs,
        viewdirs=(dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
                  ).astype(np.float32),
        radii=np.full((batch_size, 1), 0.001, np.float32),
        lossmult=np.ones((batch_size, 1), np.float32),
        static_mask=np.ones((batch_size, 1), np.float32),
        near=np.full((batch_size, 1), 0.2, np.float32),
        far=np.full((batch_size, 1), 2.0, np.float32),
        embed_idx=np.zeros((batch_size, 1), np.int32),
        cam_idx=np.zeros((batch_size, 1), np.int32))
    rgb = rng.rand(batch_size, 3).astype(np.float32)
    return mesh_lib.shard_batch(structs.Batch(rays=rays, rgb=rgb), mesh)


def test_train_step_collective_structure(mesh):
    config = tiny_config()
    _, state, _, train_step, _ = train_step_lib.setup_model(
        config, jax.random.PRNGKey(0), mesh)
    state = mesh_lib.replicate(state, mesh)
    batch = _example_batch(config.batch_size, mesh)
    thresholds = jnp.ones(config.model.num_levels)

    compiled = train_step.lower(
        jax.random.PRNGKey(1), state, batch, jnp.asarray(0.5),
        thresholds).compile()
    hlo = compiled.as_text()

    def count(op):
        return len(re.findall(rf"\b{op}\b", hlo))

    n_ar = count("all-reduce") + count("all-reduce-start")
    assert n_ar > 0, "expected a gradient all-reduce in the train step"
    # Replicated params + sharded batch need no gathers or reshards. XLA may
    # emit a handful of all-reduces (grads can be bucketed; stats reduce
    # too) but any gather/permute means the sharding contract broke.
    assert count("all-gather") == 0, "unexpected all-gather (param shard?)"
    assert count("all-to-all") == 0, "unexpected all-to-all (reshard?)"
    assert count("collective-permute") == 0, "unexpected collective-permute"

    # Every train-step output is either replicated or data-sharded; the
    # input batch sharding must be consumed as-is (no host round trip).
    in_shardings = compiled.input_shardings[0]
    flat, _ = jax.tree_util.tree_flatten(in_shardings)
    assert any(getattr(s, "spec", None) is not None for s in flat)
