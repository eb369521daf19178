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
    from tools.bench_nerfacto import _example_rays
    rays = _example_rays(batch_size)
    rgb = np.random.RandomState(1).rand(batch_size, 3).astype(np.float32)
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

    # \ball-reduce\b would also match inside 'all-reduce-start' (hyphen is
    # a word boundary) — exclude the async form with a lookahead so the two
    # counts are disjoint.
    n_ar = len(re.findall(r"\ball-reduce(?!-start)\b", hlo)) + count(
        "all-reduce-start")
    assert n_ar > 0, "expected a gradient all-reduce in the train step"
    # Replicated params + sharded batch need no gathers or reshards. XLA may
    # emit a handful of all-reduces (grads can be bucketed; stats reduce
    # too) but any gather/permute means the sharding contract broke — and a
    # reduce-scatter would mean the grad all-reduce got lowered as
    # reduce-scatter + dynamic-slice (params no longer fully replicated).
    assert count("all-gather") == 0, "unexpected all-gather (param shard?)"
    assert count("all-to-all") == 0, "unexpected all-to-all (reshard?)"
    assert count("collective-permute") == 0, "unexpected collective-permute"
    assert count("reduce-scatter") == 0, "unexpected reduce-scatter"

    # The batch must be consumed 'data'-sharded as-is. jit prunes batch
    # leaves the model never reads (pix_coords/static_mask/embed_idx/
    # cam_idx for the base config), leaving the 8 live ones: origins,
    # directions, viewdirs, radii, near, far, lossmult, rgb. A regression
    # that silently replicates the rays would drop below that count.
    in_shardings = compiled.input_shardings[0]
    flat, _ = jax.tree_util.tree_flatten(in_shardings)
    n_data_sharded = sum(
        1 for s in flat
        if getattr(s, "spec", None) is not None and "data" in str(s.spec))
    assert n_data_sharded >= 8, (
        f"only {n_data_sharded} inputs are 'data'-sharded; expected the 8 "
        "live batch leaves")
