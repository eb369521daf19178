"""Worker process for the 2-process multi-host test (test_multihost.py).

Runs 3 tiny Mip-NeRF 360 train steps over a global 8-device mesh spanning 2
CPU processes (4 virtual devices each) — the jax.distributed analog of the
reference's multi-host pmap setup (datasets.py:292-293, train.py:47-49).
Prints per-step losses; both processes must agree bit-for-bit (params are
replicated, grads all-reduce over the global mesh).
"""

import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
jax.config.update("jax_cpu_collectives_implementation", "gloo")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nerf_hugs_tpu.parallel import mesh as mesh_lib  # noqa: E402

mesh_lib.maybe_initialize_distributed()  # env-var driven (the train.py path)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from nerf_hugs_tpu.configs.config import Config, MLPConfig  # noqa: E402
from nerf_hugs_tpu.data import load_dataset  # noqa: E402
from nerf_hugs_tpu.train import step as train_step_lib  # noqa: E402


def main():
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4

    config = Config(
        dataset_loader="synthetic", batch_size=512, patch_size=1,
        image_num_per_batch=4, near=0.5, far=6.0, max_steps=10,
        lr_init=2e-3, lr_final=2e-4, lr_delay_steps=2,
        grad_max_norm=0.0, grad_max_val=0.0, data_loss_type="mse",
        interlevel_loss_mult=1.0, distortion_loss_mult=0.0,
        render_chunk_size=512)
    config.model.num_prop_samples = 8
    config.model.num_nerf_samples = 4
    config.model.num_levels = 2
    config.nerf_mlp = MLPConfig(net_depth=2, net_width=32,
                                bottleneck_width=16, net_width_viewdirs=16,
                                max_deg_point=4)
    config.prop_mlp = MLPConfig(net_depth=2, net_width=16, disable_rgb=True,
                                max_deg_point=4)

    mesh = mesh_lib.make_mesh()
    # Per-host data: the dataset divides batch_size by process_count and
    # offsets its rng by process_index (base.py), so hosts draw different
    # rays of the same global batch.
    dataset = load_dataset("train", "", config)
    assert dataset._batch_size == 256  # 512 global / 2 processes

    _, state, _, train_step, _ = train_step_lib.setup_model(
        config, jax.random.PRNGKey(0), mesh)
    state = mesh_lib.replicate(state, mesh)
    thresholds = mesh_lib.replicate(jnp.ones(config.num_ray_levels), mesh)
    rngs = mesh_lib.replicate(jax.random.PRNGKey(1), mesh)

    losses = []
    for step, batch in zip(range(3), dataset):
        batch = mesh_lib.shard_batch(batch, mesh)
        assert batch.rgb.shape[0] == 512  # global shape, local shards
        state, stats, rngs = train_step(rngs, state, batch,
                                        jnp.asarray(0.1), thresholds)
        losses.append(float(stats["loss"]))
    print("MH_LOSSES " + json.dumps(losses), flush=True)


if __name__ == "__main__":
    main()
