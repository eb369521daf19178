"""Hardware quality validation: train a backbone on the synthetic sphere
world on the real TPU and report clean test-view PSNR.

Round-1 baselines (CLAUDE.md): nerfacto 600 steps -> test PSNR 30.8;
mipnerf360 1500 steps -> 56.9. Re-run after hash-grid/backward changes to
confirm the sorted-scatter bf16 backward does not cost quality.

  python tools/validate_quality.py nerfacto [steps] [--amp]
  python tools/validate_quality.py nerf [steps] [--amp]      # vanilla NeRF
  python tools/validate_quality.py mipnerf360 [steps]        # flagship stack
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def nerfacto_config(amp: bool):
    from nerf_hugs_tpu.configs.config import Config
    config = Config(
        dataset_loader="synthetic", model_type="nerfacto", batch_size=4096,
        image_num_per_batch=8, near=0.5, far=6.0, max_steps=600,
        lr_init=1e-2, lr_final=1e-3, lr_delay_steps=50,
        grad_max_norm=0.0, grad_max_val=0.0, data_loss_type="mse",
        enable_amp=amp, bound=4.0, enable_scene_contraction=False,
        train_background_color="white", test_background_color="white",
        interlevel_loss_mult=1.0, distortion_loss_mult=0.0,
        render_chunk_size=4096)
    config.nerfacto.num_proposal_iterations = 1
    config.nerfacto.num_proposal_samples_per_ray = (96,)
    config.nerfacto.num_nerf_samples_per_ray = 48
    config.nerfacto.log2_hashmap_size = 19
    config.nerfacto.num_levels = 12
    config.nerfacto.base_res = 16
    config.nerfacto.max_res = 1024
    config.nerfacto.hidden_dim = 64
    config.nerfacto.hidden_dim_color = 64
    config.nerfacto.proposal_net_args_list = (
        {"base_res": 16, "hidden_dim": 16, "log2_hashmap_size": 17,
         "features_per_level": 2, "num_levels": 5, "max_res": 256},)
    return config


def nerf_config(amp: bool):
    from nerf_hugs_tpu.configs.config import Config
    config = Config(
        dataset_loader="synthetic", model_type="nerf", batch_size=4096,
        image_num_per_batch=8, near=0.5, far=6.0, max_steps=600,
        lr_init=5e-4, lr_final=5e-5, lr_delay_steps=50,
        grad_max_norm=0.0, grad_max_val=0.0, data_loss_type="mse",
        enable_amp=amp, enable_scene_contraction=False,
        train_background_color="white", test_background_color="white",
        interlevel_loss_mult=0.0, distortion_loss_mult=0.0,
        data_coarse_loss_mult=0.1, render_chunk_size=4096)
    config.nerfacto.net_depth = 8
    config.nerfacto.net_width = 256
    config.nerfacto.num_coarse_nerf_samples_per_ray = 64
    config.nerfacto.num_fine_nerf_samples_per_ray = 128
    config.nerfacto.max_deg_point = 10
    config.nerfacto.proposal_initial_sampler = "uniform"
    return config


def mipnerf360_config(amp: bool):
    from nerf_hugs_tpu.configs.config import Config, MLPConfig
    config = Config(
        dataset_loader="synthetic", batch_size=4096,
        image_num_per_batch=8, near=0.5, far=6.0, max_steps=1500,
        lr_init=2e-3, lr_final=2e-4, lr_delay_steps=100,
        grad_max_norm=0.001, data_loss_type="mse",
        interlevel_loss_mult=1.0, distortion_loss_mult=0.01,
        render_chunk_size=4096)
    del amp  # the mipnerf360 stack trains fp32 like the reference
    config.model.num_prop_samples = 64
    config.model.num_nerf_samples = 32
    config.model.num_levels = 3
    config.nerf_mlp = MLPConfig(net_depth=4, net_width=256,
                                bottleneck_width=128, net_width_viewdirs=128)
    config.prop_mlp = MLPConfig(net_depth=4, net_width=128, disable_rgb=True)
    return config


def main():
    model_type = sys.argv[1] if len(sys.argv) > 1 else "nerfacto"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 600
    amp = "--amp" in sys.argv
    assert model_type in ("nerfacto", "nerf", "mipnerf360"), model_type

    from nerf_hugs_tpu.data import load_dataset
    from nerf_hugs_tpu.parallel import mesh as mesh_lib
    from nerf_hugs_tpu.train import step as train_step_lib
    from nerf_hugs_tpu.train.render_image import render_image

    config = {"nerfacto": nerfacto_config, "nerf": nerf_config,
              "mipnerf360": mipnerf360_config}[model_type](amp)
    config.max_steps = steps
    mesh = mesh_lib.make_mesh()
    dataset = load_dataset("train", "", config)
    _, state, render_fn, train_step, _ = train_step_lib.setup_model(
        config, jax.random.PRNGKey(0), mesh)
    state = mesh_lib.replicate(state, mesh)
    thresholds = mesh_lib.replicate(jnp.ones(config.num_ray_levels), mesh)
    rngs = mesh_lib.replicate(jax.random.PRNGKey(1), mesh)

    t0 = time.time()
    for step, batch in zip(range(steps), dataset):
        batch = mesh_lib.shard_batch(batch, mesh)
        frac = jnp.clip(step / steps, 0, 1)
        state, stats, rngs = train_step(rngs, state, batch, frac, thresholds)
        if step % 100 == 0 or step == steps - 1:
            print(f"step {step}: loss {float(stats['loss']):.5f} "
                  f"psnr {float(stats['psnr']):.2f} "
                  f"({time.time()-t0:.0f}s)", flush=True)

    test_ds = load_dataset("test", "", config)
    psnrs = []
    for idx in range(test_ds.size):
        batch = test_ds.generate_ray_batch(idx)
        rendering = render_image(render_fn, batch.rays, 1.0, state.params,
                                 config, mesh)
        mse = float(np.mean((np.clip(rendering["rgb"], 0, 1)
                             - np.asarray(batch.rgb)) ** 2))
        psnrs.append(-10 * np.log10(mse))
    print(f"RESULT {model_type} amp={amp} steps={steps} "
          f"test_psnr={np.mean(psnrs):.2f} per_image="
          f"{[round(p, 2) for p in psnrs]}", flush=True)


if __name__ == "__main__":
    main()
