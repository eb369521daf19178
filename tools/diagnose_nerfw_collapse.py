"""Diagnose the flagship NeRF-W collapse (round-4 long queue, VERDICT r4 weak #3).

The distractor_1024_glo4_nerfw run reached train PSNR 34.6 while the
static-only eval render decayed 10.85 (step 500) -> 0.38 (step 3000) —
test_psnr 0.47 on held-out views. Two hypotheses:
  (a) the zero_glo/zero_tra static render path is broken at flagship width;
  (b) the transient branch progressively absorbed the entire scene — the
      degenerate NeRF-W optimum on small data (the paper's own motivation
      for HuGS; our loss is knob-identical to the reference's
      compute_nerfw_loss, train_utils.py:150-183).

This tool discriminates them from the saved checkpoint: render a TRAIN view
(same poisoned scene) once through the TRAINING composite (embeddings on,
rgb_combined — what the train loss saw) and once through the EVAL path
(zero_glo/zero_tra static-only — what test scoring saw), and report the
static vs transient opacity split along those same rays.

  - If (a): static render should have been broken at step 500 too, and the
    combined render won't reproduce the train PSNR.
  - If (b): combined PSNR ~= the logged train PSNR, static accumulation
    ~= 0 (empty static field), transient accumulation ~= 1, beta >> beta_min.

Runs on CPU (the chip may be busy); flagship 8x1024 on one 96x128 view is
a few minutes. Usage:
    python tools/diagnose_nerfw_collapse.py --save-dir /root/repo/.runs_r4/nerfw
"""

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--save-dir", default="/root/repo/.runs_r4/nerfw")
    p.add_argument("--config",
                   default="configs/mipnerf360/distractor_1024_glo4_nerfw.gin")
    p.add_argument("--views", type=int, default=2)
    args = p.parse_args()

    import train as train_driver
    from nerf_hugs_tpu.data import load_dataset
    from nerf_hugs_tpu.parallel import mesh as mesh_lib
    from nerf_hugs_tpu.train import checkpoints
    from nerf_hugs_tpu.train import step as train_step_lib
    from nerf_hugs_tpu.train.render_image import render_image

    # Same bindings the long-queue run used (tools/tpu_queue_r4_long.sh).
    argv = ["--gin_configs", args.config]
    for b in [
        "Config.dataset_loader = 'synthetic_distractor'",
        "Config.synthetic_num_images = 32",
        "Config.synthetic_height = 192",
        "Config.synthetic_width = 256",
        "Config.synthetic_world_scale = 0.35",
        "Config.max_steps = 3000",
        "Config.finetune_enable = False",
        "Config.factor = 2",
        "Model.remat_mlp = True",
    ]:
        argv += ["--gin_bindings", b]
    argv += ["--data_dir", "synthetic", "--save_dir", args.save_dir]
    config = train_driver.load_config_from_args(train_driver.parse_args(argv))

    mesh = mesh_lib.make_mesh()
    model, state, render_fn_static, _, _ = train_step_lib.setup_model(
        config, jax.random.PRNGKey(0), mesh)
    state = checkpoints.restore_checkpoint(args.save_dir, state)
    print(f"restored step {int(state.step)} from {args.save_dir}", flush=True)
    params = mesh_lib.replicate(state.params, mesh)

    # A second render fn with the embeddings LIVE — the training composite.
    cfg_train_view = dataclasses.replace(
        config, enable_render_zero_glo=False, enable_render_zero_tra=False)
    render_fn_full = train_step_lib.create_render_fn(model, cfg_train_view,
                                                     mesh)

    train_ds = load_dataset("train", "", config)
    for idx in range(min(args.views, train_ds.size)):
        batch = train_ds.generate_ray_batch(idx)
        gt = np.asarray(batch.rgb)[..., :3]
        full = render_image(render_fn_full, batch.rays, 1.0, params,
                            config, mesh)
        static = render_image(render_fn_static, batch.rays, 1.0, params,
                              config, mesh)

        def psnr(x, y):
            return float(-10.0 / np.log(10.0)
                         * np.log(np.mean((np.clip(x, 0, 1) - y) ** 2)))

        comb = np.asarray(full.get("rgb_combined", full["rgb"]))
        print(
            f"view {idx}: combined_psnr={psnr(comb, gt):.2f} "
            f"static_only_psnr={psnr(np.asarray(static['rgb']), gt):.2f} "
            f"static_acc={float(np.mean(np.asarray(static['acc']))):.4f} "
            f"combined_static_part_mean="
            f"{float(np.mean(np.asarray(full['rgb_static']))):.4f} "
            f"transient_part_mean="
            f"{float(np.mean(np.asarray(full['rgb_transient']))):.4f} "
            f"beta_mean={float(np.mean(np.asarray(full['uncertainty']))):.4f} "
            f"(beta_min={config.model.beta_min})",
            flush=True)


if __name__ == "__main__":
    main()
