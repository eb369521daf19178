"""Hardware quality validation on the procedural sphere world (real TPU).

Two modes:

1. Exact-config mode (VERDICT r2 #1): train one of the *benched* config
   files end-to-end through the real train.py driver, overriding ONLY the
   dataset (procedural synthetic scene scaled to fit the config's own
   near/far/bound via Config.synthetic_world_scale) plus the eval/checkpoint
   cadence. Every model shape, sample count, precision flag, optimizer and
   schedule field comes from the config file unchanged, so the quality
   numbers refer to the same shapes bench.py times.

     python tools/validate_quality.py --config configs/nerfacto/kubric_nerfacto_base.yml \
         [--steps N] [--eval-every N] [--save-dir DIR]
     python tools/validate_quality.py --config configs/mipnerf360/kubric_1024_base.gin ...

   Prints the driver's in-train eval lines ([train] N: eval psnr=...) as the
   PSNR-vs-steps table, then a final full-test-set RESULT line. Training
   checkpoints at --eval-every cadence, so a wedged TPU tunnel costs only
   the tail (rerun with the same --save-dir to resume).

2. Legacy reduced-config mode (round-1/2 continuity): custom small configs,
   kept so the historical PSNR baselines in CLAUDE.md remain reproducible.

     python tools/validate_quality.py nerfacto [steps] [--amp]
     python tools/validate_quality.py nerf [steps] [--amp]
     python tools/validate_quality.py mipnerf360 [steps]

NOTE (round 3): the synthetic TEST split is now genuinely held out (half-step
azimuth offset, no height jitter) — test PSNRs are not comparable with the
round-1/2 numbers, which scored the train poses.
"""

import argparse
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

# Scene-only overrides for exact-config mode. World scale 0.35 puts the
# camera orbit at radius 0.875 and the sphere surface 0.7-1.05 from the
# cameras, inside kubric's near=0.1 / far=1.2 (gin) and far=2 (yaml) and
# bound=1 — so the config's own geometry fields apply unchanged.
SCENE_OVERRIDES = {
    "num_images": 32,
    "height": 192,   # factor=2 in the kubric configs -> 96x128 effective
    "width": 256,
    "world_scale": 0.35,
}


def _yaml_override_file(config_path, save_dir, args):
    """Copy the yaml config, patching only dataset + cadence keys."""
    import yaml
    with open(config_path) as f:
        raw = yaml.safe_load(f)
    base = raw["base"]
    transient = raw.get("model", {}).get("transient_type")
    base["dataset_type"] = ("synthetic_distractor"
                            if (transient or args.distractor)
                            else "synthetic")
    base["synthetic_num_images"] = SCENE_OVERRIDES["num_images"]
    base["synthetic_height"] = SCENE_OVERRIDES["height"]
    base["synthetic_width"] = SCENE_OVERRIDES["width"]
    base["synthetic_world_scale"] = SCENE_OVERRIDES["world_scale"]
    if args.steps:
        base["num_steps"] = args.steps
    eval_every = args.eval_every or max(500, base.get("num_steps", 25000) // 10)
    base["eval_render_every"] = eval_every
    base["save_weight_every"] = eval_every
    base["save_eval_render"] = False
    base["save_test_render"] = False
    base["use_eval_lpips"] = False
    out = os.path.join(save_dir, "validate_config.yml")
    with open(out, "w") as f:
        yaml.safe_dump(raw, f)
    return out, ["--config", out], base.get("num_steps", 25000)


def _gin_override_args(config_path, save_dir, args):
    """Pass the gin file untouched; overrides go in as --gin_bindings."""
    from nerf_hugs_tpu.configs import gin_parser
    probe = gin_parser.parse_gin_configs([config_path], [])
    loader = ("synthetic_distractor"
              if (probe.transient_type or args.distractor)
              else "synthetic")
    steps = args.steps or probe.max_steps
    eval_every = args.eval_every or max(500, steps // 10)
    bindings = [
        f"Config.dataset_loader = '{loader}'",
        f"Config.synthetic_num_images = {SCENE_OVERRIDES['num_images']}",
        f"Config.synthetic_height = {SCENE_OVERRIDES['height']}",
        f"Config.synthetic_width = {SCENE_OVERRIDES['width']}",
        f"Config.synthetic_world_scale = {SCENE_OVERRIDES['world_scale']}",
        f"Config.max_steps = {steps}",
        f"Config.train_render_every = {eval_every}",
        f"Config.checkpoint_every = {eval_every}",
        "Config.finetune_enable = False",
    ] + list(args.binding or [])
    argv = ["--gin_configs", config_path]
    for b in bindings:
        argv += ["--gin_bindings", b]
    return None, argv, steps


def run_exact_config(args):
    import train as train_driver
    from nerf_hugs_tpu.data import load_dataset
    from nerf_hugs_tpu.metrics.image import MetricHarness
    from nerf_hugs_tpu.parallel import mesh as mesh_lib
    from nerf_hugs_tpu.train import checkpoints
    from nerf_hugs_tpu.train import step as train_step_lib
    from nerf_hugs_tpu.train.render_image import render_image

    tag = os.path.splitext(os.path.basename(args.config))[0]
    save_dir = args.save_dir or f"/tmp/validate_{tag}"
    os.makedirs(save_dir, exist_ok=True)
    if args.config.endswith((".yml", ".yaml")):
        _, cfg_argv, steps = _yaml_override_file(args.config, save_dir, args)
    else:
        _, cfg_argv, steps = _gin_override_args(args.config, save_dir, args)

    argv = cfg_argv + ["--data_dir", "synthetic", "--save_dir", save_dir]
    print(f"=== exact-config validation: {tag} ({steps} steps) ===",
          flush=True)
    print("train.py argv:", " ".join(argv), flush=True)
    if not args.score_only:
        t0 = time.time()
        train_driver.main(argv)
        print(f"training wall-clock: {time.time()-t0:.0f}s", flush=True)

    # Final full-test-set score at the exact config (held-out views).
    config = train_driver.load_config_from_args(
        train_driver.parse_args(argv))
    mesh = mesh_lib.make_mesh()
    _, state, render_fn, _, _ = train_step_lib.setup_model(
        config, jax.random.PRNGKey(0), mesh)
    state = checkpoints.restore_checkpoint(save_dir, state)
    params = mesh_lib.replicate(state.params, mesh)

    test_ds = load_dataset("test", "", config, is_training=False)
    harness = MetricHarness()
    psnrs, ssims = [], []
    for idx in range(test_ds.size):
        batch = test_ds.generate_ray_batch(idx)
        rendering = render_image(render_fn, batch.rays, 1.0, params,
                                 config, mesh)
        from nerf_hugs_tpu.metrics import image as nh_image
        m = harness(jnp.asarray(np.clip(rendering["rgb"], 0, 1)),
                    jnp.asarray(nh_image.composite_alpha(
                        np.asarray(batch.rgb),
                        nh_image.BACKGROUND_VALUES[
                            config.test_background_color])))
        psnrs.append(float(m["psnr"]))
        ssims.append(float(m["ssim"]))
    print(f"RESULT config={tag} steps={steps} "
          f"test_psnr={np.mean(psnrs):.2f} test_ssim={np.mean(ssims):.4f} "
          f"per_image_psnr={[round(p, 2) for p in psnrs]}", flush=True)

    # Distractor-localization scoring for the uncertainty-based methods
    # (VERDICT r3 #1: "beta/mask localization at scale"): on TRAIN views of
    # the poisoned scene, NeRF-W's beta and HA-NeRF's 2-D implicit mask must
    # be higher inside the known distractor squares than outside — the same
    # inside/outside ratio the toy-scale regression tests lock
    # (tests/test_train_e2e.py::test_nerfw_beta_localizes_distractors).
    key = {"nerfw": "uncertainty", "hanerf": "implicit_mask"}.get(
        config.transient_type)
    if key:
        try:
            train_ds = load_dataset("train", "", config)
            ratios = []
            for idx in range(min(4, train_ds.size)):
                batch = train_ds.generate_ray_batch(idx)
                rendering = render_image(render_fn, batch.rays, 1.0, params,
                                         config, mesh)
                signal = np.asarray(rendering[key])[..., 0]
                inside = np.asarray(batch.rays.static_mask)[..., 0] < 0.5
                if inside.any() and (~inside).any():
                    ratios.append(float(signal[inside].mean()
                                        / max(signal[~inside].mean(), 1e-6)))
            print(f"LOCALIZATION config={tag} signal={key} "
                  f"inside_outside_ratio={np.mean(ratios):.2f} "
                  f"per_image={[round(r, 2) for r in ratios]}", flush=True)
        except Exception:  # unattended queue runs: never lose the RESULT
            traceback.print_exc()


# ---------------------------------------------------------------------------
# Legacy reduced-config mode (round-1/2 baselines).

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


def run_legacy(model_type: str, steps: int, amp: bool):
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
        from nerf_hugs_tpu.metrics import image as nh_image
        mse = float(np.mean((np.clip(rendering["rgb"], 0, 1)
                             - nh_image.composite_alpha(
                                 np.asarray(batch.rgb),
                                 nh_image.BACKGROUND_VALUES[
                                     config.test_background_color])) ** 2))
        psnrs.append(-10 * np.log10(mse))
    print(f"RESULT {model_type} amp={amp} steps={steps} "
          f"test_psnr={np.mean(psnrs):.2f} per_image="
          f"{[round(p, 2) for p in psnrs]}", flush=True)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("model_type", nargs="?", default=None,
                        choices=["nerfacto", "nerf", "mipnerf360"])
    parser.add_argument("steps_pos", nargs="?", type=int, default=600)
    parser.add_argument("--config", type=str, default=None,
                        help="exact benched config file (.yml or .gin)")
    parser.add_argument("--steps", type=int, default=0)
    parser.add_argument("--eval-every", type=int, default=0)
    parser.add_argument("--save-dir", type=str, default=None)
    parser.add_argument("--distractor", action="store_true",
                        help="force the distractor scene (so a base config "
                             "can be compared against transient methods on "
                             "poisoned training data)")
    parser.add_argument("--amp", action="store_true")
    parser.add_argument("--score-only", action="store_true",
                        help="skip training; restore the latest checkpoint "
                             "in --save-dir and print the RESULT line "
                             "(e.g. to re-score after a metrics fix)")
    parser.add_argument("--binding", action="append", default=[],
                        help="extra gin binding for --config .gin runs "
                             "(e.g. 'Model.remat_mlp = True' to fit the "
                             "1024-wide flagship at batch 16384 on one "
                             "chip); repeatable")
    args = parser.parse_args()

    if args.config:
        run_exact_config(args)
    else:
        assert args.model_type, "need a model_type or --config"
        run_legacy(args.model_type, args.steps_pos, args.amp)


if __name__ == "__main__":
    main()
