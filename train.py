#!/usr/bin/env python
"""Training driver — CLI-compatible with both reference stacks.

MipNeRF360 style (scripts/train_mipnerf360_*.sh):
  python -m train --gin_configs=configs/X.gin \
      --gin_bindings="Config.data_dir = '...'" \
      --gin_bindings="Config.checkpoint_dir = '...'"
nerfacto style (scripts/train_nerfacto_*.sh):
  python train.py --config configs/X.yml --data_dir ... --save_dir ...

Flow parity: MipNeRF360/train.py:45-291 — two-stage ['train', 'finetune']
loop (finetune re-optimizes embeddings on the left half of test images),
checkpoint/resume, stats buffering with train_steps_per_sec /
train_rays_per_sec counters, RobustNeRF threshold feedback across steps,
periodic in-train test renders with metrics + visualization suite.
"""

from __future__ import annotations

import argparse
import gc
import os
import sys
import time

import numpy as np


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--gin_configs", action="append", default=[],
                        help="gin config file(s), MipNeRF360 style")
    parser.add_argument("--gin_bindings", action="append", default=[],
                        help="gin binding overrides")
    parser.add_argument("--config", type=str, default=None,
                        help="YAML config path, nerfacto style")
    parser.add_argument("--data_dir", type=str, default=None)
    parser.add_argument("--save_dir", type=str, default=None,
                        help="checkpoint dir (nerfacto name)")
    parser.add_argument("--logtostderr", action="store_true")
    return parser.parse_args(argv)


def load_config_from_args(args):
    from nerf_hugs_tpu.configs import gin_parser, yaml_loader
    if args.config:
        config = yaml_loader.load_yaml_config(args.config)
    else:
        config = gin_parser.parse_gin_configs(args.gin_configs,
                                              args.gin_bindings)
    if args.data_dir:
        config.data_dir = args.data_dir
    if args.save_dir:
        config.checkpoint_dir = args.save_dir
    if config.checkpoint_dir is None:
        raise ValueError("checkpoint_dir/--save_dir must be set")
    if config.data_dir is None:
        raise ValueError("data_dir must be set")
    return config


def eval_window_indices(event: int, dataset_size: int,
                        eval_images_num: int) -> list:
    """Rotating in-train eval window for the nerfacto stacks.

    Event e (1-based) evaluates eval_images_num images starting at
    (e-1) * max(eval_images_num // 2, 1), wrapping mod dataset_size —
    reference nerfacto/train.py:241-296 (state.next_eval_idx), derived from
    the event count so resume needs no persisted driver state."""
    n_eval = min(eval_images_num, dataset_size)
    stride = max(eval_images_num // 2, 1)
    base = ((event - 1) * stride) % dataset_size
    return [(base + i) % dataset_size for i in range(n_eval)]


def main(argv=None):
    args = parse_args(argv)
    config = load_config_from_args(args)

    import jax
    import jax.numpy as jnp
    from flax.metrics import tensorboard

    from nerf_hugs_tpu.configs import gin_parser
    from nerf_hugs_tpu.data import load_dataset
    from nerf_hugs_tpu.metrics import image as nh_image
    from nerf_hugs_tpu.parallel import mesh as mesh_lib
    from nerf_hugs_tpu.train import checkpoints
    from nerf_hugs_tpu.train import step as train_step_lib
    from nerf_hugs_tpu.train.render_image import render_image
    from nerf_hugs_tpu.utils import io as nh_io
    from nerf_hugs_tpu.utils import vis as nh_vis
    from nerf_hugs_tpu.utils.record import Recorder

    # Multi-host init must precede any device-touching JAX call (it fails
    # once the local backend exists).
    mesh_lib.maybe_initialize_distributed()

    if config.batch_size % jax.device_count() != 0:
        raise ValueError(
            f"batch_size {config.batch_size} must divide evenly by "
            f"{jax.device_count()} devices")

    mesh = mesh_lib.make_mesh()
    rng = jax.random.PRNGKey(20200823)
    # Per-host RNG offset for multi-host data parallelism (train.py:47-49).
    rng = jax.random.fold_in(rng, jax.process_index())

    # Refuse to resume across a model-function switch (hash_impl) BEFORE
    # overwriting the config snapshot; record the sidecar for fresh runs.
    checkpoints.check_model_compat(config.checkpoint_dir, config)
    checkpoints.record_model_compat(config.checkpoint_dir, config)
    if jax.process_index() == 0:
        os.makedirs(config.checkpoint_dir, exist_ok=True)
        with open(os.path.join(config.checkpoint_dir, "config.gin"), "w") as f:
            f.write(gin_parser.config_str(config))
    # stdout + persistent run_log.log twin (record_utils.py:5-23 parity).
    recorder = Recorder(config.checkpoint_dir,
                        enable_file=jax.process_index() == 0)

    test_dataset = load_dataset("test", config.data_dir, config,
                                is_training=False)
    metric_harness = nh_image.MetricHarness()

    key, rng = jax.random.split(rng)
    model, state, render_eval_fn, train_step, lr_fn = \
        train_step_lib.setup_model(config, key, mesh)

    num_params = sum(
        x.size for x in jax.tree_util.tree_leaves(state.params))
    recorder.print(f"Number of parameters being optimized: {num_params}")

    stages = ["train"] + (["finetune"] if config.finetune_enable else [])
    gc.disable()  # matching the reference; we collect manually (train.py:81)

    for stage in stages:
        is_finetune = stage == "finetune"
        if is_finetune:
            # Restore the final train-stage state, then rewrap with the
            # embeddings-only optimizer.
            state = checkpoints.restore_checkpoint(config.checkpoint_dir,
                                                   state)
            state, train_step, lr_fn = train_step_lib.setup_finetune_model(
                config, model, state, mesh)
            ckpt_dir = os.path.join(config.checkpoint_dir, "finetune")
            max_steps = config.finetune_max_steps
            dataset = load_dataset(
                "test", config.data_dir, config, is_training=True,
                sample_from_half_image=True,
                batch_size=config.finetune_batch_size,
                patch_size=config.finetune_patch_size,
                patch_dilation=config.finetune_patch_dilation,
                image_num_per_batch=config.finetune_image_num_per_batch)
        else:
            ckpt_dir = config.checkpoint_dir
            max_steps = config.max_steps
            dataset = load_dataset("train", config.data_dir, config,
                                   is_training=True)

        # Embedding tables are statically sized: more images than rows would
        # silently clamp the lookup on TPU (the reference fails loudly,
        # train.py:113-117) — so fail loudly here too.
        mc, nc = config.model, config.nerfacto
        uses_embeds = (mc.num_glo_features > 0
                       or mc.num_transient_features > 0
                       or (config.model_type in ("nerfacto", "nerf")
                           and (nc.use_appearance_embedding
                                or nc.use_transient_embedding)))
        # Compare against the max embed INDEX, not the image count: test
        # splits (the finetune stage's data) offset their embed indices by
        # the train-image count (kubric.py embed_offset), so a table sized
        # to the train set would pass a size check yet clamp on lookups.
        embed_idxs = getattr(dataset, "embed_idxs", None)
        embeds_needed = (int(np.max(embed_idxs)) + 1
                         if embed_idxs is not None and len(embed_idxs)
                         else dataset.size)
        if uses_embeds and embeds_needed > mc.num_embeddings:
            raise ValueError(
                f"Number of embeddings {mc.num_embeddings} must cover the "
                f"{stage} split's max embedding index (needs "
                f"{embeds_needed})")

        state = checkpoints.restore_checkpoint(ckpt_dir, state)
        init_step = int(state.step) + 1
        state = mesh_lib.replicate(state, mesh)

        if config.early_exit_steps is not None and not is_finetune:
            num_steps = min(max_steps, config.early_exit_steps)
        else:
            num_steps = max_steps

        summary_writer = None
        if jax.process_index() == 0:
            summary_writer = tensorboard.SummaryWriter(
                os.path.join(config.checkpoint_dir, f"tb_{stage}"))

        # RobustNeRF carried state: the shape must match the per-level
        # threshold fed back from stats AND the value must be committed with
        # the replicated mesh sharding the step outputs carry — either
        # mismatch retraces the donated train step at step 2 (a 20-400s
        # remote compile in this environment).
        inlier_thresholds = mesh_lib.replicate(
            jnp.ones(config.num_ray_levels), mesh)
        rngs = mesh_lib.replicate(
            jax.random.fold_in(rng, 1 if is_finetune else 0), mesh)
        stats_buffer = []
        train_start_time = time.time()
        total_time, total_steps = 0, 0
        reset_timer = True

        # Optional profiling window (SURVEY.md §5: add jax.profiler hooks,
        # keep the rays/sec counters): NERF_HUGS_PROFILE=start,stop traces
        # that step range into {checkpoint_dir}/profile.
        profile_range = os.environ.get("NERF_HUGS_PROFILE")
        if profile_range:
            prof_start, prof_stop = map(int, profile_range.split(","))
        # Device-side prefetch: batches are sharded (async device_put) ahead
        # of consumption, overlapping H2D with the train step (the
        # reference's flax.jax_utils.prefetch_to_device, train.py:127).
        prefetched = mesh_lib.prefetch_to_device(dataset, mesh, size=2)
        for step, batch in zip(range(init_step, num_steps + 1), prefetched):
            if profile_range and step == prof_start:
                jax.profiler.start_trace(
                    os.path.join(config.checkpoint_dir, "profile"))
            if profile_range and step == prof_stop:
                jax.profiler.stop_trace()
            if reset_timer:
                train_start_time = time.time()
                reset_timer = False
            # Finetune runs at the END of the schedule: anneal/dilation stay
            # fully matured (reference train.py:141 pins 1.). The train-stage
            # fraction divides by the FULL max_steps even under
            # early_exit_steps (the reference's denominator), so early exits
            # don't race the proposal anneal.
            if is_finetune:
                train_frac = jnp.asarray(1.0)
            else:
                train_frac = jnp.clip(
                    (step - 1) / max(config.max_steps - 1, 1), 0, 1)
            state, stats, rngs = train_step(rngs, state, batch, train_frac,
                                            inlier_thresholds)
            if config.transient_type == "robustnerf" and not is_finetune:
                inlier_thresholds = stats["robust_inlier_threshold"]

            if step % config.gc_every == 0:
                gc.collect()

            stats_buffer.append(stats)
            if jax.process_index() == 0 and (
                    step == init_step or step % config.print_every == 0):
                stats_host = jax.device_get(stats_buffer)
                elapsed = time.time() - train_start_time
                steps_per_sec = len(stats_buffer) / max(elapsed, 1e-9)
                rays_per_sec = config.batch_size * steps_per_sec
                total_time += elapsed
                total_steps += len(stats_buffer)
                avg_loss = float(np.mean(
                    [s["loss"] for s in stats_host]))
                avg_psnr = float(np.mean(
                    [s["psnr"] for s in stats_host]))
                lr = float(lr_fn(step))
                recorder.print(
                    f"[{stage}] {step}/{num_steps}: "
                    f"loss={avg_loss:.5f} psnr={avg_psnr:.3f} "
                    f"lr={lr:.2e} {steps_per_sec:.2f} steps/s "
                    f"{rays_per_sec:.0f} rays/s")
                if summary_writer is not None:
                    summary_writer.scalar("train_loss", avg_loss, step)
                    summary_writer.scalar("train_psnr", avg_psnr, step)
                    summary_writer.scalar("train_steps_per_sec",
                                          steps_per_sec, step)
                    summary_writer.scalar("train_rays_per_sec",
                                          rays_per_sec, step)
                    summary_writer.scalar("learning_rate", lr, step)
                    summary_writer.histogram(
                        "train_loss_hist",
                        np.array([s["loss"] for s in stats_host]), step)
                    summary_writer.histogram(
                        "train_psnr_hist",
                        np.array([s["psnr"] for s in stats_host]), step)
                    for name, val in jax.device_get(
                            stats_host[-1]["losses"]).items():
                        summary_writer.scalar(f"train_losses/{name}",
                                              float(val), step)
                    # PSNR against wall time (robust across preemptions,
                    # train.py:210-213).
                    summary_writer.scalar("train_avg_psnr_timed", avg_psnr,
                                          int(total_time))
                stats_buffer = []
                reset_timer = True

            if step % config.checkpoint_every == 0 or step == num_steps:
                checkpoints.save_checkpoint(
                    ckpt_dir, jax.device_get(state), step)

            # In-train showcase render. MipNeRF360 renders ONE rotating test
            # image per event (reference MipNeRF360/train.py:239-281); the
            # nerfacto stacks evaluate a rotating WINDOW of eval_images_num
            # images whose start advances by eval_images_num//2 per event
            # (reference nerfacto/train.py:241-296 next_eval_idx — derived
            # here from the event count, so it is resume-stable without
            # persisting driver state in the checkpoint).
            if config.train_render_every > 0 and (
                    step % config.train_render_every == 0
                    or step == num_steps):
                if config.model_type == "mipnerf360":
                    window = [None]  # one next(test_dataset) fetch
                else:
                    # Event number = count of triggers at or before `step`:
                    # multiples of the cadence, plus the extra final-step
                    # trigger when num_steps isn't one — without the +1 the
                    # final trigger would repeat the previous window.
                    event = step // config.train_render_every
                    if step == num_steps and step % config.train_render_every:
                        event += 1
                    window = list(eval_window_indices(
                        event, test_dataset.size, config.eval_images_num))
                per_image = []
                # Fetch one full-image batch per iteration (not the whole
                # window up front): at flagship/phototourism resolutions a
                # materialized window is hundreds of MB of host RAM.
                for widx in window:
                    test_batch = (next(test_dataset) if widx is None else
                                  test_dataset.generate_ray_batch(widx))
                    rendering = render_image(
                        render_eval_fn, test_batch.rays, float(train_frac),
                        state.params, config, mesh)
                    if jax.process_index() == 0 and test_batch.rgb is not None:
                        # Clip like eval.py: raw renderings can leave [0,1],
                        # which would push SSIM above 1.
                        per_image.append(metric_harness(
                            jnp.clip(jnp.asarray(rendering["rgb"]), 0, 1),
                            jnp.asarray(nh_image.composite_alpha(
                                np.asarray(test_batch.rgb),
                                nh_image.BACKGROUND_VALUES[
                                    config.test_background_color]))))
                # `rendering`/`test_batch` hold the LAST window image; the
                # vis suite below pairs its rays.
                if jax.process_index() == 0 and per_image:
                    metrics = {k: float(np.mean([m[k] for m in per_image]))
                               for k in per_image[0]}
                    recorder.print(
                        f"[{stage}] {step}: eval "
                        + " ".join(f"{k}={v:.4f}"
                                   for k, v in metrics.items()))
                    if summary_writer is not None:
                        for k, v in metrics.items():
                            summary_writer.scalar(f"eval_{k}", v, step)
                        suite = nh_vis.visualize_suite(
                            {k: jnp.asarray(v) for k, v in rendering.items()
                             if not k.startswith("ray_")} |
                            ({k: [jnp.asarray(x) for x in rendering[k]]
                              for k in rendering if k.startswith("ray_")}),
                            test_batch.rays)
                        for k, v in suite.items():
                            arr = np.asarray(v)
                            if arr.ndim == 2:
                                arr = arr[..., None]
                            summary_writer.image(f"render_{k}",
                                                 np.clip(arr, 0, 1), step)

        if summary_writer is not None:
            summary_writer.flush()

    recorder.print("training complete")
    recorder.close()


if __name__ == "__main__":
    main()
