#!/usr/bin/env python
"""Evaluation driver — renders a split, scores, and saves images.

MipNeRF360 style:  python -m eval --gin_configs=... --gin_bindings=...
nerfacto style:    python eval.py --config X.yml --data_dir D --save_dir S
                       [--eval_data train|test] [--original_name]
                       [--only_pred_gt]

Flow parity: MipNeRF360/eval.py:43-255 + nerfacto/eval.py:37-146 — restore
latest (finetune-preferring) checkpoint, render every image of the split
through the chunked renderer, float64 color-correct against GT, quantize to
the uint8 grid before metrics (eval_quantize_metrics), optional border crop,
save `{idx}_color.png`/`{idx}_gt.png` (+depth TIFF) and per-image metric
text files. `--original_name --only_pred_gt` writes `{name}_color/gt.png`
pairs into `{save_dir}/{split}_preds/` — the HuGS pipeline's input contract
(scripts/hugs_kubric.sh:24-29). Can poll for new checkpoints when
eval_only_once=False.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--gin_configs", action="append", default=[])
    parser.add_argument("--gin_bindings", action="append", default=[])
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--data_dir", type=str, default=None)
    parser.add_argument("--save_dir", type=str, default=None)
    parser.add_argument("--eval_data", type=str, default=None,
                        choices=["train", "test"])
    parser.add_argument("--original_name", action="store_true")
    parser.add_argument("--only_pred_gt", action="store_true")
    parser.add_argument("--logtostderr", action="store_true")
    return parser.parse_args(argv)


def polling_done(config, use_ft: bool, step: int) -> bool:
    """Whether the polling loop has evaluated the final expected checkpoint
    (reference eval.py:244-249). With finetune enabled we wait for the LAST
    finetune checkpoint — deliberate deviation: the reference breaks on the
    first one, silently skipping the rest of the schedule. Without it,
    mirror train.py's num_steps = min(max_steps, early_exit_steps): an
    early_exit_steps LARGER than max_steps never produces a checkpoint at
    that step, so `or` alone would poll forever."""
    if config.finetune_enable:
        return use_ft and step >= config.finetune_max_steps
    return step >= min(config.max_steps,
                       config.early_exit_steps or config.max_steps)


def main(argv=None):
    args = parse_args(argv)
    from train import load_config_from_args
    config = load_config_from_args(args)
    if args.eval_data:
        config.eval_data = args.eval_data

    import jax
    import jax.numpy as jnp

    from nerf_hugs_tpu.data import load_dataset
    from nerf_hugs_tpu.metrics import image as nh_image
    from nerf_hugs_tpu.parallel import mesh as mesh_lib
    from nerf_hugs_tpu.train import checkpoints
    from nerf_hugs_tpu.train import step as train_step_lib
    from nerf_hugs_tpu.train.render_image import render_image
    from nerf_hugs_tpu.utils import io as nh_io
    from nerf_hugs_tpu.utils.record import Recorder

    mesh_lib.maybe_initialize_distributed()
    mesh = mesh_lib.make_mesh()
    rng = jax.random.PRNGKey(20200823)
    model, state, render_eval_fn, _, _ = train_step_lib.setup_model(
        config, rng, mesh)

    dataset = load_dataset(config.eval_data, config.data_dir, config,
                           is_training=False)
    metric_harness = nh_image.MetricHarness()

    recorder = Recorder(config.checkpoint_dir,
                        enable_file=jax.process_index() == 0)
    out_dir = os.path.join(config.checkpoint_dir,
                           f"{config.eval_data}_preds")
    if config.eval_save_output and jax.process_index() == 0:
        os.makedirs(out_dir, exist_ok=True)

    last_step = None
    while True:
        # Host 0 picks the checkpoint (preferring finetune, eval.py:75-77)
        # and BROADCASTS (use_finetune, step) so every host restores the
        # same one: independent filesystem views can lag, and hosts that
        # disagree on `step` run different numbers of render passes and
        # hang each other's collectives. The broadcast doubles as the
        # per-polling-iteration keep-alive barrier (reference
        # eval.py:237-240) — it runs on every path through the loop,
        # including the sleep-and-retry one.
        ft_dir = os.path.join(config.checkpoint_dir, "finetune")
        if jax.process_index() == 0:
            use_ft = checkpoints.latest_step(ft_dir) is not None
            probe = checkpoints.latest_step(
                ft_dir if use_ft else config.checkpoint_dir)
            vals = np.array([int(use_ft), -1 if probe is None else probe],
                            np.int32)
        else:
            vals = np.zeros(2, np.int32)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            vals = multihost_utils.broadcast_one_to_all(vals)
        use_ft, step = int(vals[0]), int(vals[1])
        ckpt_dir = ft_dir if use_ft else config.checkpoint_dir
        if step < 0:
            # Polling mode launches alongside train (reference eval.py:65-80:
            # a missing checkpoint restores the init state at step 0 and hits
            # the sleep-and-retry branch) — wait for the first checkpoint
            # instead of crashing. One-shot mode fails loudly.
            if config.eval_only_once:
                raise FileNotFoundError(
                    f"no checkpoint under {config.checkpoint_dir}")
            recorder.print(
                f"no checkpoint yet under {config.checkpoint_dir}, sleeping")
            time.sleep(10)
            continue
        # Dedupe on the EFFECTIVE step (finetune offsets by max_steps,
        # reference eval.py:76): train and finetune checkpoints share bare
        # step numbers, so tracking the bare step would treat a finetune
        # checkpoint whose step equals the last evaluated train step as
        # already seen and sleep forever.
        effective_step = step + (config.max_steps if use_ft else 0)
        if last_step is not None and effective_step <= last_step:
            if config.eval_only_once:
                break
            time.sleep(10)
            continue
        last_step = effective_step
        checkpoints.check_model_compat(config.checkpoint_dir, config)
        state = checkpoints.restore_params(ckpt_dir, state, step)
        recorder.print(f"Evaluating checkpoint step {step} from {ckpt_dir}")
        # Render mid-training checkpoints at the train_frac they were trained
        # at (reference eval.py:103: clip(step / max_steps)) so sampling
        # anneal/dilation match the weights; finetune checkpoints sit past
        # the full schedule -> 1.
        train_frac = 1.0 if use_ft else float(
            np.clip(step / config.max_steps, 0.0, 1.0))

        all_metrics = []
        num_eval = min(dataset.size, config.eval_dataset_limit)
        for idx in range(num_eval):
            if idx % config.eval_render_interval != 0:
                continue
            # Fetch by camera index, not iterator order: in checkpoint-polling
            # mode a limited first pass leaves the iterator mid-cycle, so
            # next(dataset) on later passes would mislabel images/metrics.
            batch = dataset.generate_ray_batch(idx)
            t0 = time.time()
            rendering = render_image(render_eval_fn, batch.rays, train_frac,
                                     state.params, config, mesh)
            recorder.print(f"image {idx}/{num_eval} rendered in "
                           f"{time.time() - t0:.2f}s")
            if jax.process_index() != 0:
                continue

            rgb = np.clip(np.nan_to_num(rendering["rgb"]), 0, 1)
            gt = None if batch.rgb is None else nh_image.composite_alpha(
                np.asarray(batch.rgb),
                nh_image.BACKGROUND_VALUES[config.test_background_color])
            name = (dataset.image_name(idx) if args.original_name
                    and hasattr(dataset, "image_name") else f"{idx:03d}")

            if gt is not None:
                rgb_cc = nh_image.color_correct(rgb, gt)
                if config.eval_quantize_metrics:
                    q = lambda z: np.round(z * 255) / 255
                    rgb_m, rgb_cc_m, gt_m = q(rgb), q(rgb_cc), q(gt)
                else:
                    rgb_m, rgb_cc_m, gt_m = rgb, rgb_cc, gt
                if config.eval_crop_borders > 0:
                    c = config.eval_crop_borders
                    crop = lambda z: z[c:-c, c:-c]
                    rgb_m, rgb_cc_m, gt_m = map(crop, (rgb_m, rgb_cc_m, gt_m))
                metrics = metric_harness(jnp.asarray(rgb_m), jnp.asarray(gt_m))
                metrics_cc = metric_harness(jnp.asarray(rgb_cc_m),
                                            jnp.asarray(gt_m),
                                            lambda s: f"{s}_cc")
                metrics.update(metrics_cc)
                all_metrics.append(metrics)
                recorder.print("  " + " ".join(
                    f"{k}={v:.4f}" for k, v in metrics.items()))

            if config.eval_save_ray_data:
                ray_keys = {k: [np.asarray(x) for x in v]
                            for k, v in rendering.items()
                            if k.startswith("ray_")}
                if ray_keys:
                    np.savez(os.path.join(out_dir, f"{name}_rays.npz"),
                             **{f"{k}_{i}": arr for k, v in ray_keys.items()
                                for i, arr in enumerate(v)})

            if config.eval_save_output:
                nh_io.save_img_u8(rgb, os.path.join(
                    out_dir, f"{name}_color.png"))
                if gt is not None:
                    nh_io.save_img_u8(gt, os.path.join(
                        out_dir, f"{name}_gt.png"))
                if not args.only_pred_gt:
                    if gt is not None:
                        nh_io.save_img_u8(rgb_cc, os.path.join(
                            out_dir, f"{name}_color_cc.png"))
                    if "distance_mean" in rendering:
                        nh_io.save_img_f32(
                            np.asarray(rendering["distance_mean"]),
                            os.path.join(out_dir, f"{name}_depth.tiff"))
                    if gt is not None:
                        with open(os.path.join(
                                out_dir, f"{name}_metrics.txt"), "w") as f:
                            for k, v in metrics.items():
                                f.write(f"{k} {v}\n")

        if all_metrics and jax.process_index() == 0:
            mean = {k: float(np.mean([m[k] for m in all_metrics]))
                    for k in all_metrics[0]}
            recorder.print("mean: " + " ".join(
                f"{k}={v:.4f}" for k, v in mean.items()))
            # Finetune checkpoints share bare step numbers with train ones
            # (both count from 0), so mark the stage in the filename or the
            # finetune summary overwrites the train-stage summary.
            stage = "finetune_" if use_ft else ""
            with open(os.path.join(
                    config.checkpoint_dir,
                    f"metrics_{config.eval_data}_{stage}{step}.txt"),
                    "w") as f:
                for k, v in mean.items():
                    f.write(f"{k} {v}\n")
        if config.eval_only_once:
            break
        if polling_done(config, use_ft, step):
            break

    recorder.print("evaluation complete")
    recorder.close()


if __name__ == "__main__":
    main()
