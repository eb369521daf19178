#!/usr/bin/env python
"""Render driver: frames for a split (or camera path) + optional videos.

Parity: MipNeRF360/render.py:41-213 — frame-index job sharding
(render_job_id / render_num_jobs), skip-existing resume so a killed job
continues, async thread-pool image saving, and video encoding. Videos use
the ffmpeg binary when present (mediapy isn't vendored in this environment);
frames are always written so videos can be encoded elsewhere.
"""

from __future__ import annotations

import argparse
import concurrent.futures
import functools
import os
import shutil
import subprocess
import time

import numpy as np


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--gin_configs", action="append", default=[])
    parser.add_argument("--gin_bindings", action="append", default=[])
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--data_dir", type=str, default=None)
    parser.add_argument("--save_dir", type=str, default=None)
    parser.add_argument("--logtostderr", action="store_true")
    return parser.parse_args(argv)


def create_videos(config, base_dir, out_dir, out_name, num_frames):
    """Encode the saved frames with the ffmpeg binary (render.py:41-95)."""
    import matplotlib

    from nerf_hugs_tpu.utils import io as nh_io

    if shutil.which("ffmpeg") is None:
        print("ffmpeg not found; skipping video encoding (frames saved)")
        return
    names = [n for n in config.checkpoint_dir.split("/") if n]
    exp_name, scene_name = (names[-2:] if len(names) >= 2
                            else ("exp", names[-1]))
    video_prefix = f"{scene_name}_{exp_name}_{out_name}"
    zpad = max(3, len(str(num_frames - 1)))

    depth_file = os.path.join(out_dir, f"distance_mean_{0:0{zpad}d}.tiff")
    lo = hi = None
    if os.path.exists(depth_file):
        depth = nh_io.load_img(depth_file)
        p = config.render_dist_percentile
        limits = np.percentile(depth.flatten(), [p, 100 - p])
        curve = {"log": np.log}.get(config.render_dist_curve_fn, np.log)
        lo, hi = [curve(x) for x in limits]

    for tag in ["color", "acc", "distance_mean", "distance_median"]:
        ext = "png" if tag == "color" else "tiff"
        first = os.path.join(out_dir, f"{tag}_{0:0{zpad}d}.{ext}")
        if not os.path.exists(first):
            continue
        tmp_dir = os.path.join(base_dir, f"_frames_{tag}")
        os.makedirs(tmp_dir, exist_ok=True)
        for idx in range(num_frames):
            src = os.path.join(out_dir, f"{tag}_{idx:0{zpad}d}.{ext}")
            img = nh_io.load_img(src)
            if tag == "color":
                img = img / 255.0
            elif tag == "acc":
                img = np.stack([img] * 3, -1)
            else:
                curve = {"log": np.log}.get(config.render_dist_curve_fn,
                                            np.log)
                img = curve(np.maximum(img, 1e-9))
                img = np.clip((img - min(lo, hi)) / abs(hi - lo), 0, 1)
                img = matplotlib.colormaps["turbo"](img)[..., :3]
            nh_io.save_img_u8(np.clip(np.nan_to_num(img), 0, 1),
                              os.path.join(tmp_dir, f"{idx:0{zpad}d}.png"))
        video_file = os.path.join(base_dir, f"{video_prefix}_{tag}.mp4")
        print(f"Encoding {video_file}")
        subprocess.run(
            ["ffmpeg", "-y", "-framerate", str(config.render_video_fps),
             "-i", os.path.join(tmp_dir, f"%0{zpad}d.png"),
             "-c:v", "libx264", "-crf", str(config.render_video_crf),
             "-pix_fmt", "yuv420p", video_file],
            check=True, capture_output=True)
        shutil.rmtree(tmp_dir, ignore_errors=True)


def _claim_video_encode(out_dir: str) -> bool:
    """Atomically claim the video-encode step (O_CREAT|O_EXCL): two sharded
    jobs can both see the complete frame set within the settle window, and
    concurrent ffmpeg runs on the same output paths corrupt the videos."""
    try:
        os.close(os.open(os.path.join(out_dir, ".videos_claimed"),
                         os.O_CREAT | os.O_EXCL | os.O_WRONLY))
        return True
    except FileExistsError:
        return False


def main(argv=None):
    args = parse_args(argv)
    from train import load_config_from_args
    config = load_config_from_args(args)

    import jax

    from nerf_hugs_tpu.data import load_dataset
    from nerf_hugs_tpu.parallel import mesh as mesh_lib
    from nerf_hugs_tpu.train import checkpoints
    from nerf_hugs_tpu.train import step as train_step_lib
    from nerf_hugs_tpu.train.render_image import render_image
    from nerf_hugs_tpu.utils import io as nh_io

    mesh_lib.maybe_initialize_distributed()
    mesh = mesh_lib.make_mesh()
    rng = jax.random.PRNGKey(20200823)
    model, state, render_eval_fn, _, _ = train_step_lib.setup_model(
        config, rng, mesh)

    ft_dir = os.path.join(config.checkpoint_dir, "finetune")
    ckpt_dir = ft_dir if (config.finetune_enable and
                          checkpoints.latest_step(ft_dir) is not None) \
        else config.checkpoint_dir
    checkpoints.check_model_compat(config.checkpoint_dir, config)
    state = checkpoints.restore_params(ckpt_dir, state)
    step = int(state.step)
    if config.finetune_enable and ckpt_dir == ft_dir:
        step += int(config.max_steps)
    print(f"Rendering checkpoint at step {step}.")

    dataset = load_dataset("test", config.data_dir, config,
                           is_training=False)

    out_name = "path_renders" if config.render_path else "test_preds"
    out_name = f"{out_name}_step_{step}"
    base_dir = config.render_dir or os.path.join(config.checkpoint_dir,
                                                 "render")
    out_dir = os.path.join(base_dir, out_name)
    os.makedirs(out_dir, exist_ok=True)
    path_fn = lambda x: os.path.join(out_dir, x)
    zpad = max(3, len(str(dataset.size - 1)))

    if config.render_save_async:
        pool = concurrent.futures.ThreadPoolExecutor(max_workers=4)
        futures = []
        save_fn = lambda fn, *a: futures.append(pool.submit(fn, *a))
    else:
        futures = []
        save_fn = lambda fn, *a: fn(*a)

    for idx in range(dataset.size):
        # Frame-index job sharding across independent processes.
        if idx % config.render_num_jobs != config.render_job_id:
            continue
        idx_str = f"{idx:0{zpad}d}"
        next_str = f"{idx + config.render_num_jobs:0{zpad}d}"
        if (os.path.exists(path_fn(f"color_{idx_str}.png")) and
                os.path.exists(path_fn(f"color_{next_str}.png"))):
            print(f"Image {idx}/{dataset.size} already exists, skipping")
            continue
        print(f"Evaluating image {idx + 1}/{dataset.size}")
        t0 = time.time()
        rays = dataset.generate_ray_batch(idx).rays
        rendering = render_image(render_eval_fn, rays, 1.0, state.params,
                                 config, mesh)
        print(f"Rendered in {time.time() - t0:0.3f}s")
        if jax.process_index() != 0:
            continue
        save_fn(nh_io.save_img_u8, rendering["rgb"],
                path_fn(f"color_{idx_str}.png"))
        if "acc" in rendering:
            save_fn(nh_io.save_img_f32, rendering["acc"],
                    path_fn(f"acc_{idx_str}.tiff"))
        for key in ["distance_mean", "distance_median"]:
            if key in rendering:
                save_fn(nh_io.save_img_f32, rendering[key],
                        path_fn(f"{key}_{idx_str}.tiff"))

    for f in futures:
        f.result()

    # Whichever job finishes last sees the full frame set and encodes the
    # videos (reference render.py:198-203 counts saved files after a settle
    # delay — every job checks; with one job this is trivially the end).
    if jax.process_index() == 0:
        if config.render_num_jobs > 1:
            time.sleep(1)  # settle: peer jobs' in-flight async saves
        num_files = len(
            [n for n in os.listdir(out_dir)
             if n.startswith("color_") and n.endswith(".png")])
        if num_files == dataset.size:
            if _claim_video_encode(out_dir):
                print(f"All files found, creating videos "
                      f"(job {config.render_job_id}).")
                try:
                    create_videos(config, base_dir, out_dir, out_name,
                                  dataset.size)
                finally:
                    # Release so a later rerun can re-encode; only
                    # CONCURRENT encodes are unsafe.
                    os.unlink(os.path.join(out_dir, ".videos_claimed"))
            else:
                # A peer job holds the claim — or a kill mid-encode left a
                # stale one (SIGKILL skips the finally). Say so instead of
                # silently skipping the videos on every rerun.
                print(f"video encode already claimed by another job "
                      f"({os.path.join(out_dir, '.videos_claimed')}); "
                      f"delete that file and rerun to force a re-encode")

    print("render complete")


if __name__ == "__main__":
    main()
