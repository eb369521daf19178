"""Render-path pose generation across dataset loaders.

The reference only wires camera paths for LLFF (its generic render_path
branch raises NotImplementedError, datasets.py:330-333); this framework
extends ellipse/spline/file paths to every loader via
base.Dataset._apply_render_path. These tests cover the synthetic loader
(no assets needed) for each pose source plus an end-to-end render.py run
on a 4-frame spline path.
"""

import glob
import os

import jax
import numpy as np
import pytest

from nerf_hugs_tpu.configs.config import Config
from nerf_hugs_tpu.data import load_dataset


def path_config(**kw):
    config = Config(
        dataset_loader="synthetic", model_type="nerfacto", batch_size=256,
        image_num_per_batch=2, near=0.5, far=6.0, render_chunk_size=256,
        render_path=True, render_path_frames=6)
    for k, v in kw.items():
        setattr(config, k, v)
    return config


def test_ellipse_path_poses():
    config = path_config()
    dataset = load_dataset("test", "", config, is_training=False)
    assert dataset.size == 6
    assert dataset.camtoworlds.shape == (6, 3, 4)
    # Path cameras replicate intrinsics from camera 0 and carry no images.
    assert len(dataset.pixtocams) == 6
    assert dataset.images is None
    batch = dataset.generate_ray_batch(3)
    assert batch.rgb is None
    assert batch.rays.origins.shape[-1] == 3
    assert np.all(np.isfinite(batch.rays.origins))
    # Consecutive path poses differ (it is a path, not a repeat).
    assert not np.allclose(dataset.camtoworlds[0], dataset.camtoworlds[1])


def test_ellipse_path_poses_appearance_loader():
    # SyntheticAppearance post-processes self.images after the base loader
    # ran _apply_render_path (which nulls them) — regression: path mode
    # crashed with len(None) instead of skipping the tint.
    config = path_config(dataset_loader="synthetic_appearance")
    dataset = load_dataset("test", "", config, is_training=False)
    assert dataset.size == 6
    assert dataset.images is None
    batch = dataset.generate_ray_batch(2)
    assert batch.rgb is None
    assert np.all(np.isfinite(batch.rays.origins))


def test_spline_keyframe_path_poses(tmp_path):
    # Pick keyframes by image name from the same loader without a path.
    plain = load_dataset("test", "", path_config(render_path=False),
                         is_training=False)
    names = plain.image_names[:3]
    keyfile = tmp_path / "keyframes.txt"
    keyfile.write_text("\n".join(names))
    config = path_config(render_spline_keyframes=str(keyfile),
                         render_spline_n_interp=2, render_spline_degree=1,
                         render_spline_smoothness=0.0)
    dataset = load_dataset("test", "", config, is_training=False)
    # n_interp * (num_keyframes - 1) frames (camera_utils.py contract).
    assert dataset.size == 2 * (len(names) - 1)
    assert np.all(np.isfinite(dataset.camtoworlds))


def test_render_path_file_poses(tmp_path):
    rng = np.random.RandomState(0)
    poses = np.tile(np.eye(4)[None, :3, :], (4, 1, 1)).astype(np.float32)
    poses[:, :3, 3] = rng.randn(4, 3)
    path_file = tmp_path / "poses.npy"
    np.save(path_file, poses)
    config = path_config(render_path_file=str(path_file))
    dataset = load_dataset("test", "", config, is_training=False)
    assert dataset.size == 4
    np.testing.assert_allclose(dataset.camtoworlds, poses, atol=1e-6)


def test_render_cli_spline_path(tmp_path):
    """render.py end to end: train 2 steps, render a 4-frame spline path."""
    import render as render_driver
    import train as train_driver

    ckpt = tmp_path / "ckpt"
    bindings = [
        "Config.dataset_loader = 'synthetic'",
        "Config.batch_size = 256",
        "Config.patch_size = 1",
        "Config.image_num_per_batch = 2",
        "Config.near = 0.5", "Config.far = 6.0",
        "Config.max_steps = 2",
        "Config.checkpoint_every = 2",
        "Config.train_render_every = 0",
        "Config.render_chunk_size = 256",
        "Model.num_prop_samples = 8",
        "Model.num_nerf_samples = 4",
        "Model.num_levels = 2",
        "NerfMLP.net_depth = 2", "NerfMLP.net_width = 32",
        "NerfMLP.max_deg_point = 4",
        "PropMLP.net_depth = 2", "PropMLP.net_width = 16",
        "PropMLP.max_deg_point = 4",
    ]
    argv = [f"--gin_bindings={b}" for b in bindings] + [
        "--data_dir=unused", f"--save_dir={ckpt}"]
    train_driver.main(argv)

    plain = load_dataset("test", "", path_config(render_path=False),
                         is_training=False)
    keyfile = tmp_path / "keys.txt"
    keyfile.write_text("\n".join(plain.image_names[:3]))
    render_argv = argv + [
        "--gin_bindings=Config.render_path = True",
        f"--gin_bindings=Config.render_spline_keyframes = '{keyfile}'",
        "--gin_bindings=Config.render_spline_n_interp = 2",
        "--gin_bindings=Config.render_spline_degree = 1",
        "--gin_bindings=Config.render_spline_smoothness = 0.0",
        "--gin_bindings=Config.render_video_fps = 2",
    ]
    render_driver.main(render_argv)
    frames = sorted(glob.glob(
        str(ckpt / "render" / "path_renders_step_2" / "color_*.png")))
    assert len(frames) == 4, frames


def test_render_resolution_override():
    config = path_config(render_resolution=(16, 12))  # (width, height)
    dataset = load_dataset("test", "", config, is_training=False)
    batch = dataset.generate_ray_batch(0)
    assert batch.rays.origins.shape[:2] == (12, 16)
    assert np.all(np.isfinite(batch.rays.directions))
    # A finer grid keeps the field of view: corner ray directions should
    # roughly match the native-resolution corners.
    native = load_dataset(
        "test", "", path_config(), is_training=False).generate_ray_batch(0)
    a = batch.rays.viewdirs[0, 0]
    b = native.rays.viewdirs[0, 0]
    assert float(np.dot(a, b)) > 0.99
