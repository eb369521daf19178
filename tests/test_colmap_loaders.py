"""LLFF / Phototourism / Distractor loaders on synthetic COLMAP scenes
written with our own binary writers (round-trip fixture pattern)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from nerf_hugs_tpu.cameras import camera_utils, colmap, scene_manager
from nerf_hugs_tpu.configs.config import Config
from nerf_hugs_tpu.data import load_dataset

H, W = 12, 16


def write_colmap_model(model_dir, n_images, rng, image_ext="png"):
    """A ring of cameras looking at the origin + a blob of 3-D points."""
    os.makedirs(model_dir, exist_ok=True)
    cameras = {1: colmap.Camera(1, "PINHOLE", W, H,
                                np.array([15.0, 15.0, W / 2, H / 2]))}
    images, points = {}, {}
    pts = rng.randn(40, 3) * 0.5
    for pid in range(40):
        track_ids = rng.randint(1, n_images + 1, rng.randint(2, 5))
        points[pid + 1] = colmap.Point3D(
            pid + 1, pts[pid], rng.randint(0, 255, 3), 0.5,
            track_ids, np.zeros(len(track_ids), int))
    for i in range(n_images):
        theta = 2 * np.pi * i / n_images
        position = np.array([3 * np.cos(theta), 3 * np.sin(theta), 1.0])
        z = camera_utils.normalize(-position)  # look at origin (COLMAP +z fwd)
        c2w_colmap = camera_utils.viewmatrix(z, np.array([0.0, 0, -1]),
                                             position)
        w2c = np.linalg.inv(camera_utils.pad_poses(c2w_colmap))
        qvec = colmap.rotmat2qvec(w2c[:3, :3])
        n_feat = rng.randint(4, 9)
        images[i + 1] = colmap.Image(
            i + 1, qvec, w2c[:3, 3], 1, f"img_{i:03d}.{image_ext}",
            rng.uniform(0, [W, H], (n_feat, 2)),
            rng.choice(list(points) + [-1], n_feat).astype(np.int64))
    colmap.write_cameras_binary(cameras, f"{model_dir}/cameras.bin")
    colmap.write_images_binary(images, f"{model_dir}/images.bin")
    colmap.write_points3D_binary(points, f"{model_dir}/points3D.bin")
    return [im.name for im in images.values()]


def write_images(image_dir, names, rng):
    os.makedirs(image_dir, exist_ok=True)
    for name in names:
        arr = (rng.rand(H, W, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(image_dir, name))


def test_scene_manager(tmp_path):
    rng = np.random.RandomState(0)
    names = write_colmap_model(str(tmp_path / "sparse"), 6, rng)
    out = scene_manager.load_colmap_scene(str(tmp_path / "sparse"))
    im_names, poses, pixtocams, dists, camtypes, pts3d = out
    assert im_names == names
    assert poses.shape == (6, 3, 4)
    assert pixtocams.shape == (6, 3, 3)
    assert pts3d.shape == (40, 3)
    assert all(d is None for d in dists)  # PINHOLE
    # Poses are c2w in NeRF frame: camera centers on the radius-sqrt(10) ring.
    np.testing.assert_allclose(np.linalg.norm(poses[:, :3, 3], axis=-1),
                               np.sqrt(10), rtol=1e-6)


def test_llff_loader(tmp_path):
    rng = np.random.RandomState(1)
    names = write_colmap_model(str(tmp_path / "sparse/0"), 9, rng)
    write_images(str(tmp_path / "images"), names, rng)
    config = Config(dataset_loader="llff", near=0.1, far=10.0, factor=0,
                    batch_size=64, image_num_per_batch=2, llffhold=3)
    ds_train = load_dataset("train", str(tmp_path), config)
    ds_test = load_dataset("test", str(tmp_path), config)
    assert ds_train.size == 6 and ds_test.size == 3
    batch = next(ds_train)
    assert batch.rgb.shape == (64, 3)
    # PCA normalization put camera centers inside the unit cube.
    assert np.max(np.abs(ds_train.camtoworlds[:, :3, 3])) <= 1.0 + 1e-6


def test_distractor_loader(tmp_path):
    rng = np.random.RandomState(2)
    names = write_colmap_model(str(tmp_path / "0/sparse/0"), 8, rng)
    write_images(str(tmp_path / "0/images"), names, rng)
    with open(tmp_path / "0/data_split.json", "w") as f:
        json.dump({"train": names[:6], "test": names[6:]}, f)
    config = Config(dataset_loader="distractor", near=0.2, far=1e6, factor=0,
                    batch_size=64, image_num_per_batch=2)
    ds = load_dataset("train", str(tmp_path), config)
    assert ds.size == 6
    batch = next(ds)
    assert batch.rgb.shape == (64, 3)
    assert np.all(np.asarray(batch.rays.near) > 0)
    assert np.all(np.asarray(batch.rays.far) == 1e6)
    ds_test = load_dataset("test", str(tmp_path), config)
    assert ds_test.size == 2
    # Test embeds continue after train embeds (index into all_names).
    assert int(ds_test.embed_idxs[0]) == 6


def test_phototourism_loader(tmp_path):
    rng = np.random.RandomState(3)
    scene_dir = tmp_path / "brandenburg_gate"
    names = write_colmap_model(str(scene_dir / "dense/sparse"), 7, rng,
                               image_ext="jpg")
    write_images(str(scene_dir / "dense/images"), names, rng)
    with open(scene_dir / "brandenburg_gate.tsv", "w") as f:
        f.write("filename\tid\tsplit\tdataset\n")
        for i, name in enumerate(names):
            split = "train" if i < 5 else "test"
            f.write(f"{name}\t{i}\t{split}\tx\n")
    config = Config(dataset_loader="phototourism", near=1.0, far=2.0,
                    factor=0, batch_size=64, image_num_per_batch=2)
    ds = load_dataset("train", str(scene_dir), config)
    assert ds.size == 5
    batch = next(ds)
    assert batch.rgb.shape == (64, 3)
    # near/far derive from point percentiles, not config.
    assert np.all(np.asarray(batch.rays.far) > np.asarray(batch.rays.near))
    ds_test = load_dataset("test", str(scene_dir), config)
    assert ds_test.size == 2
