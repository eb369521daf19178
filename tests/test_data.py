"""Data-layer tests: synthetic in-memory dataset + kubric on a fake on-disk
scene (DummyDataset pattern, MipNeRF360/tests/datasets_test.py:26-49)."""

import json
import os

import numpy as np
import pytest

from nerf_hugs_tpu.configs.config import Config
from nerf_hugs_tpu.data import load_dataset
from nerf_hugs_tpu.utils import structs


def make_config(**kw):
    defaults = dict(dataset_loader="synthetic", batch_size=256, patch_size=1,
                    patch_dilation=1, image_num_per_batch=4, near=0.5, far=6.0)
    defaults.update(kw)
    return Config(**defaults)


def test_synthetic_train_batches():
    config = make_config()
    ds = load_dataset("train", "", config)
    batch = next(ds)
    assert isinstance(batch, structs.Batch)
    assert batch.rgb.shape == (256, 3)
    assert batch.rays.origins.shape == (256, 3)
    assert batch.rays.radii.shape == (256, 1)
    assert batch.rays.embed_idx.dtype == np.int32
    np.testing.assert_allclose(
        np.linalg.norm(batch.rays.viewdirs, axis=-1), 1.0, atol=1e-6)
    assert np.all(batch.rays.near == 0.5)
    assert np.all(batch.rays.far == 6.0)
    # Successive batches differ (random sampling).
    batch2 = next(ds)
    assert not np.allclose(batch.rays.origins, batch2.rays.origins)


def test_synthetic_patch_batches():
    config = make_config(patch_size=4, batch_size=256, image_num_per_batch=2)
    ds = load_dataset("train", "", config)
    batch = next(ds)
    assert batch.rgb.shape == (256, 3)
    # Patch structure: reshaping to patches gives contiguous pixel coords.
    pix = batch.rays.pix_coords.reshape(-1, 4, 4, 2)
    w = ds.widths[0]
    x = pix[..., 0] * w  # un-normalize
    dx = np.diff(x, axis=-1)
    np.testing.assert_allclose(dx, 1.0, atol=1e-4)


def test_synthetic_test_split_full_images():
    config = make_config()
    ds = load_dataset("test", "", config)
    batch = next(ds)
    h, w = ds.heights[0], ds.widths[0]
    assert batch.rgb.shape == (h, w, 3)
    assert batch.rays.origins.shape == (h, w, 3)
    # Test batches cycle through cameras in order.
    batch2 = next(ds)
    assert not np.allclose(batch.rays.origins[0, 0], batch2.rays.origins[0, 0])


def test_sample_from_half_image():
    config = make_config()
    ds = load_dataset("train", "", config, sample_from_half_image=True)
    batch = next(ds)
    # All x pix coords in the left half.
    assert np.all(batch.rays.pix_coords[..., 0] <= 0.5 + 1e-6)


def make_fake_kubric_scene(root, rgba=False):
    """Minimal kubric directory tree with 3 train / 2 test frames."""
    from PIL import Image
    rng = np.random.RandomState(0)
    h, w = 16, 20
    os.makedirs(f"{root}/rgb/1x", exist_ok=True)
    os.makedirs(f"{root}/camera-gt", exist_ok=True)
    os.makedirs(f"{root}/freeze-test/static-rgb/1x", exist_ok=True)
    os.makedirs(f"{root}/freeze-test/camera-gt", exist_ok=True)
    with open(f"{root}/scene_gt.json", "w") as f:
        json.dump({"center": [0.1, 0.2, 0.0], "scale": 0.5,
                   "near": 0.2, "far": 3.0}, f)
    with open(f"{root}/dataset.json", "w") as f:
        json.dump({"train_ids": ["00000", "00001", "00002"]}, f)
    with open(f"{root}/freeze-test/dataset.json", "w") as f:
        json.dump({"val_ids": ["10000", "10001"]}, f)

    def write_frame(img_dir, cam_dir, name):
        if rgba:
            img = (rng.rand(h, w, 4) * 255).astype(np.uint8)
            img[..., 3] = (rng.rand(h, w) > 0.3).astype(np.uint8) * 255
            Image.fromarray(img, "RGBA").save(f"{img_dir}/{name}.png")
        else:
            img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
            Image.fromarray(img).save(f"{img_dir}/{name}.png")
        cam = {
            "orientation": np.eye(3).tolist(),
            "position": rng.randn(3).tolist(),
            "focal_length": 20.0,
            "principal_point": [w / 2, h / 2],
            "skew": 0.0,
            "pixel_aspect_ratio": 1.0,
            "radial_distortion": [0.001, 0.0, 0.0],
            "tangential_distortion": [0.0, 0.0],
            "image_size": [w, h],
        }
        with open(f"{cam_dir}/{name}.json", "w") as f:
            json.dump(cam, f)

    for name in ["00000", "00001", "00002"]:
        write_frame(f"{root}/rgb/1x", f"{root}/camera-gt", name)
    for name in ["10000", "10001"]:
        write_frame(f"{root}/freeze-test/static-rgb/1x",
                    f"{root}/freeze-test/camera-gt", name)
    return h, w


def make_fake_blender_scene(root):
    """Minimal NeRF-synthetic tree: transforms_{split}.json + RGBA PNGs
    (reference layout: MipNeRF360/internal/datasets.py:552-630)."""
    from PIL import Image
    rng = np.random.RandomState(0)
    h, w = 12, 16
    for split, names in (("train", ["r_0", "r_1", "r_2"]),
                         ("test", ["r_0", "r_1"])):
        os.makedirs(f"{root}/{split}", exist_ok=True)
        frames = []
        for name in names:
            rgba = (rng.rand(h, w, 4) * 255).astype(np.uint8)
            rgba[..., 3] = (rng.rand(h, w) > 0.5).astype(np.uint8) * 255
            Image.fromarray(rgba, "RGBA").save(f"{root}/{split}/{name}.png")
            c2w = np.eye(4)
            c2w[:3, 3] = rng.randn(3)
            frames.append({"file_path": f"./{split}/{name}",
                           "transform_matrix": c2w.tolist()})
        with open(f"{root}/transforms_{split}.json", "w") as f:
            json.dump({"camera_angle_x": 0.6911, "frames": frames}, f)
    return h, w


def test_blender_loader(tmp_path):
    h, w = make_fake_blender_scene(str(tmp_path))
    config = make_config(dataset_loader="blender", factor=1, batch_size=64,
                         image_num_per_batch=2, near=2.0, far=6.0)
    ds = load_dataset("train", str(tmp_path), config)
    assert ds.size == 3
    batch = next(ds)
    assert batch.rgb.shape == (64, 3)
    assert np.all(batch.rays.near == 2.0) and np.all(batch.rays.far == 6.0)
    # Focal from camera_angle_x (datasets.py:565 semantics).
    np.testing.assert_allclose(
        ds.focals[0], 0.5 * w / np.tan(0.5 * 0.6911), rtol=1e-6)

    ds_test = load_dataset("test", str(tmp_path), config)
    assert ds_test.size == 2
    tb = next(ds_test)
    assert tb.rgb.shape == (h, w, 3)
    # Alpha composited onto WHITE: zero-alpha pixels are exactly 1.0.
    from PIL import Image
    rgba = np.asarray(Image.open(f"{tmp_path}/test/r_0.png")) / 255.0
    zero_a = rgba[..., 3] == 0.0
    assert zero_a.any()
    np.testing.assert_allclose(tb.rgb[zero_a], 1.0, atol=1e-6)
    # Train/test embeddings are disjoint: test offsets by the train count.
    assert int(tb.rays.embed_idx[0, 0, 0]) == 3


def test_blender_loader_nerfacto_keeps_alpha(tmp_path):
    """The nerfacto dialect keeps RGBA so the loss can composite the target
    against the model's per-batch background (nerfacto/datasets/blender.py:98
    keeps channels; base.py:221-224 composites)."""
    h, w = make_fake_blender_scene(str(tmp_path))
    config = make_config(dataset_loader="blender", model_type="nerfacto",
                         factor=1, batch_size=64, image_num_per_batch=2,
                         near=2.0, far=6.0)
    ds = load_dataset("train", str(tmp_path), config)
    batch = next(ds)
    assert batch.rgb.shape == (64, 4)
    tb = next(load_dataset("test", str(tmp_path), config))
    assert tb.rgb.shape == (h, w, 4)
    # Raw values survive: zero-alpha pixels keep their stored rgb (no white
    # composite at load).
    from PIL import Image
    rgba = np.asarray(Image.open(f"{tmp_path}/test/r_0.png")) / 255.0
    zero_a = rgba[..., 3] == 0.0
    np.testing.assert_allclose(np.asarray(tb.rgb)[zero_a][:, :3],
                               rgba[zero_a][:, :3], atol=1e-6)


def test_kubric_loader_rgba_by_dialect(tmp_path):
    """RGBA kubric drops: white-composited for mipnerf360 (datasets.py:
    1074-1076), kept 4-channel for the nerfacto dialect."""
    h, w = make_fake_kubric_scene(str(tmp_path), rgba=True)
    base_kw = dict(dataset_loader="kubric", factor=1, batch_size=64,
                   image_num_per_batch=2)
    tb = next(load_dataset(
        "test", str(tmp_path), make_config(model_type="mipnerf360",
                                           **base_kw)))
    assert tb.rgb.shape == (h, w, 3)
    tb4 = next(load_dataset(
        "test", str(tmp_path), make_config(model_type="nerfacto",
                                           **base_kw)))
    assert tb4.rgb.shape == (h, w, 4)
    # The mipnerf360 composite is exactly rgb*a + (1-a).
    np.testing.assert_allclose(
        np.asarray(tb.rgb),
        np.asarray(tb4.rgb[..., :3] * tb4.rgb[..., 3:]
                   + (1.0 - tb4.rgb[..., 3:])), atol=1e-6)


def test_kubric_loader(tmp_path):
    h, w = make_fake_kubric_scene(str(tmp_path))
    config = make_config(dataset_loader="kubric", factor=1,
                         batch_size=64, image_num_per_batch=2)
    ds = load_dataset("train", str(tmp_path), config)
    assert ds.size == 3
    batch = next(ds)
    assert batch.rgb.shape == (64, 3)
    # Kubric scales the far plane by 1.2 (reference quirk preserved).
    np.testing.assert_allclose(float(batch.rays.far[0, 0]), 3.0 * 1.2, rtol=1e-6)
    np.testing.assert_allclose(float(batch.rays.near[0, 0]), 0.2, rtol=1e-6)
    # Test split: separate images, embed offset by train count.
    ds_test = load_dataset("test", str(tmp_path), config)
    assert ds_test.size == 2
    tb = next(ds_test)
    assert tb.rgb.shape == (h, w, 3)
    assert int(tb.rays.embed_idx[0, 0, 0]) == 3
