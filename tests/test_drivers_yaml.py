"""The nerfacto-style (--config yaml) CLI dialect end-to-end, plus LPIPS
torch-layout conversion structure."""

import glob
import sys

import numpy as np
import pytest
import yaml

sys.path.insert(0, "/root/repo")

from tests.test_data import make_fake_kubric_scene


@pytest.mark.slow
def test_yaml_cli_train_eval(tmp_path):
    import train as train_driver
    import eval as eval_driver

    scene = tmp_path / "scene"
    ckpt = tmp_path / "ckpt"
    make_fake_kubric_scene(str(scene))

    config = {
        "base": {
            "dataset_type": "kubric", "downsample_factor": 1,
            "model_type": "nerfacto", "batch_size": 128,
            "num_img_per_batch": 2, "num_steps": 6, "warmup_steps": 2,
            "save_weight_every": 6, "eval_render_every": 0,
            "render_chunk_size": 128, "near": 0.1, "far": 4.0,
            "enable_amp": False, "bound": 2.0,
            "enable_scene_contraction": False,
            "train_background_color": "random",
            "test_background_color": "gray",
        },
        "model": {
            "num_proposal_iterations": 1,
            "num_proposal_samples_per_ray": [8],
            "num_nerf_samples_per_ray": 4,
            "log2_hashmap_size": 12, "num_levels": 4, "max_res": 64,
            "hidden_dim": 16, "hidden_dim_color": 16,
            "proposal_net_args_list": [
                {"base_res": 16, "hidden_dim": 8, "log2_hashmap_size": 11,
                 "features_per_level": 2, "num_levels": 3, "max_res": 32}],
            "rgb_loss_type": "mse",
            "distortion_loss_mult": 0.0,
        },
    }
    config_path = tmp_path / "tiny_nerfacto.yml"
    with open(config_path, "w") as f:
        yaml.safe_dump(config, f)

    argv = ["--config", str(config_path), "--data_dir", str(scene),
            "--save_dir", str(ckpt)]
    train_driver.main(argv)
    assert (ckpt / "checkpoint_6").exists()

    eval_driver.main(argv + ["--eval_data", "test"])
    preds = sorted(glob.glob(str(ckpt / "test_preds" / "*_color.png")))
    assert len(preds) == 2


def test_lpips_torch_layout_conversion():
    import torch

    from nerf_hugs_tpu.metrics import lpips

    sd = {}
    in_ch = 3
    convs = [(64, 11), (192, 5), (384, 3), (256, 3), (256, 3)]
    for i, (out_ch, k) in enumerate(convs):
        # Official lpips keys: net.slice{n}.{idx}.weight
        sd[f"net.slice{i + 1}.{i * 2}.weight"] = torch.zeros(
            out_ch, in_ch, k, k)
        sd[f"net.slice{i + 1}.{i * 2}.bias"] = torch.zeros(out_ch)
        sd[f"lin{i}.model.1.weight"] = torch.zeros(1, out_ch, 1, 1)
        in_ch = out_ch
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "lpips.pth")
        torch.save(sd, path)
        params = lpips.convert_torch_state_dict(path)
    for i, (out_ch, k) in enumerate(convs):
        assert params[f"conv{i}_w"].shape[0] == out_ch
        assert params[f"lin{i}_w"].shape == (out_ch,)
    model = lpips.LPIPS(params)  # loads into the arch without error
    img = np.zeros((64, 64, 3), np.float32)
    assert np.isfinite(float(model(img, img)))


def test_eval_window_indices_rotation():
    """Window semantics of reference nerfacto/train.py:241-296: start
    advances by max(eval_images_num//2, 1) per event, wraps mod size."""
    import train as train_driver

    win = train_driver.eval_window_indices
    # eval_images_num=2 (shipped configs): stride 1.
    assert win(1, 5, 2) == [0, 1]
    assert win(2, 5, 2) == [1, 2]
    assert win(5, 5, 2) == [4, 0]
    # Reference default 4: stride 2, window wraps.
    assert win(1, 5, 4) == [0, 1, 2, 3]
    assert win(2, 5, 4) == [2, 3, 4, 0]
    # Window capped at dataset size.
    assert win(1, 2, 4) == [0, 1]


@pytest.mark.slow
def test_yaml_train_uses_rotating_eval_window(tmp_path, monkeypatch):
    """The yaml-dialect driver fetches the rotating window by index."""
    import train as train_driver
    from nerf_hugs_tpu.data import base as data_base

    scene = tmp_path / "scene"
    make_fake_kubric_scene(str(scene))
    config = {
        "base": {
            "dataset_type": "kubric", "downsample_factor": 1,
            "model_type": "nerfacto", "batch_size": 128,
            "num_img_per_batch": 2, "num_steps": 4, "warmup_steps": 2,
            "save_weight_every": 4, "eval_render_every": 2,
            "eval_images_num": 2,
            "render_chunk_size": 128, "near": 0.1, "far": 4.0,
            "enable_amp": False, "bound": 2.0,
            "enable_scene_contraction": False,
            "train_background_color": "random",
            "test_background_color": "gray",
        },
        "model": {
            "num_proposal_iterations": 1,
            "num_proposal_samples_per_ray": [8],
            "num_nerf_samples_per_ray": 4,
            "log2_hashmap_size": 12, "num_levels": 4, "max_res": 64,
            "hidden_dim": 16, "hidden_dim_color": 16,
            "proposal_net_args_list": [
                {"base_res": 16, "hidden_dim": 8, "log2_hashmap_size": 11,
                 "features_per_level": 2, "num_levels": 3, "max_res": 32}],
            "rgb_loss_type": "mse",
            "distortion_loss_mult": 0.0,
        },
    }
    config_path = tmp_path / "tiny.yml"
    with open(config_path, "w") as f:
        yaml.safe_dump(config, f)

    import threading

    fetched = []
    real = data_base.Dataset.generate_ray_batch

    def spy(self, idx):
        # The dataset's prefetch daemon also fetches by index; only the
        # driver's showcase calls run on the main thread.
        if threading.current_thread() is threading.main_thread():
            fetched.append(idx)
        return real(self, idx)

    monkeypatch.setattr(data_base.Dataset, "generate_ray_batch", spy)
    train_driver.main(["--config", str(config_path), "--data_dir", str(scene),
                       "--save_dir", str(tmp_path / "ckpt")])
    # Events at steps 2 and 4 (2 test images): windows [0,1] then [1,0].
    # (Dataset construction makes one extra main-thread fetch up front.)
    assert fetched[-4:] == [0, 1, 1, 0]
