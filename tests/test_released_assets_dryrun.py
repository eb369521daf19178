"""Fixture dry-run of tools/validate_released_assets.py (fast tier).

Synthesizes a complete asset drop — a reference-format flax checkpoint,
"released" renders produced from the same weights, and an
official-key-schema LPIPS .pth — then runs the turnkey day-one script
end-to-end: inventory, LPIPS conversion+smoke, checkpoint conversion,
re-render through the real eval.py driver, cross-scoring ours vs the
released renders, and the PAPER_COMPARISON report. When a real drop lands
(ASSETS_REQUEST.md), only data content is untested — not plumbing.
Reference reproduction path: /root/reference/README.md:152-158.
"""

import json
import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

TINY_GIN = """
Config.dataset_loader = 'synthetic'
Config.synthetic_num_images = 3
Config.synthetic_height = 16
Config.synthetic_width = 20
Config.batch_size = 256
Config.near = 0.5
Config.far = 6.0
Config.max_steps = 5
Config.render_chunk_size = 256
Model.num_prop_samples = 8
Model.num_nerf_samples = 4
Model.num_levels = 2
NerfMLP.net_depth = 2
NerfMLP.net_width = 32
NerfMLP.bottleneck_width = 16
NerfMLP.net_width_viewdirs = 16
NerfMLP.max_deg_point = 6
PropMLP.net_depth = 2
PropMLP.net_width = 16
PropMLP.disable_rgb = True
PropMLP.max_deg_point = 6
"""


def _make_lpips_fixture(path):
    import torch
    rng = np.random.RandomState(0)
    sd = {}
    in_ch = 3
    convs = [(64, 11), (192, 5), (384, 3), (256, 3), (256, 3)]
    for i, (out_ch, k) in enumerate(convs):
        sd[f"net.slice{i + 1}.{i * 2}.weight"] = torch.tensor(
            rng.randn(out_ch, in_ch, k, k).astype(np.float32) * 0.05)
        sd[f"net.slice{i + 1}.{i * 2}.bias"] = torch.zeros(out_ch)
        sd[f"lin{i}.model.1.weight"] = torch.tensor(
            np.abs(rng.randn(1, out_ch, 1, 1)).astype(np.float32))
        in_ch = out_ch
    torch.save(sd, path)


def test_released_assets_dryrun(tmp_path):
    from flax.training import checkpoints as flax_checkpoints

    from nerf_hugs_tpu.configs import gin_parser
    from nerf_hugs_tpu.data import load_dataset
    from nerf_hugs_tpu.parallel import mesh as mesh_lib
    from nerf_hugs_tpu.train import step as train_step_lib
    from nerf_hugs_tpu.train.render_image import render_image
    from nerf_hugs_tpu.utils import io as nh_io

    assets = tmp_path / "drop"
    gin_path = tmp_path / "tiny_assets.gin"
    gin_path.write_text(TINY_GIN)
    config = gin_parser.parse_gin_configs([str(gin_path)], [])

    # "Released" checkpoint: our init params wrapped in the reference's
    # flax TrainState layout (the param pytree is reference-identical,
    # tests/test_reference_model_parity.py).
    mesh = mesh_lib.make_mesh()
    _, state, render_fn, _, _ = train_step_lib.setup_model(
        config, jax.random.PRNGKey(0), mesh)
    ckpt_dir = assets / "checkpoints" / "exp_tiny" / "scene0"
    flax_checkpoints.save_checkpoint(
        str(ckpt_dir), {"params": jax.device_get(state.params), "step": 5,
                        "opt_state": {}}, step=5, keep=1)

    # "Released" renders: the same weights through the same renderer.
    params = mesh_lib.replicate(state.params, mesh)
    test_ds = load_dataset("test", "", config, is_training=False)
    rel_dir = assets / "rendering_results" / "exp_tiny" / "scene0" / \
        "test_preds"
    os.makedirs(rel_dir)
    for idx in range(test_ds.size):
        batch = test_ds.generate_ray_batch(idx)
        rendering = render_image(render_fn, batch.rays, 1.0, params,
                                 config, mesh)
        rgb = np.clip(np.nan_to_num(rendering["rgb"]), 0, 1)
        nh_io.save_img_u8(rgb, str(rel_dir / f"{idx:03d}_color.png"))
        nh_io.save_img_u8(np.asarray(batch.rgb),
                          str(rel_dir / f"{idx:03d}_gt.png"))

    _make_lpips_fixture(str(assets / "lpips_alex_fixture.pth"))

    config_map = tmp_path / "config_map.json"
    config_map.write_text(json.dumps({"exp_tiny": str(gin_path)}))

    from tools import validate_released_assets as vra
    work = tmp_path / "work"
    rows, extras = vra.main(["--assets_dir", str(assets),
                             "--work_dir", str(work),
                             "--config_map", str(config_map)])

    assert extras["lpips"]["ok"], extras
    assert len(rows) == 1
    row = rows[0]
    assert row["experiment"] == "exp_tiny" and row["scene"] == "scene0"
    # Released renders scored by our metrics (the oracle-locking step).
    assert "released_scores" in row and "psnr" in row["released_scores"]
    assert "lpips" in row["released_scores"], (
        "LPIPS weights present but not used in scoring")
    # Our re-render of the converted checkpoint scored against GT.
    assert "our_scores" in row and np.isfinite(row["our_scores"]["psnr"])
    # Same weights + same renderer => ours reproduce the released renders.
    assert row["ours_vs_released_psnr"] > 45, row
    # Report files exist and carry the row.
    report = (work / "PAPER_COMPARISON.md").read_text()
    assert "exp_tiny" in report and "scene0" in report
    assert (work / "PAPER_COMPARISON.json").exists()
