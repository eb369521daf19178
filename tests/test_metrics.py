"""Metrics: SSIM vs an independent scipy implementation, PSNR identities,
color correction, LPIPS pipeline, and the metrics.py scoring CLI."""

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from nerf_hugs_tpu.metrics import image as nh_image
from nerf_hugs_tpu.metrics.ssim import ssim


def reference_ssim(img0, img1, max_val=1.0, sigma=1.5, filter_size=11,
                   k1=0.01, k2=0.03):
    """Independent SSIM from the Wang et al. formula with scipy correlation
    (VALID crop), per channel."""
    from scipy.ndimage import correlate
    half = filter_size // 2
    offsets = np.arange(filter_size) - half
    g = np.exp(-0.5 * (offsets / sigma) ** 2)
    kernel = np.outer(g, g)
    kernel /= kernel.sum()

    def filt(x):
        out = np.stack([correlate(x[..., c], kernel, mode="constant")
                        for c in range(x.shape[-1])], -1)
        return out[half:-half, half:-half]

    mu0, mu1 = filt(img0), filt(img1)
    s00 = filt(img0 * img0) - mu0**2
    s11 = filt(img1 * img1) - mu1**2
    s01 = filt(img0 * img1) - mu0 * mu1
    c1, c2 = (k1 * max_val) ** 2, (k2 * max_val) ** 2
    num = (2 * mu0 * mu1 + c1) * (2 * s01 + c2)
    den = (mu0**2 + mu1**2 + c1) * (s00 + s11 + c2)
    return (num / den).mean()


def test_ssim_matches_independent_implementation():
    rng = np.random.RandomState(0)
    img0 = rng.rand(40, 48, 3).astype(np.float32)
    img1 = np.clip(img0 + rng.randn(40, 48, 3) * 0.05, 0, 1).astype(np.float32)
    got = float(ssim(img0, img1))
    want = reference_ssim(img0.astype(np.float64), img1.astype(np.float64))
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_ssim_identity_and_ordering():
    rng = np.random.RandomState(1)
    img = rng.rand(32, 32, 3).astype(np.float32)
    assert float(ssim(img, img)) == pytest.approx(1.0, abs=1e-5)
    near = np.clip(img + rng.randn(32, 32, 3) * 0.02, 0, 1)
    far = np.clip(img + rng.randn(32, 32, 3) * 0.3, 0, 1)
    assert float(ssim(img, near)) > float(ssim(img, far))


def test_psnr_roundtrip():
    mse = 1e-3
    psnr = float(nh_image.mse_to_psnr(mse))
    np.testing.assert_allclose(float(nh_image.psnr_to_mse(psnr)), mse,
                               rtol=1e-5)
    np.testing.assert_allclose(psnr, 30.0, atol=0.01)


def test_srgb_roundtrip():
    x = jnp.linspace(0.0, 1.0, 256)
    y = nh_image.srgb_to_linear(nh_image.linear_to_srgb(x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_downsample_box():
    img = np.arange(16, dtype=np.float32).reshape(4, 4, 1)
    out = nh_image.downsample(img, 2)
    np.testing.assert_allclose(out[..., 0], [[2.5, 4.5], [10.5, 12.5]])


def test_color_correct_fixes_affine_shift():
    rng = np.random.RandomState(0)
    ref = rng.rand(32, 32, 3).astype(np.float32) * 0.8 + 0.1
    img = np.clip(ref * 0.7 + 0.1, 0, 1).astype(np.float32)
    corrected = nh_image.color_correct(img, ref)
    before = float(np.mean((img - ref) ** 2))
    after = float(np.mean((corrected - ref) ** 2))
    assert after < before * 0.05


def test_lpips_pipeline_random_weights():
    from nerf_hugs_tpu.metrics import lpips
    model = lpips.LPIPS.random_init()
    rng = np.random.RandomState(0)
    img0 = rng.rand(64, 64, 3).astype(np.float32)
    img1 = rng.rand(64, 64, 3).astype(np.float32)
    d_same = float(model(img0, img0))
    d_diff = float(model(img0, img1))
    np.testing.assert_allclose(d_same, 0.0, atol=1e-6)
    assert d_diff > 0


def test_metrics_cli(tmp_path):
    import metrics as metrics_cli
    from nerf_hugs_tpu.utils import io as nh_io
    rng = np.random.RandomState(0)
    for scene in ["sceneA", "sceneB"]:
        pred_dir = tmp_path / scene / "test_preds"
        os.makedirs(pred_dir)
        for i in range(2):
            gt = rng.rand(16, 20, 3)
            pred = np.clip(gt + rng.randn(16, 20, 3) * 0.05, 0, 1)
            nh_io.save_img_u8(gt, str(pred_dir / f"{i:03d}_gt.png"))
            nh_io.save_img_u8(pred, str(pred_dir / f"{i:03d}_color.png"))
    results = metrics_cli.main(str(tmp_path), ["sceneA", "sceneB"], "whole",
                               True, str(tmp_path / "out"))
    assert "mean" in results
    assert "psnr" in results["mean"] and "ssim" in results["mean"]
    assert results["sceneA"]["mean"]["psnr"] > 15
    assert (tmp_path / "out" / "metrics_results.json").exists()
    # half_right crop path.
    results_hr = metrics_cli.main(str(tmp_path), ["sceneA"], "half_right",
                                  False, str(tmp_path / "out2"))
    assert "psnr" in results_hr["sceneA"]["mean"]
