"""Image metrics and color processing.

PSNR<->MSE, sRGB transfer, area downsampling, iterative per-channel quadratic
color correction, and the MetricHarness used during training eval.
Parity target: MipNeRF360/internal/image.py:28-141 (the reference's SSIM is
dm_pix.ssim; ours lives in metrics/ssim.py with the same TF-style defaults).
"""

from __future__ import annotations

import types
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from nerf_hugs_tpu.configs import config as _config
from nerf_hugs_tpu.metrics.ssim import ssim

_Array = Union[np.ndarray, jnp.ndarray]


# Re-exported canonical background palette (single source of truth in
# configs/config.py — the models' _background draws from the same table).
BACKGROUND_VALUES = _config.BACKGROUND_VALUES


def composite_alpha(image: np.ndarray, background: float) -> np.ndarray:
    """Composite an RGBA image over a constant background; passes 3-channel
    images through. The nerfacto dialect keeps alpha channels in GT images
    (nerfacto/datasets/blender.py:98) and its eval composites them against
    config.test_background_color (base.py:57-58, 221-224)."""
    if image.shape[-1] != 4:
        return image[..., :3]
    alpha = image[..., 3:]
    return image[..., :3] * alpha + background * (1.0 - alpha)


def mse_to_psnr(mse):
    """PSNR for max pixel value 1."""
    return -10.0 / jnp.log(10.0) * jnp.log(mse)


def psnr_to_mse(psnr):
    return jnp.exp(-0.1 * jnp.log(10.0) * psnr)


def ssim_to_dssim(s):
    return (1 - s) / 2


def dssim_to_ssim(d):
    return 1 - 2 * d


def linear_to_srgb(linear: _Array, eps: Optional[float] = None,
                   xnp: types.ModuleType = jnp) -> _Array:
    """sRGB transfer function for linear values in [0, 1]."""
    if eps is None:
        eps = xnp.finfo(xnp.float32).eps
    srgb0 = 323 / 25 * linear
    srgb1 = (211 * xnp.maximum(eps, linear) ** (5 / 12) - 11) / 200
    return xnp.where(linear <= 0.0031308, srgb0, srgb1)


def srgb_to_linear(srgb: _Array, eps: Optional[float] = None,
                   xnp: types.ModuleType = jnp) -> _Array:
    if eps is None:
        eps = xnp.finfo(xnp.float32).eps
    linear0 = 25 / 323 * srgb
    linear1 = xnp.maximum(eps, (200 * srgb + 11) / 211) ** (12 / 5)
    return xnp.where(srgb <= 0.04045, linear0, linear1)


def downsample(img, factor: int):
    """Area (box-filter) downsample; factor must divide both spatial dims."""
    sh = img.shape
    if sh[0] % factor or sh[1] % factor:
        raise ValueError(
            f"downsample factor {factor} does not divide image shape {sh[:2]}")
    img = img.reshape((sh[0] // factor, factor, sh[1] // factor, factor) + sh[2:])
    return img.mean(axis=(1, 3))


def color_correct(img, ref, num_iters: int = 5, eps: float = 0.5 / 255):
    """Per-channel quadratic color warp fitting img to ref.

    Solves masked least squares on a quadratic feature expansion, iterating
    because the set of saturated pixels changes as the warp updates
    (image.py:81-124). The solve runs in float64 numpy for stability, matching
    the reference's eval protocol (eval.py:121-123).
    """
    if img.shape[-1] != ref.shape[-1]:
        raise ValueError(
            f"channel mismatch: img {img.shape[-1]} vs ref {ref.shape[-1]}")
    num_channels = img.shape[-1]
    img_mat = np.asarray(img, np.float64).reshape(-1, num_channels)
    ref_mat = np.asarray(ref, np.float64).reshape(-1, num_channels)
    is_unclipped = lambda z: (z >= eps) & (z <= 1 - eps)
    mask0 = is_unclipped(img_mat)
    for _ in range(num_iters):
        feats = [img_mat[:, c:c + 1] * img_mat[:, c:] for c in range(num_channels)]
        feats += [img_mat, np.ones_like(img_mat[:, :1])]
        a_mat = np.concatenate(feats, axis=-1)
        warp = []
        for c in range(num_channels):
            b = ref_mat[:, c]
            mask = mask0[:, c] & is_unclipped(img_mat[:, c]) & is_unclipped(b)
            w = np.linalg.lstsq(np.where(mask[:, None], a_mat, 0),
                                np.where(mask, b, 0), rcond=-1)[0]
            if not np.all(np.isfinite(w)):
                raise FloatingPointError("color_correct solve produced non-finite warp")
            warp.append(w)
        img_mat = np.clip(a_mat @ np.stack(warp, -1), 0, 1)
    return img_mat.reshape(np.asarray(img).shape).astype(np.asarray(img).dtype)


class MetricHarness:
    """PSNR + SSIM evaluator (image.py:127-141); LPIPS optional via weights."""

    def __init__(self, lpips_weights_path: Optional[str] = None):
        self.ssim_fn = jax.jit(ssim)
        self.lpips_fn = None
        if lpips_weights_path is not None:
            from nerf_hugs_tpu.metrics import lpips
            self.lpips_fn = lpips.LPIPS.from_weights(lpips_weights_path)

    def __call__(self, rgb_pred, rgb_gt, name_fn=lambda s: s):
        out = {
            name_fn("psnr"): float(mse_to_psnr(((rgb_pred - rgb_gt) ** 2).mean())),
            name_fn("ssim"): float(self.ssim_fn(rgb_pred, rgb_gt)),
        }
        if self.lpips_fn is not None:
            out[name_fn("lpips")] = float(self.lpips_fn(rgb_pred, rgb_gt))
        return out
