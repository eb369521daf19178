"""SSIM in pure jnp, matching the TF/dm_pix defaults the reference scores with.

Wang et al. 2004 with an 11x11 Gaussian window (sigma 1.5), k1=0.01, k2=0.03,
VALID padding, mean over space and channels — the convention of
tf.image.ssim and dm_pix.ssim (reference: MipNeRF360/internal/image.py:131,
metrics.py:30-34 via torchmetrics with gaussian_kernel=True).

The filter is separable: two 1-D depthwise convolutions instead of one 2-D,
which XLA maps onto the TPU's convolution units efficiently.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _gaussian_kernel(filter_size: int, sigma: float) -> np.ndarray:
    offsets = np.arange(filter_size, dtype=np.float64) - (filter_size - 1) / 2
    g = np.exp(-0.5 * (offsets / sigma) ** 2)
    return (g / g.sum()).astype(np.float32)


def _filter2d(img, kernel1d):
    """Separable VALID-padded Gaussian blur over the two leading spatial dims.

    img: [H, W, C]. Returns [H-f+1, W-f+1, C].
    """
    f = kernel1d.shape[0]
    # Convolve rows then columns via dot products over unfolded windows:
    # jnp.convolve-style via cumulative approach would be messier; use
    # conv_general_dilated with feature_group_count=C (depthwise).
    import jax.lax as lax
    c = img.shape[-1]
    x = img[None].transpose(0, 3, 1, 2)  # NCHW
    krow = jnp.asarray(kernel1d).reshape(1, 1, f, 1)
    kcol = jnp.asarray(kernel1d).reshape(1, 1, 1, f)
    krow = jnp.tile(krow, (c, 1, 1, 1))
    kcol = jnp.tile(kcol, (c, 1, 1, 1))
    dn = lax.conv_dimension_numbers(x.shape, krow.shape, ("NCHW", "OIHW", "NCHW"))
    # precision must be pinned: this platform's default conv/matmul precision
    # is bf16-like, and the sigma = E[x^2] - mu^2 cancellation downstream
    # amplifies the rounding into SSIM values > 1 on smooth regions
    # (observed 1.02 on TPU in-train eval; CPU runs fp32 and never sees it).
    x = lax.conv_general_dilated(x, krow, (1, 1), "VALID",
                                 dimension_numbers=dn, feature_group_count=c,
                                 precision=lax.Precision.HIGHEST)
    x = lax.conv_general_dilated(x, kcol, (1, 1), "VALID",
                                 dimension_numbers=dn, feature_group_count=c,
                                 precision=lax.Precision.HIGHEST)
    return x[0].transpose(1, 2, 0)


def ssim(img0, img1, max_val: float = 1.0, filter_size: int = 11,
         filter_sigma: float = 1.5, k1: float = 0.01, k2: float = 0.03,
         return_map: bool = False):
    """SSIM between two [H, W, C] images in [0, max_val]."""
    img0 = jnp.asarray(img0, jnp.float32)
    img1 = jnp.asarray(img1, jnp.float32)
    if img0.ndim == 2:
        img0, img1 = img0[..., None], img1[..., None]
    kernel = _gaussian_kernel(filter_size, filter_sigma)

    mu0 = _filter2d(img0, kernel)
    mu1 = _filter2d(img1, kernel)
    mu00, mu11, mu01 = mu0 * mu0, mu1 * mu1, mu0 * mu1
    sigma00 = _filter2d(img0 * img0, kernel) - mu00
    sigma11 = _filter2d(img1 * img1, kernel) - mu11
    sigma01 = _filter2d(img0 * img1, kernel) - mu01

    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    numer = (2 * mu01 + c1) * (2 * sigma01 + c2)
    denom = (mu00 + mu11 + c1) * (sigma00 + sigma11 + c2)
    ssim_map = numer / denom
    return ssim_map if return_map else jnp.mean(ssim_map)
