"""The transient-handling loss zoo + mip-NeRF 360 regularizers.

Five data-loss modes dispatched on config.transient_type (parity:
MipNeRF360/internal/train_utils.py:72-348):
  base       plain mse/charbonnier, lossmult-weighted
  withmask   HuGS static mask -> lossmult = mask + (1-mask)*w  [the reference's
             dead first assignment at train_utils.py:81 is dropped; effective
             behavior preserved]
  robustnerf three OR-ed inlier criteria over 16x16 patches with a
             quantile-tracked threshold carried across steps
  nerfw      combined static+transient rgb / (2 beta^2) + log beta + transient
             density penalty
  hanerf     (1-implicit_mask) * loss + exp-decayed mask-size regularizer
plus interlevel (proposal envelope) and distortion losses.

All losses are jit-safe: fixed shapes, no data-dependent python control flow.
"""

from __future__ import annotations

import collections
from typing import Any, Dict

import jax
import jax.numpy as jnp

from nerf_hugs_tpu.core import stepfun


def _per_level_data_loss(resid_sq, config):
    if config.data_loss_type == "mse":
        return resid_sq
    if config.data_loss_type == "charb":
        return jnp.sqrt(resid_sq + config.charb_padding**2)
    raise ValueError(f"unknown data_loss_type {config.data_loss_type!r}")


def _combine_levels(data_losses, config):
    data_losses = jnp.array(data_losses)
    return (config.data_coarse_loss_mult * jnp.sum(data_losses[:-1]) +
            config.data_loss_mult * data_losses[-1])


def target_rgb(batch, rendering):
    """Ground-truth rgb for a loss term. RGBA targets (the nerfacto dialect
    keeps blender/kubric alpha channels, nerfacto/datasets/blender.py:98)
    are composited against the SAME per-ray background the model rendered
    over (rendering['bg_rgb']) — reference nerfacto/datasets/base.py:221-224
    does this in the dataloader with the batch's bg_rgb."""
    rgb = batch.rgb
    if rgb.shape[-1] == 4:
        alpha = rgb[..., 3:]
        return rgb[..., :3] * alpha + rendering["bg_rgb"] * (1.0 - alpha)
    return rgb[..., :3]


def compute_data_loss(batch, rays, renderings, config, use_static_mask):
    """Weighted mse/charb over all levels; withmask folds the HuGS mask into
    the per-ray weight (train_utils.py:72-111)."""
    data_losses = []
    stats = collections.defaultdict(list)
    static_mask = (rays.static_mask >= 0.5).astype(batch.rgb.dtype)

    for rendering in renderings:
        if use_static_mask:
            lossmult = (static_mask +
                        (1 - static_mask) * config.withmask_transient_weight)
        else:
            lossmult = rays.lossmult
            if config.disable_multiscale_loss:
                lossmult = jnp.ones_like(lossmult)
        lossmult = jnp.broadcast_to(lossmult, batch.rgb[..., :3].shape)

        resid_sq = (rendering["rgb"] - target_rgb(batch, rendering)) ** 2
        denom = jnp.maximum(lossmult.sum(), jnp.finfo(lossmult.dtype).eps)
        stats["mses"].append((lossmult * resid_sq).sum() / denom)
        data_loss = _per_level_data_loss(resid_sq, config)
        data_losses.append((lossmult * data_loss).sum() / denom)

    losses = {"data": _combine_levels(data_losses, config)}
    return losses, {k: jnp.array(v) for k, v in stats.items()}


def _inner_patch_mask(inner, outer, dtype=jnp.float32):
    """[1, outer, outer, 1] mask, 1 on the centered inner x inner square."""
    lo = (outer - inner) // 2
    hi = outer - inner - lo
    return jnp.pad(jnp.ones((1, inner, inner, 1), dtype),
                   ((0, 0), (lo, hi), (lo, hi), (0, 0)))


def _box_mean_nhwc(x, size: int):
    """SAME zero-padded box filter over the two spatial dims of [n,h,w,1].

    reduce_window works on NHWC directly — no layout gymnastics — and zero
    padding matches a SAME conv, so values are identical to a box conv."""
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, window_dimensions=(1, size, size, 1),
        window_strides=(1, 1, 1, 1), padding="SAME")
    return summed / (size * size)


def robustnerf_mask(errors, inlier_threshold, config):
    """RobustNeRF inlier mask over [n, p, p, c] patch errors.

    Math per the RobustNeRF paper (sec. 4; the reference applies it at
    train_utils.py:251-348). A pixel keeps its loss if ANY of:
      (a) its channel-mean error beats the threshold carried from previous
          steps ("trimmed" per-pixel test),
      (b) at least q_s of its fxf neighborhood passes (a),
      (c) it lies in the centered inner patch and at least q_p of the whole
          patch passes (a).
    Returns (mask, stats); stats['inlier_threshold'] is the NEXT step's
    threshold — the running batch quantile of current errors.
    """
    if config.robustnerf_inner_patch_size > config.patch_size:
        raise ValueError("robustnerf_inner_patch_size must be <= patch_size")
    dtype = errors.dtype
    pixel_err = jnp.mean(errors, axis=-1, keepdims=True)     # [n, p, p, 1]

    # (a) per-pixel trim against the carried threshold.
    inlier = (pixel_err < inlier_threshold).astype(dtype)

    # (b) neighborhood vote: fraction of the fxf window that passed (a).
    frac = _box_mean_nhwc(inlier, config.robustnerf_smoothed_filter_size)
    neighbor_ok = frac > 1 - config.robustnerf_smoothed_inlier_quantile

    # (c) whole-patch vote, restricted to the centered inner square.
    patch_frac = jnp.mean(inlier, axis=(1, 2), keepdims=True)  # [n,1,1,1]
    patch_ok = ((patch_frac
                 > 1 - config.robustnerf_inner_patch_inlier_quantile)
                & (_inner_patch_mask(config.robustnerf_inner_patch_size,
                                     config.patch_size, dtype) > 0))

    mask = ((inlier > 0) | neighbor_ok | patch_ok).astype(dtype)
    stats = {
        "inlier_threshold": jnp.quantile(
            pixel_err, config.robustnerf_inlier_quantile),
        "is_inlier_loss": jnp.mean(inlier),
        "has_inlier_neighbors": jnp.mean(neighbor_ok.astype(dtype)),
        "is_inlier_patch": jnp.mean(patch_ok.astype(dtype)),
        "mask": jnp.mean(mask),
    }
    return mask, stats


def compute_robustnerf_loss(batch, renderings, inlier_thresholds, config):
    """Per-level robust data loss; errors reshaped to [n, p, p, 3] patches
    (train_utils.py:114-147). inlier_thresholds: [num_levels] carried state."""
    p = config.patch_size
    data_losses = []
    stats = collections.defaultdict(list)
    for i, rendering in enumerate(renderings):
        resid_sq = (rendering["rgb"] - target_rgb(batch, rendering)) ** 2
        data_loss = _per_level_data_loss(resid_sq, config)

        errors = jax.lax.stop_gradient(
            jnp.sqrt(resid_sq)).reshape(-1, p, p, 3)
        mask, robust_stats = robustnerf_mask(errors, inlier_thresholds[i],
                                             config)
        mask = jax.lax.stop_gradient(mask)
        for key, val in robust_stats.items():
            stats[f"robust_{key}"].append(val)

        lossmult = jnp.broadcast_to(mask.reshape(resid_sq.shape[:-1] + (1,)),
                                    data_loss.shape)
        denom = jnp.maximum(lossmult.sum(), jnp.finfo(lossmult.dtype).eps)
        stats["mses"].append((lossmult * resid_sq).sum() / denom)
        data_losses.append((lossmult * data_loss).sum() / denom)

    losses = {"data": _combine_levels(data_losses, config)}
    return losses, {k: jnp.array(v) for k, v in stats.items()}


def compute_nerfw_loss(batch, renderings, ray_history, config):
    """NeRF-W: residual/(2 beta^2) on the combined color at the final level,
    log-beta + transient-density penalties (train_utils.py:150-183)."""
    data_losses = []
    stats = collections.defaultdict(list)
    losses: Dict[str, Any] = {}
    beta = renderings[-1]["uncertainty"]
    density_t = ray_history[-1]["density_transient"]

    for i, rendering in enumerate(renderings):
        pred = rendering.get("rgb_combined", rendering["rgb"])
        resid_sq = (pred - target_rgb(batch, rendering)) ** 2
        data_loss = _per_level_data_loss(resid_sq, config)
        if i == len(renderings) - 1:
            losses["beta"] = (config.nerfw_beta_loss_mult *
                              jnp.log(beta).mean() + config.nerfw_beta_loss_bias)
            data_loss = data_loss / (2 * beta**2)
            losses["density"] = config.nerfw_density_loss_mult * density_t.mean()
        data_losses.append(data_loss.mean())
        stats["mses"].append(resid_sq.mean())

    losses["data"] = _combine_levels(data_losses, config)
    return losses, {k: jnp.array(v) for k, v in stats.items()}


def compute_hanerf_loss(batch, renderings, train_frac, config):
    """HA-NeRF: implicit-mask-downweighted loss with an exponentially decayed
    mask-size penalty (train_utils.py:186-225). Coarse levels use the
    stop-gradded mask so only the final level trains the mask."""
    data_losses = []
    stats = collections.defaultdict(list)
    losses: Dict[str, Any] = {}

    mask_mult = jnp.maximum(
        config.hanerf_mask_size_loss_mult_min,
        config.hanerf_mask_size_loss_mult_max *
        jnp.exp(-train_frac * config.max_steps *
                config.hanerf_mask_size_loss_mult_k))
    implicit_mask = renderings[-1]["implicit_mask"]
    stats["implicit_mask"].append(implicit_mask.mean())

    for i, rendering in enumerate(renderings):
        resid_sq = (rendering["rgb"] - target_rgb(batch, rendering)) ** 2
        data_loss = _per_level_data_loss(resid_sq, config)
        if i == len(renderings) - 1:
            data_loss = (1.0 - implicit_mask) * data_loss
            losses["mask_size"] = mask_mult * (implicit_mask**2).mean()
        else:
            data_loss = (1.0 - jax.lax.stop_gradient(implicit_mask)) * data_loss
        data_losses.append(data_loss.mean())
        stats["mses"].append(resid_sq.mean())

    losses["data"] = _combine_levels(data_losses, config)
    return losses, {k: jnp.array(v) for k, v in stats.items()}


def interlevel_loss(ray_history, config):
    """Proposal-envelope loss; NeRF-level histogram is stop-gradded so only
    the proposals move (train_utils.py:228-239)."""
    c = jax.lax.stop_gradient(ray_history[-1]["sdist"])
    w = jax.lax.stop_gradient(ray_history[-1]["weights"])
    loss = 0.0
    for ray_results in ray_history[:-1]:
        loss += jnp.mean(stepfun.lossfun_outer(
            c, w, ray_results["sdist"], ray_results["weights"]))
    return config.interlevel_loss_mult * loss


def distortion_loss(ray_history, config):
    """Mip-NeRF 360 distortion on the final level (train_utils.py:242-248)."""
    return config.distortion_loss_mult * jnp.mean(
        stepfun.lossfun_distortion(ray_history[-1]["sdist"],
                                   ray_history[-1]["weights"]))
