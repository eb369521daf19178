"""Visualization suite for renders (depth colormaps, ray bundles, mattes).

Parity target: MipNeRF360/internal/vis.py:22-267. Host-side numpy/jnp; used
by the train-time showcase renders and eval image dumps.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import matplotlib

from nerf_hugs_tpu.core import stepfun

_EPS = float(jnp.finfo(jnp.float32).eps)


def weighted_percentile(x, w, ps, assume_sorted=False):
    """Weighted percentiles of one flattened vector."""
    x, w = x.reshape(-1), w.reshape(-1)
    if not assume_sorted:
        order = jnp.argsort(x)
        x, w = x[order], w[order]
    acc_w = jnp.cumsum(w)
    return jnp.interp(jnp.array(ps) * (acc_w[-1] / 100), acc_w, x)


def sinebow(h):
    """Cyclic uniform colormap (basecase.org/env/on-rainbows)."""
    f = lambda x: jnp.sin(jnp.pi * x) ** 2
    return jnp.stack([f(3 / 6 - h), f(5 / 6 - h), f(7 / 6 - h)], -1)


def matte(vis, acc, dark=0.8, light=1.0, width=8):
    """Composite over a checkerboard where accumulation is low."""
    bg_mask = jnp.logical_xor(
        (jnp.arange(acc.shape[0]) % (2 * width) // width)[:, None],
        (jnp.arange(acc.shape[1]) % (2 * width) // width)[None, :])
    bg = jnp.where(bg_mask, light, dark)
    return vis * acc[:, :, None] + (bg * (1 - acc))[:, :, None]


def visualize_cmap(value, weight, colormap, lo=None, hi=None, percentile=99.0,
                   curve_fn=lambda x: x, modulus=None, matte_background=True):
    """Colormap a scalar map normalized by weighted percentiles."""
    lo_auto, hi_auto = weighted_percentile(
        value, weight, [50 - percentile / 2, 50 + percentile / 2])
    lo = lo if lo is not None else (lo_auto - _EPS)
    hi = hi if hi is not None else (hi_auto + _EPS)
    value, lo, hi = [curve_fn(x) for x in [value, lo, hi]]
    if modulus:
        value = jnp.mod(value, modulus) / modulus
    else:
        value = jnp.nan_to_num(
            jnp.clip((value - jnp.minimum(lo, hi)) / jnp.abs(hi - lo), 0, 1))
    if colormap:
        colorized = colormap(value)[:, :, :3]
    else:
        if value.ndim != 3 or value.shape[-1] != 3:
            raise ValueError(f"value must be [h, w, 3], got {value.shape}")
        colorized = value
    return matte(colorized, weight) if matte_background else colorized


def visualize_coord_mod(coords, acc):
    """Position of each termination point within its unit cell."""
    return matte(((coords + 1) % 2) / 2, acc)


def visualize_rays(dist, dist_range, weights, rgbs, accumulate=False,
                   renormalize=False, resolution=2048, bg_color=0.8):
    """Strip chart of per-level ray histograms (vis.py:115-168)."""
    dist_vis = jnp.linspace(*dist_range, resolution + 1)
    vis_rgb, vis_alpha = [], []
    for ds, ws, rs in zip(dist, weights, rgbs):
        level_rs, level_ws = [], []
        for d, w, r in zip(ds, ws, rs):
            if accumulate:
                w_csum = jnp.cumsum(w, axis=0)
                rw_csum = jnp.cumsum(r * w[:, None], axis=0)
                r = (rw_csum + _EPS) / (w_csum[:, None] + 2 * _EPS)
                w = w_csum
            level_rs.append(stepfun.resample(dist_vis, d, r.T, use_avg=True).T)
            level_ws.append(stepfun.resample(dist_vis, d, w.T, use_avg=True).T)
        vis_rgb.append(jnp.stack(level_rs))
        vis_alpha.append(jnp.stack(level_ws))
    vis_rgb = jnp.stack(vis_rgb, axis=1)
    vis_alpha = jnp.stack(vis_alpha, axis=1)

    if renormalize:
        vis_alpha /= jnp.maximum(_EPS, jnp.max(vis_alpha))

    if resolution > vis_rgb.shape[0]:
        rep = resolution // (vis_rgb.shape[0] * vis_rgb.shape[1] + 1)
        stride = rep * vis_rgb.shape[1]
        vis_rgb = jnp.tile(vis_rgb, (1, 1, rep, 1)).reshape(
            (-1,) + vis_rgb.shape[2:])
        vis_alpha = jnp.tile(vis_alpha, (1, 1, rep)).reshape(
            (-1,) + vis_alpha.shape[2:])
        vis_rgb = vis_rgb.reshape((-1, stride) + vis_rgb.shape[1:])
        vis_alpha = vis_alpha.reshape((-1, stride) + vis_alpha.shape[1:])
        vis_rgb = jnp.concatenate(
            [vis_rgb, jnp.zeros_like(vis_rgb[:, :1])], axis=1).reshape(
            (-1,) + vis_rgb.shape[2:])
        vis_alpha = jnp.concatenate(
            [vis_alpha, jnp.zeros_like(vis_alpha[:, :1])], axis=1).reshape(
            (-1,) + vis_alpha.shape[2:])

    vis = vis_rgb * vis_alpha[..., None] + (bg_color * (1 - vis_alpha))[..., None]
    return vis[:-1], vis_alpha[:-1]


def visualize_suite(rendering, rays):
    """Standard channel set: color/acc/depths/coords/ray strips
    (vis.py:170-267) + transient layers when present."""
    depth_curve_fn = lambda x: -jnp.log(x + _EPS)
    rgb, acc = rendering["rgb"], rendering["acc"]
    distance_mean = rendering["distance_mean"]
    distance_median = rendering["distance_median"]
    distance_p5 = rendering["distance_percentile_5"]
    distance_p95 = rendering["distance_percentile_95"]
    acc = jnp.where(jnp.isnan(distance_mean), jnp.zeros_like(acc), acc)

    coords = rays.origins + rays.directions * distance_mean[:, :, None]
    vis_depth_mean, vis_depth_median = [
        visualize_cmap(x, acc, matplotlib.colormaps["turbo"], curve_fn=depth_curve_fn)
        for x in [distance_mean, distance_median]]
    vis_depth_triplet = visualize_cmap(
        jnp.stack([2 * distance_median - distance_p5, distance_median,
                   distance_p95], axis=-1),
        acc, None, curve_fn=lambda x: jnp.log(x + _EPS))

    vis = {
        "color": rgb,
        "acc": acc,
        "color_matte": matte(rgb, acc),
        "depth_mean": vis_depth_mean,
        "depth_median": vis_depth_median,
        "depth_triplet": vis_depth_triplet,
        "coords_mod": visualize_coord_mod(coords, acc),
    }

    if "ray_sdist" in rendering:
        dist = rendering["ray_sdist"]
        weights = rendering["ray_weights"]
        rgbs = [jnp.clip(r, 0, 1) for r in rendering["ray_rgbs"]]
        vis["ray_colors"] = visualize_rays(dist, (0, 1), weights, rgbs)[0]
        sqrt_weights = [jnp.sqrt(w) for w in weights]
        sqrt_ray_weights, ray_alpha = visualize_rays(
            dist, (0, 1), [jnp.ones_like(w) for w in sqrt_weights],
            [w[..., None] for w in sqrt_weights], bg_color=0)
        sqrt_ray_weights = sqrt_ray_weights[..., 0]
        null_color = jnp.array([1.0, 0.0, 0.0])
        vis["ray_weights"] = jnp.where(
            ray_alpha[:, :, None] == 0, null_color[None, None],
            visualize_cmap(sqrt_ray_weights, jnp.ones_like(sqrt_ray_weights),
                           matplotlib.colormaps["gray"], lo=0, hi=1,
                           matte_background=False))

    for key, out_key in [("rgb_cc", "color_corrected"),
                         ("rgb_combined", "color_combined"),
                         ("rgb_static", "color_static"),
                         ("rgb_transient", "color_transient"),
                         ("implicit_mask", "implicit_mask")]:
        if key in rendering:
            vis[out_key] = rendering[key]
    return vis
