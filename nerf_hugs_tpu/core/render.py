"""Volumetric rendering math: frustum Gaussians and alpha compositing.

Parity target: MipNeRF360/internal/render.py (cone/cylinder moments :44-100,
cast_rays :103-127, alpha weights :130-182, compositing :185-273).
"""

from __future__ import annotations

import jax.numpy as jnp

from nerf_hugs_tpu.core import stepfun

_EPS = float(jnp.finfo(jnp.float32).eps)


def lift_gaussian(d, t_mean, t_var, r_var, diag):
    """Turn 1D along-ray moments into a 3D Gaussian for ray direction d.

    Splits the covariance into an along-d part (t_var) and an isotropic
    perpendicular part (r_var); `d` need not be normalized.
    """
    t_mean, t_var, r_var = (jnp.asarray(v) for v in (t_mean, t_var, r_var))
    mean = d[..., None, :] * t_mean[..., None]
    d_mag_sq = jnp.maximum(1e-10, jnp.sum(d**2, axis=-1, keepdims=True))
    if diag:
        d_outer_diag = d**2
        null_outer_diag = 1.0 - d_outer_diag / d_mag_sq
        cov_diag = (t_var[..., None] * d_outer_diag[..., None, :]
                    + r_var[..., None] * null_outer_diag[..., None, :])
        return mean, cov_diag
    d_outer = d[..., :, None] * d[..., None, :]
    null_outer = jnp.eye(d.shape[-1]) - d[..., :, None] * (d / d_mag_sq)[..., None, :]
    cov = (t_var[..., None, None] * d_outer[..., None, :, :]
           + r_var[..., None, None] * null_outer[..., None, :, :])
    return mean, cov


def conical_frustum_to_gaussian(d, t0, t1, base_radius, diag, stable=True):
    """Moments of a conical frustum (mip-NeRF Eq. 7, arxiv 2103.13415).

    `base_radius` is the cone radius at distance 1. stable=True uses the
    reparameterized (mu, halfwidth) form; the naive power form (Eqs. 37-39)
    catastrophically cancels in fp32.
    """
    if stable:
        mu = (t0 + t1) / 2
        hw = (t1 - t0) / 2
        denom = jnp.maximum(_EPS, 3 * mu**2 + hw**2)
        t_mean = mu + (2 * mu * hw**2) / denom
        t_var = hw**2 / 3 - (4 / 15) * hw**4 * (12 * mu**2 - hw**2) / denom**2
        r_var = mu**2 / 4 + (5 / 12) * hw**2 - (4 / 15) * hw**4 / denom
    else:
        t_mean = 3 * (t1**4 - t0**4) / (4 * (t1**3 - t0**3))
        r_var = (3 / 20) * (t1**5 - t0**5) / (t1**3 - t0**3)
        t_mosq = (3 / 5) * (t1**5 - t0**5) / (t1**3 - t0**3)
        t_var = t_mosq - t_mean**2
    return lift_gaussian(d, t_mean, t_var, r_var * base_radius**2, diag)


def cylinder_to_gaussian(d, t0, t1, radius, diag):
    """Moments of a cylinder segment along the ray (exact)."""
    t_mean = (t0 + t1) / 2
    t_var = (t1 - t0) ** 2 / 12
    r_var = radius**2 / 4
    return lift_gaussian(d, t_mean, t_var, r_var, diag)


def cast_rays(tdist, origins, directions, radii, ray_shape, diag=True):
    """Featurize ray sections [tdist_i, tdist_{i+1}) as Gaussians.

    Returns (means, covs) with means shifted by ray origins
    (render.py:103-127).
    """
    t0, t1 = tdist[..., :-1], tdist[..., 1:]
    if ray_shape == "cone":
        gaussian_fn = conical_frustum_to_gaussian
    elif ray_shape == "cylinder":
        gaussian_fn = cylinder_to_gaussian
    else:
        raise ValueError(f"ray_shape must be 'cone' or 'cylinder', got {ray_shape}")
    means, covs = gaussian_fn(directions, t0, t1, radii, diag)
    return means + origins[..., None, :], covs


def compute_alpha_weights(density, tdist, dirs, opaque_background=False,
                          cumulative_from_first=False):
    """Density -> compositing weights via transmittance (render.py:130-151).

    weights_i = alpha_i * T_i with T the exclusive cumulative transmittance.
    opaque_background makes the last interval infinitely wide so acc == 1.
    cumulative_from_first reproduces the torch reference's delta quirk
    (ray_utils.py:231: bins[1:] - bins[:1] — every interval measured from
    the first bin); released nerfacto/vanilla checkpoints were trained
    under it, so faithful renders of imported weights need it
    (config.nerfacto.legacy_cumulative_deltas).
    """
    lo = tdist[..., :1] if cumulative_from_first else tdist[..., :-1]
    delta = (tdist[..., 1:] - lo) * jnp.linalg.norm(
        dirs[..., None, :], axis=-1)
    density_delta = density * delta
    if opaque_background:
        density_delta = jnp.concatenate(
            [density_delta[..., :-1],
             jnp.full_like(density_delta[..., -1:], jnp.inf)], axis=-1)
    alpha = 1.0 - jnp.exp(-density_delta)
    trans = jnp.exp(-jnp.concatenate(
        [jnp.zeros_like(density_delta[..., :1]),
         jnp.cumsum(density_delta[..., :-1], axis=-1)], axis=-1))
    return alpha * trans, alpha, trans


def compute_dual_alpha_weights(density_s, density_t, tdist, dirs,
                               opaque_background=False,
                               cumulative_from_first=False):
    """NeRF-W static+transient compositing (render.py:154-182).

    Shared transmittance from the summed density; per-component alphas give
    (weights_static, weights_transient, weights_combined).
    cumulative_from_first: see compute_alpha_weights (the torch reference's
    dual_density_to_weight shares the same delta quirk).
    """
    lo = tdist[..., :1] if cumulative_from_first else tdist[..., :-1]
    delta = (tdist[..., 1:] - lo) * jnp.linalg.norm(
        dirs[..., None, :], axis=-1)
    dd_s, dd_t = density_s * delta, density_t * delta
    dd_sum = (density_s + density_t) * delta
    if opaque_background:
        inf_tail = lambda x: jnp.concatenate(
            [x[..., :-1], jnp.full_like(x[..., -1:], jnp.inf)], axis=-1)
        dd_s, dd_t, dd_sum = inf_tail(dd_s), inf_tail(dd_t), inf_tail(dd_sum)
    trans = jnp.exp(-jnp.concatenate(
        [jnp.zeros_like(dd_sum[..., :1]),
         jnp.cumsum(dd_sum[..., :-1], axis=-1)], axis=-1))
    w_s = (1.0 - jnp.exp(-dd_s)) * trans
    w_t = (1.0 - jnp.exp(-dd_t)) * trans
    w = (1.0 - jnp.exp(-dd_sum)) * trans
    return w_s, w_t, w


def volumetric_rendering(rgbs, weights, tdist, bg_rgbs, t_far, compute_extras,
                         extras=None):
    """Alpha-composite colors and (optionally) depth statistics.

    Returns a dict with 'rgb' always; with compute_extras also 'acc', any
    composited `extras` channels, log-space 'distance_mean' and weighted
    distance percentiles 5/50/95 (render.py:185-244).
    """
    rendering = {}
    acc = weights.sum(axis=-1)
    bg_w = jnp.maximum(0, 1 - acc[..., None])
    rendering["rgb"] = (weights[..., None] * rgbs).sum(axis=-2) + bg_w * bg_rgbs

    if compute_extras:
        rendering["acc"] = acc
        if extras is not None:
            for key, val in extras.items():
                if val is not None:
                    rendering[key] = (weights[..., None] * val).sum(axis=-2)
        expectation = lambda x: (weights * x).sum(axis=-1) / jnp.maximum(_EPS, acc)
        t_mids = 0.5 * (tdist[..., :-1] + tdist[..., 1:])
        rendering["distance_mean"] = jnp.clip(
            jnp.nan_to_num(jnp.exp(expectation(jnp.log(t_mids))), nan=jnp.inf),
            tdist[..., 0], tdist[..., -1])
        # Percentiles need a proper distribution: append the leftover
        # background mass on a far-plane fencepost so weights sum to 1.
        t_aug = jnp.concatenate([tdist, t_far], axis=-1)
        w_aug = jnp.concatenate([weights, bg_w], axis=-1)
        ps = [5, 50, 95]
        pct = stepfun.weighted_percentile(t_aug, w_aug, ps)
        for i, p in enumerate(ps):
            name = "median" if p == 50 else f"percentile_{p}"
            rendering[f"distance_{name}"] = pct[..., i]
    return rendering


def composite_combined_color(rgbs_static, rgbs_transient, bg_rgbs,
                             weights_static, weights_transient,
                             weights_combined):
    """Composite static + transient colors over a shared transmittance.

    Returns (rgb_combined, rgb_static_part, rgb_transient_part)
    (render.py:246-273).
    """
    acc = weights_combined.sum(axis=-1)
    bg_w = jnp.maximum(0, 1 - acc[..., None])
    rgb_s = (weights_static[..., None] * rgbs_static).sum(axis=-2)
    rgb_t = (weights_transient[..., None] * rgbs_transient).sum(axis=-2)
    return rgb_s + rgb_t + bg_w * bg_rgbs, rgb_s, rgb_t
