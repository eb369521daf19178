"""Step-function (piecewise-constant 1D) toolkit — the sampler core.

Conventions (shared with the models): along the last axis,
  `t` are the (n+1) sorted *endpoints* of a step function,
  `w` are the n bin weights (sum <= 1),
  `p` are bin densities (integrate to <= 1),
  `logits` are unconstrained bin values softmaxed into weights.

Everything here is built for TPU: interval location uses a dense
broadcast-compare (O(m*n) VPU work, zero gathers) rather than binary search,
and inverse-CDF sampling uses the brute-force sorted interp. Parity target:
MipNeRF360/internal/stepfun.py (searchsorted :30-53, sampling :153-263,
dilation :99-128, interlevel envelope :62-86, distortion :266-276).

PROVENANCE: this module implements the step-function math of multinerf
(Apache-2.0, google-research/multinerf internal/stepfun.py), which the
reference vendors unchanged. Bit-compatibility with the reference is a
stated requirement (tests/test_reference_parity.py uses the reference as a
numerical oracle), so where an expression is the unique float-exact
formulation — the stratified-u construction in `sample` (u_max/max_jitter
bounds), the linspace endpoints, the interval reflection in
`sample_intervals` — it is deliberately kept term-for-term identical to the
multinerf original rather than paraphrased into something that drifts by an
ulp. Functions with latitude (searchsorted's counting form, the dilation
mask, distortion's quadratic form) are restructured for TPU cost instead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nerf_hugs_tpu.core import math as nh_math

_EPS = float(jnp.finfo(jnp.float32).eps)


def searchsorted(a, v):
    """Bracketing indices of each v inside sorted a, gather-free.

    Returns (idx_lo, idx_hi) with a[idx_lo] <= v < a[idx_hi]; out-of-range
    queries clamp both indices to the first/last position of a. `v` need not
    be sorted. Same contract as the reference's broadcast-compare
    searchsorted (stepfun.py:30-53) but computed by *counting*: since `a` is
    sorted, the number of endpoints <= v IS the bracketing position, so one
    popcount-style sum over the [..., n, m] mask replaces the reference's
    two where/max/min reductions — same integer outputs, ~2x less VPU work,
    still zero gathers (serialized binary search is the thing to avoid on
    TPU).
    """
    n = a.shape[-1]
    # count[..., j] = #{i : a[i] <= v[j]}, in [0, n].
    count = jnp.sum((v[..., None, :] >= a[..., :, None]).astype(jnp.int32),
                    axis=-2)
    idx_lo = jnp.maximum(count - 1, 0)
    idx_hi = jnp.minimum(count, n - 1)
    return idx_lo, idx_hi


def query(tq, t, y, outside_value=0):
    """Evaluate the step function (t, y) at query points tq."""
    lo, hi = searchsorted(t, tq)
    return jnp.where(lo == hi, outside_value, jnp.take_along_axis(y, lo, axis=-1))


def inner_outer(t0, t1, y1):
    """Inner/outer measures of step fn (t1, y1) resampled onto intervals t0.

    outer >= true mass >= inner for every t0 interval (stepfun.py:62-78).
    """
    cum = jnp.concatenate(
        [jnp.zeros_like(y1[..., :1]), jnp.cumsum(y1, axis=-1)], axis=-1)
    lo, hi = searchsorted(t1, t0)
    cum_lo = jnp.take_along_axis(cum, lo, axis=-1)
    cum_hi = jnp.take_along_axis(cum, hi, axis=-1)
    outer = cum_hi[..., 1:] - cum_lo[..., :-1]
    inner = jnp.where(
        hi[..., :-1] <= lo[..., 1:], cum_lo[..., 1:] - cum_hi[..., :-1], 0)
    return inner, outer


def lossfun_outer(t, w, t_env, w_env, eps=_EPS):
    """Interlevel loss: penalize NeRF mass exceeding the proposal envelope.

    Half-quadratic in (w - w_outer), scaled by 1/w so the gradient stays
    constant as the envelope collapses (stepfun.py:80-86).
    """
    _, w_outer = inner_outer(t, t_env, w_env)
    return jnp.maximum(0, w - w_outer) ** 2 / (w + eps)


def weight_to_pdf(t, w, eps=_EPS**2):
    """Bin weights -> densities (divide by bin width)."""
    return w / jnp.maximum(eps, t[..., 1:] - t[..., :-1])


def pdf_to_weight(t, p):
    """Bin densities -> weights (multiply by bin width)."""
    return p * (t[..., 1:] - t[..., :-1])


def max_dilate(t, w, dilation, domain=(-jnp.inf, jnp.inf)):
    """Max-pool a non-negative step function outward by `dilation`.

    Every input bin [t0, t1) grows to [t0-d, t1+d); the dilated function at a
    point is the max over covering grown bins (stepfun.py:99-115).
    """
    lo = t[..., :-1] - dilation
    hi = t[..., 1:] + dilation
    t_d = jnp.sort(jnp.concatenate([t, lo, hi], axis=-1), axis=-1)
    t_d = jnp.clip(t_d, *domain)
    covered = (lo[..., None, :] <= t_d[..., None]) & (hi[..., None, :] > t_d[..., None])
    w_d = jnp.max(jnp.where(covered, w[..., None, :], 0), axis=-1)[..., :-1]
    return t_d, w_d


def max_dilate_weights(t, w, dilation, domain=(-jnp.inf, jnp.inf),
                       renormalize=False, eps=_EPS**2):
    """Dilate weights in *density* space so mass scales sensibly with width."""
    p = weight_to_pdf(t, w)
    t_d, p_d = max_dilate(t, p, dilation, domain=domain)
    w_d = pdf_to_weight(t_d, p_d)
    if renormalize:
        w_d /= jnp.maximum(eps, jnp.sum(w_d, axis=-1, keepdims=True))
    return t_d, w_d


def integrate_weights(w):
    """CDF endpoints of weights assumed to sum to 1: starts at 0, ends at 1."""
    cdf = jnp.minimum(1, jnp.cumsum(w[..., :-1], axis=-1))
    pad = jnp.zeros(cdf.shape[:-1] + (1,))
    return jnp.concatenate([pad, cdf, jnp.ones_like(pad)], axis=-1)


def invert_cdf(u, t, w_logits, use_gpu_resampling=False):
    """Map u in [0,1) through the inverse CDF of softmax(w_logits) over bins t.

    Rays whose logits are all -inf (every interval zero-width/zero-weight)
    would softmax to NaN; they fall back to a uniform CDF (the torch stack's
    guard, nerfacto/utils/ray_utils.py:143-144).
    """
    all_masked = jnp.all(jnp.isneginf(w_logits), axis=-1, keepdims=True)
    w_logits = jnp.where(all_masked, 1.0, w_logits)
    w = jax.nn.softmax(w_logits, axis=-1)
    cdf = integrate_weights(w)
    interp_fn = nh_math.interp if use_gpu_resampling else nh_math.sorted_interp
    return interp_fn(u, cdf, t)


def sample(rng, t, w_logits, num_samples, single_jitter=False,
           deterministic_center=False, use_gpu_resampling=False):
    """Draw `num_samples` points from the step-function PDF via inverse CDF.

    rng=None gives stratified deterministic samples (linspace of the CDF, or
    interval centers when deterministic_center). With rng, samples are
    stratified-jittered; single_jitter shares one offset per ray
    (stepfun.py:153-229). Samples are ascending by construction.
    """
    if rng is None:
        if deterministic_center:
            pad = 1 / (2 * num_samples)
            u = jnp.linspace(pad, 1.0 - pad - _EPS, num_samples)
        else:
            u = jnp.linspace(0, 1.0 - _EPS, num_samples)
        u = jnp.broadcast_to(u, t.shape[:-1] + (num_samples,))
    else:
        # Stratified: base linspace in [0, 1-u_max] plus jitter < the stratum
        # width, so u stays strictly inside [0, 1).
        u_max = _EPS + (1 - _EPS) / num_samples
        max_jitter = (1 - u_max) / (num_samples - 1) - _EPS
        d = 1 if single_jitter else num_samples
        u = (jnp.linspace(0, 1 - u_max, num_samples) +
             jax.random.uniform(rng, t.shape[:-1] + (d,), maxval=max_jitter))
    return invert_cdf(u, t, w_logits, use_gpu_resampling=use_gpu_resampling)


def sample_intervals(rng, t, w_logits, num_samples, single_jitter=False,
                     domain=(-jnp.inf, jnp.inf), use_gpu_resampling=False):
    """Sample `num_samples` *intervals* whose centers follow the PDF.

    Draws centers, fences them at adjacent midpoints, and reflects the first
    and last midpoints around the end centers, clamped to `domain`
    (stepfun.py:232-263). Returns num_samples+1 sorted endpoints.
    """
    if num_samples <= 1:
        raise ValueError(f"need num_samples > 1, got {num_samples}")
    centers = sample(rng, t, w_logits, num_samples, single_jitter,
                     deterministic_center=True,
                     use_gpu_resampling=use_gpu_resampling)
    mid = 0.5 * (centers[..., 1:] + centers[..., :-1])
    first = jnp.maximum(domain[0], 2 * centers[..., :1] - mid[..., :1])
    last = jnp.minimum(domain[1], 2 * centers[..., -1:] - mid[..., -1:])
    return jnp.concatenate([first, mid, last], axis=-1)


def lossfun_distortion(t, w):
    """Mip-NeRF 360 distortion: iint w_i w_j |t_i - t_j| + self-term.

    Quadratic form over interval midpoints plus the intra-interval term
    (stepfun.py:266-276). O(n^2) but n<=64 so it's VPU noise.
    """
    mids = 0.5 * (t[..., 1:] + t[..., :-1])
    pair = jnp.abs(mids[..., :, None] - mids[..., None, :])
    inter = jnp.sum(w * jnp.sum(w[..., None, :] * pair, axis=-1), axis=-1)
    intra = jnp.sum(w**2 * (t[..., 1:] - t[..., :-1]), axis=-1) / 3
    return inter + intra


def weighted_percentile(t, w, ps):
    """Percentiles `ps` (in [0,100]) of the step-function distribution (t, w)."""
    cdf = integrate_weights(w)
    fn = lambda cw_i, t_i: jnp.interp(jnp.array(ps) / 100, cw_i, t_i)
    out = jax.vmap(fn)(cdf.reshape(-1, cdf.shape[-1]), t.reshape(-1, t.shape[-1]))
    return out.reshape(cdf.shape[:-1] + (len(ps),))


def resample(t, tp, vp, use_avg=False, eps=_EPS):
    """Resample step fn (tp, vp) onto intervals t by mass (or width-average).

    Integrates vp, interps the cumulative integral at t, and differences —
    exact for piecewise-constant inputs (stepfun.py:300-342).
    """
    if use_avg:
        wp = jnp.diff(tp, axis=-1)
        numer = resample(t, tp, vp * wp, use_avg=False)
        denom = resample(t, tp, wp, use_avg=False)
        return numer / jnp.maximum(eps, denom)
    acc = jnp.concatenate(
        [jnp.zeros(vp.shape[:-1] + (1,)), jnp.cumsum(vp, axis=-1)], axis=-1)
    acc_at_t = jnp.vectorize(jnp.interp, signature="(n),(m),(m)->(n)")(t, tp, acc)
    return jnp.diff(acc_at_t, axis=-1)
