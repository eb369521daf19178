"""Coordinate-space warps and positional encodings.

Scene contraction, metric<->normalized ray-distance bijections, Gaussian
propagation through nonlinear warps, and (integrated) positional encodings.
Parity target: MipNeRF360/internal/coord.py:21-147.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nerf_hugs_tpu.core import math as nh_math

_EPS = float(jnp.finfo(jnp.float32).eps)


def contract(x):
    """Mip-NeRF 360 scene contraction (Eq. 10, arxiv 2111.12077).

    Identity inside the unit ball; points outside map to radius 2 - 1/|x|,
    so all of space lands in the radius-2 ball.
    """
    x_mag_sq = jnp.maximum(_EPS, jnp.sum(x**2, axis=-1, keepdims=True))
    scale = (2.0 * jnp.sqrt(x_mag_sq) - 1.0) / x_mag_sq
    return jnp.where(x_mag_sq <= 1.0, x, scale * x)


def inv_contract(z):
    """Inverse of contract(); valid for |z| < 2."""
    z_mag_sq = jnp.maximum(_EPS, jnp.sum(z**2, axis=-1, keepdims=True))
    return jnp.where(z_mag_sq <= 1.0, z, z / (2.0 * jnp.sqrt(z_mag_sq) - z_mag_sq))


def track_linearize(fn, mean, cov):
    """Push a Gaussian (mean, full cov) through fn by linearizing at the mean.

    Cov transforms as J cov J^T with J = dfn/dx at mean; jax.linearize gives
    the JVP once and vmapping it over the covariance columns builds the
    product without materializing J (coord.py:39-60).
    """
    if len(mean.shape) + 1 != len(cov.shape):
        raise ValueError("track_linearize needs a full (non-diagonal) covariance")
    fn_mean, jvp = jax.linearize(fn, mean)
    fn_cov = jax.vmap(jvp, -1, -2)(jax.vmap(jvp, -1, -2)(cov))
    return fn_mean, fn_cov


def construct_ray_warps(fn, t_near, t_far):
    """Bijection between metric distance t and normalized s in [0, 1].

    fn in {None (linear), 'piecewise', jnp.reciprocal, jnp.log, jnp.exp,
    jnp.sqrt, jnp.square}. 'piecewise' is linear below t=1 and 1/x above,
    which tolerates t_near = 0 (coord.py:63-99).
    """
    if fn is None:
        fwd, inv = (lambda x: x), (lambda x: x)
    elif fn == "piecewise":
        fwd = lambda x: jnp.where(x < 1, 0.5 * x, 1 - 0.5 / x)
        inv = lambda x: jnp.where(x < 0.5, 2 * x, 0.5 / (1 - x))
    else:
        inverses = {
            "reciprocal": jnp.reciprocal,
            "log": jnp.exp,
            "exp": jnp.log,
            "sqrt": jnp.square,
            "square": jnp.sqrt,
        }
        fwd, inv = fn, inverses[fn.__name__]
    s_near, s_far = fwd(t_near), fwd(t_far)
    t_to_s = lambda t: (fwd(t) - s_near) / (s_far - s_near)
    s_to_t = lambda s: inv(s * s_far + (1 - s) * s_near)
    return t_to_s, s_to_t


def expected_sin(mean, var):
    """E[sin(x)] for x ~ N(mean, var): damped sine, ->0 as var grows."""
    return jnp.exp(-0.5 * var) * nh_math.safe_sin(mean)


def integrated_pos_enc(mean, var, min_deg, max_deg):
    """IPE: expected sinusoid features of a diagonal Gaussian (coord.py:105-126).

    Frequencies 2^[min_deg, max_deg); cos realized as sin(x + pi/2) so one
    safe_sin covers both. Output dim = 2 * d * (max_deg - min_deg).

    The exp(-0.5*var) damping is computed ONCE and tiled over the sin/cos
    halves instead of exp-ing a duplicated [sv, sv] concat — elementwise exp
    of identical values, so the outputs are bit-identical to the reference
    formulation while dropping a quarter of the transcendental work on the
    eval/train hot path (the IPE dominates the flagship's non-matmul time).
    """
    scales = 2.0 ** jnp.arange(min_deg, max_deg)
    shape = mean.shape[:-1] + (-1,)
    sm = jnp.reshape(mean[..., None, :] * scales[:, None], shape)
    sv = jnp.reshape(var[..., None, :] * scales[:, None] ** 2, shape)
    damp = jnp.exp(-0.5 * sv)
    return (jnp.concatenate([damp, damp], axis=-1)
            * nh_math.safe_sin(
                jnp.concatenate([sm, sm + 0.5 * jnp.pi], axis=-1)))


def lift_and_diagonalize(mean, cov, basis):
    """Project mean/cov onto basis columns, keeping only the diagonal cov."""
    out_mean = nh_math.matmul_hp(mean, basis)
    out_var = jnp.sum(basis * nh_math.matmul_hp(cov, basis), axis=-2)
    return out_mean, out_var


def pos_enc(x, min_deg, max_deg, append_identity=True):
    """Classic NeRF positional encoding with frequencies 2^[min_deg, max_deg)."""
    scales = 2.0 ** jnp.arange(min_deg, max_deg)
    shape = x.shape[:-1] + (-1,)
    sx = jnp.reshape(x[..., None, :] * scales[:, None], shape)
    feats = jnp.sin(jnp.concatenate([sx, sx + 0.5 * jnp.pi], axis=-1))
    if append_identity:
        return jnp.concatenate([x, feats], axis=-1)
    return feats
