"""Elementwise math hardened for TPU.

Behavioral parity targets (reference: MipNeRF360/internal/math.py:21-127):
  * full-precision matmul (XLA defaults MXU passes to bf16 inputs),
  * trig that cannot NaN for huge arguments (TPU sine of large floats NaNs),
  * exp with finite value *and* unclamped gradient for large inputs,
  * log-linear learning-rate schedule with sine warmup,
  * interpolation into sorted tables without gathers (TPU-friendly).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# jnp.sin/cos on TPU lose all precision (and may emit NaN) once |x| is large;
# everything we feed trig is periodic so reduce into a fixed window first.
_TRIG_PERIOD_CAP = 100.0 * jnp.pi


def matmul_hp(a: jax.Array, b: jax.Array) -> jax.Array:
    """Matmul pinned to HIGHEST precision (fp32 accumulation on the MXU)."""
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def _range_reduce(x: jax.Array) -> jax.Array:
    # x % cap itself overflows near float32 max (floor(x/cap)*cap rounds to
    # inf), so sanitize the reduced value; precision is long gone there anyway.
    reduced = x % _TRIG_PERIOD_CAP
    reduced = jnp.where(jnp.isfinite(reduced), reduced, 0.0)
    return jnp.where(jnp.abs(x) < _TRIG_PERIOD_CAP, x, reduced)


def safe_sin(x: jax.Array) -> jax.Array:
    """sin(x) with the argument range-reduced so TPU never NaNs."""
    return jnp.sin(_range_reduce(x))


def safe_cos(x: jax.Array) -> jax.Array:
    """cos(x) with the argument range-reduced so TPU never NaNs."""
    return jnp.cos(_range_reduce(x))


@jax.custom_jvp
def safe_exp(x: jax.Array) -> jax.Array:
    """exp(x) clamped to stay finite in fp32 (exp(89) overflows)."""
    return jnp.exp(jnp.minimum(x, 88.0))


@safe_exp.defjvp
def _safe_exp_jvp(primals, tangents):
    # The clamp above would zero gradients past the knee; instead keep the
    # (large but finite) exp(min(x, 88)) slope so optimization can recover.
    (x,), (dx,) = primals, tangents
    y = safe_exp(x)
    return y, y * dx


def log_lerp(t, v0: float, v1: float):
    """Log-linear interpolation from v0 (t=0) to v1 (t=1); t clipped to [0,1]."""
    if v0 <= 0 or v1 <= 0:
        raise ValueError(f"log_lerp endpoints must be positive, got {v0}, {v1}")
    lv0, lv1 = jnp.log(v0), jnp.log(v1)
    return jnp.exp(jnp.clip(t, 0.0, 1.0) * (lv1 - lv0) + lv0)


def learning_rate_decay(step, lr_init, lr_final, max_steps,
                        lr_delay_steps=0, lr_delay_mult=1.0):
    """Exponential decay from lr_init to lr_final with optional sine warmup.

    Matches MipNeRF360/internal/math.py:57-98: at step 0 the rate is
    lr_init*lr_delay_mult, eased to the log-lerp schedule by lr_delay_steps.
    """
    if lr_delay_steps > 0:
        ease = jnp.sin(0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0))
        delay = lr_delay_mult + (1.0 - lr_delay_mult) * ease
    else:
        delay = 1.0
    return delay * log_lerp(step / max_steps, lr_init, lr_final)


def interp(x, xp, fp):
    """Vectorized jnp.interp over leading dims (gather-based; GPU-flavored)."""
    flat = lambda a: a.reshape(-1, a.shape[-1])
    return jax.vmap(jnp.interp)(flat(x), flat(xp), flat(fp)).reshape(x.shape)


def sorted_interp(x, xp, fp):
    """interp() for sorted x/xp/fp via broadcast compare — no gathers.

    On TPU a dense [..., m, n] compare plus masked max/min beats gather-based
    binary search (reference: math.py:113-127). Both xp and fp must ascend.
    """
    # ge[..., j, i] == (x_i >= xp_j): the last True row per column marks the
    # interval containing x_i.
    ge = x[..., None, :] >= xp[..., :, None]

    def bracket(vals):
        lo = jnp.max(jnp.where(ge, vals[..., None], vals[..., :1, None]), axis=-2)
        hi = jnp.min(jnp.where(~ge, vals[..., None], vals[..., -1:, None]), axis=-2)
        return lo, hi

    fp_lo, fp_hi = bracket(fp)
    xp_lo, xp_hi = bracket(xp)
    frac = jnp.clip(jnp.nan_to_num((x - xp_lo) / (xp_hi - xp_lo), nan=0.0), 0.0, 1.0)
    return fp_lo + frac * (fp_hi - fp_lo)


def clip_gradient_by_norm_and_value(grad_tree, max_norm=None, max_val=None):
    """Clip a gradient pytree by global behavior matching optax semantics."""
    if max_val is not None and max_val > 0:
        grad_tree = jax.tree_util.tree_map(
            lambda g: jnp.clip(g, -max_val, max_val), grad_tree)
    if max_norm is not None and max_norm > 0:
        leaves = jax.tree_util.tree_leaves(grad_tree)
        gnorm = jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in leaves))
        scale = jnp.minimum(1.0, max_norm / jnp.maximum(1e-20, gnorm))
        grad_tree = jax.tree_util.tree_map(lambda g: g * scale, grad_tree)
    return grad_tree
