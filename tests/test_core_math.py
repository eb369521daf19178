"""Property tests for core.math (modeled on MipNeRF360/tests/math_test.py style:
brute-force / numpy references, no mocks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_hugs_tpu.core import math as nh_math


def test_safe_trig_matches_numpy_in_range():
    x = np.linspace(-50, 50, 1001).astype(np.float32)
    np.testing.assert_allclose(nh_math.safe_sin(x), np.sin(x), atol=1e-5)
    np.testing.assert_allclose(nh_math.safe_cos(x), np.cos(x), atol=1e-5)


def test_safe_trig_finite_for_huge_inputs():
    x = jnp.array([1e10, -1e12, 1e20, jnp.finfo(jnp.float32).max])
    assert np.all(np.isfinite(nh_math.safe_sin(x)))
    assert np.all(np.isfinite(nh_math.safe_cos(x)))


def test_safe_exp_value_and_grad_finite():
    x = jnp.array([-10.0, 0.0, 50.0, 88.0, 200.0, 1e6])
    y = nh_math.safe_exp(x)
    assert np.all(np.isfinite(y))
    g = jax.vmap(jax.grad(nh_math.safe_exp))(x)
    assert np.all(np.isfinite(g))
    # Below the clamp, gradient equals the value (d/dx e^x = e^x).
    np.testing.assert_allclose(g[:3], y[:3], rtol=1e-6)
    # Above the clamp the gradient stays at exp(88), not zero.
    assert np.all(g[3:] > 0)


def test_learning_rate_decay_endpoints():
    lr0 = nh_math.learning_rate_decay(0, 1e-2, 1e-4, 1000)
    lr_end = nh_math.learning_rate_decay(1000, 1e-2, 1e-4, 1000)
    np.testing.assert_allclose(lr0, 1e-2, rtol=1e-4)
    np.testing.assert_allclose(lr_end, 1e-4, rtol=1e-4)
    # Midpoint is the geometric mean (log-linear interpolation).
    lr_mid = nh_math.learning_rate_decay(500, 1e-2, 1e-4, 1000)
    np.testing.assert_allclose(lr_mid, 1e-3, rtol=1e-4)


def test_learning_rate_decay_warmup():
    lr0 = nh_math.learning_rate_decay(0, 1e-2, 1e-4, 1000,
                                      lr_delay_steps=100, lr_delay_mult=0.1)
    np.testing.assert_allclose(lr0, 1e-3, rtol=1e-4)  # lr_init * delay_mult
    lr100 = nh_math.learning_rate_decay(100, 1e-2, 1e-4, 1000,
                                        lr_delay_steps=100, lr_delay_mult=0.1)
    expected = nh_math.learning_rate_decay(100, 1e-2, 1e-4, 1000)
    np.testing.assert_allclose(lr100, expected, rtol=1e-4)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_sorted_interp_matches_numpy(seed):
    rng = np.random.RandomState(seed)
    n_rays, m, n = 8, 17, 9
    xp = np.sort(rng.uniform(-1, 1, (n_rays, m)), axis=-1).astype(np.float32)
    fp = np.sort(rng.uniform(-1, 1, (n_rays, m)), axis=-1).astype(np.float32)
    x = np.sort(rng.uniform(-1.2, 1.2, (n_rays, n)), axis=-1).astype(np.float32)
    got = np.asarray(nh_math.sorted_interp(x, xp, fp))
    want = np.stack([np.interp(x[i], xp[i], fp[i]) for i in range(n_rays)])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_interp_matches_numpy():
    rng = np.random.RandomState(0)
    xp = np.sort(rng.uniform(0, 1, (4, 11)), axis=-1).astype(np.float32)
    fp = rng.uniform(-1, 1, (4, 11)).astype(np.float32)
    x = rng.uniform(0, 1, (4, 7)).astype(np.float32)
    got = np.asarray(nh_math.interp(x, xp, fp))
    want = np.stack([np.interp(x[i], xp[i], fp[i]) for i in range(4)])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_matmul_hp_precision():
    a = jnp.ones((64, 64), jnp.float32) * (1 + 1e-6)
    b = jnp.eye(64, dtype=jnp.float32)
    out = nh_math.matmul_hp(a, b)
    np.testing.assert_allclose(out, np.asarray(a), rtol=1e-7)
