"""Property tests for core.stepfun against O(n^2) brute-force references
(the reference repo's highest-value test pattern, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_hugs_tpu.core import stepfun


def brute_inner_outer(t0, t1, y1):
    """O(n*m) per-interval overlap accounting, one ray at a time."""
    inner = np.zeros(len(t0) - 1)
    outer = np.zeros(len(t0) - 1)
    for i in range(len(t0) - 1):
        lo, hi = t0[i], t0[i + 1]
        for j in range(len(t1) - 1):
            jlo, jhi = t1[j], t1[j + 1]
            if jlo >= lo and jhi <= hi:
                inner[i] += y1[j]
            if jhi > lo and jlo < hi:
                outer[i] += y1[j]
    return inner, outer


def test_searchsorted_bracket_property():
    rng = np.random.RandomState(0)
    a = np.sort(rng.uniform(0, 1, (6, 13)), axis=-1).astype(np.float32)
    v = rng.uniform(-0.1, 1.1, (6, 9)).astype(np.float32)
    lo, hi = stepfun.searchsorted(a, v)
    lo, hi = np.asarray(lo), np.asarray(hi)
    for i in range(a.shape[0]):
        for j in range(v.shape[1]):
            x = v[i, j]
            if x < a[i, 0]:
                assert lo[i, j] == 0 and hi[i, j] == 0
            elif x >= a[i, -1]:
                assert lo[i, j] == a.shape[1] - 1 and hi[i, j] == a.shape[1] - 1
            else:
                assert a[i, lo[i, j]] <= x < a[i, hi[i, j]]
                assert hi[i, j] == lo[i, j] + 1


def test_searchsorted_matches_numpy_in_range():
    rng = np.random.RandomState(1)
    a = np.sort(rng.uniform(0, 1, (17,))).astype(np.float32)
    a[0], a[-1] = 0.0, 1.0
    v = rng.uniform(0, 0.999, (33,)).astype(np.float32)
    _, hi = stepfun.searchsorted(a[None], v[None])
    want = np.searchsorted(a, v, side="right")
    np.testing.assert_array_equal(np.asarray(hi)[0], want)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_inner_outer_vs_bruteforce(seed):
    rng = np.random.RandomState(seed)
    t0 = np.sort(rng.uniform(0, 1, 8)).astype(np.float32)
    t1 = np.sort(rng.uniform(0, 1, 11)).astype(np.float32)
    y1 = rng.uniform(0, 1, 10).astype(np.float32)
    inner, outer = stepfun.inner_outer(t0[None], t1[None], y1[None])
    binner, bouter = brute_inner_outer(t0, t1, y1)
    np.testing.assert_allclose(np.asarray(inner)[0], binner, atol=1e-5)
    np.testing.assert_allclose(np.asarray(outer)[0], bouter, atol=1e-5)


def test_inner_outer_sandwich():
    # inner <= resampled-true-mass <= outer for arbitrary step functions.
    rng = np.random.RandomState(7)
    for _ in range(4):
        t0 = np.sort(rng.uniform(0, 1, 9)).astype(np.float32)
        t1 = np.sort(rng.uniform(0, 1, 12)).astype(np.float32)
        y1 = rng.uniform(0, 1, 11).astype(np.float32)
        inner, outer = stepfun.inner_outer(t0[None], t1[None], y1[None])
        true = stepfun.resample(t0[None], t1[None], y1[None])
        assert np.all(np.asarray(inner)[0] <= np.asarray(true)[0] + 1e-5)
        assert np.all(np.asarray(true)[0] <= np.asarray(outer)[0] + 1e-5)


def test_query_step_function():
    t = jnp.array([[0.0, 1.0, 2.0, 3.0]])
    y = jnp.array([[10.0, 20.0, 30.0]])
    tq = jnp.array([[-0.5, 0.5, 1.5, 2.5, 3.5]])
    got = stepfun.query(tq, t, y, outside_value=-1)
    np.testing.assert_allclose(np.asarray(got)[0], [-1, 10, 20, 30, -1])


def test_integrate_weights_endpoints():
    rng = np.random.RandomState(0)
    w = rng.dirichlet(np.ones(16), size=(4,)).astype(np.float32)
    cw = np.asarray(stepfun.integrate_weights(jnp.array(w)))
    assert cw.shape == (4, 17)
    np.testing.assert_allclose(cw[:, 0], 0.0)
    np.testing.assert_allclose(cw[:, -1], 1.0)
    assert np.all(np.diff(cw, axis=-1) >= -1e-6)


def test_sample_deterministic_monotone_and_in_range():
    t = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 17), (5, 17))
    logits = jnp.zeros((5, 16))
    s = stepfun.sample(None, t, logits, 32)
    s = np.asarray(s)
    assert np.all(np.diff(s, axis=-1) >= 0)
    assert s.min() >= 0.0 and s.max() <= 1.0


def test_sample_respects_distribution():
    # All mass in one bin -> every sample lands in that bin.
    t = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 9), (1, 9))
    logits = jnp.full((1, 8), -100.0).at[0, 3].set(100.0)
    key = jax.random.PRNGKey(0)
    s = np.asarray(stepfun.sample(key, t, logits, 64))
    assert np.all(s >= 3 / 8 - 1e-4) and np.all(s <= 4 / 8 + 1e-4)


def test_sample_statistics_uniform():
    # Uniform logits over [0,1) -> sample mean ~= 0.5, spread ~ uniform.
    t = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 33), (256, 33))
    logits = jnp.zeros((256, 32))
    s = np.asarray(stepfun.sample(jax.random.PRNGKey(1), t, logits, 64))
    np.testing.assert_allclose(s.mean(), 0.5, atol=0.01)
    np.testing.assert_allclose(s.var(), 1 / 12, atol=0.01)


def test_gpu_and_tpu_resampling_agree():
    rng = np.random.RandomState(3)
    t = np.sort(rng.uniform(0, 1, (7, 17)), axis=-1).astype(np.float32)
    logits = rng.randn(7, 16).astype(np.float32)
    key = jax.random.PRNGKey(5)
    s_tpu = stepfun.sample(key, t, logits, 24, use_gpu_resampling=False)
    s_gpu = stepfun.sample(key, t, logits, 24, use_gpu_resampling=True)
    np.testing.assert_allclose(np.asarray(s_tpu), np.asarray(s_gpu), atol=1e-4)


def test_sample_intervals_shape_and_monotone():
    t = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 17), (4, 17))
    logits = jnp.zeros((4, 16))
    ti = stepfun.sample_intervals(jax.random.PRNGKey(2), t, logits, 8,
                                  domain=(0.0, 1.0))
    ti = np.asarray(ti)
    assert ti.shape == (4, 9)
    assert np.all(np.diff(ti, axis=-1) >= 0)
    assert ti.min() >= 0.0 and ti.max() <= 1.0


def test_lossfun_distortion_zero_for_point_mass():
    # A single concentrated infinitesimal bin has ~zero distortion.
    t = jnp.array([[0.0, 0.499, 0.501, 1.0]])
    w = jnp.array([[0.0, 1.0, 0.0]])
    loss = float(stepfun.lossfun_distortion(t, w)[0])
    assert loss < 1e-3


def test_lossfun_distortion_matches_monte_carlo():
    rng = np.random.RandomState(0)
    t = np.sort(rng.uniform(0, 1, 9)).astype(np.float32)
    w = rng.dirichlet(np.ones(8)).astype(np.float32)
    got = float(stepfun.lossfun_distortion(t[None], w[None])[0])
    # Monte-Carlo: sample pairs from the step distribution.
    p = w / np.diff(t)
    idx = rng.choice(8, size=200000, p=w)
    x = rng.uniform(t[idx], t[idx + 1])
    idy = rng.choice(8, size=200000, p=w)
    y = rng.uniform(t[idy], t[idy + 1])
    mc = np.abs(x - y).mean()
    np.testing.assert_allclose(got, mc, rtol=0.05)


def test_lossfun_outer_zero_when_enveloped():
    # If the proposal (env) covers the nerf weights, the loss is 0.
    t = jnp.array([[0.0, 0.25, 0.5, 0.75, 1.0]])
    w = jnp.array([[0.1, 0.2, 0.3, 0.2]])
    t_env = jnp.array([[0.0, 0.5, 1.0]])
    w_env = jnp.array([[0.6, 0.8]])
    loss = np.asarray(stepfun.lossfun_outer(t, w, t_env, w_env))
    np.testing.assert_allclose(loss, 0.0, atol=1e-6)


def test_max_dilate_weights_grows_support():
    t = jnp.array([[0.0, 0.4, 0.6, 1.0]])
    w = jnp.array([[0.0, 1.0, 0.0]])
    t_d, w_d = stepfun.max_dilate_weights(t, w, 0.1, domain=(0.0, 1.0))
    t_d, w_d = np.asarray(t_d), np.asarray(w_d)
    # Support should now cover [0.3, 0.7].
    covered = [(t_d[0, i], t_d[0, i + 1]) for i in range(t_d.shape[1] - 1)
               if w_d[0, i] > 0]
    lo = min(c[0] for c in covered)
    hi = max(c[1] for c in covered)
    assert lo <= 0.3 + 1e-5 and hi >= 0.7 - 1e-5


def test_weighted_percentile_median_uniform():
    t = jnp.broadcast_to(jnp.linspace(0.0, 2.0, 17), (3, 17))
    w = jnp.full((3, 16), 1 / 16)
    pct = np.asarray(stepfun.weighted_percentile(t, w, [50]))
    np.testing.assert_allclose(pct[:, 0], 1.0, atol=1e-3)


def test_resample_conserves_mass():
    rng = np.random.RandomState(2)
    tp = np.sort(rng.uniform(0, 1, (3, 13)), axis=-1).astype(np.float32)
    vp = rng.uniform(0, 1, (3, 12)).astype(np.float32)
    # Resampling onto a covering interval set conserves total mass.
    t = np.broadcast_to(np.linspace(-0.5, 1.5, 9, dtype=np.float32), (3, 9))
    v = np.asarray(stepfun.resample(jnp.array(t), tp, vp))
    np.testing.assert_allclose(v.sum(-1), vp.sum(-1), rtol=1e-4)
