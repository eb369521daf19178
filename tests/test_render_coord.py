"""Tests for core.render (Monte-Carlo frustum moments) and core.coord."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_hugs_tpu.core import coord, render


def sample_conical_frustum(rng, d, t0, t1, base_radius, n=200000):
    """Uniformly sample points in a conical frustum (density per volume)."""
    # Sample t with pdf ∝ t^2 (cone cross-section area grows as t^2).
    u = rng.uniform(t0**3, t1**3, n)
    t = u ** (1 / 3)
    r = base_radius * t * np.sqrt(rng.uniform(0, 1, n))
    theta = rng.uniform(0, 2 * np.pi, n)
    d = np.asarray(d, dtype=np.float64)
    d_norm = d / np.linalg.norm(d)
    # Build an orthonormal frame around d.
    up = np.array([0.0, 0.0, 1.0]) if abs(d_norm[2]) < 0.9 else np.array([1.0, 0, 0])
    u1 = np.cross(d_norm, up); u1 /= np.linalg.norm(u1)
    u2 = np.cross(d_norm, u1)
    pts = (t[:, None] * d[None, :] +
           (r * np.cos(theta))[:, None] * u1[None, :] +
           (r * np.sin(theta))[:, None] * u2[None, :])
    return pts


@pytest.mark.parametrize("t0,t1", [(1.0, 1.5), (2.0, 2.2), (0.5, 3.0)])
def test_conical_frustum_moments_vs_monte_carlo(t0, t1):
    rng = np.random.RandomState(0)
    d = np.array([0.3, -0.7, 0.65], np.float32)
    base_radius = 0.05
    mean, cov_diag = render.conical_frustum_to_gaussian(
        jnp.array(d), jnp.array(t0), jnp.array(t1), base_radius, diag=True)
    pts = sample_conical_frustum(rng, d, t0, t1, base_radius)
    np.testing.assert_allclose(np.asarray(mean).reshape(3), pts.mean(0), atol=2e-3)
    np.testing.assert_allclose(np.asarray(cov_diag).reshape(3), pts.var(0),
                               rtol=0.05, atol=1e-5)


def test_cylinder_moments_exact():
    d = jnp.array([0.0, 0.0, 2.0])  # unnormalized on purpose
    mean, cov = render.cylinder_to_gaussian(d, jnp.array(1.0), jnp.array(2.0),
                                            0.1, diag=True)
    mean, cov = np.asarray(mean).reshape(3), np.asarray(cov).reshape(3)
    # Along z: mean at t=1.5 scaled by |d|=2 -> 3.0; var = (2-1)^2/12 * 4.
    np.testing.assert_allclose(mean, [0, 0, 3.0], atol=1e-6)
    np.testing.assert_allclose(cov[2], 4 / 12, rtol=1e-5)
    # Perpendicular: r^2/4.
    np.testing.assert_allclose(cov[0], 0.1**2 / 4, rtol=1e-5)


def test_cast_rays_shapes():
    B, S = 4, 8
    tdist = jnp.broadcast_to(jnp.linspace(0.5, 4.0, S + 1), (B, S + 1))
    origins = jnp.ones((B, 3))
    directions = jnp.tile(jnp.array([[0.0, 0, 1]]), (B, 1))
    radii = jnp.full((B, 1), 0.01)
    means, covs = render.cast_rays(tdist, origins, directions, radii, "cone")
    assert means.shape == (B, S, 3)
    assert covs.shape == (B, S, 3)


def test_compute_alpha_weights_basic():
    B, S = 2, 16
    tdist = jnp.broadcast_to(jnp.linspace(0.0, 1.0, S + 1), (B, S + 1))
    dirs = jnp.tile(jnp.array([[0.0, 0, 1.0]]), (B, 1))
    # Zero density -> zero weights, transmittance 1 everywhere.
    w, alpha, trans = render.compute_alpha_weights(jnp.zeros((B, S)), tdist, dirs)
    np.testing.assert_allclose(np.asarray(w), 0.0)
    np.testing.assert_allclose(np.asarray(trans), 1.0)
    # Huge density -> first sample takes all the weight.
    w, _, _ = render.compute_alpha_weights(jnp.full((B, S), 1e8), tdist, dirs)
    np.testing.assert_allclose(np.asarray(w)[:, 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(w)[:, 1:], 0.0, atol=1e-6)


def test_alpha_weights_sum_le_one_and_opaque_sums_to_one():
    rng = np.random.RandomState(0)
    B, S = 8, 32
    tdist = np.sort(rng.uniform(0, 5, (B, S + 1)), -1).astype(np.float32)
    density = rng.uniform(0, 3, (B, S)).astype(np.float32)
    dirs = rng.randn(B, 3).astype(np.float32)
    w, _, _ = render.compute_alpha_weights(density, tdist, dirs)
    assert np.all(np.asarray(w).sum(-1) <= 1 + 1e-5)
    w_o, _, _ = render.compute_alpha_weights(density, tdist, dirs,
                                             opaque_background=True)
    np.testing.assert_allclose(np.asarray(w_o).sum(-1), 1.0, atol=1e-5)


def test_dual_alpha_weights_consistency():
    rng = np.random.RandomState(1)
    B, S = 4, 16
    tdist = np.sort(rng.uniform(0, 2, (B, S + 1)), -1).astype(np.float32)
    d1 = rng.uniform(0, 2, (B, S)).astype(np.float32)
    d2 = rng.uniform(0, 2, (B, S)).astype(np.float32)
    dirs = rng.randn(B, 3).astype(np.float32)
    w1, w2, w = render.compute_dual_alpha_weights(d1, d2, tdist, dirs)
    # Combined weights equal single-density weights of the summed density.
    w_ref, _, _ = render.compute_alpha_weights(d1 + d2, tdist, dirs)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref), atol=1e-5)
    # Setting one density to zero recovers the single-density result.
    w1z, w2z, _ = render.compute_dual_alpha_weights(
        d1, jnp.zeros_like(d2), tdist, dirs)
    w1_ref, _, _ = render.compute_alpha_weights(d1, tdist, dirs)
    np.testing.assert_allclose(np.asarray(w1z), np.asarray(w1_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(w2z), 0.0, atol=1e-6)


def test_volumetric_rendering_bg_compositing():
    B, S = 3, 8
    tdist = jnp.broadcast_to(jnp.linspace(1.0, 2.0, S + 1), (B, S + 1))
    rgbs = jnp.ones((B, S, 3)) * 0.25
    weights = jnp.zeros((B, S))
    bg = jnp.ones(3)
    out = render.volumetric_rendering(rgbs, weights, tdist, bg,
                                      t_far=jnp.full((B, 1), 2.0),
                                      compute_extras=True)
    np.testing.assert_allclose(np.asarray(out["rgb"]), 1.0)  # pure background
    np.testing.assert_allclose(np.asarray(out["acc"]), 0.0)


def test_contract_identity_inside_and_bounded_outside():
    rng = np.random.RandomState(0)
    x_in = rng.uniform(-0.5, 0.5, (100, 3)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(coord.contract(x_in)), x_in, atol=1e-6)
    x_out = rng.uniform(-100, 100, (1000, 3)).astype(np.float32)
    z = np.asarray(coord.contract(x_out))
    assert np.all(np.linalg.norm(z, axis=-1) <= 2.0 + 1e-5)


def test_contract_inverse_roundtrip():
    rng = np.random.RandomState(1)
    x = rng.uniform(-20, 20, (500, 3)).astype(np.float32)
    z = coord.contract(x)
    x2 = np.asarray(coord.inv_contract(z))
    np.testing.assert_allclose(x2, x, rtol=1e-3, atol=1e-3)


def test_contract_gradient_finite_at_origin():
    g = jax.jacobian(coord.contract)(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))


@pytest.mark.parametrize("fn", [None, "piecewise"])
def test_ray_warps_bijection(fn):
    t_near, t_far = jnp.array(0.1), jnp.array(100.0)
    t_to_s, s_to_t = coord.construct_ray_warps(fn, t_near, t_far)
    np.testing.assert_allclose(float(t_to_s(t_near)), 0.0, atol=1e-6)
    np.testing.assert_allclose(float(t_to_s(t_far)), 1.0, atol=1e-6)
    s = jnp.linspace(0.0, 1.0, 64)
    np.testing.assert_allclose(np.asarray(t_to_s(s_to_t(s))), np.asarray(s),
                               atol=1e-4)


def test_ray_warps_reciprocal():
    t_near, t_far = jnp.array(1.0), jnp.array(1000.0)
    t_to_s, s_to_t = coord.construct_ray_warps(jnp.reciprocal, t_near, t_far)
    t = jnp.array([1.0, 10.0, 1000.0])
    s = np.asarray(t_to_s(t))
    np.testing.assert_allclose(s[0], 0.0, atol=1e-6)
    np.testing.assert_allclose(s[-1], 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_to_t(t_to_s(t))), np.asarray(t),
                               rtol=1e-4)


def test_expected_sin_limits():
    # var=0 -> plain sine; huge var -> 0.
    x = jnp.linspace(-3, 3, 32)
    np.testing.assert_allclose(np.asarray(coord.expected_sin(x, jnp.zeros_like(x))),
                               np.sin(x), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(coord.expected_sin(x, 1e6 * jnp.ones_like(x))), 0.0, atol=1e-6)


def test_integrated_pos_enc_matches_monte_carlo():
    rng = np.random.RandomState(0)
    mean = rng.randn(3).astype(np.float32) * 0.3
    var = rng.uniform(0.01, 0.1, 3).astype(np.float32)
    got = np.asarray(coord.integrated_pos_enc(mean[None], var[None], 0, 2))[0]
    # MC estimate of E[sin/cos(2^k x)].
    samples = mean[None, :] + rng.randn(400000, 3) * np.sqrt(var)[None, :]
    feats = []
    for k in [1.0, 2.0]:
        feats.append(np.sin(k * samples).mean(0))
    for k in [1.0, 2.0]:
        feats.append(np.cos(k * samples).mean(0))
    want = np.concatenate(feats)
    np.testing.assert_allclose(got, want, atol=5e-3)


def test_track_linearize_linear_function_exact():
    # For a linear fn, linearization is exact: cov -> A cov A^T.
    A = jnp.array([[2.0, 0, 0], [0, 3.0, 0], [1.0, 0, 1.0]])
    fn = lambda x: jnp.matmul(x, A.T, precision=jax.lax.Precision.HIGHEST)
    mean = jnp.array([[1.0, 2.0, 3.0]])
    cov = jnp.eye(3)[None] * jnp.array([0.1, 0.2, 0.3])
    out_mean, out_cov = coord.track_linearize(fn, mean, cov)
    np.testing.assert_allclose(np.asarray(out_mean), np.asarray(fn(mean)),
                               atol=1e-6)
    want = np.asarray(A) @ np.asarray(cov[0]) @ np.asarray(A).T
    np.testing.assert_allclose(np.asarray(out_cov[0]), want, atol=1e-5)


def test_lift_and_diagonalize():
    rng = np.random.RandomState(0)
    basis = rng.randn(3, 7).astype(np.float32)
    mean = rng.randn(5, 3).astype(np.float32)
    cov_sqrt = rng.randn(5, 3, 3).astype(np.float32)
    cov = cov_sqrt @ np.transpose(cov_sqrt, (0, 2, 1))
    out_mean, out_var = coord.lift_and_diagonalize(
        jnp.array(mean), jnp.array(cov), jnp.array(basis))
    np.testing.assert_allclose(np.asarray(out_mean), mean @ basis, atol=1e-4)
    want_var = np.stack([np.diag(basis.T @ cov[i] @ basis) for i in range(5)])
    np.testing.assert_allclose(np.asarray(out_var), want_var, rtol=1e-3,
                               atol=1e-4)


def test_pos_enc_structure():
    x = jnp.array([[0.5, -0.25, 0.1]])
    enc = coord.pos_enc(x, 0, 4, append_identity=True)
    assert enc.shape == (1, 3 + 2 * 3 * 4)
    np.testing.assert_allclose(np.asarray(enc)[0, :3], np.asarray(x)[0])


@pytest.mark.parametrize(
    "name", [None, "piecewise", "reciprocal", "log", "exp", "sqrt", "square"])
def test_ray_warps_all_config_variants(name):
    """Every raydist_fn name a config can specify resolves and is a true
    [t_near, t_far] <-> [0, 1] bijection (coord.py:63-99 fn zoo)."""
    from nerf_hugs_tpu.configs import config as cfg

    fn = cfg.resolve_raydist_fn(name)
    t_near, t_far = jnp.array(0.1), jnp.array(50.0)
    t_to_s, s_to_t = coord.construct_ray_warps(fn, t_near, t_far)
    np.testing.assert_allclose(float(t_to_s(t_near)), 0.0, atol=1e-6)
    np.testing.assert_allclose(float(t_to_s(t_far)), 1.0, atol=1e-6)
    s = jnp.linspace(0.0, 1.0, 64)
    t = np.asarray(s_to_t(s))
    assert np.all(np.diff(t) > 0), f"{name}: s_to_t not monotone"
    np.testing.assert_allclose(np.asarray(t_to_s(s_to_t(s))), np.asarray(s),
                               atol=1e-4)


def test_resolve_raydist_fn_rejects_unknown():
    from nerf_hugs_tpu.configs import config as cfg

    with pytest.raises(ValueError, match="unknown raydist_fn"):
        cfg.resolve_raydist_fn("cubic")
