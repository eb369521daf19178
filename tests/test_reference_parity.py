"""Numerical cross-validation against the reference implementation.

The reference's MipNeRF360 core (math/stepfun/coord/render/geopoly) is plain
JAX with no gin dependency, so when the reference checkout is present we can
use it as an oracle: identical random inputs through both stacks must yield
matching outputs. This pins the sampler/IPE/compositing numerics exactly —
the strongest available parity check without real datasets.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF_PATH = "/root/reference/MipNeRF360"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_PATH, "internal")),
    reason="reference checkout unavailable")

if os.path.isdir(os.path.join(REF_PATH, "internal")):
    sys.path.insert(0, REF_PATH)
    try:
        from internal import coord as ref_coord
        from internal import math as ref_math
        from internal import render as ref_render
        from internal import stepfun as ref_stepfun
        from internal import geopoly as ref_geopoly
    finally:
        # Leaving REF_PATH on sys.path shadows OUR top-level train.py /
        # eval.py in later test modules (imported modules stay cached).
        sys.path.remove(REF_PATH)

from nerf_hugs_tpu.core import coord, geopoly, render, stepfun
from nerf_hugs_tpu.core import math as nh_math

RNG = np.random.RandomState(0)


def rand_sorted(shape, lo=0.0, hi=1.0):
    return np.sort(RNG.uniform(lo, hi, shape), axis=-1).astype(np.float32)


def test_math_parity():
    x = RNG.randn(64).astype(np.float32) * 50
    np.testing.assert_allclose(nh_math.safe_sin(x), ref_math.safe_sin(x),
                               atol=1e-6)
    np.testing.assert_allclose(nh_math.safe_exp(x / 10),
                               ref_math.safe_exp(x / 10), rtol=1e-6)
    xp = rand_sorted((8, 17))
    fp = rand_sorted((8, 17))
    xq = rand_sorted((8, 9), -0.2, 1.2)
    np.testing.assert_allclose(nh_math.sorted_interp(xq, xp, fp),
                               ref_math.sorted_interp(xq, xp, fp), atol=1e-6)
    for step in [0, 100, 5000, 250000]:
        np.testing.assert_allclose(
            nh_math.learning_rate_decay(step, 2e-3, 2e-5, 250000, 512, 0.01),
            ref_math.learning_rate_decay(step, 2e-3, 2e-5, 250000, 512, 0.01),
            rtol=1e-6)


def test_stepfun_parity():
    t = rand_sorted((16, 13))
    v = RNG.uniform(-0.1, 1.1, (16, 9)).astype(np.float32)
    lo_a, hi_a = stepfun.searchsorted(t, v)
    lo_b, hi_b = ref_stepfun.searchsorted(t, v)
    np.testing.assert_array_equal(np.asarray(lo_a), np.asarray(lo_b))
    np.testing.assert_array_equal(np.asarray(hi_a), np.asarray(hi_b))

    t0 = rand_sorted((16, 9))
    t1 = rand_sorted((16, 13))
    y1 = RNG.uniform(0, 1, (16, 12)).astype(np.float32)
    for mine, ref in zip(stepfun.inner_outer(t0, t1, y1),
                         ref_stepfun.inner_outer(t0, t1, y1)):
        np.testing.assert_allclose(np.asarray(mine), np.asarray(ref),
                                   atol=1e-6)

    w = RNG.dirichlet(np.ones(12), 16).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(stepfun.lossfun_outer(t0, w[:, :8], t1, y1)),
        np.asarray(ref_stepfun.lossfun_outer(t0, w[:, :8], t1, y1)),
        atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(stepfun.lossfun_distortion(t1, w)),
        np.asarray(ref_stepfun.lossfun_distortion(t1, w)), atol=1e-6)

    t_d_a, w_d_a = stepfun.max_dilate_weights(t1, w, 0.05, domain=(0., 1.),
                                              renormalize=True)
    t_d_b, w_d_b = ref_stepfun.max_dilate_weights(t1, w, 0.05,
                                                  domain=(0., 1.),
                                                  renormalize=True)
    np.testing.assert_allclose(np.asarray(t_d_a), np.asarray(t_d_b),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(w_d_a), np.asarray(w_d_b),
                               atol=1e-6)


def test_sampling_parity():
    """Same rng key -> bit-matched samples through both samplers."""
    t = rand_sorted((8, 17))
    logits = RNG.randn(8, 16).astype(np.float32)
    key = jax.random.PRNGKey(42)
    for single_jitter in [True, False]:
        mine = stepfun.sample_intervals(key, t, logits, 12,
                                        single_jitter=single_jitter,
                                        domain=(0.0, 1.0))
        ref = ref_stepfun.sample_intervals(key, t, logits, 12,
                                           single_jitter=single_jitter,
                                           domain=(0.0, 1.0))
        np.testing.assert_allclose(np.asarray(mine), np.asarray(ref),
                                   atol=1e-6)
    # Deterministic path too.
    mine = stepfun.sample(None, t, logits, 24)
    ref = ref_stepfun.sample(None, t, logits, 24)
    np.testing.assert_allclose(np.asarray(mine), np.asarray(ref), atol=1e-6)


def test_coord_parity():
    x = (RNG.randn(128, 3) * 3).astype(np.float32)
    np.testing.assert_allclose(np.asarray(coord.contract(x)),
                               np.asarray(ref_coord.contract(x)), atol=1e-6)
    mean = RNG.randn(16, 4, 3).astype(np.float32)
    half = RNG.randn(16, 4, 3, 3).astype(np.float32) * 0.1
    cov = half @ np.swapaxes(half, -1, -2)
    m_a, c_a = coord.track_linearize(coord.contract, mean, cov)
    m_b, c_b = ref_coord.track_linearize(ref_coord.contract, mean, cov)
    np.testing.assert_allclose(np.asarray(m_a), np.asarray(m_b), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_a), np.asarray(c_b), atol=1e-5)

    var = RNG.uniform(0.001, 0.2, (16, 4, 21)).astype(np.float32)
    mean21 = RNG.randn(16, 4, 21).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(coord.integrated_pos_enc(mean21, var, 0, 12)),
        np.asarray(ref_coord.integrated_pos_enc(mean21, var, 0, 12)),
        atol=1e-6)

    t_near = np.full((8, 1), 0.2, np.float32)
    t_far = np.full((8, 1), 1e6, np.float32)
    mine_t2s, mine_s2t = coord.construct_ray_warps(jnp.reciprocal, t_near,
                                                   t_far)
    ref_t2s, ref_s2t = ref_coord.construct_ray_warps(jnp.reciprocal, t_near,
                                                     t_far)
    s = np.linspace(0, 1, 33, dtype=np.float32)[None] * np.ones((8, 1),
                                                                np.float32)
    np.testing.assert_allclose(np.asarray(mine_s2t(s)),
                               np.asarray(ref_s2t(s)), rtol=1e-6)


def test_render_parity():
    d = RNG.randn(16, 3).astype(np.float32)
    tdist = rand_sorted((16, 9), 0.5, 4.0)
    radii = RNG.uniform(0.001, 0.02, (16, 1)).astype(np.float32)
    origins = RNG.randn(16, 3).astype(np.float32)
    for diag in [True, False]:
        m_a, c_a = render.cast_rays(tdist, origins, d, radii, "cone",
                                    diag=diag)
        m_b, c_b = ref_render.cast_rays(tdist, origins, d, radii, "cone",
                                        diag=diag)
        np.testing.assert_allclose(np.asarray(m_a), np.asarray(m_b),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(c_a), np.asarray(c_b),
                                   atol=1e-5)

    density = RNG.uniform(0, 3, (16, 8)).astype(np.float32)
    for opaque in [False, True]:
        w_a = render.compute_alpha_weights(density, tdist, d,
                                           opaque_background=opaque)[0]
        w_b = ref_render.compute_alpha_weights(density, tdist, d,
                                               opaque_background=opaque)[0]
        np.testing.assert_allclose(np.asarray(w_a), np.asarray(w_b),
                                   atol=1e-6)

    d2 = RNG.uniform(0, 2, (16, 8)).astype(np.float32)
    for mine, ref in zip(
            render.compute_dual_alpha_weights(density, d2, tdist, d),
            ref_render.compute_dual_alpha_weights(density, d2, tdist, d)):
        np.testing.assert_allclose(np.asarray(mine), np.asarray(ref),
                                   atol=1e-6)

    rgbs = RNG.uniform(0, 1, (16, 8, 3)).astype(np.float32)
    weights = (RNG.dirichlet(np.ones(8), 16) * 0.9).astype(np.float32)
    out_a = render.volumetric_rendering(rgbs, weights, tdist, jnp.ones(3),
                                        tdist[:, -1:], True)
    out_b = ref_render.volumetric_rendering(rgbs, weights, tdist,
                                            jnp.ones(3), tdist[:, -1:], True)
    for key in ["rgb", "acc", "distance_mean", "distance_median",
                "distance_percentile_5", "distance_percentile_95"]:
        np.testing.assert_allclose(np.asarray(out_a[key]),
                                   np.asarray(out_b[key]), atol=1e-5,
                                   err_msg=key)


def test_geopoly_parity():
    for shape, tess in [("icosahedron", 2), ("octahedron", 1),
                        ("icosahedron", 1)]:
        mine = geopoly.generate_basis(shape, tess)
        ref = ref_geopoly.generate_basis(shape, tess)
        np.testing.assert_allclose(mine, ref, atol=1e-10)
