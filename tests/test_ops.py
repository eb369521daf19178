"""Tests for TPU ops: hash grid encoding and spherical harmonics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_hugs_tpu.ops import sh
from nerf_hugs_tpu.ops.hashgrid import (HashGridEncoding, HashGridSpec,
                                        hashgrid_encode, level_resolutions)


def test_level_resolutions_growth():
    res = level_resolutions(16, 16, 2048)
    assert res[0] == 16
    assert res[-1] == 2048
    assert np.all(np.diff(res) >= 0)
    # Growth matches tcnn's formula (nerfacto.py:713).
    g = np.exp((np.log(2048) - np.log(16)) / 15)
    np.testing.assert_allclose(res, np.floor(16 * g ** np.arange(16)))


def make_spec(**kw):
    defaults = dict(num_levels=4, features_per_level=2, log2_hashmap_size=10,
                    base_res=4, max_res=32)
    defaults.update(kw)
    return HashGridSpec(**defaults)


def test_hashgrid_shapes_and_determinism():
    spec = make_spec()
    rng = jax.random.PRNGKey(0)
    table = jax.random.normal(
        rng, (spec.num_levels * spec.table_size * spec.features_per_level,))
    pos = jax.random.uniform(jax.random.PRNGKey(1), (37, 3))
    out = hashgrid_encode(table, pos, spec)
    assert out.shape == (37, spec.output_dim)
    out2 = hashgrid_encode(table, pos, spec)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    # Arbitrary leading batch shapes.
    out3 = hashgrid_encode(table, pos.reshape(37, 1, 3), spec)
    np.testing.assert_allclose(np.asarray(out3).reshape(37, -1),
                               np.asarray(out), atol=1e-6)


def test_hashgrid_interpolation_is_trilinear():
    # With a dense level, encoding at a grid vertex returns that vertex's
    # feature exactly; midway between two vertices returns their average.
    spec = make_spec(num_levels=1, base_res=4, max_res=4, log2_hashmap_size=10)
    table2d = jax.random.normal(jax.random.PRNGKey(0),
                                (spec.table_size, spec.features_per_level))
    table = table2d.reshape(-1)
    # Vertex (1, 2, 3) of the res-4 grid -> position (1/4, 2/4, 3/4).
    pos = jnp.array([[0.25, 0.5, 0.75]])
    idx = 1 + 2 * 5 + 3 * 25  # x + y*(res+1) + z*(res+1)^2
    got = hashgrid_encode(table, pos, spec)
    np.testing.assert_allclose(np.asarray(got)[0], np.asarray(table2d[idx]),
                               atol=1e-5)
    # Midpoint between vertices (1,2,3) and (2,2,3).
    pos_mid = jnp.array([[0.375, 0.5, 0.75]])
    got_mid = hashgrid_encode(table, pos_mid, spec)
    want = 0.5 * (np.asarray(table2d[idx]) + np.asarray(table2d[idx + 1]))
    np.testing.assert_allclose(np.asarray(got_mid)[0], want, atol=1e-5)


def test_hashgrid_continuity():
    spec = make_spec()
    table = jax.random.normal(
        jax.random.PRNGKey(0),
        (spec.num_levels * spec.table_size * spec.features_per_level,))
    pos = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=0.1,
                             maxval=0.9)
    eps = 1e-5
    out0 = hashgrid_encode(table, pos, spec)
    out1 = hashgrid_encode(table, pos + eps, spec)
    assert float(jnp.max(jnp.abs(out1 - out0))) < 1e-2


def test_hashgrid_gradient_scatter():
    # d loss / d table is nonzero exactly at touched entries.
    spec = make_spec(num_levels=2)
    table = jnp.zeros(
        (spec.num_levels * spec.table_size * spec.features_per_level,))
    pos = jnp.array([[0.3, 0.6, 0.1]])
    g = jax.grad(lambda t: jnp.sum(hashgrid_encode(t, pos, spec)))(table)
    g2d = np.asarray(g).reshape(-1, spec.features_per_level)
    touched = int(np.sum(np.any(g2d != 0, axis=-1)))
    # 8 corners per level, possibly with hash collisions: 1 < touched <= 16.
    assert 1 <= touched <= 16
    # Weights per level sum to 1 => per-level grad feature sums to 1.
    np.testing.assert_allclose(float(g2d[:spec.table_size, 0].sum()), 1.0,
                               rtol=1e-5)


def test_hashgrid_module_init():
    spec = make_spec()
    mod = HashGridEncoding(spec)
    pos = jnp.ones((5, 3)) * 0.5
    variables = mod.init(jax.random.PRNGKey(0), pos)
    params = variables["params"]
    assert set(params) == {f"table_{l}" for l in range(spec.num_levels)}
    table = params["table_0"]
    assert table.shape == (spec.table_size * spec.features_per_level,)
    assert float(jnp.max(jnp.abs(table))) <= 1e-4  # tcnn-style uniform init
    out = mod.apply(variables, pos)
    assert out.shape == (5, spec.output_dim)


def test_hashgrid_2d():
    spec = make_spec(num_dims=2)
    table = jax.random.normal(
        jax.random.PRNGKey(0),
        (spec.num_levels * spec.table_size * spec.features_per_level,))
    pos = jax.random.uniform(jax.random.PRNGKey(1), (11, 2))
    out = hashgrid_encode(table, pos, spec)
    assert out.shape == (11, spec.output_dim)
    assert np.all(np.isfinite(np.asarray(out)))


# -- spherical harmonics ------------------------------------------------------

def _fibonacci_sphere(n):
    i = np.arange(n) + 0.5
    phi = np.arccos(1 - 2 * i / n)
    theta = np.pi * (1 + 5**0.5) * i
    return np.stack([np.cos(theta) * np.sin(phi),
                     np.sin(theta) * np.sin(phi), np.cos(phi)], -1)


def test_sh_shapes():
    dirs = jnp.asarray(_fibonacci_sphere(100), jnp.float32)
    for deg in [1, 2, 3, 4]:
        out = sh.sh_encode(dirs, degree=deg)
        assert out.shape == (100, deg * deg)


def test_sh_orthonormality():
    # Monte-Carlo over the sphere: int Y_i Y_j dOmega = delta_ij.
    dirs = jnp.asarray(_fibonacci_sphere(200000), jnp.float32)
    Y = np.asarray(sh.sh_encode(dirs, degree=4), np.float64)
    gram = (Y.T @ Y) * (4 * np.pi / Y.shape[0])
    np.testing.assert_allclose(gram, np.eye(16), atol=5e-3)


def test_sh_l0_constant():
    dirs = jnp.asarray(_fibonacci_sphere(10), jnp.float32)
    out = np.asarray(sh.sh_encode(dirs, degree=4))
    np.testing.assert_allclose(out[:, 0], 0.28209479, rtol=1e-5)


# ---------------------------------------------------------------------------
# Custom-VJP (sorted-scatter Pallas backward) parity — runs in interpret mode
# on the CPU test mesh; the same code compiles on TPU (verified on hardware).
# ---------------------------------------------------------------------------

def test_block_segment_sum_matches_scatter_add():
    from nerf_hugs_tpu.ops import hashgrid_bwd
    key = jax.random.PRNGKey(0)
    T, K, F = 1024, 5000, 2
    keys = jax.random.randint(key, (K,), 0, T, jnp.int32)
    vals = jax.random.normal(jax.random.PRNGKey(1), (K, F), jnp.float32)
    got = hashgrid_bwd.block_segment_sum(keys, vals, T, "float32",
                                         True).reshape(T, F)
    want = jnp.zeros((T, F)).at[keys].add(vals)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)
    # Skew: every entry lands in one row (one block loops many chunks).
    keys2 = jnp.full((K,), 7, jnp.int32)
    got2 = hashgrid_bwd.block_segment_sum(keys2, vals, T, "float32",
                                          True).reshape(T, F)
    want2 = jnp.zeros((T, F)).at[keys2].add(vals)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                               rtol=1e-4, atol=1e-3)
    # Block-boundary keys.
    keys3 = jnp.array([0, 255, 256, 511, 512, 1023] * 10, jnp.int32)
    vals3 = jax.random.normal(jax.random.PRNGKey(2), (60, F))
    got3 = hashgrid_bwd.block_segment_sum(keys3, vals3, T, "float32",
                                          True).reshape(T, F)
    want3 = jnp.zeros((T, F)).at[keys3].add(vals3)
    np.testing.assert_allclose(np.asarray(got3), np.asarray(want3), atol=1e-4)


@pytest.mark.parametrize("num_dims", [2, 3])
def test_hashgrid_custom_vjp_matches_autodiff(num_dims):
    spec = HashGridSpec(num_levels=4, features_per_level=2,
                        log2_hashmap_size=10, base_res=4, max_res=32,
                        num_dims=num_dims, bwd_dtype="float32")
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (spec.num_levels, spec.table_size,
                                    spec.features_per_level))
    pos = jax.random.uniform(jax.random.PRNGKey(3), (129, num_dims))
    cot = jax.random.normal(jax.random.PRNGKey(4), (129, spec.output_dim))
    from nerf_hugs_tpu.ops.hashgrid import _as_level_tuple, _encode_custom
    tup = _as_level_tuple(table, spec)
    out_plain = hashgrid_encode(table, pos, spec)
    out_fast = _encode_custom(tup, pos, spec, True)
    np.testing.assert_array_equal(np.asarray(out_plain), np.asarray(out_fast))
    g1 = jax.grad(lambda t: jnp.sum(hashgrid_encode(t, pos, spec) * cot))(
        table)
    g2t = jax.grad(lambda t: jnp.sum(_encode_custom(t, pos, spec, True)
                                     * cot))(tup)
    g2 = jnp.stack(g2t).reshape(g1.shape)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-5)


def test_hashgrid_flat_table_roundtrip():
    spec = HashGridSpec(num_levels=2, features_per_level=2,
                        log2_hashmap_size=8, base_res=4, max_res=8)
    table = jax.random.normal(jax.random.PRNGKey(0),
                              (spec.num_levels, spec.table_size, 2))
    pos = jax.random.uniform(jax.random.PRNGKey(1), (33, 3))
    from nerf_hugs_tpu.ops.hashgrid import _as_level_tuple, _encode_custom
    out3 = hashgrid_encode(table, pos, spec)
    out1 = hashgrid_encode(table.reshape(-1), pos, spec)
    np.testing.assert_array_equal(np.asarray(out3), np.asarray(out1))
    # Flat tables get flat gradients (autodiff through the normalization).
    g = jax.grad(lambda t: jnp.sum(
        _encode_custom(_as_level_tuple(t, spec), pos, spec, True)))(
        table.reshape(-1))
    assert g.shape == (spec.num_levels * spec.table_size * 2,)


def test_hashgrid_custom_vjp_recompute_path_matches_saved(monkeypatch):
    # Above _RESIDUAL_BYTES_CAP_PER_CALL the backward recomputes rows/weights from
    # positions instead of using saved residuals; both paths must produce
    # identical gradients.
    from nerf_hugs_tpu.ops import hashgrid as hg
    spec = HashGridSpec(num_levels=3, features_per_level=2,
                        log2_hashmap_size=10, base_res=4, max_res=16,
                        bwd_dtype="float32")
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (spec.num_levels, spec.table_size, 2))
    tup = hg._as_level_tuple(table, spec)
    pos = jax.random.uniform(jax.random.PRNGKey(1), (97, 3))
    cot = jax.random.normal(jax.random.PRNGKey(2), (97, spec.output_dim))
    loss = lambda t: jnp.sum(hg._encode_custom(t, pos, spec, True) * cot)
    g_saved = jax.grad(loss)(tup)
    monkeypatch.setattr(hg, "_RESIDUAL_BYTES_CAP_PER_CALL", 0)
    g_recompute = jax.grad(loss)(tup)
    for a, b in zip(g_saved, g_recompute):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_block_segment_sum_packed_bf16_matches_scatter_add():
    # The bf16 grad mode (the AMP default) packs the f=2 value pair into one
    # int32 sort payload and unpacks it in-kernel by shift+bitcast; it must
    # equal a scatter-add of the bf16-rounded values exactly (the one-hot
    # matmul has bf16 operands with fp32 accumulation).
    from nerf_hugs_tpu.ops import hashgrid_bwd
    T, K = 1024, 5000
    keys = jax.random.randint(jax.random.PRNGKey(0), (K,), 0, T, jnp.int32)
    vals = jax.random.normal(jax.random.PRNGKey(1), (K, 2), jnp.float32)
    got = hashgrid_bwd.block_segment_sum(keys, vals, T, "bfloat16",
                                         True).reshape(T, 2)
    want = jnp.zeros((T, 2)).at[keys].add(
        vals.astype(jnp.bfloat16).astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    # Asymmetric values catch a swapped lo/hi pack: feature 0 large-positive,
    # feature 1 small-negative.
    vals2 = jnp.stack([jnp.abs(vals[:, 0]) * 100.0,
                       -jnp.abs(vals[:, 1]) * 0.01], axis=-1)
    got2 = hashgrid_bwd.block_segment_sum(keys, vals2, T, "bfloat16",
                                          True).reshape(T, 2)
    want2 = jnp.zeros((T, 2)).at[keys].add(
        vals2.astype(jnp.bfloat16).astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                               rtol=1e-4, atol=1e-6)
