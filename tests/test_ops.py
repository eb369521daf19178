"""Tests for TPU ops: hash grid encoding and spherical harmonics.

The hash grid is locked against a pure-numpy reimplementation of
tiny-cuda-nn's grid.h (the component the reference actually runs,
nerfacto/models/nerfacto.py:716-734): tcnn resolutions ceil(scale)+1,
half-cell coordinate offset, compact per-level tables, dense strides N^d
with modulo wrap, xor hash.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_hugs_tpu.ops import sh
from nerf_hugs_tpu.ops.hashgrid import (HashGridEncoding, HashGridSpec,
                                        hashgrid_encode, level_resolutions)

_PRIMES = (1, 2654435761, 805459861)


def test_level_resolutions_tcnn_formula():
    res = level_resolutions(16, 16, 2048)
    assert res[0] == 16
    assert res[-1] == 2048
    assert np.all(np.diff(res) >= 0)
    # tcnn grid.h: scale = base * g^l - 1 (float32), res = ceil(scale) + 1 —
    # one above the instant-ngp paper's floor(base * g^l) at non-integer
    # levels.
    g = np.exp((np.log(2048) - np.log(16)) / 15)
    scales = np.float32(16 * g ** np.arange(16) - 1)
    np.testing.assert_array_equal(res, np.ceil(scales.astype(np.float64)) + 1)
    assert res[5] == np.floor(16 * g ** 5) + 1  # differs from paper formula


def make_spec(**kw):
    defaults = dict(num_levels=4, features_per_level=2, log2_hashmap_size=10,
                    base_res=4, max_res=32)
    defaults.update(kw)
    return HashGridSpec(**defaults)


def rand_table(spec, key):
    """Tuple of per-level flat [T_l*F] tables (the canonical layout)."""
    keys = jax.random.split(key, spec.num_levels)
    return tuple(
        jax.random.normal(keys[l],
                          (int(spec.level_sizes[l])
                           * spec.features_per_level,))
        for l in range(spec.num_levels))


def numpy_tcnn_encode(table, pos, spec):
    """Reference: tiny-cuda-nn grid.h semantics in plain numpy (xor hash),
    plus the TPU-native additive hash when spec.hash_impl == 'add'
    (h = sum_d c_d * p_d mod 2^32, then & mask — low bits of the sum only
    depend on low bits of the addends, so uint64 accumulation + mask is
    exact)."""
    pos = np.asarray(pos, np.float32)
    n = pos.shape[0]
    d = spec.num_dims
    out = np.zeros((n, spec.output_dim), np.float32)
    for lvl in range(spec.num_levels):
        scale = np.float32(spec.scales[lvl])
        res = int(spec.resolutions[lvl])
        size = int(spec.level_sizes[lvl])
        dense = int(res) ** d <= spec.table_size
        tab = np.asarray(table[lvl]).reshape(size, spec.features_per_level)
        x = pos * scale + np.float32(0.5)
        x0 = np.floor(x).astype(np.int64)
        frac = x - x0
        for corner in range(1 << d):
            w = np.ones((n,), np.float32)
            idx = np.zeros((n,), np.int64)
            for dim in range(d):
                bit = (corner >> (d - 1 - dim)) & 1  # match corner_offsets
                c = x0[:, dim] + bit
                w = w * (frac[:, dim] if bit else 1 - frac[:, dim])
                term = (c.astype(np.uint64)
                        * np.uint64(_PRIMES[dim % 3]))
                if dense:
                    idx = idx + c * (res ** dim)
                elif spec.hash_impl == "add":
                    idx = (idx.astype(np.uint64) + term).astype(np.int64)
                else:
                    idx = idx ^ term.astype(np.int64)
            if dense:
                idx = idx % size
            else:
                idx = (idx.astype(np.uint64)
                       & np.uint64(spec.table_size - 1)).astype(np.int64)
            out[:, lvl * spec.features_per_level:
                (lvl + 1) * spec.features_per_level] += w[:, None] * tab[idx]
    return out


@pytest.mark.parametrize("num_dims", [2, 3])
def test_hashgrid_matches_numpy_tcnn_reference(num_dims):
    spec = make_spec(num_dims=num_dims)
    table = rand_table(spec, jax.random.PRNGKey(0))
    # Include exact 0 and 1 coordinates: the x==1 edge exercises the
    # dense-index modulo wrap.
    pos = np.concatenate([
        np.random.RandomState(1).rand(200, num_dims).astype(np.float32),
        np.zeros((1, num_dims), np.float32),
        np.ones((1, num_dims), np.float32)])
    got = np.asarray(hashgrid_encode(table, jnp.asarray(pos), spec))
    want = numpy_tcnn_encode(table, pos, spec)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_hashgrid_level_sizes_tcnn_compact():
    spec = make_spec()  # base 4, max 32, L=4, 2^10 cap
    # scales 3,7,15,31 -> res 4,8,16,32; res^3 = 64,512,4096,32768
    np.testing.assert_array_equal(spec.resolutions, [4, 8, 16, 32])
    np.testing.assert_array_equal(spec.level_sizes, [64, 512, 1024, 1024])
    np.testing.assert_array_equal(spec.dense_level(), [True, True, False,
                                                       False])
    assert spec.num_rows == 64 + 512 + 1024 + 1024


def test_hashgrid_shapes_and_determinism():
    spec = make_spec()
    table = rand_table(spec, jax.random.PRNGKey(0))
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
    # Single dense res-4 level (scale 3): grid coord = 3x + 0.5, so vertex
    # k sits at position (k - 0.5) / 3. Encoding at a vertex returns that
    # vertex's feature; midway between two returns their average.
    spec = make_spec(num_levels=1, base_res=4, max_res=4,
                     log2_hashmap_size=10)
    assert int(spec.level_sizes[0]) == 64
    table2d = jax.random.normal(jax.random.PRNGKey(0),
                                (64, spec.features_per_level))
    table = (table2d.reshape(-1),)
    vertex = lambda k: (k - 0.5) / 3.0
    pos = jnp.array([[vertex(1), vertex(2), vertex(3)]])
    idx = 1 + 2 * 4 + 3 * 16  # x + y*res + z*res^2 (tcnn dense strides)
    got = hashgrid_encode(table, pos, spec)
    np.testing.assert_allclose(np.asarray(got)[0], np.asarray(table2d[idx]),
                               atol=1e-5)
    # Midpoint between vertices (1,2,3) and (2,2,3).
    pos_mid = jnp.array([[vertex(1.5), vertex(2), vertex(3)]])
    got_mid = hashgrid_encode(table, pos_mid, spec)
    want = 0.5 * (np.asarray(table2d[idx]) + np.asarray(table2d[idx + 1]))
    np.testing.assert_allclose(np.asarray(got_mid)[0], want, atol=1e-5)


def test_hashgrid_continuity():
    spec = make_spec()
    table = rand_table(spec, jax.random.PRNGKey(0))
    pos = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=0.1,
                             maxval=0.9)
    eps = 1e-5
    out0 = hashgrid_encode(table, pos, spec)
    out1 = hashgrid_encode(table, pos + eps, spec)
    assert float(jnp.max(jnp.abs(out1 - out0))) < 1e-2


def test_hashgrid_gradient_scatter():
    # d loss / d table is nonzero exactly at touched entries.
    spec = make_spec(num_levels=2)
    flat = jnp.zeros((spec.num_rows * spec.features_per_level,))
    pos = jnp.array([[0.3, 0.6, 0.1]])
    g = jax.grad(lambda t: jnp.sum(hashgrid_encode(t, pos, spec)))(flat)
    g2d = np.asarray(g).reshape(-1, spec.features_per_level)
    touched = int(np.sum(np.any(g2d != 0, axis=-1)))
    # 8 corners per level, possibly with hash collisions: 1 < touched <= 16.
    assert 1 <= touched <= 16
    # Weights per level sum to 1 => per-level grad feature sums to 1.
    lvl0_rows = int(spec.level_sizes[0])
    np.testing.assert_allclose(float(g2d[:lvl0_rows, 0].sum()), 1.0,
                               rtol=1e-5)


def test_hashgrid_module_init():
    spec = make_spec()
    mod = HashGridEncoding(spec)
    pos = jnp.ones((5, 3)) * 0.5
    variables = mod.init(jax.random.PRNGKey(0), pos)
    params = variables["params"]
    assert set(params) == {f"table_{l}" for l in range(spec.num_levels)}
    for l in range(spec.num_levels):
        assert params[f"table_{l}"].shape == (
            int(spec.level_sizes[l]) * spec.features_per_level,)
    assert float(jnp.max(jnp.abs(params["table_0"]))) <= 1e-4  # tcnn init
    out = mod.apply(variables, pos)
    assert out.shape == (5, spec.output_dim)


def test_hashgrid_2d():
    spec = make_spec(num_dims=2)
    table = rand_table(spec, jax.random.PRNGKey(0))
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
    table = rand_table(spec, jax.random.PRNGKey(0))
    pos = jax.random.uniform(jax.random.PRNGKey(3), (129, num_dims))
    cot = jax.random.normal(jax.random.PRNGKey(4), (129, spec.output_dim))
    from nerf_hugs_tpu.ops.hashgrid import _encode_custom
    out_plain = hashgrid_encode(table, pos, spec)
    out_fast = _encode_custom(table, pos, spec, True)
    np.testing.assert_array_equal(np.asarray(out_plain), np.asarray(out_fast))
    g1 = jax.grad(lambda t: jnp.sum(hashgrid_encode(t, pos, spec) * cot))(
        table)
    g2 = jax.grad(lambda t: jnp.sum(_encode_custom(t, pos, spec, True)
                                    * cot))(table)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_hashgrid_flat_table_roundtrip():
    spec = HashGridSpec(num_levels=2, features_per_level=2,
                        log2_hashmap_size=8, base_res=4, max_res=8)
    tup = rand_table(spec, jax.random.PRNGKey(0))
    flat = jnp.concatenate(tup)
    pos = jax.random.uniform(jax.random.PRNGKey(1), (33, 3))
    from nerf_hugs_tpu.ops.hashgrid import _as_level_tuple, _encode_custom
    out_t = hashgrid_encode(tup, pos, spec)
    out_f = hashgrid_encode(flat, pos, spec)
    np.testing.assert_array_equal(np.asarray(out_t), np.asarray(out_f))
    # Flat tables get flat gradients (autodiff through the normalization).
    g = jax.grad(lambda t: jnp.sum(
        _encode_custom(_as_level_tuple(t, spec), pos, spec, True)))(flat)
    assert g.shape == flat.shape


def test_hashgrid_custom_vjp_recompute_path_matches_saved(monkeypatch):
    # Above _RESIDUAL_BYTES_CAP_PER_CALL the backward recomputes
    # rows/weights from positions instead of using saved residuals; both
    # paths must produce identical gradients.
    from nerf_hugs_tpu.ops import hashgrid as hg
    spec = HashGridSpec(num_levels=3, features_per_level=2,
                        log2_hashmap_size=10, base_res=4, max_res=16,
                        bwd_dtype="float32")
    tup = rand_table(spec, jax.random.PRNGKey(0))
    pos = jax.random.uniform(jax.random.PRNGKey(1), (97, 3))
    cot = jax.random.normal(jax.random.PRNGKey(2), (97, spec.output_dim))
    loss = lambda t: jnp.sum(hg._encode_custom(t, pos, spec, True) * cot)
    g_saved = jax.grad(loss)(tup)
    monkeypatch.setattr(hg, "_RESIDUAL_BYTES_CAP_PER_CALL", 0)
    g_recompute = jax.grad(loss)(tup)
    for a, b in zip(g_saved, g_recompute):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_hashgrid_residuals_save_only_base_corner_rows(monkeypatch):
    # The custom-VJP forward saves only the 2^(d-k) base-corner rows the
    # packed backward keys on (weights stay full [2^d, n]); the cap
    # accounting must match the saved footprint, and disabling the packed
    # backward restores the full row set.
    from nerf_hugs_tpu.ops import hashgrid as hg
    spec = HashGridSpec(num_levels=3, features_per_level=2,
                        log2_hashmap_size=10, base_res=4, max_res=16,
                        hash_impl="add", bwd_dtype="float32")
    tup = rand_table(spec, jax.random.PRNGKey(0))
    pos = jax.random.uniform(jax.random.PRNGKey(1), (65, 3))

    def saved_rows(env):
        for key, val in env.items():
            monkeypatch.setenv(key, val)
        _, (_, _, rw) = hg._encode_custom_fwd(tup, pos, spec, True)
        for key in env:
            monkeypatch.delenv(key)
        return [r.shape[0] for r, _ in rw], [w.shape[0] for _, w in rw]

    # Pair tier everywhere (every level packable under hash_impl='add').
    rows_n, weights_n = saved_rows({"NERF_HUGS_PACK_BWD": "1",
                                    "NERF_HUGS_QUAD_DENSE_MIN_ROWS": "0"})
    assert rows_n == [4, 4, 4] and weights_n == [8, 8, 8]
    # Quad tier (threshold 1 row -> every level).
    rows_n, _ = saved_rows({"NERF_HUGS_PACK_BWD": "1",
                            "NERF_HUGS_QUAD_DENSE_MIN_ROWS": "1"})
    assert rows_n == [2, 2, 2]
    # Packed backward off -> the full corner set is saved again.
    rows_n, _ = saved_rows({"NERF_HUGS_PACK_BWD": "0"})
    assert rows_n == [8, 8, 8]


@pytest.mark.parametrize("hash_impl", ["xor", "add"])
def test_hashgrid_packed_bwd_matches_unpacked(monkeypatch, hash_impl):
    # The corner-packed backward (NERF_HUGS_PACK_BWD=1: base-corner keys,
    # 2^k*F augmented payload columns, roll-fold) must reproduce the
    # unpacked sorted-scatter gradient on dense levels (both hash modes)
    # and hashed levels (hash_impl='add'), at pair and quad tiers,
    # through the real custom VJP in interpret mode.
    from nerf_hugs_tpu.ops.hashgrid import _encode_custom
    spec = HashGridSpec(num_levels=4, features_per_level=2,
                        log2_hashmap_size=10, base_res=4, max_res=32,
                        bwd_dtype="float32", hash_impl=hash_impl)
    table = rand_table(spec, jax.random.PRNGKey(5))
    pos = np.concatenate([
        np.random.RandomState(6).rand(97, 3).astype(np.float32),
        np.ones((1, 3), np.float32)])
    cot = jax.random.normal(jax.random.PRNGKey(7), (98, spec.output_dim))
    loss = lambda t: jnp.sum(_encode_custom(t, jnp.asarray(pos), spec, True)
                             * cot)
    monkeypatch.setenv("NERF_HUGS_PACK_BWD", "0")  # packed is the default now
    g_unpacked = jax.grad(loss)(table)
    for quad in ("0", "1"):
        monkeypatch.setenv("NERF_HUGS_PACK_BWD", "1")
        monkeypatch.setenv("NERF_HUGS_QUAD_DENSE_MIN_ROWS", quad)
        g_packed = jax.grad(loss)(table)
        for a, b in zip(g_packed, g_unpacked):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)
        monkeypatch.delenv("NERF_HUGS_PACK_BWD")
        monkeypatch.delenv("NERF_HUGS_QUAD_DENSE_MIN_ROWS")


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
    # Wider even f (the packed-backward augmented columns): every pair
    # rides its own int32 payload; feature order must survive the
    # pack/unpack round-trip. Distinct scales per feature catch swaps.
    f8 = 8
    vals8 = jax.random.normal(jax.random.PRNGKey(2), (K, f8), jnp.float32)
    vals8 = vals8 * (10.0 ** jnp.arange(-3, 5, dtype=jnp.float32))
    got8 = hashgrid_bwd.block_segment_sum(keys, vals8, T, "bfloat16",
                                          True).reshape(T, f8)
    want8 = jnp.zeros((T, f8)).at[keys].add(
        vals8.astype(jnp.bfloat16).astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(got8), np.asarray(want8),
                               rtol=1e-4, atol=1e-5)
    # feature_major returns the kernel-native [F, T] untransposed.
    got8_fm = hashgrid_bwd.block_segment_sum(keys, vals8, T, "bfloat16",
                                             True, feature_major=True)
    np.testing.assert_array_equal(np.asarray(got8_fm.T.reshape(-1)),
                                  np.asarray(got8.reshape(-1)))


def test_hashgrid_pair_dense_matches_default(monkeypatch):
    # The paired-corner fetch on dense levels (default on) must be
    # numerically identical to the per-corner path (NERF_HUGS_PAIR_DENSE=0)
    # — same adds, same order per feature, just fetched 2 corners per
    # descriptor.
    spec = make_spec()
    table = rand_table(spec, jax.random.PRNGKey(2))
    pos = np.concatenate([
        np.random.RandomState(5).rand(128, 3).astype(np.float32),
        np.ones((1, 3), np.float32)])  # x==1 edge exercises the pair wrap
    monkeypatch.setenv("NERF_HUGS_PAIR_DENSE", "0")
    base = np.asarray(hashgrid_encode(table, jnp.asarray(pos), spec))
    monkeypatch.delenv("NERF_HUGS_PAIR_DENSE")
    paired = np.asarray(hashgrid_encode(table, jnp.asarray(pos), spec))
    np.testing.assert_allclose(paired, base, rtol=1e-6, atol=1e-6)
    want = numpy_tcnn_encode(table, pos, spec)
    np.testing.assert_allclose(paired, want, rtol=1e-5, atol=1e-5)


def test_hashgrid_quad_oct_pack_matches_oracle(monkeypatch):
    # Size-gated quad (k=2, [T, 4F] rows) and oct (k=3, [T, 8F] rows)
    # dense-level packing (NERF_HUGS_{QUAD,OCT}_DENSE_MIN_ROWS) must match
    # the numpy tcnn oracle and the per-corner path, including the grid-edge
    # wrap in every packed dim and gradients through the packed gathers.
    spec = make_spec()
    table = rand_table(spec, jax.random.PRNGKey(9))
    pos = np.concatenate([
        np.random.RandomState(11).rand(96, 3).astype(np.float32),
        np.ones((1, 3), np.float32),                     # all-edge corner
        np.array([[1.0, 0.3, 0.7], [0.3, 1.0, 0.7],      # per-dim edges
                  [0.3, 0.7, 1.0]], np.float32)])
    want = numpy_tcnn_encode(table, pos, spec)
    monkeypatch.setenv("NERF_HUGS_PAIR_DENSE", "0")
    base = np.asarray(hashgrid_encode(table, jnp.asarray(pos), spec))
    monkeypatch.delenv("NERF_HUGS_PAIR_DENSE")

    def loss(tab, env):
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        return jnp.sum(jnp.cos(hashgrid_encode(tab, jnp.asarray(pos), spec)))

    g_base = jax.grad(loss)(table, {"NERF_HUGS_PAIR_DENSE": "0"})
    monkeypatch.delenv("NERF_HUGS_PAIR_DENSE")
    for env in ({"NERF_HUGS_QUAD_DENSE_MIN_ROWS": "1"},
                {"NERF_HUGS_QUAD_DENSE_MIN_ROWS": "1",
                 "NERF_HUGS_OCT_DENSE_MIN_ROWS": "1"}):
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        got = np.asarray(hashgrid_encode(table, jnp.asarray(pos), spec))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(got, base, rtol=1e-6, atol=1e-6)
        g_packed = jax.grad(loss)(table, env)
        for ga, gb in zip(g_packed, g_base):
            np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                       rtol=1e-5, atol=1e-6)
        for k in env:
            monkeypatch.delenv(k)


def test_hashgrid_add_hash_matches_oracle_and_packs(monkeypatch):
    # hash_impl='add' (TPU-native packable hash): (1) matches the numpy
    # oracle's additive-hash arm with packing disabled; (2) the packed
    # hashed-level fetch (pair/quad via the augmented stride-p_d tables) is
    # bit-compatible with the unpacked path, including uint32 wrap at the
    # mask boundary, and gradients flow identically through the packed
    # gathers (concat+roll are linear).
    spec = make_spec(hash_impl="add")
    assert spec.pack_strides(2) is not None          # hashed level, packable
    assert spec.pack_strides(0) == [1, 4, 16]        # dense level strides
    table = rand_table(spec, jax.random.PRNGKey(13))
    pos = np.concatenate([
        np.random.RandomState(17).rand(128, 3).astype(np.float32),
        np.zeros((1, 3), np.float32),
        np.ones((1, 3), np.float32)])
    want = numpy_tcnn_encode(table, pos, spec)
    monkeypatch.setenv("NERF_HUGS_PAIR_DENSE", "0")
    base = np.asarray(hashgrid_encode(table, jnp.asarray(pos), spec))
    np.testing.assert_allclose(base, want, rtol=1e-5, atol=1e-5)
    # The additive hash is a DIFFERENT function from tcnn's xor hash.
    xor_out = np.asarray(hashgrid_encode(
        table, jnp.asarray(pos), make_spec(hash_impl="xor")))
    assert not np.allclose(xor_out, want, atol=1e-3)

    def loss(tab, env):
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        return jnp.sum(jnp.sin(hashgrid_encode(tab, jnp.asarray(pos), spec)))

    g_base = jax.grad(loss)(table, {"NERF_HUGS_PAIR_DENSE": "0"})
    monkeypatch.delenv("NERF_HUGS_PAIR_DENSE")
    for env in ({}, {"NERF_HUGS_QUAD_DENSE_MIN_ROWS": "1"}):
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        got = np.asarray(hashgrid_encode(table, jnp.asarray(pos), spec))
        np.testing.assert_allclose(got, base, rtol=1e-6, atol=1e-6)
        g_packed = jax.grad(loss)(table, env)
        for ga, gb in zip(g_packed, g_base):
            np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                       rtol=1e-5, atol=1e-6)
        for k in env:
            monkeypatch.delenv(k)


def test_hashgrid_mxu_deinterleave_matches_default(monkeypatch):
    # The MXU one-hot de-interleave (NERF_HUGS_MXU_DEINTERLEAVE=1) replaces
    # the strided vals[:, j] reads with an exact 0/1 selection matmul at
    # HIGHEST precision — outputs and gradients must match the strided path
    # bit-for-bit-ish on both the paired-dense and hashed-level branches.
    spec = make_spec()
    table = rand_table(spec, jax.random.PRNGKey(3))
    # n = 128 is divisible by every 128//cols, so the MXU branch is taken
    # for both [n, 2F] (paired dense) and [n, F] (hashed) gather outputs.
    pos = np.random.RandomState(7).rand(128, 3).astype(np.float32)

    def loss(tab):
        return jnp.sum(jnp.sin(hashgrid_encode(tab, jnp.asarray(pos), spec)))

    monkeypatch.setenv("NERF_HUGS_MXU_DEINTERLEAVE", "0")
    base = np.asarray(hashgrid_encode(table, jnp.asarray(pos), spec))
    g_base = jax.grad(loss)(table)
    monkeypatch.setenv("NERF_HUGS_MXU_DEINTERLEAVE", "1")
    mxu = np.asarray(hashgrid_encode(table, jnp.asarray(pos), spec))
    g_mxu = jax.grad(loss)(table)
    np.testing.assert_allclose(mxu, base, rtol=1e-6, atol=1e-6)
    for ga, gb in zip(g_mxu, g_base):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   rtol=1e-6, atol=1e-6)
    # Odd n falls back to the strided path (shape guard), still correct.
    pos_odd = np.random.RandomState(8).rand(129, 3).astype(np.float32)
    want = numpy_tcnn_encode(table, pos_odd, spec)
    got = np.asarray(hashgrid_encode(table, jnp.asarray(pos_odd), spec))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(mxu, numpy_tcnn_encode(table, pos, spec),
                               rtol=1e-5, atol=1e-5)
