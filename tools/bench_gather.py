"""Microbenchmark: TPU gather/scatter cost model for the hash-grid redesign.

Round-1 finding (CLAUDE.md): XLA TPU gather is pinned at ~100M lookups/s
regardless of table size / sortedness / complex-pairing, i.e. the cost is
per-INDEX, not per-byte. If that holds, the fix is fewer, fatter gathers:
one (2,2,2,F) slice-gather per sample per level (8 corner features in one
index) instead of 8xF scalar gathers. This tool measures whether slice
gathers actually pay per-index, and what scatter-add (the backward) costs.

Run on the real TPU:  python tools/bench_gather.py [N_log2]
"""
from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=4):
    fn = jax.jit(fn)
    out = fn(*args)
    float(jnp.sum(out))  # force through the tunnel
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters


def main():
    n_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 23
    N = 1 << n_log2          # number of gather indices
    T = 1 << 21              # table entries
    key = jax.random.PRNGKey(0)
    kt, ki = jax.random.split(key)
    results = {}

    def report(name, dt, n_idx, nbytes):
        results[name] = dt
        print(f"{name:44s} {dt*1e3:8.2f} ms   {n_idx/dt/1e6:9.1f} M idx/s   "
              f"{nbytes/dt/1e9:7.1f} GB/s", flush=True)

    # --- 1-D single-element gather (round-1 baseline) ---
    table1 = jax.random.normal(kt, (T * 2,), jnp.float32)
    idx = jax.random.randint(ki, (N,), 0, T * 2 - 2, jnp.int32)
    dt = timeit(lambda t, i: jnp.take(t, i, axis=0), table1, idx)
    report("1D take singles", dt, N, N * 4)

    # --- row gathers: [T, R] rows, N/scale indices to keep bytes comparable
    for rows, width in [(T, 2), (T // 8, 16), (T // 32, 64), (T // 64, 128)]:
        tab = jax.random.normal(kt, (rows, width), jnp.float32)
        nidx = N // max(1, width // 2)
        ridx = jax.random.randint(ki, (nidx,), 0, rows, jnp.int32)
        dt = timeit(lambda t, i: jnp.take(t, i, axis=0), tab, ridx)
        report(f"row gather [{rows},{width}] ({width*4}B rows)", dt, nidx,
               nidx * width * 4)

    # --- 3-D slice gather (2,2,2F) — the tiled-grid corner fetch ---
    for dims, F in [((128, 128, 128), 2), ((64, 64, 64), 2)]:
        Dz, Dy, Dx = dims
        tab = jax.random.normal(kt, (Dz + 1, Dy + 1, (Dx + 1) * F), jnp.float32)
        nidx = N // 8
        k1, k2, k3 = jax.random.split(ki, 3)
        iz = jax.random.randint(k1, (nidx,), 0, Dz, jnp.int32)
        iy = jax.random.randint(k2, (nidx,), 0, Dy, jnp.int32)
        ix = jax.random.randint(k3, (nidx,), 0, Dx, jnp.int32)

        def g3(t, iz, iy, ix):
            starts = jnp.stack([iz, iy, ix * F], axis=-1)
            dn = jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2, 3), collapsed_slice_dims=(),
                start_index_map=(0, 1, 2))
            return jax.lax.gather(t, starts, dn, (2, 2, 2 * F),
                                  mode=jax.lax.GatherScatterMode.CLIP)
        dt = timeit(g3, tab, iz, iy, ix)
        report(f"3D slice gather (2,2,{2*F}) from {dims}", dt, nidx,
               nidx * 8 * F * 4)

    # --- 2-D slice gather (2, 2F) ---
    F = 2
    tab = jax.random.normal(kt, (T // 128, 128 * F), jnp.float32)
    nidx = N // 4
    k1, k2 = jax.random.split(ki)
    iy = jax.random.randint(k1, (nidx,), 0, T // 128 - 2, jnp.int32)
    ix = jax.random.randint(k2, (nidx,), 0, 126, jnp.int32)

    def g2(t, iy, ix):
        starts = jnp.stack([iy, ix * F], axis=-1)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0, 1))
        return jax.lax.gather(t, starts, dn, (2, 2 * F),
                              mode=jax.lax.GatherScatterMode.CLIP)
    dt = timeit(g2, tab, iy, ix)
    report("2D slice gather (2,4)", dt, nidx, nidx * 4 * F * 4)

    # --- 1-D slice gather of 4 contiguous floats ---
    nidx = N // 2
    sidx = jax.random.randint(ki, (nidx,), 0, T * 2 - 4, jnp.int32)

    def g1s(t, i):
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,))
        return jax.lax.gather(t, i[:, None], dn, (4,),
                              mode=jax.lax.GatherScatterMode.CLIP)
    dt = timeit(g1s, table1, sidx)
    report("1D slice gather (4,)", dt, nidx, nidx * 16)

    # --- scatter-add: 1-D singles and row scatters ---
    upd1 = jax.random.normal(ki, (N,), jnp.float32)
    dt = timeit(lambda t, i, u: t.at[i].add(u), table1, idx, upd1)
    report("1D scatter-add singles", dt, N, N * 4)

    tab16 = jax.random.normal(kt, (T // 8, 16), jnp.float32)
    nidx = N // 8
    ridx = jax.random.randint(ki, (nidx,), 0, T // 8, jnp.int32)
    updr = jax.random.normal(ki, (nidx, 16), jnp.float32)
    dt = timeit(lambda t, i, u: t.at[i].add(u), tab16, ridx, updr)
    report("row scatter-add [T/8,16]", dt, nidx, nidx * 64)

    # 3-D slice scatter-add (2,2,4)
    Dz = Dy = Dx = 128
    tab3 = jax.random.normal(kt, (Dz + 1, Dy + 1, (Dx + 1) * 2), jnp.float32)
    nidx = N // 8
    upd3 = jax.random.normal(ki, (nidx, 2, 2, 4), jnp.float32)

    def s3(t, iz, iy, ix, u):
        starts = jnp.stack([iz, iy, ix * 2], axis=-1)
        dn = jax.lax.ScatterDimensionNumbers(
            update_window_dims=(1, 2, 3), inserted_window_dims=(),
            scatter_dims_to_operand_dims=(0, 1, 2))
        return jax.lax.scatter_add(t, starts, u, dn,
                                   mode=jax.lax.GatherScatterMode.CLIP)
    k1, k2, k3 = jax.random.split(ki, 3)
    iz = jax.random.randint(k1, (nidx,), 0, Dz, jnp.int32)
    iy = jax.random.randint(k2, (nidx,), 0, Dy, jnp.int32)
    ix = jax.random.randint(k3, (nidx,), 0, Dx, jnp.int32)
    dt = timeit(s3, tab3, iz, iy, ix, upd3)
    report("3D slice scatter-add (2,2,4)", dt, nidx, nidx * 64)

    # --- sort (for a dedup/segment-sum alternative) ---
    dt = timeit(lambda x: jnp.sort(x), idx)
    report("sort int32", dt, N, N * 4)
    vals = jax.random.normal(ki, (N,), jnp.float32)
    dt = timeit(lambda k, v: jax.lax.sort([k, v], num_keys=1)[0], idx, vals)
    report("sort int32 + f32 payload", dt, N, N * 8)

    # --- segment-sum via one-hot matmul for small bins (dense-level bwd) ---
    for bins in (4096,):
        bidx = jax.random.randint(ki, (N // 4,), 0, bins, jnp.int32)
        bval = jax.random.normal(ki, (N // 4,), jnp.float32)

        def seg(i, v):
            return jax.ops.segment_sum(v, i, num_segments=bins)
        dt = timeit(seg, bidx, bval)
        report(f"segment_sum {bins} bins", dt, N // 4, N)


if __name__ == "__main__":
    main()
