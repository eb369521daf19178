"""Microbench: can paired-corner fetches beat 8 single-corner row gathers?

For DENSE hash-grid levels the x-neighbor corner is the adjacent table row
(stride 1 in the flat layout, ops/hashgrid.py _dim_terms), so an augmented
table T2[i] = [T[i] | T[i+1]]  ([C, 2F], 16B rows) fetches 2 corners per
DMA descriptor — 4 gathers/level instead of 8. T4 extends to y-pairs
([C, 4F], 32B rows) -> 2 gathers/level. Whether this wins depends on the
16B/32B row-gather rate, which docs/tpu_gather_cost_model.md never
measured (only 8B @ ~155-215M and 64B @ 50M idx/s).

Run on the real TPU: python tools/bench_pair_gather.py [n_log2]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=4):
    f = jax.jit(fn)
    out = f(*args)
    jax.tree_util.tree_map(lambda x: float(x.ravel()[0]), out)  # device_get
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.tree_util.tree_map(lambda x: float(x.ravel()[0]), out)
    return (time.perf_counter() - t0) / iters


def main():
    n_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 23
    N = 1 << n_log2  # lookups (samples); per level a corner gather is N idx
    key = jax.random.PRNGKey(0)
    kt, ki = jax.random.split(key)

    # Dense-level table sizes: (N_l+1)^3 for resolutions 16..126 — the dense
    # prefix at kubric_nerfacto_base shapes — plus one hashed-size control.
    for C in (4913, 50653, 274625, 2048383):
        print(f"--- table C={C} rows ---", flush=True)
        for width, n_gathers, tag in ((2, 8, "8x single-corner (8B)"),
                                      (4, 4, "4x paired-x (16B)"),
                                      (8, 2, "2x quad-xy (32B)")):
            tab = jax.random.normal(kt, (C, width), jnp.float32)
            idx = jax.random.randint(ki, (n_gathers, N), 0, C, jnp.int32)

            def run(t, i):
                # Planar accumulation: a [N, width] accumulator invites the
                # (8,128)-tiled row-major padding (64x on width=2 — OOMs).
                acc = jnp.zeros((N,))
                for g in range(n_gathers):
                    v = jnp.take(t, i[g], axis=0)
                    for j in range(width):
                        acc = acc + v[:, j]
                return acc

            dt = timeit(run, tab, idx)
            n_desc = n_gathers * N
            print(f"  {tag:28s} {dt*1e3:8.2f} ms  "
                  f"{n_desc/dt/1e6:8.1f} M desc/s  "
                  f"{8*N/dt/1e6:8.1f} M corner/s-equiv", flush=True)


if __name__ == "__main__":
    main()
