"""Microbench: attack the ~160 ms/step of residual row->column-major copies
on hash-grid gather outputs (VERDICT r3 #4).

The planar-accumulator forward (ops/hashgrid.py _encode_impl) reads
per-feature columns `vals[:, j]` of every [n, 2F] corner-gather output;
XLA's layout assignment answers with row->column conversion copies next to
the strided readers (docs/tpu_gather_cost_model.md, accumulator A/B).
Candidates measured here, at one dense level's real shape
(kubric_nerfacto_base final field: n = 16384 x 128 samples, F = 2,
paired-corner 16B rows):

  A. planar (current production form) — baseline including the copies;
  B. transposed-output gather: lax.gather with offset_dims=(0,) emits
     [2F, n] directly, so feature reads are contiguous rows. ROUND-4
     VERDICT: 143M vs A's 190M desc/s at both shapes — dead end, skipped
     by default (--all re-enables);
  C. Pallas accumulate kernel: consumes the row-major gather outputs +
     weights and emits planar [n] accumulators in one pass — the relayout
     happens once inside the kernel instead of as XLA copies. Round 4
     failed to compile (VMEM stack OOM 20.04M vs 16M: double-buffered
     [4096, 4] blocks lane-pad to [4096, 128] = 2 MB x 5 operands x 2
     buffers); round 5 blocks n at 1024;
  D. quad-xy packing ([C, 4F] 32B rows, 2 descriptors/sample) with planar
     accumulation. ROUND-4 VERDICT: 278M desc/s at C=127^3 vs A's 190M,
     but 155M at C=65^3 — size-gated quad landed in ops/hashgrid.py
     (NERF_HUGS_QUAD_DENSE_MIN_ROWS); this sweep pins the crossover;
  E. MXU one-hot de-interleave. ROUND-4 VERDICT: 148M desc/s micro, +22%
     end-to-end — dead end, skipped by default;
  O. oct-xyz packing ([C, 8F] 64B rows, 1 descriptor/sample) — the k=3
     tier of the same ladder, unmeasured before round 5.

Run on the real TPU:  python tools/bench_fwd_copies.py [n_log2] [--all]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

F = 2  # features_per_level


def timeit(fn, *args, iters=6):
    f = jax.jit(fn)
    out = f(*args)
    jax.tree_util.tree_map(lambda x: float(x.ravel()[0]), out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.tree_util.tree_map(lambda x: float(x.ravel()[0]), out)
    return (time.perf_counter() - t0) / iters


# --- candidates -------------------------------------------------------------

def planar(tab2, idx, w):
    """A: current production form. tab2 [C, 2F]; idx [4, n]; w [8, n]."""
    accs = [jnp.zeros((idx.shape[1],)) for _ in range(F)]
    for c in range(4):
        vals = jnp.take(tab2, idx[c], axis=0)          # [n, 2F]
        for j in range(F):
            accs[j] = (accs[j] + w[c] * vals[:, j]
                       + w[c + 4] * vals[:, F + j])
    return jnp.stack(accs, axis=-1)


def gather_t(tab2, rows):
    """[C, W] gathered at rows [n] -> [W, n] (slice dim leads the output)."""
    dnums = lax.GatherDimensionNumbers(
        offset_dims=(0,), collapsed_slice_dims=(0,), start_index_map=(0,))
    return lax.gather(tab2, rows[:, None], dnums,
                      slice_sizes=(1, tab2.shape[1]))   # [2F, n]


def transposed(tab2, idx, w):
    """B: transposed-output gather; feature reads are contiguous."""
    accs = [jnp.zeros((idx.shape[1],)) for _ in range(F)]
    for c in range(4):
        vals_t = gather_t(tab2, idx[c])                 # [2F, n]
        for j in range(F):
            accs[j] = (accs[j] + w[c] * vals_t[j]
                       + w[c + 4] * vals_t[F + j])
    return jnp.stack(accs, axis=-1)


def _accum_kernel(v0, v1, v2, v3, w, o):
    vs = (v0, v1, v2, v3)
    for j in range(F):
        acc = jnp.zeros(o.shape[:1], jnp.float32)
        for c in range(4):
            vals = vs[c][...]
            acc = (acc + w[c, :] * vals[:, j]
                   + w[c + 4, :] * vals[:, F + j])
        o[:, j] = acc


def pallas_accum(tab2, idx, w, block=1024):
    """C: gathers stay XLA; the weighted planar accumulation is one Pallas
    pass over the row-major gather outputs."""
    from jax.experimental import pallas as pl
    n = idx.shape[1]
    vals = [jnp.take(tab2, idx[c], axis=0) for c in range(4)]  # [n, 2F] x4
    vspec = pl.BlockSpec((block, 2 * F), lambda i: (i, 0))
    wspec = pl.BlockSpec((8, block), lambda i: (0, i))
    out = pl.pallas_call(
        _accum_kernel,
        grid=(n // block,),
        in_specs=[vspec] * 4 + [wspec],
        out_specs=pl.BlockSpec((block, F), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, F), jnp.float32),
    )(*vals, w)
    return out


def quad(tab4, idx2, w):
    """D: 32B rows fetch 4 corners per descriptor (2 gathers/sample)."""
    accs = [jnp.zeros((idx2.shape[1],)) for _ in range(F)]
    for c in range(2):
        vals = jnp.take(tab4, idx2[c], axis=0)          # [n, 4F]
        for q in range(4):
            for j in range(F):
                accs[j] = accs[j] + w[c * 4 + q] * vals[:, q * F + j]
    return jnp.stack(accs, axis=-1)


def oct_pack(tab8, idx1, w):
    """O: 64B rows fetch all 8 corners per descriptor (1 gather/sample)."""
    accs = [jnp.zeros((idx1.shape[0],)) for _ in range(F)]
    vals = jnp.take(tab8, idx1, axis=0)                 # [n, 8F]
    for q in range(8):
        for j in range(F):
            accs[j] = accs[j] + w[q] * vals[:, q * F + j]
    return jnp.stack(accs, axis=-1)


def _selection_matrix(cols):
    """Constant [128, 128] one-hot S with S[s*cols + j, j*(128//cols) + s] = 1:
    right-multiplying a [m, 128] row-major block of (128//cols) samples x cols
    features de-interleaves it into cols planar [m, 128//cols] lane groups —
    the transpose happens on the MXU instead of as an XLA conversion copy
    (same trick as the backward's one-hot segment-sum, ops/hashgrid_bwd.py)."""
    g = 128 // cols
    s_mat = np.zeros((128, 128), np.float32)
    for s in range(g):
        for j in range(cols):
            s_mat[s * cols + j, j * g + s] = 1.0
    return jnp.asarray(s_mat)


def mxu_transpose(tab2, idx, w):
    """E: row-major gathers + MXU one-hot de-interleave to planar columns."""
    cols = 2 * F
    g = 128 // cols                      # samples per 128-lane row
    n = idx.shape[1]
    s_mat = _selection_matrix(cols)
    accs = [jnp.zeros((n,)) for _ in range(F)]
    for c in range(4):
        vals = jnp.take(tab2, idx[c], axis=0)            # [n, 2F] row-major
        flat = vals.reshape(n // g, 128)                  # bitcast view
        # [n//g, 128] -> cols planar [n] vectors: lane group j*g:(j+1)*g of
        # each row holds g consecutive samples of feature j. HIGHEST keeps
        # the 0/1 selection matmul exact (default TPU precision is bf16-like
        # and would truncate the gathered values).
        p = jnp.matmul(flat, s_mat,
                       precision=lax.Precision.HIGHEST).reshape(
                           n // g, cols, g)
        for j in range(F):
            vj = p[:, j, :].reshape(n)
            vfj = p[:, F + j, :].reshape(n)
            accs[j] = accs[j] + w[c] * vj + w[c + 4] * vfj
    return jnp.stack(accs, axis=-1)


def main():
    args = [a for a in sys.argv[1:] if a != "--all"]
    run_all = "--all" in sys.argv[1:]
    n_log2 = int(args[0]) if args else 21
    n = 1 << n_log2   # samples (final field at base shapes: 2^21)
    key = jax.random.PRNGKey(0)
    kt, ki, kw = jax.random.split(key, 3)

    # Dense-level sizes bracketing the quad crossover (N^3 for N in 65..127;
    # levels above 127^3 are hashed at log2 21). 81^3 and 112^3 are the two
    # real kubric_nerfacto_base dense levels in play.
    for N in (65, 81, 97, 113, 127):
        C = N ** 3
        tab2 = jax.random.normal(kt, (C, 2 * F), jnp.float32)
        idx = jax.random.randint(ki, (4, n), 0, C, jnp.int32)
        w = jax.random.uniform(kw, (8, n), jnp.float32)
        # Quad/oct layouts: same corner set packed 4/8-wide; the rebuild
        # (concat+roll, sequential streaming) is timed separately below —
        # production rebuilds once per step inside the jitted graph.
        def build4(t2):
            return jnp.concatenate([t2, jnp.roll(t2, -N, axis=0)], axis=-1)

        def build8(t2):
            t4 = build4(t2)
            return jnp.concatenate([t4, jnp.roll(t4, -N * N, axis=0)],
                                   axis=-1)

        tab4 = jax.jit(build4)(tab2)
        tab8 = jax.jit(build8)(tab2)
        idx2 = idx[:2]
        idx1 = idx[0]

        ref = np.asarray(jax.jit(planar)(tab2, idx, w))
        results = {"A_planar": timeit(planar, tab2, idx, w)}
        try:
            out_c = np.asarray(jax.jit(pallas_accum)(tab2, idx, w))
            np.testing.assert_allclose(out_c, ref, rtol=1e-5, atol=1e-5)
            results["C_pallas_accum"] = timeit(pallas_accum, tab2, idx, w)
        except Exception as e:
            results["C_pallas_accum"] = f"FAILED {type(e).__name__}: {e}"
        try:
            results["D_quad_32B"] = timeit(quad, tab4, idx2, w)
        except Exception as e:
            results["D_quad_32B"] = f"FAILED {type(e).__name__}: {e}"
        try:
            results["O_oct_64B"] = timeit(oct_pack, tab8, idx1, w)
        except Exception as e:
            results["O_oct_64B"] = f"FAILED {type(e).__name__}: {e}"
        results["rebuild4_only"] = timeit(build4, tab2)
        results["rebuild8_only"] = timeit(build8, tab2)
        if run_all:   # round-4 measured dead ends, re-runnable on demand
            try:
                out_b = np.asarray(jax.jit(transposed)(tab2, idx, w))
                np.testing.assert_allclose(out_b, ref, rtol=1e-5, atol=1e-5)
                results["B_transposed_gather"] = timeit(
                    transposed, tab2, idx, w)
            except Exception as e:
                results["B_transposed_gather"] = (
                    f"FAILED {type(e).__name__}: {e}")
            try:
                out_e = np.asarray(jax.jit(mxu_transpose)(tab2, idx, w))
                np.testing.assert_allclose(out_e, ref, rtol=1e-5, atol=1e-5)
                results["E_mxu_deinterleave"] = timeit(
                    mxu_transpose, tab2, idx, w)
            except Exception as e:
                results["E_mxu_deinterleave"] = (
                    f"FAILED {type(e).__name__}: {e}")

        print(f"--- C={C} rows (N={N}), n={n} samples "
              "(4 paired descriptors each) ---", flush=True)
        for k, v in results.items():
            if isinstance(v, float):
                rate = 4 * n / v / 1e6
                print(f"{k:24s} {v * 1e3:8.2f} ms   {rate:7.1f} M desc/s",
                      flush=True)
            else:
                print(f"{k:24s} {v}", flush=True)


if __name__ == "__main__":
    main()
