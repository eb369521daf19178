"""Sorted-scatter table gradient for the hash grid: a Pallas TPU kernel.

Problem: the gather transpose (d loss / d table) is a scatter-add of
K = 2^d * n_samples weighted-gradient rows into the level's [T, F] table.
XLA lowers this to per-element descriptor DMAs at ~93M idx/s (f32 singles;
8-byte rows are 7x worse) — see docs/tpu_gather_cost_model.md. At
kubric_nerfacto_base shapes that is ~10.8 s/step, the round-1 wall.

This module replaces it with (reference op: tiny-cuda-nn's hash-grid
backward scatter, nerfacto/models/nerfacto.py:716-734):

1. `jax.lax.sort` entries by table row id — duplicates become adjacent.
   In the bf16 grad mode (the AMP-parity default) the f=2 value pair is
   packed into ONE int32 payload: 273M vs 215M elem/s measured at 33.5M
   entries, and half the value DMA below.
2. A fixed-iteration batched binary search finds each 256-row table block's
   contiguous slice of the sorted entry array.
3. A Pallas kernel grids over table blocks. Each step DMAs its entry slice
   from HBM in 2048-entry chunks (keys and each feature column as [1, K]
   lane-major streams — the layout DMA slicing likes) and computes
       block_grad[r, f] += sum_e onehot[r, e] * vals[f, e]
   as an MXU dot_general contracting the entry (lane) dim of both sides.
   The one-hot is built on the fly from a sublane-iota compare (~0.25 VPU
   ops per entry, no transposes). Duplicate rows simply accumulate through
   the matmul — the one-hot matmul IS the segment sum. Skewed rows
   (millions of entries hashing into one block) just extend that block's
   chunk loop; correctness never depends on a per-block capacity.

The matmul runs in bf16 by default with fp32 accumulation — the same grad
precision class as the reference's AMP-fp16 training (nerfacto/train.py:
199-207); pass val_dtype='float32' for strict-parity tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_R = 256   # table rows per grid step (sublane-dim of the one-hot)
CHUNK = 2048    # sorted entries DMA'd per inner iteration (128-multiple)


def _kernel(starts_ref, keys_ref, *vrefs_out_scratch, block_r, chunk, f,
            val_dtype, packed=False):
    # `packed`: each bf16 value PAIR rides one int32 stream (even feature
    # low bits, odd high) — half the sort payload and half the value DMA
    # traffic. f=2 is the classic case; the packed-backward path
    # (hashgrid._encode_custom_bwd) brings f = 2^k * F augmented columns.
    nv = f // 2 if packed else f
    vals_refs = vrefs_out_scratch[:nv]
    out_ref = vrefs_out_scratch[nv]
    kbuf = vrefs_out_scratch[nv + 1]
    vbufs = vrefs_out_scratch[nv + 2:nv + 2 + nv]
    sems = vrefs_out_scratch[nv + 2 + nv]
    acc_ref = vrefs_out_scratch[nv + 2 + nv + 1]
    j = pl.program_id(0)
    s = starts_ref[j]
    e = starts_ref[j + 1]
    acc_ref[:] = jnp.zeros_like(acc_ref)
    start0 = pl.multiple_of((s // 128) * 128, 128)
    nchunks = pl.cdiv(e - start0, chunk)

    def copies(c, slot):
        st = pl.multiple_of(start0 + c * chunk, 128)
        cps = [pltpu.make_async_copy(
            keys_ref.at[:, pl.ds(st, chunk)], kbuf.at[slot], sems.at[slot, 0])]
        for i in range(nv):
            cps.append(pltpu.make_async_copy(
                vals_refs[i].at[:, pl.ds(st, chunk)], vbufs[i].at[slot],
                sems.at[slot, 1 + i]))
        return cps

    @pl.when(nchunks > 0)
    def _():
        for cp in copies(0, 0):
            cp.start()

    def body(c, carry):
        slot = jax.lax.rem(c, 2)
        # Double buffer: start the next chunk's DMAs before waiting on this
        # one (the chunk loop is otherwise DMA-latency bound).
        @pl.when(c + 1 < nchunks)
        def _():
            for cp in copies(c + 1, jax.lax.rem(c + 1, 2)):
                cp.start()
        for cp in copies(c, slot):
            cp.wait()
        st = pl.multiple_of(start0 + c * chunk, 128)
        rel = kbuf[slot] - j * block_r                    # [1, chunk]
        epos = st + jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        valid = (epos >= s) & (epos < e)
        iota_r = jax.lax.broadcasted_iota(jnp.int32, (block_r, chunk), 0)
        oh = ((iota_r == rel) & valid).astype(val_dtype)  # [block_r, chunk]
        if packed:
            # Unpack each bf16 pair from its int32 lane: f32 bits are the
            # bf16 bits << 16 (exact), so two shifts + bitcasts suffice.
            parts = []
            for i in range(nv):
                p = vbufs[i][slot]                        # [1, chunk] i32
                parts.append(pltpu.bitcast(
                    jax.lax.shift_left(p, 16), jnp.float32))
                parts.append(pltpu.bitcast(
                    jax.lax.bitwise_and(p, jnp.int32(-65536)), jnp.float32))
            v = jnp.concatenate(parts, axis=0).astype(val_dtype)
        else:
            # Streams stay f32 in HBM ([1, N] bf16 would (2,128)-tile and
            # break DMA slicing); cast to the matmul dtype here.
            v = jnp.concatenate([vb[slot] for vb in vbufs],
                                axis=0).astype(val_dtype)  # [f, chunk]
        # Contract the entry dim of both operands: [block_r, f]. The MXU's
        # default f32 "dot" is a single bf16 pass — force HIGHEST when the
        # caller asked for strict f32 grads.
        precision = (jax.lax.Precision.HIGHEST
                     if val_dtype == jnp.float32 else None)
        acc_ref[:] += jax.lax.dot_general(
            oh, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        return carry

    jax.lax.fori_loop(0, nchunks, body, 0)
    # Emit feature-major [f, block_r]: a [T, F] pallas output is row-major
    # tiled, which would propagate 64x-padded layouts into grads/opt state;
    # the caller transposes to the flat feature-minor parameter layout.
    out_ref[:] = acc_ref[:].T


def _bisect_left(keys_sorted: jnp.ndarray, bounds: jnp.ndarray,
                 k: int) -> jnp.ndarray:
    """Leftmost insertion positions of `bounds` in sorted keys (static K)."""
    lo = jnp.zeros_like(bounds)
    hi = jnp.full_like(bounds, k)
    for _ in range(max(1, int(np.ceil(np.log2(k + 1))) + 1)):
        mid = (lo + hi) // 2
        kv = jnp.take(keys_sorted, jnp.clip(mid, 0, k - 1), axis=0)
        active = lo < hi
        pred = kv < bounds
        lo = jnp.where(active & pred, mid + 1, lo)
        hi = jnp.where(active & ~pred, mid, hi)
    return lo


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def block_segment_sum(keys: jnp.ndarray, vals, table_size: int,
                      val_dtype: str = "bfloat16",
                      interpret: bool = False,
                      feature_major: bool = False) -> jnp.ndarray:
    """sum vals[k] into out rows: [K] int32 x F arrays of [K] -> flat [T*F].

    vals is a tuple of per-feature 1-D columns, and the output is the
    feature-minor FLAT table gradient — 1-D end to end, because any [*, F]
    array in the surrounding graph risks XLA's 64x tiled-layout padding on
    the 2-wide axis. Equivalent to
    `jnp.zeros((T, F)).at[keys].add(stack(vals, -1)).reshape(-1)` but ~5x
    faster on TPU: sort + streaming block matmuls instead of per-element
    scatter.

    feature_major=True instead returns the kernel's native [F, T] output
    (one [T] row vector per feature) — the packed-backward fold wants
    per-column 1-D rolls before re-interleaving.
    """
    if hasattr(vals, "ndim"):  # convenience: accept a [K, F] array too
        vals = tuple(vals[:, j] for j in range(vals.shape[1]))
    vals = tuple(vals)
    k = int(keys.shape[0])
    f = len(vals)
    if k == 0:
        return jnp.zeros((f, table_size) if feature_major
                         else (table_size * f,), jnp.float32)
    block_r = min(BLOCK_R, table_size)
    assert table_size % block_r == 0, (table_size, block_r)
    nb = table_size // block_r

    # bf16 grads (the AMP-parity default) pack each value PAIR into one
    # int32 sort payload: measured 273M vs 215M elem/s for (key, 2xf32) at
    # 33.5M entries, and half the value-stream DMA in the kernel. The pack
    # (cast+shift+or) fuses into the payload-prep elementwise graph. fp32
    # grads keep per-feature f32 payloads (strict-parity mode).
    packed = (jnp.dtype(val_dtype) == jnp.bfloat16 and f % 2 == 0)
    if packed:
        payload = []
        for pair in range(f // 2):
            lohi = []
            for j in (2 * pair, 2 * pair + 1):
                b16 = jax.lax.bitcast_convert_type(
                    vals[j].astype(jnp.bfloat16),
                    jnp.uint16).astype(jnp.uint32)
                lohi.append(b16)
            payload.append(jax.lax.bitcast_convert_type(
                jnp.bitwise_or(jax.lax.shift_left(lohi[1], jnp.uint32(16)),
                               lohi[0]), jnp.int32))
    else:
        payload = list(vals)
    nv = len(payload)

    ops = jax.lax.sort([keys] + payload, num_keys=1)
    keys_sorted = ops[0]

    bounds = jnp.arange(nb + 1, dtype=jnp.int32) * block_r
    starts = _bisect_left(keys_sorted, bounds, k)                # [nb+1]

    # Pad so any 128-aligned chunk window starting below K stays in bounds.
    k_pad = (k // CHUNK + 2) * CHUNK
    keys_p = jnp.full((1, k_pad), table_size, jnp.int32)
    keys_p = jax.lax.dynamic_update_slice(keys_p, keys_sorted[None, :], (0, 0))
    vals_p = []
    for j in range(nv):
        col = jnp.zeros((1, k_pad), payload[j].dtype)
        vals_p.append(jax.lax.dynamic_update_slice(
            col, ops[1 + j][None, :], (0, 0)))

    kernel = functools.partial(_kernel, block_r=block_r, chunk=CHUNK, f=f,
                               val_dtype=jnp.dtype(val_dtype), packed=packed)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * (1 + nv),
        out_specs=pl.BlockSpec((f, block_r), lambda j, starts: (0, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 1, CHUNK), jnp.int32),
        ] + [pltpu.VMEM((2, 1, CHUNK), p.dtype) for p in payload
             ] + [pltpu.SemaphoreType.DMA((2, 1 + nv)),
                  pltpu.VMEM((block_r, f), jnp.float32)],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((f, table_size), jnp.float32),
        interpret=interpret,
    )(starts, keys_p, *vals_p)
    if feature_major:
        return out
    # [f, T] -> flat feature-minor [T*F] (1-D end to end outside the kernel).
    return out.T.reshape(table_size * f)
