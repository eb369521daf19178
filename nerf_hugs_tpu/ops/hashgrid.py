"""Multiresolution hash-grid encoding (instant-ngp) in JAX for TPU.

The TPU-native replacement for tiny-cuda-nn's HashGrid (reference:
nerfacto/models/nerfacto.py:716-734, SURVEY.md N1). Semantics are
tcnn-EXACT (grid.h), not the instant-ngp paper's idealization — the
reference runs tcnn, and released checkpoints embed these exact choices:
  * scale_l = base * g^l - 1,  N_l = ceil(scale_l) + 1,
    g = exp((ln max - ln base)/(L-1)) (nerfacto.py:713);
  * grid coordinate = x * scale_l + 0.5 (half-cell offset), trilinear
    corner weights from its fractional part;
  * per-level COMPACT tables: min(N_l^d, 2^log2) rows rounded up to a
    multiple of 8; dense linear indexing (stride N_l^dim, wrap mod size)
    while N_l^d fits the cap, else the spatial xor-hash
    (primes 1 / 2654435761 / 805459861) masked to 2^log2;
  * features concatenated over levels.
tools/convert_reference_checkpoint.py maps released tcnn checkpoints onto
this layout level-by-level.

Design driven by the measured v5e cost model (docs/tpu_gather_cost_model.md):

* PARAMETERS are a tuple of per-level FLAT [T*F] tables. Separate
  per-level operands gather ~1.7x faster than slices of one big array
  (and any operand >= 2^24 rows halves the gather rate), and 1-D params
  keep XLA's layout assignment from re-tiling a [*, 2] array row-major —
  a 64x padding that OOMs the optimizer/stats graph at base shapes.

* FORWARD: XLA gather cost is per-index (DMA descriptors), ~215M idx/s
  for 8-byte rows from per-level tables vs ~120M for 4-byte singles. Per
  (level, corner): ONE row gather on the [T, F] view (a free bitcast of
  the flat param) fetching both features — half the index count of the
  round-1 per-feature gathers at a higher rate. Accumulation is PLANAR
  per-feature 1-D (a rank-2 [n, F] accumulator chain made layout
  assignment insert row<->column-major conversion copies on every gather
  output — profiled 210 ms/step at base shapes; and a corner-fused
  gather + rank-3 reshape + reduce gets the 64x padded row-major layout).

* BACKWARD (`use_custom_vjp`): XLA's scatter-add transpose costs ~93M
  idx/s for 4B singles (8B rows: 13M/s) -> 10.8s/step at
  kubric_nerfacto_base shapes. Instead, per level: sort the 8n corner
  (row, w*g) entries by row id (sort = 328M/s), binary-search the sorted
  keys for each 256-row table block's entry range, and run a Pallas kernel
  gridded over table blocks that DMAs its (sorted, contiguous) entries and
  segment-sums them with an on-the-fly one-hot x values matmul on the MXU.
  Random scatter becomes streaming reads + dense writes. ~5x measured
  (ops/hashgrid_bwd.py).

* Gradients w.r.t. POSITIONS are not produced by the custom VJP (returned
  as zeros): every consumer in this codebase feeds stop-gradient sample
  positions (the reference samples under torch.no_grad, nerfacto.py:321),
  pixel coordinates, or ray data. Set `use_custom_vjp=False` to get full
  autodiff through the plain XLA path.

Measured end to end at kubric_nerfacto_base shapes on one v5e: the full
train step went from ~25 s (round-1 XLA formulation) to 3.17 s (with the
proposal-grad cond in models/nerfacto.py; docs/tpu_gather_cost_model.md).
"""

from __future__ import annotations

import dataclasses
import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from nerf_hugs_tpu.ops import hashgrid_bwd

_PRIMES = (1, 2654435761, 805459861)


def _pair_dense_enabled() -> bool:
    """Measured-perf knob: paired-corner fetch on dense levels halves their
    gather descriptor count via the augmented [T, 2F] table (see
    _encode_impl). Default ON — measured on a real v5e it wins at both
    benched shapes (kubric_nerfacto_base 3.17 -> 2.83 s/step avg,
    kubric_nerfacto_tpu 0.794 -> 0.726). NERF_HUGS_PAIR_DENSE=0 restores
    the per-corner path (A/B: tools/bench_pair_gather.py)."""
    import os
    return os.environ.get("NERF_HUGS_PAIR_DENSE", "1") != "0"


def _dense_pack_dims(level_rows: int, num_dims: int) -> int:
    """How many leading dims to corner-pack on a packable level of this size.

    Generalizes the paired-corner fetch: packing k dims gathers all 2^k
    corners that differ only in dims < k with ONE descriptor from an
    augmented [T, 2^k*F] table (built by k concat+roll doublings at the
    per-dim row strides — see _encode_impl), issuing 2^(d-k) descriptors
    per sample instead of 2^d. Applies to dense levels always and to
    hashed levels under hash_impl='add' (whose additive hash makes the
    dim-d neighbor a fixed row stride too — see _corner_combine). Wider
    rows gather slower per descriptor, so higher k only wins on LARGE
    levels: measured on a v5e (tools/bench_fwd_copies.py,
    .runs_r4/q/fwdcopy.log), quad (k=2, 32B rows) is 1.46x pair at a
    127^3-row level but 0.81x at 65^3.

    Gates (rows thresholds; 0 disables the tier):
      NERF_HUGS_QUAD_DENSE_MIN_ROWS  default 1048576 (between the measured
                                     65^3 loss and 127^3 win; refined by the
                                     round-5 sweep)
      NERF_HUGS_OCT_DENSE_MIN_ROWS   default 0 = OFF (k=3, 64B rows —
                                     unmeasured until the round-5 sweep)
    NERF_HUGS_PAIR_DENSE=0 disables all packing (the per-corner path).
    """
    import os
    if not _pair_dense_enabled() or num_dims < 2:
        return 0
    k = 1
    quad_min = int(os.environ.get("NERF_HUGS_QUAD_DENSE_MIN_ROWS", 1 << 20))
    oct_min = int(os.environ.get("NERF_HUGS_OCT_DENSE_MIN_ROWS", 0))
    if quad_min and level_rows >= quad_min and num_dims >= 2:
        k = 2
    # Tiers gate independently on their own thresholds (an oct-only A/B
    # with quad disabled is a valid configuration).
    if oct_min and level_rows >= oct_min and num_dims >= 3:
        k = 3
    return min(k, num_dims)


def _pack_bwd_enabled() -> bool:
    """Measured-perf knob (round 5, DEFAULT ON after the hardware A/B):
    corner-packed BACKWARD on packable levels. Instead of sorting 2^d
    (row, w*g) entries per sample per level, sort only the 2^(d-k) base
    corners with 2^k*F-wide payloads scattering into an AUGMENTED [T,
    2^k*F] gradient, then fold it back onto the table with k streaming
    1-D rolls (the transpose of the forward's concat+roll table build).
    Same total payload bytes, 2^k x fewer sort rows and kernel entries,
    and a wider (MXU-friendlier) segment-sum matmul.

    Measured round-5 v5e A/B (.runs_r5/q/packbwd_*.log, full train steps):
      kubric_nerfacto_base (xor)      2.828 -> 2.663 s/step  (-5.8%)
      kubric_nerfacto_base_addhash    2.072 -> 1.578 s/step  (-23.8%)
      kubric_nerfacto_tpu_addhash     0.571 -> 0.447 s/step  (-21.7%)
    DEFAULT ON since that A/B; NERF_HUGS_PACK_BWD=0 restores the
    per-corner backward."""
    import os
    return os.environ.get("NERF_HUGS_PACK_BWD", "1") == "1"


def _mxu_deinterleave_enabled() -> bool:
    """Measured-perf knob: de-interleave [n, cols] row-major gather outputs
    into planar per-feature columns with one constant 0/1 selection matmul
    on the MXU (the backward segment-sum trick applied to the forward,
    tools/bench_fwd_copies.py candidate E) instead of strided vals[:, j]
    reads, whose row->column conversion copies cost ~160 ms/step at
    kubric_nerfacto_base shapes (docs/tpu_gather_cost_model.md).

    MEASURED DEAD END (round-4 TPU A/B, .runs_r4/q/deinterleave_*.log):
    end-to-end kubric_nerfacto_base 2.827 -> 3.461 s/step (+22%) with ON —
    the one-hot selection matmuls cost more than the strided copies they
    replace (docs/tpu_gather_cost_model.md, "MXU de-interleave" section).
    The gate stays default OFF as a documented negative; the correctness
    test (tests/test_ops.py::test_hashgrid_mxu_deinterleave_matches_default)
    keeps the path honest. Do not enable in production."""
    import os
    return os.environ.get("NERF_HUGS_MXU_DEINTERLEAVE", "0") == "1"


def _base_corner_ids(d_dims: int, k: int):
    """Corner ids with zero offset in every packed dim (dims < k).

    corner_offsets orders dim 0 most-significant, so corner id c has a
    dim-d offset of (c >> (d_dims-1-d)) & 1. The packed fetch/scatter
    iterates these 2^(d-k) base corners; packed group q's bit d (LSB =
    first doubling = dim 0) selects the dim-d neighbor."""
    return [c for c in range(1 << d_dims)
            if all((c >> (d_dims - 1 - d)) & 1 == 0 for d in range(k))]


def _bwd_pack_dims(spec: "HashGridSpec", lvl: int) -> int:
    """Packing tier the BACKWARD will use on this level (0 = unpacked).

    Single-sources the gate for the backward kernel AND the residual save
    (the forward saves only the base-corner rows the backward will read —
    see _encode_impl)."""
    if spec.pack_strides(lvl) is None or not _pack_bwd_enabled():
        return 0
    return _dense_pack_dims(int(spec.level_sizes[lvl]), spec.num_dims)


@functools.lru_cache(maxsize=None)
def _selection_matrix(cols: int) -> np.ndarray:
    """[128, 128] one-hot S with S[s*cols + j, j*g + s] = 1 (g = 128//cols):
    right-multiplying a [m, 128] block of g interleaved samples x cols
    features de-interleaves it into cols planar [m, g] lane groups."""
    g = 128 // cols
    s_mat = np.zeros((128, 128), np.float32)
    for s in range(g):
        for j in range(cols):
            s_mat[s * cols + j, j * g + s] = 1.0
    return s_mat


def _planar_columns(vals: jnp.ndarray):
    """[n, cols] row-major -> cols planar [n] vectors.

    Strided fallback (vals[:, j]) unless NERF_HUGS_MXU_DEINTERLEAVE=1 and
    the shape permits (cols divides 128, n divisible by 128//cols); the MXU
    matmul is exact: 0/1 selection at HIGHEST precision (the platform's
    bf16-like default would truncate the gathered values)."""
    n, cols = vals.shape
    g = 128 // cols if 128 % cols == 0 else 0
    if not _mxu_deinterleave_enabled() or g == 0 or n % g:
        return [vals[:, j] for j in range(cols)]
    from nerf_hugs_tpu.core import math as nh_math
    s_mat = jnp.asarray(_selection_matrix(cols))
    p = nh_math.matmul_hp(vals.reshape(n // g, 128), s_mat)
    p = p.reshape(n // g, cols, g)
    return [p[:, j, :].reshape(n) for j in range(cols)]


def level_scales(num_levels: int, base_res: int, max_res: int) -> np.ndarray:
    """tcnn's per-level grid scale: scale_l = base * growth^l - 1.

    tiny-cuda-nn/include/tiny-cuda-nn/encodings/grid.h `grid_scale`:
    exp2f(level * log2_per_level_scale) * base_resolution - 1.0f. Grid
    coordinates are x * scale + 0.5 (see `_dim_terms`), NOT the instant-ngp
    paper's x * N_l — the reference runs tcnn's code, so tcnn's actual
    formulation is the parity target.
    """
    if num_levels == 1:
        growth = 1.0
    else:
        growth = np.exp((np.log(max_res) - np.log(base_res))
                        / (num_levels - 1))
    return (base_res * growth ** np.arange(num_levels) - 1.0).astype(
        np.float32)


def level_resolutions(num_levels: int, base_res: int, max_res: int
                      ) -> np.ndarray:
    """tcnn's N_l = ceil(scale_l) + 1 (grid.h `grid_resolution`).

    One higher than the instant-ngp paper's floor(base * growth^l) at
    almost every non-integer level — e.g. max_res 8192 really reaches 8192
    here where the paper formula tops out at 8191."""
    scales = level_scales(num_levels, base_res, max_res)
    return (np.ceil(scales.astype(np.float64)) + 1).astype(np.int64)


@dataclasses.dataclass(frozen=True)
class HashGridSpec:
    num_levels: int = 16
    features_per_level: int = 2
    log2_hashmap_size: int = 19
    base_res: int = 16
    max_res: int = 2048
    num_dims: int = 3
    # Backward config: bf16 matmul matches the reference's AMP-fp16 grads
    # (nerfacto/train.py:199-207); fp32 available for strict parity tests.
    bwd_dtype: str = "bfloat16"
    # Hashed-level index combine. 'xor' is tcnn-EXACT (grid.h lcg_hash,
    # h = x*1 ^ y*p2 ^ z*p3 & mask) — required for released-checkpoint
    # imports. 'add' is the TPU-native packable variant
    # (h = (x + y*p2 + z*p3) mod 2^32 & mask): addition keeps each dim a
    # FIXED row stride (1, p2 & mask, p3 & mask) so the packed-corner
    # fetch that halves/quarters dense-level gather descriptors applies to
    # hashed levels too — the dominant descriptor population at
    # kubric_nerfacto_base shapes. Hash quality is comparable: tcnn itself
    # leaves x un-mixed (prime 1), and the odd primes still decorrelate
    # y/z; quality A/B on hardware in PARITY.md.
    hash_impl: str = "xor"

    def __post_init__(self):
        if self.hash_impl not in ("xor", "add"):
            raise ValueError(f"hash_impl must be 'xor' or 'add', got "
                             f"{self.hash_impl!r}")

    @property
    def table_size(self) -> int:
        """Hashed-level table size (the 2^log2 cap)."""
        return 1 << self.log2_hashmap_size

    @property
    def scales(self) -> np.ndarray:
        return level_scales(self.num_levels, self.base_res, self.max_res)

    @property
    def resolutions(self) -> np.ndarray:
        return level_resolutions(self.num_levels, self.base_res, self.max_res)

    @property
    def level_sizes(self) -> np.ndarray:
        """Per-level table rows, tcnn-compact: min(N_l^d, 2^log2) rounded up
        to a multiple of 8 (grid.h m_hashmap_offsets_table). Dense low-res
        levels get N_l^d rows, not a full 2^log2 table — the released
        checkpoints' layout, and smaller gather operands on TPU."""
        dense_size = self.resolutions.astype(np.int64) ** self.num_dims
        sizes = np.minimum(dense_size, self.table_size)
        return -(-sizes // 8) * 8

    @property
    def output_dim(self) -> int:
        return self.num_levels * self.features_per_level

    @property
    def num_rows(self) -> int:
        return int(self.level_sizes.sum())

    def corner_offsets(self) -> np.ndarray:
        """[2^d, d] binary corner offsets."""
        d = self.num_dims
        return np.stack(np.meshgrid(*([np.arange(2)] * d), indexing="ij"),
                        axis=-1).reshape(-1, d)

    def dense_level(self) -> np.ndarray:
        """Per level: dense linear indexing while N_l^d entries fit the
        hashmap cap, else the spatial hash (tcnn grid_index: hash iff
        hashmap_size < stride after the dense loop)."""
        return (self.resolutions.astype(np.int64) ** self.num_dims
                <= self.table_size)

    def pack_strides(self, lvl: int):
        """Per-dim row strides of the dim-d neighbor corner on a packable
        level, or None if the level cannot be corner-packed.

        Dense level: neighbor row = base + N_l^d (mod level size). Hashed
        'add' level: (sum + p_d) & mask == (masked + (p_d & mask)) mod 2^m
        because 2^m divides 2^32 — a fixed stride too. Hashed 'xor' levels
        have no fixed neighbor stride (x^(x+1) depends on trailing ones)."""
        if bool(self.dense_level()[lvl]):
            res = int(self.resolutions[lvl])
            return [res ** d for d in range(self.num_dims)]
        if (self.hash_impl == "add"
                and int(self.level_sizes[lvl]) == self.table_size):
            # level_sizes rounds up to a multiple of 8; the stride/roll wrap
            # is only mod-correct when the table is exactly the 2^m masked
            # domain (true for any log2_hashmap_size >= 3).
            mask = self.table_size - 1
            return [_PRIMES[d % len(_PRIMES)] & mask
                    for d in range(self.num_dims)]
        return None


def _as_level_tuple(table, spec: HashGridSpec):
    """Normalize to a tuple of per-level FLAT [T*F] tables (feature-minor).

    Flat 1-D is the canonical parameter layout: any [*, F] table array in
    the optimizer/stats graph invites XLA's (8,128)-tiled row-major layout
    — a 64x padding on the F=2 axis (observed: 1 GB per 16 MB table, OOM at
    base shapes). The [T, F] view exists only transiently at the gather,
    where XLA bitcasts it for free (tools/bench_gather.py). Separate
    per-level arrays also gather ~1.7x faster than slices of one [L, T, F]
    array (measured). Accepts a tuple of per-level [T*F] or [T, F] arrays,
    or one flat concatenation of the per-level tables (tcnn's params
    layout) for convenience."""
    if isinstance(table, (tuple, list)):
        return tuple(t.reshape(-1) for t in table)
    flat = table.reshape(-1)
    f = spec.features_per_level
    sizes = spec.level_sizes * f
    offsets = np.concatenate([[0], np.cumsum(sizes)])
    assert flat.shape[0] == offsets[-1], (flat.shape, offsets[-1])
    return tuple(flat[offsets[l]:offsets[l + 1]]
                 for l in range(spec.num_levels))


def _dim_terms(spec: HashGridSpec, positions: jnp.ndarray, levels):
    """Per-dim, per-offset index terms and weights for a level subset.

    positions: [n, d] in [0,1]. levels: list of level ids (must be all-dense
    or all-hashed — dense levels form a prefix since (N_l+1)^d grows).
    Returns (terms [d][2] of [L', n] uint32, wpair [d][2] of [L', n] f32).
    Dense corner index = sum_d term_d; hashed = xor_d term_d & (T-1).
    Splitting dense/hashed statically avoids computing both paths + select
    per corner (the round-1 formulation) — index arithmetic was ~45% of
    forward time at kubric_nerfacto_base shapes.
    """
    d_dims = spec.num_dims
    res_i = spec.resolutions[levels]
    dense = bool(spec.dense_level()[levels[0]])
    scale = jnp.asarray(spec.scales[levels])[:, None]              # [L', 1]
    # tcnn grid coordinate: fma(scale, x, 0.5) then split into cell + frac
    # (grid.h pos_fract) — the half-cell offset is part of the released-
    # checkpoint semantics.
    x = positions.T[:, None, :] * scale[None] + 0.5                # [d, L', n]
    x0f = jnp.floor(x)
    frac = x - x0f
    x0 = x0f.astype(jnp.uint32)
    terms, wpair = [], []
    for d in range(d_dims):
        if dense:
            # tcnn grid_index dense stride: N_l^dim (uint32 wrap-free: the
            # largest dense level has N_l^d <= 2^log2 <= 2^24).
            stride = jnp.asarray((res_i ** d).astype(np.int64)
                                 % (1 << 32)).astype(jnp.uint32)[:, None]
            t0 = x0[d] * stride
            t1 = t0 + stride
        else:
            prime = jnp.uint32(_PRIMES[d % len(_PRIMES)])
            t0 = x0[d] * prime
            t1 = t0 + prime
        terms.append((t0, t1))
        wpair.append((1.0 - frac[d], frac[d]))
    return terms, wpair


def _corner_combine(spec: HashGridSpec, terms, wpair, dense: bool,
                    levels=None):
    """Yield (idx [L', n] uint32 in [0, size_l), w [L', n]) per corner."""
    offsets = spec.corner_offsets()
    d_dims = spec.num_dims
    mask = jnp.uint32(spec.table_size - 1)
    if dense:
        # tcnn wraps the dense index modulo the level size (grid_index's
        # final `% hashmap_size`): only the x==1.0 edge corner can exceed
        # it, and by < size, so one conditional subtract IS the modulo.
        sizes = jnp.asarray(spec.level_sizes[levels].astype(np.int64)
                            % (1 << 32)).astype(jnp.uint32)[:, None]
    # Shared xy partial products (saves one multiply per corner for d=3).
    if d_dims >= 2:
        wxy = {(i, j): wpair[0][i] * wpair[1][j]
               for i in range(2) for j in range(2)}
    additive = dense or spec.hash_impl == "add"
    for c in offsets:
        idx = terms[0][c[0]]
        for d in range(1, d_dims):
            t = terms[d][c[d]]
            idx = (idx + t) if additive else (idx ^ t)
        if dense:
            idx = jnp.where(idx >= sizes, idx - sizes, idx)
        else:
            idx = idx & mask
        if d_dims == 1:
            w = wpair[0][c[0]]
        elif d_dims == 2:
            w = wxy[(c[0], c[1])]
        else:
            w = wxy[(c[0], c[1])]
            for d in range(2, d_dims):
                w = w * wpair[d][c[d]]
        yield idx, w


def _corner_rows_level(spec: HashGridSpec, positions: jnp.ndarray, lvl: int):
    """Single-level corner rows/weights: ([2^d, n] int32 in [0,T_l), [2^d, n])."""
    terms, wpair = _dim_terms(spec, positions, [lvl])
    dense = bool(spec.dense_level()[lvl])
    rows, weights = [], []
    for idx, w in _corner_combine(spec, terms, wpair, dense, levels=[lvl]):
        rows.append(idx[0].astype(jnp.int32))
        weights.append(w[0])
    return jnp.stack(rows), jnp.stack(weights)


def _encode_impl(table: jnp.ndarray, positions: jnp.ndarray,
                 spec: HashGridSpec, want_residuals: bool = False):
    """Plain XLA encode: positions [..., d] -> [..., L*F]. Differentiable.

    One corner-fused row gather per level: gathers from operands larger
    than ~2^23 rows fall off a descriptor cliff (157 -> 84M idx/s) while
    per-level [T, F] slices of a [L, T, F] table pipeline at ~215M idx/s
    (tools/bench_gather.py) — so levels are NOT fused into one gather.

    want_residuals additionally returns the per-level (rows, weights) so the
    custom VJP can skip recomputing the index arithmetic in the backward.
    """
    lead_shape = positions.shape[:-1]
    positions = positions.reshape(-1, spec.num_dims)
    tab = _as_level_tuple(table, spec)
    f = spec.features_per_level
    n = positions.shape[0]
    num_corners = 1 << spec.num_dims

    outs, rw = [], []
    for lvl in range(spec.num_levels):
        rows, weights = _corner_rows_level(spec, positions, lvl)  # [2^d, n]
        if want_residuals:
            # Save only the corner rows the backward will read: the packed
            # backward keys on the 2^(d-k) BASE corners (all weights are
            # consumed either way), so the non-base rows would be dead
            # residual bytes — up to 2x less i32 residual traffic at pair
            # tier, 4x at quad. The gate (_bwd_pack_dims) is the same one
            # the backward reads, evaluated in the same trace.
            k_bwd = _bwd_pack_dims(spec, lvl)
            if k_bwd:
                ids = _base_corner_ids(spec.num_dims, k_bwd)
                rw.append((jnp.stack([rows[c] for c in ids]), weights))
            else:
                rw.append((rows, weights))
        # One gather per corner; accumulation in PLANAR per-feature 1-D
        # columns. A fused [2^d*n, F] gather + rank-3 reshape + reduce looks
        # cleaner but makes XLA assign the gather output a (8,128)-tiled
        # row-major layout — 64x padding on the F=2 axis (16 GB at base
        # shapes) — and a rank-2 [n, F] accumulator chain makes layout
        # assignment insert row<->column-major conversion copies on every
        # gather output (profiled 210 ms/step at base shapes). The strided
        # vals[:, j] reads fuse into the elementwise chain; only the final
        # stack materializes a rank-2 array per level.
        tab_l = tab[lvl].reshape(int(spec.level_sizes[lvl]), f)  # bitcast view
        accs = [jnp.zeros((n,)) for _ in range(f)]
        strides = spec.pack_strides(lvl)
        pack_k = (_dense_pack_dims(int(spec.level_sizes[lvl]), spec.num_dims)
                  if strides else 0)
        if pack_k:
            # Packed-corner fetch: on packable levels the dim-d neighbor
            # corner sits at a FIXED row stride (dense: N^d, stride 1 for
            # x; hashed-add: p_d & mask — spec.pack_strides), so k
            # concat+roll doublings build an augmented [T, 2^k*F] table
            # whose row i holds all 2^k corners differing only in dims < k
            # — ONE descriptor fetches them all, 2^(d-k) gathers/level
            # instead of 2^d. The rebuild is sequential streaming (free
            # next to the descriptors); the roll's mod-T wrap equals
            # _corner_combine's wrap (dense: conditional subtract, valid
            # because base + offset < 2T; hashed-add: & mask == mod T).
            # k is size-gated per level (_dense_pack_dims): wider rows
            # gather slower per descriptor, so quad/oct only win on large
            # levels (docs/tpu_gather_cost_model.md).
            d_dims = spec.num_dims
            tab_a = tab_l
            for d in range(pack_k):
                tab_a = jnp.concatenate(
                    [tab_a, jnp.roll(tab_a, -strides[d], axis=0)], axis=-1)
            base_corners = _base_corner_ids(d_dims, pack_k)
            for b in base_corners:
                vals = jnp.take(tab_a, rows[b], axis=0)   # [n, 2^k*F]
                cols = _planar_columns(vals)
                for q in range(1 << pack_k):
                    corner = b + sum(((q >> d) & 1) << (d_dims - 1 - d)
                                     for d in range(pack_k))
                    for j in range(f):
                        accs[j] = (accs[j]
                                   + weights[corner] * cols[q * f + j])
        else:
            for c in range(num_corners):
                vals = jnp.take(tab_l, rows[c], axis=0)           # [n, F]
                cols = _planar_columns(vals)
                for j in range(f):
                    accs[j] = accs[j] + weights[c] * cols[j]
        outs.extend(accs)
    out = jnp.stack(outs, axis=-1)                     # [n, L*F]
    out = out.reshape(lead_shape + (spec.output_dim,))
    if want_residuals:
        return out, tuple(rw)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _encode_custom(table, positions, spec: HashGridSpec, interpret: bool):
    return _encode_impl(table, positions, spec)


# Save per-level (rows, weights) as residuals up to this many bytes per
# encode call: the backward then skips the whole index-arithmetic recompute
# (floor/hash/trilinear products — measured 0.37 s/step avg at
# kubric_nerfacto_base shapes) for ~10 ms of HBM traffic. Above the cap,
# fall back to recomputing from positions so peak memory stays bounded
# (phototourism_nerfacto_base's 512-sample proposal field would hold
# 2.7 GB; with the cap its backward recomputes while the other fields
# still save — worst-case extra residency ~3.5 GB on a 16 GB chip).
#
# Scope caveat: the cap is PER ENCODE CALL, not per train step — there is
# no global accounting, so k fields in one step can each sit just under the
# cap and coexist (bounded by fields-per-step × cap; with today's configs
# ≤2 encodes save residuals at once, the ~3.5 GB estimate above). A config
# with many more proposal fields should lower this cap or it can OOM.
_RESIDUAL_BYTES_CAP_PER_CALL = int(2.5 * (1 << 30))


def _encode_custom_fwd(table, positions, spec, interpret):
    # The table is used linearly: only the (rows, weights) — or positions to
    # recompute them past the size cap — and the table dtype are needed.
    n = int(np.prod(positions.shape[:-1]))
    full = 1 << spec.num_dims
    # Per level: (2^(d-k) saved base-corner rows) i32 + (2^d weights) f32 —
    # the packed backward keys only on base corners (see _encode_impl).
    nbytes = sum(n * ((full >> _bwd_pack_dims(spec, lvl)) + full) * 4
                 for lvl in range(spec.num_levels))
    if nbytes <= _RESIDUAL_BYTES_CAP_PER_CALL:
        out, rw = _encode_impl(table, positions, spec, want_residuals=True)
    else:
        out = _encode_impl(table, positions, spec)
        rw = None
    return out, (positions, jnp.zeros((0,), table[0].dtype), rw)


def _encode_custom_bwd(spec, interpret, residuals, g):
    positions, dtype_probe, rw = residuals
    pos = positions.reshape(-1, spec.num_dims)
    f = spec.features_per_level
    gf = g.reshape(-1, spec.num_levels * f)            # [n, L*F]

    grads = []
    for lvl in range(spec.num_levels):
        if rw is not None:
            rows, weights = rw[lvl]                              # [2^d, n]
        else:
            rows, weights = _corner_rows_level(spec, pos, lvl)
        # The block kernel grids over fixed-size row blocks; tcnn-compact
        # level sizes are multiples of 8, not of the block size — pad the
        # kernel's table and slice the (row-major flat) grad back down.
        size_l = int(spec.level_sizes[lvl])
        padded = -(-size_l // hashgrid_bwd.BLOCK_R) * hashgrid_bwd.BLOCK_R
        strides = spec.pack_strides(lvl)
        pack_k = _bwd_pack_dims(spec, lvl)
        if pack_k:
            # Corner-packed backward (see _pack_bwd_enabled): scatter each
            # base corner's 2^k packed-corner contributions into augmented
            # columns of ITS row, segment-sum feature-major, then fold the
            # augmented gradient back with 1-D rolls — grad_T[r] +=
            # grad_aug[(r - off_q) % T, q*F + j], the exact transpose of
            # the forward's roll-built augmented table.
            d_dims = spec.num_dims
            base_corners = _base_corner_ids(d_dims, pack_k)
            # Saved residuals hold ONLY the base-corner rows (in
            # base_corners order — see _encode_impl); the recompute path
            # (rw=None) produces all 2^d.
            if rows.shape[0] == len(base_corners):
                base_rows = [rows[i] for i in range(len(base_corners))]
            else:
                base_rows = [rows[b] for b in base_corners]
            keys = jnp.concatenate(base_rows)
            vals = []
            for q in range(1 << pack_k):
                corners = [b + sum(((q >> d) & 1) << (d_dims - 1 - d)
                                   for d in range(pack_k))
                           for b in base_corners]
                for j in range(f):
                    vals.append(jnp.concatenate(
                        [weights[c] * gf[:, lvl * f + j] for c in corners]))
            grad_fm = hashgrid_bwd.block_segment_sum(
                keys, tuple(vals), padded, val_dtype=spec.bwd_dtype,
                interpret=interpret, feature_major=True)  # [2^k*F, padded]
            folded = []
            for j in range(f):
                acc = grad_fm[j][:size_l]                 # q = 0, offset 0
                for q in range(1, 1 << pack_k):
                    off = sum(strides[d] for d in range(pack_k)
                              if (q >> d) & 1)
                    acc = acc + jnp.roll(grad_fm[q * f + j][:size_l], off)
                folded.append(acc)
            grads.append(jnp.stack(folded, 0).T.reshape(size_l * f))
            continue
        keys = rows.reshape(-1)                                  # [2^d*n]
        # Per-feature 1-D payload columns (a [2^d*n, F] array would invite
        # the 64x tiled-layout padding — see _encode_impl).
        vals = tuple(
            (weights * gf[:, lvl * f + j][None, :]).reshape(-1)
            for j in range(f))
        grad = hashgrid_bwd.block_segment_sum(
            keys, vals, padded,
            val_dtype=spec.bwd_dtype, interpret=interpret)
        grads.append(grad[:size_l * f] if padded != size_l else grad)
    grad_tab = tuple(g.astype(dtype_probe.dtype) for g in grads)
    return grad_tab, jnp.zeros_like(positions)


_encode_custom.defvjp(_encode_custom_fwd, _encode_custom_bwd)


def hashgrid_encode(table: jnp.ndarray, positions: jnp.ndarray,
                    spec: HashGridSpec,
                    use_custom_vjp: bool = False) -> jnp.ndarray:
    """Encode positions in [0, 1]^d -> [..., L*F] features.

    table: tuple of per-level flat [T_l*F] arrays, or one flat
    concatenation in tcnn params order.
    With `use_custom_vjp` the sorted-scatter Pallas backward replaces XLA's
    scatter-add transpose (see module docstring); positions then receive a
    zero cotangent. Off-TPU (the CPU test mesh) the plain XLA path is used
    instead — interpret-mode Pallas over thousands of grid steps is far
    slower than XLA's scatter there; the kernel itself is covered by
    dedicated interpret-mode tests (tests/test_ops.py).
    """
    if not use_custom_vjp or jax.default_backend() not in ("tpu", "axon"):
        return _encode_impl(table, positions, spec)
    # Normalize to the per-level layout outside the custom VJP so non-tuple
    # tables get their gradient reshaped by autodiff of the normalization.
    return _encode_custom(_as_level_tuple(table, spec), positions, spec,
                          False)


class HashGridEncoding(nn.Module):
    """Flax wrapper owning the table parameter (uniform(-1e-4, 1e-4) init,
    matching tcnn's default). Stores tcnn-compact per-level flat tables —
    per-level row-gather is the fast layout on TPU
    (docs/tpu_gather_cost_model.md)."""
    spec: HashGridSpec
    param_dtype: jnp.dtype = jnp.float32
    use_custom_vjp: bool = True

    @nn.compact
    def __call__(self, positions: jnp.ndarray) -> jnp.ndarray:
        sizes = self.spec.level_sizes
        tables = tuple(
            self.param(
                f"table_{l}",
                lambda key, shape: jax.random.uniform(
                    key, shape, self.param_dtype, -1e-4, 1e-4),
                (int(sizes[l]) * self.spec.features_per_level,))
            for l in range(self.spec.num_levels))
        return hashgrid_encode(tables, positions, self.spec,
                               use_custom_vjp=self.use_custom_vjp)
