"""Multiresolution hash-grid encoding (instant-ngp) in JAX for TPU.

The TPU-native replacement for tiny-cuda-nn's HashGrid (reference:
nerfacto/models/nerfacto.py:716-734, SURVEY.md N1). Semantics follow the
instant-ngp paper: L levels with resolutions N_l = floor(base * g^l),
g = exp((ln max - ln base)/(L-1)) (nerfacto.py:713); per level, dense
linear indexing while (N_l+1)^3 fits the table, else the spatial xor-hash
(primes 1 / 2654435761 / 805459861) modulo table size; trilinear
interpolation of the 8 corner features; features concatenated over levels.

TPU layout notes (the part that makes this work at batch 16384 x 256
samples): TPU HBM arrays are tiled (8, 128) on the last two dims, so any
intermediate with a tiny trailing axis (e.g. [n, L, 8corners]) physically
pads 16-64x and OOMs. This implementation therefore:
  * iterates levels/corners in an unrolled loop of FLAT 1-D gathers
    (1-D arrays tile densely), accumulating weighted features in place;
  * keeps the per-(level,corner) index and weight as [n] vectors;
  * only materializes the [n, L*F] output (L*F = 32 for the standard
    16x2 config — one packed lane group).
  * stores the table FLAT [L*T*F] — a [L*T, 2] parameter would physically
    pad 64x (to 16GB for the 2^21 x 16-level config) under TPU tiling, and
    every access would copy it.
The backward pass (d table) is the gather transpose — an XLA scatter-add of
the same flat layout. A Pallas kernel is the planned faster path; this
formulation is already within ~2x of gather roofline.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

_PRIMES = (1, 2654435761, 805459861)


def level_resolutions(num_levels: int, base_res: int, max_res: int
                      ) -> np.ndarray:
    """N_l = floor(base * growth^l) with tcnn's growth factor."""
    if num_levels == 1:
        return np.array([base_res], np.int64)
    growth = np.exp((np.log(max_res) - np.log(base_res)) / (num_levels - 1))
    return np.floor(base_res * growth ** np.arange(num_levels)).astype(np.int64)


@dataclasses.dataclass(frozen=True)
class HashGridSpec:
    num_levels: int = 16
    features_per_level: int = 2
    log2_hashmap_size: int = 19
    base_res: int = 16
    max_res: int = 2048
    num_dims: int = 3

    @property
    def table_size(self) -> int:
        return 1 << self.log2_hashmap_size

    @property
    def resolutions(self) -> np.ndarray:
        return level_resolutions(self.num_levels, self.base_res, self.max_res)

    @property
    def output_dim(self) -> int:
        return self.num_levels * self.features_per_level

    def corner_offsets(self) -> np.ndarray:
        """[2^d, d] binary corner offsets."""
        d = self.num_dims
        return np.stack(np.meshgrid(*([np.arange(2)] * d), indexing="ij"),
                        axis=-1).reshape(-1, d)

    def dense_level(self) -> np.ndarray:
        """Per level: use dense indexing if (N+1)^d entries fit the table."""
        return (self.resolutions + 1) ** self.num_dims <= self.table_size


def _corner_index(spec: HashGridSpec, corner_dims, level: int) -> jnp.ndarray:
    """Integer corner coords (tuple of d [n] vectors) -> table index [n]."""
    res = int(spec.resolutions[level])
    idx = jnp.zeros_like(corner_dims[0], dtype=jnp.uint32)
    if bool(spec.dense_level()[level]):
        stride = 1
        for d in range(spec.num_dims):
            idx = idx + corner_dims[d].astype(jnp.uint32) * jnp.uint32(stride)
            stride *= res + 1
    else:
        for d in range(spec.num_dims):
            idx = idx ^ (corner_dims[d].astype(jnp.uint32)
                         * jnp.uint32(_PRIMES[d % len(_PRIMES)]))
    return (idx % jnp.uint32(spec.table_size)).astype(jnp.int32)


def hashgrid_encode(table: jnp.ndarray, positions: jnp.ndarray,
                    spec: HashGridSpec) -> jnp.ndarray:
    """Encode positions in [0, 1]^d -> [..., L*F] features.

    table: FLAT [L * T * F] (feature-minor). positions: [..., d] with any
    leading batch shape.

    Vectorized over levels in [L, n] layout (leading dims don't pad under
    TPU tiling): one gather of [L*n] per (corner, feature) instead of a
    16-level unrolled loop — smaller HLO, bigger (faster) gathers. Levels
    that fit densely use linear indexing; the rest use the spatial hash,
    selected by a per-level mask.
    """
    lead_shape = positions.shape[:-1]
    positions = positions.reshape(-1, spec.num_dims)
    offsets = spec.corner_offsets()          # [2^d, d] (host numpy)
    num_corners = offsets.shape[0]
    f = spec.features_per_level
    L = spec.num_levels
    d_dims = spec.num_dims

    res = jnp.asarray(spec.resolutions, jnp.float32)[:, None]      # [L, 1]
    dense = spec.dense_level()                                     # [L] host
    # Per-level dense strides (stride_d = (res+1)^d) and offsets.
    res_i = spec.resolutions
    strides = np.stack([(res_i + 1) ** d for d in range(d_dims)], 0)  # [d, L]
    strides_j = jnp.asarray(strides.astype(np.int64) % (1 << 32)
                            ).astype(jnp.uint32)[:, :, None]          # [d,L,1]
    dense_mask = jnp.asarray(dense)[:, None]                          # [L, 1]
    level_base = (jnp.arange(L, dtype=jnp.int32) * spec.table_size
                  )[:, None]                                          # [L, 1]

    # [d, L, n] integer cell coords and fractions.
    x = positions.T[:, None, :] * res[None]            # [d, L, n]
    x0 = jnp.floor(x)
    frac = x - x0

    acc = [jnp.zeros((L, positions.shape[0])) for _ in range(f)]
    for c in range(num_corners):
        corner = x0 + jnp.asarray(offsets[c], jnp.float32)[:, None, None]
        corner_u = corner.astype(jnp.uint32)           # [d, L, n]
        idx_dense = jnp.zeros_like(corner_u[0])
        idx_hash = jnp.zeros_like(corner_u[0])
        for d in range(d_dims):
            idx_dense = idx_dense + corner_u[d] * strides_j[d]
            idx_hash = idx_hash ^ (corner_u[d]
                                   * jnp.uint32(_PRIMES[d % len(_PRIMES)]))
        idx = jnp.where(dense_mask, idx_dense, idx_hash)
        idx = (idx % jnp.uint32(spec.table_size)).astype(jnp.int32)
        idx = (idx + level_base) * f                   # [L, n]
        w = jnp.ones_like(frac[0])
        for d in range(d_dims):
            w = w * jnp.where(offsets[c, d], frac[d], 1.0 - frac[d])
        flat_idx = idx.reshape(-1)
        for j in range(f):
            vals = jnp.take(table, flat_idx + j, axis=0).reshape(idx.shape)
            acc[j] = acc[j] + w * vals
    # Assemble [n, L*F] directly from [n] row slices — stacking into an
    # [L, n, F] intermediate would pad its trailing F=2 axis 64x under TPU
    # tiling (17GB at batch 16384 x 128 samples).
    columns = [acc[j][l] for l in range(L) for j in range(f)]
    out = jnp.stack(columns, axis=-1)                  # [n, L*F]
    return out.reshape(lead_shape + (spec.output_dim,))


class HashGridEncoding(nn.Module):
    """Flax wrapper owning the table parameter (uniform(-1e-4, 1e-4) init,
    matching tcnn's default)."""
    spec: HashGridSpec
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, positions: jnp.ndarray) -> jnp.ndarray:
        table = self.param(
            "table",
            lambda key, shape: jax.random.uniform(
                key, shape, self.param_dtype, -1e-4, 1e-4),
            (self.spec.num_levels * self.spec.table_size
             * self.spec.features_per_level,))
        return hashgrid_encode(table, positions, self.spec)
