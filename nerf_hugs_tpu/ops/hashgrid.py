"""Multiresolution hash-grid encoding (instant-ngp) in JAX for TPU.

The TPU-native replacement for tiny-cuda-nn's HashGrid (reference:
nerfacto/models/nerfacto.py:716-734, SURVEY.md N1). Semantics follow the
instant-ngp paper: L levels with resolutions N_l = floor(base * g^l),
g = exp((ln max - ln base)/(L-1)) (nerfacto.py:713); per level, dense
linear indexing while (N_l+1)^3 fits the table, else the spatial xor-hash
(primes 1 / 2654435761 / 805459861) modulo table size; trilinear
interpolation of the 8 corner features; features concatenated over levels.

Implementation notes (TPU):
  * all levels live in ONE [L * T, F] table so the forward is a single
    batched gather of [n, L, 8] indices — XLA lowers this to a dynamic
    gather that keeps the MXU-facing layout [n, L*F] contiguous;
  * the backward (d table) is the gather's transpose, an XLA scatter-add —
    functional today, a Pallas kernel is the planned fast path;
  * the whole encode is differentiable wrt positions too (trilinear weights),
    which nerfacto doesn't need but costs nothing.

A 2-D variant backs HA-NeRF's implicit mask (nerfacto.py:1038-1049).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

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


def _level_indices(spec: HashGridSpec, corners: jnp.ndarray, level: int
                   ) -> jnp.ndarray:
    """Map integer corner coords [n, 8, d] to table indices [n, 8]."""
    res = int(spec.resolutions[level])
    if bool(spec.dense_level()[level]):
        stride = 1
        idx = jnp.zeros(corners.shape[:-1], jnp.uint32)
        for d in range(spec.num_dims):
            idx = idx + corners[..., d].astype(jnp.uint32) * jnp.uint32(stride)
            stride *= res + 1
        return idx % jnp.uint32(spec.table_size)
    idx = jnp.zeros(corners.shape[:-1], jnp.uint32)
    for d in range(spec.num_dims):
        idx = idx ^ (corners[..., d].astype(jnp.uint32)
                     * jnp.uint32(_PRIMES[d % len(_PRIMES)]))
    return idx % jnp.uint32(spec.table_size)


def hashgrid_encode(table: jnp.ndarray, positions: jnp.ndarray,
                    spec: HashGridSpec) -> jnp.ndarray:
    """Encode positions in [0, 1]^d -> [..., L*F] features.

    table: [L * T, F]. positions: [..., d] (any leading batch shape).
    One fused gather over all levels.
    """
    lead_shape = positions.shape[:-1]
    positions = positions.reshape(-1, spec.num_dims)
    n = positions.shape[0]
    offsets = jnp.asarray(spec.corner_offsets(), jnp.int32)      # [C, d]
    num_corners = offsets.shape[0]

    all_idx, all_w = [], []
    for level in range(spec.num_levels):
        res = int(spec.resolutions[level])
        x = positions * res                                       # [n, d]
        x0 = jnp.floor(x)
        frac = x - x0                                             # [n, d]
        corners = x0[:, None, :].astype(jnp.int32) + offsets[None]  # [n, C, d]
        idx = _level_indices(spec, corners, level)                # [n, C]
        all_idx.append(idx.astype(jnp.int32) + level * spec.table_size)
        # Trilinear weight: prod over dims of frac (corner=1) / 1-frac (0).
        w = jnp.prod(jnp.where(offsets[None].astype(bool), frac[:, None, :],
                               1.0 - frac[:, None, :]), axis=-1)  # [n, C]
        all_w.append(w)

    idx = jnp.stack(all_idx, axis=1)        # [n, L, C]
    w = jnp.stack(all_w, axis=1)            # [n, L, C]
    gathered = jnp.take(table, idx.reshape(-1), axis=0).reshape(
        n, spec.num_levels, num_corners, spec.features_per_level)
    feats = jnp.sum(gathered * w[..., None], axis=2)  # [n, L, F]
    return feats.reshape(lead_shape + (spec.output_dim,))


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
            (self.spec.num_levels * self.spec.table_size,
             self.spec.features_per_level))
        return hashgrid_encode(table, positions, self.spec)
