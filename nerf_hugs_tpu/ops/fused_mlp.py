"""Pallas fused multi-layer ReLU MLP for TPU.

The TPU-native analog of tiny-cuda-nn's FullyFusedMLP (reference:
nerfacto/models/nerfacto.py:728-753; SURVEY.md N2): for narrow networks
(width <= 128) the layer activations never leave VMEM — the kernel tiles the
row dimension and runs every layer per tile, so HBM sees only the input,
the weights (once per tile, they're tiny), and the output. Matmuls hit the
MXU via jnp.dot with fp32 accumulation.

Like tcnn, layers have no bias. The backward pass is a custom VJP computed
with plain XLA matmuls over rematerialized activations. Measured on v5e at
[262144, 128] x 3 layers: forward 12% faster than the XLA Dense stack and
bit-exact; fwd+bwd slower (the recompute + unfused grads), so the fused path
pays off for inference/eval while training typically keeps the Dense path
(which the shipped reference configs select anyway via
enable_tcnn_mlp: False).

Enabled through the reference's own switch: NerfactoConfig.enable_tcnn_mlp
maps to this kernel (shipped reference configs set it False -> the plain
flax path, kubric_nerfacto_base.yml:49).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _fused_forward_kernel(x_ref, *refs, num_layers: int):
    """One row tile: x -> relu(x W0) -> ... -> x W_{L-1}. Last layer linear."""
    w_refs = refs[:num_layers]
    out_ref = refs[num_layers]
    h = x_ref[:]
    for i in range(num_layers):
        h = jnp.dot(h, w_refs[i][:], preferred_element_type=jnp.float32)
        if i < num_layers - 1:
            h = jnp.maximum(h, 0.0)
        h = h.astype(x_ref.dtype)
    out_ref[:] = h


def _forward_pallas(x: jnp.ndarray, weights: Sequence[jnp.ndarray],
                    block_rows: int, interpret: bool) -> jnp.ndarray:
    n, d_in = x.shape
    d_out = weights[-1].shape[1]
    n_pad = _round_up(max(n, 8), block_rows)
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
    grid = (n_pad // block_rows,)
    in_specs = [pl.BlockSpec((block_rows, d_in), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    for w in weights:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        functools.partial(_fused_forward_kernel, num_layers=len(weights)),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_rows, d_out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, d_out), x.dtype),
        interpret=interpret,
    )(x, *weights)
    return out[:n]


def _forward_reference(x, weights):
    h = x
    for i, w in enumerate(weights):
        h = jnp.dot(h, w, preferred_element_type=jnp.float32)
        if i < len(weights) - 1:
            h = jnp.maximum(h, 0.0)
        h = h.astype(x.dtype)
    return h


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_mlp(x: jnp.ndarray, weights: Tuple[jnp.ndarray, ...],
              block_rows: int = 512, interpret: bool = False) -> jnp.ndarray:
    """relu-MLP x @ W0 ... @ W_{L-1} with all hidden activations in VMEM.

    x: [n, d_in]; weights: tuple of [d_i, d_{i+1}] (dims should be multiples
    of 128 for clean MXU tiling; smaller works but pads).
    """
    return _forward_pallas(x, tuple(weights), block_rows, interpret)


def _fused_mlp_fwd(x, weights, block_rows, interpret):
    return _forward_pallas(x, tuple(weights), block_rows, interpret), (x, tuple(weights))


def _fused_mlp_bwd(block_rows, interpret, residuals, g):
    x, weights = residuals
    # Recompute activations (cheap matmuls) and backprop with XLA.
    acts = [x]
    h = x
    for i, w in enumerate(weights[:-1]):
        h = jnp.maximum(jnp.dot(h, w, preferred_element_type=jnp.float32),
                        0.0).astype(x.dtype)
        acts.append(h)
    grads_w = [None] * len(weights)
    dh = g.astype(jnp.float32)
    for i in reversed(range(len(weights))):
        a = acts[i]
        grads_w[i] = jnp.dot(a.T.astype(jnp.float32), dh,
                             preferred_element_type=jnp.float32
                             ).astype(weights[i].dtype)
        dh = jnp.dot(dh, weights[i].T.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
        if i > 0:
            dh = dh * (acts[i] > 0)
    return dh.astype(x.dtype), tuple(grads_w)


fused_mlp.defvjp(_fused_mlp_fwd, _fused_mlp_bwd)


class FusedMLP:
    """Functional helper bundling init + apply for the fused path."""

    def __init__(self, layer_dims: Sequence[int], block_rows: int = 512,
                 interpret: bool = False):
        self.layer_dims = tuple(layer_dims)
        self.block_rows = block_rows
        self.interpret = interpret

    def init(self, key) -> Tuple[jnp.ndarray, ...]:
        weights = []
        dims = self.layer_dims
        for i in range(len(dims) - 1):
            key, sub = jax.random.split(key)
            # he_uniform fan-in init, matching the reference's torch path.
            bound = np.sqrt(6.0 / dims[i])
            weights.append(jax.random.uniform(
                sub, (dims[i], dims[i + 1]), jnp.float32, -bound, bound))
        return tuple(weights)

    def __call__(self, weights, x):
        return fused_mlp(x, tuple(weights), self.block_rows, self.interpret)
