"""Pallas fused MLP vs plain-jnp reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_hugs_tpu.ops import fused_mlp as fm


def make_weights(dims, seed=0):
    rng = np.random.RandomState(seed)
    return tuple(jnp.asarray(rng.randn(dims[i], dims[i + 1]) /
                             np.sqrt(dims[i]), jnp.float32)
                 for i in range(len(dims) - 1))


@pytest.mark.parametrize("dims", [(128, 128, 128), (256, 128, 128, 128)])
def test_fused_forward_matches_reference(dims):
    weights = make_weights(dims)
    x = jnp.asarray(np.random.RandomState(1).randn(300, dims[0]), jnp.float32)
    got = fm.fused_mlp(x, weights, block_rows=128, interpret=True)
    want = fm._forward_reference(x, weights)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_fused_backward_matches_reference():
    dims = (128, 128, 128)
    weights = make_weights(dims)
    x = jnp.asarray(np.random.RandomState(2).randn(64, dims[0]), jnp.float32)

    def loss_fused(w, x):
        return jnp.sum(fm.fused_mlp(x, w, 64, True) ** 2)

    def loss_ref(w, x):
        return jnp.sum(fm._forward_reference(x, w) ** 2)

    gw_f, gx_f = jax.grad(loss_fused, argnums=(0, 1))(weights, x)
    gw_r, gx_r = jax.grad(loss_ref, argnums=(0, 1))(weights, x)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r), atol=1e-3,
                               rtol=1e-3)
    for a, b in zip(gw_f, gw_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3,
                                   rtol=1e-3)


def test_fused_mlp_helper_init_and_apply():
    mlp = fm.FusedMLP((128, 128, 128), block_rows=128, interpret=True)
    weights = mlp.init(jax.random.PRNGKey(0))
    assert len(weights) == 2
    x = jnp.zeros((10, 128))
    out = mlp(weights, x)
    assert out.shape == (10, 128)
