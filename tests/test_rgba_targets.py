"""RGBA target handling for the nerfacto dialect.

The reference's torch stack keeps blender/kubric alpha channels in the
dataset (nerfacto/datasets/blender.py:98 leaves the white-composite
commented out) and composites the TRAIN target against the per-batch
background color inside the dataloader (nerfacto/datasets/base.py:221-224) —
with train_background_color 'random' in every shipped kubric yaml. Here the
loaders keep RGBA for model_type != 'mipnerf360' and the loss composites
against the model-exposed rendering['bg_rgb'] (losses/zoo.py target_rgb).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_hugs_tpu.losses import zoo
from nerf_hugs_tpu.parallel import mesh as mesh_lib
from nerf_hugs_tpu.train import step as train_step_lib
from nerf_hugs_tpu.data import load_dataset

from test_backbones import nerfacto_config, nerf_config


class _FakeBatch:
    def __init__(self, rgb):
        self.rgb = rgb


def test_target_rgb_composites_against_model_bg():
    rng = np.random.RandomState(0)
    rgba = jnp.asarray(rng.rand(6, 4).astype(np.float32))
    bg = jnp.asarray(rng.rand(6, 3).astype(np.float32))
    out = zoo.target_rgb(_FakeBatch(rgba), {"bg_rgb": bg})
    alpha = rgba[..., 3:]
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(rgba[..., :3] * alpha + bg * (1 - alpha)),
        rtol=1e-6)
    # 3-channel targets pass through and never touch bg_rgb.
    rgb3 = rgba[..., :3]
    np.testing.assert_allclose(
        np.asarray(zoo.target_rgb(_FakeBatch(rgb3), {})), np.asarray(rgb3))


@pytest.fixture(scope="module")
def mesh():
    return mesh_lib.make_mesh()


@pytest.mark.parametrize("config_fn", [nerfacto_config, nerf_config])
def test_train_step_rgba_alpha_one_matches_rgb(config_fn, mesh):
    """An all-opaque RGBA batch must produce the identical loss as the same
    batch with the alpha column dropped — the composite is then a no-op, and
    the rng stream (which decides the random background) is shared."""
    config = config_fn(train_background_color="random")
    dataset = load_dataset("train", "", config)
    _, state, _, train_step, _ = train_step_lib.setup_model(
        config, jax.random.PRNGKey(0), mesh)
    state_host = jax.device_get(state)
    batch = next(dataset)
    batch_rgba = batch.replace(
        rgb=np.concatenate(
            [batch.rgb, np.ones_like(batch.rgb[..., :1])], axis=-1))

    stats = {}
    for tag, b in (("rgb", batch), ("rgba", batch_rgba)):
        # The step donates its state — give each run a fresh copy.
        sharded = mesh_lib.shard_batch(b, mesh)
        _, s, _ = train_step(jax.random.PRNGKey(1),
                             mesh_lib.replicate(state_host, mesh), sharded,
                             jnp.asarray(0.5), jnp.ones(8))
        stats[tag] = float(s["loss"])
    np.testing.assert_allclose(stats["rgba"], stats["rgb"], rtol=1e-5)


def test_train_step_rgba_partial_alpha_changes_target(mesh):
    """With alpha < 1 the composited target depends on the random background,
    so the loss must differ from the alpha-dropped batch."""
    config = nerfacto_config(train_background_color="random")
    dataset = load_dataset("train", "", config)
    _, state, _, train_step, _ = train_step_lib.setup_model(
        config, jax.random.PRNGKey(0), mesh)
    state_host = jax.device_get(state)
    batch = next(dataset)
    batch_rgba = batch.replace(
        rgb=np.concatenate(
            [batch.rgb, np.full_like(batch.rgb[..., :1], 0.25)], axis=-1))
    losses = []
    for b in (batch, batch_rgba):
        sharded = mesh_lib.shard_batch(b, mesh)
        _, s, _ = train_step(jax.random.PRNGKey(1),
                             mesh_lib.replicate(state_host, mesh), sharded,
                             jnp.asarray(0.5), jnp.ones(8))
        losses.append(float(s["loss"]))
    assert abs(losses[0] - losses[1]) > 1e-6
