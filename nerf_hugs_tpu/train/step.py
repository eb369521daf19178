"""TrainState, optimizers, and the sharded train/render step builders.

TPU-first redesign of MipNeRF360/internal/train_utils.py:372-608:
  * pmap/pmean      -> jit with NamedSharding (batch sharded on the ('data',)
                       mesh axis, params replicated; XLA inserts the grad
                       all-reduce over ICI automatically)
  * donate_argnums  -> donate the TrainState buffers each step
  * finetune        -> optax.multi_transform freezing everything outside the
                       finetune param groups (train_utils.py:539-544 for the
                       mipnerf360 'embedding' predicate; nerfacto/train.py:136
                       for config.finetune_params group selection)
Stats keep the reference's names (mses/psnrs/grad_norms/...) so logging and
the BASELINE counters line up.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Tuple

import flax
import jax
import jax.numpy as jnp
import optax
from flax import traverse_util
from flax.training.train_state import TrainState

from nerf_hugs_tpu.configs.config import Config
from nerf_hugs_tpu.core import math as nh_math
from nerf_hugs_tpu.losses import zoo
from nerf_hugs_tpu.metrics import image as nh_image
from nerf_hugs_tpu.parallel import mesh as mesh_lib
from nerf_hugs_tpu.utils import structs


# -- pytree summaries (stat names preserved from train_utils.py:40-69) --------

def tree_sum(tree):
    return jax.tree_util.tree_reduce(lambda x, y: x + y, tree, initializer=0)


def tree_norm_sq(tree):
    return tree_sum(jax.tree_util.tree_map(lambda x: jnp.sum(x**2), tree))


def tree_norm(tree):
    return jnp.sqrt(tree_norm_sq(tree))


def tree_abs_max(tree):
    return jax.tree_util.tree_reduce(
        lambda x, y: jnp.maximum(x, jnp.max(jnp.abs(y))), tree, initializer=0)


def summarize_tree(tree, fn, ancestry=(), max_depth=3):
    stats = {}
    for k, v in tree.items():
        name = ancestry + (k,)
        stats["/".join(name)] = fn(v)
        if hasattr(v, "items") and len(ancestry) < (max_depth - 1):
            stats.update(summarize_tree(v, fn, ancestry=name,
                                        max_depth=max_depth))
    return stats


def clip_gradients(grad, config: Config):
    """Per-top-level-module (per-MLP) value+norm clipping
    (train_utils.py:351-368)."""
    clipped = {}
    for k, g in grad["params"].items():
        if config.grad_max_val > 0:
            g = jax.tree_util.tree_map(
                lambda z: jnp.clip(z, -config.grad_max_val,
                                   config.grad_max_val), g)
        if config.grad_max_norm > 0:
            mult = jnp.minimum(1.0, config.grad_max_norm / (
                jnp.finfo(jnp.float32).eps + tree_norm(g)))
            g = jax.tree_util.tree_map(lambda z, m=mult: m * z, g)
        clipped[k] = g
    return {"params": clipped}


# -- optimizers ----------------------------------------------------------------

def create_optimizer(config: Config, variables
                     ) -> Tuple[TrainState, Callable[[int], Any]]:
    lr_fn = functools.partial(
        nh_math.learning_rate_decay, lr_init=config.lr_init,
        lr_final=config.lr_final, max_steps=config.max_steps,
        lr_delay_steps=config.lr_delay_steps,
        lr_delay_mult=config.lr_delay_mult)
    tx = optax.adam(learning_rate=lr_fn, b1=config.adam_beta1,
                    b2=config.adam_beta2, eps=config.adam_eps)
    return TrainState.create(apply_fn=None, params=variables, tx=tx), lr_fn


def finetune_partitions(config: Config, variables):
    """'trainable'/'frozen' label per param for the finetune stage.

    Two predicate dialects, matching the two reference stacks:
      * nerfacto/nerf: the trainable set is config.finetune_params, a list of
        the model's param-group names (nerfacto/train.py:136 consuming
        models/nerfacto.py get_params_dict keys: field / proposal /
        appearance_embedding / transient_embedding / implicit_mask). Our flax
        modules carry the same top-level names, except 'proposal' fans out to
        proposal_0..proposal_{k-1}.
      * mipnerf360: `'embedding' in path` — exact path-element membership
        (train_utils.py:542-543), which selects every nn.Embed leaf.
    """
    if config.model_type in ("nerfacto", "nerf"):
        groups = tuple(config.finetune_params or ())
        matched = {g: False for g in groups}

        def _tops_for(group):
            # Vanilla NeRF's reference group 'field' is self.field, which
            # holds both MLPs (nerf.py:228-231); our top-level modules are
            # 'coarse'/'fine', so map the group name across.
            if group == "field" and config.model_type == "nerf":
                return ("coarse", "fine")
            return (group,)

        def is_trainable(path):
            mods = path[1:] if path and path[0] == "params" else path
            top = mods[0] if mods else ""
            hit = False
            for g in groups:
                if any(top == t or (t == "proposal"
                                    and top.startswith("proposal"))
                       for t in _tops_for(g)):
                    matched[g] = True
                    hit = True
            return hit
    else:
        matched = None

        def is_trainable(path):
            return "embedding" in path

    labels = traverse_util.path_aware_map(
        lambda path, v: "trainable" if is_trainable(path) else "frozen",
        variables)
    if matched is not None:
        # The reference indexes params_dict[key] and KeyErrors on a bad
        # group name (nerfacto/train.py:161-162); fail loudly here too
        # instead of silently freezing the whole model.
        missing = [g for g, hit in matched.items() if not hit]
        if missing:
            raise ValueError(
                f"finetune_params groups {missing} match no parameters of "
                f"model_type={config.model_type!r}; valid groups are "
                "field / proposal / appearance_embedding / "
                "transient_embedding / implicit_mask "
                "(reference get_params_dict keys)")
    return labels


def create_finetune_optimizer(config: Config, variables
                              ) -> Tuple[TrainState, Callable[[int], Any]]:
    """Adam on the finetune param groups only; everything else frozen
    (train_utils.py:515-552, nerfacto/train.py:136)."""
    lr_fn = functools.partial(
        nh_math.learning_rate_decay, lr_init=config.finetune_lr_init,
        lr_final=config.finetune_lr_final, max_steps=config.finetune_max_steps,
        lr_delay_steps=config.finetune_lr_delay_steps,
        lr_delay_mult=config.finetune_lr_delay_mult)
    adam = optax.adam(learning_rate=lr_fn, b1=config.finetune_adam_beta1,
                      b2=config.finetune_adam_beta2,
                      eps=config.finetune_adam_eps)
    tx = optax.multi_transform(
        {"trainable": adam, "frozen": optax.set_to_zero()},
        finetune_partitions(config, variables))
    return TrainState.create(apply_fn=None, params=variables, tx=tx), lr_fn


# -- train step ----------------------------------------------------------------

def create_train_step(model, config: Config, mesh, is_finetune: bool = False):
    """Build the jitted sharded train step.

    Signature: (rng, state, batch, train_frac, inlier_thresholds) ->
    (new_state, stats, new_rng) — the reference's public contract
    (train_utils.py:386-484). rng/state/thresholds are replicated, batch is
    sharded on 'data', state buffers are donated.
    """

    def train_step(rng, state, batch, train_frac, inlier_thresholds):
        rng, key = jax.random.split(rng)

        def loss_fn(variables):
            rays = batch.rays
            renderings, ray_history = model.apply(
                variables, key if config.randomized else None, rays,
                train_frac=train_frac, compute_extras=False,
                zero_glo=False, zero_tra=False)

            if is_finetune or config.transient_type is None:
                losses, stats = zoo.compute_data_loss(
                    batch, rays, renderings, config, False)
            elif config.transient_type == "withmask":
                losses, stats = zoo.compute_data_loss(
                    batch, rays, renderings, config, True)
            elif config.transient_type == "robustnerf":
                losses, stats = zoo.compute_robustnerf_loss(
                    batch, renderings, inlier_thresholds, config)
            elif config.transient_type == "nerfw":
                losses, stats = zoo.compute_nerfw_loss(
                    batch, renderings, ray_history, config)
            elif config.transient_type == "hanerf":
                losses, stats = zoo.compute_hanerf_loss(
                    batch, renderings, train_frac, config)
            else:
                raise ValueError(
                    f"unknown transient_type {config.transient_type!r}")

            if not is_finetune:
                if config.interlevel_loss_mult > 0:
                    losses["interlevel"] = zoo.interlevel_loss(
                        ray_history, config)
                if config.distortion_loss_mult > 0:
                    losses["distortion"] = zoo.distortion_loss(
                        ray_history, config)

            stats["weight_l2s"] = summarize_tree(
                variables["params"], tree_norm_sq)
            if not is_finetune and config.weight_decay_mults:
                stats_l2 = stats["weight_l2s"]
                losses["weight"] = jnp.sum(jnp.array(
                    [m * stats_l2[k]
                     for k, m in config.weight_decay_mults.items()]))

            stats["loss"] = jnp.sum(jnp.array(list(losses.values())))
            stats["losses"] = losses
            return stats["loss"], stats

        (_, stats), grad = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        # No explicit pmean: params are replicated and the batch is sharded,
        # so XLA all-reduces the grads over ICI as part of this jit.
        stats["grad_norms"] = summarize_tree(grad["params"], tree_norm)
        stats["grad_maxes"] = summarize_tree(grad["params"], tree_abs_max)

        grad = clip_gradients(grad, config)
        grad = jax.tree_util.tree_map(jnp.nan_to_num, grad)
        new_state = state.apply_gradients(grads=grad)

        opt_delta = jax.tree_util.tree_map(
            lambda x, y: x - y, new_state.params, state.params)["params"]
        stats["opt_update_norms"] = summarize_tree(opt_delta, tree_norm)
        stats["opt_update_maxes"] = summarize_tree(opt_delta, tree_abs_max)
        stats["psnrs"] = nh_image.mse_to_psnr(stats["mses"])
        stats["psnr"] = stats["psnrs"][-1]
        return new_state, stats, rng

    data_sh = mesh_lib.data_sharding(mesh)
    repl = mesh_lib.replicated(mesh)
    batch_sh = structs.Batch(
        rays=jax.tree_util.tree_map(lambda _: data_sh,
                                    structs.dummy_rays(1)),
        rgb=data_sh)
    return jax.jit(
        train_step,
        in_shardings=(repl, repl, batch_sh, None, None),
        donate_argnums=(1,))


def create_render_fn(model, config: Config, mesh):
    """Jitted full-extras eval forward over a sharded ray chunk.

    Replaces the pmapped all_gather eval fn (train_utils.py:555-576): outputs
    come back sharded and jax.device_get assembles them — no explicit gather
    collective needed.
    """
    def render_eval_fn(variables, train_frac, rays):
        return model.apply(
            variables, None, rays, train_frac=train_frac,
            compute_extras=True,
            zero_glo=config.enable_render_zero_glo,
            zero_tra=config.enable_render_zero_tra)

    data_sh = mesh_lib.data_sharding(mesh)
    rays_sh = jax.tree_util.tree_map(lambda _: data_sh, structs.dummy_rays(1))
    # Multi-host: the RENDERINGS are consumed host-side, and sharded-across-
    # processes outputs are not addressable from any one host, so force that
    # element replicated — XLA inserts the all_gather the reference issues
    # explicitly (train_utils.py:560, models.py:611-616). The ray_history
    # element is DISCARDED by render_image, so it stays data-sharded (its
    # natural layout) — replicating it too would all-gather every
    # [chunk, samples, ...] per-level tensor for nothing. Single host keeps
    # everything sharded (device_get assembles it for free).
    out_sh = ((mesh_lib.replicated(mesh), data_sh)
              if jax.process_count() > 1 else None)
    return jax.jit(render_eval_fn,
                   in_shardings=(mesh_lib.replicated(mesh), None, rays_sh),
                   out_shardings=out_sh)


def setup_model(config: Config, rng, mesh):
    """Model + state + render fn + train step + lr fn (train_utils.py:579-596)."""
    from nerf_hugs_tpu import models
    model, variables = models.construct_model(
        rng, structs.dummy_rays(), config)
    state, lr_fn = create_optimizer(config, variables)
    render_eval_fn = create_render_fn(model, config, mesh)
    train_step = create_train_step(model, config, mesh, is_finetune=False)
    return model, state, render_eval_fn, train_step, lr_fn


def setup_finetune_model(config: Config, model, state: TrainState, mesh):
    new_state, lr_fn = create_finetune_optimizer(config, state.params)
    train_step = create_train_step(model, config, mesh, is_finetune=True)
    return new_state, train_step, lr_fn
