"""Vanilla NeRF (coarse/fine PE-MLP), third backbone of the reference.

Parity target: nerfacto/models/nerf.py:119-912. Coarse pass: uniform
intervals in warped s-space; fine pass: inverse-CDF samples from the coarse
weights whose centers are MERGED with the coarse centers (sorted union,
nerf.py:284-295) before refencing into intervals. Both passes share the
unified (renderings, ray_history) contract, with renderings =
[coarse, fine] so data_coarse_loss_mult reproduces the reference's
coarse_rgb_loss_mult.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from nerf_hugs_tpu.configs import config as cfg
from nerf_hugs_tpu.core import coord, render, stepfun
from nerf_hugs_tpu.models.mlp import ImplicitMask, _random_split
from nerf_hugs_tpu.utils import structs


class PointMLP(nn.Module):
    """PE-MLP over points (nerf.py:632-860): pos_enc(contract(x)) -> density
    trunk with skips -> bottleneck + pos_enc(viewdir) [+appearance] -> rgb;
    optional transient head off the bottleneck."""
    mlp_config: cfg.MLPConfig
    use_contraction: bool
    transient: bool
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, rng, positions, viewdirs, embedded_appearance=None,
                 embedded_transient=None):
        c = self.mlp_config
        dense = lambda d: nn.Dense(
            d, kernel_init=getattr(jax.nn.initializers, c.weight_init)(),
            dtype=self.compute_dtype)
        net_act = cfg.resolve_activation(c.net_activation)
        density_act = cfg.resolve_activation(c.density_activation)
        rgb_act = cfg.resolve_activation(c.rgb_activation)

        if self.use_contraction:
            positions = coord.contract(positions)
        x = coord.pos_enc(positions, c.min_deg_point, c.max_deg_point,
                          append_identity=True).astype(self.compute_dtype)
        trunk_in = x
        for i in range(c.net_depth):
            x = net_act(dense(c.net_width)(x))
            if i % c.skip_layer == 0 and i > 0:
                x = jnp.concatenate([x, trunk_in], axis=-1)
        raw_density = dense(1)(x)[..., 0].astype(jnp.float32)
        density_key, rng = _random_split(rng)
        if density_key is not None and c.density_noise > 0:
            raw_density += c.density_noise * jax.random.normal(
                density_key, raw_density.shape)
        density = density_act(raw_density + c.density_bias)

        bottleneck = dense(c.bottleneck_width)(x)
        d_enc = coord.pos_enc(viewdirs, 0, c.deg_view, append_identity=True)
        branches = [bottleneck, d_enc.astype(self.compute_dtype)]
        if embedded_appearance is not None:
            branches.append(embedded_appearance.astype(self.compute_dtype))
        x = jnp.concatenate(branches, axis=-1)
        view_in = x
        for i in range(c.net_depth_viewdirs):
            x = net_act(dense(c.net_width_viewdirs)(x))
            if i % c.skip_layer_dir == 0 and i > 0:
                x = jnp.concatenate([x, view_in], axis=-1)
        raw_rgb = dense(c.num_rgb_channels)(x).astype(jnp.float32)
        rgb = rgb_act(c.rgb_premultiplier * raw_rgb + c.rgb_bias)
        rgb = rgb * (1 + 2 * c.rgb_padding) - c.rgb_padding

        outputs = {"density": density, "rgb": rgb}
        if self.transient and embedded_transient is not None:
            x = jnp.concatenate(
                [bottleneck, embedded_transient.astype(self.compute_dtype)], -1)
            tra_in = x
            for i in range(c.net_depth_transient):
                x = net_act(dense(c.net_width_transient)(x))
                if i % c.skip_layer_transient == 0 and i > 0:
                    x = jnp.concatenate([x, tra_in], axis=-1)
            raw_density_t = dense(1)(x)[..., 0].astype(jnp.float32)
            outputs["density_transient"] = density_act(
                raw_density_t + c.density_bias)
            raw_rgb_t = dense(c.num_rgb_channels)(x).astype(jnp.float32)
            rgb_t = rgb_act(c.rgb_premultiplier * raw_rgb_t + c.rgb_bias)
            outputs["rgb_transient"] = rgb_t * (1 + 2 * c.rgb_padding) - c.rgb_padding
            outputs["uncertainty"] = jax.nn.softplus(
                dense(1)(x).astype(jnp.float32))
        return outputs


class VanillaNerfModel(nn.Module):
    config: Any  # top-level cfg.Config

    @nn.compact
    def __call__(self, rng, rays: structs.Rays, train_frac, compute_extras,
                 zero_glo=True, zero_tra=True):
        nc: cfg.NerfactoConfig = self.config.nerfacto
        config = self.config
        transient_type = config.transient_type
        compute_dtype = jnp.dtype("bfloat16" if config.enable_amp
                                  else "float32")
        deterministic = rng is None

        mlp_cfg = cfg.MLPConfig(
            net_depth=nc.net_depth, net_width=nc.net_width,
            min_deg_point=nc.min_deg_point, max_deg_point=nc.max_deg_point,
            deg_view=nc.deg_view)
        coarse = PointMLP(mlp_cfg, config.enable_scene_contraction, False,
                          compute_dtype, name="coarse")
        fine = PointMLP(mlp_cfg, config.enable_scene_contraction,
                        transient_type == "nerfw", compute_dtype, name="fine")

        appearance_embed = None
        if nc.use_appearance_embedding:
            appearance_embed = nn.Embed(
                config.model.num_embeddings, nc.appearance_embedding_dim,
                name="appearance_embedding")
        transient_embed = None
        if nc.use_transient_embedding:
            transient_embed = nn.Embed(
                config.model.num_embeddings, nc.transient_embedding_dim,
                name="transient_embedding")
        implicit_mask = (ImplicitMask(name="implicit_mask")
                         if transient_type == "hanerf" else None)

        sampler = nc.proposal_initial_sampler
        warp_fn = {"piecewise": "piecewise", "uniform": None,
                   "reciprocal": jnp.reciprocal}[sampler]
        _, s_to_t = coord.construct_ray_warps(warp_fn, rays.near, rays.far)

        def get_embedding(embed, idx, zero):
            if self.is_initializing():
                # construct_model inits with rng=None (deterministic); under
                # eval_embedding='zero' the trace would skip the table read
                # and the param would never be created — the first training
                # apply then fails. Touch it so init builds the full tree.
                _ = embed.embedding
            if zero:
                return jnp.zeros(idx.shape + (embed.features,))
            if deterministic and nc.eval_embedding == "zero":
                return jnp.zeros(idx.shape + (embed.features,))
            if deterministic and nc.eval_embedding == "average":
                return jnp.broadcast_to(embed.embedding.mean(axis=0),
                                        idx.shape + (embed.features,))
            return embed(idx)

        sdist = jnp.concatenate(
            [jnp.zeros_like(rays.near), jnp.ones_like(rays.far)], axis=-1)
        weights = jnp.ones_like(rays.near)

        # One background per ray, shared by the coarse and fine composites
        # AND exposed for target compositing — the reference draws bg_rgb
        # once per batch in the dataloader (nerfacto/datasets/base.py:199-224)
        # and nerf.py renders both fields over it.
        bg_key, rng = _random_split(rng)
        bg_rgbs = self._background(bg_key, rays.origins.shape[:-1] + (3,))

        renderings, ray_history = [], []
        for field_type in ["coarse", "fine"]:
            num_samples = (nc.num_coarse_nerf_samples_per_ray
                           if field_type == "coarse"
                           else nc.num_fine_nerf_samples_per_ray)
            logits = jnp.where(sdist[..., 1:] > sdist[..., :-1],
                               jnp.log(weights), -jnp.inf)
            key, rng = _random_split(rng)
            new_sdist = stepfun.sample_intervals(
                key, sdist, logits, num_samples,
                single_jitter=nc.use_single_jitter, domain=(0.0, 1.0))
            if field_type == "coarse":
                sdist = new_sdist
            else:
                # Fine pass evaluates the union of coarse+fine sample centers
                # (nerf.py:284-295): sort merged centers, refence at midpoints.
                centers = 0.5 * (sdist[..., 1:] + sdist[..., :-1])
                centers_new = 0.5 * (new_sdist[..., 1:] + new_sdist[..., :-1])
                merged = jnp.sort(
                    jnp.concatenate([centers, centers_new], -1), -1)
                mid = 0.5 * (merged[..., 1:] + merged[..., :-1])
                sdist = jnp.concatenate([
                    jnp.maximum(0.0, 2 * merged[..., :1] - mid[..., :1]),
                    mid,
                    jnp.minimum(1.0, 2 * merged[..., -1:] - mid[..., -1:]),
                ], axis=-1)
            sdist = jax.lax.stop_gradient(sdist)
            tdist = s_to_t(sdist)
            t_mids = 0.5 * (tdist[..., 1:] + tdist[..., :-1])
            positions = (rays.origins[..., None, :] +
                         rays.directions[..., None, :] * t_mids[..., None])
            vd = jnp.broadcast_to(rays.viewdirs[..., None, :], positions.shape)
            idx = jnp.broadcast_to(rays.embed_idx, positions.shape[:-1])

            emb_a = None
            if appearance_embed is not None:
                emb_a = get_embedding(appearance_embed, idx, zero_glo)
            emb_t = None
            if (transient_embed is not None and field_type == "fine"
                    and transient_type == "nerfw"):
                emb_t = get_embedding(transient_embed, idx, zero_tra)

            mlp = coarse if field_type == "coarse" else fine
            key, rng = _random_split(rng)
            field_outputs = mlp(key, positions, vd, emb_a, emb_t)

            weights, _, _ = render.compute_alpha_weights(
                field_outputs["density"], tdist, rays.directions,
                opaque_background=nc.opaque_background,
                cumulative_from_first=nc.legacy_cumulative_deltas)
            weights = jnp.nan_to_num(weights)

            rendering = render.volumetric_rendering(
                field_outputs["rgb"], weights, tdist, bg_rgbs, rays.far,
                compute_extras)
            if rng is not None:
                rendering["bg_rgb"] = bg_rgbs  # training-only, for the loss
            history = {"sdist": sdist, "weights": weights,
                       "density": field_outputs["density"]}
            if "density_transient" in field_outputs:
                w_s, w_t, w_c = render.compute_dual_alpha_weights(
                    field_outputs["density"],
                    field_outputs["density_transient"], tdist,
                    rays.directions, opaque_background=nc.opaque_background,
                    cumulative_from_first=nc.legacy_cumulative_deltas)
                (rendering["rgb_combined"], rendering["rgb_static"],
                 rendering["rgb_transient"]) = render.composite_combined_color(
                    field_outputs["rgb"], field_outputs["rgb_transient"],
                    bg_rgbs, w_s, w_t, w_c)
                w_tr = render.compute_alpha_weights(
                    field_outputs["density_transient"], tdist,
                    rays.directions,
                    opaque_background=nc.opaque_background,
                    cumulative_from_first=nc.legacy_cumulative_deltas)[0]
                rendering["uncertainty"] = (
                    w_tr[..., None] * field_outputs["uncertainty"]
                ).sum(axis=-2) + self.config.model.beta_min
                history["density_transient"] = \
                    field_outputs["density_transient"]
            renderings.append(rendering)
            ray_history.append(history)

        if implicit_mask is not None:
            emb_t = get_embedding(transient_embed, rays.embed_idx[..., 0],
                                  zero_tra)
            renderings[-1]["implicit_mask"] = implicit_mask(
                rays.pix_coords, emb_t)
        return renderings, ray_history

    def _background(self, rng, shape):
        color = (self.config.train_background_color if rng is not None
                 else self.config.test_background_color)
        if color == "random" and rng is not None:
            return jax.random.uniform(rng, shape)
        return jnp.full(shape, cfg.BACKGROUND_VALUES[color])


def construct_model(rng, rays: structs.Rays, config):
    ray = jax.tree_util.tree_map(
        lambda x: jnp.reshape(x, [-1, x.shape[-1]])[:10], rays)
    # enable_amp -> bfloat16 MLP compute (the reference trains this stack
    # under torch AMP fp16, nerfacto/train.py:199-207); the model derives
    # its compute dtype from config.enable_amp internally.
    model = VanillaNerfModel(config=config)
    init_variables = jax.jit(model.init, static_argnames=(
        "train_frac", "compute_extras", "zero_glo", "zero_tra"))(
        rng, rng=None, rays=ray, train_frac=1.0, compute_extras=False,
        zero_glo=not config.nerfacto.use_appearance_embedding,
        zero_tra=not config.nerfacto.use_transient_embedding)
    return model, init_variables
