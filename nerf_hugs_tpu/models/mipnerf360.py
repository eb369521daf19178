"""Mip-NeRF 360: hierarchical proposal sampling over cone Gaussians.

Per level (parity: MipNeRF360/internal/models.py:73-330): dilate previous
weights, anneal (Schlick bias on train_frac), inverse-CDF-sample new
intervals in normalized s-space, warp to metric t, cast cone Gaussians,
evaluate the level's MLP, alpha-composite. Proposal levels share PropMLP,
the final level uses NerfMLP (+GLO/transient embeds, NeRF-W dual rendering,
HA-NeRF implicit mask).

Returns (renderings: list[dict] per level, ray_history: list[dict] per
level) — the reference's public model contract (SURVEY.md §1).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from nerf_hugs_tpu.configs import config as cfg
from nerf_hugs_tpu.core import coord, render, stepfun
from nerf_hugs_tpu.models.mlp import ImplicitMask, PosEncMLP, _random_split
from nerf_hugs_tpu.utils import structs


class MipNerf360Model(nn.Module):
    config: Any  # top-level cfg.Config (carries model/nerf_mlp/prop_mlp)
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, rng, rays: structs.Rays, train_frac, compute_extras,
                 zero_glo=True, zero_tra=True):
        mc: cfg.ModelConfig = self.config.model
        transient_type = self.config.transient_type
        if transient_type in (None, "withmask", "robustnerf"):
            if mc.num_transient_features != 0:
                raise ValueError(
                    f"transient_type={transient_type} requires "
                    "num_transient_features == 0")
        elif transient_type in ("nerfw", "hanerf"):
            if mc.num_transient_features <= 0:
                raise ValueError(
                    f"transient_type={transient_type} requires "
                    "num_transient_features > 0")
        else:
            raise ValueError(f"unknown transient_type {transient_type!r}")

        # Construction order matters for param naming (weight decay keys).
        nerf_mlp_cfg = cfg.MLPConfig(**vars(self.config.nerf_mlp))
        nerf_mlp_cfg.disable_transient = transient_type != "nerfw"
        prop_mlp_cfg = cfg.MLPConfig(**vars(self.config.prop_mlp))
        prop_mlp_cfg.disable_transient = True
        compute_dtype = jnp.dtype(mc.compute_dtype)
        # remat: recompute each level's MLP activations in the backward pass
        # instead of keeping batch x samples x width live in HBM — the knob
        # that fits the 4x24GB-GPU reference config on one 16GB TPU chip.
        mlp_cls = nn.remat(PosEncMLP) if mc.remat_mlp else PosEncMLP
        nerf_mlp = mlp_cls(nerf_mlp_cfg, compute_dtype, name="NerfMLP_0")
        prop_mlp = mlp_cls(prop_mlp_cfg, compute_dtype, name="PropMLP_0")
        implicit_mask = (ImplicitMask(name="ImplicitMask_0")
                         if transient_type == "hanerf" else None)

        glo_vec = None
        if mc.num_glo_features > 0:
            if not zero_glo:
                glo_vec = nn.Embed(mc.num_embeddings, mc.num_glo_features,
                                   name="GloEmbed_0")(rays.embed_idx[..., 0])
            else:
                glo_vec = jnp.zeros(
                    rays.origins.shape[:-1] + (mc.num_glo_features,))

        tra_vec = None
        if mc.num_transient_features > 0:
            if not zero_tra:
                tra_vec = nn.Embed(
                    mc.num_embeddings, mc.num_transient_features,
                    name="TransientEmbed_0")(rays.embed_idx[..., 0])
            else:
                tra_vec = jnp.zeros(
                    rays.origins.shape[:-1] + (mc.num_transient_features,))

        raydist_fn = cfg.resolve_raydist_fn(mc.raydist_fn)
        _, s_to_t = coord.construct_ray_warps(raydist_fn, rays.near, rays.far)

        # Near-bound annealing: start sampling from deep s and widen.
        if mc.near_anneal_rate is None:
            init_s_near = 0.0
        else:
            init_s_near = jnp.clip(1 - train_frac / mc.near_anneal_rate, 0,
                                   mc.near_anneal_init)
        init_s_far = 1.0
        sdist = jnp.concatenate([jnp.full_like(rays.near, init_s_near),
                                 jnp.full_like(rays.far, init_s_far)], axis=-1)
        weights = jnp.ones_like(rays.near)
        prod_num_samples = 1

        renderings, ray_history = [], []
        for i_level in range(mc.num_levels):
            is_prop = i_level < mc.num_levels - 1
            num_samples = (mc.num_prop_samples if is_prop
                           else mc.num_nerf_samples)

            dilation = mc.dilation_bias + mc.dilation_multiplier * (
                init_s_far - init_s_near) / prod_num_samples
            prod_num_samples *= num_samples

            if i_level > 0 and (mc.dilation_bias > 0 or
                                mc.dilation_multiplier > 0):
                sdist, weights = stepfun.max_dilate_weights(
                    sdist, weights, dilation,
                    domain=(init_s_near, init_s_far), renormalize=True)
                sdist = sdist[..., 1:-1]
                weights = weights[..., 1:-1]

            if mc.anneal_slope > 0:
                # Schlick bias: ramps the sampling temperature over training.
                s = mc.anneal_slope
                anneal = (s * train_frac) / ((s - 1) * train_frac + 1)
            else:
                anneal = 1.0

            # log-space weights**anneal; zero-width intervals forced to -inf.
            logits_resample = jnp.where(
                sdist[..., 1:] > sdist[..., :-1],
                anneal * jnp.log(weights + mc.resample_padding), -jnp.inf)

            key, rng = _random_split(rng)
            sdist = stepfun.sample_intervals(
                key, sdist, logits_resample, num_samples,
                single_jitter=mc.single_jitter,
                domain=(init_s_near, init_s_far),
                use_gpu_resampling=mc.use_gpu_resampling)
            if mc.stop_level_grad:
                sdist = jax.lax.stop_gradient(sdist)

            tdist = s_to_t(sdist)
            gaussians = render.cast_rays(
                tdist, rays.origins, rays.directions, rays.radii,
                mc.ray_shape, diag=False)
            if mc.disable_integration:
                gaussians = (gaussians[0], jnp.zeros_like(gaussians[1]))

            mlp = prop_mlp if is_prop else nerf_mlp
            key, rng = _random_split(rng)
            ray_results = mlp(
                key, gaussians,
                viewdirs=rays.viewdirs if mc.use_viewdirs else None,
                glo_vec=None if is_prop else glo_vec,
                tra_vec=None if is_prop else tra_vec)

            weights = render.compute_alpha_weights(
                ray_results["density"], tdist, rays.directions,
                opaque_background=mc.opaque_background)[0]

            # Background color: fixed, midpoint (deterministic), or sampled.
            if mc.bg_intensity_range[0] == mc.bg_intensity_range[1]:
                bg_rgbs = mc.bg_intensity_range[0]
            elif rng is None:
                bg_rgbs = sum(mc.bg_intensity_range[:2]) / 2
            else:
                key, rng = _random_split(rng)
                bg_rgbs = jax.random.uniform(
                    key, shape=weights.shape[:-1] + (3,),
                    minval=mc.bg_intensity_range[0],
                    maxval=mc.bg_intensity_range[1])

            rendering = render.volumetric_rendering(
                ray_results["rgb"], weights, tdist, bg_rgbs, rays.far,
                compute_extras, extras=None)

            if compute_extras:
                n = self.config.vis_num_rays
                rendering["ray_sdist"] = sdist.reshape(
                    [-1, sdist.shape[-1]])[:n, :]
                rendering["ray_weights"] = weights.reshape(
                    [-1, weights.shape[-1]])[:n, :]
                rgb = ray_results["rgb"]
                rendering["ray_rgbs"] = rgb.reshape(
                    (-1,) + rgb.shape[-2:])[:n, :, :]

            if "density_transient" in ray_results:
                w_s, w_t, w_comb = render.compute_dual_alpha_weights(
                    ray_results["density"], ray_results["density_transient"],
                    tdist, rays.directions,
                    opaque_background=mc.opaque_background)
                (rendering["rgb_combined"], rendering["rgb_static"],
                 rendering["rgb_transient"]) = render.composite_combined_color(
                    ray_results["rgb"], ray_results["rgb_transient"], bg_rgbs,
                    w_s, w_t, w_comb)
                weights_transient = render.compute_alpha_weights(
                    ray_results["density_transient"], tdist, rays.directions,
                    opaque_background=mc.opaque_background)[0]
                rendering["uncertainty"] = (
                    weights_transient[..., None] * ray_results["uncertainty"]
                ).sum(axis=-2) + mc.beta_min

            renderings.append(rendering)
            ray_results["sdist"] = jnp.copy(sdist)
            ray_results["weights"] = jnp.copy(weights)
            ray_history.append(ray_results)

        if compute_extras:
            # Proposal colors are meaningless; show the final color instead.
            ws = [r["ray_weights"] for r in renderings]
            rgbs = [r["ray_rgbs"] for r in renderings]
            final_rgb = jnp.sum(rgbs[-1] * ws[-1][..., None], axis=-2)
            for i in range(len(renderings) - 1):
                renderings[i]["ray_rgbs"] = jnp.broadcast_to(
                    final_rgb[:, None, :], rgbs[i].shape)

        if implicit_mask is not None:
            renderings[-1]["implicit_mask"] = implicit_mask(
                rays.pix_coords, tra_vec)

        return renderings, ray_history


def construct_model(rng, rays: structs.Rays, config):
    """Build + init a MipNerf360Model on a 10-ray slice of `rays`."""
    ray = jax.tree_util.tree_map(
        lambda x: jnp.reshape(x, [-1, x.shape[-1]])[:10], rays)
    model = MipNerf360Model(config=config)
    # jit the init: one compiled executable instead of hundreds of eager
    # dispatches (first-compile latency dominates in this environment).
    init_variables = jax.jit(model.init, static_argnames=(
        "train_frac", "compute_extras", "zero_glo", "zero_tra"))(
        rng, rng=None, rays=ray, train_frac=1.0, compute_extras=False,
        zero_glo=config.model.num_glo_features == 0,
        zero_tra=config.model.num_transient_features == 0)
    return model, init_variables
