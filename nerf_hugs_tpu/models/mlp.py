"""PosEnc MLP: the Mip-NeRF 360 field network (density + color + transient).

Flow (parity: MipNeRF360/internal/models.py:360-560): warp Gaussians
(optional contraction via linearization) -> lift onto a geodesic basis and
diagonalize -> integrated positional encoding -> density trunk with skips ->
bottleneck -> [viewdir encoding | GLO] -> color head; optional NeRF-W
transient head (density_t, rgb_t, uncertainty) off the same bottleneck.

TPU notes: all Dense layers run as [batch*samples, width] matmuls which XLA
tiles onto the MXU; `compute_dtype=bfloat16` casts activations (params stay
fp32) for 2x MXU throughput; density/rgb activations are computed in fp32.
"""

from __future__ import annotations

import functools
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from nerf_hugs_tpu.configs import config as cfg
from nerf_hugs_tpu.core import coord, geopoly


def _random_split(rng):
    if rng is None:
        return None, None
    key, rng = jax.random.split(rng)
    return key, rng


class PosEncMLP(nn.Module):
    """Integrated-positional-encoding MLP parameterized by an MLPConfig."""

    mlp_config: cfg.MLPConfig
    compute_dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.mlp_config
        self.pos_basis_t = jnp.array(
            geopoly.generate_basis(c.basis_shape, c.basis_subdivisions)).T
        self.net_activation = cfg.resolve_activation(c.net_activation)
        self.density_activation = cfg.resolve_activation(c.density_activation)
        self.rgb_activation = cfg.resolve_activation(c.rgb_activation)
        self.uncertainty_activation = cfg.resolve_activation(
            c.uncertainty_activation)
        self.warp_fn = cfg.resolve_warp_fn(c.warp_fn)

    @nn.compact
    def __call__(self, rng, gaussians, viewdirs=None, glo_vec=None,
                 tra_vec=None):
        c = self.mlp_config
        dense = functools.partial(
            nn.Dense, kernel_init=getattr(jax.nn.initializers, c.weight_init)(),
            dtype=self.compute_dtype)

        density_key, rng = _random_split(rng)

        means, covs = gaussians
        if self.warp_fn is not None:
            means, covs = coord.track_linearize(self.warp_fn, means, covs)
        lifted_means, lifted_vars = coord.lift_and_diagonalize(
            means, covs, self.pos_basis_t)
        feats = coord.integrated_pos_enc(
            lifted_means, lifted_vars, c.min_deg_point, c.max_deg_point)

        # Density trunk with periodic skip connections.
        x = feats.astype(self.compute_dtype)
        trunk_inputs = x
        for i in range(c.net_depth):
            x = dense(c.net_width)(x)
            x = self.net_activation(x)
            if i % c.skip_layer == 0 and i > 0:
                x = jnp.concatenate([x, trunk_inputs], axis=-1)
        raw_density = dense(1)(x)[..., 0].astype(jnp.float32)
        if density_key is not None and c.density_noise > 0:
            raw_density += c.density_noise * jax.random.normal(
                density_key, raw_density.shape)
        density = self.density_activation(raw_density + c.density_bias)

        outputs = {"density": density}
        if c.disable_rgb:
            outputs["rgb"] = jnp.zeros_like(means)
            return outputs

        bottleneck = None
        if viewdirs is not None:
            branches = []
            if c.bottleneck_width > 0:
                bottleneck = dense(c.bottleneck_width)(x)
                if rng is not None and c.bottleneck_noise > 0:
                    key, rng = _random_split(rng)
                    bottleneck += c.bottleneck_noise * jax.random.normal(
                        key, bottleneck.shape, dtype=bottleneck.dtype)
                branches.append(bottleneck)
            dir_enc = coord.pos_enc(viewdirs, min_deg=0, max_deg=c.deg_view,
                                    append_identity=True)
            dir_enc = jnp.broadcast_to(
                dir_enc[..., None, :],
                bottleneck.shape[:-1] + (dir_enc.shape[-1],))
            branches.append(dir_enc.astype(self.compute_dtype))
            if glo_vec is not None:
                glo = jnp.broadcast_to(
                    glo_vec[..., None, :],
                    bottleneck.shape[:-1] + glo_vec.shape[-1:])
                branches.append(glo.astype(self.compute_dtype))
            x = jnp.concatenate(branches, axis=-1)
            view_inputs = x
            for i in range(c.net_depth_viewdirs):
                x = dense(c.net_width_viewdirs)(x)
                x = self.net_activation(x)
                if i % c.skip_layer_dir == 0 and i > 0:
                    x = jnp.concatenate([x, view_inputs], axis=-1)

        raw_rgb = dense(c.num_rgb_channels)(x).astype(jnp.float32)
        rgb = self.rgb_activation(c.rgb_premultiplier * raw_rgb + c.rgb_bias)
        outputs["rgb"] = rgb * (1 + 2 * c.rgb_padding) - c.rgb_padding

        if tra_vec is not None and not c.disable_transient:
            tra = jnp.broadcast_to(
                tra_vec[..., None, :],
                bottleneck.shape[:-1] + tra_vec.shape[-1:])
            x = jnp.concatenate(
                [bottleneck, tra.astype(self.compute_dtype)], axis=-1)
            tra_inputs = x
            for i in range(c.net_depth_transient):
                x = dense(c.net_width_transient)(x)
                x = self.net_activation(x)
                if i % c.skip_layer_transient == 0 and i > 0:
                    x = jnp.concatenate([x, tra_inputs], axis=-1)
            raw_density_t = dense(1)(x)[..., 0].astype(jnp.float32)
            outputs["density_transient"] = self.density_activation(
                raw_density_t + c.density_bias)
            raw_rgb_t = dense(c.num_rgb_channels)(x).astype(jnp.float32)
            rgb_t = self.rgb_activation(c.rgb_premultiplier * raw_rgb_t + c.rgb_bias)
            outputs["rgb_transient"] = (
                rgb_t * (1 + 2 * c.rgb_padding) - c.rgb_padding)
            outputs["uncertainty"] = self.uncertainty_activation(
                dense(1)(x).astype(jnp.float32))
        return outputs


class ImplicitMask(nn.Module):
    """HA-NeRF 2D implicit mask: PE(pixel coords) + transient embed -> sigmoid
    (models.py:651-675)."""
    net_depth: int = 4
    net_width: int = 256
    deg_coord: int = 10
    weight_init: str = "he_uniform"

    @nn.compact
    def __call__(self, pix_coords, tra_vec):
        dense = functools.partial(
            nn.Dense,
            kernel_init=getattr(jax.nn.initializers, self.weight_init)())
        x = jnp.concatenate(
            [coord.pos_enc(pix_coords, min_deg=0, max_deg=self.deg_coord,
                           append_identity=True), tra_vec], axis=-1)
        for _ in range(self.net_depth):
            x = nn.relu(dense(self.net_width)(x))
        return nn.sigmoid(dense(1)(x))
