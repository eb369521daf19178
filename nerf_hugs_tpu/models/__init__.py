"""Model registry: one construct_model per backbone, shared call contract.

Every model is nn.Module with
  __call__(rng, rays, train_frac, compute_extras, zero_glo, zero_tra)
    -> (renderings: list[dict], ray_history: list[dict])
(the reference's public model interface, SURVEY.md §1), so the train step,
loss zoo, and chunked renderer are backbone-agnostic.
"""

from __future__ import annotations


def construct_model(rng, rays, config):
    if config.model_type == "mipnerf360":
        from nerf_hugs_tpu.models import mipnerf360
        return mipnerf360.construct_model(rng, rays, config)
    if config.model_type == "nerfacto":
        from nerf_hugs_tpu.models import nerfacto
        return nerfacto.construct_model(rng, rays, config)
    if config.model_type == "nerf":
        from nerf_hugs_tpu.models import vanilla
        return vanilla.construct_model(rng, rays, config)
    raise ValueError(f"unknown model_type {config.model_type!r}")
