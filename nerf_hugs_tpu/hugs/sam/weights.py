"""Convert official segment-anything .pth checkpoints into our flax params.

Key layout of the official checkpoint (facebookresearch/segment-anything):
  image_encoder.patch_embed.proj.{weight,bias}
  image_encoder.pos_embed
  image_encoder.blocks.{i}.{norm1,attn.qkv,attn.proj,attn.rel_pos_h,
                           attn.rel_pos_w,norm2,mlp.lin1,mlp.lin2}
  image_encoder.neck.{0,1,2,3}
  prompt_encoder.{pe_layer.positional_encoding_gaussian_matrix,
                  point_embeddings.{0..3}.weight, not_a_point_embed.weight,
                  no_mask_embed.weight}
  mask_decoder.{transformer.layers.{i}.*, transformer.final_attn_token_to_image,
                transformer.norm_final_attn, iou_token.weight,
                mask_tokens.weight, output_upscaling.{0,1,3},
                output_hypernetworks_mlps.{i}.layers.{j},
                iou_prediction_head.layers.{j}}
Conventions: torch Linear weight -> flax Dense kernel transposed; torch Conv
OIHW -> flax HWIO; torch ConvTranspose IOHW -> flax HWIO (flipped? flax
ConvTranspose uses HWIO with no flip — handled below).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from nerf_hugs_tpu.hugs.sam.modeling import SamConfig


def _t(x):
    return np.asarray(x).T


def _conv(x):  # OIHW -> HWIO
    return np.asarray(x).transpose(2, 3, 1, 0)


def _convT(x):  # torch ConvTranspose2d weight is (in, out, kH, kW) -> HWIO
    return np.asarray(x).transpose(2, 3, 0, 1)


def _ln(sd, prefix):
    return {"scale": np.asarray(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"])}


def _ln2d(sd, prefix):
    return {"weight": np.asarray(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"])}


def _dense(sd, prefix):
    return {"kernel": _t(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"])}


def _down_attn(sd, prefix):
    return {"q_proj": _dense(sd, f"{prefix}.q_proj"),
            "k_proj": _dense(sd, f"{prefix}.k_proj"),
            "v_proj": _dense(sd, f"{prefix}.v_proj"),
            "out_proj": _dense(sd, f"{prefix}.out_proj")}


def _mlp3(sd, prefix, n_layers=3):
    return {f"lin_{j}": _dense(sd, f"{prefix}.layers.{j}")
            for j in range(n_layers)}


# Official checkpoint keys that are intentionally NOT converted: the mask-
# prompt downscaling conv stack. Neither the HuGS pipeline nor the AMG ever
# feeds a mask prompt (generate_static_mask.py prompts with points only), so
# the flax model always uses no_mask_embed for the dense embedding and omits
# these layers entirely.
_INTENTIONALLY_UNUSED_PREFIXES = ("prompt_encoder.mask_downscaling.",)


class _TrackingDict(dict):
    """Records which checkpoint keys the conversion actually read."""

    def __init__(self, base):
        super().__init__(base)
        self.read_keys = set()

    def __getitem__(self, key):
        self.read_keys.add(key)
        return super().__getitem__(key)


def convert_state_dict(sd: Dict[str, Any], config: SamConfig,
                       strict: bool = True) -> Dict[str, Any]:
    """Convert an official-layout state dict into flax variables.

    strict=True additionally asserts every checkpoint key was consumed
    (modulo the documented mask-downscaling allowlist) — a renamed or extra
    key in a future official release fails loudly instead of silently
    producing a half-initialized model.
    """
    sd = _TrackingDict(sd)
    variables = _convert_state_dict(sd, config)
    if strict:
        unused = {
            k for k in sd
            if k not in sd.read_keys
            and not k.startswith(_INTENTIONALLY_UNUSED_PREFIXES)}
        if unused:
            raise ValueError(
                "official checkpoint keys not consumed by conversion: "
                f"{sorted(unused)[:20]}")
    return variables


def _convert_state_dict(sd: Dict[str, Any], config: SamConfig
                        ) -> Dict[str, Any]:
    params: Dict[str, Any] = {}

    # -- image encoder -----------------------------------------------------
    enc: Dict[str, Any] = {
        "patch_embed": {
            "kernel": _conv(sd["image_encoder.patch_embed.proj.weight"]),
            "bias": np.asarray(sd["image_encoder.patch_embed.proj.bias"]),
        },
        "pos_embed": np.asarray(sd["image_encoder.pos_embed"]),
        "neck_conv1": {"kernel": _conv(sd["image_encoder.neck.0.weight"])},
        "neck_ln1": _ln2d(sd, "image_encoder.neck.1"),
        "neck_conv2": {"kernel": _conv(sd["image_encoder.neck.2.weight"])},
        "neck_ln2": _ln2d(sd, "image_encoder.neck.3"),
    }
    for i in range(config.encoder_depth):
        p = f"image_encoder.blocks.{i}"
        enc[f"block_{i}"] = {
            "norm1": _ln(sd, f"{p}.norm1"),
            "norm2": _ln(sd, f"{p}.norm2"),
            "attn": {
                "qkv": _dense(sd, f"{p}.attn.qkv"),
                "proj": _dense(sd, f"{p}.attn.proj"),
                "rel_pos_h": np.asarray(sd[f"{p}.attn.rel_pos_h"]),
                "rel_pos_w": np.asarray(sd[f"{p}.attn.rel_pos_w"]),
            },
            "mlp_lin1": _dense(sd, f"{p}.mlp.lin1"),
            "mlp_lin2": _dense(sd, f"{p}.mlp.lin2"),
        }
    params["image_encoder"] = enc

    # -- prompt encoder ------------------------------------------------------
    pe = {
        "pe_layer": {
            "positional_encoding_gaussian_matrix": np.asarray(
                sd["prompt_encoder.pe_layer."
                   "positional_encoding_gaussian_matrix"]),
        },
        "not_a_point_embed": np.asarray(
            sd["prompt_encoder.not_a_point_embed.weight"]),
        "no_mask_embed": np.asarray(
            sd["prompt_encoder.no_mask_embed.weight"]),
    }
    for i in range(4):
        pe[f"point_embed_{i}"] = np.asarray(
            sd[f"prompt_encoder.point_embeddings.{i}.weight"])
    params["prompt_encoder"] = pe

    # -- mask decoder ---------------------------------------------------------
    md_prefix = "mask_decoder"
    transformer: Dict[str, Any] = {
        "final_attn_token_to_image": _down_attn(
            sd, f"{md_prefix}.transformer.final_attn_token_to_image"),
        "norm_final_attn": _ln(
            sd, f"{md_prefix}.transformer.norm_final_attn"),
    }
    for i in range(2):
        p = f"{md_prefix}.transformer.layers.{i}"
        transformer[f"layer_{i}"] = {
            "self_attn": _down_attn(sd, f"{p}.self_attn"),
            "cross_attn_token_to_image": _down_attn(
                sd, f"{p}.cross_attn_token_to_image"),
            "cross_attn_image_to_token": _down_attn(
                sd, f"{p}.cross_attn_image_to_token"),
            "norm1": _ln(sd, f"{p}.norm1"),
            "norm2": _ln(sd, f"{p}.norm2"),
            "norm3": _ln(sd, f"{p}.norm3"),
            "norm4": _ln(sd, f"{p}.norm4"),
            "mlp_lin1": _dense(sd, f"{p}.mlp.lin1"),
            "mlp_lin2": _dense(sd, f"{p}.mlp.lin2"),
        }
    decoder: Dict[str, Any] = {
        "transformer": transformer,
        "iou_token": np.asarray(sd[f"{md_prefix}.iou_token.weight"]),
        "mask_tokens": np.asarray(sd[f"{md_prefix}.mask_tokens.weight"]),
        "upscale_conv1": {
            "kernel": _convT(sd[f"{md_prefix}.output_upscaling.0.weight"]),
            "bias": np.asarray(sd[f"{md_prefix}.output_upscaling.0.bias"]),
        },
        "upscale_ln": _ln2d(sd, f"{md_prefix}.output_upscaling.1"),
        "upscale_conv2": {
            "kernel": _convT(sd[f"{md_prefix}.output_upscaling.3.weight"]),
            "bias": np.asarray(sd[f"{md_prefix}.output_upscaling.3.bias"]),
        },
        "iou_head": _mlp3(sd, f"{md_prefix}.iou_prediction_head"),
    }
    num_mask_tokens = decoder["mask_tokens"].shape[0]
    for i in range(num_mask_tokens):
        decoder[f"hyper_mlp_{i}"] = _mlp3(
            sd, f"{md_prefix}.output_hypernetworks_mlps.{i}")
    params["mask_decoder"] = decoder

    return {"params": params}


def load_torch_checkpoint(path: str, config: SamConfig):
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    sd = {k: v.numpy() for k, v in sd.items()}
    return convert_state_dict(sd, config)
