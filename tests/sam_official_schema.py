"""Builder for state dicts with the EXACT official segment-anything key
schema (facebookresearch/segment-anything, sam_vit_{b,l,h}.pth layout).

Used by the conversion tests so that the day the real ViT-H weights arrive,
the only untested variable is the weight values themselves
(reference: HuGS/generate_static_mask.py:190-202 loads the official .pth).
"""

from __future__ import annotations

import numpy as np


def make_official_sam_state_dict(config, fill: str = "zeros", seed: int = 0,
                                 include_mask_downscaling: bool = True):
    """Return {official_key: np.float32 array} with official shapes.

    fill='zeros' for schema/shape tests (cheap, pages stay untouched);
    fill='random' for numeric-golden tests (deterministic seeded values).
    """
    rng = np.random.RandomState(seed)
    if fill == "zeros":
        t = lambda *s: np.zeros(s, np.float32)
    elif fill == "random":
        t = lambda *s: (rng.standard_normal(s) * 0.05).astype(np.float32)
    else:
        raise ValueError(fill)

    sd = {}
    dim, depth = config.encoder_embed_dim, config.encoder_depth
    head_dim = dim // config.encoder_num_heads
    grid = config.image_size // config.patch_size
    c = config.prompt_embed_dim

    # -- image encoder --
    sd["image_encoder.patch_embed.proj.weight"] = t(dim, 3, config.patch_size,
                                                    config.patch_size)
    sd["image_encoder.patch_embed.proj.bias"] = t(dim)
    sd["image_encoder.pos_embed"] = t(1, grid, grid, dim)
    for i in range(depth):
        p = f"image_encoder.blocks.{i}"
        sd[f"{p}.norm1.weight"] = t(dim); sd[f"{p}.norm1.bias"] = t(dim)
        sd[f"{p}.norm2.weight"] = t(dim); sd[f"{p}.norm2.bias"] = t(dim)
        sd[f"{p}.attn.qkv.weight"] = t(dim * 3, dim)
        sd[f"{p}.attn.qkv.bias"] = t(dim * 3)
        sd[f"{p}.attn.proj.weight"] = t(dim, dim)
        sd[f"{p}.attn.proj.bias"] = t(dim)
        size = (config.window_size
                if i not in config.encoder_global_attn_indexes else grid)
        sd[f"{p}.attn.rel_pos_h"] = t(2 * size - 1, head_dim)
        sd[f"{p}.attn.rel_pos_w"] = t(2 * size - 1, head_dim)
        sd[f"{p}.mlp.lin1.weight"] = t(dim * 4, dim)
        sd[f"{p}.mlp.lin1.bias"] = t(dim * 4)
        sd[f"{p}.mlp.lin2.weight"] = t(dim, dim * 4)
        sd[f"{p}.mlp.lin2.bias"] = t(dim)
    sd["image_encoder.neck.0.weight"] = t(c, dim, 1, 1)
    sd["image_encoder.neck.1.weight"] = t(c)
    sd["image_encoder.neck.1.bias"] = t(c)
    sd["image_encoder.neck.2.weight"] = t(c, c, 3, 3)
    sd["image_encoder.neck.3.weight"] = t(c)
    sd["image_encoder.neck.3.bias"] = t(c)

    # -- prompt encoder --
    sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"] = \
        t(2, c // 2)
    for i in range(4):
        sd[f"prompt_encoder.point_embeddings.{i}.weight"] = t(1, c)
    sd["prompt_encoder.not_a_point_embed.weight"] = t(1, c)
    sd["prompt_encoder.no_mask_embed.weight"] = t(1, c)
    if include_mask_downscaling:
        # Official mask-prompt downscaler (mask_in_chans=16); present in
        # every released checkpoint, intentionally unconverted (the HuGS
        # pipeline never feeds mask prompts).
        sd["prompt_encoder.mask_downscaling.0.weight"] = t(4, 1, 2, 2)
        sd["prompt_encoder.mask_downscaling.0.bias"] = t(4)
        sd["prompt_encoder.mask_downscaling.1.weight"] = t(4)
        sd["prompt_encoder.mask_downscaling.1.bias"] = t(4)
        sd["prompt_encoder.mask_downscaling.3.weight"] = t(16, 4, 2, 2)
        sd["prompt_encoder.mask_downscaling.3.bias"] = t(16)
        sd["prompt_encoder.mask_downscaling.4.weight"] = t(16)
        sd["prompt_encoder.mask_downscaling.4.bias"] = t(16)
        sd["prompt_encoder.mask_downscaling.6.weight"] = t(c, 16, 1, 1)
        sd["prompt_encoder.mask_downscaling.6.bias"] = t(c)

    # -- mask decoder --
    md = "mask_decoder"
    for i in range(2):
        p = f"{md}.transformer.layers.{i}"
        for attn, rate in [("self_attn", 1), ("cross_attn_token_to_image", 2),
                           ("cross_attn_image_to_token", 2)]:
            inner = c // rate
            for proj, (o, in_d) in {"q_proj": (inner, c), "k_proj": (inner, c),
                                    "v_proj": (inner, c),
                                    "out_proj": (c, inner)}.items():
                sd[f"{p}.{attn}.{proj}.weight"] = t(o, in_d)
                sd[f"{p}.{attn}.{proj}.bias"] = t(o)
        for n in ["norm1", "norm2", "norm3", "norm4"]:
            sd[f"{p}.{n}.weight"] = t(c); sd[f"{p}.{n}.bias"] = t(c)
        sd[f"{p}.mlp.lin1.weight"] = t(2048, c)
        sd[f"{p}.mlp.lin1.bias"] = t(2048)
        sd[f"{p}.mlp.lin2.weight"] = t(c, 2048)
        sd[f"{p}.mlp.lin2.bias"] = t(c)
    inner = c // 2
    for proj, (o, in_d) in {"q_proj": (inner, c), "k_proj": (inner, c),
                            "v_proj": (inner, c),
                            "out_proj": (c, inner)}.items():
        sd[f"{md}.transformer.final_attn_token_to_image.{proj}.weight"] = \
            t(o, in_d)
        sd[f"{md}.transformer.final_attn_token_to_image.{proj}.bias"] = t(o)
    sd[f"{md}.transformer.norm_final_attn.weight"] = t(c)
    sd[f"{md}.transformer.norm_final_attn.bias"] = t(c)
    sd[f"{md}.iou_token.weight"] = t(1, c)
    sd[f"{md}.mask_tokens.weight"] = t(4, c)
    sd[f"{md}.output_upscaling.0.weight"] = t(c, c // 4, 2, 2)
    sd[f"{md}.output_upscaling.0.bias"] = t(c // 4)
    sd[f"{md}.output_upscaling.1.weight"] = t(c // 4)
    sd[f"{md}.output_upscaling.1.bias"] = t(c // 4)
    sd[f"{md}.output_upscaling.3.weight"] = t(c // 4, c // 8, 2, 2)
    sd[f"{md}.output_upscaling.3.bias"] = t(c // 8)
    for i in range(4):
        p = f"{md}.output_hypernetworks_mlps.{i}"
        sd[f"{p}.layers.0.weight"] = t(c, c); sd[f"{p}.layers.0.bias"] = t(c)
        sd[f"{p}.layers.1.weight"] = t(c, c); sd[f"{p}.layers.1.bias"] = t(c)
        sd[f"{p}.layers.2.weight"] = t(c // 8, c)
        sd[f"{p}.layers.2.bias"] = t(c // 8)
    p = f"{md}.iou_prediction_head"
    sd[f"{p}.layers.0.weight"] = t(c, c); sd[f"{p}.layers.0.bias"] = t(c)
    sd[f"{p}.layers.1.weight"] = t(c, c); sd[f"{p}.layers.1.bias"] = t(c)
    sd[f"{p}.layers.2.weight"] = t(4, c); sd[f"{p}.layers.2.bias"] = t(4)
    return sd
