"""Segment Anything (SAM) in JAX/flax for TPU inference.

Re-implementation of the SAM architecture (Kirillov et al. 2023; reference
dependency: segment-anything, used by HuGS/generate_static_mask.py:12-13,
190-202). Three parts:
  * ImageEncoderViT — ViT with 16x16 patch embed, decomposed relative
    position attention, window attention except at the global blocks, and a
    256-channel convolutional neck. vit_h: 1280 dim / 32 layers.
  * PromptEncoder — random-Fourier positional embedding of points/boxes plus
    learned point-label embeddings and a dense no-mask embedding.
  * MaskDecoder — two-way transformer (tokens<->image cross-attention, 2
    layers), 4x upscaling head, per-mask-token hypernetwork MLPs, IoU head.

Weights load from the official .pth via hugs.sam.weights (no network egress
in this build environment, so checkpoints must be provided on disk).

TPU notes: inference is all dense matmuls + convs (MXU-friendly). The
encoder runs once per image at 1024x1024 and dominates; batched point
prompts share it. bf16 compute is safe for the encoder (set compute_dtype).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SamConfig:
    image_size: int = 1024
    patch_size: int = 16
    encoder_embed_dim: int = 1280      # vit_h
    encoder_depth: int = 32
    encoder_num_heads: int = 16
    encoder_global_attn_indexes: Tuple[int, ...] = (7, 15, 23, 31)
    window_size: int = 14
    prompt_embed_dim: int = 256
    mask_threshold: float = 0.0
    pixel_mean: Tuple[float, ...] = (123.675, 116.28, 103.53)
    pixel_std: Tuple[float, ...] = (58.395, 57.12, 57.375)


VIT_CONFIGS = {
    "vit_b": dict(encoder_embed_dim=768, encoder_depth=12,
                  encoder_num_heads=12,
                  encoder_global_attn_indexes=(2, 5, 8, 11)),
    "vit_l": dict(encoder_embed_dim=1024, encoder_depth=24,
                  encoder_num_heads=16,
                  encoder_global_attn_indexes=(5, 11, 17, 23)),
    "vit_h": dict(encoder_embed_dim=1280, encoder_depth=32,
                  encoder_num_heads=16,
                  encoder_global_attn_indexes=(7, 15, 23, 31)),
    # Tiny config for tests.
    "vit_t": dict(encoder_embed_dim=64, encoder_depth=2,
                  encoder_num_heads=2, encoder_global_attn_indexes=(1,)),
}


def make_sam_config(model_type: str, **overrides) -> SamConfig:
    if model_type == "default":
        model_type = "vit_h"
    return SamConfig(**{**VIT_CONFIGS[model_type], **overrides})


class LayerNorm2d(nn.Module):
    """Channel-wise LayerNorm over NHWC feature maps (SAM's LayerNorm2d)."""
    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x):
        mean = x.mean(axis=-1, keepdims=True)
        var = ((x - mean) ** 2).mean(axis=-1, keepdims=True)
        x = (x - mean) / jnp.sqrt(var + self.epsilon)
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        b = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        return x * w + b


def _get_rel_pos(q_size: int, k_size: int, rel_pos: jnp.ndarray) -> jnp.ndarray:
    """Select (interpolating if needed) relative positional embeddings."""
    max_rel_dist = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel_dist:
        rel_pos = jax.image.resize(
            rel_pos, (max_rel_dist, rel_pos.shape[1]), "linear")
    q_coords = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.astype(jnp.int32)]


def _add_decomposed_rel_pos(attn, q, rel_pos_h, rel_pos_w, q_hw, k_hw):
    """SAM's decomposed relative position bias (mvitv2 style)."""
    q_h, q_w = q_hw
    k_h, k_w = k_hw
    rh = _get_rel_pos(q_h, k_h, rel_pos_h)  # [q_h, k_h, dim]
    rw = _get_rel_pos(q_w, k_w, rel_pos_w)
    b, _, dim = q.shape
    r_q = q.reshape(b, q_h, q_w, dim)
    rel_h = jnp.einsum("bhwc,hkc->bhwk", r_q, rh)
    rel_w = jnp.einsum("bhwc,wkc->bhwk", r_q, rw)
    attn = attn.reshape(b, q_h, q_w, k_h, k_w)
    attn = attn + rel_h[:, :, :, :, None] + rel_w[:, :, :, None, :]
    return attn.reshape(b, q_h * q_w, k_h * k_w)


class Attention(nn.Module):
    num_heads: int
    use_rel_pos: bool = True
    input_size: Optional[Tuple[int, int]] = None

    @nn.compact
    def __call__(self, x):  # x: [B, H, W, C]
        b, h, w, c = x.shape
        head_dim = c // self.num_heads
        scale = head_dim ** -0.5
        qkv = nn.Dense(c * 3, name="qkv")(x.reshape(b, h * w, c))
        qkv = qkv.reshape(b, h * w, 3, self.num_heads, head_dim)
        qkv = qkv.transpose(2, 0, 3, 1, 4).reshape(
            3, b * self.num_heads, h * w, head_dim)
        q, k, v = qkv[0], qkv[1], qkv[2]

        attn = (q * scale) @ k.transpose(0, 2, 1)
        if self.use_rel_pos:
            rel_pos_h = self.param("rel_pos_h", nn.initializers.zeros,
                                   (2 * self.input_size[0] - 1, head_dim))
            rel_pos_w = self.param("rel_pos_w", nn.initializers.zeros,
                                   (2 * self.input_size[1] - 1, head_dim))
            attn = _add_decomposed_rel_pos(attn, q, rel_pos_h, rel_pos_w,
                                           (h, w), (h, w))
        attn = jax.nn.softmax(attn, axis=-1)
        x = (attn @ v).reshape(b, self.num_heads, h, w, head_dim)
        x = x.transpose(0, 2, 3, 1, 4).reshape(b, h, w, c)
        return nn.Dense(c, name="proj")(x)


def window_partition(x, window_size):
    b, h, w, c = x.shape
    pad_h = (window_size - h % window_size) % window_size
    pad_w = (window_size - w % window_size) % window_size
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // window_size, window_size,
                  wp // window_size, window_size, c)
    windows = x.transpose(0, 1, 3, 2, 4, 5).reshape(
        -1, window_size, window_size, c)
    return windows, (hp, wp)


def window_unpartition(windows, window_size, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = windows.shape[0] // (hp * wp // window_size**2)
    x = windows.reshape(b, hp // window_size, wp // window_size,
                        window_size, window_size, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w, :]


class Block(nn.Module):
    num_heads: int
    window_size: int
    input_size: Tuple[int, int]

    @nn.compact
    def __call__(self, x):
        shortcut = x
        y = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        if self.window_size > 0:
            h, w = y.shape[1], y.shape[2]
            y, pad_hw = window_partition(y, self.window_size)
            attn_size = (self.window_size, self.window_size)
        else:
            attn_size = self.input_size
        y = Attention(self.num_heads, input_size=attn_size, name="attn")(y)
        if self.window_size > 0:
            y = window_unpartition(y, self.window_size, pad_hw, (h, w))
        x = shortcut + y
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = nn.Dense(x.shape[-1] * 4, name="mlp_lin1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(x.shape[-1], name="mlp_lin2")(y)
        return x + y


class ImageEncoderViT(nn.Module):
    config: SamConfig

    @nn.compact
    def __call__(self, x):  # x: [B, H, W, 3] normalized
        c = self.config
        grid = c.image_size // c.patch_size
        x = nn.Conv(c.encoder_embed_dim, (c.patch_size, c.patch_size),
                    strides=(c.patch_size, c.patch_size), padding="VALID",
                    name="patch_embed")(x)
        pos_embed = self.param("pos_embed", nn.initializers.zeros,
                               (1, grid, grid, c.encoder_embed_dim))
        x = x + pos_embed
        for i in range(c.encoder_depth):
            window = 0 if i in c.encoder_global_attn_indexes else c.window_size
            x = Block(c.encoder_num_heads, window, (grid, grid),
                      name=f"block_{i}")(x)
        # Neck: 1x1 conv -> LN -> 3x3 conv -> LN, 256 channels, no bias.
        x = nn.Conv(c.prompt_embed_dim, (1, 1), use_bias=False,
                    name="neck_conv1")(x)
        x = LayerNorm2d(name="neck_ln1")(x)
        x = nn.Conv(c.prompt_embed_dim, (3, 3), padding="SAME",
                    use_bias=False, name="neck_conv2")(x)
        x = LayerNorm2d(name="neck_ln2")(x)
        return x  # [B, grid, grid, 256]


class PositionEmbeddingRandom(nn.Module):
    """Random Fourier positional encoding (frozen gaussian matrix)."""
    num_pos_feats: int = 128

    @nn.compact
    def __call__(self, coords_normalized):
        """coords in [0,1]^2 -> [..., 2*num_pos_feats]."""
        gauss = self.param(
            "positional_encoding_gaussian_matrix",
            lambda key, shape: jax.random.normal(key, shape),
            (2, self.num_pos_feats))
        coords = 2 * coords_normalized - 1
        coords = coords @ gauss
        coords = 2 * jnp.pi * coords
        return jnp.concatenate([jnp.sin(coords), jnp.cos(coords)], axis=-1)

    def grid(self, size: int):
        """Dense PE over a size x size grid -> [size, size, C]."""
        ys = (jnp.arange(size) + 0.5) / size
        xs = (jnp.arange(size) + 0.5) / size
        grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), -1)
        return self(grid)


class PromptEncoder(nn.Module):
    config: SamConfig

    def setup(self):
        c = self.config
        self.pe_layer = PositionEmbeddingRandom(c.prompt_embed_dim // 2)
        # 0: negative point, 1: positive point, 2/3: box corners.
        self.point_embeddings = [
            self.param(f"point_embed_{i}", nn.initializers.normal(1.0),
                       (1, c.prompt_embed_dim)) for i in range(4)]
        self.not_a_point_embed = self.param(
            "not_a_point_embed", nn.initializers.normal(1.0),
            (1, c.prompt_embed_dim))
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0),
            (1, c.prompt_embed_dim))

    def __call__(self, point_coords, point_labels):
        """point_coords: [B, N, 2] in image pixels (1024-scale);
        point_labels: [B, N] in {-1 pad, 0 neg, 1 pos}.
        Returns (sparse [B, N+1, C], dense [B, g, g, C])."""
        c = self.config
        # Pad with a sentinel point (SAM appends one when no box is given).
        pad_point = jnp.zeros(point_coords.shape[:-2] + (1, 2))
        pad_label = -jnp.ones(point_labels.shape[:-1] + (1,))
        coords = jnp.concatenate([point_coords, pad_point], axis=-2)
        labels = jnp.concatenate([point_labels, pad_label], axis=-1)

        pe = self.pe_layer(coords / c.image_size + 0.0)
        pe = jnp.where((labels == -1)[..., None],
                       self.not_a_point_embed[0], pe)
        pe = pe + jnp.where((labels == 0)[..., None],
                            self.point_embeddings[0][0], 0.0)
        pe = pe + jnp.where((labels == 1)[..., None],
                            self.point_embeddings[1][0], 0.0)
        grid = c.image_size // c.patch_size
        dense = jnp.broadcast_to(
            self.no_mask_embed.reshape(1, 1, 1, -1),
            (coords.shape[0], grid, grid, c.prompt_embed_dim))
        return pe, dense

    def get_dense_pe(self):
        grid = self.config.image_size // self.config.patch_size
        return self.pe_layer.grid(grid)


class _DownAttention(nn.Module):
    """Attention with internal downprojection (two-way transformer blocks)."""
    num_heads: int
    downsample_rate: int = 1

    @nn.compact
    def __call__(self, q, k, v):
        c = q.shape[-1]
        inner = c // self.downsample_rate
        head_dim = inner // self.num_heads
        qp = nn.Dense(inner, name="q_proj")(q)
        kp = nn.Dense(inner, name="k_proj")(k)
        vp = nn.Dense(inner, name="v_proj")(v)
        def split(x):
            b, n, _ = x.shape
            return x.reshape(b, n, self.num_heads, head_dim).transpose(
                0, 2, 1, 3)
        qp, kp, vp = split(qp), split(kp), split(vp)
        attn = jax.nn.softmax(
            (qp @ kp.transpose(0, 1, 3, 2)) / jnp.sqrt(head_dim), axis=-1)
        out = (attn @ vp).transpose(0, 2, 1, 3).reshape(
            q.shape[0], q.shape[1], inner)
        return nn.Dense(c, name="out_proj")(out)


class TwoWayAttentionBlock(nn.Module):
    num_heads: int
    mlp_dim: int = 2048
    skip_first_layer_pe: bool = False

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        if self.skip_first_layer_pe:
            queries = _DownAttention(self.num_heads, name="self_attn")(
                queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + _DownAttention(
                self.num_heads, name="self_attn")(q, q, queries)
        queries = nn.LayerNorm(name="norm1")(queries)

        q = queries + query_pe
        k = keys + key_pe
        queries = queries + _DownAttention(
            self.num_heads, 2, name="cross_attn_token_to_image")(q, k, keys)
        queries = nn.LayerNorm(name="norm2")(queries)

        mlp = nn.Dense(self.mlp_dim, name="mlp_lin1")(queries)
        mlp = nn.relu(mlp)
        mlp = nn.Dense(queries.shape[-1], name="mlp_lin2")(mlp)
        queries = nn.LayerNorm(name="norm3")(queries + mlp)

        q = queries + query_pe
        k = keys + key_pe
        keys = keys + _DownAttention(
            self.num_heads, 2, name="cross_attn_image_to_token")(k, q, queries)
        keys = nn.LayerNorm(name="norm4")(keys)
        return queries, keys


class TwoWayTransformer(nn.Module):
    depth: int = 2
    num_heads: int = 8
    mlp_dim: int = 2048

    @nn.compact
    def __call__(self, image_embedding, image_pe, point_embedding):
        b, h, w, c = image_embedding.shape
        keys = image_embedding.reshape(b, h * w, c)
        key_pe = image_pe.reshape(1, h * w, c)
        key_pe = jnp.broadcast_to(key_pe, keys.shape)
        queries = point_embedding
        for i in range(self.depth):
            queries, keys = TwoWayAttentionBlock(
                self.num_heads, self.mlp_dim, skip_first_layer_pe=(i == 0),
                name=f"layer_{i}")(queries, keys, point_embedding, key_pe)
        q = queries + point_embedding
        k = keys + key_pe
        queries = queries + _DownAttention(
            self.num_heads, 2, name="final_attn_token_to_image")(q, k, keys)
        queries = nn.LayerNorm(name="norm_final_attn")(queries)
        return queries, keys


class _MLP(nn.Module):
    hidden_dim: int
    output_dim: int
    num_layers: int
    sigmoid_output: bool = False

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden_dim, name=f"lin_{i}")(x))
        x = nn.Dense(self.output_dim, name=f"lin_{self.num_layers - 1}")(x)
        return jax.nn.sigmoid(x) if self.sigmoid_output else x


class MaskDecoder(nn.Module):
    config: SamConfig
    num_multimask_outputs: int = 3

    @nn.compact
    def __call__(self, image_embeddings, image_pe, sparse_prompt_embeddings,
                 dense_prompt_embeddings, multimask_output: bool):
        c = self.config.prompt_embed_dim
        num_mask_tokens = self.num_multimask_outputs + 1
        iou_token = self.param("iou_token", nn.initializers.normal(1.0),
                               (1, c))
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(1.0),
                                 (num_mask_tokens, c))

        b = sparse_prompt_embeddings.shape[0]
        output_tokens = jnp.concatenate([iou_token, mask_tokens], axis=0)
        output_tokens = jnp.broadcast_to(
            output_tokens[None], (b,) + output_tokens.shape)
        tokens = jnp.concatenate([output_tokens, sparse_prompt_embeddings],
                                 axis=1)

        src = image_embeddings + dense_prompt_embeddings
        hs, src = TwoWayTransformer(name="transformer")(
            src, image_pe, tokens)
        iou_token_out = hs[:, 0, :]
        mask_tokens_out = hs[:, 1:1 + num_mask_tokens, :]

        h = w = int(np.sqrt(src.shape[1]))
        src = src.reshape(b, h, w, c)
        x = nn.ConvTranspose(c // 4, (2, 2), strides=(2, 2),
                             name="upscale_conv1")(src)
        x = LayerNorm2d(name="upscale_ln")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.ConvTranspose(c // 8, (2, 2), strides=(2, 2),
                             name="upscale_conv2")(x)
        upscaled = nn.gelu(x, approximate=False)  # [b, 4h, 4w, c/8]

        hyper = jnp.stack([
            _MLP(c, c // 8, 3, name=f"hyper_mlp_{i}")(mask_tokens_out[:, i])
            for i in range(num_mask_tokens)], axis=1)  # [b, n_tok, c/8]
        bb, hh, ww, cc = upscaled.shape
        masks = (hyper @ upscaled.reshape(bb, hh * ww, cc).transpose(0, 2, 1))
        masks = masks.reshape(bb, num_mask_tokens, hh, ww)
        iou_pred = _MLP(c, num_mask_tokens, 3, name="iou_head")(iou_token_out)

        if multimask_output:
            return masks[:, 1:], iou_pred[:, 1:]
        return masks[:, :1], iou_pred[:, :1]


class Sam(nn.Module):
    """Bundled SAM modules; see hugs.sam.predictor for the user-facing API."""
    config: SamConfig

    def setup(self):
        self.image_encoder = ImageEncoderViT(self.config)
        self.prompt_encoder = PromptEncoder(self.config)
        self.mask_decoder = MaskDecoder(self.config)

    def encode_image(self, x):
        return self.image_encoder(x)

    def predict_masks(self, image_embeddings, point_coords, point_labels,
                      multimask_output: bool = True):
        sparse, dense = self.prompt_encoder(point_coords, point_labels)
        image_pe = self.prompt_encoder.get_dense_pe()[None]
        return self.mask_decoder(image_embeddings, image_pe, sparse, dense,
                                 multimask_output)

    def __call__(self, x, point_coords, point_labels):
        emb = self.encode_image(x)
        return self.predict_masks(emb, point_coords, point_labels)
