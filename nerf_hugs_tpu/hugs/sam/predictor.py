"""SamPredictor: encode an image once, predict masks for batched prompts.

API parity with segment-anything's SamPredictor as HuGS uses it
(generate_static_mask.py:202, 338-376): set_image() -> repeated
predict_batched() with point prompts, returning logits at the original
image resolution plus IoU predictions.

TPU shape discipline: prompts are padded to fixed batch/point counts so the
jitted decoder compiles once; the encoder runs once per image.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nerf_hugs_tpu.hugs.sam import modeling


class SamPredictor:
    mask_threshold: float = 0.0

    def __init__(self, sam: modeling.Sam, variables):
        self.sam = sam
        self.variables = variables
        self.config = sam.config
        self._embedding = None
        self.original_size: Optional[Tuple[int, int]] = None
        self.input_size: Optional[Tuple[int, int]] = None

        self._encode = jax.jit(
            lambda v, x: sam.apply(v, x, method=modeling.Sam.encode_image))
        self._decode = jax.jit(
            lambda v, emb, pts, labels: sam.apply(
                v, emb, pts, labels, True,
                method=modeling.Sam.predict_masks))

    # -- preprocessing ---------------------------------------------------------

    def _resize_longest(self, image: np.ndarray) -> np.ndarray:
        import cv2
        h, w = image.shape[:2]
        scale = self.config.image_size / max(h, w)
        new_h, new_w = int(round(h * scale)), int(round(w * scale))
        return cv2.resize(image, (new_w, new_h),
                          interpolation=cv2.INTER_LINEAR)

    def apply_coords(self, coords: np.ndarray,
                     original_size: Tuple[int, int]) -> np.ndarray:
        """Original-pixel coords -> resized-input coords."""
        h, w = original_size
        scale = self.config.image_size / max(h, w)
        return coords * scale

    def set_image(self, image: np.ndarray) -> None:
        """image: [H, W, 3] uint8 RGB."""
        self.original_size = image.shape[:2]
        resized = self._resize_longest(image.astype(np.float32))
        self.input_size = resized.shape[:2]
        mean = np.array(self.config.pixel_mean)
        std = np.array(self.config.pixel_std)
        x = (resized - mean) / std
        pad_h = self.config.image_size - x.shape[0]
        pad_w = self.config.image_size - x.shape[1]
        x = np.pad(x, ((0, pad_h), (0, pad_w), (0, 0)))
        self._embedding = self._encode(self.variables,
                                       jnp.asarray(x[None], jnp.float32))

    def reset_image(self) -> None:
        self._embedding = None

    # -- prediction ------------------------------------------------------------

    def predict_batched(self, point_coords: np.ndarray,
                        point_labels: np.ndarray,
                        return_logits: bool = True):
        """point_coords: [B, N, 2] in RESIZED input pixels (apply_coords'd);
        labels: [B, N]. Returns (masks [B, 3, H_orig, W_orig], iou [B, 3])."""
        if self._embedding is None:
            raise RuntimeError("call set_image first")
        emb = jnp.broadcast_to(
            self._embedding,
            (point_coords.shape[0],) + self._embedding.shape[1:])
        masks, iou = self._decode(self.variables, emb,
                                  jnp.asarray(point_coords, jnp.float32),
                                  jnp.asarray(point_labels, jnp.float32))
        masks = self._postprocess_masks(masks)
        if not return_logits:
            masks = masks > self.mask_threshold
        return np.asarray(masks), np.asarray(iou)

    def _postprocess_masks(self, masks):
        """Low-res logits -> original resolution: upsample to the padded
        input square, strip the pad, resize to the original size."""
        size = self.config.image_size
        masks = jax.image.resize(
            masks, masks.shape[:2] + (size, size), "bilinear")
        masks = masks[..., : self.input_size[0], : self.input_size[1]]
        return jax.image.resize(
            masks, masks.shape[:2] + self.original_size, "bilinear")


def build_sam(model_type: str = "vit_h", checkpoint_path: Optional[str] = None,
              rng_seed: int = 0, **config_overrides):
    """Construct SAM; load official weights when a checkpoint is given,
    otherwise random init (shape/pipeline testing only)."""
    config = modeling.make_sam_config(model_type, **config_overrides)
    sam = modeling.Sam(config)
    if checkpoint_path is not None:
        from nerf_hugs_tpu.hugs.sam import weights
        variables = weights.load_torch_checkpoint(checkpoint_path, config)
    else:
        x = jnp.zeros((1, config.image_size, config.image_size, 3))
        pts = jnp.zeros((1, 1, 2))
        labels = jnp.ones((1, 1))
        variables = jax.jit(sam.init)(jax.random.PRNGKey(rng_seed), x, pts,
                                      labels)
    return sam, variables
