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

_PACK_WEIGHTS = (128, 64, 32, 16, 8, 4, 2, 1)  # np.unpackbits MSB-first


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
        self._decode_compact = jax.jit(
            functools.partial(_decode_compact, sam, self.mask_threshold),
            static_argnames=("orig_hw", "in_hw", "image_size",
                             "select_best", "want_masks", "max_keep"))

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

    # -- device-side filtered prediction ----------------------------------------
    #
    # predict_batched transfers [B, 3, H, W] f32 full-res logits to host per
    # batch (~600 MB at 768x1024, B=64) and filters in numpy — measured at
    # ~100 min/image through the remote-TPU tunnel (round-4 HuGS rehearsal).
    # These paths keep decode -> upsample -> IoU/stability filter ->
    # threshold -> box/bit-pack (or count) ON DEVICE in ONE jitted call and
    # transfer only bit-packed kept masks (~6 MB) or a count map (~3 MB).
    # Filtering math is identical to the predict_batched + numpy path
    # (tests/test_hugs.py::test_predict_compact_matches_batched).

    def _compact_args(self, point_coords, point_labels):
        emb = jnp.broadcast_to(
            self._embedding,
            (point_coords.shape[0],) + self._embedding.shape[1:])
        return (self.variables, emb,
                jnp.asarray(point_coords, jnp.float32),
                jnp.asarray(point_labels, jnp.float32))

    def predict_compact(self, point_coords, point_labels, pred_iou_thresh,
                        stability_score_thresh, stability_score_offset,
                        n_valid: int, max_keep: int):
        """Batched point prompts -> up to `max_keep` filtered masks, decoded,
        upsampled, thresholded, and bit-packed on device.

        Returns (packed [K, ceil(H*W/8)] uint8, ious [K], stabs [K],
        keep [K] bool, boxes [K, 4] int32 xyxy, n_pass int) where K =
        min(max_keep, B*3); rows with keep=False are padding/filtered.
        Masks unpack with np.unpackbits(packed[i], count=H*W). n_pass is
        the pre-compaction pass count — if it exceeds K, the lowest-IoU
        passing masks were dropped (caller should warn)."""
        if self._embedding is None:
            raise RuntimeError("call set_image first")
        out = self._decode_compact(
            *self._compact_args(point_coords, point_labels),
            jnp.float32(pred_iou_thresh),
            jnp.float32(stability_score_thresh),
            jnp.float32(stability_score_offset), jnp.int32(n_valid),
            orig_hw=tuple(self.original_size), in_hw=tuple(self.input_size),
            image_size=self.config.image_size, select_best=False,
            want_masks=True, max_keep=int(max_keep))
        packed, ious, stabs, keep, boxes, n_pass = map(np.asarray, out)
        return packed, ious, stabs, keep, boxes, int(n_pass)

    def predict_count(self, point_coords, point_labels, pred_iou_thresh,
                      stability_score_thresh, stability_score_offset,
                      n_valid: int, select_best: bool) -> np.ndarray:
        """Batched point prompts -> [H, W] float32 count of filtered masks
        covering each pixel (the SfM-heuristic accumulation), computed fully
        on device. select_best keeps only the highest-IoU mask per prompt
        (sfm_use_highest_iou)."""
        if self._embedding is None:
            raise RuntimeError("call set_image first")
        counts = self._decode_compact(
            *self._compact_args(point_coords, point_labels),
            jnp.float32(pred_iou_thresh),
            jnp.float32(stability_score_thresh),
            jnp.float32(stability_score_offset), jnp.int32(n_valid),
            orig_hw=tuple(self.original_size), in_hw=tuple(self.input_size),
            image_size=self.config.image_size, select_best=bool(select_best),
            want_masks=False, max_keep=0)
        return np.asarray(counts)


def _decode_compact(sam, mask_threshold, variables, emb, pts, labels,
                    iou_thresh, stab_thresh, stab_offset, n_valid, *,
                    orig_hw, in_hw, image_size, select_best, want_masks,
                    max_keep):
    """Device body shared by predict_compact/predict_count (jitted once per
    (batch shape, image shape, mode) key)."""
    masks, iou = sam.apply(variables, emb, pts, labels, True,
                           method=modeling.Sam.predict_masks)
    b, m = iou.shape
    if select_best:
        # Selection is per-prompt and pixel-independent: doing it at low
        # res before the upsample is exact and 3x cheaper.
        best = jnp.argmax(iou, -1)
        masks = jnp.take_along_axis(masks, best[:, None, None, None], 1)
        iou = jnp.take_along_axis(iou, best[:, None], 1)
        m = 1
    # Upsample exactly as _postprocess_masks (pad square -> strip -> orig).
    masks = jax.image.resize(masks, (b, m, image_size, image_size),
                             "bilinear")
    masks = masks[..., : in_hw[0], : in_hw[1]]
    masks = jax.image.resize(masks, (b, m) + tuple(orig_hw), "bilinear")
    flat = masks.reshape(b * m, orig_hw[0], orig_hw[1])
    iou = iou.reshape(b * m)

    high = (flat > mask_threshold + stab_offset).sum((-1, -2))
    low = (flat > mask_threshold - stab_offset).sum((-1, -2))
    stab = high.astype(jnp.float32) / jnp.maximum(
        low.astype(jnp.float32), 1e-9)
    seg = flat > mask_threshold
    nonempty = seg.any((-1, -2))
    keep = (jnp.arange(b * m) // m) < n_valid          # mask out pad prompts
    keep &= jnp.where(iou_thresh > 0, iou > iou_thresh, True)
    keep &= jnp.where(stab_thresh > 0, stab >= stab_thresh, True)
    keep &= nonempty
    n_pass = keep.sum()

    if not want_masks:
        counts = (seg & keep[:, None, None]).sum(0)
        return counts.astype(jnp.float32)

    # Boxes (xyxy, [x0, y0, x1+1, y1+1]; zeros for empty — mask_to_box).
    ys = seg.any(-1)
    xs = seg.any(-2)
    y0 = jnp.argmax(ys, -1)
    y1 = orig_hw[0] - jnp.argmax(ys[:, ::-1], -1)
    x0 = jnp.argmax(xs, -1)
    x1 = orig_hw[1] - jnp.argmax(xs[:, ::-1], -1)
    boxes = (jnp.stack([x0, y0, x1, y1], -1)
             * nonempty[:, None]).astype(jnp.int32)

    # Bit-pack MSB-first so np.unpackbits round-trips.
    hw = orig_hw[0] * orig_hw[1]
    pad = (-hw) % 8
    segf = seg.reshape(b * m, hw)
    if pad:
        segf = jnp.pad(segf, ((0, 0), (0, pad)))
    w8 = jnp.asarray(_PACK_WEIGHTS, jnp.int32)
    packed = (segf.reshape(b * m, -1, 8).astype(jnp.int32) * w8).sum(-1)
    packed = packed.astype(jnp.uint8)

    k = min(int(max_keep), b * m)
    if k < b * m:
        # Keep-rows first (score +2), then highest IoU; re-sort the chosen
        # indices so the surviving masks stay in original prompt order.
        score = keep.astype(jnp.float32) * 2.0 + jax.nn.sigmoid(iou)
        idx = jnp.sort(jax.lax.top_k(score, k)[1])
        packed, iou, stab = packed[idx], iou[idx], stab[idx]
        keep, boxes = keep[idx], boxes[idx]
    return packed, iou, stab, keep, boxes, n_pass


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
