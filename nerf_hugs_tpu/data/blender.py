"""Blender (NeRF-synthetic) dataset loader.

transforms_{split}.json + per-frame PNGs with alpha, composited onto white.
Embedding indices are offset so train/test images get disjoint embeddings
(reference: MipNeRF360/internal/datasets.py:552-630).
"""

from __future__ import annotations

import json
import os

import numpy as np

from nerf_hugs_tpu.cameras import camera_utils
from nerf_hugs_tpu.data import base
from nerf_hugs_tpu.metrics import image as nh_image
from nerf_hugs_tpu.utils import io as nh_io


class Blender(base.Dataset):

    def _load_renderings(self, config):
        if config.render_path:
            raise ValueError("render_path is not supported for blender data")

        embed_offsets, offset = {}, 0
        for split_name in ["train", "test"]:
            with open(os.path.join(self.data_dir,
                                   f"transforms_{split_name}.json")) as f:
                meta_s = json.load(f)
            embed_offsets[split_name] = offset
            offset += len(meta_s["frames"])

        with open(os.path.join(
                self.data_dir, f"transforms_{self.split.value}.json")) as f:
            meta = json.load(f)

        (self.images, self.static_masks, self.nears, self.fars,
         self.distortion_params, self.camtypes) = [], [], [], [], [], []
        heights, widths, focals, embeds, c2ws, p2cs = [], [], [], [], [], []

        mask_dir = os.path.join(self.data_dir, config.static_mask_dir_name)
        for img_idx, frame in enumerate(meta["frames"]):
            image = nh_io.load_img(
                os.path.join(self.data_dir, frame["file_path"] + ".png")) / 255.0
            if config.factor > 1:
                image = nh_image.downsample(image, config.factor)
            if image.shape[-1] == 4 and config.model_type == "mipnerf360":
                # mipnerf360 stack: white composite at load
                # (datasets.py:598-600). The nerfacto dialect keeps RGBA
                # and composites the target against the model's per-batch
                # background in the loss (nerfacto/datasets/blender.py:98
                # keeps channels; base.py:221-224 composites).
                rgb, alpha = image[..., :3], image[..., -1:]
                image = rgb * alpha + (1.0 - alpha)  # white background
            height, width = image.shape[:2]

            mask_path = os.path.join(mask_dir, f"{frame['file_path']}.png")
            if os.path.exists(mask_path):
                static_mask = base.load_static_mask(mask_path, height, width)
            else:
                static_mask = np.ones((height, width, 1), np.float32)

            focal = 0.5 * width / np.tan(0.5 * float(meta["camera_angle_x"]))
            self.images.append(image.astype(np.float32))
            self.static_masks.append(static_mask)
            self.nears.append(np.full((height, width, 1), self.near, np.float32))
            self.fars.append(np.full((height, width, 1), self.far, np.float32))
            self.distortion_params.append(None)
            self.camtypes.append(camera_utils.ProjectionType.PERSPECTIVE)
            heights.append(height)
            widths.append(width)
            focals.append(focal)
            embeds.append(embed_offsets[self.split.value] + img_idx)
            c2ws.append(np.array(frame["transform_matrix"], np.float32)[:3, :4])
            p2cs.append(camera_utils.get_pixtocam(focal, width, height))

        self.image_names = [
            os.path.basename(f["file_path"]) for f in meta["frames"]]
        self.heights = np.array(heights)
        self.widths = np.array(widths)
        self.focals = np.array(focals, np.float32)
        self.embed_idxs = np.array(embeds)
        self.camtoworlds = np.stack(c2ws, axis=0)
        self.pixtocams = np.stack(p2cs, axis=0)
