"""In-memory procedural dataset for tests and benchmarks.

Random-but-deterministic images and lookat poses around a unit scene — the
reference's DummyDataset pattern for data-layer testing without real data
(MipNeRF360/tests/datasets_test.py:26-49). Also usable as a training
smoke-target: images are renders of a colored-sphere world, so a NeRF can
actually fit them (used by the end-to-end training tests and bench.py).
"""

from __future__ import annotations

import numpy as np

from nerf_hugs_tpu.cameras import camera_utils
from nerf_hugs_tpu.data import base
from nerf_hugs_tpu.utils import structs


def _sphere_world_color(origins: np.ndarray, dirs: np.ndarray,
                        radius: float = 0.5) -> np.ndarray:
    """Analytic render of a diffuse sphere at the origin over white bg."""
    d = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    b = np.sum(origins * d, axis=-1)
    c = np.sum(origins * origins, axis=-1) - radius * radius
    disc = b * b - c
    hit = disc > 0
    t = -b - np.sqrt(np.maximum(disc, 0))
    point = origins + t[..., None] * d
    normal = point / np.maximum(1e-6, np.linalg.norm(point, axis=-1, keepdims=True))
    albedo = 0.5 + 0.5 * normal  # normal-colored sphere
    shade = np.clip(normal @ np.array([0.5, 0.7, 0.5]), 0.1, 1.0)[..., None]
    color = np.where(hit[..., None], albedo * shade, 1.0)
    return color.astype(np.float32)


class Synthetic(base.Dataset):
    """Procedural lookat cameras around a sphere world; no disk access.

    config.dataset_loader='synthetic' gives clean images. Setting the class
    attribute DISTRACTORS=True (see SyntheticDistractor) pastes a random
    opaque square into every TRAIN image — an inconsistent transient object —
    and provides the matching static_masks, emulating the HuGS setting
    (kubric-style distractors) without disk data.
    """

    NUM_IMAGES = 8
    HEIGHT = 24
    WIDTH = 32
    DISTRACTORS = False

    def _load_renderings(self, config):
        n = config.synthetic_num_images or self.NUM_IMAGES
        h = config.synthetic_height or self.HEIGHT
        w = config.synthetic_width or self.WIDTH
        if config.factor > 1:
            h, w = h // config.factor, w // config.factor
        rng = np.random.RandomState(42)
        scale = config.synthetic_world_scale

        # Test views sit between the train azimuths (half-step offset, no
        # height jitter): genuinely held-out cameras rather than re-scored
        # train poses.
        held_out = self.split == structs.DataSplit.TEST
        theta_offset = np.pi / n if held_out else 0.0

        (self.images, self.static_masks, self.nears, self.fars,
         self.distortion_params, self.camtypes) = [], [], [], [], [], []
        heights, widths, focals, embeds, c2ws, p2cs = [], [], [], [], [], []
        for i in range(n):
            theta = 2 * np.pi * i / n + theta_offset
            z_jitter = 0.0 if held_out else 0.1 * rng.randn()
            position = scale * np.array([2.5 * np.cos(theta),
                                         2.5 * np.sin(theta),
                                         1.2 + z_jitter])
            z_axis = camera_utils.normalize(position)  # camera looks at origin
            c2w = camera_utils.viewmatrix(z_axis, np.array([0.0, 0, 1]), position)
            focal = 0.9 * w
            pixtocam = camera_utils.get_pixtocam(focal, w, h)

            xg, yg = camera_utils.pixel_coordinates(w, h)
            origins, dirs, _, _ = camera_utils.pixels_to_rays(
                xg, yg, pixtocam, c2w)
            image = _sphere_world_color(origins, dirs, radius=0.5 * scale)

            static_mask = np.ones((h, w, 1), np.float32)
            if self.DISTRACTORS and self.split == structs.DataSplit.TRAIN:
                # Paste a random opaque square (a view-inconsistent
                # transient) and mark it in the mask.
                sz = max(3, h // 4)
                y0 = rng.randint(0, h - sz)
                x0 = rng.randint(0, w - sz)
                image = image.copy()
                image[y0:y0 + sz, x0:x0 + sz] = rng.rand(3)
                static_mask[y0:y0 + sz, x0:x0 + sz] = 0.0

            self.images.append(image)
            self.static_masks.append(static_mask)
            self.nears.append(np.full((h, w, 1), self.near, np.float32))
            self.fars.append(np.full((h, w, 1), self.far, np.float32))
            self.distortion_params.append(None)
            self.camtypes.append(camera_utils.ProjectionType.PERSPECTIVE)
            heights.append(h)
            widths.append(w)
            focals.append(focal)
            embeds.append(i)
            c2ws.append(c2w)
            p2cs.append(pixtocam)

        self.heights = np.array(heights)
        self.widths = np.array(widths)
        self.focals = np.array(focals, np.float32)
        self.embed_idxs = np.array(embeds)
        self.camtoworlds = np.stack(c2ws, axis=0)
        self.pixtocams = np.stack(p2cs, axis=0)

        # render.py path mode: ellipse/spline/file poses replace the split
        # cameras (base._apply_render_path; extends datasets.py:330-333).
        self._apply_render_path(config)


class SyntheticDistractor(Synthetic):
    """Synthetic scene with per-train-image transient squares + HuGS masks."""
    DISTRACTORS = True


class SyntheticAppearance(Synthetic):
    """Multi-appearance sphere world for the Phototourism protocol.

    Every image gets its own global multiplicative color tint (the
    per-photo appearance variation Phototourism models with GLO/appearance
    embeddings), and every image — train AND test — gets a DISTINCT
    embedding row: train images use rows [0, n), test images rows
    [n, n + m). Test appearances are therefore unseen at train time and
    only learnable through the finetune stage's left-half-image embedding
    fit (reference train_utils.py:539-544, datasets.py:512), which is
    exactly what the protocol e2e test exercises.
    """

    def _load_renderings(self, config):
        super()._load_renderings(config)
        if self.images is None:
            # render.py path mode: _apply_render_path (called by super())
            # replaced the split cameras with path poses and nulled the
            # images/embed_idxs — there is nothing to tint or offset.
            return
        n = len(self.images)
        test_split = self.split == structs.DataSplit.TEST
        # Rows [n_train, n_train+n_test) for the test split. Both splits
        # are generated with the same synthetic_num_images, so the offset
        # is just n.
        offset = n if test_split else 0
        self.embed_idxs = self.embed_idxs + offset
        tint_rng = np.random.RandomState(7)
        tints = 0.25 + 0.75 * tint_rng.rand(2 * n, 3).astype(np.float32)
        self.images = [img * tints[offset + i]
                       for i, img in enumerate(self.images)]
