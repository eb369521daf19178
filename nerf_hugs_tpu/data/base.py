"""Dataset base: host-side numpy ray-batch producer with a prefetch thread.

Images stay host-side as per-image lists (heterogeneous H x W is fine there);
only fixed-shape ray batches ship to the TPU, which keeps every jitted
computation static-shaped (SURVEY.md §7 "dynamic-shape hostility").

Design parity: MipNeRF360/internal/datasets.py:225-549 — daemon producer
thread + queue.Queue(3), patch sampling with dilation, per-image camera
tables, full-image eval batches. The queue is seeded with one batch before
the thread starts to avoid the empty-queue race (datasets.py:385-391).
"""

from __future__ import annotations

import abc
import copy
import queue
import threading
from typing import List, Optional

import jax
import numpy as np

from nerf_hugs_tpu.cameras import camera_utils
from nerf_hugs_tpu.configs.config import Config
from nerf_hugs_tpu.utils import structs


class Dataset(threading.Thread, metaclass=abc.ABCMeta):
    """Infinite iterator of Batch pytrees (train: random rays; test: images).

    Subclasses implement _load_renderings(config) and must set:
      images:        list of [H, W, 3] float arrays in [0, 1] ([H, W, 4]
                     allowed for the nerfacto dialect: alpha rides into the
                     batch and the loss composites the target against the
                     model's per-batch background)
      static_masks:  list of [H, W, 1] float arrays in [0, 1]
      nears, fars:   lists of [H, W, 1] float arrays
      heights, widths, focals, embed_idxs: int/float [N] arrays
      camtoworlds:   [N, 3, 4]
      pixtocams:     [N, 3, 3]
      distortion_params: list of dicts or Nones
      camtypes:      list of ProjectionType
    """

    def __init__(self, split: str, is_training: bool,
                 sample_from_half_image: bool, batch_size: int,
                 patch_size: int, patch_dilation: int,
                 image_num_per_batch: int, data_dir: str, config: Config):
        super().__init__()
        self._queue = queue.Queue(3)
        self.daemon = True
        self._patch_size = max(patch_size, 1)
        self._batch_size = batch_size // jax.process_count()
        self._image_num_per_batch = max(1, image_num_per_batch // jax.process_count())
        self._patch_dilation = patch_dilation
        if self._image_num_per_batch * self._patch_size**2 > self._batch_size:
            raise ValueError(
                f"image_num_per_batch={self._image_num_per_batch} * "
                f"patch_size={self._patch_size}^2 exceeds per-process batch "
                f"size {self._batch_size}")
        self._test_camera_idx = 0
        self._render_spherical = False
        self._rng = np.random.default_rng(
            np.random.SeedSequence([config.seed, jax.process_index(),
                                    int(is_training)]))

        self.split = structs.DataSplit(split)
        self.is_training = is_training
        self.sample_from_half_image = sample_from_half_image
        self.data_dir = data_dir
        self.near = config.near
        self.far = config.far
        self.render_path = config.render_path
        self._enable_clip_near_far = config.enable_clip_near_far
        self._bound = config.bound
        self.distortion_params: Optional[List] = None
        self.poses = None
        self.pixtocam_ndc = None
        self.camtypes: Optional[List] = None
        self.pts3d = None

        self.images: List[np.ndarray] = None
        self.static_masks: List[np.ndarray] = None
        self.focals: np.ndarray = None
        self.heights: np.ndarray = None
        self.widths: np.ndarray = None
        self.nears: List[np.ndarray] = None
        self.fars: List[np.ndarray] = None
        self.embed_idxs: np.ndarray = None
        self.camtoworlds: np.ndarray = None
        self.pixtocams: np.ndarray = None
        self.image_names: Optional[List[str]] = None

        self._load_renderings(config)

        self._n_examples = self.camtoworlds.shape[0]
        if self.image_names is None:
            self.image_names = [f"{i:03d}" for i in range(self._n_examples)]
        self.cameras = (self.pixtocams, self.camtoworlds, self.pixtocam_ndc)

        # Native threaded pixel sampler (libraysampler) when the per-image
        # cameras are homogeneous enough for batch ray casting; numpy
        # fallback otherwise. render_path has no images to gather.
        self._native = None

        def _distortion_key(d):
            # Canonical form: key-sorted items (dict repr ordering is an
            # accident of insertion order).
            return None if d is None else tuple(sorted(d.items()))

        homogeneous_cams = (
            len({_distortion_key(d) for d in self.distortion_params}) == 1
            and len(set(self.camtypes)) == 1
            # The C++ sampler gathers fixed 3-float rgb rows; RGBA images
            # (nerfacto-dialect blender/kubric) take the numpy path.
            and all(im.shape[-1] == 3 for im in self.images or []))
        if is_training and not self.render_path and homogeneous_cams:
            try:
                from nerf_hugs_tpu.data import native_sampler
                self._native = native_sampler.NativeSampler(
                    self.images, self.static_masks, self.nears, self.fars,
                    self.embed_idxs)
                self._native_seed = int(
                    self._rng.integers(0, 2**62))
                self._native_calls = 0
            except (RuntimeError, OSError):
                self._native = None

        self._next_fn = self._next_train if is_training else self._next_test
        # Seed one batch so __next__ can't race thread startup.
        self._queue.put(self._next_fn())
        self.start()

    # -- iterator protocol ---------------------------------------------------

    def __iter__(self):
        return self

    def __next__(self) -> structs.Batch:
        return self._queue.get()

    def peek(self) -> structs.Batch:
        return copy.copy(self._queue.queue[0])

    def run(self):
        while True:
            self._queue.put(self._next_fn())

    @property
    def size(self) -> int:
        return self._n_examples

    def image_name(self, cam_idx: int) -> str:
        return self.image_names[cam_idx]

    # -- batch construction ---------------------------------------------------

    @abc.abstractmethod
    def _load_renderings(self, config: Config):
        ...

    def _apply_render_path(self, config: Config,
                           render_poses: Optional[np.ndarray] = None):
        """Swap this split's cameras for a generated render path.

        Called by loaders at the end of _load_renderings when
        config.render_path is set (the render.py flow). Pose priority:
          1. config.render_path_file — an .npy of [n, 3|4, 4] camera-to-world
             poses in this loader's world frame (post PCA/recenter);
          2. config.render_spline_keyframes — keyframe-interpolated spline
             (camera_utils.create_render_spline_path);
          3. `render_poses` from the caller (e.g. LLFF's spiral), else an
             inward-facing ellipse fit to this split's poses.
        Intrinsics/near/far/masks are replicated from camera 0 (render paths
        have no per-frame images). Extends the reference, whose generic
        render_path branch is NotImplementedError (datasets.py:330-333);
        pose generation follows its LLFF-only path (datasets.py:728-745).
        """
        from nerf_hugs_tpu.cameras import camera_utils as cu
        if not self.render_path:
            return
        if config.render_path_file:
            with open(config.render_path_file, "rb") as fp:
                poses = np.load(fp)
            if poses.shape[-2:] == (4, 4):
                poses = poses[:, :3, :]
        elif config.render_spline_keyframes:
            names = (self.image_names if self.image_names is not None
                     else [f"{i:03d}" for i in range(len(self.camtoworlds))])
            self.spline_indices, poses = cu.create_render_spline_path(
                config, names, self.camtoworlds)
        elif render_poses is not None:
            poses = render_poses
        else:
            poses = cu.generate_ellipse_path(
                self.camtoworlds, n_frames=config.render_path_frames,
                z_variation=config.z_variation, z_phase=config.z_phase)
        n = poses.shape[0]
        self.render_poses = poses
        self.camtoworlds = np.asarray(poses, np.float32)
        height = int(self.heights[0])
        width = int(self.widths[0])
        pixtocam = self.pixtocams[0]
        near0, far0 = self.nears[0], self.fars[0]
        if config.render_resolution is not None:
            # Override the output resolution, rescaling camera 0's
            # intrinsics (pixtocam maps pixels -> camera plane, so a finer
            # grid multiplies by old/new) — the reference sketches this at
            # datasets.py:339-340 inside its NotImplementedError block.
            new_w, new_h = config.render_resolution
            pixtocam = pixtocam @ np.diag(
                [width / new_w, height / new_h, 1.0]).astype(pixtocam.dtype)
            height, width = int(new_h), int(new_w)
            near0 = np.full((height, width, 1), float(near0.min()), np.float32)
            far0 = np.full((height, width, 1), float(far0.max()), np.float32)
        self.pixtocams = np.repeat(pixtocam[None], n, axis=0)
        self.focals = np.repeat(self.focals[:1], n, axis=0)
        self.heights = np.full(n, height, self.heights.dtype)
        self.widths = np.full(n, width, self.widths.dtype)
        self.distortion_params = [self.distortion_params[0]] * n
        self.camtypes = [self.camtypes[0]] * n
        self.nears = [near0] * n
        self.fars = [far0] * n
        self.static_masks = [np.ones((height, width, 1), np.float32)] * n
        self.embed_idxs = np.zeros(n, self.embed_idxs.dtype)
        self.images = None
        self.image_names = [f"{i:03d}" for i in range(n)]

    def _make_ray_batch(self, pix_x_int: np.ndarray, pix_y_int: np.ndarray,
                        cam_idx: int,
                        lossmult: Optional[np.ndarray] = None) -> structs.Batch:
        """Pixel coords + camera index -> cast Rays (+ gt rgb)."""
        bscalar = lambda x: np.broadcast_to(x, pix_x_int.shape)[..., None]
        pixels = structs.Pixels(
            pix_x_int=pix_x_int,
            pix_y_int=pix_y_int,
            lossmult=bscalar(1.0) if lossmult is None else lossmult,
            static_mask=self.static_masks[cam_idx][pix_y_int, pix_x_int],
            near=self.nears[cam_idx][pix_y_int, pix_x_int],
            far=self.fars[cam_idx][pix_y_int, pix_x_int],
            embed_idx=bscalar(self.embed_idxs[cam_idx]).astype(np.int32),
            cam_idx=bscalar(cam_idx).astype(np.int32))
        rays = camera_utils.cast_ray_batch(
            self.cameras, pixels, self.heights, self.widths,
            self.distortion_params[cam_idx], self.camtypes[cam_idx], xnp=np)
        rays = self._maybe_clip_near_far(rays)
        rgb = None if self.render_path else \
            self.images[cam_idx][pix_y_int, pix_x_int]
        return structs.Batch(rays=rays, rgb=rgb)

    def _maybe_clip_near_far(self, rays: structs.Rays) -> structs.Rays:
        """Clip near/far to the scene AABB (nerfacto enable_clip_near_far,
        nerfacto/datasets/base.py:111-136)."""
        if not self._enable_clip_near_far:
            return rays
        from nerf_hugs_tpu.core import rayops
        flat = lambda a, d: a.reshape(-1, d)
        near, far = rayops.clip_near_far_to_aabb(
            flat(rays.origins, 3), flat(rays.directions, 3),
            flat(rays.near, 1), flat(rays.far, 1), self._bound)
        return rays.replace(near=near.reshape(rays.near.shape),
                            far=far.reshape(rays.far.shape))

    def _next_train(self) -> structs.Batch:
        """Random dilated patches from image_num_per_batch random images,
        flattened to [batch_size, ...] (datasets.py:494-529)."""
        if self._native is not None:
            return self._next_train_native()
        p = self._patch_size
        n_patches = (self._batch_size // self._image_num_per_batch) // p**2
        span = (p - 1) * self._patch_dilation  # patch footprint minus one
        dx, dy = camera_utils.pixel_coordinates(p, p)

        parts = []
        for _ in range(self._image_num_per_batch):
            cam_idx = int(self._rng.integers(0, self._n_examples))
            height = self.heights[cam_idx]
            width = self.widths[cam_idx]
            if self.sample_from_half_image:
                width = width // 2
            x0 = self._rng.integers(0, width - span, (n_patches, 1, 1))
            y0 = self._rng.integers(0, height - span, (n_patches, 1, 1))
            pix_x = x0 + dx * self._patch_dilation
            pix_y = y0 + dy * self._patch_dilation
            parts.append(self._make_ray_batch(pix_x, pix_y, cam_idx))
        batch = jax.tree_util.tree_map(
            lambda *xs: np.concatenate(xs, axis=0), *parts)
        # Flatten [n_patches_total, p, p, c] -> [batch, c]; losses that need
        # patch structure (robustnerf) reshape back via config.patch_size.
        return jax.tree_util.tree_map(
            lambda x: x.reshape(-1, x.shape[-1]) if x.ndim > 1 else x, batch)

    def _next_train_native(self) -> structs.Batch:
        """Native-sampler fast path: threaded pixel gather in C++, then one
        vectorized ray cast over the whole batch with per-ray camera
        gathers."""
        p = self._patch_size
        n_patches = (self._batch_size // self._image_num_per_batch
                     ) // p**2 * self._image_num_per_batch
        self._native_calls += 1
        (pix_x, pix_y, cam_idx, embed_idx, rgb, mask, near, far
         ) = self._native.sample(
            self._native_seed + self._native_calls, n_patches, p,
            self._patch_dilation, self._image_num_per_batch,
            half_image=self.sample_from_half_image)
        pixels = structs.Pixels(
            pix_x_int=pix_x.astype(np.int64),
            pix_y_int=pix_y.astype(np.int64),
            lossmult=np.ones((len(pix_x), 1), np.float32),
            static_mask=mask[:, None],
            near=near[:, None],
            far=far[:, None],
            embed_idx=embed_idx[:, None],
            cam_idx=cam_idx[:, None])
        # Batch ray cast with per-ray camera indexing; heterogeneous
        # distortion/camtype falls back to the slow path at construction.
        rays = camera_utils.cast_ray_batch(
            self.cameras, pixels, self.heights, self.widths,
            self.distortion_params[0], self.camtypes[0], xnp=np)
        rays = self._maybe_clip_near_far(rays)
        return structs.Batch(rays=rays, rgb=rgb)

    def generate_ray_batch(self, cam_idx: int) -> structs.Batch:
        """All rays of one camera, as an [H, W, ...] batch (eval/render)."""
        if self._render_spherical:
            rays = camera_utils.cast_spherical_rays(
                self.camtoworlds[cam_idx], self.heights[cam_idx],
                self.widths[cam_idx], self.near, self.far, xnp=np)
            return structs.Batch(rays=rays)
        pix_x_int, pix_y_int = camera_utils.pixel_coordinates(
            self.widths[cam_idx], self.heights[cam_idx])
        return self._make_ray_batch(pix_x_int, pix_y_int, cam_idx)

    def _next_test(self) -> structs.Batch:
        cam_idx = self._test_camera_idx
        self._test_camera_idx = (self._test_camera_idx + 1) % self._n_examples
        return self.generate_ray_batch(cam_idx)


def load_static_mask(path: str, height: int, width: int) -> np.ndarray:
    """Load a HuGS static mask PNG as [H, W, 1] in [0, 1]; resize if needed."""
    import cv2
    from nerf_hugs_tpu.utils import io as nh_io
    mask = nh_io.load_img(path) / 255.0
    if mask.shape[0] != height or mask.shape[1] != width:
        mask = cv2.resize(mask, (width, height))
    if mask.ndim == 2:
        mask = mask[..., None]
    return mask[..., :1].reshape(height, width, 1).astype(np.float32)
