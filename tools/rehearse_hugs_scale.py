#!/usr/bin/env python
"""HuGS production-scale rehearsal on real hardware (VERDICT r3 #3).

Runs the full generate_static_mask.py pipeline at the REFERENCE's real
shapes — 1024-pixel images into the ViT-H encoder, a 64x64 point grid
through the automatic mask generator with crop_n_layers=1, 128-prompt
point batches for the SfM heuristics (HuGS/generate_static_mask.py:17-59
defaults) — with a randomly-initialized full ViT-H SAM, so compile times,
decoder padding behavior, per-image wall clock, and HBM headroom at scale
are known BEFORE the real sam_vit_h checkpoint lands (masks are
meaningless; the measurement is the product).

  python tools/rehearse_hugs_scale.py [--num_images 3] [--height 768]
      [--width 1024] [--work_dir /tmp/hugs_rehearsal] [--model vit_h]

Emits one JSON line: first-image (compile-heavy) and steady-state
per-image seconds, stage breakdown, and peak device memory.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np


def build_fixture(work_dir, n_images, height, width, n_points=600,
                  n_features=400):
    """Production-shaped synthetic drop: sphere-world renders with pasted
    distractor squares (pred/gt pairs) + a COLMAP model with long-track 3-D
    points, mimicking the kubric HuGS inputs (scripts/hugs_kubric.sh)."""
    from nerf_hugs_tpu.cameras import camera_utils, colmap
    import generate_static_mask as gsm
    from nerf_hugs_tpu.data.synthetic import _sphere_world_color

    rng = np.random.RandomState(0)
    img_dir = os.path.join(work_dir, "preds")
    sparse_dir = os.path.join(work_dir, "sparse")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(sparse_dir, exist_ok=True)

    focal = 0.9 * width
    cameras = {1: colmap.Camera(
        1, "PINHOLE", width, height,
        np.array([focal, focal, width / 2, height / 2]))}
    pts = rng.randn(n_points, 3) * 0.4
    points = {}
    for pid in range(n_points):
        # Long tracks (>= threshold) for most points — the T_SfM filter
        # must keep a realistic population.
        track = rng.randint(1, n_images + 1,
                            rng.randint(2, 2 * n_images + 4))
        points[pid + 1] = colmap.Point3D(
            pid + 1, pts[pid], rng.randint(0, 255, 3), 0.5, track,
            np.zeros(len(track), int))

    images = {}
    for i in range(n_images):
        theta = 2 * np.pi * i / n_images
        position = np.array([2.5 * np.cos(theta), 2.5 * np.sin(theta), 1.2])
        z_axis = camera_utils.normalize(position)
        c2w = camera_utils.viewmatrix(z_axis, np.array([0.0, 0, 1]),
                                      position)
        pixtocam = camera_utils.get_pixtocam(focal, width, height)
        xg, yg = camera_utils.pixel_coordinates(width, height)
        origins, dirs, _, _ = camera_utils.pixels_to_rays(
            xg, yg, pixtocam, c2w)
        gt = _sphere_world_color(origins, dirs, radius=0.5)
        # Transient distractor square in the GT (what HuGS must mask) and a
        # residual blob in the pred (a partially-trained NeRF's error).
        sz = height // 5
        y0, x0 = rng.randint(0, height - sz), rng.randint(0, width - sz)
        gt = gt.copy()
        gt[y0:y0 + sz, x0:x0 + sz] = rng.rand(3)
        pred = np.clip(gt + rng.randn(height, width, 3) * 0.03, 0, 1)
        pred[y0:y0 + sz, x0:x0 + sz] = _sphere_world_color(
            origins, dirs, radius=0.5)[y0:y0 + sz, x0:x0 + sz]

        name = f"img_{i:03d}.png"
        gsm.save_image_rgb(gt, os.path.join(img_dir, f"img_{i:03d}_gt.png"))
        gsm.save_image_rgb(pred,
                           os.path.join(img_dir, f"img_{i:03d}_color.png"))

        w2c = np.linalg.inv(camera_utils.pad_poses(
            np.concatenate([c2w[:, :1], -c2w[:, 1:3], c2w[:, 3:]], axis=1)))
        qvec = colmap.rotmat2qvec(w2c[:3, :3])
        images[i + 1] = colmap.Image(
            i + 1, qvec, w2c[:3, 3], 1, name,
            rng.uniform(0, [width, height], (n_features, 2)),
            rng.choice(list(points) + [-1], n_features).astype(np.int64))

    colmap.write_cameras_binary(cameras,
                                os.path.join(sparse_dir, "cameras.bin"))
    colmap.write_images_binary(images,
                               os.path.join(sparse_dir, "images.bin"))
    colmap.write_points3D_binary(points,
                                 os.path.join(sparse_dir, "points3D.bin"))
    return img_dir, sparse_dir


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--num_images", type=int, default=3)
    parser.add_argument("--height", type=int, default=768)
    parser.add_argument("--width", type=int, default=1024)
    parser.add_argument("--work_dir", default="/tmp/hugs_rehearsal")
    parser.add_argument("--model", default="vit_h")
    parser.add_argument("--points_per_side", type=int, default=64)
    parser.add_argument("--crop_n_layers", type=int, default=1)
    parser.add_argument("--points_per_batch", type=int, default=64,
                        help="AMG decoder batch size (prompts per jit call)")
    parser.add_argument("--max_masks", type=int, default=0,
                        help="device->host mask budget per decoder batch; "
                        "0 = all 3*points_per_batch candidates (parity)")
    parser.add_argument("--tiny", action="store_true",
                        help="plumbing smoke on CPU: vit_t at 64px")
    args = parser.parse_args(argv)
    sam_overrides = None
    if args.tiny:
        args.model, args.height, args.width = "vit_t", 64, 64
        args.points_per_side, args.crop_n_layers = 4, 0
        sam_overrides = {"image_size": 64, "window_size": 2}

    import jax
    import generate_static_mask as gsm

    os.makedirs(args.work_dir, exist_ok=True)
    img_dir, sparse_dir = build_fixture(
        args.work_dir, args.num_images, args.height, args.width)
    print(f"fixture: {args.num_images} images {args.height}x{args.width}",
          flush=True)

    # Production knobs = the reference kubric HuGS run: 64^2 grid, crop
    # layer 1, 128-prompt batches, default thresholds; T_SfM scaled to the
    # fixture's track lengths so a realistic number of points survive.
    config = gsm.SegmentConfig(
        sam_points_per_side=args.points_per_side,
        sam_crop_n_layers=args.crop_n_layers,
        sam_points_per_batch=args.points_per_batch,
        sam_max_masks_per_batch=args.max_masks or None,
        sfm_point_count_threshold=max(2, args.num_images),
        sfm_seg_batch_size=128)

    t0 = time.time()
    per_image = gsm.main(img_dir, sparse_dir, args.model, None,
                         os.path.join(args.work_dir, "out"), config,
                         sam_overrides=sam_overrides) or []
    total = time.time() - t0

    mem = {}
    try:
        stats = jax.devices()[0].memory_stats() or {}
        mem = {k: stats[k] for k in ("peak_bytes_in_use", "bytes_limit")
               if k in stats}
    except Exception:
        pass

    print(json.dumps({
        "metric": "hugs_rehearsal",
        "model": args.model,
        "image_hw": [args.height, args.width],
        "points_per_side": args.points_per_side,
        "crop_n_layers": args.crop_n_layers,
        "points_per_batch": args.points_per_batch,
        "max_masks_per_batch": args.max_masks or None,
        "num_images": args.num_images,
        "total_sec": round(total, 1),
        "first_image_sec": round(per_image[0], 1) if per_image else None,
        "steady_image_sec": (round(float(np.mean(per_image[1:])), 1)
                             if len(per_image) > 1 else None),
        "memory": mem,
    }), flush=True)


if __name__ == "__main__":
    main()
