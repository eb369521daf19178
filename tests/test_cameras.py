"""Tests for camera utils (golden-ray pattern a la datasets_test.py:71-105)
and COLMAP binary round-trip."""

import numpy as np
import pytest

from nerf_hugs_tpu.cameras import camera_utils, colmap
from nerf_hugs_tpu.utils import structs


def make_lookat_pose(position, target, up=(0, 1, 0)):
    z = camera_utils.normalize(np.array(position, float) - np.array(target, float))
    return camera_utils.viewmatrix(z, np.array(up, float), np.array(position, float))


def test_viewmatrix_orthonormal():
    m = make_lookat_pose([1, 2, 3], [0, 0, 0])
    R = m[:, :3]
    np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-12)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-12)


def test_recenter_poses_zero_mean():
    rng = np.random.RandomState(0)
    poses = np.stack([make_lookat_pose(rng.randn(3) * 2 + [0, 0, 5], [0, 0, 0])
                      for _ in range(10)])
    recentered, transform = camera_utils.recenter_poses(poses)
    # The average pose should now be near the identity.
    avg = camera_utils.average_pose(recentered)
    np.testing.assert_allclose(avg[:, 3], 0.0, atol=1e-8)
    np.testing.assert_allclose(avg[:, :3], np.eye(3), atol=1e-6)
    # Transform actually maps original to recentered.
    again = camera_utils.unpad_poses(
        transform @ camera_utils.pad_poses(poses))
    np.testing.assert_allclose(again, recentered, atol=1e-10)


def test_transform_poses_pca_bounds():
    rng = np.random.RandomState(1)
    poses = np.stack([make_lookat_pose(rng.randn(3) * [5, 2, 1] + [0, 0, 10],
                                       [0, 0, 0]) for _ in range(20)])
    out, transform = camera_utils.transform_poses_pca(poses)
    assert np.max(np.abs(out[:, :3, 3])) <= 1.0 + 1e-9
    # Rotation part stays orthonormal (up to a uniform scale).
    R = out[0, :3, :3]
    s = np.cbrt(np.abs(np.linalg.det(R)))
    np.testing.assert_allclose(R.T @ R, np.eye(3) * s * s, atol=1e-8)


def test_focus_point_for_converging_cameras():
    # Cameras looking at a common point from a ring; focus point = that point.
    target = np.array([0.3, -0.2, 0.5])
    poses = []
    for theta in np.linspace(0, 2 * np.pi, 12, endpoint=False):
        pos = target + 4 * np.array([np.cos(theta), np.sin(theta), 0.3])
        # viewmatrix z-axis points from target to camera: camera looks at -z.
        poses.append(make_lookat_pose(pos, target))
    poses = np.stack(poses)
    fp = camera_utils.focus_point_fn(poses)
    np.testing.assert_allclose(fp, target, atol=1e-6)


def test_pixels_to_rays_center_pixel_straight_ahead():
    h = w = 9
    focal = 10.0
    pixtocam = camera_utils.get_pixtocam(focal, w, h)
    cam2world = np.concatenate([np.eye(3), np.zeros((3, 1))], 1)
    x, y = np.array([w // 2]), np.array([h // 2])
    origins, directions, viewdirs, radii = camera_utils.pixels_to_rays(
        x, y, pixtocam, cam2world)
    np.testing.assert_allclose(origins, 0.0)
    # Center pixel (+0.5 offset lands exactly at the principal point) shoots
    # along -z in OpenGL convention.
    np.testing.assert_allclose(viewdirs[0], [0, 0, -1], atol=1e-12)
    # Radii ~ pixel pitch / focal * 2/sqrt(12).
    np.testing.assert_allclose(radii[0, 0], (1 / focal) * 2 / np.sqrt(12),
                               rtol=0.01)


def test_pixels_to_rays_rotation_applies():
    h = w = 4
    pixtocam = camera_utils.get_pixtocam(5.0, w, h)
    # Camera rotated 180 deg about y: looks along +z now.
    R = np.diag([-1.0, 1.0, -1.0])
    cam2world = np.concatenate([R, np.array([[1.0], [2.0], [3.0]])], 1)
    x, y = np.array([2]), np.array([2])
    origins, _, viewdirs, _ = camera_utils.pixels_to_rays(
        x, y, pixtocam, cam2world)
    np.testing.assert_allclose(origins[0], [1, 2, 3])
    assert viewdirs[0, 2] > 0.9


def test_undistort_roundtrip():
    rng = np.random.RandomState(0)
    x = rng.uniform(-0.3, 0.3, 100)
    y = rng.uniform(-0.3, 0.3, 100)
    k1, k2, p1, p2 = 0.1, -0.05, 0.01, -0.02
    # Distort forward.
    r = x * x + y * y
    d = 1 + k1 * r + k2 * r * r
    xd = x * d + 2 * p1 * x * y + p2 * (r + 2 * x * x)
    yd = y * d + 2 * p2 * x * y + p1 * (r + 2 * y * y)
    xu, yu = camera_utils.radial_and_tangential_undistort(
        xd, yd, k1=k1, k2=k2, p1=p1, p2=p2)
    np.testing.assert_allclose(xu, x, atol=1e-7)
    np.testing.assert_allclose(yu, y, atol=1e-7)


def test_convert_to_ndc_near_far_mapping():
    # Identity camera looking down -z; rays with dz<0.
    pixtocam = camera_utils.get_pixtocam(10.0, 16, 16)
    origins = np.array([[0.1, 0.2, 0.0]])
    directions = np.array([[0.01, -0.02, -1.0]])
    o_ndc, d_ndc = camera_utils.convert_to_ndc(origins, directions, pixtocam)
    # Near plane maps to z=-1; origin+direction (infinity) maps to z=+1.
    np.testing.assert_allclose(o_ndc[0, 2], -1.0)
    np.testing.assert_allclose((o_ndc + d_ndc)[0, 2], 1.0)


def test_cast_ray_batch_golden():
    h = w = 6
    pixtocams = camera_utils.get_pixtocam(8.0, w, h)[None]
    cam2worlds = np.concatenate([np.eye(3), np.zeros((3, 1))], 1)[None]
    n = 5
    rng = np.random.RandomState(0)
    px = rng.randint(0, w, (n,))
    py = rng.randint(0, h, (n,))
    ones = np.ones((n, 1), np.float32)
    pixels = structs.Pixels(
        pix_x_int=px, pix_y_int=py, lossmult=ones, static_mask=ones,
        near=ones * 0.1, far=ones * 10.0,
        embed_idx=np.zeros((n, 1), np.int32), cam_idx=np.zeros((n, 1), np.int32))
    rays = camera_utils.cast_ray_batch(
        (pixtocams, cam2worlds, None), pixels, np.array([h]), np.array([w]),
        None)
    assert rays.origins.shape == (n, 3)
    assert rays.directions.shape == (n, 3)
    assert rays.radii.shape == (n, 1)
    np.testing.assert_allclose(
        np.linalg.norm(rays.viewdirs, axis=-1), 1.0, atol=1e-7)
    np.testing.assert_allclose(
        rays.pix_coords, np.stack([(px + 0.5) / w, (py + 0.5) / h], -1),
        atol=1e-7)
    # Directions reproduce the manual pinhole model.
    want_dir = np.stack([(px + 0.5 - w / 2) / 8.0,
                         -(py + 0.5 - h / 2) / 8.0,
                         -np.ones(n)], -1)
    np.testing.assert_allclose(rays.directions, want_dir, atol=1e-6)


def test_spiral_and_ellipse_paths_shapes():
    rng = np.random.RandomState(0)
    poses = np.stack([make_lookat_pose(rng.randn(3) + [0, 0, 4], [0, 0, 0])
                      for _ in range(8)])
    spiral = camera_utils.generate_spiral_path(
        poses, np.array([1.0, 10.0]), n_frames=20)
    assert spiral.shape == (20, 3, 4)
    ellipse = camera_utils.generate_ellipse_path(poses, n_frames=20)
    assert ellipse.shape == (20, 3, 4)
    interp = camera_utils.generate_interpolated_path(poses, n_interp=5)
    assert interp.shape == (35, 3, 4)
    assert np.all(np.isfinite(spiral)) and np.all(np.isfinite(ellipse))


def test_cast_spherical_rays():
    cam2world = np.concatenate([np.eye(3), np.zeros((3, 1))], 1)
    rays = camera_utils.cast_spherical_rays(cam2world, 8, 16, 0.1, 10.0)
    assert rays.origins.shape == (8, 16, 3)
    assert np.all(np.isfinite(rays.radii))


def test_qvec_rotmat_roundtrip():
    rng = np.random.RandomState(0)
    for _ in range(10):
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        R = colmap.qvec2rotmat(q)
        np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-12)
        q2 = colmap.rotmat2qvec(R)
        np.testing.assert_allclose(q2, q, atol=1e-9)


def test_colmap_binary_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    cameras = {
        1: colmap.Camera(1, "PINHOLE", 640, 480,
                         np.array([500.0, 500.0, 320.0, 240.0])),
        2: colmap.Camera(2, "SIMPLE_RADIAL", 800, 600,
                         np.array([600.0, 400.0, 300.0, 0.01])),
    }
    images = {}
    for i in range(1, 4):
        n = rng.randint(3, 9)
        images[i] = colmap.Image(
            i, colmap.rotmat2qvec(np.eye(3)), rng.randn(3), 1 + (i % 2),
            f"img_{i:03d}.png", rng.uniform(0, 640, (n, 2)),
            rng.choice([-1, 5, 9, 12], n).astype(np.int64))
    points = {}
    for pid in [5, 9, 12]:
        n = rng.randint(2, 5)
        points[pid] = colmap.Point3D(
            pid, rng.randn(3), rng.randint(0, 255, 3), 0.5,
            rng.randint(1, 4, n), rng.randint(0, 3, n))

    colmap.write_cameras_binary(cameras, str(tmp_path / "cameras.bin"))
    colmap.write_images_binary(images, str(tmp_path / "images.bin"))
    colmap.write_points3D_binary(points, str(tmp_path / "points3D.bin"))

    cams2, imgs2, pts2 = colmap.read_model(str(tmp_path))
    assert set(cams2) == set(cameras)
    for cid, cam in cameras.items():
        assert cams2[cid].model == cam.model
        assert (cams2[cid].width, cams2[cid].height) == (cam.width, cam.height)
        np.testing.assert_allclose(cams2[cid].params, cam.params)
    for iid, im in images.items():
        np.testing.assert_allclose(imgs2[iid].qvec, im.qvec)
        np.testing.assert_allclose(imgs2[iid].tvec, im.tvec)
        assert imgs2[iid].name == im.name
        np.testing.assert_allclose(imgs2[iid].xys, im.xys)
        np.testing.assert_array_equal(imgs2[iid].point3D_ids, im.point3D_ids)
    for pid, pt in points.items():
        np.testing.assert_allclose(pts2[pid].xyz, pt.xyz)
        np.testing.assert_array_equal(pts2[pid].image_ids, pt.image_ids)
