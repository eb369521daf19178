"""Camera pose processing and pixel->ray casting.

Host-side (numpy) pose alignment / render-path generation plus an xnp-generic
(numpy or jnp) ray caster that produces the cone radii Mip-NeRF needs.
Parity target: MipNeRF360/internal/camera_utils.py (NDC :32-98, pose PCA
:112-227, paths :159-378, intrinsics :381-407, undistortion :410-494,
pixels_to_rays :503-607, cast_ray_batch :610-672, spherical :700-745).

PROVENANCE: the pose-alignment and render-path functions in this module
(`transform_poses_pca`, `generate_spiral_path`, `generate_ellipse_path`,
`generate_interpolated_path`) are intentional ports of the corresponding
Apache-2.0 multinerf routines (google-research/multinerf
internal/camera_utils.py), which the reference vendors unchanged. Their
outputs define the coordinate frames and camera paths of every released
checkpoint and rendering, so they are kept numerically output-compatible
with the originals (tests/test_cameras.py + test_render_paths.py check
against the reference as oracle) rather than paraphrased. The ray-casting
half of the module (pixels_to_rays and below) is a TPU-first redesign
(vectorized xnp, no per-camera Python loops).
"""

from __future__ import annotations

import enum
import types
from typing import List, Mapping, Optional, Tuple, Union

import jax.numpy as jnp
import numpy as np
import scipy.interpolate

from nerf_hugs_tpu.core import math as nh_math
from nerf_hugs_tpu.core import stepfun
from nerf_hugs_tpu.utils import structs

_Array = Union[np.ndarray, jnp.ndarray]


class ProjectionType(enum.Enum):
    PERSPECTIVE = "perspective"
    FISHEYE = "fisheye"


# ---------------------------------------------------------------------------
# Pose algebra (host-side numpy).
# ---------------------------------------------------------------------------

def normalize(x: np.ndarray) -> np.ndarray:
    return x / np.linalg.norm(x)


def pad_poses(p: np.ndarray) -> np.ndarray:
    """Append the homogeneous [0,0,0,1] row to [..., 3, 4] poses."""
    bottom = np.broadcast_to([0, 0, 0, 1.0], p[..., :1, :4].shape)
    return np.concatenate([p[..., :3, :4], bottom], axis=-2)


def unpad_poses(p: np.ndarray) -> np.ndarray:
    return p[..., :3, :4]


def viewmatrix(lookdir: np.ndarray, up: np.ndarray,
               position: np.ndarray) -> np.ndarray:
    """Right-handed lookat camera-to-world [3, 4]."""
    vec2 = normalize(lookdir)
    vec0 = normalize(np.cross(up, vec2))
    vec1 = normalize(np.cross(vec2, vec0))
    return np.stack([vec0, vec1, vec2, position], axis=1)


def average_pose(poses: np.ndarray) -> np.ndarray:
    """Mean position/viewing-direction/up pose of a capture."""
    return viewmatrix(poses[:, :3, 2].mean(0), poses[:, :3, 1].mean(0),
                      poses[:, :3, 3].mean(0))


def recenter_poses(poses: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Recenter the capture around its average pose; returns (poses, T)."""
    transform = np.linalg.inv(pad_poses(average_pose(poses)))
    return unpad_poses(transform @ pad_poses(poses)), transform


def focus_point_fn(poses: np.ndarray) -> np.ndarray:
    """Least-squares point closest to all camera optical axes."""
    directions, origins = poses[:, :3, 2:3], poses[:, :3, 3:4]
    m = np.eye(3) - directions * np.transpose(directions, [0, 2, 1])
    mt_m = np.transpose(m, [0, 2, 1]) @ m
    return np.linalg.inv(mt_m.mean(0)) @ (mt_m @ origins).mean(0)[:, 0]


def transform_poses_pca(poses: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Rotate/scale the capture so position PCA axes align with XYZ and all
    camera centers fit in [-1, 1]^3 (camera_utils.py:191-227)."""
    t = poses[:, :3, 3]
    t_mean = t.mean(axis=0)
    centered = t - t_mean

    eigval, eigvec = np.linalg.eig(centered.T @ centered)
    order = np.argsort(eigval)[::-1]
    rot = eigvec[:, order].T
    if np.linalg.det(rot) < 0:
        rot = np.diag(np.array([1, 1, -1])) @ rot

    transform = np.concatenate([rot, rot @ -t_mean[:, None]], -1)
    poses_out = unpad_poses(transform @ pad_poses(poses))
    transform = np.concatenate([transform, np.eye(4)[3:]], axis=0)

    # Keep +y of the average camera pointing up (+z world).
    if poses_out.mean(axis=0)[2, 1] < 0:
        poses_out = np.diag(np.array([1, -1, -1])) @ poses_out
        transform = np.diag(np.array([1, -1, -1, 1])) @ transform

    scale = 1.0 / np.max(np.abs(poses_out[:, :3, 3]))
    poses_out[:, :3, 3] *= scale
    transform = np.diag(np.array([scale] * 3 + [1])) @ transform
    return poses_out, transform


# ---------------------------------------------------------------------------
# Render paths (host-side numpy).
# ---------------------------------------------------------------------------

NEAR_STRETCH = 0.9
FAR_STRETCH = 5.0
FOCUS_DISTANCE = 0.75


def generate_spiral_path(poses: np.ndarray, bounds: np.ndarray,
                         n_frames: int = 120, n_rots: int = 2,
                         zrate: float = 0.5) -> np.ndarray:
    """Forward-facing spiral render path (camera_utils.py:159-186)."""
    near_bound = bounds.min() * NEAR_STRETCH
    far_bound = bounds.max() * FAR_STRETCH
    focal = 1 / ((1 - FOCUS_DISTANCE) / near_bound + FOCUS_DISTANCE / far_bound)
    positions = poses[:, :3, 3]
    radii = np.concatenate([np.percentile(np.abs(positions), 90, 0), [1.0]])
    cam2world = average_pose(poses)
    up = poses[:, :3, 1].mean(0)
    out = []
    for theta in np.linspace(0.0, 2 * np.pi * n_rots, n_frames, endpoint=False):
        t = radii * [np.cos(theta), -np.sin(theta), -np.sin(theta * zrate), 1.0]
        position = cam2world @ t
        lookat = cam2world @ [0, 0, -focal, 1.0]
        out.append(viewmatrix(position - lookat, up, position))
    return np.stack(out, axis=0)


def generate_ellipse_path(poses: np.ndarray, n_frames: int = 120,
                          const_speed: bool = True, z_variation: float = 0.0,
                          z_phase: float = 0.0) -> np.ndarray:
    """Elliptical orbit around the capture focus point (camera_utils.py:230-278)."""
    center = focus_point_fn(poses)
    offset = np.array([center[0], center[1], 0])
    sc = np.percentile(np.abs(poses[:, :3, 3] - offset), 90, axis=0)
    low, high = -sc + offset, sc + offset
    z_low = np.percentile(poses[:, :3, 3], 10, axis=0)
    z_high = np.percentile(poses[:, :3, 3], 90, axis=0)

    def get_positions(theta):
        return np.stack([
            low[0] + (high - low)[0] * (np.cos(theta) * 0.5 + 0.5),
            low[1] + (high - low)[1] * (np.sin(theta) * 0.5 + 0.5),
            z_variation * (z_low[2] + (z_high - z_low)[2] *
                           (np.cos(theta + 2 * np.pi * z_phase) * 0.5 + 0.5)),
        ], -1)

    theta = np.linspace(0, 2 * np.pi, n_frames + 1, endpoint=True)
    positions = get_positions(theta)
    if const_speed:
        lengths = np.linalg.norm(positions[1:] - positions[:-1], axis=-1)
        theta = np.asarray(stepfun.sample(None, theta, np.log(lengths),
                                          n_frames + 1))
        positions = get_positions(theta)
    positions = positions[:-1]

    avg_up = normalize(poses[:, :3, 1].mean(0))
    ind_up = np.argmax(np.abs(avg_up))
    up = np.eye(3)[ind_up] * np.sign(avg_up[ind_up])
    return np.stack([viewmatrix(p - center, up, p) for p in positions])


def generate_interpolated_path(poses: np.ndarray, n_interp: int,
                               spline_degree: int = 5, smoothness: float = 0.03,
                               rot_weight: float = 0.1) -> np.ndarray:
    """Smooth B-spline through keyframe poses (camera_utils.py:280-326).

    Poses are splined in (position, lookat-point, up-point) space so rotation
    interpolates sanely.
    """
    def poses_to_points(p, dist):
        pos = p[:, :3, -1]
        lookat = pos - dist * p[:, :3, 2]
        up = pos + dist * p[:, :3, 1]
        return np.stack([pos, lookat, up], 1)

    def points_to_poses(points):
        return np.array([viewmatrix(p - l, u - p, p) for p, l, u in points])

    def interp(points, n, k, s):
        sh = points.shape
        pts = np.reshape(points, (sh[0], -1))
        k = min(k, sh[0] - 1)
        tck, _ = scipy.interpolate.splprep(pts.T, k=k, s=s)
        u = np.linspace(0, 1, n, endpoint=False)
        new_points = np.array(scipy.interpolate.splev(u, tck))
        return np.reshape(new_points.T, (n, sh[1], sh[2]))

    points = poses_to_points(poses, dist=rot_weight)
    new_points = interp(points, n_interp * (points.shape[0] - 1),
                        k=spline_degree, s=smoothness)
    return points_to_poses(new_points)


def create_render_spline_path(config, image_names: List[str],
                              poses: np.ndarray):
    """Spline render path through keyframe poses named in
    config.render_spline_keyframes (a directory of images or a text file of
    names; camera_utils.py:330-378). Returns (keyframe_indices, poses)."""
    import os
    source = config.render_spline_keyframes
    if os.path.isdir(source):
        keyframe_names = sorted(os.listdir(source))
    else:
        with open(source, "r") as f:
            keyframe_names = f.read().splitlines()
    spline_indices = np.array(
        [i for i, name in enumerate(image_names) if name in keyframe_names])
    if len(spline_indices) < 2:
        raise ValueError(
            f"need >=2 keyframes from {source}, matched {len(spline_indices)}")
    render_poses = generate_interpolated_path(
        poses[spline_indices],
        n_interp=config.render_spline_n_interp,
        spline_degree=config.render_spline_degree,
        smoothness=config.render_spline_smoothness,
        rot_weight=0.1)
    return spline_indices, render_poses


def interpolate_1d(x: np.ndarray, n_interp: int, spline_degree: int,
                   smoothness: float) -> np.ndarray:
    """Spline-upsample a 1D signal by n_interp (e.g. per-frame exposure)."""
    t = np.linspace(0, 1, len(x), endpoint=True)
    tck = scipy.interpolate.splrep(t, x, s=smoothness, k=spline_degree)
    u = np.linspace(0, 1, n_interp * (len(x) - 1), endpoint=False)
    return scipy.interpolate.splev(u, tck)


# ---------------------------------------------------------------------------
# Intrinsics & distortion (xnp-generic).
# ---------------------------------------------------------------------------

def intrinsic_matrix(fx, fy, cx, cy, xnp: types.ModuleType = np) -> _Array:
    """OpenCV-convention pinhole intrinsics."""
    return xnp.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])


def get_pixtocam(focal, width, height, xnp: types.ModuleType = np) -> _Array:
    """Inverse intrinsics of a centered pinhole camera."""
    return xnp.linalg.inv(intrinsic_matrix(focal, focal, width * 0.5,
                                           height * 0.5, xnp))


def pixel_coordinates(width: int, height: int,
                      xnp: types.ModuleType = np) -> Tuple[_Array, _Array]:
    return xnp.meshgrid(xnp.arange(width), xnp.arange(height), indexing="xy")


def _distortion_residual_and_jacobian(x, y, xd, yd, k1=0.0, k2=0.0, k3=0.0,
                                      k4=0.0, p1=0.0, p2=0.0):
    """Residual of the OpenCV radial+tangential model and its 2x2 Jacobian."""
    r = x * x + y * y
    d = 1.0 + r * (k1 + r * (k2 + r * (k3 + r * k4)))
    fx = d * x + 2 * p1 * x * y + p2 * (r + 2 * x * x) - xd
    fy = d * y + 2 * p2 * x * y + p1 * (r + 2 * y * y) - yd
    d_r = k1 + r * (2 * k2 + r * (3 * k3 + r * 4 * k4))
    d_x, d_y = 2 * x * d_r, 2 * y * d_r
    fx_x = d + d_x * x + 2 * p1 * y + 6 * p2 * x
    fx_y = d_y * x + 2 * p1 * x + 2 * p2 * y
    fy_x = d_x * y + 2 * p2 * y + 2 * p1 * x
    fy_y = d + d_y * y + 2 * p2 * x + 6 * p1 * y
    return fx, fy, fx_x, fx_y, fy_x, fy_y


def radial_and_tangential_undistort(xd, yd, k1=0.0, k2=0.0, k3=0.0, k4=0.0,
                                    p1=0.0, p2=0.0, eps=1e-9,
                                    max_iterations=10,
                                    xnp: types.ModuleType = np):
    """Invert the distortion model with a fixed 10-iteration Newton solve.

    Fixed iteration count keeps the computation jit-compatible and matches
    the reference's convergence behavior (camera_utils.py:458-494).
    """
    x, y = xnp.array(xd), xnp.array(yd)
    for _ in range(max_iterations):
        fx, fy, fx_x, fx_y, fy_x, fy_y = _distortion_residual_and_jacobian(
            x, y, xd, yd, k1=k1, k2=k2, k3=k3, k4=k4, p1=p1, p2=p2)
        denom = fy_x * fx_y - fx_x * fy_y
        safe = xnp.abs(denom) > eps
        x = x + xnp.where(safe, (fx * fy_y - fy * fx_y) / denom, 0.0)
        y = y + xnp.where(safe, (fy * fx_x - fx * fy_x) / denom, 0.0)
    return x, y


# ---------------------------------------------------------------------------
# NDC and ray casting (xnp-generic).
# ---------------------------------------------------------------------------

def convert_to_ndc(origins, directions, pixtocam, near: float = 1.0,
                   xnp: types.ModuleType = np):
    """Map rays to NDC for forward-facing scenes (NeRF Appendix C).

    Origins shift to the near plane first, so the NDC near/far planes are
    z = -1 and z = +1; directions_ndc spans origin->infinity projections.
    """
    t = -(near + origins[..., 2]) / directions[..., 2]
    origins = origins + t[..., None] * directions
    dx, dy, dz = xnp.moveaxis(directions, -1, 0)
    ox, oy, oz = xnp.moveaxis(origins, -1, 0)
    xmult = 1.0 / pixtocam[0, 2]
    ymult = 1.0 / pixtocam[1, 2]
    origins_ndc = xnp.stack(
        [xmult * ox / oz, ymult * oy / oz, -xnp.ones_like(oz)], axis=-1)
    infinity_ndc = xnp.stack(
        [xmult * dx / dz, ymult * dy / dz, xnp.ones_like(oz)], axis=-1)
    return origins_ndc, infinity_ndc - origins_ndc


def pixels_to_rays(pix_x_int, pix_y_int, pixtocams, camtoworlds,
                   distortion_params: Optional[Mapping[str, float]] = None,
                   pixtocam_ndc: Optional[_Array] = None,
                   camtype: ProjectionType = ProjectionType.PERSPECTIVE,
                   xnp: types.ModuleType = np):
    """Pixel indices -> (origins, directions, viewdirs, radii).

    Casts through pixel centers; the +x and +y neighbor rays give the pixel
    footprint from which the Mip-NeRF cone base radius derives: half the mean
    neighbor distance scaled by 2/sqrt(12) to match a uniform pixel's std
    (camera_utils.py:503-607).
    """
    def pix_to_dir(x, y):
        return xnp.stack([x + 0.5, y + 0.5, xnp.ones_like(x)], axis=-1)

    pixel_dirs = xnp.stack([
        pix_to_dir(pix_x_int, pix_y_int),
        pix_to_dir(pix_x_int + 1, pix_y_int),
        pix_to_dir(pix_x_int, pix_y_int + 1),
    ], axis=0)

    matmul = nh_math.matmul_hp if xnp is jnp else xnp.matmul
    mat_vec = lambda A, b: matmul(A, b[..., None])[..., 0]

    camera_dirs = mat_vec(pixtocams, pixel_dirs)
    if distortion_params is not None:
        x, y = radial_and_tangential_undistort(
            camera_dirs[..., 0], camera_dirs[..., 1], **distortion_params,
            xnp=xnp)
        camera_dirs = xnp.stack([x, y, xnp.ones_like(x)], -1)

    if camtype == ProjectionType.FISHEYE:
        theta = xnp.sqrt(xnp.sum(xnp.square(camera_dirs[..., :2]), axis=-1))
        theta = xnp.minimum(xnp.pi, theta)
        sin_ratio = xnp.sin(theta) / theta
        camera_dirs = xnp.stack([camera_dirs[..., 0] * sin_ratio,
                                 camera_dirs[..., 1] * sin_ratio,
                                 xnp.cos(theta)], axis=-1)

    # OpenCV -> OpenGL axis flip, then rotate into world space.
    camera_dirs = matmul(camera_dirs, xnp.diag(xnp.array([1.0, -1.0, -1.0])))
    dirs_stacked = mat_vec(camtoworlds[..., :3, :3], camera_dirs)
    directions, dx, dy = dirs_stacked

    origins = xnp.broadcast_to(camtoworlds[..., :3, -1], directions.shape)
    viewdirs = directions / xnp.linalg.norm(directions, axis=-1, keepdims=True)

    if pixtocam_ndc is None:
        dx_norm = xnp.linalg.norm(dx - directions, axis=-1)
        dy_norm = xnp.linalg.norm(dy - directions, axis=-1)
    else:
        origins_dx, _ = convert_to_ndc(origins, dx, pixtocam_ndc, xnp=xnp)
        origins_dy, _ = convert_to_ndc(origins, dy, pixtocam_ndc, xnp=xnp)
        origins, directions = convert_to_ndc(origins, directions,
                                             pixtocam_ndc, xnp=xnp)
        dx_norm = xnp.linalg.norm(origins_dx - origins, axis=-1)
        dy_norm = xnp.linalg.norm(origins_dy - origins, axis=-1)

    radii = (0.5 * (dx_norm + dy_norm))[..., None] * 2 / xnp.sqrt(12)
    return origins, directions, viewdirs, radii


def cast_ray_batch(cameras: Tuple[_Array, ...], pixels: structs.Pixels,
                   heights: _Array, widths: _Array,
                   distortion_params: Optional[Mapping[str, float]],
                   camtype: ProjectionType = ProjectionType.PERSPECTIVE,
                   xnp: types.ModuleType = np) -> structs.Rays:
    """Pixels batch + camera table -> Rays batch (camera_utils.py:610-672).

    `cameras` = (pixtocams, camtoworlds, pixtocam_ndc); per-ray cameras are
    gathered by pixels.cam_idx. pix_coords are (x, y) normalized to [0, 1]
    for the HaNeRF implicit mask.
    """
    pixtocams, camtoworlds, pixtocam_ndc = cameras
    cam_idx = pixels.cam_idx[..., 0]
    batch_index = lambda arr: arr if arr.ndim == 2 else arr[cam_idx]

    origins, directions, viewdirs, radii = pixels_to_rays(
        pixels.pix_x_int, pixels.pix_y_int, batch_index(pixtocams),
        batch_index(camtoworlds), distortion_params=distortion_params,
        pixtocam_ndc=pixtocam_ndc, camtype=camtype, xnp=xnp)

    h, w = heights[cam_idx], widths[cam_idx]
    pix_coords = xnp.stack([
        (pixels.pix_x_int.astype(xnp.float32) + 0.5) / w,
        (pixels.pix_y_int.astype(xnp.float32) + 0.5) / h,
    ], axis=-1)
    return structs.Rays(
        pix_coords=pix_coords, origins=origins, directions=directions,
        viewdirs=viewdirs, radii=radii, lossmult=pixels.lossmult,
        static_mask=pixels.static_mask, near=pixels.near, far=pixels.far,
        embed_idx=pixels.embed_idx, cam_idx=pixels.cam_idx)


def cast_pinhole_rays(camtoworld, height, width, focal, near, far,
                      xnp: types.ModuleType = np) -> structs.Rays:
    """Full-frame pinhole ray bundle without distortion (render paths)."""
    pix_x_int, pix_y_int = pixel_coordinates(width, height, xnp=xnp)
    pixtocam = get_pixtocam(focal, width, height, xnp=xnp)
    origins, directions, viewdirs, radii = pixels_to_rays(
        pix_x_int, pix_y_int, pixtocam, camtoworld, xnp=xnp)
    bscalar = lambda x: xnp.broadcast_to(x, pix_x_int.shape)[..., None]
    pix_coords = xnp.stack([(pix_x_int.astype(xnp.float32) + 0.5) / width,
                            (pix_y_int.astype(xnp.float32) + 0.5) / height],
                           axis=-1)
    return structs.Rays(
        pix_coords=pix_coords, origins=origins, directions=directions,
        viewdirs=viewdirs, radii=radii, lossmult=bscalar(1.0),
        static_mask=bscalar(1.0), near=bscalar(near), far=bscalar(far),
        embed_idx=bscalar(0).astype(xnp.int32),
        cam_idx=bscalar(0).astype(xnp.int32))


def cast_spherical_rays(camtoworld, height, width, near, far,
                        xnp: types.ModuleType = np) -> structs.Rays:
    """Equirectangular (360) ray bundle (camera_utils.py:700-745)."""
    theta_vals = xnp.linspace(0, 2 * xnp.pi, width + 1)
    phi_vals = xnp.linspace(0, xnp.pi, height + 1)
    theta, phi = xnp.meshgrid(theta_vals, phi_vals, indexing="xy")
    directions = xnp.stack([
        -xnp.sin(phi) * xnp.sin(theta),
        xnp.cos(phi),
        xnp.sin(phi) * xnp.cos(theta),
    ], axis=-1)
    matmul = nh_math.matmul_hp if xnp is jnp else xnp.matmul
    directions = matmul(camtoworld[:3, :3], directions[..., None])[..., 0]

    dy = xnp.diff(directions[:, :-1], axis=0)
    dx = xnp.diff(directions[:-1, :], axis=1)
    directions = directions[:-1, :-1]
    origins = xnp.broadcast_to(camtoworld[:3, -1], directions.shape)
    radii = (0.5 * (xnp.linalg.norm(dx, axis=-1) +
                    xnp.linalg.norm(dy, axis=-1)))[..., None] * 2 / xnp.sqrt(12)
    bscalar = lambda x: xnp.broadcast_to(x, radii.shape[:-1])[..., None]
    xg, yg = pixel_coordinates(width, height, xnp=xnp)
    pix_coords = xnp.stack([(xg + 0.5) / width, (yg + 0.5) / height], axis=-1)
    return structs.Rays(
        pix_coords=pix_coords, origins=origins, directions=directions,
        viewdirs=directions, radii=radii, lossmult=bscalar(1.0),
        static_mask=bscalar(1.0), near=bscalar(near), far=bscalar(far),
        embed_idx=bscalar(0).astype(xnp.int32),
        cam_idx=bscalar(0).astype(xnp.int32))
