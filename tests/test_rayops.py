"""Ray-primitive intersection tests."""

import numpy as np

from nerf_hugs_tpu.core import rayops


def test_intersect_aabb():
    aabb = np.array([[-1.0, -1, -1], [1, 1, 1]])
    origins = np.array([[0.0, 0, -5], [0, 0, -5], [5, 5, 5]])
    dirs = np.array([[0.0, 0, 1], [0, 1, 0], [1, 0, 0]])
    hit, near, far = rayops.intersect_aabb(aabb, origins, dirs)
    assert hit[0, 0] and not hit[1, 0] and not hit[2, 0]
    np.testing.assert_allclose(near[0, 0], 4.0)
    np.testing.assert_allclose(far[0, 0], 6.0)


def test_intersect_sphere():
    center = np.zeros(3)
    origins = np.array([[0.0, 0, -5], [0, 3, -5]])
    dirs = np.array([[0.0, 0, 1], [0, 0, 1]])
    hit, near, far = rayops.intersect_sphere(center, 1.0, origins, dirs)
    assert hit[0, 0] and not hit[1, 0]
    np.testing.assert_allclose(near[0, 0], 4.0)
    np.testing.assert_allclose(far[0, 0], 6.0)


def test_clip_near_far_to_aabb():
    origins = np.array([[0.0, 0, -5], [0, 0, 10]], np.float32)
    dirs = np.array([[0.0, 0, 1], [0, 1, 0]], np.float32)
    near = np.full((2, 1), 0.1, np.float32)
    far = np.full((2, 1), 100.0, np.float32)
    new_near, new_far = rayops.clip_near_far_to_aabb(
        origins, dirs, near, far, bound=1.0)
    np.testing.assert_allclose(new_near[0, 0], 4.0)
    np.testing.assert_allclose(new_far[0, 0], 6.0)
    # Missing ray keeps its original bounds.
    np.testing.assert_allclose(new_near[1, 0], 0.1)
    np.testing.assert_allclose(new_far[1, 0], 100.0)
