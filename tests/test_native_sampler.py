"""Native C++ ray sampler: builds, samples correctly, matches image data."""

import numpy as np
import pytest

from nerf_hugs_tpu.data import native_sampler


@pytest.fixture(scope="module")
def sampler_and_data():
    lib = native_sampler.load_library()
    if lib is None:
        pytest.skip("g++ toolchain unavailable")
    rng = np.random.RandomState(0)
    n_imgs, h, w = 4, 24, 32
    images = [rng.rand(h, w, 3).astype(np.float32) for _ in range(n_imgs)]
    masks = [rng.rand(h, w, 1).astype(np.float32) for _ in range(n_imgs)]
    nears = [np.full((h, w, 1), 0.1 + i, np.float32) for i in range(n_imgs)]
    fars = [np.full((h, w, 1), 10.0 + i, np.float32) for i in range(n_imgs)]
    sampler = native_sampler.NativeSampler(images, masks, nears, fars,
                                           embed_idxs=[10, 11, 12, 13])
    return sampler, images, masks, nears, fars


def test_gathered_values_match_source(sampler_and_data):
    sampler, images, masks, nears, fars = sampler_and_data
    pix_x, pix_y, cam, embed, rgb, mask, near, far = sampler.sample(
        seed=7, n_patches=16, patch_size=4, patch_dilation=1,
        image_num_per_batch=2)
    assert len(pix_x) == 16 * 16
    for i in range(len(pix_x)):
        c, x, y = cam[i], pix_x[i], pix_y[i]
        np.testing.assert_array_equal(rgb[i], images[c][y, x])
        assert mask[i] == masks[c][y, x, 0]
        assert near[i] == nears[c][y, x, 0]
        assert far[i] == fars[c][y, x, 0]
        assert embed[i] == 10 + c


def test_patch_structure(sampler_and_data):
    sampler, *_ = sampler_and_data
    p, dilation = 4, 2
    pix_x, pix_y, cam, *_ = sampler.sample(
        seed=3, n_patches=8, patch_size=p, patch_dilation=dilation,
        image_num_per_batch=2)
    xs = pix_x.reshape(8, p, p)
    ys = pix_y.reshape(8, p, p)
    np.testing.assert_array_equal(np.diff(xs, axis=-1), dilation)
    np.testing.assert_array_equal(np.diff(ys, axis=1), dilation)
    # Patches from the same image are contiguous: 2 groups of 4.
    cams = cam.reshape(8, p * p)
    assert (cams == cams[:, :1]).all()
    assert len(np.unique(cams[:4])) == 1 and len(np.unique(cams[4:])) == 1


def test_determinism_and_seed_sensitivity(sampler_and_data):
    sampler, *_ = sampler_and_data
    a = sampler.sample(5, 8, 2, 1, 2)
    b = sampler.sample(5, 8, 2, 1, 2)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    c = sampler.sample(6, 8, 2, 1, 2)
    assert any(not np.array_equal(x, y) for x, y in zip(a, c))


def test_half_image_restriction(sampler_and_data):
    sampler, images, *_ = sampler_and_data
    w = images[0].shape[1]
    pix_x, *_ = sampler.sample(9, 32, 2, 1, 2, half_image=True)
    assert pix_x.max() < w // 2


def test_bounds(sampler_and_data):
    sampler, images, *_ = sampler_and_data
    h, w = images[0].shape[:2]
    for seed in range(20):
        pix_x, pix_y, *_ = sampler.sample(seed, 16, 5, 2, 4)
        assert pix_x.min() >= 0 and pix_x.max() < w
        assert pix_y.min() >= 0 and pix_y.max() < h


def test_degenerate_patch_span_raises(sampler_and_data):
    """Patches that cannot fit an image must raise loudly, never return
    uninitialized buffers (the numpy fallback raises in the same case)."""
    sampler = sampler_and_data[0]
    # Images are 24x32: patch_size 40 cannot fit.
    with pytest.raises(ValueError, match="does not fit"):
        sampler.sample(seed=1, n_patches=4, patch_size=40, patch_dilation=1,
                       image_num_per_batch=2)
    # Dilation can push the span past the image too.
    with pytest.raises(ValueError, match="does not fit"):
        sampler.sample(seed=1, n_patches=4, patch_size=16, patch_dilation=3,
                       image_num_per_batch=2)
    # half_image halves the usable width (phototourism finetune protocol):
    # a 16-wide patch exactly fits the 16-pixel half, 17 does not.
    sampler.sample(seed=1, n_patches=4, patch_size=16, patch_dilation=1,
                   image_num_per_batch=2, half_image=True)
    with pytest.raises(ValueError, match="does not fit"):
        sampler.sample(seed=1, n_patches=4, patch_size=17, patch_dilation=1,
                       image_num_per_batch=2, half_image=True)
