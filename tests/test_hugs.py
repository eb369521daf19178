"""HuGS tests: heuristics against hand-built cases, SAM pipeline with a tiny
random model, weight-conversion structure parity, and the full
generate_static_mask pipeline on a synthetic scene."""

import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_hugs_tpu.hugs import heuristics


def test_delete_same_points():
    pts = np.array([[0.0, 0], [0.05, 0], [1, 1], [1.04, 1], [3, 3]])
    out = heuristics.delete_same_points(pts, 0.1)
    assert len(out) == 3
    np.testing.assert_allclose(out, [[0, 0], [1, 1], [3, 3]], atol=0.05)


def test_delete_outlier_points():
    rng = np.random.RandomState(0)
    cluster = rng.randn(30, 2)
    outlier = np.array([[100.0, 100.0]])
    out = heuristics.delete_outlier_points(
        np.concatenate([cluster, outlier]))
    assert len(out) == 30


def test_kmeans_reduce():
    rng = np.random.RandomState(0)
    pts = np.concatenate([rng.randn(20, 2), rng.randn(20, 2) + 10])
    out = heuristics.kmeans_reduce(pts, 2)
    assert 1 <= len(out) <= 2
    # Selected points are actual input points.
    for p in out:
        assert np.min(np.linalg.norm(pts - p, axis=-1)) < 1e-9


def test_fill_gap_closes_holes():
    mask = np.ones((20, 20, 1), np.float32)
    mask[10, 10] = 0  # pinhole
    out = heuristics.fill_gap(mask, 5)
    assert out[10, 10, 0] == 1.0
    # Doesn't erase the mask.
    assert out.sum() >= mask.sum()


def test_intersect_masks():
    coarse = np.zeros((10, 10, 1), np.float32)
    coarse[:5] = 1.0
    fine = np.zeros((2, 10, 10, 1), np.float32)
    fine[0, :6] = 1.0    # 5/6 covered -> selected
    fine[1, 5:] = 1.0    # 0 covered -> dropped
    out = heuristics.intersect_masks(coarse, fine, 0.5)
    np.testing.assert_array_equal(out[..., 0], fine[0, ..., 0])


def test_erode_mask_shrinks():
    mask = np.zeros((20, 20, 1), np.float32)
    mask[5:15, 5:15] = 1.0
    out = heuristics.erode_mask(mask, 5)
    assert out.sum() < mask.sum()
    assert out[9, 9, 0] == 1.0 and out[5, 5, 0] == 0.0


def test_residual_masks():
    rng = np.random.RandomState(0)
    gt = rng.rand(16, 16, 3).astype(np.float32)
    pred = gt.copy()
    pred[:4, :4] += 0.5  # a high-residual (transient) corner
    residual, base, upper = heuristics.residual_masks(pred, gt, 0.9)
    assert base[:4, :4].mean() < 0.2   # transient excluded from base
    assert base[8:, 8:].mean() > 0.9   # static kept
    assert upper.sum() >= base.sum()   # upper is a superset


def test_complete_sam_regions_covers_everything():
    h, w = 12, 16
    m1 = np.zeros((h, w)); m1[:6, :8] = 1
    m2 = np.zeros((h, w)); m2[6:, 8:] = 1
    regions = heuristics.complete_sam_regions([m1, m2], h, w)
    # Every pixel in exactly one region.
    total = regions.sum(axis=0)
    np.testing.assert_array_equal(total[..., 0], np.ones((h, w)))
    assert regions.shape[0] >= 3  # two SAM + at least one fill region


def test_stability_score():
    logits = np.full((1, 8, 8), 5.0)
    logits[0, :4] = -5.0
    score = heuristics.calculate_stability_score(logits, 0.0, 1.0)
    np.testing.assert_allclose(score, 1.0)  # binarization-stable
    logits2 = np.full((1, 8, 8), 0.5)  # between offsets -> unstable
    score2 = heuristics.calculate_stability_score(logits2, 0.0, 1.0)
    np.testing.assert_allclose(score2, 0.0)


def test_fuse_masks_rule():
    h = w = 16
    sam_regions = heuristics.complete_sam_regions(
        [np.concatenate([np.ones((h, w // 2)), np.zeros((h, w // 2))], 1)],
        h, w)
    sfm = np.zeros((h, w, 1), np.float32); sfm[:, :w // 2] = 1
    base = np.zeros((h, w, 1), np.float32)
    upper = np.ones((h, w, 1), np.float32)
    fused = heuristics.fuse_masks(sfm, base, upper, sam_regions, 0, 0)
    np.testing.assert_array_equal(fused[:, :w // 2, 0], 1.0)
    np.testing.assert_array_equal(fused[:, w // 2:, 0], 0.0)


# -- SAM ------------------------------------------------------------------

@pytest.fixture(scope="module")
def tiny_sam():
    from nerf_hugs_tpu.hugs.sam.predictor import SamPredictor, build_sam
    sam, variables = build_sam("vit_t", image_size=64, window_size=2)
    return SamPredictor(sam, variables)


def test_sam_predictor_shapes(tiny_sam):
    rng = np.random.RandomState(0)
    image = (rng.rand(48, 60, 3) * 255).astype(np.uint8)
    tiny_sam.set_image(image)
    pts = tiny_sam.apply_coords(
        np.array([[[30.0, 24.0]], [[10.0, 10.0]]]), (48, 60))
    masks, iou = tiny_sam.predict_batched(pts, np.ones((2, 1)))
    assert masks.shape == (2, 3, 48, 60)
    assert iou.shape == (2, 3)
    assert np.all(np.isfinite(masks))


@pytest.mark.parametrize("iou_t,stab_t", [(0.0, 0.0), (0.5, 0.6)])
def test_predict_compact_matches_batched(tiny_sam, iou_t, stab_t):
    """The device-side filtered path (decode + upsample + IoU/stability
    filter + threshold + box + bit-pack in one jit) must reproduce the
    predict_batched -> numpy filtering chain exactly, including pad-prompt
    masking, the empty-mask drop, and mask_to_box."""
    rng = np.random.RandomState(3)
    image = (rng.rand(48, 60, 3) * 255).astype(np.uint8)
    tiny_sam.set_image(image)
    n_valid, batch = 5, 8
    pts_px = rng.rand(n_valid, 1, 2) * np.array([60.0, 48.0])
    pts = tiny_sam.apply_coords(pts_px, (48, 60))
    pts = np.concatenate([pts, np.zeros((batch - n_valid, 1, 2))])
    labels = np.ones(pts.shape[:2])
    offset = 1.0

    # Reference chain (host numpy over full-res logits).
    logits, ious = tiny_sam.predict_batched(pts, labels)
    logits = logits[:n_valid].reshape(-1, 48, 60)
    ious_f = ious[:n_valid].reshape(-1)
    stab = heuristics.calculate_stability_score(
        logits, tiny_sam.mask_threshold, offset)
    want_keep = np.ones(len(logits), bool)
    if iou_t > 0:
        want_keep &= ious_f > iou_t
    if stab_t > 0:
        want_keep &= stab >= stab_t
    segs = logits > tiny_sam.mask_threshold
    want_keep &= segs.any((-1, -2))

    packed, got_ious, got_stabs, keep, boxes, n_pass = \
        tiny_sam.predict_compact(pts, labels, iou_t, stab_t, offset,
                                 n_valid=n_valid, max_keep=batch * 3)
    assert n_pass == int(want_keep.sum())
    np.testing.assert_array_equal(keep[:n_valid * 3], want_keep)
    assert not keep[n_valid * 3:].any()
    np.testing.assert_allclose(got_ious[:n_valid * 3], ious_f, rtol=1e-5)
    np.testing.assert_allclose(got_stabs[:n_valid * 3], stab, rtol=1e-4)
    from nerf_hugs_tpu.hugs.sam.amg import mask_to_box
    for i in np.where(want_keep)[0]:
        seg = np.unpackbits(packed[i], count=48 * 60).reshape(48, 60)
        np.testing.assert_array_equal(seg.astype(bool), segs[i])
        np.testing.assert_array_equal(boxes[i].astype(np.float64),
                                      mask_to_box(segs[i]))

    # predict_count == the reference sfm accumulation (select_best path).
    best = np.argmax(ious[:n_valid], axis=-1)
    best_logits = logits.reshape(n_valid, 3, 48, 60)[np.arange(n_valid),
                                                     best]
    best_ious = ious[:n_valid][np.arange(n_valid), best]
    k = np.ones(n_valid, bool)
    if iou_t > 0:
        k &= best_ious > iou_t
    bstab = heuristics.calculate_stability_score(
        best_logits, tiny_sam.mask_threshold, offset)
    if stab_t > 0:
        k &= bstab >= stab_t
    k &= (best_logits > tiny_sam.mask_threshold).any((-1, -2))
    want_counts = (best_logits[k] > tiny_sam.mask_threshold).sum(0)
    got_counts = tiny_sam.predict_count(pts, labels, iou_t, stab_t, offset,
                                        n_valid=n_valid, select_best=True)
    np.testing.assert_array_equal(got_counts, want_counts.astype(np.float32))

    # select_best=False (sfm_use_highest_iou: false): count over ALL
    # filtered masks, not just each prompt's best.
    want_counts_all = segs[want_keep].sum(0)
    got_counts_all = tiny_sam.predict_count(
        pts, labels, iou_t, stab_t, offset, n_valid=n_valid,
        select_best=False)
    np.testing.assert_array_equal(got_counts_all,
                                  want_counts_all.astype(np.float32))
    tiny_sam.reset_image()


def test_predict_compact_budget_drops_lowest_iou(tiny_sam):
    """max_keep smaller than the pass count keeps the highest-IoU masks and
    reports the overflow via n_pass."""
    rng = np.random.RandomState(4)
    image = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    tiny_sam.set_image(image)
    pts = tiny_sam.apply_coords(rng.rand(4, 1, 2) * 32.0, (32, 32))
    labels = np.ones(pts.shape[:2])
    full = tiny_sam.predict_compact(pts, labels, 0.0, 0.0, 1.0,
                                    n_valid=4, max_keep=12)
    packed, ious, stabs, keep, boxes, n_pass = tiny_sam.predict_compact(
        pts, labels, 0.0, 0.0, 1.0, n_valid=4, max_keep=2)
    assert packed.shape[0] == 2 and keep.shape == (2,)
    assert n_pass == full[5]
    if n_pass >= 2:
        # The two survivors are the top-2 IoU among the full keep set.
        kept_ious = np.sort(full[1][full[3]])[-2:]
        np.testing.assert_allclose(np.sort(ious[keep]), kept_ious,
                                   rtol=1e-6)
    tiny_sam.reset_image()


def test_sam_amg_pipeline(tiny_sam):
    from nerf_hugs_tpu.hugs.sam.amg import SamAutomaticMaskGenerator
    gen = SamAutomaticMaskGenerator(
        predictor=tiny_sam, points_per_side=4, points_per_batch=16,
        pred_iou_thresh=0.0, stability_score_thresh=0.0, crop_n_layers=0,
        min_mask_region_area=0)
    rng = np.random.RandomState(1)
    image = (rng.rand(48, 48, 3) * 255).astype(np.uint8)
    results = gen.generate(image)
    for r in results:
        assert r["segmentation"].shape == (48, 48)
        assert r["area"] == int(r["segmentation"].sum())


def test_sam_amg_mask_budget(tiny_sam):
    """max_masks_per_batch (the configs/hugs/kubric_tpu.yml transfer
    budget): a non-dropping budget reproduces the budget-free generator
    exactly; an undersized one warns and still returns valid masks."""
    import warnings

    from nerf_hugs_tpu.hugs.sam.amg import SamAutomaticMaskGenerator

    rng = np.random.RandomState(7)
    image = (rng.rand(48, 48, 3) * 255).astype(np.uint8)
    kwargs = dict(predictor=tiny_sam, points_per_side=4, points_per_batch=16,
                  pred_iou_thresh=0.0, stability_score_thresh=0.0,
                  crop_n_layers=0, min_mask_region_area=0)
    want = SamAutomaticMaskGenerator(**kwargs).generate(image)
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # non-dropping budget must NOT warn
        got = SamAutomaticMaskGenerator(
            max_masks_per_batch=48, **kwargs).generate(image)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g["segmentation"], w["segmentation"])
        assert g["predicted_iou"] == w["predicted_iou"]

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        small = SamAutomaticMaskGenerator(
            max_masks_per_batch=2, **kwargs).generate(image)
    assert any("budget" in str(c.message) for c in caught)
    assert 0 < len(small) <= len(want)
    for r in small:
        assert r["segmentation"].shape == (48, 48)


def test_weight_conversion_structure():
    """A state dict with the exact official key schema converts into exactly
    the flax init structure (shapes included), and every official key is
    consumed (strict mode) modulo the documented mask-downscaling allowlist."""
    import jax

    from nerf_hugs_tpu.hugs.sam import modeling, weights
    from nerf_hugs_tpu.hugs.sam.predictor import build_sam
    from tests.sam_official_schema import make_official_sam_state_dict

    config = modeling.make_sam_config("vit_t", image_size=64, window_size=2)
    sam, variables = build_sam("vit_t", image_size=64, window_size=2)

    sd = make_official_sam_state_dict(config)
    converted = weights.convert_state_dict(sd, config)

    want_shapes = jax.tree_util.tree_map(lambda x: x.shape, variables)
    got_shapes = jax.tree_util.tree_map(lambda x: x.shape, converted)
    flat_want = jax.tree_util.tree_flatten_with_path(want_shapes)[0]
    flat_got = jax.tree_util.tree_flatten_with_path(got_shapes)[0]
    want_map = {jax.tree_util.keystr(k): v for k, v in flat_want}
    got_map = {jax.tree_util.keystr(k): v for k, v in flat_got}
    missing = set(want_map) - set(got_map)
    extra = set(got_map) - set(want_map)
    assert not missing, f"conversion missing params: {sorted(missing)[:10]}"
    assert not extra, f"conversion extra params: {sorted(extra)[:10]}"
    mismatched = {k: (want_map[k], got_map[k]) for k in want_map
                  if want_map[k] != got_map[k]}
    assert not mismatched, f"shape mismatches: {mismatched}"

    # Strict mode: an unexpected official key must fail loudly.
    import numpy as np
    import pytest
    sd_extra = dict(sd)
    sd_extra["image_encoder.bogus.weight"] = np.zeros((1,), np.float32)
    with pytest.raises(ValueError, match="bogus"):
        weights.convert_state_dict(sd_extra, config)


def test_generate_static_mask_pipeline(tmp_path):
    """Full CLI pipeline on a synthetic scene with a tiny random SAM."""
    import yaml

    import generate_static_mask as gsm
    from nerf_hugs_tpu.cameras import colmap
    from tests.test_colmap_loaders import write_colmap_model

    rng = np.random.RandomState(0)
    names = write_colmap_model(str(tmp_path / "sparse"), 3, rng)

    # Write pred/gt pairs matching COLMAP image stems.
    img_dir = tmp_path / "preds"
    img_dir.mkdir()
    for name in names:
        stem = Path(name).stem
        gt = rng.rand(16, 16, 3).astype(np.float32)
        pred = np.clip(gt + rng.randn(16, 16, 3) * 0.05, 0, 1)
        gsm.save_image_rgb(gt, img_dir / f"{stem}_gt.png")
        gsm.save_image_rgb(pred, img_dir / f"{stem}_color.png")

    config = gsm.SegmentConfig(
        sam_points_per_side=4, sam_crop_n_layers=0,
        sam_min_mask_region_area=0, sam_pred_iou_thresh=0.0,
        sam_stability_score_thresh=0.0, sfm_point_count_threshold=2,
        sfm_seg_batch_size=8, sfm_pred_iou_thresh=0.0,
        sfm_stability_score_thresh=0.0, smooth_kernel_size=3,
        erode_kernel_size=0)
    gsm.main(str(img_dir), str(tmp_path / "sparse"), "vit_t", None,
             str(tmp_path / "out"), config,
             sam_overrides={"image_size": 64, "window_size": 2})

    masks = sorted((tmp_path / "out" / "static_masks").glob("*.png"))
    vises = sorted((tmp_path / "out" / "visualizations").glob("*.png"))
    assert len(masks) == 3 and len(vises) == 3
    from nerf_hugs_tpu.utils import io as nh_io
    mask = nh_io.load_img(str(masks[0]))
    assert mask.shape[:2] == (16, 16)
    vis = nh_io.load_img(str(vises[0]))
    assert vis.shape[:2] == (32, 128)  # 2h x 8w grid


def test_sam_amg_with_crop_layers(tiny_sam):
    """crop_n_layers=1 (the reference's HuGS setting) exercises the crop
    generation + crop NMS path."""
    from nerf_hugs_tpu.hugs.sam.amg import SamAutomaticMaskGenerator
    gen = SamAutomaticMaskGenerator(
        predictor=tiny_sam, points_per_side=4, points_per_batch=16,
        pred_iou_thresh=0.0, stability_score_thresh=0.0, crop_n_layers=1,
        crop_n_points_downscale_factor=2, min_mask_region_area=2)
    rng = np.random.RandomState(2)
    image = (rng.rand(40, 56, 3) * 255).astype(np.uint8)
    results = gen.generate(image)
    for r in results:
        assert r["segmentation"].shape == (40, 56)
        assert r["area"] >= 2
