"""HuGS heuristics parity vs the reference generate_static_mask.py helpers
(torch). segment_anything/sklearn imports are stubbed — the helpers under
test don't use them."""

import os
import sys
import types

import numpy as np
import pytest

REF_HUGS = "/root/reference/HuGS"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_HUGS), reason="reference checkout unavailable")


@pytest.fixture(scope="module")
def ref_gsm():
    seg = types.ModuleType("segment_anything")
    seg.sam_model_registry = {}
    seg.SamAutomaticMaskGenerator = object
    seg.SamPredictor = object
    sys.modules.setdefault("segment_anything", seg)
    amg = types.ModuleType("segment_anything.utils.amg")
    amg.calculate_stability_score = lambda *a, **k: None
    utils_mod = types.ModuleType("segment_anything.utils")
    utils_mod.amg = amg
    sys.modules.setdefault("segment_anything.utils", utils_mod)
    sys.modules.setdefault("segment_anything.utils.amg", amg)
    # Import by file path — putting REF_HUGS on sys.path would shadow OUR
    # top-level generate_static_mask.py for later tests.
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "_ref_generate_static_mask",
        os.path.join(REF_HUGS, "generate_static_mask.py"))
    ref_mod = importlib.util.module_from_spec(spec)
    saved = sys.path[:]
    sys.path.insert(0, REF_HUGS)  # for its own colmap_utils import
    try:
        spec.loader.exec_module(ref_mod)
    finally:
        sys.path[:] = saved
    return ref_mod


RNG = np.random.RandomState(0)


def test_delete_same_points_parity(ref_gsm):
    import torch
    pts = RNG.uniform(0, 10, (40, 2)).astype(np.float32)
    mine = __import__("nerf_hugs_tpu.hugs.heuristics",
                      fromlist=["x"]).delete_same_points(pts, 0.5)
    theirs = ref_gsm.delete_same_points(torch.tensor(pts), 0.5).numpy()
    np.testing.assert_allclose(mine, theirs, atol=1e-6)


def test_delete_outlier_points_parity(ref_gsm):
    import torch
    pts = np.concatenate([RNG.randn(30, 2),
                          [[50.0, 50.0]]]).astype(np.float32)
    from nerf_hugs_tpu.hugs import heuristics
    mine = heuristics.delete_outlier_points(pts, 3.0)
    theirs = ref_gsm.delete_outlier_points(torch.tensor(pts), 3.0).numpy()
    np.testing.assert_allclose(mine, theirs, atol=1e-5)


def test_fill_gap_parity(ref_gsm):
    import torch
    from nerf_hugs_tpu.hugs import heuristics
    mask = (RNG.rand(24, 32, 1) > 0.4).astype(np.float32)
    for k in [3, 5, 7]:
        mine = heuristics.fill_gap(mask, k)
        theirs = ref_gsm.fill_gap(torch.tensor(mask), k).numpy()
        np.testing.assert_allclose(mine, theirs, atol=1e-6, err_msg=f"k={k}")


def test_intersect_masks_parity(ref_gsm):
    import torch
    from nerf_hugs_tpu.hugs import heuristics
    coarse = (RNG.rand(24, 32, 1) > 0.5).astype(np.float32)
    fine = (RNG.rand(5, 24, 32, 1) > 0.6).astype(np.float32)
    mine = heuristics.intersect_masks(coarse, fine, 0.5)
    theirs = ref_gsm.intersect_masks(torch.tensor(coarse),
                                     torch.tensor(fine), 0.5).numpy()
    np.testing.assert_allclose(mine, theirs, atol=1e-6)
