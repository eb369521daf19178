"""Parity vs the reference's TORCH stack utilities (loss_utils/ray_utils):
interlevel envelope, distortion, robustnerf mask, and the deterministic
sampler path. RNG-dependent paths can't match across frameworks; everything
deterministic must."""

import os
import sys
import types

import numpy as np
import pytest

REF_NERFACTO = "/root/reference/nerfacto"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_NERFACTO), reason="reference checkout unavailable")


@pytest.fixture(scope="module")
def torch_utils():
    tcnn = types.ModuleType("tinycudann")
    tcnn.Encoding = object
    tcnn.Network = object
    tcnn.NetworkWithInputEncoding = object
    sys.modules.setdefault("tinycudann", tcnn)
    if REF_NERFACTO not in sys.path:
        sys.path.insert(0, REF_NERFACTO)
    try:
        from utils import loss_utils as t_loss
        from utils import ray_utils as t_ray
    finally:
        # Don't shadow OUR top-level train.py/eval.py later.
        sys.path.remove(REF_NERFACTO)
    return t_loss, t_ray


RNG = np.random.RandomState(0)


def rand_sorted(shape, lo=0.0, hi=1.0):
    return np.sort(RNG.uniform(lo, hi, shape), axis=-1).astype(np.float32)


def test_interlevel_losses_agree(torch_utils):
    """The torch stack uses nerfstudio's searchsorted-based `outer`, which
    matches the jax broadcast version only when the inner histogram's support
    lies inside the envelope's (the boundary handling differs between the
    reference's own two stacks). In training that's always the case — both
    histograms span the same [0, 1] s-domain; test that regime."""
    import torch

    from nerf_hugs_tpu.core import stepfun
    t_loss, _ = torch_utils
    t = rand_sorted((16, 9), 0.1, 0.9)
    w = RNG.dirichlet(np.ones(8), 16).astype(np.float32)
    t_env = rand_sorted((16, 11), 0.2, 0.8)
    t_env = np.concatenate([np.zeros((16, 1), np.float32), t_env,
                            np.ones((16, 1), np.float32)], axis=-1)
    w_env = RNG.uniform(0, 1, (16, 12)).astype(np.float32)

    mine = np.asarray(stepfun.lossfun_outer(t, w, t_env, w_env))
    theirs = t_loss.lossfun_outer(
        torch.tensor(t), torch.tensor(w), torch.tensor(t_env),
        torch.tensor(w_env)).numpy()
    np.testing.assert_allclose(mine, theirs, atol=1e-5)


def test_distortion_losses_agree(torch_utils):
    import torch

    from nerf_hugs_tpu.core import stepfun
    t_loss, _ = torch_utils
    t = rand_sorted((16, 9))
    w = RNG.dirichlet(np.ones(8), 16).astype(np.float32)
    mine = np.asarray(stepfun.lossfun_distortion(t, w))
    theirs = t_loss.lossfun_distortion(torch.tensor(t),
                                       torch.tensor(w)).numpy()
    np.testing.assert_allclose(mine, theirs, atol=1e-5)


def test_deterministic_sampler_agrees(torch_utils):
    """perturb=False path: identical u's -> identical intervals."""
    import torch

    from nerf_hugs_tpu.core import stepfun
    _, t_ray = torch_utils
    t = rand_sorted((8, 17))
    logits = RNG.randn(8, 16).astype(np.float32)

    mine = np.asarray(stepfun.sample_intervals(
        None, t, logits, 12, single_jitter=True, domain=(0.0, 1.0)))
    theirs = t_ray.sample_intervals(
        torch.tensor(t), torch.tensor(np.exp(logits)), anneal=1.0,
        padding=0.0, num_samples=12, perturb=False, single_jitter=True,
        domain=(0.0, 1.0)).numpy()
    np.testing.assert_allclose(mine, theirs, atol=1e-5)


def test_robustnerf_mask_agrees(torch_utils):
    import torch

    from nerf_hugs_tpu.losses import zoo
    t_loss, _ = torch_utils

    class Cfg:
        patch_size = 16
        robustnerf_inlier_quantile = 0.8
        robustnerf_inner_patch_size = 8
        robustnerf_smoothed_filter_size = 3
        robustnerf_smoothed_inlier_quantile = 0.5
        robustnerf_inner_patch_inlier_quantile = 0.4

    errors = RNG.uniform(0, 0.3, (6, 16, 16, 3)).astype(np.float32)
    threshold = 0.12
    mask_mine, stats_mine = zoo.robustnerf_mask(errors, threshold, Cfg())

    extra = {"inlier_threshold": threshold}
    mask_theirs, info, extra_out = t_loss.get_robustnerf_mask(
        torch.tensor(errors), None, extra,
        inlier_quantile=Cfg.robustnerf_inlier_quantile,
        smoothed_filter_size=Cfg.robustnerf_smoothed_filter_size,
        smoothed_inlier_quantile=Cfg.robustnerf_smoothed_inlier_quantile,
        inner_patch_size=Cfg.robustnerf_inner_patch_size,
        inner_patch_inlier_quantile=Cfg.robustnerf_inner_patch_inlier_quantile)
    np.testing.assert_allclose(np.asarray(mask_mine),
                               mask_theirs.numpy(), atol=1e-6)
    np.testing.assert_allclose(float(stats_mine["inlier_threshold"]),
                               float(extra_out["inlier_threshold"]),
                               rtol=1e-4)


def test_density_to_weight_legacy_delta_parity(torch_utils):
    """compute_alpha_weights(cumulative_from_first=True) reproduces the
    torch reference's density_to_weight delta quirk (ray_utils.py:231:
    deltas measured from the FIRST bin) bit-for-bit; the default (correct
    per-interval deltas) deliberately does not. Released checkpoints were
    trained under the quirk, so imported weights render with the flag on
    (config.nerfacto.legacy_cumulative_deltas)."""
    import torch

    from nerf_hugs_tpu.core import render

    _, t_ray = torch_utils
    density = RNG.uniform(0, 5, (16, 8)).astype(np.float32)
    bins = rand_sorted((16, 9), 0.1, 4.0)
    dirs = RNG.standard_normal((16, 3)).astype(np.float32)

    for opaque in (False, True):
        ref_w, ref_a, ref_t = t_ray.density_to_weight(
            torch.from_numpy(density), torch.from_numpy(bins),
            torch.from_numpy(dirs), opaque_background=opaque)
        w, a, t = render.compute_alpha_weights(
            density, bins, dirs, opaque_background=opaque,
            cumulative_from_first=True)
        np.testing.assert_allclose(np.asarray(w), ref_w.numpy(),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(a), ref_a.numpy(),
                                   rtol=1e-6, atol=1e-6)
        w_fixed, _, _ = render.compute_alpha_weights(
            density, bins, dirs, opaque_background=opaque)
        assert np.abs(np.asarray(w_fixed) - ref_w.numpy()).max() > 1e-4

    # Dual (NeRF-W) version shares the quirk.
    density_t = RNG.uniform(0, 5, (16, 8)).astype(np.float32)
    ref_ws, ref_wt, ref_wc = t_ray.dual_density_to_weight(
        torch.from_numpy(density), torch.from_numpy(density_t),
        torch.from_numpy(bins), torch.from_numpy(dirs),
        opaque_background=False)
    ws, wt, wc = render.compute_dual_alpha_weights(
        density, density_t, bins, dirs, cumulative_from_first=True)
    np.testing.assert_allclose(np.asarray(ws), ref_ws.numpy(),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(wt), ref_wt.numpy(),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(wc), ref_wc.numpy(),
                               rtol=1e-6, atol=1e-6)
