"""Golden-freeze of the SAM / LPIPS weight-conversion semantics.

The real sam_vit_h + LPIPS AlexNet weights are blocked assets
(ASSETS_REQUEST.md). These tests freeze everything EXCEPT the weight
values: the official key schema at full ViT-H scale, strict full-key
consumption, and pinned numeric outputs of converted deterministic
weights (a wrong transpose/axis order in the converter changes the
goldens). When the assets arrive, the only untested variable is the
numbers in the file. Reference surfaces:
HuGS/generate_static_mask.py:190-202 (official .pth load),
metrics.py:30-34 (LPIPS-alex metric).
"""

import os
import sys
import tempfile

import jax
import numpy as np
import pytest

from tests.sam_official_schema import make_official_sam_state_dict


@pytest.mark.slow
def test_sam_vit_h_official_schema_converts_at_full_scale():
    """Exact sam_vit_h.pth schema (embed 1280, depth 32, heads 16, global
    attn at 7/15/23/31, 64x64 grid) converts into exactly the flax vit_h
    structure. Shapes via jax.eval_shape — no 2.4 GB param init."""
    import jax.numpy as jnp

    from nerf_hugs_tpu.hugs.sam import modeling, weights

    config = modeling.make_sam_config("vit_h")
    sd = make_official_sam_state_dict(config)  # zeros: pages stay untouched
    converted = weights.convert_state_dict(sd, config)

    sam = modeling.Sam(config)
    want = jax.eval_shape(
        sam.init, jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, config.image_size, config.image_size, 3),
                             jnp.float32),
        jax.ShapeDtypeStruct((1, 1, 2), jnp.float32),
        jax.ShapeDtypeStruct((1, 1), jnp.float32))
    want_shapes = {
        jax.tree_util.keystr(k): v.shape
        for k, v in jax.tree_util.tree_flatten_with_path(want)[0]}
    got_shapes = {
        jax.tree_util.keystr(k): np.shape(v)
        for k, v in jax.tree_util.tree_flatten_with_path(converted)[0]}
    assert set(want_shapes) == set(got_shapes), (
        sorted(set(want_shapes) ^ set(got_shapes))[:10])
    mismatched = {k: (want_shapes[k], got_shapes[k]) for k in want_shapes
                  if want_shapes[k] != got_shapes[k]}
    assert not mismatched, f"vit_h shape mismatches: {mismatched}"


def test_sam_conversion_numeric_goldens():
    """Converted deterministic official-layout weights produce pinned
    predictor outputs (vit_t). Any change to a transpose, axis order, or
    layer wiring in weights.convert_state_dict moves these numbers."""
    import jax.numpy as jnp

    from nerf_hugs_tpu.hugs.sam import modeling, weights

    config = modeling.make_sam_config("vit_t", image_size=64, window_size=2)
    sam = modeling.Sam(config)
    sd = make_official_sam_state_dict(config, fill="random", seed=7)
    variables = weights.convert_state_dict(sd, config)

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32) * 255.0)
    pts = jnp.asarray([[[20.0, 36.0]]])
    labels = jnp.ones((1, 1))
    masks, iou = sam.apply(variables, x, pts, labels)

    assert masks.shape == (1, 3, 16, 16)
    np.testing.assert_allclose(float(jnp.mean(masks)), -0.004201, atol=2e-5)
    np.testing.assert_allclose(float(jnp.std(masks)), 0.016209, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(iou).ravel(), [-0.02247, 0.083729, -0.046454], atol=2e-5)


def test_lpips_conversion_numeric_golden():
    """Converted deterministic LPIPS-alex weights produce a pinned distance
    on fixed images, and zero self-distance."""
    import torch

    from nerf_hugs_tpu.metrics import lpips

    rng = np.random.RandomState(11)
    sd = {}
    in_ch = 3
    convs = [(64, 11), (192, 5), (384, 3), (256, 3), (256, 3)]
    for i, (out_ch, k) in enumerate(convs):
        sd[f"net.slice{i + 1}.{i * 2}.weight"] = torch.tensor(
            rng.standard_normal((out_ch, in_ch, k, k)).astype(np.float32)
            * 0.05)
        sd[f"net.slice{i + 1}.{i * 2}.bias"] = torch.tensor(
            rng.standard_normal((out_ch,)).astype(np.float32) * 0.05)
        sd[f"lin{i}.model.1.weight"] = torch.tensor(
            np.abs(rng.standard_normal((1, out_ch, 1, 1))).astype(np.float32))
        in_ch = out_ch
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "lpips.pth")
        torch.save(sd, path)
        params = lpips.convert_torch_state_dict(path)
    model = lpips.LPIPS(params)

    img0 = rng.rand(64, 64, 3).astype(np.float32)
    img1 = np.clip(img0 + rng.randn(64, 64, 3).astype(np.float32) * 0.1, 0, 1)
    np.testing.assert_allclose(float(model(img0, img0)), 0.0, atol=1e-7)
    np.testing.assert_allclose(float(model(img0, img1)), 0.13114372,
                               atol=2e-5)
