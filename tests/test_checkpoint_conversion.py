"""Round-trip: a reference-format flax checkpoint converts into our orbax
layout and renders through eval-style restore."""

import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

REF_PATH = "/root/reference/MipNeRF360"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_PATH, "internal")),
    reason="reference checkout unavailable")


@pytest.mark.slow
def test_convert_reference_checkpoint(tmp_path):
    from flax.training import checkpoints as flax_checkpoints
    from tests.test_reference_model_parity import build_pair, make_rays

    # Build the reference model + weights via the stubbed import path.
    import tests.test_reference_model_parity as parity
    ref_models_mod = None
    import contextlib, types
    gin = types.ModuleType("gin")
    gin.configurable = lambda *a, **k: (
        a[0] if a and callable(a[0]) else (lambda f: f))
    gin.add_config_file_search_path = lambda *a, **k: None
    gin.config_scope = lambda *a, **k: contextlib.nullcontext()

    class _C:
        @staticmethod
        def external_configurable(*a, **k):
            return a[0] if a else None
    gin.config = _C()
    sys.modules.setdefault("gin", gin)
    dm_pix = types.ModuleType("dm_pix")
    dm_pix.ssim = lambda *a, **k: 0.0
    sys.modules.setdefault("dm_pix", dm_pix)
    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    from internal import models as ref_models
    from internal import utils as ref_utils
    ref_models_mod = (ref_models, ref_utils)

    ref_model, my_model = build_pair(ref_models_mod)
    rays = make_rays()
    ref_rays = ref_utils.Rays(
        **{f: getattr(rays, f) for f in rays.__dataclass_fields__})
    ref_vars = jax.jit(lambda: ref_model.init(
        jax.random.PRNGKey(3), rng=None, rays=ref_rays, train_frac=1.0,
        compute_extras=False, zero_glo=True, zero_tra=True))()

    # Save in the reference's flax format (what released checkpoints use).
    ref_ckpt_dir = tmp_path / "ref_ckpt"
    fake_state = {"params": jax.device_get(ref_vars), "step": 12345,
                  "opt_state": {}}
    flax_checkpoints.save_checkpoint(str(ref_ckpt_dir), fake_state,
                                     step=12345, keep=1)

    # Convert.
    from tools import convert_reference_checkpoint as conv
    out_dir = tmp_path / "converted"
    conv.main([
        "--reference_checkpoint", str(ref_ckpt_dir / "checkpoint_12345"),
        "--gin_bindings", "Config.near = 0.5",
        "--gin_bindings", "Config.far = 6.0",
        "--gin_bindings", "Model.num_prop_samples = 8",
        "--gin_bindings", "Model.num_nerf_samples = 4",
        "--gin_bindings", "PropMLP.net_depth = 8",
        "--gin_bindings", "PropMLP.disable_rgb = False",
        "--output_dir", str(out_dir),
    ])
    assert (out_dir / "checkpoint_12345").exists()

    # Restore through the eval path and check outputs match the reference.
    from nerf_hugs_tpu.configs import gin_parser
    from nerf_hugs_tpu.parallel import mesh as mesh_lib
    from nerf_hugs_tpu.train import checkpoints as nh_checkpoints
    from nerf_hugs_tpu.train import step as train_step_lib

    config = gin_parser.parse_gin_configs([], [
        "Config.near = 0.5", "Config.far = 6.0",
        "Model.num_prop_samples = 8", "Model.num_nerf_samples = 4",
        "PropMLP.net_depth = 8", "PropMLP.disable_rgb = False"])
    mesh = mesh_lib.make_mesh()
    model, state, _, _, _ = train_step_lib.setup_model(
        config, jax.random.PRNGKey(0), mesh)
    state = nh_checkpoints.restore_params(str(out_dir), state)
    assert int(state.step) == 12345

    out_ref, _ = ref_model.apply(ref_vars, None, ref_rays, train_frac=1.0,
                                 compute_extras=False, zero_glo=True,
                                 zero_tra=True)
    out_me, _ = model.apply(state.params, None, rays, train_frac=1.0,
                            compute_extras=False, zero_glo=True,
                            zero_tra=True)
    np.testing.assert_allclose(np.asarray(out_me[-1]["rgb"]),
                               np.asarray(out_ref[-1]["rgb"]), atol=2e-3)
