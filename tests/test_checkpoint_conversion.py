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


def test_convert_nerfacto_torch_checkpoint():
    """A synthesized released-layout nerfacto snapshot (tcnn grid params +
    torch Linears, the enable_tcnn_mlp=false layout every shipped config
    uses) converts into exactly our NerfactoModel param tree; grid values
    land in the right per-level tables."""
    import jax.numpy as jnp

    from nerf_hugs_tpu import models
    from nerf_hugs_tpu.models import nerfacto_import
    from nerf_hugs_tpu.ops.hashgrid import HashGridSpec
    from nerf_hugs_tpu.utils import structs
    from tests.test_backbones import nerfacto_config

    config = nerfacto_config(transient_type="nerfw")
    config.nerfacto.use_transient_embedding = True
    config.nerfacto.use_appearance_embedding = True
    model, variables = models.construct_model(
        jax.random.PRNGKey(0), structs.dummy_rays(), config)

    # Build the torch-layout state dict from our own shapes (weights
    # transposed back to torch [out, in]).
    rng = np.random.RandomState(0)
    sd = {}

    def put_mlp(prefix, tree, first_index):
        for j, name in enumerate(sorted(tree, key=lambda s: int(s[6:]))):
            k = np.asarray(tree[name]["kernel"])
            sd[f"{prefix}.{first_index + 2 * j}.weight"] = \
                rng.standard_normal(k.T.shape).astype(np.float32)
            sd[f"{prefix}.{first_index + 2 * j}.bias"] = \
                rng.standard_normal(k.shape[1]).astype(np.float32)

    p = variables["params"]
    nc = config.nerfacto
    field_spec = HashGridSpec(
        num_levels=nc.num_levels, features_per_level=nc.features_per_level,
        log2_hashmap_size=nc.log2_hashmap_size, base_res=nc.base_res,
        max_res=nc.max_res)
    grid_flat = rng.standard_normal(
        int(field_spec.level_sizes.sum()) * 2).astype(np.float16)
    sd["field.mlp_base.0.params"] = grid_flat
    put_mlp("field.mlp_base", p["field"]["mlp_base"], 1)
    put_mlp("field.mlp_head", p["field"]["mlp_head"], 0)
    put_mlp("field.mlp_transient", p["field"]["mlp_transient"], 0)
    prop_spec = nerfacto_import._proposal_spec(
        dict(nc.proposal_net_args_list[0]))
    sd["proposal_networks.0.mlp_base.0.params"] = rng.standard_normal(
        int(prop_spec.level_sizes.sum()) * 2).astype(np.float16)
    put_mlp("proposal_networks.0.mlp_base", p["proposal_0"]["mlp_base"], 1)
    sd["embedding_appearance.weight"] = rng.standard_normal(
        np.asarray(p["appearance_embedding"]["embedding"]).shape
    ).astype(np.float32)
    sd["embedding_transient.weight"] = rng.standard_normal(
        np.asarray(p["transient_embedding"]["embedding"]).shape
    ).astype(np.float32)

    converted = nerfacto_import.convert_nerfacto_state_dict(sd, config)

    want = {jax.tree_util.keystr(k): np.shape(v) for k, v in
            jax.tree_util.tree_flatten_with_path(variables)[0]}
    got = {jax.tree_util.keystr(k): np.shape(v) for k, v in
           jax.tree_util.tree_flatten_with_path(converted)[0]}
    assert set(want) == set(got), sorted(set(want) ^ set(got))[:10]
    mismatch = {k: (want[k], got[k]) for k in want if want[k] != got[k]}
    assert not mismatch, mismatch

    # Numeric: per-level tables are the exact fp32-cast slices of the tcnn
    # flat vector, and Linear weights transposed into kernels.
    sizes = field_spec.level_sizes * 2
    offs = np.concatenate([[0], np.cumsum(sizes)])
    for l in range(field_spec.num_levels):
        np.testing.assert_array_equal(
            converted["params"]["field"]["hashgrid"][f"table_{l}"],
            grid_flat[offs[l]:offs[l + 1]].astype(np.float32))
    np.testing.assert_array_equal(
        converted["params"]["field"]["mlp_base"]["Dense_0"]["kernel"],
        sd["field.mlp_base.1.weight"].T)

    # And the converted tree actually runs through the model.
    rays = jax.tree_util.tree_map(
        lambda x: jnp.reshape(x, (-1, x.shape[-1]))[:8], structs.dummy_rays())
    converted_j = jax.tree_util.tree_map(jnp.asarray, converted)
    renderings, _ = model.apply(converted_j, None, rays, train_frac=1.0,
                                compute_extras=False, zero_glo=False,
                                zero_tra=False)
    assert np.all(np.isfinite(np.asarray(renderings[-1]["rgb"])))


def test_convert_vanilla_torch_model_checkpoint():
    """Full released-layout vanilla snapshot (field.coarse/fine + nerfw
    embeddings) converts into exactly our VanillaNerfModel tree."""
    import jax.numpy as jnp
    import torch

    from nerf_hugs_tpu import models
    from nerf_hugs_tpu.models import torch_compat
    from nerf_hugs_tpu.utils import structs
    from tests.test_backbones import nerf_config
    from tests.test_torch_field_parity import torch_mlp_cls  # noqa: F401

    config = nerf_config(transient_type="nerfw")
    config.nerfacto.use_transient_embedding = True
    config.nerfacto.use_appearance_embedding = True
    model, variables = models.construct_model(
        jax.random.PRNGKey(0), structs.dummy_rays(), config)

    # Build the torch-layout sd from our shapes (transposed).
    rng = np.random.RandomState(1)
    sd = {}
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    our = {jax.tree_util.keystr(p): np.shape(v) for p, v in flat}

    def lin(key, out_d, in_d):
        sd[key + ".weight"] = rng.standard_normal(
            (out_d, in_d)).astype(np.float32)
        sd[key + ".bias"] = rng.standard_normal(out_d).astype(np.float32)

    nc = config.nerfacto
    for name in ("coarse", "fine"):
        pm = variables["params"][name]
        n_dense = len(pm)
        # torch names in PointMLP call order (torch_compat module docstring).
        order = ([f"mlp_base.0.{i}" for i in range(0, 2 * nc.net_depth, 2)]
                 [:nc.net_depth])
        # mlp_base is a ModuleList of Sequentials; tiny depth (<=skip) means
        # one sublist with Linears at even indices.
        torch_names = order + ["mlp_density", "mlp_bottleneck",
                               "mlp_head.0.0", "mlp_rgb"]
        if name == "fine" and config.transient_type == "nerfw":
            from nerf_hugs_tpu.configs.config import MLPConfig
            torch_names += [f"mlp_transient.0.{i}"
                            for i in range(
                                0, 2 * MLPConfig().net_depth_transient, 2)]
            torch_names += ["mlp_density_transient", "mlp_rgb_transient",
                            "mlp_uncertainty"]
        assert len(torch_names) == n_dense, (len(torch_names), n_dense)
        for j, tn in enumerate(torch_names):
            shape = our[f"['{name}']['Dense_{j}']['kernel']"]
            lin(f"field.{name}.{tn}", shape[1], shape[0])
    for ours_key, theirs in [("appearance_embedding",
                              "embedding_appearance"),
                             ("transient_embedding", "embedding_transient")]:
        shape = np.shape(variables["params"][ours_key]["embedding"])
        sd[f"{theirs}.weight"] = rng.standard_normal(shape).astype(np.float32)

    converted = torch_compat.convert_nerf_model_state_dict(sd, config)
    got = {jax.tree_util.keystr(p): np.shape(v) for p, v in
           jax.tree_util.tree_flatten_with_path(converted["params"])[0]}
    assert set(our) == set(got), sorted(set(our) ^ set(got))[:10]
    mismatch = {k: (our[k], got[k]) for k in our if our[k] != got[k]}
    assert not mismatch, mismatch
