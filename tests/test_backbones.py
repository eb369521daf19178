"""E2E training smoke for the nerfacto and vanilla-NeRF backbones on the
8-device mesh (same harness as the mipnerf360 e2e test)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_hugs_tpu.configs.config import Config
from nerf_hugs_tpu.data import load_dataset
from nerf_hugs_tpu.parallel import mesh as mesh_lib
from nerf_hugs_tpu.train import step as train_step_lib


@pytest.fixture(scope="module")
def mesh():
    return mesh_lib.make_mesh()


def nerfacto_config(**kw):
    config = Config(
        dataset_loader="synthetic", model_type="nerfacto", batch_size=512,
        image_num_per_batch=4, near=0.5, far=6.0, max_steps=100,
        lr_init=1e-2, lr_final=1e-3, lr_delay_steps=10,
        grad_max_norm=0.0, grad_max_val=0.0, data_loss_type="mse",
        enable_amp=False, bound=4.0, enable_scene_contraction=False,
        train_background_color="white", test_background_color="white",
        interlevel_loss_mult=1.0, distortion_loss_mult=0.0,
        render_chunk_size=512)
    config.nerfacto.num_proposal_iterations = 1
    config.nerfacto.num_proposal_samples_per_ray = (24,)
    config.nerfacto.num_nerf_samples_per_ray = 12
    config.nerfacto.log2_hashmap_size = 14
    config.nerfacto.max_res = 128
    config.nerfacto.num_levels = 8
    config.nerfacto.hidden_dim = 32
    config.nerfacto.hidden_dim_color = 32
    config.nerfacto.proposal_net_args_list = (
        {"base_res": 16, "hidden_dim": 16, "log2_hashmap_size": 13,
         "features_per_level": 2, "num_levels": 5, "max_res": 64},)
    for k, v in kw.items():
        setattr(config, k, v)
    return config


def nerf_config(**kw):
    config = Config(
        dataset_loader="synthetic", model_type="nerf", batch_size=512,
        image_num_per_batch=4, near=0.5, far=6.0, max_steps=100,
        lr_init=2e-3, lr_final=2e-4, lr_delay_steps=10,
        grad_max_norm=0.0, grad_max_val=0.0, data_loss_type="mse",
        enable_amp=False, enable_scene_contraction=False,
        train_background_color="white", test_background_color="white",
        interlevel_loss_mult=0.0, distortion_loss_mult=0.0,
        data_coarse_loss_mult=0.1, render_chunk_size=512)
    config.nerfacto.net_depth = 3
    config.nerfacto.net_width = 64
    config.nerfacto.num_coarse_nerf_samples_per_ray = 16
    config.nerfacto.num_fine_nerf_samples_per_ray = 16
    config.nerfacto.max_deg_point = 8
    config.nerfacto.proposal_initial_sampler = "uniform"
    for k, v in kw.items():
        setattr(config, k, v)
    return config


def run_steps(config, mesh, num_steps):
    dataset = load_dataset("train", "", config)
    model, state, render_fn, train_step, _ = train_step_lib.setup_model(
        config, jax.random.PRNGKey(0), mesh)
    state = mesh_lib.replicate(state, mesh)
    thresholds = jnp.ones(8)
    rngs = jax.random.PRNGKey(1)
    psnrs = []
    for step, batch in zip(range(num_steps), dataset):
        batch = mesh_lib.shard_batch(batch, mesh)
        state, stats, rngs = train_step(
            rngs, state, batch, jnp.asarray(step / config.max_steps),
            thresholds)
        psnrs.append(float(stats["psnr"]))
    return psnrs


def test_nerfacto_trains(mesh):
    psnrs = run_steps(nerfacto_config(), mesh, 60)
    assert np.isfinite(psnrs).all()
    assert np.mean(psnrs[-10:]) > np.mean(psnrs[:5]) + 2, (
        f"nerfacto PSNR flat: {np.mean(psnrs[:5]):.2f} -> "
        f"{np.mean(psnrs[-10:]):.2f}")


def test_nerfacto_add_hash_trains(mesh):
    # The TPU-native additive hash (NerfactoConfig.hash_impl='add',
    # packable hashed levels) must train end-to-end like the tcnn xor hash:
    # the knob threads through the field AND the proposal nets
    # (models/nerfacto.py spec construction + proposal-args setdefault).
    config = nerfacto_config()
    config.nerfacto.hash_impl = "add"
    psnrs = run_steps(config, mesh, 60)
    assert np.isfinite(psnrs).all()
    assert np.mean(psnrs[-10:]) > np.mean(psnrs[:5]) + 2, (
        f"add-hash nerfacto PSNR flat: {np.mean(psnrs[:5]):.2f} -> "
        f"{np.mean(psnrs[-10:]):.2f}")


def test_appearance_embed_with_zero_eval_embedding_trains(mesh):
    # Regression: construct_model inits with rng=None (deterministic), so
    # eval_embedding='zero' used to skip the embedding-table read during the
    # init trace — the param was never created and the FIRST training step
    # died with ScopeParamNotFoundError (every shipped distractor_nerfacto_*
    # yaml hits this: use_appearance_embedding + eval_embedding 'zero').
    config = nerfacto_config()
    config.nerfacto.use_appearance_embedding = True
    config.nerfacto.eval_embedding = "zero"
    psnrs = run_steps(config, mesh, 2)
    assert np.isfinite(psnrs).all()

    config = nerf_config()
    config.nerfacto.use_appearance_embedding = True
    config.nerfacto.eval_embedding = "zero"
    psnrs = run_steps(config, mesh, 2)
    assert np.isfinite(psnrs).all()


def test_vanilla_nerf_trains(mesh):
    psnrs = run_steps(nerf_config(), mesh, 60)
    assert np.isfinite(psnrs).all()
    assert np.mean(psnrs[-10:]) > np.mean(psnrs[:5]) + 2, (
        f"nerf PSNR flat: {np.mean(psnrs[:5]):.2f} -> "
        f"{np.mean(psnrs[-10:]):.2f}")


@pytest.mark.slow
def test_nerfacto_nerfw_smoke(mesh):
    config = nerfacto_config(transient_type="nerfw")
    config.nerfacto.use_transient_embedding = True
    config.nerfacto.use_appearance_embedding = True
    psnrs = run_steps(config, mesh, 4)
    assert np.isfinite(psnrs).all()


@pytest.mark.slow
def test_nerfacto_hanerf_smoke(mesh):
    config = nerfacto_config(transient_type="hanerf")
    config.nerfacto.use_transient_embedding = True
    psnrs = run_steps(config, mesh, 4)
    assert np.isfinite(psnrs).all()


def test_nerfacto_finetune_params_selects_groups(mesh):
    """config.finetune_params picks the reference's param groups
    (nerfacto/train.py:136): a phototourism-style nerfw finetune with
    finetune_params=[appearance_embedding] must update the appearance
    embedding and freeze everything else — including transient_embedding."""
    config = nerfacto_config(transient_type="nerfw",
                             finetune_params=("appearance_embedding",))
    config.nerfacto.use_transient_embedding = True
    config.nerfacto.use_appearance_embedding = True
    dataset = load_dataset("train", "", config)
    model, state, _, _, _ = train_step_lib.setup_model(
        config, jax.random.PRNGKey(0), mesh)
    ft_state, ft_step, _ = train_step_lib.setup_finetune_model(
        config, model, state, mesh)
    ft_state = mesh_lib.replicate(ft_state, mesh)
    before = jax.device_get(ft_state.params)
    batch = mesh_lib.shard_batch(next(dataset), mesh)
    ft_state, _, _ = ft_step(jax.random.PRNGKey(3), ft_state, batch,
                             jnp.asarray(0.5), jnp.ones(8))
    after = jax.device_get(ft_state.params)

    flat_b = dict(jax.tree_util.tree_flatten_with_path(before)[0])
    flat_a = dict(jax.tree_util.tree_flatten_with_path(after)[0])
    changed, frozen_violations = [], []
    for path in flat_b:
        name = jax.tree_util.keystr(path)
        if np.allclose(flat_b[path], flat_a[path]):
            continue
        (changed if "appearance_embedding" in name
         else frozen_violations).append(name)
    assert changed, "appearance_embedding was not updated"
    assert not frozen_violations, (
        f"params outside finetune_params changed: {frozen_violations}")


def test_vanilla_nerf_nerfw_smoke(mesh):
    config = nerf_config(transient_type="nerfw")
    config.nerfacto.use_transient_embedding = True
    config.nerfacto.use_appearance_embedding = True
    psnrs = run_steps(config, mesh, 3)
    assert np.isfinite(psnrs).all()


def test_vanilla_nerf_hanerf_smoke(mesh):
    config = nerf_config(transient_type="hanerf")
    config.nerfacto.use_transient_embedding = True
    psnrs = run_steps(config, mesh, 3)
    assert np.isfinite(psnrs).all()


@pytest.mark.slow
def test_nerfacto_robustnerf_smoke(mesh):
    config = nerfacto_config(transient_type="robustnerf", patch_size=8,
                             robustnerf_inner_patch_size=4)
    psnrs = run_steps(config, mesh, 3)
    assert np.isfinite(psnrs).all()


@pytest.mark.slow
def test_nerfacto_withmask_smoke(mesh):
    config = nerfacto_config(transient_type="withmask",
                             withmask_transient_weight=0.1)
    psnrs = run_steps(config, mesh, 3)
    assert np.isfinite(psnrs).all()


def test_nerfacto_proposal_grads_gated_by_update_schedule(mesh):
    """The proposal-net backward runs only on update steps (the reference's
    set_grad_enabled gating, nerfacto.py:292-303): after one train step at a
    non-update step, the proposal hash tables must be bit-identical (zero
    grads through the lax.cond); at an update step they must move. The final
    field trains on every step."""
    config = nerfacto_config(max_steps=25000)
    dataset = load_dataset("train", "", config)
    batch = mesh_lib.shard_batch(next(iter(dataset)), mesh)
    thresholds = jnp.ones(8)

    def tables(state, prefix):
        params = jax.device_get(state.params["params"])
        sub = params[prefix]["hashgrid"]
        return {k: np.asarray(v) for k, v in sub.items()}

    def one_step(step_idx):
        _, state, _, train_step, _ = train_step_lib.setup_model(
            config, jax.random.PRNGKey(0), mesh)
        state = mesh_lib.replicate(state, mesh)
        before_prop = tables(state, "proposal_0")
        before_field = tables(state, "field")
        state, _, _ = train_step(
            jax.random.PRNGKey(1), state, batch,
            jnp.asarray(step_idx / config.max_steps), thresholds)
        return (before_prop, tables(state, "proposal_0"),
                before_field, tables(state, "field"))

    # step 12500: interval = proposal_update_every = 5, 12500 % 5 == 0.
    bp, ap, bf, af = one_step(12500)
    assert any(not np.array_equal(bp[k], ap[k]) for k in bp), (
        "proposal tables did not move on an update step")
    assert any(not np.array_equal(bf[k], af[k]) for k in bf)

    # step 12501: 12501 % 5 != 0 -> proposal grads skipped entirely.
    bp, ap, bf, af = one_step(12501)
    assert all(np.array_equal(bp[k], ap[k]) for k in bp), (
        "proposal tables moved on a non-update step")
    assert any(not np.array_equal(bf[k], af[k]) for k in bf)


def test_finetune_partitions_field_group_and_bad_key():
    """ADVICE r3: vanilla NeRF's reference group 'field' covers
    field.coarse/field.fine (nerf.py:228-231) — here the top-level modules
    'coarse'/'fine'; an unknown group must raise (the reference KeyErrors
    on params_dict[key], nerfacto/train.py:161)."""
    variables = {"params": {
        "coarse": {"Dense_0": {"kernel": np.zeros((2, 2))}},
        "fine": {"Dense_0": {"kernel": np.zeros((2, 2))}},
        "appearance_embedding": {"embedding": np.zeros((4, 2))},
    }}
    config = Config(model_type="nerf", finetune_params=("field",))
    labels = train_step_lib.finetune_partitions(config, variables)
    flat = {jax.tree_util.keystr(p): v for p, v in
            jax.tree_util.tree_flatten_with_path(labels)[0]}
    assert all(v == "trainable" for k, v in flat.items()
               if "coarse" in k or "fine" in k)
    assert all(v == "frozen" for k, v in flat.items()
               if "appearance_embedding" in k)

    config_bad = Config(model_type="nerf", finetune_params=("fields",))
    with pytest.raises(ValueError, match="match no parameters"):
        train_step_lib.finetune_partitions(config_bad, variables)

    # nerfacto keeps 'field' as the literal module name.
    config_facto = Config(model_type="nerfacto",
                          finetune_params=("field", "proposal"))
    vars_facto = {"params": {
        "field": {"Dense_0": {"kernel": np.zeros((2, 2))}},
        "proposal_0": {"Dense_0": {"kernel": np.zeros((2, 2))}},
        "transient_embedding": {"embedding": np.zeros((4, 2))},
    }}
    labels2 = train_step_lib.finetune_partitions(config_facto, vars_facto)
    flat2 = {jax.tree_util.keystr(p): v for p, v in
             jax.tree_util.tree_flatten_with_path(labels2)[0]}
    assert all(v == "trainable" for k, v in flat2.items()
               if "field" in k or "proposal" in k)
    assert all(v == "frozen" for k, v in flat2.items()
               if "transient_embedding" in k)
