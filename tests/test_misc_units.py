"""Unit tests for small helpers not covered via the driver paths."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_hugs_tpu.parallel import mesh as mesh_lib
from nerf_hugs_tpu.utils import vis as nh_vis


def test_pad_to_multiple():
    tree = {"a": jnp.arange(10.0)[:, None], "b": jnp.ones((10, 3))}
    padded, pad = mesh_lib.pad_to_multiple(tree, 8)
    assert pad == 6
    assert padded["a"].shape[0] == 16
    # Edge padding repeats the last row.
    np.testing.assert_allclose(np.asarray(padded["a"])[-1, 0], 9.0)
    same, pad0 = mesh_lib.pad_to_multiple(tree, 5)
    assert pad0 == 0


def test_sinebow_range():
    h = jnp.linspace(0, 1, 32)
    rgb = nh_vis.sinebow(h)
    assert rgb.shape == (32, 3)
    assert float(rgb.min()) >= 0 and float(rgb.max()) <= 1


def test_matte_checkerboard():
    acc = jnp.zeros((16, 16))
    vis = jnp.zeros((16, 16, 3))
    out = np.asarray(nh_vis.matte(vis, acc))
    # Pure background: checker values 0.8 / 1.0.
    vals = sorted(np.unique(np.round(out, 4)))
    np.testing.assert_allclose(vals, [0.8, 1.0], atol=1e-4)


def test_visualize_cmap_shapes():
    rng = np.random.RandomState(0)
    val = jnp.asarray(rng.rand(12, 16), jnp.float32)
    acc = jnp.ones((12, 16))
    import matplotlib
    out = nh_vis.visualize_cmap(val, acc, matplotlib.colormaps["turbo"])
    assert out.shape == (12, 16, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_weighted_percentile_vis():
    x = jnp.linspace(0, 1, 100)
    w = jnp.ones(100)
    p = nh_vis.weighted_percentile(x, w, [50])
    np.testing.assert_allclose(float(p[0]), 0.5, atol=0.02)


def test_prefetch_to_device_order_and_sharding():
    """prefetch_to_device yields every batch exactly once, in order, with
    the same ('data',) sharding shard_batch would give; size=0 (the
    NERF_HUGS_PREFETCH=0 A/B path) degrades to synchronous sharding."""
    mesh = mesh_lib.make_mesh()
    n_dev = len(mesh.devices.reshape(-1))
    batches = [{"x": np.full((2 * n_dev, 3), i, np.float32)}
               for i in range(7)]

    for size in (2, 0):
        out = list(mesh_lib.prefetch_to_device(iter(batches), mesh,
                                               size=size))
        assert len(out) == len(batches)
        for i, b in enumerate(out):
            np.testing.assert_array_equal(np.asarray(b["x"]),
                                          batches[i]["x"])
            assert b["x"].sharding == mesh_lib.data_sharding(mesh)


def test_prefetch_to_device_env_toggle(monkeypatch):
    monkeypatch.setenv("NERF_HUGS_PREFETCH", "0")
    mesh = mesh_lib.make_mesh()
    n_dev = len(mesh.devices.reshape(-1))
    batches = [{"x": np.zeros((n_dev, 2), np.float32)}] * 3
    out = list(mesh_lib.prefetch_to_device(iter(batches), mesh, size=2))
    assert len(out) == 3


def test_recorder_logfile(tmp_path):
    """Recorder prints AND appends to run_log.log (record_utils.py:5-23
    parity); enable_file=False (non-zero hosts) writes nothing."""
    from nerf_hugs_tpu.utils.record import Recorder
    rec = Recorder(str(tmp_path))
    rec.print("hello world")
    rec.print("line two")
    rec.close()
    log = (tmp_path / "run_log.log").read_text()
    assert "hello world" in log and "line two" in log
    assert " - INFO # " in log  # reference's formatter layout

    rec2 = Recorder(str(tmp_path / "sub"), enable_file=False)
    rec2.print("not logged")
    rec2.close()
    assert not (tmp_path / "sub" / "run_log.log").exists()


def test_fwd_descriptor_floor_counts(monkeypatch):
    """bench's cost-model floor: closed-form descriptor count on the shipped
    base config, unpaired; paired mode subtracts exactly half the dense
    levels' corners (docs/tpu_gather_cost_model.md)."""
    from tools.bench_nerfacto import fwd_descriptor_floor
    from nerf_hugs_tpu.configs.yaml_loader import load_yaml_config
    from nerf_hugs_tpu.ops import hashgrid as hg

    config = load_yaml_config("configs/nerfacto/kubric_nerfacto_base.yml")
    nc = config.nerfacto

    def spec_of(args):
        return hg.HashGridSpec(
            num_levels=args.get("num_levels", 8),
            features_per_level=args.get("features_per_level", 2),
            log2_hashmap_size=args.get("log2_hashmap_size", 18),
            base_res=args.get("base_res", 16),
            max_res=args.get("max_res", 1024))

    field = hg.HashGridSpec(
        num_levels=nc.num_levels, features_per_level=nc.features_per_level,
        log2_hashmap_size=nc.log2_hashmap_size, base_res=nc.base_res,
        max_res=nc.max_res)
    prop = spec_of(dict(nc.proposal_net_args_list[0]))
    assert nc.num_proposal_iterations == 1  # shipped base shape

    monkeypatch.setenv("NERF_HUGS_PAIR_DENSE", "0")
    n_unpaired, t_fast, t_slow = fwd_descriptor_floor(config)
    # Unpaired: 8 corners x every level x every sample.
    samples_field = config.batch_size * nc.num_nerf_samples_per_ray
    samples_prop = config.batch_size * nc.num_proposal_samples_per_ray[0]
    expect = 8 * (samples_field * field.num_levels
                  + samples_prop * prop.num_levels)
    assert n_unpaired == expect
    assert t_fast == n_unpaired / 215e6 and t_slow == n_unpaired / 165e6

    # Pair-only closed form (quad/oct tiers pinned off).
    monkeypatch.setenv("NERF_HUGS_PAIR_DENSE", "1")
    monkeypatch.setenv("NERF_HUGS_QUAD_DENSE_MIN_ROWS", "0")
    monkeypatch.setenv("NERF_HUGS_OCT_DENSE_MIN_ROWS", "0")
    n_paired, _, _ = fwd_descriptor_floor(config)
    dense_saved = 4 * (samples_field * int(field.dense_level().sum())
                       + samples_prop * int(prop.dense_level().sum()))
    assert dense_saved > 0
    assert n_paired == n_unpaired - dense_saved

    # Quad tier at a pinned threshold: packable levels >= the gate save 6
    # of 8 corners, the remaining dense levels save 4 (pair).
    gate = 1 << 20
    monkeypatch.setenv("NERF_HUGS_QUAD_DENSE_MIN_ROWS", str(gate))
    n_quad, _, _ = fwd_descriptor_floor(config)

    def saved(spec, samples):
        out = 0
        for lvl in range(spec.num_levels):
            if spec.pack_strides(lvl) is None:
                continue
            rows = int(spec.level_sizes[lvl])
            out += samples * (6 if rows >= gate else 4)
        return out

    assert n_quad == n_unpaired - saved(field, samples_field) \
        - saved(prop, samples_prop)
    assert n_quad < n_paired  # base has at least one quad-tier dense level


def test_eval_polling_done_matrix():
    """eval.polling_done mirrors train.py's stop step and waits for the
    LAST finetune checkpoint (not the first, like the reference)."""
    from eval import polling_done
    from nerf_hugs_tpu.configs.config import Config

    c = Config(max_steps=100, early_exit_steps=None)
    assert not polling_done(c, False, 99)
    assert polling_done(c, False, 100)
    # early_exit_steps below max_steps stops there...
    c = Config(max_steps=100, early_exit_steps=40)
    assert polling_done(c, False, 40)
    assert not polling_done(c, False, 39)
    # ...but an OVERSIZED early_exit_steps must not poll past the last
    # checkpoint train.py actually writes (min(max_steps, early_exit)).
    c = Config(max_steps=100, early_exit_steps=10_000)
    assert polling_done(c, False, 100)
    # Finetune: only a finetune checkpoint at finetune_max_steps ends it.
    c = Config(max_steps=100, finetune_enable=True, finetune_max_steps=50)
    assert not polling_done(c, False, 100)
    assert not polling_done(c, True, 49)
    assert polling_done(c, True, 50)


def test_model_compat_guard(tmp_path):
    """hash_impl='xor' vs 'add' changes the model function but not the
    param tree, so a cross-mode restore loads cleanly and renders noise —
    the sidecar guard must refuse it loudly (checkpoints.py)."""
    import dataclasses

    import pytest

    from nerf_hugs_tpu.configs.config import Config
    from nerf_hugs_tpu.train import checkpoints

    d = str(tmp_path / "ckpt")
    xor_cfg = Config(model_type="nerfacto")
    add_cfg = dataclasses.replace(
        xor_cfg, nerfacto=dataclasses.replace(
            xor_cfg.nerfacto, hash_impl="add"))

    # No sidecar yet: check is a no-op (pre-guard checkpoints still load).
    checkpoints.check_model_compat(d, add_cfg)

    checkpoints.record_model_compat(d, xor_cfg)
    checkpoints.check_model_compat(d, xor_cfg)            # same mode: ok
    with pytest.raises(ValueError, match="hash_impl"):
        checkpoints.check_model_compat(d, add_cfg)        # switch: refused

    # record never overwrites an existing sidecar (resume with a switched
    # config must not self-bless).
    checkpoints.record_model_compat(d, add_cfg)
    with pytest.raises(ValueError, match="hash_impl"):
        checkpoints.check_model_compat(d, add_cfg)

    # Non-hashgrid model types carry no sidecar at all.
    d2 = str(tmp_path / "ckpt2")
    checkpoints.record_model_compat(d2, Config(model_type="mipnerf360"))
    import os
    assert not os.path.exists(os.path.join(d2, "model_compat.json"))
