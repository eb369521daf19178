"""Benchmark the nerfacto train step on real TPU hardware.

Measures full jitted train steps (fwd + bwd + optimizer) at two shapes:
  * base  — configs/nerfacto/kubric_nerfacto_base.yml (the reference's
    shipped shape: batch 16384, 256+128 samples, 16 levels, 2^21 table;
    /root/reference/nerfacto/configs/kubric_nerfacto_base.yml)
  * tpu   — configs/nerfacto/kubric_nerfacto_tpu.yml (the TPU-tuned shape)

Prints one JSON line per shape. bench.py embeds the base number in its
"extra" section for BENCH_r{N}.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _example_rays(batch_size: int):
    from nerf_hugs_tpu.utils import structs
    rng = np.random.RandomState(0)
    dirs = rng.randn(batch_size, 3).astype(np.float32)
    vd = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    return structs.Rays(
        pix_coords=rng.rand(batch_size, 2).astype(np.float32),
        origins=0.1 * rng.randn(batch_size, 3).astype(np.float32),
        directions=dirs,
        viewdirs=vd.astype(np.float32),
        radii=np.full((batch_size, 1), 0.001, np.float32),
        lossmult=np.ones((batch_size, 1), np.float32),
        static_mask=np.ones((batch_size, 1), np.float32),
        near=np.full((batch_size, 1), 0.2, np.float32),
        far=np.full((batch_size, 1), 2.0, np.float32),
        embed_idx=np.zeros((batch_size, 1), np.int32),
        cam_idx=np.zeros((batch_size, 1), np.int32))


def fwd_descriptor_floor(config):
    """Cost-model forward floor for one train step of a nerfacto config.

    Counts the hash-grid gather DMA descriptors the step must issue (the
    measured v5e bottleneck, docs/tpu_gather_cost_model.md): 2^d per sample
    per level, halved on dense levels when the paired-corner fetch is on.
    Returns (descriptors, floor_seconds_at_215M, floor_seconds_at_165M) —
    the two ends of the measured per-level-table gather ceiling.
    """
    from nerf_hugs_tpu.ops import hashgrid as hg

    nc = config.nerfacto

    def per_sample(spec):
        # 2^(d-k) descriptors per sample per level, where k is the
        # size-gated packing tier (0 none, 1 pair, 2 quad, 3 oct —
        # hashgrid._dense_pack_dims reads the same env gates the encode
        # path uses, so the floor tracks the active configuration).
        # Packability covers dense levels and hashed levels under
        # hash_impl='add' (spec.pack_strides).
        full = 2 ** spec.num_dims
        total = 0
        for l in range(spec.num_levels):
            k = (hg._dense_pack_dims(int(spec.level_sizes[l]), spec.num_dims)
                 if spec.pack_strides(l) is not None else 0)
            total += full >> k
        return total

    hash_impl = getattr(nc, "hash_impl", "xor")
    field_spec = hg.HashGridSpec(
        num_levels=nc.num_levels, features_per_level=nc.features_per_level,
        log2_hashmap_size=nc.log2_hashmap_size, base_res=nc.base_res,
        max_res=nc.max_res, hash_impl=hash_impl)
    n = config.batch_size
    descriptors = n * nc.num_nerf_samples_per_ray * per_sample(field_spec)
    # One proposal field per ITERATION, reusing the last args entry when the
    # list is shorter (and the single shared entry under
    # use_same_proposal_network) — exactly how the model instantiates them
    # (models/nerfacto.py:254-273); iterating the args list alone would
    # undercount gathers whenever iterations > len(list).
    for i in range(nc.num_proposal_iterations):
        args = dict(nc.proposal_net_args_list[
            min(i, len(nc.proposal_net_args_list) - 1)])
        spec = hg.HashGridSpec(
            num_levels=args.get("num_levels", 8),
            features_per_level=args.get("features_per_level", 2),
            log2_hashmap_size=args.get("log2_hashmap_size", 18),
            base_res=args.get("base_res", 16),
            max_res=args.get("max_res", 1024),
            hash_impl=args.get("hash_impl", hash_impl))
        n_samp = nc.num_proposal_samples_per_ray[
            min(i, len(nc.num_proposal_samples_per_ray) - 1)]
        descriptors += n * n_samp * per_sample(spec)
    return descriptors, descriptors / 215e6, descriptors / 165e6


def bench_config(path, steps=10, warmup=2, hash_impl=None):
    # Defaults span TWO full proposal_update_every=5 cycles (steps base+2..
    # base+11 contain exactly 2 update steps for every shipped config, whose
    # max_steps//2 is a multiple of 5) — a window that is not a multiple of
    # 5 would under/over-weight the cond's expensive update branch.
    from nerf_hugs_tpu.configs.yaml_loader import load_yaml_config
    from nerf_hugs_tpu.parallel import mesh as mesh_lib
    from nerf_hugs_tpu.train import step as train_step_lib
    from nerf_hugs_tpu.utils import structs

    config = load_yaml_config(path)
    if hash_impl is not None:
        # A/B override: swap every hash grid's index combine (field +
        # proposal nets; see HashGridSpec.hash_impl). Changes the model
        # function, so only meaningful for step-time benches from fresh
        # params — never for restoring checkpoints.
        import dataclasses
        config = dataclasses.replace(
            config, nerfacto=dataclasses.replace(
                config.nerfacto, hash_impl=hash_impl,
                proposal_net_args_list=tuple(
                    {**dict(a), "hash_impl": hash_impl}
                    for a in config.nerfacto.proposal_net_args_list)))
    mesh = mesh_lib.make_mesh(jax.devices())
    model, state, _, train_step, _ = train_step_lib.setup_model(
        config, jax.random.PRNGKey(0), mesh)
    state = mesh_lib.replicate(state, mesh)

    batch_size = config.batch_size
    rays = _example_rays(batch_size)
    rgb = np.random.RandomState(1).rand(batch_size, 3).astype(np.float32)
    batch = mesh_lib.shard_batch(structs.Batch(rays=rays, rgb=rgb), mesh)
    # Only consumed by robustnerf configs; shape must just stay fixed.
    thresholds = mesh_lib.replicate(
        jnp.ones(config.num_ray_levels), mesh)
    # Advance train_frac one schedule step per measured step, starting at
    # mid-training: nerfacto skips the proposal-net backward on steps where
    # step % proposal_update_every != 0 (reference nerfacto.py:292-303), so
    # a frozen train_frac would measure only one branch of that cond.
    base_step = config.max_steps // 2

    def frac(i):
        return jnp.asarray((base_step + i) / config.max_steps)

    rng = mesh_lib.replicate(jax.random.PRNGKey(1), mesh)
    for i in range(warmup):
        state, stats, rng = train_step(rng, state, batch, frac(i),
                                       thresholds)
    float(stats["loss"])  # device_get barrier (tunnel-safe)
    t0 = time.perf_counter()
    for i in range(steps):
        state, stats, rng = train_step(rng, state, batch, frac(warmup + i),
                                       thresholds)
    float(stats["loss"])
    dt = (time.perf_counter() - t0) / steps
    out = {
        "config": path + (f" (hash_impl={hash_impl})" if hash_impl else ""),
        "sec_per_step": round(dt, 3),
        "rays_per_sec": round(batch_size / dt, 1),
        "batch_size": batch_size,
        "loss": float(stats["loss"]),
    }
    if config.model_type == "nerfacto":
        # How much of the step is the irreducible descriptor cost: the
        # cost-model forward floor (gather descriptors / measured v5e
        # per-level gather ceiling) over the measured step time. ~1.0 means
        # the step IS the hardware gather wall; see
        # docs/tpu_gather_cost_model.md for the ceiling measurements.
        n_desc, floor_fast, floor_slow = fwd_descriptor_floor(config)
        out["fwd_descriptors_per_step"] = n_desc
        out["fwd_descriptor_floor_sec"] = [round(floor_fast, 3),
                                           round(floor_slow, 3)]
        out["fwd_descriptor_floor_frac"] = [round(floor_fast / dt, 3),
                                            round(floor_slow / dt, 3)]
    return out


def main():
    argv = sys.argv[1:]
    hash_impl = None
    if "--hash-impl" in argv:
        i = argv.index("--hash-impl")
        hash_impl = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    paths = argv or [
        "configs/nerfacto/kubric_nerfacto_base.yml",
        "configs/nerfacto/kubric_nerfacto_tpu.yml",
    ]
    for p in paths:
        print(json.dumps(bench_config(p, hash_impl=hash_impl)), flush=True)


if __name__ == "__main__":
    main()
