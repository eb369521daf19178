"""Root-cause the vanilla-NeRF learning-rate discrepancy (VERDICT r2 #5).

Round-2 note said "vanilla needs lr_init 5e-4 — 2e-3 stalls it". But the
reference never trains vanilla NeRF at 2e-3: its only vanilla recipe is
lr_init=1e-3, lr_final=1e-5, sine warmup 500 steps with delay mult 0.01,
adam eps 1e-8, coarse_rgb_loss_mult=1.0, max_deg_point=15, 64+64 samples
(reference nerfacto/configs/kubric_nerf_base.yml:25-29 + models/nerf.py:95,
utils/lr_scheduler_utils.py:15-25). 2e-3 came from the mipnerf360 default.

This script trains BOTH the reference torch Model (imported from
/root/reference/nerfacto, CPU) and our jax VanillaNerfModel on identical
synthetic-scene batches at a grid of lr_init values under the reference
recipe, printing step-0 grad norms and the loss/psnr trajectory. If torch
also stalls at 2e-3 and both train at 1e-3, there is no model diff — just a
mis-set lr in the round-2 experiment.

  python tools/diagnose_vanilla_lr.py [--steps 400] [--lrs 2e-3,1e-3,5e-4]
        [--jax-only]
"""

import argparse
import os
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np

REF_NERFACTO = "/root/reference/nerfacto"

BATCH = 512
WARMUP = 500
LR_DELAY_MULT = 0.01
LR_FINAL_RATIO = 0.01  # lr_final = ratio * lr_init (reference: 1e-3 -> 1e-5
                       # over 250k; at a few hundred steps decay is ~flat, so
                       # the ratio barely matters — warmup dominates)
MAX_STEPS = 250000     # schedule horizon (reference num_steps)


def make_batches(num_steps, seed=0):
    """Identical ray batches for both frameworks from the synthetic scene."""
    import jax

    from nerf_hugs_tpu.configs.config import Config
    from nerf_hugs_tpu.data import load_dataset

    config = Config(
        dataset_loader="synthetic", model_type="nerf", batch_size=BATCH,
        image_num_per_batch=4, near=0.5, far=6.0,
        train_background_color="white", test_background_color="white")
    ds = load_dataset("train", "", config)
    batches = []
    for _, b in zip(range(num_steps), ds):
        batches.append(jax.tree_util.tree_map(np.asarray, b))
    return batches


def ref_lr_factor(step):
    """Reference LambdaLR factor (lr_scheduler_utils.py:15-25)."""
    if step < WARMUP:
        return LR_DELAY_MULT + (1 - LR_DELAY_MULT) * np.sin(
            0.5 * np.pi * np.clip(step / WARMUP, 0, 1))
    t = np.clip((step - WARMUP) / (MAX_STEPS - WARMUP), 0, 1)
    return np.exp(np.log(LR_FINAL_RATIO) * t)


def run_torch(batches, lr_init, steps):
    import torch
    tcnn = types.ModuleType("tinycudann")
    tcnn.Encoding = tcnn.Network = tcnn.NetworkWithInputEncoding = object
    sys.modules.setdefault("tinycudann", tcnn)
    if REF_NERFACTO not in sys.path:
        sys.path.insert(0, REF_NERFACTO)
    try:
        from models.nerf import Model as TorchModel, ModelConfig
    finally:
        sys.path.remove(REF_NERFACTO)

    torch.manual_seed(0)
    mc = ModelConfig(
        net_width=256, max_deg_point=15, use_appearance_embedding=False,
        use_transient_embedding=False, num_coarse_nerf_samples_per_ray=64,
        num_fine_nerf_samples_per_ray=64, proposal_initial_sampler="uniform",
        opaque_background=True, rgb_loss_type="mse")
    model = TorchModel(mc, bound=None, enable_amp=False,
                      enable_scene_contraction=False)
    opt = torch.optim.Adam(model.parameters(), lr=lr_init,
                           betas=(0.9, 0.999), eps=1e-8)

    losses, psnrs = [], []
    for step in range(steps):
        b = batches[step]
        f32 = lambda x: torch.from_numpy(np.asarray(x, np.float32))
        rays = {
            "origin": f32(b.rays.origins),
            "direction": f32(b.rays.directions),
            "viewdir": f32(b.rays.viewdirs),
            "near": f32(b.rays.near),
            "far": f32(b.rays.far),
            "embed_idx": torch.from_numpy(b.rays.embed_idx.astype(np.int64)),
            "bg_rgb": torch.ones(b.rays.origins.shape[0], 3),
        }
        gt = f32(b.rgb)
        for g in opt.param_groups:
            g["lr"] = lr_init * ref_lr_factor(step)
        out = model.forward_rays(rays, curr_step=step, perturb=True)
        loss = ((out["rgb"] - gt) ** 2).mean() + \
            ((out["rgb_coarse"] - gt) ** 2).mean()
        opt.zero_grad()
        loss.backward()
        if step == 0:
            gn = torch.sqrt(sum((p.grad ** 2).sum()
                                for p in model.parameters()
                                if p.grad is not None))
            print(f"    torch step0: loss={float(loss):.5f} "
                  f"grad_norm={float(gn):.3f}")
        opt.step()
        mse = float(((out["rgb"] - gt) ** 2).mean())
        losses.append(float(loss))
        psnrs.append(-10 * np.log10(mse))
    return losses, psnrs


def run_jax(batches, lr_init, steps):
    import jax
    import jax.numpy as jnp

    from nerf_hugs_tpu.configs.config import Config
    from nerf_hugs_tpu.parallel import mesh as mesh_lib
    from nerf_hugs_tpu.train import step as train_step_lib

    config = Config(
        dataset_loader="synthetic", model_type="nerf", batch_size=BATCH,
        image_num_per_batch=4, near=0.5, far=6.0,
        lr_init=lr_init, lr_final=lr_init * LR_FINAL_RATIO,
        lr_delay_steps=WARMUP, lr_delay_mult=LR_DELAY_MULT,
        max_steps=MAX_STEPS, adam_eps=1e-8,
        grad_max_norm=0.0, grad_max_val=0.0, data_loss_type="mse",
        enable_amp=False, enable_scene_contraction=False,
        train_background_color="white", test_background_color="white",
        interlevel_loss_mult=0.0, distortion_loss_mult=0.0,
        data_coarse_loss_mult=1.0)
    config.nerfacto.net_width = 256
    config.nerfacto.max_deg_point = 15
    config.nerfacto.num_coarse_nerf_samples_per_ray = 64
    config.nerfacto.num_fine_nerf_samples_per_ray = 64
    config.nerfacto.proposal_initial_sampler = "uniform"

    mesh = mesh_lib.make_mesh()
    _, state, _, train_step, _ = train_step_lib.setup_model(
        config, jax.random.PRNGKey(0), mesh)
    state = mesh_lib.replicate(state, mesh)
    thresholds = mesh_lib.replicate(jnp.ones(config.num_ray_levels), mesh)
    rngs = mesh_lib.replicate(jax.random.PRNGKey(1), mesh)

    losses, psnrs = [], []
    for step in range(steps):
        batch = mesh_lib.shard_batch(batches[step], mesh)
        frac = jnp.asarray(step / MAX_STEPS)
        state, stats, rngs = train_step(rngs, state, batch, frac, thresholds)
        if step == 0:
            gn = np.sqrt(sum(
                float(v) ** 2
                for k, v in stats["grad_norms"].items() if "/" not in k))
            print(f"    jax   step0: loss={float(stats['loss']):.5f} "
                  f"grad_norm={gn:.3f}")
        losses.append(float(stats["loss"]))
        psnrs.append(float(stats["psnr"]))
    return losses, psnrs


def summarize(tag, losses, psnrs):
    q = len(losses) // 4
    print(f"    {tag}: loss {losses[0]:.4f} -> {np.mean(losses[-q:]):.4f}  "
          f"psnr {psnrs[0]:.2f} -> {np.mean(psnrs[-q:]):.2f}  "
          f"(quartile means: "
          f"{[round(float(np.mean(psnrs[i*q:(i+1)*q])), 2) for i in range(4)]})")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=400)
    parser.add_argument("--lrs", type=str, default="2e-3,1e-3,5e-4")
    parser.add_argument("--jax-only", action="store_true")
    parser.add_argument("--torch-only", action="store_true")
    args = parser.parse_args()

    # Always CPU: this is a dynamics diagnostic, and it must not open a
    # second client against the (possibly busy) remote TPU.
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

    lrs = [float(x) for x in args.lrs.split(",")]
    print(f"building {args.steps} identical batches ...", flush=True)
    batches = make_batches(args.steps)

    for lr in lrs:
        print(f"lr_init={lr:g} (reference recipe: sine warmup {WARMUP}, "
              f"delay_mult {LR_DELAY_MULT}, eps 1e-8)", flush=True)
        if not args.torch_only:
            lj, pj = run_jax(batches, lr, args.steps)
            summarize(f"jax   lr={lr:g}", lj, pj)
        if not args.jax_only:
            lt, pt = run_torch(batches, lr, args.steps)
            summarize(f"torch lr={lr:g}", lt, pt)


if __name__ == "__main__":
    main()
