#!/usr/bin/env python
"""Convert a released NeRF-HuGS checkpoint (either stack) to this repo.

MipNeRF360 stack: flax msgpack TrainStates (MipNeRF360/train.py:232-236).
Our MipNerf360Model's parameter pytree is identical to the reference's
(tests/test_reference_model_parity.py), so conversion re-wraps the params
into our orbax layout:

  python tools/convert_reference_checkpoint.py \\
      --reference_checkpoint /path/to/checkpoint_250000 \\
      --gin_configs configs/mipnerf360/kubric_1024_withmask.gin \\
      --output_dir ./results/kubric_car

nerfacto stack (pass the yaml --config): torch snapshot .pth files with
tcnn grid params + torch Linears (models/nerfacto_import.py maps them onto
our tcnn-exact hash grid + Dense layout):

  python tools/convert_reference_checkpoint.py \\
      --reference_checkpoint /path/to/ckpt_25000.pth \\
      --config configs/nerfacto/kubric_nerfacto_base.yml \\
      --output_dir ./results/kubric_car

After conversion, eval.py / render.py / train.py (resume) read the output
directory directly. The optimizer state is rebuilt fresh (Adam moments are
not needed for eval/render; pass --keep_optimizer to carry them over when
the optax tree matches).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def extract_reference_params(path: str):
    """Read a flax msgpack checkpoint into a raw pytree (no target)."""
    from flax.training import checkpoints as flax_checkpoints
    raw = flax_checkpoints.restore_checkpoint(path, target=None)
    if raw is None:
        raise FileNotFoundError(f"no flax checkpoint at {path}")
    # Reference TrainState: {'params': {'params': {...}}, 'step': n, 'opt_state': ...}
    # (train_utils.py:512 creates TrainState(params=variables)).
    step = int(raw.get("step", 0))
    params = raw["params"]
    if "params" not in params:
        params = {"params": params}
    return params, step, raw.get("opt_state")


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--reference_checkpoint", required=True,
                        help="path to the reference checkpoint_NNN file/dir")
    parser.add_argument("--gin_configs", action="append", default=[])
    parser.add_argument("--gin_bindings", action="append", default=[])
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--step", type=int, default=None,
                        help="override the checkpoint step number")
    args = parser.parse_args(argv)

    import jax

    from nerf_hugs_tpu.configs import gin_parser, yaml_loader
    from nerf_hugs_tpu.parallel import mesh as mesh_lib
    from nerf_hugs_tpu.train import checkpoints
    from nerf_hugs_tpu.train import step as train_step_lib

    if args.config:
        config = yaml_loader.load_yaml_config(args.config)
    else:
        config = gin_parser.parse_gin_configs(args.gin_configs,
                                              args.gin_bindings)

    # Released torch checkpoints are tcnn (xor-hash) by construction; an
    # addhash config has the SAME param tree, so conversion would succeed
    # and render garbage. Refuse up front (see checkpoints.check_model_compat).
    if (config.model_type == "nerfacto"
            and getattr(config.nerfacto, "hash_impl", "xor") != "xor"):
        raise ValueError(
            "reference checkpoints require hash_impl: xor (tcnn semantics); "
            f"the config sets hash_impl="
            f"{config.nerfacto.hash_impl!r}. Use the non-addhash twin.")

    if config.model_type in ("nerfacto", "nerf") and \
            args.reference_checkpoint.endswith((".pth", ".pt", ".ckpt")):
        from nerf_hugs_tpu.models import nerfacto_import, torch_compat
        if config.model_type == "nerfacto":
            params, step = nerfacto_import.load_torch_nerfacto_checkpoint(
                args.reference_checkpoint, config)
        else:
            params, step = torch_compat.load_torch_nerf_checkpoint(
                args.reference_checkpoint, config)
    else:
        params, step, _ = extract_reference_params(args.reference_checkpoint)
    step = args.step if args.step is not None else step

    mesh = mesh_lib.make_mesh()
    _, state, _, _, _ = train_step_lib.setup_model(
        config, jax.random.PRNGKey(0), mesh)

    # Validate the param tree matches before writing anything.
    import jax.tree_util as jtu
    want = {jtu.keystr(p): v.shape
            for p, v in jtu.tree_flatten_with_path(state.params)[0]}
    got = {jtu.keystr(p): tuple(v.shape)
           for p, v in jtu.tree_flatten_with_path(params)[0]}
    missing = set(want) - set(got)
    extra = set(got) - set(want)
    if missing or extra:
        raise ValueError(
            f"param tree mismatch — is the gin config the one this "
            f"checkpoint was trained with?\n  missing: {sorted(missing)[:5]}"
            f"\n  extra: {sorted(extra)[:5]}")
    bad = {k: (want[k], got[k]) for k in want if tuple(want[k]) != got[k]}
    if bad:
        raise ValueError(f"param shape mismatches: {list(bad.items())[:5]}")

    state = state.replace(params=params, step=step)
    checkpoints.save_checkpoint(args.output_dir, state, step)
    checkpoints.record_model_compat(args.output_dir, config)
    print(f"converted step-{step} checkpoint -> "
          f"{args.output_dir}/checkpoint_{step}")
    if config.model_type in ("nerfacto", "nerf") and \
            args.reference_checkpoint.endswith((".pth", ".pt", ".ckpt")):
        # Torch snapshots were trained under the reference's
        # cumulative-delta compositing quirk (ray_utils.py:231); persist a
        # ready-to-use config with the flag flipped so eval/render can't
        # silently composite imported weights the wrong way.
        emitted = os.path.join(args.output_dir, "config.yml")
        if args.config:
            import yaml
            with open(args.config) as f:
                raw = yaml.safe_load(f)
            raw.setdefault("model", {})["legacy_cumulative_deltas"] = True
            with open(emitted, "w") as f:
                yaml.safe_dump(raw, f)
            print(f"wrote {emitted} with legacy_cumulative_deltas: true — "
                  "pass `--config` pointing at it for eval/render of these "
                  "weights (models/nerfacto_import.py docstring).")
        else:
            print("NOTE: render/eval with the model key "
                  "`legacy_cumulative_deltas: true` for faithful outputs "
                  "(models/nerfacto_import.py docstring).")


if __name__ == "__main__":
    main()
