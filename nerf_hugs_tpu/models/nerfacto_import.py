"""Import released nerfacto-stack torch checkpoints into our flax layout.

The reference's released nerfacto checkpoints (torch `save_snapshot`,
nerfacto/utils/checkpoint_utils.py:27-47) store `ckpt['model']` state
dicts of models built with `enable_tcnn_mlp: false` (every shipped config
sets it) — i.e. tcnn grid ENCODERS + plain torch Linears:

  field.mlp_base.0.params                 tcnn HashGrid flat params
  field.mlp_base.{1+2j}.{weight,bias}     base MLP Linears
  field.mlp_head.{2j}.{weight,bias}       color MLP Linears
  field.mlp_transient.{2j}.{weight,bias}  transient MLP Linears (nerfw)
  proposal_networks.{i}.mlp_base.0.params + .{1+2j}.{weight,bias}
  embedding_appearance.weight / embedding_transient.weight
  implicit_mask.grid_encoder.params + implicit_mask.mlp_base.{2j}.*
  field.{base_res,max_res,num_levels,log2_hashmap_size}  int buffers

Our hash grid is tcnn-exact (ops/hashgrid.py): same per-level compact
table sizes, offsets, dense/hash indexing and half-cell coordinates — so
the tcnn flat params vector slices directly into our per-level tables.
Linears transpose into flax Dense kernels.

IMPORTANT: released checkpoints were trained under the reference's
density_to_weight delta quirk (ray_utils.py:231 — deltas cumulative from
the first bin). Set `config.nerfacto.legacy_cumulative_deltas = True`
(yaml model key `legacy_cumulative_deltas`) when rendering imported
weights, or densities are mis-scaled at composite time; leave it off for
models trained in this repo. Parity locked by
tests/test_torch_loss_parity.py::test_density_to_weight_legacy_delta_parity.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from nerf_hugs_tpu.ops.hashgrid import HashGridSpec

# torch buffers and scheduler bookkeeping we read nothing from.
_IGNORED_SUFFIXES = (".base_res", ".max_res", ".num_levels",
                     ".log2_hashmap_size")


def split_tcnn_grid_params(flat: np.ndarray, spec: HashGridSpec
                          ) -> Dict[str, np.ndarray]:
    """tcnn Encoding flat params -> {table_l: [T_l*F] fp32}.

    tcnn lays the grid out level-major, row-major [T_l, F] within a level,
    with T_l the compact padded sizes — identical to spec.level_sizes, so
    this is pure slicing (+ fp16 -> fp32 cast for AMP checkpoints)."""
    flat = np.asarray(flat).reshape(-1).astype(np.float32)
    sizes = spec.level_sizes * spec.features_per_level
    offsets = np.concatenate([[0], np.cumsum(sizes)])
    if flat.shape[0] != offsets[-1]:
        raise ValueError(
            f"tcnn grid params have {flat.shape[0]} values; spec "
            f"{tuple(spec.level_sizes)} x F={spec.features_per_level} "
            f"wants {offsets[-1]}")
    return {f"table_{l}": flat[offsets[l]:offsets[l + 1]]
            for l in range(spec.num_levels)}


def _dense(sd, prefix, consumed=None):
    if consumed is not None:
        consumed.update((f"{prefix}.weight", f"{prefix}.bias"))
    return {"kernel": np.asarray(sd[f"{prefix}.weight"]).astype(np.float32).T,
            "bias": np.asarray(sd[f"{prefix}.bias"]).astype(np.float32)}


def _relu_mlp(sd, prefix, num_layers, first_index, consumed=None):
    """Sequential Linears at indices first_index + 2j -> Dense_j."""
    return {f"Dense_{j}": _dense(sd, f"{prefix}.{first_index + 2 * j}",
                                 consumed)
            for j in range(num_layers)}


def _field_spec(nc) -> HashGridSpec:
    return HashGridSpec(
        num_levels=nc.num_levels, features_per_level=nc.features_per_level,
        log2_hashmap_size=nc.log2_hashmap_size, base_res=nc.base_res,
        max_res=nc.max_res)


def _proposal_spec(args: Dict[str, Any]) -> HashGridSpec:
    return HashGridSpec(
        num_levels=args.get("num_levels", 8),
        features_per_level=args.get("features_per_level", 2),
        log2_hashmap_size=args.get("log2_hashmap_size", 18),
        base_res=args.get("base_res", 16),
        max_res=args.get("max_res", 1024))


_MASK_SPEC = HashGridSpec(num_levels=16, features_per_level=2,
                          log2_hashmap_size=19, base_res=16, max_res=2048,
                          num_dims=2)


def convert_nerfacto_state_dict(sd: Dict[str, Any], config) -> Dict[str, Any]:
    """torch `ckpt['model']` -> {'params': ...} for our NerfactoModel.

    Raises on tcnn-MLP checkpoints (`field.mlp_base.params` as one fused
    blob) — no shipped reference config trains that way."""
    if "field.mlp_base.params" in sd:
        raise ValueError(
            "checkpoint was trained with enable_tcnn_mlp=true (fused tcnn "
            "MLP blob); only the shipped enable_tcnn_mlp=false layout is "
            "convertible")
    nc = config.nerfacto
    params: Dict[str, Any] = {}
    consumed: set = set()

    field: Dict[str, Any] = {
        "hashgrid": split_tcnn_grid_params(
            sd["field.mlp_base.0.params"], _field_spec(nc)),
        # mlp_base Sequential = [grid_encoder, lin, relu, ..., lin]
        # (nerfacto.py:761-790): Linears at 1 + 2j.  num_layers Linears
        # total (num_layers-1 hidden + 1 out).
        "mlp_base": _relu_mlp(sd, "field.mlp_base", 2, 1, consumed),
        "mlp_head": _relu_mlp(sd, "field.mlp_head", 3, 0, consumed),
    }
    if f"field.mlp_transient.0.weight" in sd:
        field["mlp_transient"] = _relu_mlp(sd, "field.mlp_transient", 3, 0,
                                           consumed)
    params["field"] = field

    i = 0
    while f"proposal_networks.{i}.mlp_base.0.params" in sd:
        args = nc.proposal_net_args_list[min(
            i, len(nc.proposal_net_args_list) - 1)]
        params[f"proposal_{i}"] = {
            "hashgrid": split_tcnn_grid_params(
                sd[f"proposal_networks.{i}.mlp_base.0.params"],
                _proposal_spec(dict(args))),
            "mlp_base": _relu_mlp(sd, f"proposal_networks.{i}.mlp_base",
                                  2, 1, consumed),
        }
        i += 1

    if "embedding_appearance.weight" in sd:
        params["appearance_embedding"] = {
            "embedding": np.asarray(
                sd["embedding_appearance.weight"]).astype(np.float32)}
    if "embedding_transient.weight" in sd:
        params["transient_embedding"] = {
            "embedding": np.asarray(
                sd["embedding_transient.weight"]).astype(np.float32)}
    if "implicit_mask.grid_encoder.params" in sd:
        params["implicit_mask"] = {
            "hashgrid": split_tcnn_grid_params(
                sd["implicit_mask.grid_encoder.params"], _MASK_SPEC),
            # ImplicitMask mlp_base has no leading encoder in the
            # Sequential (nerfacto.py:1040-1070): Linears at 2j.
            "mlp": _relu_mlp(sd, "implicit_mask.mlp_base", 3, 0, consumed),
        }

    # Strict mode (like the SAM converter): the MLP layer counts above are
    # hardcoded to the shipped configs; a checkpoint trained with a
    # non-default num_layers would leave extra Linear keys behind and
    # convert silently-partially without this check.
    leftover = [k for k in sd
                if (".weight" in k or ".bias" in k)
                and any(k.startswith(p) for p in (
                    "field.mlp_", "proposal_networks.",
                    "implicit_mask.mlp_"))
                and k not in consumed]
    if leftover:
        raise ValueError(
            "unconsumed MLP keys after conversion (checkpoint layer counts "
            f"differ from the shipped configs): {sorted(leftover)[:8]}"
            + ("..." if len(leftover) > 8 else ""))
    return {"params": params}


def load_torch_nerfacto_checkpoint(path: str, config):
    """Load a released snapshot .pth and convert (returns variables, step)."""
    from nerf_hugs_tpu.models.torch_compat import torch_load_checkpoint
    ckpt = torch_load_checkpoint(path)
    sd = ckpt["model"] if isinstance(ckpt, dict) and "model" in ckpt else ckpt
    sd = {k: (v.numpy() if hasattr(v, "numpy") else v)
          for k, v in sd.items()
          if not k.endswith(_IGNORED_SUFFIXES)}
    step = 0
    if isinstance(ckpt, dict) and "state" in ckpt:
        step = int(ckpt["state"].get("global_step",
                                     ckpt["state"].get("step", 0)))
    return convert_nerfacto_state_dict(sd, config), step
