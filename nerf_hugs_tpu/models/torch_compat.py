"""Weight mapping from the reference's torch vanilla-NeRF MLP to PointMLP.

The torch MLP (nerfacto/models/nerf.py:632-860) and our PointMLP
(models/vanilla.py) share the architecture exactly; this module maps a torch
state_dict onto our flax param tree so released vanilla-NeRF checkpoints
load. flax Dense kernels are torch Linear weights transposed.

Our PointMLP auto-names Dense layers in call order:
  Dense_0..{D-1}        trunk (torch mlp_base.* Sequential Linears, in order)
  Dense_{D}             density head (torch mlp_density)
  Dense_{D+1}           bottleneck (torch mlp_bottleneck)
  Dense_{D+2}..         viewdir branch (torch mlp_head.*)
  Dense_{..}            rgb head (torch mlp_rgb)
  [transient branch     torch mlp_transient.* + density/rgb/uncertainty]
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _dense(weight, bias) -> Dict[str, np.ndarray]:
    return {"kernel": np.asarray(weight).T, "bias": np.asarray(bias)}


def _sequential_linears(sd: Dict[str, Any], prefix: str):
    """Yield (weight, bias) of every Linear inside an nn.ModuleList of
    Sequentials, in definition order (keys like 'prefix.0.0.weight')."""
    keys = sorted(
        (k for k in sd if k.startswith(prefix) and k.endswith(".weight")),
        key=lambda k: tuple(int(t) for t in k.split(".") if t.isdigit()))
    for k in keys:
        yield sd[k], sd[k.replace(".weight", ".bias")]


def convert_point_mlp(sd: Dict[str, Any], net_depth: int,
                      net_depth_viewdirs: int = 1,
                      transient: bool = False,
                      net_depth_transient: int = 4,
                      prefix: str = "") -> Dict[str, Any]:
    """torch vanilla-NeRF MLP state_dict (optionally key-prefixed) -> our
    PointMLP params dict."""
    if prefix:
        sd = {k[len(prefix):]: v for k, v in sd.items()
              if k.startswith(prefix)}
    params: Dict[str, Any] = {}
    idx = 0
    for w, b in _sequential_linears(sd, "mlp_base."):
        params[f"Dense_{idx}"] = _dense(w, b)
        idx += 1
    if idx != net_depth:
        raise ValueError(f"expected {net_depth} trunk Linears, found {idx}")
    params[f"Dense_{idx}"] = _dense(sd["mlp_density.weight"],
                                    sd["mlp_density.bias"])
    idx += 1
    params[f"Dense_{idx}"] = _dense(sd["mlp_bottleneck.weight"],
                                    sd["mlp_bottleneck.bias"])
    idx += 1
    head = list(_sequential_linears(sd, "mlp_head."))
    if len(head) != net_depth_viewdirs:
        raise ValueError(
            f"expected {net_depth_viewdirs} viewdir Linears, got {len(head)}")
    for w, b in head:
        params[f"Dense_{idx}"] = _dense(w, b)
        idx += 1
    params[f"Dense_{idx}"] = _dense(sd["mlp_rgb.weight"], sd["mlp_rgb.bias"])
    idx += 1
    if transient:
        for w, b in _sequential_linears(sd, "mlp_transient."):
            params[f"Dense_{idx}"] = _dense(w, b)
            idx += 1
        params[f"Dense_{idx}"] = _dense(sd["mlp_density_transient.weight"],
                                        sd["mlp_density_transient.bias"])
        idx += 1
        params[f"Dense_{idx}"] = _dense(sd["mlp_rgb_transient.weight"],
                                        sd["mlp_rgb_transient.bias"])
        idx += 1
        params[f"Dense_{idx}"] = _dense(sd["mlp_uncertainty.weight"],
                                        sd["mlp_uncertainty.bias"])
    return params


def convert_nerf_model_state_dict(sd: Dict[str, Any], config
                                  ) -> Dict[str, Any]:
    """Full reference vanilla-NeRF Model state dict -> our VanillaNerfModel
    variables (nerf.py:119-260: field.coarse/field.fine MLPs, optional
    appearance/transient embeddings, optional hanerf ImplicitMask)."""
    from nerf_hugs_tpu.configs.config import MLPConfig
    nc = config.nerfacto
    mlp_defaults = MLPConfig()  # vanilla.py builds its MLPConfig with
    # defaults for the viewdir/transient branch depths (nerf.py defaults).
    params: Dict[str, Any] = {}
    for name in ("coarse", "fine"):
        params[name] = convert_point_mlp(
            sd, nc.net_depth, mlp_defaults.net_depth_viewdirs,
            transient=(config.transient_type == "nerfw" and name == "fine"),
            net_depth_transient=mlp_defaults.net_depth_transient,
            prefix=f"field.{name}.")
    if "embedding_appearance.weight" in sd:
        params["appearance_embedding"] = {
            "embedding": np.asarray(
                sd["embedding_appearance.weight"]).astype(np.float32)}
    if "embedding_transient.weight" in sd:
        params["transient_embedding"] = {
            "embedding": np.asarray(
                sd["embedding_transient.weight"]).astype(np.float32)}
    if "implicit_mask.mlp_base.0.weight" in sd:
        # Sequential [lin, relu]*depth + [lin, sigmoid]: Linears at 2j.
        mask = {}
        j = 0
        while f"implicit_mask.mlp_base.{2 * j}.weight" in sd:
            mask[f"Dense_{j}"] = _dense(
                sd[f"implicit_mask.mlp_base.{2 * j}.weight"],
                sd[f"implicit_mask.mlp_base.{2 * j}.bias"])
            j += 1
        params["implicit_mask"] = mask
    return {"params": params}


def torch_load_checkpoint(path: str):
    """torch.load with weights_only=True first (released snapshots are plain
    tensor state dicts + ints); fall back to full unpickling with a warning
    only if the safe path rejects the file."""
    import pickle

    import torch
    try:
        return torch.load(path, map_location="cpu", weights_only=True)
    except (pickle.UnpicklingError, RuntimeError) as e:
        # Only the safe loader's REJECTION falls back (torch raises
        # UnpicklingError or RuntimeError for disallowed globals depending
        # on version); missing/unreadable files (OSError) propagate — the
        # unsafe retry would fail identically with a misleading warning.
        import warnings
        warnings.warn(
            f"weights_only load of {path} failed ({type(e).__name__}: {e}); "
            "falling back to weights_only=False, which executes pickled "
            "code — only do this for checkpoints you trust.")
        return torch.load(path, map_location="cpu", weights_only=False)


def load_torch_nerf_checkpoint(path: str, config):
    """Load a released vanilla-NeRF snapshot .pth (returns variables, step)."""
    ckpt = torch_load_checkpoint(path)
    sd = ckpt["model"] if isinstance(ckpt, dict) and "model" in ckpt else ckpt
    sd = {k: (v.numpy() if hasattr(v, "numpy") else v) for k, v in sd.items()}
    step = 0
    if isinstance(ckpt, dict) and "state" in ckpt:
        step = int(ckpt["state"].get("global_step",
                                     ckpt["state"].get("step", 0)))
    return convert_nerf_model_state_dict(sd, config), step
