#!/usr/bin/env python
"""Day-one validation of a released-asset drop (VERDICT r3 item 9).

The reference's reproduction path (/root/reference/README.md:152-158) is:
released checkpoints + rendering_results on disk -> eval -> metrics ->
"consistent with our paper". This sandbox has no egress, so the assets
arrive as a directory drop; this script is the single command that turns
the drop into a paper-comparison table:

  python tools/validate_released_assets.py --assets_dir /path/to/drop \
      [--work_dir /tmp/asset_validation] [--config_map map.json]

Expected drop layout (any subset; everything is optional and reported):
  {assets}/lpips*.pth | {assets}/lpips/*.pth      LPIPS AlexNet weights
  {assets}/sam*.pth | {assets}/sam/*.pth          SAM ViT-H checkpoint
  {assets}/data/{scene}/                          scene data dirs
  {assets}/checkpoints/{experiment}/{scene}/      released checkpoints
      (flax `checkpoint_NNN` files OR torch `*.pth` snapshots)
  {assets}/rendering_results/{experiment}/{scene}/test_preds/*_{gt,color}.png

Per (experiment, scene) it: (1) scores the released renders with OUR
metrics (locks the quality oracle), (2) converts the released checkpoint,
(3) re-renders the test split through the real eval.py driver, (4) scores
our renders, and (5) diffs ours against the released renders. Results land
in {work_dir}/PAPER_COMPARISON.md + .json.

Checkpoint -> config mapping: pass --config_map (JSON
{"experiment[/scene]": "configs/..."}); without it, a name heuristic
matches experiment dir names against the shipped config basenames.

The fixture dry-run (tests/test_released_assets_dryrun.py, fast tier)
exercises this whole flow on synthesized assets, so the first real drop
only risks data-content surprises, not plumbing.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _find_one(assets_dir, patterns):
    for pat in patterns:
        hits = sorted(glob.glob(os.path.join(assets_dir, pat)))
        if hits:
            return hits[0]
    return None


def discover(assets_dir):
    inv = {
        "lpips": _find_one(assets_dir, ["lpips*.pth", "lpips/*.pth",
                                        "lpips*.pt"]),
        "sam": _find_one(assets_dir, ["sam*.pth", "sam/*.pth"]),
        "data": sorted(glob.glob(os.path.join(assets_dir, "data", "*"))),
        "checkpoints": sorted(glob.glob(
            os.path.join(assets_dir, "checkpoints", "*", "*"))),
        "rendering_results": sorted(glob.glob(
            os.path.join(assets_dir, "rendering_results", "*", "*"))),
        "segmentation_results": sorted(glob.glob(
            os.path.join(assets_dir, "segmentation_results", "*"))),
    }
    return inv


def check_lpips(path):
    """Convert the LPIPS weights and smoke-run one distance."""
    from nerf_hugs_tpu.metrics import lpips
    params = lpips.convert_torch_state_dict(path)
    model = lpips.LPIPS(params)
    img = np.zeros((64, 64, 3), np.float32)
    d_same = float(model(img, img))
    d_diff = float(model(img, np.ones_like(img)))
    ok = np.isfinite(d_same) and d_diff > d_same
    return {"path": path, "converted_params": len(params),
            "d(img,img)": d_same, "d(black,white)": d_diff, "ok": bool(ok)}


def check_sam(path):
    """Convert the SAM checkpoint (strict key schema) — no forward run."""
    from nerf_hugs_tpu.hugs.sam import weights as sam_weights
    params = sam_weights.convert_sam_checkpoint(path)
    n = sum(x.size for x in _tree_leaves(params))
    return {"path": path, "converted_param_count": int(n), "ok": True}


def _tree_leaves(tree):
    import jax
    return jax.tree_util.tree_leaves(tree)


def score_renders(exp_dir, scene, image_type, lpips_weights):
    """Score {exp_dir}/{scene}/test_preds pairs with our metrics CLI."""
    import metrics as metrics_cli
    res = metrics_cli.main(exp_dir, [scene], image_type, False, None,
                           lpips_weights=lpips_weights)
    return res[scene]["mean"]


def _guess_config(experiment, scene, config_map):
    key_full = f"{experiment}/{scene}"
    if key_full in config_map:
        return config_map[key_full]
    if experiment in config_map:
        return config_map[experiment]
    # Heuristic: longest shipped-config basename contained in the
    # experiment name (e.g. 'mipnerf360_kubric_1024_withmask' matches
    # configs/mipnerf360/kubric_1024_withmask.gin).
    best = None
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for path in sorted(
            glob.glob(os.path.join(repo_root, "configs/*/*.gin")) +
            glob.glob(os.path.join(repo_root, "configs/*/*.yml"))):
        stem = os.path.splitext(os.path.basename(path))[0]
        if stem in experiment and (best is None
                                   or len(stem) > len(best[0])):
            best = (stem, path)
    return best[1] if best else None


def _latest_checkpoint(ckpt_scene_dir):
    torch_cands = sorted(glob.glob(os.path.join(ckpt_scene_dir, "*.pth")))
    if torch_cands:
        return torch_cands[-1], "torch"
    flax_cands = sorted(
        glob.glob(os.path.join(ckpt_scene_dir, "checkpoint_*")),
        key=lambda p: int(p.rsplit("_", 1)[-1]))
    if flax_cands:
        return flax_cands[-1], "flax"
    return None, None


def validate_pair(experiment, scene, assets_dir, work_dir, config_path,
                  lpips_weights, image_type, skip_render=False):
    """Full chain for one (experiment, scene): oracle + convert + render +
    cross-score. Returns a row dict for the comparison table."""
    import eval as eval_driver
    from tools import convert_reference_checkpoint as conv

    row = {"experiment": experiment, "scene": scene, "config": config_path}
    released_dir = os.path.join(assets_dir, "rendering_results", experiment)
    have_released = os.path.isdir(
        os.path.join(released_dir, scene, "test_preds"))
    if have_released:
        row["released_scores"] = score_renders(released_dir, scene,
                                               image_type, lpips_weights)

    ckpt_scene_dir = os.path.join(assets_dir, "checkpoints", experiment,
                                  scene)
    ckpt, kind = _latest_checkpoint(ckpt_scene_dir)
    if ckpt is None or config_path is None or skip_render:
        row["note"] = ("released renders only" if have_released else
                       "nothing usable found")
        return row

    data_dir = os.path.join(assets_dir, "data", scene)
    out_dir = os.path.join(work_dir, experiment, scene)
    os.makedirs(out_dir, exist_ok=True)

    conv_args = ["--reference_checkpoint", ckpt, "--output_dir", out_dir]
    if config_path.endswith((".yml", ".yaml")):
        conv_args += ["--config", config_path]
    else:
        conv_args += ["--gin_configs", config_path]
    conv.main(conv_args)
    # Torch snapshots need the legacy-compositing config the converter
    # emits (models/nerfacto_import.py docstring).
    emitted = os.path.join(out_dir, "config.yml")
    eval_config = emitted if (kind == "torch"
                              and os.path.exists(emitted)) else config_path

    eval_args = (["--config", eval_config]
                 if eval_config.endswith((".yml", ".yaml"))
                 else ["--gin_configs", eval_config])
    eval_driver.main(eval_args + ["--data_dir", data_dir,
                                  "--save_dir", out_dir,
                                  "--eval_data", "test"])
    row["our_scores"] = score_renders(os.path.join(work_dir, experiment),
                                      scene, image_type, lpips_weights)

    if have_released:
        # Ours vs released, image-by-image: the released _color.png becomes
        # the "gt" for our render of the same name.
        from nerf_hugs_tpu.metrics import image as nh_image
        import jax.numpy as jnp
        rel_pred_dir = os.path.join(released_dir, scene, "test_preds")
        our_pred_dir = os.path.join(out_dir, "test_preds")
        harness = nh_image.MetricHarness()
        psnrs = []
        from nerf_hugs_tpu.utils import io as nh_io
        for rel_path in sorted(glob.glob(
                os.path.join(rel_pred_dir, "*_color.png"))):
            name = os.path.basename(rel_path)
            our_path = os.path.join(our_pred_dir, name)
            if not os.path.exists(our_path):
                continue
            a = nh_io.load_img(rel_path)[..., :3] / 255.0
            b = nh_io.load_img(our_path)[..., :3] / 255.0
            m = harness(jnp.asarray(b, jnp.float32),
                        jnp.asarray(a, jnp.float32))
            psnrs.append(float(m["psnr"]))
        if psnrs:
            row["ours_vs_released_psnr"] = float(np.mean(psnrs))
    return row


def emit_report(rows, extras, work_dir):
    os.makedirs(work_dir, exist_ok=True)
    with open(os.path.join(work_dir, "PAPER_COMPARISON.json"), "w") as f:
        json.dump({"rows": rows, "extras": extras}, f, indent=2)
    lines = ["# Released-asset validation", ""]
    for k, v in extras.items():
        lines.append(f"- **{k}**: {json.dumps(v)}")
    lines += ["", "| experiment | scene | released PSNR/SSIM | ours "
              "PSNR/SSIM | ours vs released PSNR |", "|---|---|---|---|---|"]
    for r in rows:
        rel = r.get("released_scores", {})
        ours = r.get("our_scores", {})
        fmt = lambda s: (f"{s.get('psnr', float('nan')):.2f}/"
                         f"{s.get('ssim', float('nan')):.4f}" if s else "—")
        vs = r.get("ours_vs_released_psnr")
        lines.append(
            f"| {r['experiment']} | {r['scene']} | {fmt(rel)} | {fmt(ours)} "
            f"| {vs:.2f} |" if vs is not None else
            f"| {r['experiment']} | {r['scene']} | {fmt(rel)} | {fmt(ours)} "
            f"| — |")
    path = os.path.join(work_dir, "PAPER_COMPARISON.md")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return path


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--assets_dir", required=True)
    parser.add_argument("--work_dir", default="/tmp/asset_validation")
    parser.add_argument("--config_map", default=None,
                        help="JSON file {experiment[/scene]: config path}")
    parser.add_argument("--image_type", default="whole",
                        choices=["whole", "half_right", "half_left"])
    parser.add_argument("--skip_render", action="store_true",
                        help="only score released renders; no conversion")
    args = parser.parse_args(argv)

    inv = discover(args.assets_dir)
    print("asset inventory:", json.dumps(
        {k: (v if isinstance(v, (str, type(None))) else len(v))
         for k, v in inv.items()}))

    extras = {}
    if inv["lpips"]:
        extras["lpips"] = check_lpips(inv["lpips"])
        print("LPIPS:", extras["lpips"])
    lpips_weights = inv["lpips"] if (
        inv["lpips"] and extras.get("lpips", {}).get("ok")) else None
    if inv["sam"]:
        extras["sam"] = check_sam(inv["sam"])
        print("SAM:", extras["sam"])

    config_map = {}
    if args.config_map:
        with open(args.config_map) as f:
            config_map = json.load(f)

    # Union of (experiment, scene) pairs seen in checkpoints/ and
    # rendering_results/.
    pairs = {}
    for d in inv["checkpoints"] + inv["rendering_results"]:
        scene = os.path.basename(d)
        experiment = os.path.basename(os.path.dirname(d))
        pairs[(experiment, scene)] = True

    rows = []
    for experiment, scene in sorted(pairs):
        config_path = _guess_config(experiment, scene, config_map)
        print(f"=== {experiment}/{scene} (config: {config_path}) ===",
              flush=True)
        # Per-pair isolation: one bad checkpoint/scene must not abort the
        # whole day-one validation — record the failure in its row and keep
        # going so PAPER_COMPARISON still covers every other pair.
        try:
            rows.append(validate_pair(
                experiment, scene, args.assets_dir, args.work_dir,
                config_path, lpips_weights, args.image_type,
                skip_render=args.skip_render))
        except Exception:
            traceback.print_exc()
            rows.append({"experiment": experiment, "scene": scene,
                         "config": config_path,
                         "error": traceback.format_exc(limit=3)})
        print(json.dumps(rows[-1], default=str), flush=True)

    path = emit_report(rows, extras, args.work_dir)
    print(f"report: {path}")
    return rows, extras


if __name__ == "__main__":
    main()
