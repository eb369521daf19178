"""Profile a train step on real hardware and summarize device-op time.

Captures a jax.profiler trace of 2 train steps (after warmup) and prints
per-op-category device time — the workflow that located the round-2
nerfacto walls (sorts 1.9 s/step, gather fusions; docs/
tpu_gather_cost_model.md). Counterpart of the reference's torch-profiler
runs (reference trains under torch; we read XLA op events instead).

  python tools/profile_step.py flagship              # Mip-NeRF 360 bench shape
  python tools/profile_step.py configs/nerfacto/kubric_nerfacto_tpu.yml
  python tools/profile_step.py <target> --trace-dir /tmp/prof --top 30
  python tools/profile_step.py <target> --instances fusion  # per-op instances

Only STEPS=2 consecutive steps are traced, so a nerfacto profile captures
ONE branch of the proposal-grad cond, not the 1-in-5 mix: the default lands
on SKIP steps (max_steps//2 is a multiple of 5 in every shipped config, and
the traced steps are base+2, base+3). Pass `--step-offset 5` to freeze
train_frac on an UPDATE step (base+5) and profile the proposal backward;
`--step-offset 1` pins skip steps explicitly.
"""

import collections
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

STEPS = 2


def summarize(trace_dir: str, top: int = 25):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert paths, f"no trace under {trace_dir}"
    with gzip.open(sorted(paths)[-1]) as f:
        data = json.load(f)
    tot = collections.Counter()
    cnt = collections.Counter()
    by_src = collections.Counter()
    by_cat = collections.Counter()
    grand = 0.0
    flops = 0
    for e in data["traceEvents"]:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        # XLA device ops are named "<opname>.<id>"; host/python spans are not.
        m = re.match(r"^([a-zA-Z][\w\-]*)\.\d+$", e.get("name", ""))
        if not m:
            continue
        tot[m.group(1)] += e["dur"]
        cnt[m.group(1)] += 1
        grand += e["dur"]
        # Device events carry HLO metadata: source line, category, flops —
        # this is the attribution that located the flagship's 74%-of-peak
        # matmul share and the nerfacto sort/gather walls.
        a = e.get("args") or {}
        if "hlo_category" in a:
            by_cat[a["hlo_category"]] += e["dur"]
            by_src[a.get("source", "?")] += e["dur"]
            flops += int(a.get("model_flops", 0) or 0)
    print(f"device op total: {grand / 1e3 / STEPS:.1f} ms/step, "
          f"model_flops {flops / STEPS / 1e12:.2f} TF/step")
    for name, d in tot.most_common(top):
        print(f"{d / 1e3 / STEPS:9.2f} ms/step  x{cnt[name] // STEPS:<5d} {name}")
    print("== by hlo_category ==")
    for k, v in by_cat.most_common(10):
        print(f"{v / 1e3 / STEPS:9.2f} ms/step  {k}")
    print("== by source line ==")
    for k, v in by_src.most_common(top):
        print(f"{v / 1e3 / STEPS:9.2f} ms/step  "
              f"{k.replace('/root/repo/', '')}")


def top_instances(trace_dir: str, prefix: str = "fusion", top: int = 20):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    with gzip.open(sorted(paths)[-1]) as f:
        data = json.load(f)
    tot = collections.Counter()
    for e in data["traceEvents"]:
        if (e.get("ph") == "X" and "dur" in e
                and re.match(rf"^{prefix}\.\d+$", e.get("name", ""))):
            tot[e["name"]] += e["dur"]
    print(f"top {prefix} instances (ms/step):")
    for name, d in tot.most_common(top):
        print(f"{d / 1e3 / STEPS:8.2f}  {name}")


def main():
    target = sys.argv[1] if len(sys.argv) > 1 else "flagship"
    trace_dir = "/tmp/nerf_hugs_trace"
    if "--trace-dir" in sys.argv:
        trace_dir = sys.argv[sys.argv.index("--trace-dir") + 1]
    top = int(sys.argv[sys.argv.index("--top") + 1]) if "--top" in sys.argv \
        else 25
    step_offset = (int(sys.argv[sys.argv.index("--step-offset") + 1])
                   if "--step-offset" in sys.argv else None)

    from nerf_hugs_tpu.parallel import mesh as mesh_lib
    from nerf_hugs_tpu.train import step as train_step_lib
    from nerf_hugs_tpu.utils import structs
    from tools.bench_nerfacto import _example_rays

    if target == "flagship":
        from __graft_entry__ import _flagship_config
        config = _flagship_config(tiny=False)
        config.batch_size = 16384
    else:
        from nerf_hugs_tpu.configs.yaml_loader import load_yaml_config
        config = load_yaml_config(target)

    mesh = mesh_lib.make_mesh(jax.devices())
    _, state, _, train_step, _ = train_step_lib.setup_model(
        config, jax.random.PRNGKey(0), mesh)
    state = mesh_lib.replicate(state, mesh)
    bs = config.batch_size
    rays = _example_rays(bs)
    rgb = np.random.RandomState(1).rand(bs, 3).astype(np.float32)
    batch = mesh_lib.shard_batch(structs.Batch(rays=rays, rgb=rgb), mesh)
    thresholds = mesh_lib.replicate(jnp.ones(config.num_ray_levels), mesh)
    rng = mesh_lib.replicate(jax.random.PRNGKey(1), mesh)

    def frac(i):  # advance so proposal-update cond steps are representative
        if step_offset is not None:  # frozen: pin every step to one branch
            return jnp.asarray(
                (config.max_steps // 2 + step_offset) / config.max_steps)
        return jnp.asarray(
            (config.max_steps // 2 + i) / config.max_steps)

    for i in range(2):
        state, stats, rng = train_step(rng, state, batch, frac(i), thresholds)
    float(stats["loss"])
    with jax.profiler.trace(trace_dir):
        for i in range(STEPS):
            state, stats, rng = train_step(rng, state, batch, frac(2 + i),
                                           thresholds)
        float(stats["loss"])
    summarize(trace_dir, top)
    if "--instances" in sys.argv:
        top_instances(trace_dir,
                      sys.argv[sys.argv.index("--instances") + 1], top)


if __name__ == "__main__":
    main()
