"""Benchmark eval/render throughput (no grad) on real hardware.

The serving path: `create_render_fn`'s jitted full-extras forward over
sharded 16384-ray chunks — what eval.py / render.py execute per image
(reference: pmapped render fn, MipNeRF360/internal/train_utils.py:555-576).
Prints one JSON line per target.

  python tools/bench_render.py flagship
  python tools/bench_render.py configs/nerfacto/kubric_nerfacto_tpu.yml
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

CHUNK = 16384
CHUNKS = 12


def bench_target(target: str):
    from nerf_hugs_tpu.parallel import mesh as mesh_lib
    from nerf_hugs_tpu.train import step as train_step_lib
    from tools.bench_nerfacto import _example_rays

    if target == "flagship":
        from __graft_entry__ import _flagship_config
        config = _flagship_config(tiny=False)
    else:
        from nerf_hugs_tpu.configs.yaml_loader import load_yaml_config
        config = load_yaml_config(target)

    mesh = mesh_lib.make_mesh(jax.devices())
    model, state, render_fn, _, _ = train_step_lib.setup_model(
        config, jax.random.PRNGKey(0), mesh)
    variables = mesh_lib.replicate(state.params, mesh)
    rays = mesh_lib.shard_batch(_example_rays(CHUNK), mesh)
    frac = jnp.asarray(1.0)

    out = render_fn(variables, frac, rays)
    float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])  # tunnel barrier
    t0 = time.perf_counter()
    for _ in range(CHUNKS):
        out = render_fn(variables, frac, rays)
    float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
    dt = (time.perf_counter() - t0) / CHUNKS
    return {
        "target": target,
        "sec_per_chunk": round(dt, 4),
        "render_rays_per_sec": round(CHUNK / dt, 1),
        "sec_per_800x800_image": round(dt * (800 * 800 / CHUNK), 2),
    }


def main():
    for t in (sys.argv[1:] or ["flagship"]):
        print(json.dumps(bench_target(t)), flush=True)


if __name__ == "__main__":
    main()
