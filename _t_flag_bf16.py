import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax, jax.numpy as jnp, numpy as np
from __graft_entry__ import _example_rays, _flagship_config
from nerf_hugs_tpu.parallel import mesh as mesh_lib
from nerf_hugs_tpu.train import step as train_step_lib
from nerf_hugs_tpu.utils import structs

for dtype in ("bfloat16",):
    config = _flagship_config(tiny=False)
    config.batch_size = 16384
    config.model.compute_dtype = dtype
    config.model.remat_mlp = True
    mesh = mesh_lib.make_mesh(jax.devices())
    _, state, _, train_step, _ = train_step_lib.setup_model(config, jax.random.PRNGKey(0), mesh)
    state = mesh_lib.replicate(state, mesh)
    rays = _example_rays(16384)
    rgb = np.random.RandomState(1).rand(16384, 3).astype(np.float32)
    batch = mesh_lib.shard_batch(structs.Batch(rays=rays, rgb=rgb), mesh)
    thresholds = mesh_lib.replicate(jnp.ones(config.num_ray_levels), mesh)
    rng = mesh_lib.replicate(jax.random.PRNGKey(1), mesh)
    for _ in range(3):
        state, stats, rng = train_step(rng, state, batch, jnp.asarray(0.5), thresholds)
    float(stats["loss"])
    t0 = time.perf_counter()
    for _ in range(20):
        state, stats, rng = train_step(rng, state, batch, jnp.asarray(0.5), thresholds)
    float(stats["loss"])
    dt = (time.perf_counter()-t0)/20
    print(f"flagship {dtype}: {dt*1e3:.0f} ms/step = {16384/dt:.0f} rays/s, loss {float(stats['loss']):.4f}", flush=True)
