"""Split base-config step time: encode fwd+bwd per field vs rest of model."""
import time, jax, jax.numpy as jnp, numpy as np
from nerf_hugs_tpu.ops.hashgrid import HashGridSpec, hashgrid_encode

def bench(fn, *args, iters=3):
    o = fn(*args); float(o if o.ndim==0 else jnp.sum(o))
    t0 = time.perf_counter()
    for _ in range(iters): o = fn(*args)
    float(o if o.ndim==0 else jnp.sum(o))
    return (time.perf_counter()-t0)/iters

k = jax.random.PRNGKey(0)
# final field
spec_f = HashGridSpec(num_levels=16, features_per_level=2, log2_hashmap_size=21,
                      base_res=16, max_res=8192)
# prop field
spec_p = HashGridSpec(num_levels=7, features_per_level=2, log2_hashmap_size=17,
                      base_res=16, max_res=2048)
for name, spec, n in [("final", spec_f, 16384*128), ("prop", spec_p, 16384*256)]:
    tab = tuple(jax.random.uniform(jax.random.PRNGKey(l), (spec.table_size, 2), jnp.float32, -1e-4, 1e-4)
                for l in range(spec.num_levels))
    pos = jax.random.uniform(jax.random.PRNGKey(5), (n, 3))
    fwd = jax.jit(lambda t, p, s=spec: jnp.sum(hashgrid_encode(t, p, s, use_custom_vjp=True)))
    vg = jax.jit(jax.value_and_grad(lambda t, p, s=spec: jnp.sum(hashgrid_encode(t, p, s, use_custom_vjp=True))))
    dtf = bench(fwd, tab, pos)
    o = vg(tab, pos); float(o[0])
    t0 = time.perf_counter()
    for _ in range(3): o = vg(tab, pos)
    float(o[0]); dtv = (time.perf_counter()-t0)/3
    print(f"{name}: fwd {dtf*1e3:.0f} ms, fwd+bwd {dtv*1e3:.0f} ms", flush=True)
