import time, jax, jax.numpy as jnp
from nerf_hugs_tpu.ops import hashgrid_bwd

def bench(fn, *args, iters=3):
    o = fn(*args); float(jnp.sum(o))
    t0 = time.perf_counter()
    for _ in range(iters): o = fn(*args)
    float(jnp.sum(o))
    return (time.perf_counter()-t0)/iters

k = jax.random.PRNGKey(0)
for name, T, K in [("final-level", 1<<21, 16_777_216), ("prop-level", 1<<17, 33_554_432)]:
    keys = jax.random.randint(k, (K,), 0, T, jnp.int32)
    v0 = jax.random.normal(k, (K,), jnp.float32)
    v1 = jax.random.normal(jax.random.PRNGKey(1), (K,), jnp.float32)
    f = jax.jit(lambda kk, a, b, T=T: hashgrid_bwd.block_segment_sum(kk, (a, b), T, "bfloat16", False))
    dt = bench(f, keys, v0, v1)
    print(f"{name} T=2^{T.bit_length()-1} K={K/1e6:.0f}M: {dt*1e3:.0f} ms", flush=True)
    # sort alone
    g = jax.jit(lambda kk, a, b: jax.lax.sort([kk, a, b], num_keys=1)[0])
    dt = bench(g, keys, v0, v1)
    print(f"  sort alone: {dt*1e3:.0f} ms", flush=True)
