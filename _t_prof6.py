import time, jax, jax.numpy as jnp
def bench(fn, *args, iters=4):
    o = fn(*args); float(jnp.sum(o))
    t0 = time.perf_counter()
    for _ in range(iters): o = fn(*args)
    float(jnp.sum(o))
    return (time.perf_counter()-t0)/iters
k = jax.random.PRNGKey(0)
T = 1<<21; N = 1<<24
tab2 = jax.random.normal(k, (T, 2), jnp.float32)
tabf = tab2.reshape(-1)
idx = jax.random.randint(k, (N,), 0, T, jnp.int32)
dt = bench(jax.jit(lambda t, i: jnp.take(t, i, axis=0)), tab2, idx)
print(f"gather from [T,2] arg: {dt*1e3:.0f} ms {N/dt/1e6:.0f} M/s", flush=True)
dt = bench(jax.jit(lambda t, i: jnp.take(t.reshape(-1, 2), i, axis=0)), tabf, idx)
print(f"gather from reshaped flat arg: {dt*1e3:.0f} ms {N/dt/1e6:.0f} M/s", flush=True)
# and with a reduce consumer over the flat param in the same graph (stats-style)
def g2(t, i):
    v = jnp.take(t.reshape(-1, 2), i, axis=0)
    return jnp.sum(v) + jnp.sum(t * t)
dt = bench(jax.jit(g2), tabf, idx)
print(f"gather+flat-stats: {dt*1e3:.0f} ms", flush=True)
