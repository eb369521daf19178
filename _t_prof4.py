import time, jax, jax.numpy as jnp
def bench(fn, *args, iters=4):
    o = fn(*args); float(jnp.sum(o))
    t0 = time.perf_counter()
    for _ in range(iters): o = fn(*args)
    float(jnp.sum(o))
    return (time.perf_counter()-t0)/iters
k = jax.random.PRNGKey(0)
N = 1<<24
for logT in (14, 15, 16, 17, 18, 19, 21):
    tab = jax.random.normal(k, (1<<logT, 2), jnp.float32)
    idx = jax.random.randint(k, (N,), 0, 1<<logT, jnp.int32)
    dt = bench(jax.jit(lambda t, i: jnp.take(t, i, axis=0)), tab, idx)
    print(f"T=2^{logT}: {dt*1e3:6.0f} ms {N/dt/1e6:5.0f} M idx/s", flush=True)
