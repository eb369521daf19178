import time, jax, jax.numpy as jnp
def bench(fn, *args, iters=3):
    o = fn(*args); float(jnp.sum(o))
    t0 = time.perf_counter()
    for _ in range(iters): o = fn(*args)
    float(jnp.sum(o))
    return (time.perf_counter()-t0)/iters
k = jax.random.PRNGKey(0)
# prop-shape gathers: 8 corners x 7 levels of 4.2M from [2^17, 2]
tabs = jax.random.normal(k, (7, 1<<17, 2), jnp.float32)
idxs = jax.random.randint(k, (7, 8, 1<<21), 0, 1<<17, jnp.int32)
ws = jax.random.uniform(k, (7, 8, 1<<21))
def percorner(tabs, idxs, ws):
    outs = []
    for l in range(7):
        acc = jnp.zeros((1<<21, 2))
        for c in range(8):
            acc = acc + ws[l, c][:, None] * jnp.take(tabs[l], idxs[l, c], axis=0)
        outs.append(acc)
    return jnp.concatenate(outs, -1)
dt = bench(jax.jit(percorner), tabs, idxs, ws)
N = 7*8*(1<<21)
print(f"prop per-corner gathers: {dt*1e3:.0f} ms {N/dt/1e6:.0f} M idx/s", flush=True)
def cornerfused(tabs, idxs, ws):
    outs = []
    n = 1<<21
    for l in range(7):
        vals = jnp.take(tabs[l], idxs[l].reshape(-1), axis=0)  # [8n, 2]
        wv = ws[l].reshape(-1, 1) * vals
        acc = wv[:n]
        for c in range(1, 8):
            acc = acc + wv[c*n:(c+1)*n]
        outs.append(acc)
    return jnp.concatenate(outs, -1)
dt = bench(jax.jit(cornerfused), tabs, idxs, ws)
print(f"prop corner-fused + slice acc: {dt*1e3:.0f} ms {N/dt/1e6:.0f} M idx/s", flush=True)
# same but final-field shape check
tabf = jax.random.normal(k, (1<<21, 2), jnp.float32)
idxf = jax.random.randint(k, (8, 1<<21), 0, 1<<21, jnp.int32)
wf = jax.random.uniform(k, (8, 1<<21))
def pc_f(tab, idxs, ws):
    acc = jnp.zeros((1<<21, 2))
    for c in range(8):
        acc = acc + ws[c][:, None] * jnp.take(tab, idxs[c], axis=0)
    return acc
dt = bench(jax.jit(pc_f), tabf, idxf, wf)
print(f"final-level per-corner (2.1M idx x8): {dt*1e3:.0f} ms {8*(1<<21)/dt/1e6:.0f} M idx/s", flush=True)
