import time, jax, jax.numpy as jnp
def bench(fn, *args, iters=4):
    o = fn(*args); float(jnp.sum(o))
    t0 = time.perf_counter()
    for _ in range(iters): o = fn(*args)
    float(jnp.sum(o))
    return (time.perf_counter()-t0)/iters
k = jax.random.PRNGKey(0)
n = 1<<21
tab = jax.random.normal(k, (1<<17, 2), jnp.float32)
idxs = jax.random.randint(k, (8, n), 0, 1<<17, jnp.int32)
ws = jax.random.uniform(k, (8, n))
def g_only(tab, idxs):
    return sum(jnp.sum(jnp.take(tab, idxs[c], axis=0)) for c in range(8))
print(f"8x2.1M gathers sum-only: {bench(jax.jit(g_only), tab, idxs)*1e3:.0f} ms", flush=True)
def g_acc(tab, idxs, ws):
    acc = jnp.zeros((n, 2))
    for c in range(8):
        acc = acc + ws[c][:, None] * jnp.take(tab, idxs[c], axis=0)
    return acc
print(f"8x2.1M gathers + acc: {bench(jax.jit(g_acc), tab, idxs, ws)*1e3:.0f} ms", flush=True)
def g_acc_flat(tab, idxs, ws):
    # accumulate per-feature on flat [n] arrays (round-1 style consumers)
    a0 = jnp.zeros((n,)); a1 = jnp.zeros((n,))
    for c in range(8):
        v = jnp.take(tab, idxs[c], axis=0)
        a0 = a0 + ws[c] * v[:, 0]
        a1 = a1 + ws[c] * v[:, 1]
    return a0 + a1
print(f"8x2.1M gathers + flat acc: {bench(jax.jit(g_acc_flat), tab, idxs, ws)*1e3:.0f} ms", flush=True)
# one fused 16.8M gather + slice-acc
def g_fused(tab, idxs, ws):
    v = jnp.take(tab, idxs.reshape(-1), axis=0)
    wv = ws.reshape(-1, 1) * v
    acc = wv[:n]
    for c in range(1, 8):
        acc = acc + wv[c*n:(c+1)*n]
    return acc
print(f"1x16.8M gather + slice acc: {bench(jax.jit(g_fused), tab, idxs, ws)*1e3:.0f} ms", flush=True)

# 7-level versions: sliced 3-D table vs separate tables
tabs3 = jax.random.normal(k, (7, 1<<17, 2), jnp.float32)
idxs7 = jax.random.randint(k, (7, 8, n), 0, 1<<17, jnp.int32)
ws7 = jax.random.uniform(k, (7, 8, n))
def lv_sliced(tabs3, idxs7, ws7):
    outs = []
    for l in range(7):
        acc = jnp.zeros((n, 2))
        for c in range(8):
            acc = acc + ws7[l, c][:, None] * jnp.take(tabs3[l], idxs7[l, c], axis=0)
        outs.append(acc)
    return jnp.concatenate(outs, -1)
print(f"7 levels sliced 3-D: {bench(jax.jit(lv_sliced), tabs3, idxs7, ws7)*1e3:.0f} ms", flush=True)
tabs_list = [tabs3[l] for l in range(7)]
def lv_sep(idxs7, ws7, *tabs):
    outs = []
    for l in range(7):
        acc = jnp.zeros((n, 2))
        for c in range(8):
            acc = acc + ws7[l, c][:, None] * jnp.take(tabs[l], idxs7[l, c], axis=0)
        outs.append(acc)
    return jnp.concatenate(outs, -1)
print(f"7 levels separate: {bench(jax.jit(lv_sep), idxs7, ws7, *tabs_list)*1e3:.0f} ms", flush=True)
# also: does the ws slicing from 3-D matter?
