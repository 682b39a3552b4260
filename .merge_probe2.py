import time, numpy as np, jax, jax.numpy as jnp

B, F = 2048, 4096
rng = np.random.default_rng(0)

def timeit(name, fn, variants, n=3):
    s = jax.jit(lambda ys: sum(jnp.sum(y) for y in jax.tree_util.tree_leaves(ys)))
    np.asarray(s(fn(*variants[0])))
    t0 = time.perf_counter()
    for i in range(n):
        r = s(fn(*variants[i % len(variants)]))
    v = np.asarray(r)
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.2f} ms")

@jax.jit
def p1(d):
    def step(st, x):
        mean, zmode = st
        n = jnp.where(x >= 0, 2*x, -2*x-1)
        v = n - zmode
        k = jnp.clip(31 - jax.lax.clz(jnp.maximum(mean >> 9, 1)), 0, 14)
        m = (1 << k) - 1
        qu = v // jnp.maximum(m, 1)
        esc = qu >= 9
        pw = jnp.where(esc, 9, qu + 1)
        pv = jnp.where(esc, 0x1FF, (1 << jnp.minimum(qu+1, 30)) - 2)
        r = v - qu * m
        sw = jnp.where(esc, 17, jnp.where(k == 1, 0, jnp.where(r == 0, k-1, k)))
        sv = jnp.where(esc, v, jnp.where(r == 0, 0, r+1))
        mean2 = jnp.clip(40*n + mean - ((40*mean) >> 9), 0, 0xFFFF)
        zmode2 = jnp.where(mean2 < 128, 1, 0)
        return (mean2, zmode2), (pv, pw, sv, sw)
    _, ys = jax.lax.scan(step, (jnp.full(B, 10), jnp.zeros(B, jnp.int32)), d.T)
    return ys

dv = [jnp.asarray(rng.integers(-2000, 2000, (B, F)), jnp.int32) for _ in range(3)]
timeit("phase1 scan (1ch)", p1, [(d,) for d in dv])

def mk_level(C, Wl):
    @jax.jit
    def lvl(vals, q):
        idx = jnp.arange(Wl)[None, None, :] - q[:, :, None]
        idx = jnp.clip(idx, 0, Wl - 1)
        g = jnp.take_along_axis(vals, idx, axis=2)
        return vals | g
    return lvl

tot = 0.0
for l in range(13):
    C = max(2 * F // (2 ** (l + 1)), 1)
    Wl = min((67 * (2 ** (l + 1))) // 32 + 2, 17154 // max(C,1) + 2)
    f = mk_level(C, Wl)
    vs = [(jnp.asarray(rng.integers(0, 2**31, (B, C, Wl)), jnp.int32),
           jnp.asarray(rng.integers(0, max(Wl//2,1), (B, C)), jnp.int32)) for _ in range(3)]
    s = jax.jit(lambda y: jnp.sum(y))
    np.asarray(s(f(*vs[0])))
    t0 = time.perf_counter()
    for i in range(3): r = s(f(*vs[i % 3]))
    np.asarray(r)
    dt = (time.perf_counter()-t0)/3
    tot += dt
    print(f"level {l}: C={C} Wl={Wl}  {dt*1e3:.2f} ms")
print(f"total merge: {tot*1e3:.1f} ms")
