import time, numpy as np, jax, jax.numpy as jnp

B, F = 2048, 4096

def timeit(name, fn, *args, n=3):
    o = fn(*args); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n): o = fn(*args)
    jax.block_until_ready(o)
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.1f} ms")

# Phase-1 style scan: ~30 vector ops on (B,) per step, 4 dense outputs.
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
    (mean, z), ys = jax.lax.scan(step, (jnp.full(B, 10), jnp.zeros(B, jnp.int32)),
                                 d.T)  # scan over F, (F, B) slices
    return ys

d = jnp.asarray(np.random.default_rng(0).integers(-2000, 2000, (B, F)), jnp.int32)
timeit("phase1 scan (1ch)", p1, d)

# Phase-2 doubling merge level: take_along_axis gather along last axis.
def mk_level(C, Wl):
    @jax.jit
    def lvl(vals, q):
        # shifted-b gather: out[j] = b[j - q]
        idx = jnp.arange(Wl)[None, None, :] - q[:, :, None]
        idx = jnp.clip(idx, 0, Wl - 1)
        g = jnp.take_along_axis(vals, idx, axis=2)
        return vals | g
    return lvl

rng = np.random.default_rng(1)
tot = 0.0
for l in range(13):
    C = max(2 * F // (2 ** (l + 1)), 1)   # chunks after merging at this level
    Wl = min((67 * (2 ** (l + 1))) // 32 + 2, 2*F*67//32 + 2)
    if C * Wl > 2 * F * 67 // 32 * 2: Wl = (2 * F * 67 // 32 * 2) // C
    vals = jnp.asarray(rng.integers(0, 2**31, (B, C, Wl)), jnp.int32)
    q = jnp.asarray(rng.integers(0, max(Wl//2,1), (B, C)), jnp.int32)
    f = mk_level(C, Wl)
    o = f(vals, q); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(3): o = f(vals, q)
    jax.block_until_ready(o)
    dt = (time.perf_counter()-t0)/3
    tot += dt
    print(f"level {l}: C={C} Wl={Wl}  {dt*1e3:.2f} ms")
print(f"total merge: {tot*1e3:.1f} ms")
