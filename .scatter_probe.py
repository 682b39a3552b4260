import time, numpy as np, jax, jax.numpy as jnp
from functools import partial

B, W, T = 2048, 13448, 1024  # trips scaled down 4x; extrapolate
lanes = jnp.arange(B)

def timeit(name, fn, *args):
    o = fn(*args); jax.block_until_ready(o)
    t0 = time.perf_counter(); o = fn(*args); jax.block_until_ready(o)
    dt = time.perf_counter() - t0
    print(f"{name}: {dt*1e3:.1f} ms for {T} trips -> {dt/T*1e6:.1f} us/trip")

@jax.jit
def v_2d(words, widx0):
    def body(t, st):
        w, wi = st
        wi = (wi + t) % (W - 2)
        w = w.at[lanes, wi].add(t)
        w = w.at[lanes, wi + 1].add(t + 1)
        return (w, wi)
    return jax.lax.fori_loop(0, T, body, (words, widx0))

@jax.jit
def v_flat(words, widx0):
    wf = words.reshape(-1)
    base = lanes * W
    def body(t, st):
        w, wi = st
        wi = (wi + t) % (W - 2)
        w = w.at[base + wi].add(t)
        w = w.at[base + wi + 1].add(t + 1)
        return (w, wi)
    wf, _ = jax.lax.fori_loop(0, T, body, (wf, widx0))
    return wf

@jax.jit
def v_flat1(words, widx0):
    """one combined scatter per trip (B,2) flat indices"""
    wf = words.reshape(-1)
    base = lanes * W
    def body(t, st):
        w, wi = st
        wi = (wi + t) % (W - 2)
        idx = jnp.stack([base + wi, base + wi + 1], 1).reshape(-1)
        upd = jnp.stack([jnp.full(B, t), jnp.full(B, t + 1)], 1).reshape(-1)
        w = w.at[idx].add(upd)
        return (w, wi)
    wf, _ = jax.lax.fori_loop(0, T, body, (wf, widx0))
    return wf

w0 = jnp.zeros((B, W), jnp.int32)
wi0 = jnp.zeros(B, jnp.int32)
timeit("2d-scatter   ", v_2d, w0, wi0)
timeit("flat-scatter ", v_flat, w0, wi0)
timeit("flat-combined", v_flat1, w0, wi0)
