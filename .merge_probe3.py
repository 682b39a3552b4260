import time, numpy as np, jax, jax.numpy as jnp
from functools import partial

B, F = 2048, 4096
rng = np.random.default_rng(0)

def shift_words_static(arr, j):
    """Shift right by 2**j words along last axis (zeros shifted in)."""
    s = 1 << j
    if s >= arr.shape[-1]:
        return jnp.zeros_like(arr)
    pad = jnp.zeros(arr.shape[:-1] + (s,), arr.dtype)
    return jnp.concatenate([pad, arr[..., :-s]], axis=-1)

def merge_level(vals, widths):
    """vals (B, C, Wl): C chunks; pairwise merge -> (B, C//2, 2*Wl)."""
    B_, C, Wl = vals.shape
    a = vals[:, 0::2]
    b = vals[:, 1::2]
    wa = widths[:, 0::2]
    out = jnp.concatenate([a, jnp.zeros_like(b)], axis=-1)
    bb = jnp.concatenate([b, jnp.zeros_like(b)], axis=-1)
    # bit shift r = wa & 31 (per (B, C//2), broadcast along words)
    r = (wa & 31)[..., None]
    hi = jnp.where(r == 0, bb, (bb >> r) & ((1 << (32 - jnp.minimum(r,31))) - 1).astype(jnp.int32))
    # note: need logical shift; emulate
    ub = bb.astype(jnp.uint32)
    sh = (ub >> r.astype(jnp.uint32))
    prev = jnp.concatenate([jnp.zeros_like(ub[..., :1]), ub[..., :-1]], axis=-1)
    carry = jnp.where(r == 0, jnp.uint32(0), prev << (32 - r).astype(jnp.uint32))
    bshift = (sh | carry).astype(jnp.int32)
    # word shift q = wa >> 5 via log-rolls
    q = (wa >> 5)[..., None]
    x = bshift
    j = 0
    while (1 << j) <= 2 * Wl:
        x = jnp.where((q & (1 << j)) != 0, shift_words_static(x, j), x)
        j += 1
    return out | x, widths[:, 0::2] + widths[:, 1::2]

@jax.jit
def full_merge(vals, widths):
    v, w = vals, widths
    while v.shape[1] > 1:
        v, w = merge_level(v, w)
    return v, w

# realistic: 2F cells of 2 words (16-bit case), widths 0..52
C0, W0 = 2 * F, 2
mk = lambda: (jnp.asarray(rng.integers(0, 2**31, (B, C0, W0)), jnp.int32),
              jnp.asarray(rng.integers(0, 53, (B, C0)), jnp.int32))
vars_ = [mk() for _ in range(3)]
s = jax.jit(lambda t: jnp.sum(t[0]) + jnp.sum(t[1]))
np.asarray(s(full_merge(*vars_[0])))
t0 = time.perf_counter()
for i in range(3):
    rr = s(full_merge(*vars_[i % 3]))
np.asarray(rr)
print(f"full log-roll merge (C0={C0}, W0={W0}): {(time.perf_counter()-t0)/3*1e3:.1f} ms/batch")
