import time, statistics, numpy as np, jax, jax.numpy as jnp
import bench as BZ
from saprobe_alac_tpu.ops.encode_device import encode_walk

cfg, packets, pcm = BZ.make_fixture()
FRAME, BATCH = BZ.FRAME, 2048
n_pk = pcm.shape[0] // FRAME
pcms = [pcm[i*FRAME:(i+1)*FRAME] for i in range(n_pk)]
planes = np.zeros((BATCH, 2, FRAME), np.int32)
for i in range(BATCH):
    planes[i] = pcms[i % n_pk].T
ns_arr = np.full(BATCH, FRAME, np.int32)
elem_specs = ((6, 9, (4,), 0, True),)
coefs_arr = np.zeros((1, 32), np.int32); coefs_arr[0,:6] = [160,80,40,20,10,5]

def enc_fn(p, n_):
    return encode_walk(p, n_, jnp.full(BATCH,1,jnp.int32), jnp.asarray(coefs_arr),
                       FRAME, 2, 16, cfg.pb, cfg.mb, cfg.kb,
                       elem_specs, 1, 0, False, False, True)

dc_iters = 8
evars = [(jnp.asarray(np.roll(planes, v, axis=0)), jnp.asarray(ns_arr)) for v in range(4)]
jax.block_until_ready([b for pair in evars for b in pair])
ecsum = jax.jit(lambda w, b: jnp.sum(w.astype(jnp.int32)) + jnp.sum(b))
t0=time.perf_counter(); np.asarray(ecsum(*enc_fn(*evars[0]))); print(f"warm: {time.perf_counter()-t0:.1f}s")
for rep in range(2):
    t0 = time.perf_counter()
    last=None
    for i in range(dc_iters):
        last = ecsum(*enc_fn(*evars[i % 4]))
    np.asarray(last)
    print(f"rep{rep}: {(time.perf_counter()-t0)/dc_iters*1e3:.1f} ms/batch")
