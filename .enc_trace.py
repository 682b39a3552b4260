import sys, time, numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, "hack")
import bench as BZ
from trace_top import digest
from saprobe_alac_tpu.ops.encode_device import encode_walk

cfg, packets, pcm = BZ.make_fixture()
FRAME, BATCH = BZ.FRAME, 2048
n_pk = pcm.shape[0] // FRAME
pcms = [pcm[i*FRAME:(i+1)*FRAME] for i in range(n_pk)]
planes = np.zeros((BATCH, 2, FRAME), np.int32)
for i in range(BATCH):
    planes[i] = pcms[i % n_pk].T
ns_arr = np.full(BATCH, FRAME, np.int32)
coefs_arr = np.zeros((1, 32), np.int32); coefs_arr[0,:6] = [160,80,40,20,10,5]
es = ((6, 9, (4,), 0, True),)
def enc_fn(p, n_):
    return encode_walk(p, n_, jnp.full(BATCH,1,jnp.int32), jnp.asarray(coefs_arr),
                       FRAME, 2, 16, cfg.pb, cfg.mb, cfg.kb, es, 1, 0, False, False, True)
pv = jnp.asarray(planes); nv = jnp.asarray(ns_arr)
jax.block_until_ready(enc_fn(pv, nv))  # warm
import shutil, os
td = "/tmp/enc_trace"; shutil.rmtree(td, ignore_errors=True)
with jax.profiler.trace(td):
    out = enc_fn(pv, nv)
    jax.block_until_ready(out)
digest(td, 20, 1)
