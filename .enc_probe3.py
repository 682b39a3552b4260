import time, numpy as np, jax, jax.numpy as jnp
import bench as BZ
from saprobe_alac_tpu.ops.encode_device import encode_walk

cfg, packets, pcm = BZ.make_fixture()
FRAME, BATCH = BZ.FRAME, 2048
n_pk = pcm.shape[0] // FRAME
pcms = [pcm[i*FRAME:(i+1)*FRAME] for i in range(n_pk)]
ns_arr = np.full(BATCH, FRAME, np.int32)
coefs_arr = np.zeros((1, 32), np.int32); coefs_arr[0,:6] = [160,80,40,20,10,5]
es = ((6, 9, (4,), 0, True),)
def enc(p):
    return encode_walk(jnp.asarray(p), jnp.asarray(ns_arr), jnp.full(BATCH,1,jnp.int32),
                       jnp.asarray(coefs_arr), FRAME, 2, 16, cfg.pb, cfg.mb, cfg.kb,
                       es, 1, 0, False, False, True)

# (a) all lanes identical = real packet 0
pa = np.broadcast_to(pcms[0].T, (BATCH, 2, FRAME)).astype(np.int32).copy()
# (b) diverse real
pb = np.zeros((BATCH, 2, FRAME), np.int32)
for i in range(BATCH): pb[i] = pcms[i % n_pk].T
# (c) probe1 synthetic identical
rng = np.random.default_rng(0)
t = np.linspace(0, 1, FRAME)
sig = (3000*np.sin(2*np.pi*440*t) + 200*rng.standard_normal(FRAME)).astype(np.int32)
pc = np.broadcast_to(sig, (BATCH, 2, FRAME)).copy()

for name, p in [("identical-real", pa), ("diverse-real", pb), ("identical-sine", pc)]:
    w,b = enc(p); jax.block_until_ready((w,b))
    t0=time.perf_counter(); w,b = enc(p); jax.block_until_ready((w,b))
    print(f"{name}: {(time.perf_counter()-t0)*1e3:.1f} ms  maxbits={int(jnp.max(b))}")
