import time, numpy as np, jax, jax.numpy as jnp
from saprobe_alac_tpu.config import PacketConfig
from saprobe_alac_tpu.encoder import EncoderSpec
from saprobe_alac_tpu.encoder.encode import ChannelSpec
from saprobe_alac_tpu.ops.encode_device import encode_walk

cfg = PacketConfig(frame_length=4096, bit_depth=16, num_channels=2,
                   pb=40, mb=10, kb=14, max_run=255, max_frame_bytes=0,
                   avg_bit_rate=0, sample_rate=44100)
rng = np.random.default_rng(0)

def run(B, F):
    t = np.linspace(0, 1, F, dtype=np.float64)
    sig = (3000*np.sin(2*np.pi*440*t) + 200*rng.standard_normal(F)).astype(np.int32)
    planes = np.broadcast_to(sig, (B, 2, F)).copy()
    ns = np.full(B, F, np.int32)
    coefs = np.zeros((1,32), np.int32); coefs[0,:6] = [160,80,40,20,10,5]
    es = ((6, 9, (4,), 0, True),)
    f = lambda p, n: encode_walk(jnp.asarray(p), jnp.asarray(n),
        jnp.full(B,1,jnp.int32), jnp.asarray(coefs), F, 2, 16,
        cfg.pb, cfg.mb, cfg.kb, es, 1, 0, False, False, True)
    w,b = f(planes, ns); jax.block_until_ready((w,b))
    variants = [(np.roll(planes, v, axis=0), ns) for v in range(3)]
    t0=time.perf_counter()
    outs=[f(*v) for v in variants]
    jax.block_until_ready(outs)
    dt=(time.perf_counter()-t0)/3
    print(f"B={B} F={F}: {dt*1e3:.1f} ms/batch  W={w.shape[1]}")

for B,F in [(256,4096),(1024,4096),(2048,4096),(2048,1024),(2048,256)]:
    run(B,F)
