"""Race-detector-analogue stress for the concurrent host paths.

The reference runs its whole suite under Go's race detector
(/root/reference/hack/common.mk:331-333).  This suite is the equivalent for
the framework's real host concurrency: multi-batch-in-flight
``decode_async``/``finish_async`` pipelining, the streaming facade's device
prefetch, the corpus service's in-flight window, and the OpenMP-threaded
native batch core — all driven from multiple Python threads with randomized
timing, asserting bit-exactness and clean teardown every time.
"""

import io
import random
import threading
import time

import pytest

from saprobe_alac_tpu import native
from saprobe_alac_tpu.decode import Decoder
from saprobe_alac_tpu.decoder import BatchDecoder
from saprobe_alac_tpu.encoder import EncoderSpec, build_m4a, encode_packets
from saprobe_alac_tpu.service import iter_decode_corpus

from conftest import expected_pcm_bytes, make_config, music_pcm

FRAME = 128
DEPTH = 16
CHANNELS = 2
N_SAMPLES = FRAME * 17 + 41  # deliberately a partial last frame


def _fixture(seed=7, n=N_SAMPLES, channels=CHANNELS):
    cfg = make_config(depth=DEPTH, channels=channels, frame_length=FRAME)
    pcm = music_pcm(n, channels, DEPTH, seed=seed)
    pkts = encode_packets(cfg, EncoderSpec(), pcm)
    # Per-packet expected PCM bytes.
    expected = []
    for i in range(len(pkts)):
        lo, hi = i * FRAME, min(n, (i + 1) * FRAME)
        expected.append(expected_pcm_bytes(pcm[lo:hi], DEPTH))
    return cfg, pcm, pkts, expected


def _run_threads(workers, timeout=300.0):
    """Run callables on threads; re-raise the first worker exception."""
    errors = []

    def wrap(fn):
        def run():
            try:
                fn()
            except BaseException as exc:  # noqa: BLE001 - reported to pytest
                errors.append(exc)

        return run

    threads = [threading.Thread(target=wrap(fn), daemon=True) for fn in workers]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout)
        assert not t.is_alive(), "worker thread hung (deadlock?)"
    if errors:
        raise errors[0]


def test_async_pipeline_threads_bit_exact():
    """Several threads, each pipelining multiple async batches in flight
    through its own BatchDecoder, with randomized dispatch/finish timing.
    All share the process-wide JAX runtime and compiled executables."""
    cfg, _, pkts, expected = _fixture()

    def worker(seed):
        def run():
            rng = random.Random(seed)
            dec = BatchDecoder(cfg, backend="jax")
            inflight = []
            for it in range(6):
                lo = rng.randrange(0, len(pkts) // 2)
                hi = rng.randrange(lo + 1, len(pkts) + 1)
                batch = pkts[lo:hi]
                inflight.append((lo, batch, dec.decode_async(batch)))
                time.sleep(rng.random() * 0.01)
                while len(inflight) > 2 or (it == 5 and inflight):
                    # Finish in randomized order: handles are independent.
                    j = rng.randrange(len(inflight))
                    lo2, batch2, handle = inflight.pop(j)
                    out = dec.finish_async(handle, batch2)
                    assert out == expected[lo2 : lo2 + len(batch2)]

        return run

    _run_threads([worker(1000 + i) for i in range(4)])


def test_shared_batchdecoder_concurrent_calls():
    """One BatchDecoder instance hit from multiple threads at once —
    exercises the lazy device-impl init race and concurrent jit dispatch."""
    cfg, _, pkts, expected = _fixture(seed=8)
    dec = BatchDecoder(cfg, backend="jax")
    barrier = threading.Barrier(4)

    def worker(seed):
        def run():
            rng = random.Random(seed)
            barrier.wait()
            for _ in range(5):
                lo = rng.randrange(0, len(pkts) - 1)
                hi = rng.randrange(lo + 1, len(pkts) + 1)
                assert dec.decode_packets(pkts[lo:hi]) == expected[lo:hi]
                time.sleep(rng.random() * 0.005)

        return run

    _run_threads([worker(2000 + i) for i in range(4)])


def test_facade_prefetch_threads_with_seeks():
    """Per-thread streaming Decoders (device prefetch path) over the same
    blob, interleaving reads and seeks; prefetch invalidation across seeks
    must never leak stale windows into another thread's output."""
    cfg, pcm, pkts, _ = _fixture(seed=9)
    spp = [min(FRAME, N_SAMPLES - i * FRAME) for i in range(len(pkts))]
    blob = build_m4a(cfg, pkts, spp)
    whole = expected_pcm_bytes(pcm, DEPTH)
    bpf = CHANNELS * 2  # bytes per PCM frame at 16-bit stereo

    def worker(seed):
        def run():
            rng = random.Random(seed)
            dec = Decoder(io.BytesIO(blob), backend="jax", batch_size=4)
            for _ in range(8):
                t = rng.random() * dec.duration()
                pos = dec.seek(t)
                start = round(pos * cfg.sample_rate) * bpf
                want = rng.randrange(1, 5 * FRAME) * bpf
                got = dec.read(want)
                assert got == whole[start : start + len(got)]
                assert len(got) == min(want, len(whole) - start)
                time.sleep(rng.random() * 0.005)
            # Tail read drains to EOF cleanly after the last seek.
            dec.seek(0.0)
            assert dec.read() == whole

        return run

    _run_threads([worker(3000 + i) for i in range(4)])


def test_corpus_iter_threads():
    """Concurrent iter_decode_corpus instances (each its own window state,
    sharing compiled executables + the device) stay bit-exact and terminate."""
    file_sets = []
    for t in range(3):
        files = []
        for k in range(4):
            n = FRAME * (5 + k) + 13 * t
            cfg, pcm, pkts, _ = _fixture(seed=100 + 10 * t + k, n=n)
            spp = [min(FRAME, n - i * FRAME) for i in range(len(pkts))]
            files.append((build_m4a(cfg, pkts, spp), expected_pcm_bytes(pcm, DEPTH)))
        file_sets.append(files)

    def worker(files, seed):
        def run():
            rng = random.Random(seed)
            sources = [io.BytesIO(b) for b, _ in files]
            got = {}
            for res in iter_decode_corpus(sources, backend="jax", batch_size=3, inflight=2):
                got[res.index] = res.pcm
                time.sleep(rng.random() * 0.003)
            assert sorted(got) == list(range(len(files)))
            for i, (_, want) in enumerate(files):
                assert got[i] == want

        return run

    _run_threads([worker(fs, 4000 + i) for i, fs in enumerate(file_sets)])


@pytest.mark.skipif(not native.available(), reason="native core not built")
def test_native_batch_threads():
    """The OpenMP-threaded C++ batch core called from multiple Python threads
    simultaneously (nested host parallelism) — per-call buffers, no shared
    mutable state, so outputs must be bit-exact under contention."""
    cfg, _, pkts, expected = _fixture(seed=11)
    barrier = threading.Barrier(4)

    def worker(seed):
        def run():
            rng = random.Random(seed)
            barrier.wait()
            for _ in range(8):
                lo = rng.randrange(0, len(pkts) - 1)
                hi = rng.randrange(lo + 1, len(pkts) + 1)
                out, lens, errs = native.decode_batch(cfg, pkts[lo:hi])
                assert (errs == 0).all()
                for j in range(hi - lo):
                    assert out[j, : lens[j]].tobytes() == expected[lo + j]

        return run

    _run_threads([worker(5000 + i) for i in range(4)])
