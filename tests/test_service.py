"""Corpus decode service: cross-file batching grouped by config."""

import io

import numpy as np

from saprobe_alac_tpu.encoder import EncoderSpec, build_m4a, encode_packets
from saprobe_alac_tpu.caf import build_caf
from saprobe_alac_tpu.service import decode_corpus, iter_decode_corpus

from conftest import expected_pcm_bytes, make_config, music_pcm


def make_file(depth, channels, frame, n, seed, container="m4a"):
    cfg = make_config(depth=depth, channels=channels, frame_length=frame)
    pcm = music_pcm(n, channels, depth, seed=seed)
    pkts = encode_packets(cfg, EncoderSpec(), pcm)
    spp = [min(frame, n - i * frame) for i in range(len(pkts))]
    blob = build_caf(cfg, pkts, spp) if container == "caf" else build_m4a(cfg, pkts, spp)
    return io.BytesIO(blob), pcm, depth


def test_corpus_mixed_configs_and_containers():
    files = [
        make_file(16, 2, 128, 500, seed=1),
        make_file(16, 2, 128, 300, seed=2, container="caf"),  # same config group
        make_file(24, 1, 128, 400, seed=3),  # different group
        make_file(16, 2, 128, 129, seed=4),  # same group as first
    ]
    results = decode_corpus([f for f, _, _ in files], backend="jax", batch_size=4)
    assert len(results) == len(files)
    for res, (_, pcm, depth) in zip(results, files):
        assert res.pcm == expected_pcm_bytes(pcm, depth)
        assert np.array_equal(res.samples(), pcm)


def test_corpus_order_preserved_native():
    files = [make_file(16, 2, 256, 700 - 13 * i, seed=10 + i) for i in range(5)]
    results = decode_corpus([f for f, _, _ in files], backend="native")
    for res, (_, pcm, depth) in zip(results, files):
        assert res.pcm == expected_pcm_bytes(pcm, depth)


def test_corpus_iter_windowed_streaming():
    """Iterator yields every file exactly once (completion order) with a
    small batch window and a single in-flight batch."""
    files = [make_file(16, 2, 128, 200 + 17 * i, seed=20 + i) for i in range(8)]
    seen = {}
    for res in iter_decode_corpus(
        [f for f, _, _ in files], backend="jax", batch_size=3, inflight=1
    ):
        assert res.index not in seen
        seen[res.index] = res
    assert sorted(seen) == list(range(len(files)))
    for i, (_, pcm, depth) in enumerate(files):
        assert seen[i].pcm == expected_pcm_bytes(pcm, depth)


def test_corpus_file_spanning_many_batches():
    """A single file larger than the batch window streams through in order."""
    files = [make_file(16, 1, 64, 64 * 40, seed=31)]
    (res,) = decode_corpus([f for f, _, _ in files], backend="jax", batch_size=8)
    _, pcm, depth = files[0]
    assert res.pcm == expected_pcm_bytes(pcm, depth)


def test_corpus_empty():
    assert decode_corpus([]) == []
