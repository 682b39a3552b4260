"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Real TPU hardware is only used by bench.py; tests validate kernels and
sharding on host CPU (the driver separately dry-run-compiles the multi-chip
path via __graft_entry__.dryrun_multichip).
"""

import os
import sys

# Must be set before jax initializes a backend.  NB: the axon TPU plugin in
# this image ignores the JAX_PLATFORMS env var, so use the config API too.
# Only force the platform when running under pytest: hack/ hardware scripts
# import this module for its fixture helpers (make_config/music_pcm) and
# must keep their TPU backend (hw_smoke regression: a CPU pin here silently
# turned the hardware smoke into a CPU run).
_UNDER_PYTEST = "pytest" in sys.modules

if _UNDER_PYTEST:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

if _UNDER_PYTEST:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from saprobe_alac_tpu.config import PacketConfig


def make_config(
    depth: int = 16,
    channels: int = 2,
    frame_length: int = 4096,
    sample_rate: int = 44100,
    pb: int = 40,
    mb: int = 10,
    kb: int = 14,
    max_run: int = 255,
) -> PacketConfig:
    """A PacketConfig with Apple-standard entropy tuning defaults."""
    return PacketConfig(
        frame_length=frame_length,
        bit_depth=depth,
        num_channels=channels,
        pb=pb,
        mb=mb,
        kb=kb,
        max_run=max_run,
        max_frame_bytes=0,
        avg_bit_rate=0,
        sample_rate=sample_rate,
    )


def music_pcm(
    num_samples: int, channels: int, depth: int, seed: int = 0, tonality: float = 0.98
) -> np.ndarray:
    """Deterministic music-like PCM: correlated tones + low-level noise.

    ``tonality`` near 1 compresses well (predictor-dominated profile);
    near 0 approaches white noise (entropy/escape-dominated profile) —
    the two benchmark regimes of the reference (QA.md:138-147, 199-229).
    """
    rng = np.random.default_rng(seed)
    t = np.arange(num_samples)
    sig = np.zeros((num_samples, channels))
    for c in range(channels):
        tone = (
            0.35 * np.sin(2 * np.pi * t / (97.3 + 11 * c))
            + 0.2 * np.sin(2 * np.pi * t / (23.7 + 3 * c))
            + 0.1 * np.sin(2 * np.pi * t / (389.0 + 29 * c))
        )
        noise = rng.standard_normal(num_samples)
        sig[:, c] = tonality * tone * 0.8 + (1 - tonality) * noise * 0.5
    scale = (1 << (depth - 1)) - 1
    return np.clip(sig * scale, -scale - 1, scale).astype(np.int64)


def expected_pcm_bytes(pcm: np.ndarray, depth: int) -> bytes:
    """Interleaved LE bytes the decoder must produce for raw samples."""
    from saprobe_alac_tpu.codec.matrixing import pack_pcm

    vals = pcm.astype(np.int64)
    if depth == 20:
        vals = vals << 4
    return pack_pcm(vals, depth)


@pytest.fixture
def rng() -> np.random.Generator:
    return np.random.default_rng(1234)
