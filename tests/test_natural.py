"""Natural-file conformance runner.

Analogue of the reference's TestConformanceNatural (conformance_test.go:642-704):
point CONFORMANCE_NATURAL_DIR at a directory of real .m4a files and every
file is decoded by all available backends, which must agree byte-for-byte
(no source PCM needed).
"""

import io
import os
from pathlib import Path

import pytest

from saprobe_alac_tpu import native, new_decoder

NATURAL_DIR = os.environ.get("CONFORMANCE_NATURAL_DIR")

pytestmark = pytest.mark.skipif(
    not NATURAL_DIR, reason="set CONFORMANCE_NATURAL_DIR to run natural-file conformance"
)


def natural_files():
    if not NATURAL_DIR:
        return []
    return sorted(Path(NATURAL_DIR).rglob("*.m4a"))


@pytest.mark.parametrize("path", natural_files(), ids=lambda p: p.name)
def test_natural_file(path):
    data = path.read_bytes()

    dec = new_decoder(io.BytesIO(data), backend="scalar")
    fmt = dec.format()
    assert fmt.bit_depth in (16, 20, 24, 32)
    assert 1 <= fmt.channels <= 8
    want = dec.read()

    if native.available():
        got = new_decoder(io.BytesIO(data), backend="native").read()
        assert got == want, f"native backend disagrees on {path.name}"

    got = new_decoder(io.BytesIO(data), backend="jax", batch_size=32).read()
    assert got == want, f"jax backend disagrees on {path.name}"

    # Seek spot-check at the midpoint.
    dec = new_decoder(io.BytesIO(data), backend="scalar")
    pos = dec.seek(dec.duration() / 2)
    frame_off = round(pos * fmt.sample_rate)
    from saprobe_alac_tpu.formats import bytes_per_sample

    assert dec.read() == want[frame_off * fmt.channels * bytes_per_sample(fmt.bit_depth):]
