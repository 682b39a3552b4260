"""Magic-cookie (ALACSpecificConfig) parsing.

Behavioral parity with reference config.go:27-81: parses the 24-byte big-endian
ALACSpecificConfig, skipping legacy 'frma' and 'alac' atom wrappers, rejecting
compatibleVersion > 0.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

from .errors import InvalidCookie, UnsupportedVersion

_CONFIG_SIZE = 24
_ATOM_HEADER_SIZE = 12  # size(4) + type(4) + payload(4)


@dataclass(frozen=True)
class PacketConfig:
    """ALAC decoder configuration parsed from the magic cookie.

    Field order and widths mirror ALACSpecificConfig (reference config.go:27-38):
    frame_length u32, bit_depth u8, pb/mb/kb u8 (entropy tuning), num_channels u8,
    max_run u16, max_frame_bytes u32, avg_bit_rate u32, sample_rate u32.
    """

    frame_length: int
    bit_depth: int
    num_channels: int
    pb: int
    mb: int
    kb: int
    max_run: int
    max_frame_bytes: int
    avg_bit_rate: int
    sample_rate: int

    def to_cookie(self) -> bytes:
        """Serialize back to a bare 24-byte ALACSpecificConfig."""
        return struct.pack(
            ">IBBBBBBHIII",
            self.frame_length,
            0,  # compatibleVersion
            self.bit_depth,
            self.pb,
            self.mb,
            self.kb,
            self.num_channels,
            self.max_run,
            self.max_frame_bytes,
            self.avg_bit_rate,
            self.sample_rate,
        )


def parse_magic_cookie(cookie: bytes) -> PacketConfig:
    """Parse an ALACSpecificConfig from a magic cookie.

    Handles the legacy 'frma' and 'alac' atom wrappers (reference config.go:51-58)
    and rejects compatibleVersion > 0 (config.go:64-67).
    """
    data = cookie

    # Skip 'frma' atom if present: [size:4][type:'frma'][format:'alac']
    if len(data) >= _ATOM_HEADER_SIZE and data[4:8] == b"frma":
        data = data[_ATOM_HEADER_SIZE:]

    # Skip 'alac' atom header if present: [size:4][type:'alac'][version:4]
    if len(data) >= _ATOM_HEADER_SIZE and data[4:8] == b"alac":
        data = data[_ATOM_HEADER_SIZE:]

    if len(data) < _CONFIG_SIZE:
        raise InvalidCookie(f"magic cookie too short: {len(data)} bytes")

    compatible_version = data[4]
    if compatible_version > 0:
        raise UnsupportedVersion(f"unsupported compatible version {compatible_version}")

    (
        frame_length,
        _version,
        bit_depth,
        pb,
        mb,
        kb,
        num_channels,
        max_run,
        max_frame_bytes,
        avg_bit_rate,
        sample_rate,
    ) = struct.unpack(">IBBBBBBHIII", data[:_CONFIG_SIZE])

    return PacketConfig(
        frame_length=frame_length,
        bit_depth=bit_depth,
        num_channels=num_channels,
        pb=pb,
        mb=mb,
        kb=kb,
        max_run=max_run,
        max_frame_bytes=max_frame_bytes,
        avg_bit_rate=avg_bit_rate,
        sample_rate=sample_rate,
    )
