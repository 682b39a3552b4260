"""Utility helpers: WAV container I/O."""

from .wav import read_wav, wav_header, write_wav

__all__ = ["read_wav", "wav_header", "write_wav"]
