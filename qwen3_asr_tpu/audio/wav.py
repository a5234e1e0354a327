"""Minimal WAV I/O (host side, numpy).

Behavioral contract follows the reference loader (mel_spectrogram.cpp:130-221):
16-bit PCM only, any sample rate is *parsed* but callers must check it equals
16 kHz, stereo is averaged to mono, samples scaled by 1/32768.
"""

from __future__ import annotations

import struct

import numpy as np


class WavError(ValueError):
    pass


def load_wav(path: str, raw_int16: bool = False) -> tuple[np.ndarray, int]:
    """Load a WAV file -> (mono samples, sample_rate).

    Samples are float32 in [-1, 1) by default; `raw_int16=True` returns the
    undivided int16 PCM for mono files (half the bytes — the mel frontend
    scales on device), falling back to float32 for multi-channel input
    (channel averaging is not int16-exact)."""
    with open(path, "rb") as f:
        data = f.read()
    return load_wav_bytes(data, raw_int16, name=path)


def load_wav_bytes(
    data: bytes, raw_int16: bool = False, name: str = "<bytes>"
) -> tuple[np.ndarray, int]:
    """Parse in-memory WAV bytes (serving path) — same contract as load_wav."""
    path = name

    if len(data) < 12 or data[0:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise WavError(f"Not a valid WAV file: {path}")

    pos = 12
    audio_format = num_channels = sample_rate = bits_per_sample = None
    while pos + 8 <= len(data):
        chunk_id = data[pos : pos + 4]
        (chunk_size,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if chunk_id == b"fmt ":
            audio_format, num_channels, sample_rate = struct.unpack_from(
                "<HHI", data, body
            )
            (bits_per_sample,) = struct.unpack_from("<H", data, body + 14)
        elif chunk_id == b"data":
            if audio_format != 1:
                raise WavError(f"Only PCM format supported (got format {audio_format})")
            if bits_per_sample != 16:
                raise WavError(
                    f"Only 16-bit samples supported (got {bits_per_sample} bits)"
                )
            raw = np.frombuffer(data, dtype="<i2", count=chunk_size // 2, offset=body)
            if num_channels == 1:
                if raw_int16:
                    return np.ascontiguousarray(raw, dtype=np.int16), int(sample_rate)
                samples = raw.astype(np.float32) / 32768.0
            else:
                frames = raw.reshape(-1, num_channels).astype(np.float32)
                samples = frames.mean(axis=1) / 32768.0
            return np.ascontiguousarray(samples, dtype=np.float32), int(sample_rate)
        # chunks are word-aligned but the reference does not pad; match it
        pos = body + chunk_size

    raise WavError(f"No data chunk found in WAV file: {path}")


def write_wav(path: str, samples: np.ndarray, sample_rate: int = 16000) -> None:
    """Write float32 mono samples as 16-bit PCM (for tests/benchmarks)."""
    pcm = np.clip(np.asarray(samples, dtype=np.float64) * 32768.0, -32768, 32767)
    pcm = pcm.astype("<i2")
    data_size = pcm.nbytes
    with open(path, "wb") as f:
        f.write(b"RIFF")
        f.write(struct.pack("<I", 36 + data_size))
        f.write(b"WAVE")
        f.write(b"fmt ")
        f.write(struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16))
        f.write(b"data")
        f.write(struct.pack("<I", data_size))
        f.write(pcm.tobytes())
