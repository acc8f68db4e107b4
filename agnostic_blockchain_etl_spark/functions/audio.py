"""Pure-Python WAV (RIFF PCM16) codec for the multimodal audio stage.

Same rationale as ``imaging.py``: the container ships no audio
libraries, so the real-decode slot is implemented from the published
RIFF/WAVE spec for the uncompressed 16-bit PCM case — header walk over
chunks (``fmt `` then ``data``, tolerating extra chunks like ``LIST``),
little-endian samples, interleaved channels. Feature extraction (RMS,
peak, duration) runs on numpy over the decoded sample matrix.
"""

from __future__ import annotations

import struct

import numpy as np


class AudioFormatError(ValueError):
    """Malformed or unsupported audio payload."""


def encode_wav(sample_rate: int, channels: int, pcm16: bytes) -> bytes:
    """Build a RIFF/WAVE container around interleaved little-endian
    int16 PCM bytes."""
    if len(pcm16) % (2 * channels):
        raise AudioFormatError("pcm length not a multiple of frame size")
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate,
                      channels * 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", len(pcm16)) + pcm16
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """(sample_rate, channels, samples[n_frames, channels] int16) from a
    RIFF/WAVE payload holding uncompressed 16-bit PCM."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise AudioFormatError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8: pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)          # chunks are word-aligned
    if fmt is None or data is None:
        raise AudioFormatError("missing fmt/data chunk")
    codec, channels, rate, _, _, bits = struct.unpack_from("<HHIIHH", fmt)
    if codec != 1 or bits != 16:
        raise AudioFormatError(
            f"unsupported WAV variant: codec={codec} bits={bits} "
            "(only uncompressed PCM16)")
    if channels < 1:
        raise AudioFormatError(f"bad channel count {channels}")
    frame = 2 * channels
    usable = len(data) - (len(data) % frame)
    samples = np.frombuffer(data[:usable], dtype="<i2") \
        .reshape(-1, channels)
    return rate, channels, samples


def audio_features(payload: bytes) -> dict:
    """The audio stage's feature row: sample rate, channels, frame count,
    duration, RMS and peak amplitude (int16 domain) — computed over the
    DECODED samples, so a wrong header walk or byte order changes the
    answer."""
    rate, channels, samples = decode_wav(payload)
    x = samples.astype(np.float64)
    return {
        "sample_rate": rate,
        "channels": channels,
        "n_frames": int(samples.shape[0]),
        "duration_s": round(samples.shape[0] / rate, 6) if rate else 0.0,
        "rms": round(float(np.sqrt(np.mean(x * x))), 3)
               if samples.size else 0.0,
        "peak": int(np.max(np.abs(x))) if samples.size else 0,
    }
