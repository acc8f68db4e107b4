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
    if len(fmt) < 16:   # struct.error is not a ValueError — it would
        # escape the multimodal stage's flag-don't-drop catch set
        raise AudioFormatError(f"fmt chunk too short ({len(fmt)} bytes)")
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


_FP_WINDOWS = 65   # 65 energy windows -> 64 delta-sign bits


def afingerprint64(payload: bytes) -> int:
    """64-bit audio fingerprint (the dHash idea in time: sign of the
    energy DELTA between adjacent windows): mono-mix, split the clip
    into 65 equal-duration windows, bit i = 1 iff window i's mean
    energy exceeds window i+1's. Invariant to uniform gain (energies
    scale together) and approximately to resampling (windows are
    duration-relative); an edit flips only the bits whose local energy
    contour changes."""
    _, _, samples = decode_wav(payload)
    return afingerprint64_samples(samples)


def afingerprint64_samples(samples: np.ndarray) -> int:
    """`afingerprint64` over ALREADY-DECODED samples — the Arrow batch
    stage decodes each payload exactly once (for rate/frame metadata)
    and fingerprints the same array, instead of paying the RIFF walk
    twice per clip."""
    if samples.shape[0] < _FP_WINDOWS:
        raise AudioFormatError(
            f"clip too short to fingerprint ({samples.shape[0]} frames "
            f"< {_FP_WINDOWS})")
    mono = samples.astype(np.float64).mean(axis=1)
    n = mono.shape[0]
    edges = [(i * n) // _FP_WINDOWS for i in range(_FP_WINDOWS + 1)]
    energy = [float(np.mean(mono[edges[i]:edges[i + 1]] ** 2))
              for i in range(_FP_WINDOWS)]
    h = 0
    for i in range(_FP_WINDOWS - 1):
        if energy[i] > energy[i + 1]:
            h |= 1 << i
    return h
