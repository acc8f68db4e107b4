"""Pure-Python MPEG audio (MP3) frame parser for the multimodal stage.

Same rationale as ``imaging.py``/``audio.py``: no audio libraries in the
container, so the MP3 slot is implemented spec-direct (ISO/IEC 11172-3
§2.4.1 frame header layout; the de-facto MPEG-2.5 extension) for the
part a 100 TB curation pipeline actually consumes: **stream metadata**
— sync walk, per-frame header fields, bitrate/samplerate tables,
ID3v2 skip, Xing/Info VBR tag detection, frame count and duration.

Full SAMPLE decode (scalefactors → Huffman spectrum → requantize →
alias reduction → IMDCT → polyphase synthesis) is a deliberate
non-goal, documented in COVERAGE.md: it is ~1k lines of DSP whose
curation value is marginal (quality/dedup signals for audio come from
duration, bitrate, channel layout and — where PCM is available, e.g.
WAV — the fingerprint), and it cannot be anchor-tested here without an
encoder twin. Payloads reaching a PCM-demanding stage (fingerprint,
resample) keep the flag-don't-drop contract: they flag
``decode_error`` and are never dropped.
"""

from __future__ import annotations

import struct

from .audio import AudioFormatError

# bitrate_kbps[version_group][bitrate_index]; index 0 = free format
# (unsupported — frame length is then unknowable without scanning for
# the next sync, a corrupt-data amplifier), index 15 = forbidden.
_BITRATE_V1_L3 = (None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
                  224, 256, 320, None)
_BITRATE_V2_L3 = (None, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                  144, 160, None)
_RATES = {3: (44100, 48000, 32000),    # MPEG-1
          2: (22050, 24000, 16000),    # MPEG-2
          0: (11025, 12000, 8000)}     # MPEG-2.5
_MODES = ("stereo", "joint_stereo", "dual_channel", "mono")


def _id3v2_size(payload: bytes) -> int:
    """Bytes to skip for a leading ID3v2 container (syncsafe size)."""
    if payload[:3] != b"ID3" or len(payload) < 10:
        return 0
    if any(b & 0x80 for b in payload[6:10]):
        raise AudioFormatError("corrupt ID3v2 syncsafe size")
    size = ((payload[6] << 21) | (payload[7] << 14)
            | (payload[8] << 7) | payload[9])
    # ID3v2.4 footer flag (§3.1 flags bit 4): a 10-byte footer follows
    # the tag payload and is NOT counted in the syncsafe size
    footer = 10 if payload[5] & 0x10 else 0
    return 10 + size + footer


def parse_frame_header(payload: bytes, pos: int) -> dict:
    """Decode the 32-bit frame header at ``pos`` → fields + computed
    ``frame_len``/``n_samples``. Raises ``AudioFormatError`` on
    anything that is not a valid Layer III header."""
    if pos + 4 > len(payload):
        raise AudioFormatError("truncated MP3 frame header")
    h = struct.unpack_from(">I", payload, pos)[0]
    if h >> 21 != 0x7FF:
        raise AudioFormatError(f"no MP3 frame sync at {pos}")
    version = (h >> 19) & 3         # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
    layer = (h >> 17) & 3           # 1=Layer III
    if version == 1:
        raise AudioFormatError("reserved MPEG version id")
    if layer != 1:
        raise AudioFormatError(
            f"not Layer III (layer bits {layer:02b}; "
            "Layer I/II parsing not implemented)")
    br_idx = (h >> 12) & 0xF
    table = _BITRATE_V1_L3 if version == 3 else _BITRATE_V2_L3
    bitrate = table[br_idx]
    if br_idx == 0:
        raise AudioFormatError("free-format bitrate unsupported")
    if bitrate is None:
        raise AudioFormatError("forbidden bitrate index 15")
    sr_idx = (h >> 10) & 3
    if sr_idx == 3:
        raise AudioFormatError("reserved sample-rate index")
    rate = _RATES[version][sr_idx]
    padding = (h >> 9) & 1
    mode = (h >> 6) & 3
    if (h & 3) == 2:
        raise AudioFormatError("reserved emphasis value")
    n_samples = 1152 if version == 3 else 576
    frame_len = (n_samples // 8) * bitrate * 1000 // rate + padding
    return {"version": {3: "MPEG1", 2: "MPEG2", 0: "MPEG2.5"}[version],
            "bitrate_kbps": bitrate, "sample_rate": rate,
            "channels": 1 if mode == 3 else 2, "mode": _MODES[mode],
            "crc": (h >> 16) & 1 == 0, "n_samples": n_samples,
            "frame_len": frame_len}


def _xing_offset(version: str, channels: int, crc: bool) -> int:
    """Side-info length (after the 4-byte header and the optional
    16-bit CRC that protection_bit=0 inserts before it) in front of a
    Xing/Info tag — ISO 11172-3 §2.4.1.7/§2.4.1.8 sizes."""
    off = 4 + (2 if crc else 0)
    if version == "MPEG1":
        return off + (17 if channels == 1 else 32)
    return off + (9 if channels == 1 else 17)


def mp3_metadata(payload: bytes) -> dict:
    """Walk every frame of an MP3 stream → ``{n_frames, sample_rate,
    channels, mode, bitrate_kbps, vbr, duration_s, version,
    has_id3v2}``. ``bitrate_kbps`` is the stream average (equals the
    constant rate for CBR); a Xing/Info tag frame is detected and
    excluded from the audio frame count (it carries no samples).
    Frames must chain contiguously (header-computed lengths) — a
    mid-stream desync raises rather than guessing, and a trailing
    ID3v1 tag (128-byte ``TAG`` block) is tolerated."""
    start = _id3v2_size(payload)
    if start >= len(payload):
        raise AudioFormatError("ID3v2 container with no audio frames")
    pos, n = start, len(payload)
    frames = 0
    vbr_tag = False
    bitrates = []
    first = None
    tag_checked = False
    samples = 0
    while pos + 4 <= n:
        if payload[pos:pos + 3] == b"TAG" and n - pos == 128:
            break                                  # trailing ID3v1
        f = parse_frame_header(payload, pos)
        if pos + f["frame_len"] > n:
            raise AudioFormatError(
                f"truncated final frame (header promises "
                f"{f['frame_len']} bytes, {n - pos} remain)")
        if first is None:
            # only the literal FIRST frame can be a Xing/Info tag frame;
            # `first` must bind to the first AUDIO frame, not the tag —
            # otherwise version/mode/channels and the format-change
            # baseline report the tag frame's header
            if not tag_checked:
                tag_checked = True
                off = pos + _xing_offset(f["version"], f["channels"],
                                         f["crc"])
                tag = payload[off:off + 4]
                if tag in (b"Xing", b"Info"):
                    vbr_tag = tag == b"Xing"
                    pos += f["frame_len"]
                    continue                       # tag frame: no audio
            first = f
        if (f["sample_rate"], f["channels"]) != (first["sample_rate"],
                                                 first["channels"]):
            raise AudioFormatError("mid-stream format change")
        frames += 1
        samples += f["n_samples"]
        bitrates.append(f["bitrate_kbps"])
        pos += f["frame_len"]
    if frames == 0:
        raise AudioFormatError("no MP3 audio frames")
    if n - pos not in (0,) and not (payload[pos:pos + 3] == b"TAG"
                                    and n - pos == 128):
        raise AudioFormatError(
            f"trailing garbage after last frame ({n - pos} bytes)")
    # the format-change guard pins a single rate across the stream
    rate = first["sample_rate"]
    return {"n_frames": frames,
            "sample_rate": rate,
            "channels": first["channels"],
            "mode": first["mode"],
            "version": first["version"],
            "bitrate_kbps": round(sum(bitrates) / len(bitrates), 3),
            "vbr": vbr_tag or len(set(bitrates)) > 1,
            "duration_s": round(samples / rate, 6),
            "has_id3v2": start > 0}


def encode_mp3_frames(n_frames: int, bitrate_kbps: int = 128,
                      sample_rate: int = 44100, mono: bool = False,
                      bitrates: list[int] | None = None,
                      crc: bool = False) -> bytes:
    """Assemble a syntactically valid Layer III frame chain with ZEROED
    frame bodies — the parser-side test twin (the role `encode_jpeg`
    plays for the image decoder). Zero bodies are NOT decodable audio;
    they exercise exactly what the parser reads: headers, lengths,
    padding-free CBR chains and per-frame VBR bitrate switches."""
    try:
        version = 3 if sample_rate in _RATES[3] else \
            2 if sample_rate in _RATES[2] else 0
        sr_idx = _RATES[version].index(sample_rate)
    except ValueError:
        raise AudioFormatError(f"unknown sample rate {sample_rate}")
    table = _BITRATE_V1_L3 if version == 3 else _BITRATE_V2_L3
    out = bytearray()
    seq = bitrates if bitrates is not None else [bitrate_kbps] * n_frames
    for kbps in seq:
        br_idx = table.index(kbps)
        h = (0x7FF << 21) | (version << 19) | (1 << 17) \
            | ((0 if crc else 1) << 16) \
            | (br_idx << 12) | (sr_idx << 10) | ((3 if mono else 0) << 6)
        n_samples = 1152 if version == 3 else 576
        frame_len = (n_samples // 8) * kbps * 1000 // sample_rate
        # protection_bit=0 puts a 16-bit CRC right after the header,
        # INSIDE frame_len; the parser skips it, so zeros suffice here
        out += struct.pack(">I", h) + bytes(frame_len - 4)
    return bytes(out)
