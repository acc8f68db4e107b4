"""Pure-numpy baseline JPEG codec (ITU-T T.81 / ISO 10918-1).

The container ships no image libraries, so — like the PNG/BMP/P6 codecs
in `imaging.py` — the JPEG path is implemented from the published spec:

- **decode_jpeg**: baseline sequential DCT (SOF0), 8-bit precision,
  grayscale or 3-component YCbCr with sampling factors 1 or 2 per axis
  (4:4:4 / 4:2:2 / 4:2:0), multiple DQT/DHT segments, restart markers
  (DRI + RST0-7 with byte realignment and DC-predictor reset). The
  entropy decode is a spec-direct canonical-Huffman walk; dequantize +
  de-zigzag + IDCT run vectorized in numpy over all blocks of a
  component at once. Progressive (SOF2), arithmetic coding, 12-bit
  precision, and sampling factors > 2 raise ``ImageFormatError`` with
  a named reason (flag-don't-drop at the pipeline layer).
- **encode_jpeg**: baseline 4:4:4 with the Annex K example quantization
  and Huffman tables (quality-scaled per the common 5000/q | 200-2q
  rule) — exists for tests and fixtures, exactly like ``encode_png``.

Correctness anchors (tests/test_jpeg.py): a hand-assembled DC-only
stream whose decoded pixels are ANALYTIC from the spec (a lone DC
coefficient C decodes to round(C/8)+128 everywhere — no shared code
between fixture and decoder), plus encode→decode round-trips bounded
in max pixel error and dHash bits on structured images.
"""

from __future__ import annotations

import struct

import numpy as np

from .imaging import ImageFormatError

JPEG_MAGIC = b"\xff\xd8"

# Zigzag scan order: position in scan -> row-major index (T.81 Fig. 5).
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]
_UNZIG = np.argsort(np.array(ZIGZAG))  # row-major index -> scan position

# Annex K.1/K.2 example quantization tables (row-major).
QUANT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]
QUANT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
]

# Annex K.3 example Huffman tables: (BITS[1..16], HUFFVAL).
HUFF_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
                list(range(12)))
HUFF_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                  list(range(12)))
HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _idct_matrix() -> np.ndarray:
    """A[u, x] = c(u)/2 * cos((2x+1)u*pi/16); spatial = A.T @ F @ A."""
    a = np.zeros((8, 8))
    for u in range(8):
        c = (1 / np.sqrt(2)) if u == 0 else 1.0
        for x in range(8):
            a[u, x] = 0.5 * c * np.cos((2 * x + 1) * u * np.pi / 16)
    return a


_A = _idct_matrix()


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple]:
    """symbol -> (code, length) per T.81 Annex C code assignment."""
    out: dict[int, tuple] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple, int]:
    """(length, code) -> symbol, for the decoder's canonical walk."""
    return {(ln, code): sym
            for sym, (code, ln) in _canonical_codes(bits, vals).items()}


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; stops at any
    non-stuffing marker (RST handled by the caller via `restart`)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _next_byte(self) -> int:
        d = self.data
        if self.pos >= len(d):
            raise ImageFormatError("truncated entropy stream")
        b = d[self.pos]
        if b != 0xFF:
            self.pos += 1
            return b
        nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
        if nxt == 0x00:
            self.pos += 2
            return 0xFF
        raise ImageFormatError("marker inside entropy run")

    def read_bit(self) -> int:
        if self.nbits == 0:
            self.acc = self._next_byte()
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict[tuple, int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ImageFormatError("invalid Huffman code")

    def restart(self, n: int) -> None:
        """Byte-align and consume the expected RSTn marker."""
        self.nbits = 0
        d = self.data
        if self.pos + 1 >= len(d) or d[self.pos] != 0xFF \
                or d[self.pos + 1] != 0xD0 + (n & 7):
            raise ImageFormatError(
                f"expected RST{n & 7} at byte {self.pos}")
        self.pos += 2


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: magnitude bits -> signed value."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def decode_jpeg(payload: bytes) -> tuple[int, int, bytes]:
    """Decode a baseline JPEG to ``(width, height, top-down RGB bytes)``
    (grayscale replicates luma into RGB, matching the other decoders'
    output contract). Malformed streams raise ``ImageFormatError`` —
    including short segments whose field reads would otherwise surface
    as ``struct.error`` (NOT a ValueError subclass, so it would escape
    the pipeline's flag-don't-drop catch and kill the Spark task)."""
    try:
        return _decode_jpeg(payload)
    except struct.error as exc:
        raise ImageFormatError(f"truncated JPEG segment: {exc}") from exc


def _decode_jpeg(payload: bytes) -> tuple[int, int, bytes]:
    if payload[:2] != JPEG_MAGIC:
        raise ImageFormatError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple, dict] = {}   # (class 0=DC|1=AC, id) -> table
    frame = None                      # (w, h, comps)
    restart_interval = 0
    n = len(payload)

    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ImageFormatError(f"expected marker at {pos}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad before a
        # marker — consume them, or a padded-but-valid stream misreads
        # marker=0xFF and misparses into a truncated-segment error
        while pos + 2 <= n and payload[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > n:
            raise ImageFormatError("truncated stream in marker padding")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:            # EOI before SOS
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            continue                  # parameterless
        (seglen,) = struct.unpack(">H", payload[pos:pos + 2])
        seg = payload[pos + 2:pos + seglen]
        if len(seg) != seglen - 2:
            raise ImageFormatError("truncated segment")
        if marker == 0xDB:            # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[i:i + 64], np.uint8)
                    i += 64
                elif pq == 1:
                    tbl = np.frombuffer(seg[i:i + 128], ">u2")
                    i += 128
                else:
                    raise ImageFormatError(f"bad DQT precision {pq}")
                dezig = np.zeros(64)
                dezig[np.array(ZIGZAG)] = tbl.astype(np.float64)
                qtables[tq] = dezig.reshape(8, 8)
        elif marker == 0xC4:          # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1:i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17:i + 17 + nv])
                htables[(tc, th)] = _decode_table(bits, vals)
                i += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:   # SOF0/1 (baseline-ish)
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise ImageFormatError(f"unsupported precision {prec}")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                ch, cv = hv >> 4, hv & 0xF
                if ch not in (1, 2) or cv not in (1, 2):
                    raise ImageFormatError(
                        f"unsupported sampling {ch}x{cv}")
                comps.append({"id": cid, "h": ch, "v": cv, "tq": tq})
            frame = (w, h, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ImageFormatError(
                f"unsupported JPEG mode (SOF marker 0x{marker:02x}; "
                "baseline sequential only)")
        elif marker == 0xDD:          # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:          # SOS — entropy data follows
            if frame is None:
                raise ImageFormatError("SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next((x for x in frame[2] if x["id"] == cs), None)
                if comp is None:
                    raise ImageFormatError(f"scan references comp {cs}")
                scan.append((comp, tdta >> 4, tdta & 0xF))
            if ns != len(frame[2]):
                raise ImageFormatError("non-interleaved scans unsupported")
            return _decode_scan(payload, pos + seglen, frame, scan,
                                qtables, htables, restart_interval)
        # APPn/COM/others: skip
        pos += seglen
    raise ImageFormatError("no SOS segment found")


def _decode_scan(payload, pos, frame, scan, qtables, htables,
                 restart_interval) -> tuple[int, int, bytes]:
    w, h, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    reader = _BitReader(payload, pos)

    coeffs = {}   # comp id -> (blocks_y, blocks_x, 8, 8) float array
    for comp, _, _ in scan:
        coeffs[comp["id"]] = np.zeros(
            (mcuy * comp["v"], mcux * comp["h"], 8, 8))
    pred = {comp["id"]: 0 for comp, _, _ in scan}
    zig = np.array(ZIGZAG)
    rst = 0
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count \
                    and mcu_count % restart_interval == 0:
                reader.restart(rst)
                rst = (rst + 1) & 7
                for k in pred:
                    pred[k] = 0
            for comp, td, ta in scan:
                dc_tbl = htables.get((0, td))
                ac_tbl = htables.get((1, ta))
                if dc_tbl is None or ac_tbl is None:
                    raise ImageFormatError("scan uses undefined DHT")
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        blk = np.zeros(64)
                        t = reader.decode_symbol(dc_tbl)
                        diff = _extend(reader.receive(t), t)
                        pred[comp["id"]] += diff
                        blk[0] = pred[comp["id"]]
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(ac_tbl)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16      # ZRL
                                    continue
                                break            # EOB
                            k += r
                            if k > 63:
                                raise ImageFormatError("AC run overflow")
                            blk[zig[k]] = _extend(reader.receive(s), s)
                            k += 1
                        coeffs[comp["id"]][my * comp["v"] + by,
                                           mx * comp["h"] + bx] = \
                            blk.reshape(8, 8)
            mcu_count += 1

    planes = []
    for comp in comps:
        q = qtables.get(comp["tq"])
        if q is None:
            raise ImageFormatError(f"undefined DQT {comp['tq']}")
        c = coeffs[comp["id"]] * q                      # dequantize
        spatial = np.einsum("ux,bcuv,vy->bcxy", _A, c, _A,
                            optimize=True)              # IDCT all blocks
        by, bx = c.shape[:2]
        plane = spatial.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        plane = np.clip(np.round(plane) + 128, 0, 255)
        # crop to the component's true size, then upsample to (h, w)
        cw = -(-w * comp["h"] // hmax)
        ch = -(-h * comp["v"] // vmax)
        plane = plane[:ch, :cw]
        plane = plane.repeat(vmax // comp["v"], axis=0) \
                     .repeat(hmax // comp["h"], axis=1)[:h, :w]
        planes.append(plane)

    if len(planes) == 1:
        y = planes[0]
        rgb = np.stack([y, y, y], axis=-1)
    elif len(planes) == 3:
        y, cb, cr = planes
        r = y + 1.402 * (cr - 128)
        g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
        b = y + 1.772 * (cb - 128)
        rgb = np.stack([r, g, b], axis=-1)
    else:
        raise ImageFormatError(f"{len(planes)}-component JPEG unsupported")
    return w, h, np.clip(np.round(rgb), 0, 255).astype(np.uint8).tobytes()


# ---------------------------------------------------------------------------
# Encoder (baseline 4:4:4, Annex K tables — for tests and fixtures)
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)    # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        while self.nbits:
            self.write(1, 1)                 # pad with 1s per spec


def _quality_scale(base: list[int], quality: int) -> np.ndarray:
    q = min(100, max(1, quality))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    t = (np.array(base, dtype=np.int64) * scale + 50) // 100
    return np.clip(t, 1, 255).reshape(8, 8)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def encode_jpeg(width: int, height: int, rgb: bytes,
                quality: int = 90) -> bytes:
    """Encode top-down RGB bytes as a baseline 4:4:4 JPEG."""
    if len(rgb) != width * height * 3:
        raise ImageFormatError(
            f"rgb length {len(rgb)} != {width}x{height}x3")
    px = np.frombuffer(rgb, np.uint8).reshape(height, width, 3) \
           .astype(np.float64)
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128

    ql = _quality_scale(QUANT_LUMA, quality)
    qc = _quality_scale(QUANT_CHROMA, quality)
    enc_dc = [_canonical_codes(*HUFF_DC_LUMA),
              _canonical_codes(*HUFF_DC_CHROMA)]
    enc_ac = [_canonical_codes(*HUFF_AC_LUMA),
              _canonical_codes(*HUFF_AC_CHROMA)]

    ph = -(-height // 8) * 8
    pw = -(-width // 8) * 8
    writer = _BitWriter()
    pred = [0, 0, 0]
    planes = []
    for plane in (y, cb, cr):
        p = np.pad(plane, ((0, ph - height), (0, pw - width)), "edge")
        planes.append(p)

    for by in range(ph // 8):
        for bx in range(pw // 8):
            for ci, plane in enumerate(planes):
                q = ql if ci == 0 else qc
                hk = 0 if ci == 0 else 1
                blk = plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128
                coef = _A @ blk @ _A.T
                qz = np.round(coef / q).astype(np.int64)
                zz = qz.reshape(-1)[np.array(ZIGZAG)]
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                t = _category(diff)
                code, ln = enc_dc[hk][t]
                writer.write(code, ln)
                if t:
                    writer.write(diff if diff >= 0
                                 else diff + (1 << t) - 1, t)
                run = 0
                last_nz = int(np.max(np.nonzero(zz)[0])) \
                    if np.any(zz[1:]) else 0
                for k in range(1, 64):
                    v = int(zz[k])
                    if k > last_nz:
                        code, ln = enc_ac[hk][0x00]      # EOB
                        writer.write(code, ln)
                        break
                    if v == 0:
                        run += 1
                        continue
                    while run >= 16:
                        code, ln = enc_ac[hk][0xF0]      # ZRL
                        writer.write(code, ln)
                        run -= 16
                    # baseline AC Huffman tables stop at category 10
                    # (T.81 F.1.2.2); a near-1 quant table (quality
                    # ≥~97) on a high-contrast block can quantize to
                    # |coef| ≥ 1024 = category 11, which would KeyError
                    # below — clamp to the representable magnitude
                    # (the standard encoder bound; costs at most 1 LSB
                    # on an extreme coefficient, stays a valid stream)
                    v = max(-1023, min(1023, v))
                    s = _category(v)
                    code, ln = enc_ac[hk][(run << 4) | s]
                    writer.write(code, ln)
                    writer.write(v if v >= 0 else v + (1 << s) - 1, s)
                    run = 0
    writer.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) \
            + body

    def dqt(tid: int, tbl: np.ndarray) -> bytes:
        zz = tbl.reshape(-1)[np.array(ZIGZAG)].astype(np.uint8)
        return seg(0xDB, bytes([tid]) + zz.tobytes())

    def dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits)
                   + bytes(vals))

    sof = seg(0xC0, bytes([8]) + struct.pack(">HH", height, width)
              + bytes([3,
                       1, 0x11, 0,     # Y  1x1, q0
                       2, 0x11, 1,     # Cb 1x1, q1
                       3, 0x11, 1]))   # Cr 1x1, q1
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    return (JPEG_MAGIC
            + seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
            + dqt(0, ql) + dqt(1, qc)
            + dht(0, 0, *HUFF_DC_LUMA) + dht(1, 0, *HUFF_AC_LUMA)
            + dht(0, 1, *HUFF_DC_CHROMA) + dht(1, 1, *HUFF_AC_CHROMA)
            + sof + sos + bytes(writer.out) + b"\xff\xd9")
