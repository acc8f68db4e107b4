"""Pure-Python image codecs for the multimodal decode stage.

The container ships no image libraries, so the real-decode path is
implemented from the published file-format specs for two uncompressed
formats — enough to prove the decode kernel slot is real (header parse,
stride/padding handling, channel reorder, vertical flip), not a stub:

- **BMP**, 24-bit uncompressed ``BI_RGB`` with a ``BITMAPINFOHEADER``:
  little-endian header fields, 4-byte-aligned rows stored bottom-up,
  pixels in BGR order.
- **PPM (P6)**, the netpbm binary RGB format: ASCII header
  ``P6 <w> <h> <maxval>`` (with ``#`` comments), then raw RGB rows.
- **PNG** (non-interlaced, 8-bit gray/RGB/RGBA): PNG's only compression
  is DEFLATE — stdlib ``zlib`` — plus five per-scanline byte filters
  (None/Sub/Up/Average/Paeth, RFC 2083 §6), so a complete spec-correct
  decoder needs no codec library: chunk walk with CRC verification,
  one ``zlib.decompress`` over the concatenated IDAT stream, then
  per-row unfiltering. Adam7 interlace and 16-bit depth are rejected
  with named errors (the container-shipped generator never emits them).

All decoders return the same feature dict the multimodal stage emits
(``n_bytes``/``width``/``height``/``checksum``), with ``checksum``
computed over the DECODED top-down RGB pixel bytes — so a wrong stride,
channel order, or row direction changes the answer. ``encode_bmp`` /
``encode_ppm`` exist for tests and fixtures.
"""

from __future__ import annotations

import struct
import zlib


class ImageFormatError(ValueError):
    """Malformed or unsupported image payload."""


# ---------------------------------------------------------------------------
# BMP (24bpp, BI_RGB, BITMAPINFOHEADER)
# ---------------------------------------------------------------------------

def _bmp_row_size(width: int, bpp: int = 24) -> int:
    return ((bpp * width + 31) // 32) * 4


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """Build a 24-bit BMP from top-down RGB bytes (len == w*h*3)."""
    if len(rgb) != width * height * 3:
        raise ImageFormatError(
            f"rgb length {len(rgb)} != {width}x{height}x3")
    row_size = _bmp_row_size(width)
    pixel_bytes = row_size * height
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + pixel_bytes, 0, 0, 14 + 40)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                       pixel_bytes, 2835, 2835, 0, 0)
    rows = []
    pad = b"\x00" * (row_size - width * 3)
    # bottom-up storage; BGR channel order per the spec
    for y in range(height - 1, -1, -1):
        row = bytearray()
        base = y * width * 3
        for x in range(width):
            r, g, b = rgb[base + 3 * x: base + 3 * x + 3]
            row += bytes((b, g, r))
        rows.append(bytes(row) + pad)
    return header + info + b"".join(rows)


def decode_bmp(payload: bytes) -> tuple[int, int, bytes]:
    """(width, height, top-down RGB bytes) from a 24bpp BI_RGB BMP."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ImageFormatError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    header_size = struct.unpack_from("<I", payload, 14)[0]
    if header_size < 40:
        raise ImageFormatError(f"unsupported BMP header size {header_size}")
    width, height = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if planes != 1 or bpp != 24 or compression != 0:
        raise ImageFormatError(
            f"unsupported BMP variant: planes={planes} bpp={bpp} "
            f"compression={compression} (only 24bpp BI_RGB)")
    if width <= 0 or height == 0:
        raise ImageFormatError(f"bad BMP dimensions {width}x{height}")
    bottom_up = height > 0
    height = abs(height)
    row_size = _bmp_row_size(width)
    if len(payload) < data_offset + row_size * height:
        raise ImageFormatError("truncated BMP pixel data")
    out = bytearray(width * height * 3)
    for row_idx in range(height):
        y = (height - 1 - row_idx) if bottom_up else row_idx
        src = data_offset + row_idx * row_size
        dst = y * width * 3
        for x in range(width):
            b, g, r = payload[src + 3 * x: src + 3 * x + 3]
            out[dst + 3 * x: dst + 3 * x + 3] = bytes((r, g, b))
    return width, height, bytes(out)


# ---------------------------------------------------------------------------
# PPM (P6)
# ---------------------------------------------------------------------------

def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    if len(rgb) != width * height * 3:
        raise ImageFormatError(
            f"rgb length {len(rgb)} != {width}x{height}x3")
    return f"P6\n{width} {height}\n255\n".encode() + rgb


def _parse_ppm_header(payload: bytes) -> tuple[int, int, int]:
    """(width, height, pixel_start) of the P6 header at offset 0."""
    if payload[:2] != b"P6":
        raise ImageFormatError("not a P6 PPM payload")
    # header: three whitespace-separated ints, '#' comments allowed
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ImageFormatError("truncated PPM header")
        fields.append(int(payload[start:pos]))
    pos += 1  # exactly one whitespace byte after maxval
    width, height, maxval = fields
    if width <= 0 or height <= 0 or not 0 < maxval < 256:
        raise ImageFormatError(f"bad PPM header {fields}")
    return width, height, pos


def decode_ppm(payload: bytes) -> tuple[int, int, bytes]:
    """(width, height, RGB bytes) from a binary P6 PPM (maxval ≤ 255)."""
    width, height, pos = _parse_ppm_header(payload)
    n = width * height * 3
    if len(payload) < pos + n:
        raise ImageFormatError("truncated PPM pixel data")
    return width, height, bytes(payload[pos:pos + n])


# ---------------------------------------------------------------------------
# PNG (8-bit gray / RGB / RGBA, non-interlaced)
# ---------------------------------------------------------------------------

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}   # gray, truecolor, truecolor+alpha


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + typ + data +
            struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))


def encode_png(width: int, height: int, rgb: bytes) -> bytes:
    """Build an 8-bit truecolor PNG from top-down RGB bytes (filter 0
    on every scanline — valid PNG, used for tests and fixtures)."""
    if len(rgb) != width * height * 3:
        raise ImageFormatError(
            f"rgb length {len(rgb)} != {width}x{height}x3")
    stride = width * 3
    raw = b"".join(b"\x00" + rgb[y * stride:(y + 1) * stride]
                   for y in range(height))
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (_PNG_MAGIC + _png_chunk(b"IHDR", ihdr) +
            _png_chunk(b"IDAT", zlib.compress(raw)) +
            _png_chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> tuple[int, int, bytes]:
    """(width, height, top-down RGB bytes) from an 8-bit non-interlaced
    PNG (color types 0/2/6; gray replicates to RGB, alpha is dropped).
    Chunk CRCs are verified — corruption raises, never mis-decodes.
    Malformed field reads surface as ``ImageFormatError``, never a bare
    ``struct.error`` (NOT a ValueError subclass — it would escape the
    pipeline's flag-don't-drop catch and kill the Spark task; the same
    containment `decode_jpeg` has)."""
    try:
        return _decode_png(payload)
    except struct.error as exc:
        raise ImageFormatError(f"truncated PNG field: {exc}") from exc


def _decode_png(payload: bytes) -> tuple[int, int, bytes]:
    if payload[:8] != _PNG_MAGIC:
        raise ImageFormatError("not a PNG payload")
    pos, ihdr, idat, ended = 8, None, [], False
    while pos + 8 <= len(payload):
        length, typ = struct.unpack_from(">I4s", payload, pos)
        data = payload[pos + 8: pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(payload):
            raise ImageFormatError(f"truncated PNG chunk {typ!r}")
        crc = struct.unpack_from(">I", payload, pos + 8 + length)[0]
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ImageFormatError(f"PNG chunk {typ!r} CRC mismatch")
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            ended = True
            break
        pos += 12 + length
    if ihdr is None or not idat or not ended:
        raise ImageFormatError("PNG missing IHDR/IDAT/IEND")
    width, height, depth, ctype, comp, filt, interlace = \
        struct.unpack(">IIBBBBB", ihdr)
    if width <= 0 or height <= 0:
        raise ImageFormatError(f"bad PNG dimensions {width}x{height}")
    if depth != 8 or ctype not in _PNG_CHANNELS:
        raise ImageFormatError(
            f"unsupported PNG: depth={depth} color_type={ctype} "
            "(8-bit gray/RGB/RGBA only)")
    if comp != 0 or filt != 0 or interlace != 0:
        raise ImageFormatError(
            f"unsupported PNG: compression={comp} filter={filt} "
            f"interlace={interlace} (Adam7 not supported)")
    ch = _PNG_CHANNELS[ctype]
    stride = width * ch
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as exc:
        raise ImageFormatError(f"corrupt PNG IDAT stream: {exc}") from exc
    if len(raw) != (stride + 1) * height:
        raise ImageFormatError(
            f"PNG pixel payload is {len(raw)} bytes, expected "
            f"{(stride + 1) * height}")
    # per-scanline unfiltering (RFC 2083 §6): each row leads with its
    # filter byte; Sub/Up/Average/Paeth predict from the left (a), the
    # row above (b), and the upper-left (c) at channel offset
    prev = bytearray(stride)
    out = bytearray(width * height * 3)
    for y in range(height):
        f = raw[y * (stride + 1)]
        row = bytearray(raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)])
        if f == 1:      # Sub
            for i in range(ch, stride):
                row[i] = (row[i] + row[i - ch]) & 0xFF
        elif f == 2:    # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif f == 3:    # Average
            for i in range(stride):
                a = row[i - ch] if i >= ch else 0
                row[i] = (row[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:    # Paeth
            for i in range(stride):
                a = row[i - ch] if i >= ch else 0
                c = prev[i - ch] if i >= ch else 0
                row[i] = (row[i] + _paeth(a, prev[i], c)) & 0xFF
        elif f != 0:
            raise ImageFormatError(f"bad PNG filter type {f} in row {y}")
        prev = row
        dst = y * width * 3
        if ctype == 2:
            out[dst:dst + stride] = row
        elif ctype == 6:        # drop alpha
            for x in range(width):
                out[dst + 3 * x: dst + 3 * x + 3] = row[4 * x: 4 * x + 3]
        else:                   # gray -> replicate
            for x in range(width):
                g = row[x]
                out[dst + 3 * x: dst + 3 * x + 3] = bytes((g, g, g))
    return width, height, bytes(out)


# ---------------------------------------------------------------------------
# Resize (nearest-neighbor) and frame streams
# ---------------------------------------------------------------------------

def resize_rgb(width: int, height: int, rgb: bytes,
               new_w: int, new_h: int) -> bytes:
    """Nearest-neighbor resample of top-down RGB bytes (floor source
    mapping: src = (dst * src_dim) // dst_dim — deterministic, no
    filtering, exact for integer up/downscales)."""
    if new_w <= 0 or new_h <= 0:
        raise ImageFormatError(f"bad target size {new_w}x{new_h}")
    out = bytearray(new_w * new_h * 3)
    for y in range(new_h):
        sy = (y * height) // new_h
        src_row = sy * width * 3
        dst_row = y * new_w * 3
        for x in range(new_w):
            sx = (x * width) // new_w
            out[dst_row + 3 * x: dst_row + 3 * x + 3] = \
                rgb[src_row + 3 * sx: src_row + 3 * sx + 3]
    return bytes(out)


def split_p6_stream(payload: bytes) -> list[tuple[int, int, bytes]]:
    """Frames of a concatenated-P6 stream (the no-codec video container:
    every frame is a self-describing P6 image, so the stream splits by
    parsing headers — no index needed). Returns [(w, h, rgb), ...]."""
    frames, pos = [], 0
    while pos < len(payload):
        sub = payload[pos:]
        w, h, pixel_start = _parse_ppm_header(sub)
        n = w * h * 3
        if len(sub) < pixel_start + n:
            raise ImageFormatError(
                f"truncated frame {len(frames)} in P6 stream")
        frames.append((w, h, bytes(sub[pixel_start:pixel_start + n])))
        pos += pixel_start + n
    return frames


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------

def decode_image(payload: bytes) -> dict:
    """Sniff the format by magic and decode to the stage's feature row."""
    if payload[:2] == b"BM":
        width, height, rgb = decode_bmp(payload)
    elif payload[:2] == b"P6":
        width, height, rgb = decode_ppm(payload)
    elif payload[:8] == _PNG_MAGIC:
        width, height, rgb = decode_png(payload)
    elif payload[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg
        width, height, rgb = decode_jpeg(payload)
    else:
        raise ImageFormatError(
            f"unrecognized image magic {payload[:2]!r} "
            "(BMP/P6/PNG/JPEG supported)")
    return {"n_bytes": len(payload), "width": width, "height": height,
            "checksum": sum(rgb) % 65536}


# ---------------------------------------------------------------------------
# Perceptual hashing (image near-dup dedup)
# ---------------------------------------------------------------------------

_DHASH_W, _DHASH_H = 9, 8   # 9×8 gray → 8×8 horizontal gradients = 64 bits


def dhash64(width: int, height: int, rgb: bytes) -> int:
    """64-bit difference hash (dHash) of a decoded RGB image: integer
    luma (299/587/114 per mille — no floats, no rounding modes), a
    nearest-neighbor resample to 9×8 (`resize_rgb`'s floor mapping),
    then one bit per horizontally adjacent pair (left > right). Robust
    to uniform brightness/contrast shifts and to resizing (gradient
    SIGNS survive them); a crop or recolor flips only the bits whose
    gradients change — the Hamming distance IS the edit size."""
    small = resize_rgb(width, height, rgb, _DHASH_W, _DHASH_H)
    luma = [(299 * small[i] + 587 * small[i + 1] + 114 * small[i + 2])
            // 1000 for i in range(0, len(small), 3)]
    h = 0
    bit = 0
    for y in range(_DHASH_H):
        row = y * _DHASH_W
        for x in range(_DHASH_W - 1):
            if luma[row + x] > luma[row + x + 1]:
                h |= 1 << bit
            bit += 1
    return h
