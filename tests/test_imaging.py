"""Real multimodal decode: the pure-Python BMP/P6 codecs and the
Arrow-batched decode stage running them (``real_decode=True``)."""

from __future__ import annotations

import os
import struct
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from agnostic_blockchain_etl_spark.functions import imaging  # noqa: E402


def _rgb(width: int, height: int) -> bytes:
    # deterministic non-uniform pixels: channel values depend on position
    return bytes((x * 7 + y * 13 + c * 29) % 256
                 for y in range(height) for x in range(width)
                 for c in range(3))


class TestBmpCodec:
    # widths 1/2/3 exercise all 4-byte row-padding remainders
    @pytest.mark.parametrize("w,h", [(1, 1), (2, 3), (3, 2), (4, 4), (5, 7)])
    def test_roundtrip(self, w, h):
        rgb = _rgb(w, h)
        dw, dh, drgb = imaging.decode_bmp(imaging.encode_bmp(w, h, rgb))
        assert (dw, dh, drgb) == (w, h, rgb)

    def test_topdown_negative_height(self):
        # flip the stored height sign: rows become top-down, same pixels
        w, h = 3, 2
        payload = bytearray(imaging.encode_bmp(w, h, _rgb(w, h)))
        struct.pack_into("<i", payload, 22, -h)
        row_size = imaging._bmp_row_size(w)
        off = struct.unpack_from("<I", payload, 10)[0]
        # reverse the stored row order so the image is unchanged
        rows = [bytes(payload[off + i * row_size: off + (i + 1) * row_size])
                for i in range(h)]
        payload[off:off + row_size * h] = b"".join(reversed(rows))
        assert imaging.decode_bmp(bytes(payload))[2] == _rgb(w, h)

    def test_rejects_non_bmp_and_truncation(self):
        with pytest.raises(imaging.ImageFormatError):
            imaging.decode_bmp(b"NOTABMP" + b"\x00" * 64)
        good = imaging.encode_bmp(4, 4, _rgb(4, 4))
        with pytest.raises(imaging.ImageFormatError):
            imaging.decode_bmp(good[:-8])

    def test_rejects_unsupported_bpp(self):
        payload = bytearray(imaging.encode_bmp(2, 2, _rgb(2, 2)))
        struct.pack_into("<H", payload, 28, 8)  # 8bpp palette form
        with pytest.raises(imaging.ImageFormatError, match="bpp=8"):
            imaging.decode_bmp(bytes(payload))


class TestPpmCodec:
    @pytest.mark.parametrize("w,h", [(1, 1), (5, 3)])
    def test_roundtrip(self, w, h):
        rgb = _rgb(w, h)
        assert imaging.decode_ppm(imaging.encode_ppm(w, h, rgb)) == (w, h, rgb)

    def test_header_comments(self):
        rgb = _rgb(2, 2)
        payload = b"P6\n# a comment\n2 2\n# another\n255\n" + rgb
        assert imaging.decode_ppm(payload) == (2, 2, rgb)

    def test_rejects_truncated(self):
        with pytest.raises(imaging.ImageFormatError):
            imaging.decode_ppm(imaging.encode_ppm(2, 2, _rgb(2, 2))[:-1])


class TestPngCodec:
    @pytest.mark.parametrize("w,h", [(1, 1), (2, 3), (5, 7), (8, 8)])
    def test_roundtrip_filter0(self, w, h):
        rgb = _rgb(w, h)
        assert imaging.decode_png(imaging.encode_png(w, h, rgb)) == \
            (w, h, rgb)

    @staticmethod
    def _forward_filter(width, height, raw_rows, ch, filters):
        """Reference forward-filtering (RFC 2083 §6) so the decoder's
        unfiltering is checked against an independent implementation."""
        stride = width * ch
        prev = bytes(stride)
        out = bytearray()
        for y, f in zip(range(height), filters):
            row = raw_rows[y * stride:(y + 1) * stride]
            enc = bytearray([f])
            for i in range(stride):
                a = row[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                if f == 0:
                    p = 0
                elif f == 1:
                    p = a
                elif f == 2:
                    p = b
                elif f == 3:
                    p = (a + b) >> 1
                else:
                    p = imaging._paeth(a, b, c)
                enc.append((row[i] - p) & 0xFF)
            out += enc
            prev = row
        return bytes(out)

    def _make_png(self, width, height, ctype, raw_rows, filters):
        import struct as _s
        import zlib as _z
        ch = imaging._PNG_CHANNELS[ctype]
        ihdr = _s.pack(">IIBBBBB", width, height, 8, ctype, 0, 0, 0)
        raw = self._forward_filter(width, height, raw_rows, ch, filters)
        return (imaging._PNG_MAGIC + imaging._png_chunk(b"IHDR", ihdr) +
                imaging._png_chunk(b"IDAT", _z.compress(raw)) +
                imaging._png_chunk(b"IEND", b""))

    def test_all_filter_types_unfilter_correctly(self):
        w, h = 4, 5
        rgb = _rgb(w, h)
        payload = self._make_png(w, h, 2, rgb, [0, 1, 2, 3, 4])
        assert imaging.decode_png(payload) == (w, h, rgb)

    def test_rgba_drops_alpha_and_gray_replicates(self):
        w, h = 3, 2
        rgb = _rgb(w, h)
        rgba = b"".join(rgb[3 * i:3 * i + 3] + bytes([200 + i])
                        for i in range(w * h))
        assert imaging.decode_png(
            self._make_png(w, h, 6, rgba, [1, 4])) == (w, h, rgb)
        gray = bytes(range(10, 10 + w * h))
        want = b"".join(bytes((g, g, g)) for g in gray)
        assert imaging.decode_png(
            self._make_png(w, h, 0, gray, [2, 3])) == (w, h, want)

    def test_rejects_crc_corruption_and_truncation(self):
        good = imaging.encode_png(4, 4, _rgb(4, 4))
        bad = bytearray(good)
        bad[40] ^= 0xFF                  # a byte inside IDAT
        with pytest.raises(imaging.ImageFormatError, match="CRC"):
            imaging.decode_png(bytes(bad))
        with pytest.raises(imaging.ImageFormatError):
            imaging.decode_png(good[:-10])

    def test_rejects_interlace_and_16bit(self):
        import struct as _s
        w, h = 2, 2
        for depth, interlace, msg in ((8, 1, "interlace"), (16, 0, "depth")):
            ihdr = _s.pack(">IIBBBBB", w, h, depth, 2, 0, 0, interlace)
            payload = (imaging._PNG_MAGIC + imaging._png_chunk(b"IHDR", ihdr)
                       + imaging._png_chunk(b"IDAT", b"x")
                       + imaging._png_chunk(b"IEND", b""))
            with pytest.raises(imaging.ImageFormatError, match=msg):
                imaging.decode_png(payload)


class TestDecodeDispatch:
    def test_magic_sniff_and_feature_row(self):
        bmp = imaging.encode_bmp(3, 2, _rgb(3, 2))
        ppm = imaging.encode_ppm(3, 2, _rgb(3, 2))
        png = imaging.encode_png(3, 2, _rgb(3, 2))
        fb, fp = imaging.decode_image(bmp), imaging.decode_image(ppm)
        fg = imaging.decode_image(png)
        # same pixels -> same checksum, format-specific n_bytes
        assert fb["checksum"] == fp["checksum"] == fg["checksum"] \
            == sum(_rgb(3, 2)) % 65536
        assert (fb["width"], fb["height"]) == (3, 2)
        assert (fg["width"], fg["height"]) == (3, 2)
        assert fb["n_bytes"] == len(bmp) and fg["n_bytes"] == len(png)

    def test_unknown_magic(self):
        with pytest.raises(imaging.ImageFormatError, match="magic"):
            imaging.decode_image(b"\x89PNG....")


@pytest.fixture(scope="module")
def spark():
    from agnostic_blockchain_etl_spark.session import get_session
    yield get_session(master="local[8]",
                      conf={"spark.sql.shuffle.partitions": "8"})


class TestRealDecodeStage:
    def test_mapinpandas_real_decode(self, spark):
        from agnostic_blockchain_etl_spark.operators.multimodal import (
            decode_features)
        rows = []
        for i, (w, h, enc, tag) in enumerate([
                (3, 2, imaging.encode_bmp, "image/bmp"),
                (5, 7, imaging.encode_bmp, "image/bmp"),
                (4, 4, imaging.encode_ppm, "image/x-portable-pixmap"),
                (6, 3, imaging.encode_png, "image/png")]):
            payload = enc(w, h, _rgb(w, h))
            rows.append((i, payload, tag, 0, 1, w, h,
                         sum(_rgb(w, h)) % 65536, len(payload)))
        df = spark.createDataFrame(
            rows, "doc_id long, payload binary, modality string, "
                  "n_chars long, chunk_count long, exp_w long, exp_h long, "
                  "exp_sum long, exp_len long")
        out = decode_features(
            df.select("doc_id", "payload", "modality", "n_chars",
                      "chunk_count"), real_decode=True)
        got = {r.doc_id: r for r in out.collect()}
        for r in df.collect():
            g = got[r.doc_id]
            assert (g.width, g.height, g.checksum, g.n_bytes) == \
                (r.exp_w, r.exp_h, r.exp_sum, r.exp_len)
            assert g.modality == r.modality  # metadata passes through
            assert g.decode_error is None

    def test_undecodable_payload_flags_not_raises(self, spark):
        """Flag-don't-drop holds for decode_features too (the round-6
        advice finding: the docstring promised it but only imagedup
        delivered): a malformed stream or an unsupported format (MP3
        magic) emits its row with null features + decode_error instead
        of killing the Spark job mid-kernel."""
        from agnostic_blockchain_etl_spark.operators.multimodal import (
            decode_features)
        good = imaging.encode_bmp(3, 2, _rgb(3, 2))
        rows = [(1, good, "image/bmp", 0, 1),
                (2, b"\xff\xd8\x00\x01garbage", "image/jpeg", 0, 1),
                (3, b"ID3\x03\x00mp3-payload", "audio/mpeg", 0, 1),
                (4, b"BM\x00", "image/bmp", 0, 1)]
        out = decode_features(
            spark.createDataFrame(
                rows, "doc_id long, payload binary, modality string, "
                      "n_chars long, chunk_count long"),
            real_decode=True)
        got = {r.doc_id: r for r in out.collect()}
        assert len(got) == 4                      # no row dropped
        assert got[1].decode_error is None
        assert got[1].width == 3
        for bad in (2, 3, 4):
            assert got[bad].decode_error, bad
            assert got[bad].width is None and got[bad].checksum is None
            assert got[bad].n_bytes == len(rows[bad - 1][1])
            assert got[bad].modality == rows[bad - 1][2]  # passthrough


class TestResize:
    def test_nearest_neighbor_exact_upscale(self):
        # 2x2 -> 4x4: each source pixel becomes a 2x2 block
        rgb = _rgb(2, 2)
        out = imaging.resize_rgb(2, 2, rgb, 4, 4)
        px = lambda b, w, x, y: b[(y * w + x) * 3:(y * w + x) * 3 + 3]
        for y in range(4):
            for x in range(4):
                assert px(out, 4, x, y) == px(rgb, 2, x // 2, y // 2)

    def test_downscale_picks_floor_mapped_pixels(self):
        rgb = _rgb(4, 4)
        out = imaging.resize_rgb(4, 4, rgb, 2, 2)
        px = lambda b, w, x, y: b[(y * w + x) * 3:(y * w + x) * 3 + 3]
        for y in range(2):
            for x in range(2):
                assert px(out, 2, x, y) == px(rgb, 4, x * 2, y * 2)

    def test_resize_stage(self, spark):
        from agnostic_blockchain_etl_spark.operators.multimodal import (
            resize_images)
        rows = [(1, imaging.encode_bmp(5, 7, _rgb(5, 7))),
                (2, imaging.encode_ppm(4, 4, _rgb(4, 4)))]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        got = {r.doc_id: r for r in resize_images(df, 3, 3).collect()}
        for doc_id, payload in rows:
            w, h, rgb = (imaging.decode_bmp(payload)
                         if bytes(payload)[:2] == b"BM"
                         else imaging.decode_ppm(payload))
            expect = imaging.resize_rgb(w, h, rgb, 3, 3)
            g = got[doc_id]
            assert (g.width, g.height) == (3, 3)
            assert g.checksum == sum(expect) % 65536
            # payload is a decodable P6 carrying exactly the resized pixels
            assert imaging.decode_ppm(bytes(g.payload)) == (3, 3, expect)


class TestFrameSampling:
    def test_split_p6_stream_roundtrip(self):
        frames = [_rgb(2, 2), _rgb(2, 2), _rgb(3, 1)]
        dims = [(2, 2), (2, 2), (3, 1)]
        stream = b"".join(imaging.encode_ppm(w, h, f)
                          for (w, h), f in zip(dims, frames))
        got = imaging.split_p6_stream(stream)
        assert got == [(w, h, f) for (w, h), f in zip(dims, frames)]

    def test_sample_frames_stage(self, spark):
        from agnostic_blockchain_etl_spark.operators.multimodal import (
            sample_frames)
        # 5-frame "video": frame i has constant pixel value i*10
        def frame(i):
            return bytes([i * 10] * (2 * 2 * 3))
        stream = b"".join(imaging.encode_ppm(2, 2, frame(i))
                          for i in range(5))
        df = spark.createDataFrame([(7, stream)],
                                   "doc_id long, payload binary")
        got = sorted((r.frame_idx, r.checksum)
                     for r in sample_frames(df, every_n=2).collect())
        assert got == [(i, sum(frame(i)) % 65536) for i in (0, 2, 4)]


class TestWavCodec:
    def test_roundtrip(self):
        import numpy as np
        from agnostic_blockchain_etl_spark.functions import audio
        t = np.arange(4800)
        pcm = (10000 * np.sin(2 * np.pi * 440 * t / 48000)) \
            .astype("<i2")
        stereo = np.column_stack([pcm, -pcm]).astype("<i2")
        payload = audio.encode_wav(48000, 2, stereo.tobytes())
        rate, ch, got = audio.decode_wav(payload)
        assert (rate, ch) == (48000, 2)
        assert (got == stereo).all()

    def test_tolerates_extra_chunks(self):
        import struct
        from agnostic_blockchain_etl_spark.functions import audio
        base = audio.encode_wav(8000, 1, b"\x01\x00\x02\x00")
        # splice a LIST chunk between WAVE and fmt
        extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
        spliced = base[:12] + extra + base[12:]
        rate, ch, samples = audio.decode_wav(spliced)
        assert (rate, ch, samples.shape[0]) == (8000, 1, 2)

    def test_rejects_non_pcm16(self):
        import struct
        import pytest as _pytest
        from agnostic_blockchain_etl_spark.functions import audio
        good = audio.encode_wav(8000, 1, b"\x01\x00")
        # flip codec id to 3 (float) in the fmt chunk
        bad = bytearray(good)
        fmt_at = good.index(b"fmt ") + 8
        struct.pack_into("<H", bad, fmt_at, 3)
        with _pytest.raises(audio.AudioFormatError):
            audio.decode_wav(bytes(bad))

    def test_feature_stage(self, spark):
        import numpy as np
        from agnostic_blockchain_etl_spark.functions import audio
        from agnostic_blockchain_etl_spark.operators.multimodal import (
            audio_feature_stage)
        rows = []
        for doc_id, amp in ((1, 1000), (2, 20000)):
            pcm = (amp * np.sin(2 * np.pi * np.arange(1600) / 100)) \
                .astype("<i2")
            rows.append((doc_id, audio.encode_wav(16000, 1, pcm.tobytes())))
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        got = {r.doc_id: r for r in audio_feature_stage(df).collect()}
        for doc_id, payload in rows:
            exp = audio.audio_features(payload)
            g = got[doc_id]
            assert (g.sample_rate, g.channels, g.n_frames) == \
                (16000, 1, 1600)
            assert g.rms == exp["rms"] and g.peak == exp["peak"]
            assert g.duration_s == 0.1
        assert got[2].rms > got[1].rms * 10
