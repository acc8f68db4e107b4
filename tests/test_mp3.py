"""MP3 frame parser: hand-assembled header anchors (the encode_jpeg
pattern — the encoder twin builds syntactically valid zero-body frame
chains), ID3 skip, Xing detection, and the flag-don't-drop Spark stage."""

import struct

import pytest

from agnostic_blockchain_etl_spark.functions.mp3 import (
    AudioFormatError, encode_mp3_frames, mp3_metadata, parse_frame_header)


class TestHeaderAnchors:
    def test_canonical_cbr_header(self):
        """MPEG-1 Layer III, 128 kbps, 44.1 kHz, stereo, no padding:
        the textbook header FF FB 90 00 -> frame_len 417."""
        f = parse_frame_header(b"\xff\xfb\x90\x00", 0)
        assert f["version"] == "MPEG1"
        assert f["bitrate_kbps"] == 128
        assert f["sample_rate"] == 44100
        assert f["channels"] == 2 and f["mode"] == "stereo"
        assert f["n_samples"] == 1152
        assert f["frame_len"] == 144 * 128000 // 44100 == 417

    def test_padding_bit_adds_one_byte(self):
        f = parse_frame_header(b"\xff\xfb\x92\x00", 0)   # padding=1
        assert f["frame_len"] == 418

    def test_mpeg2_halves_samples(self):
        """MPEG-2 Layer III 24 kHz 64 kbps mono: 576 samples,
        72*64000/24000 = 192 bytes."""
        h = (0x7FF << 21) | (2 << 19) | (1 << 17) | (1 << 16) \
            | (8 << 12) | (1 << 10) | (3 << 6)
        f = parse_frame_header(struct.pack(">I", h), 0)
        assert f["version"] == "MPEG2" and f["n_samples"] == 576
        assert f["sample_rate"] == 24000 and f["bitrate_kbps"] == 64
        assert f["channels"] == 1
        assert f["frame_len"] == 192

    @pytest.mark.parametrize("hdr,reason", [
        (b"\x00\x00\x00\x00", "sync"),
        (b"\xff\xeb\x90\x00", "reserved MPEG version"),
        (b"\xff\xfd\x90\x00", "Layer II"),          # layer bits 10
        (b"\xff\xfb\x00\x00", "free-format"),
        (b"\xff\xfb\xf0\x00", "forbidden bitrate"),
        (b"\xff\xfb\x9c\x00", "reserved sample-rate"),
        (b"\xff\xfb\x90\x02", "reserved emphasis"),
    ])
    def test_invalid_headers_raise_named(self, hdr, reason):
        with pytest.raises(AudioFormatError):
            parse_frame_header(hdr, 0)


class TestStreamWalk:
    def test_cbr_stream_counts_and_duration(self):
        payload = encode_mp3_frames(38, 128, 44100)
        m = mp3_metadata(payload)
        assert m["n_frames"] == 38
        assert m["bitrate_kbps"] == 128 and not m["vbr"]
        assert m["duration_s"] == round(38 * 1152 / 44100, 6)
        assert m["channels"] == 2 and not m["has_id3v2"]

    def test_vbr_stream_averages(self):
        payload = encode_mp3_frames(0, bitrates=[96, 128, 160, 128])
        m = mp3_metadata(payload)
        assert m["n_frames"] == 4 and m["vbr"]
        assert m["bitrate_kbps"] == 128.0

    def test_id3v2_skipped_id3v1_tolerated(self):
        body = encode_mp3_frames(3, 64, 22050, mono=True)
        id3v2 = b"ID3\x03\x00\x00" + bytes([0, 0, 1, 5]) + bytes(133)
        m = mp3_metadata(id3v2 + body + b"TAG" + bytes(125))
        assert m["n_frames"] == 3 and m["has_id3v2"]
        assert m["version"] == "MPEG2" and m["channels"] == 1
        assert m["duration_s"] == round(3 * 576 / 22050, 6)

    def test_xing_tag_frame_excluded(self):
        frames = encode_mp3_frames(6, 128, 44100)
        flen = 144 * 128000 // 44100
        tag = bytearray(frames[:flen])
        tag[4 + 32:4 + 32 + 4] = b"Xing"           # MPEG1 stereo offset
        m = mp3_metadata(bytes(tag) + frames[flen:])
        assert m["n_frames"] == 5                  # tag frame not counted
        assert m["vbr"]

    def test_id3v24_footer_flag_skipped(self):
        """ID3v2.4 footer flag (flags bit 4): a 10-byte footer follows
        the tag and is NOT in the syncsafe size — unskipped it lands on
        the frame-sync scan and a valid file reads as 'no MP3 frame
        sync' (advice finding)."""
        body = encode_mp3_frames(3, 128, 44100)
        tag_payload = bytes(37)
        footer = b"3DI\x04\x00\x10" + bytes([0, 0, 0, 37])
        id3 = b"ID3\x04\x00\x10" + bytes([0, 0, 0, 37]) + tag_payload \
            + footer
        m = mp3_metadata(id3 + body)
        assert m["n_frames"] == 3 and m["has_id3v2"]

    def test_xing_tag_header_does_not_define_stream_fields(self):
        """The Xing/Info tag frame's own header (often mono to minimize
        tag size) must not become the stream baseline: version/mode/
        channels and the format-change reference come from the first
        AUDIO frame (advice finding — `first` stayed bound to the tag)."""
        tag_frame = bytearray(encode_mp3_frames(1, 128, 44100, mono=True))
        tag_frame[4 + 17:4 + 17 + 4] = b"Xing"     # MPEG1 mono offset
        audio = encode_mp3_frames(4, 128, 44100)   # stereo
        m = mp3_metadata(bytes(tag_frame) + audio)
        assert m["n_frames"] == 4 and m["vbr"]
        assert m["channels"] == 2 and m["mode"] == "stereo"

    def test_xing_tag_found_behind_crc(self):
        """protection_bit=0 inserts a 16-bit CRC between header and
        side info (ISO 11172-3 §2.4.1.8), shifting a Xing/Info tag by
        2 bytes — the offset must account for it or a CRC-protected
        VBR file's tag frame is counted as audio (review finding)."""
        frames = encode_mp3_frames(6, 128, 44100, crc=True)
        flen = 144 * 128000 // 44100
        tag = bytearray(frames[:flen])
        tag[4 + 2 + 32:4 + 2 + 32 + 4] = b"Xing"   # +2 for the CRC
        m = mp3_metadata(bytes(tag) + frames[flen:])
        assert m["n_frames"] == 5 and m["vbr"]

    def test_truncated_final_frame_named_error(self):
        """A mid-frame-truncated download reports truncation, not a
        negative 'trailing garbage' count (review finding)."""
        good = encode_mp3_frames(3, 128, 44100)
        with pytest.raises(AudioFormatError, match="truncated final"):
            mp3_metadata(good[:-50])

    def test_desync_and_garbage_raise(self):
        good = encode_mp3_frames(2, 128, 44100)
        with pytest.raises(AudioFormatError):
            mp3_metadata(good + b"\x00\x01\x02\x03\x04")
        with pytest.raises(AudioFormatError):
            mp3_metadata(b"not audio at all")
        with pytest.raises(AudioFormatError):
            mp3_metadata(b"ID3\x03\x00\x00" + bytes([0, 0, 0, 0]))
        # mid-stream format change (44.1k then 48k) is a named error
        with pytest.raises(AudioFormatError, match="format change"):
            mp3_metadata(encode_mp3_frames(1, 128, 44100)
                         + encode_mp3_frames(1, 128, 48000))


class TestFuzz:
    """The flag-don't-drop catch set must be exhaustive: NO payload may
    raise anything outside (AudioFormatError, IndexError, ValueError)
    — anything else would escape the Spark stage's except clause and
    kill the job (the round-6 advice failure class)."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.binary(max_size=600))
    def test_random_bytes_never_escape(self, payload):
        try:
            mp3_metadata(payload)
        except (AudioFormatError, IndexError, ValueError):
            pass

    @settings(max_examples=150, deadline=None)
    @given(st.integers(0, 2**32 - 1), st.binary(max_size=400))
    def test_syncish_headers_never_escape(self, header, tail):
        """Bias toward the hard region: a valid-looking sync word with
        arbitrary header bits and arbitrary body bytes."""
        payload = b"\xff" + bytes([0xE0 | (header & 0x1F)]) \
            + (header >> 8).to_bytes(3, "big")[-2:] + tail
        try:
            mp3_metadata(payload)
        except (AudioFormatError, IndexError, ValueError):
            pass

    @settings(max_examples=100, deadline=None)
    @given(st.integers(1, 8), st.integers(0, 200))
    def test_truncations_of_valid_streams_never_escape(self, n, cut):
        payload = encode_mp3_frames(n, 128, 44100)
        try:
            m = mp3_metadata(payload[:len(payload) - cut])
            assert m["n_frames"] <= n
        except (AudioFormatError, IndexError, ValueError):
            pass


@pytest.fixture(scope="module")
def spark():
    from agnostic_blockchain_etl_spark.session import get_session
    yield get_session(master="local[8]",
                      conf={"spark.sql.shuffle.partitions": "8"})


def test_mp3_stage_flags_not_raises(spark):
    from agnostic_blockchain_etl_spark.operators.multimodal import (
        mp3_metadata_stage)
    rows = [(1, encode_mp3_frames(10, 128, 44100)),
            (2, b"RIFFnot-an-mp3"),
            (3, encode_mp3_frames(2, 64, 22050, mono=True))]
    out = mp3_metadata_stage(spark.createDataFrame(
        rows, "doc_id long, payload binary"))
    got = {r.doc_id: r for r in out.collect()}
    assert len(got) == 3
    assert got[1].n_frames == 10 and got[1].decode_error is None
    assert abs(got[1].duration_s - 10 * 1152 / 44100) < 1e-6
    assert got[2].decode_error and got[2].n_frames is None
    assert got[3].channels == 1 and got[3].sample_rate == 22050
