"""Image perceptual dedup: dHash invariances, banding-equals-brute-force
over a synthetic gallery, bad-payload flagging, and a no-cartesian plan."""

from __future__ import annotations

import os
import random
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from agnostic_blockchain_etl_spark.functions.imaging import (  # noqa: E402
    dhash64, encode_bmp, encode_png, encode_ppm, resize_rgb)
from agnostic_blockchain_etl_spark.operators.imagedup import (  # noqa: E402
    image_near_dup_pairs, image_phash)


@pytest.fixture(scope="module")
def spark():
    from agnostic_blockchain_etl_spark.session import get_session
    yield get_session(master="local[8]",
                      conf={"spark.sql.shuffle.partitions": "8"})


def _img(rng, w=32, h=24):
    return bytes(rng.randrange(256) for _ in range(w * h * 3))


def test_dhash_invariances():
    rng = random.Random(7)
    w, h = 32, 24
    rgb = _img(rng, w, h)
    base = dhash64(w, h, rgb)
    # uniform brightness shift: gradient signs survive -> identical hash
    shifted = bytes(min(255, b + 12) for b in rgb)
    assert dhash64(w, h, shifted) == base
    # resize: same content at 2x resolution hashes identically
    big = resize_rgb(w, h, rgb, 2 * w, 2 * h)
    assert dhash64(2 * w, 2 * h, big) == base
    # an unrelated image is far away
    other = dhash64(w, h, _img(rng, w, h))
    assert bin(base ^ other).count("1") > 10


def test_pairs_match_brute_force_and_cross_format(spark):
    """The banded join finds exactly the all-pairs Hamming<=6 set, and
    the SAME image re-encoded in a different container (BMP vs P6 vs
    PNG) is a 0-distance pair — the case byte-level dedup misses."""
    rng = random.Random(11)
    w, h = 32, 24
    gallery = [_img(rng, w, h) for _ in range(12)]
    rows = []
    for i, rgb in enumerate(gallery):
        rows.append((10 * i, bytearray(encode_bmp(w, h, rgb))))
    # re-encodes of gallery[0]: P6 and PNG containers, and a brightness
    # shift — all perceptual dups of doc 0
    rows.append((901, bytearray(encode_ppm(w, h, gallery[0]))))
    rows.append((902, bytearray(encode_png(w, h, gallery[0]))))
    rows.append((903, bytearray(encode_bmp(
        w, h, bytes(min(255, b + 9) for b in gallery[0])))))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")

    hashed = {r.doc_id: r.phash for r in image_phash(df).collect()}
    assert len(hashed) == len(rows)
    got = {(r.doc_a, r.doc_b, r.hamming)
           for r in image_near_dup_pairs(df).collect()}
    # brute force over the collected hashes
    ids = sorted(hashed)
    want = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            d = bin((hashed[a] ^ hashed[b]) & ((1 << 64) - 1)).count("1")
            if d <= 6:
                want.add((a, b, d))
    assert got == want
    # the three re-encodes pair with doc 0 at distance 0
    assert {(0, 901, 0), (0, 902, 0), (0, 903, 0)} <= got


def test_bad_payload_is_flagged_not_fatal(spark):
    rng = random.Random(3)
    rows = [(1, bytearray(encode_bmp(8, 8, _img(rng, 8, 8)))),
            (2, bytearray(b"GIF89a not supported")),
            (3, bytearray(b"BM truncated"))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in image_phash(df).collect()}
    assert got[1].phash is not None and got[1].decode_error is None
    assert got[2].phash is None and "magic" in got[2].decode_error
    assert got[3].phash is None and got[3].decode_error
    # pairs simply exclude the undecodable rows
    assert image_near_dup_pairs(df).count() == 0


def test_plan_has_no_cartesian(spark):
    import contextlib
    import io
    rng = random.Random(1)
    df = spark.createDataFrame(
        [(1, bytearray(encode_bmp(8, 8, _img(rng, 8, 8))))],
        "doc_id long, payload binary")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        image_near_dup_pairs(df).explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    with pytest.raises(ValueError):
        image_near_dup_pairs(df, max_hamming=7)


def test_audio_fingerprint_pairs(spark):
    """Gain-shifted copies of a clip pair at distance 0; unrelated
    clips don't pair; undecodable payloads are flagged."""
    import numpy as np
    from agnostic_blockchain_etl_spark.functions.audio import encode_wav
    from agnostic_blockchain_etl_spark.operators.imagedup import (
        audio_fingerprint, audio_near_dup_pairs)
    rng = np.random.default_rng(5)
    base = (rng.normal(0, 3000, 8000)
            * np.sin(np.linspace(0, 40, 8000))).astype("<i2")
    other = rng.normal(0, 3000, 8000).astype("<i2")
    rows = [(1, bytearray(encode_wav(8000, 1, base.tobytes()))),
            (2, bytearray(encode_wav(8000, 1,
                                     (base // 3).astype("<i2").tobytes()))),
            (3, bytearray(encode_wav(8000, 1, other.tobytes()))),
            (4, bytearray(b"not audio at all"))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    fp = {r.doc_id: r for r in audio_fingerprint(df).collect()}
    assert fp[1].phash == fp[2].phash        # gain-invariant
    assert fp[4].phash is None and fp[4].decode_error
    got = {(r.doc_a, r.doc_b): r.hamming
           for r in audio_near_dup_pairs(df).collect()}
    assert got == {(1, 2): 0}


def test_video_near_dup_pairs(spark):
    """A re-encoded brightness-shifted copy of a clip pairs (all
    sampled frames match at their offsets); a clip of unrelated frames
    does not; a trailing-extended copy still pairs via the shorter
    side's fraction."""
    from agnostic_blockchain_etl_spark.functions.imaging import encode_ppm
    from agnostic_blockchain_etl_spark.operators.imagedup import (
        video_frame_phashes, video_near_dup_pairs)
    rng = random.Random(21)
    w, h = 16, 12
    frames = [_img(rng, w, h) for _ in range(8)]

    def clip(fs):
        return bytearray(b"".join(encode_ppm(w, h, f) for f in fs))

    shifted = [bytes(min(255, b + 7) for b in f) for f in frames]
    rows = [(1, clip(frames)),
            (2, clip(shifted)),                       # perceptual copy
            (3, clip([_img(rng, w, h) for _ in range(8)])),  # unrelated
            (4, clip(frames + [_img(rng, w, h) for _ in range(8)])),
            (5, bytearray(b"not a video"))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")

    fp = video_frame_phashes(df, every_n=2).collect()
    per_doc = {}
    for r in fp:
        per_doc.setdefault(r.doc_id, []).append(r)
    assert len(per_doc[1]) == 4            # 8 frames sampled every 2
    assert len(per_doc[4]) == 8
    assert per_doc[5][0].decode_error      # flagged, not fatal

    got = {(r.doc_a, r.doc_b): r for r in
           video_near_dup_pairs(df, every_n=2).collect()}
    assert (1, 2) in got and got[(1, 2)].n_matched == 4
    assert got[(1, 2)].frac_a == 1.0 and got[(1, 2)].frac_b == 1.0
    # trailing-extended copy: all of doc 1's frames match -> frac_a = 1
    assert (1, 4) in got and got[(1, 4)].frac_a == 1.0
    assert got[(1, 4)].frac_b == 0.5
    assert not any(3 in k for k in got)


def test_curate_media_recipe(spark):
    """One-call media curation: re-encodes cluster together and keep
    exactly one canonical; undecodables are flagged with keep=0; the
    report matches the flags."""
    from agnostic_blockchain_etl_spark.functions.imaging import encode_ppm
    from agnostic_blockchain_etl_spark.operators.imagedup import curate_media
    rng = random.Random(31)
    w, h = 16, 12
    a, b = _img(rng, w, h), _img(rng, w, h)
    rows = [(1, bytearray(encode_bmp(w, h, a))),
            (2, bytearray(encode_ppm(w, h, a))),          # dup of 1
            (3, bytearray(encode_png(w, h, a))),          # dup of 1
            (4, bytearray(encode_bmp(w, h, b))),          # unique
            (5, bytearray(b"JUNK payload"))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    ann, report = curate_media(df)
    got = {r.doc_id: r for r in ann.collect()}
    assert got[1].keep == 1 and got[1].cluster_id == 1
    assert got[2].keep == 0 and got[2].cluster_id == 1
    assert got[3].keep == 0 and got[3].cluster_id == 1
    assert got[4].keep == 1
    assert got[5].keep == 0 and got[5].decode_ok == 0 and got[5].decode_error
    r = report.collect()[0]
    assert r.n_assets == 5 and r.n_decoded == 4 and r.n_kept == 2
    assert r.kept_bytes == got[1].n_bytes + got[4].n_bytes
    with pytest.raises(ValueError):
        curate_media(df, modality="video")


def test_hamming_max_bucket_size_guards_degenerate_bucket(spark):
    """The realistic 100 TB hazard: thousands of flat images all hash
    to dHash 0 and land in ONE (band, band_bits) bucket per band. With
    the cap, that bucket is dropped (logged) and its quadratic pair
    term vanishes, while planted NON-degenerate near-dups still pair."""
    from pyspark.sql import functions as F
    from agnostic_blockchain_etl_spark.operators.imagedup import (
        hamming_near_dup_pairs)
    flat = [(i, 0) for i in range(200)]              # degenerate: all zero
    base = 0x0123456789ABCDEF
    planted = [(1000, base), (1001, base ^ 0b11)]    # hamming 2 pair
    df = spark.createDataFrame(flat + planted, "doc_id long, phash long")
    capped = hamming_near_dup_pairs(df, 6, max_bucket_size=50).collect()
    got = {(r.doc_a, r.doc_b): r.hamming for r in capped}
    assert got == {(1000, 1001): 2}, got
    # without the cap the zero bucket contributes C(200,2) pairs
    uncapped = hamming_near_dup_pairs(df, 6)
    assert uncapped.count() == 1 + 200 * 199 // 2


def test_banding_lossless_fuzz(spark):
    """Property: on RANDOM 64-bit signed hashes (planted near pairs +
    background noise), banded pairs == brute-force pairs for every
    radius up to the pigeonhole bound. Catches band boundary/sign bugs
    the structured fixtures can't."""
    import itertools
    import random as _r
    from agnostic_blockchain_etl_spark.operators.imagedup import (
        hamming_near_dup_pairs)
    for seed in (11, 23, 47):
        rng = _r.Random(seed)
        rows = []
        for i in range(60):
            rows.append((i, rng.getrandbits(64) - (1 << 63)))
        # planted: perturb existing hashes by <= 6 random bit flips
        # (wrap to signed 64-bit — python XOR is unbounded)
        for j in range(20):
            base = rows[rng.randrange(60)][1]
            mask = 0
            for _ in range(rng.randrange(0, 7)):
                mask |= 1 << rng.randrange(64)
            v = (base ^ mask) & ((1 << 64) - 1)
            rows.append((100 + j, v - (1 << 64) if v >= 1 << 63 else v))
        df = spark.createDataFrame(rows, "doc_id long, phash long")
        for radius in (2, 6):
            got = {(r.doc_a, r.doc_b, r.hamming) for r in
                   hamming_near_dup_pairs(df, radius).collect()}
            want = set()
            for (ia, ha), (ib, hb) in itertools.combinations(rows, 2):
                d = bin((ha ^ hb) & ((1 << 64) - 1)).count("1")
                if d <= radius:
                    a, b = min(ia, ib), max(ia, ib)
                    want.add((a, b, d))
            assert got == want, (seed, radius,
                                 got.symmetric_difference(want))
