"""Image near-duplicate detection over binary image columns — the
multimodal counterpart of `dedup.simhash_pairs`: re-encoded, resized,
or brightness-shifted copies of an image survive exact (byte-level)
dedup, but their perceptual hashes collide. The recipe (standard in
LAION-scale image corpus curation):

1. decode each payload (BMP / P6-PPM / PNG by magic — the container's
   real codecs, `functions/imaging.py`) and compute a 64-bit dHash
   (`imaging.dhash64`: 9×8 integer-luma gradient signs — invariant to
   uniform brightness/contrast and to resizing);
2. near-dup pairs = Hamming distance ≤ ``max_hamming`` over the
   hashes, found with banded-prefix LSH exactly like SimHash: 7 bands
   over 64 bits guarantee (pigeonhole) that any pair within Hamming 6
   shares at least one exact band, so the equi-join loses nothing
   versus all-pairs — and the plan never goes quadratic.

Spark shapes: hashing is one Arrow-batched ``mapInPandas`` stage
(bytes cross the Python boundary once, the sanctioned codec boundary);
the pair join shuffles on (band, band_bits) — linear in corpus size
with ~n²/2^bits random collisions per band; the exact
``bit_count(xor)`` filter runs BEFORE the distinct so only true
near-dups pay the de-dup shuffle. Clustering composes with
`dedup.connected_components` unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 7 bands over 64 bits (six 9-bit + one 10-bit): Hamming <= 6 flips at
# most 6 bands, so >= 1 of the 7 matches exactly — lossless banding.
_BANDS: list[tuple[int, int]] = [(0, 9), (9, 9), (18, 9), (27, 9),
                                 (36, 9), (45, 9), (54, 10)]
_HAMMING_MAX = 6

_HASH_SCHEMA = ("doc_id long, n_bytes long, width int, height int, "
                "phash long, decode_error string")


def _phash_batches(batches: Iterator["pd.DataFrame"]  # noqa: F821
                   ) -> Iterator["pd.DataFrame"]:     # noqa: F821
    import pandas as pd

    from ..functions.imaging import (ImageFormatError, decode_bmp,
                                     decode_png, decode_ppm, dhash64,
                                     _PNG_MAGIC)
    for b in batches:
        rows = []
        for doc_id, payload in zip(b["doc_id"], b["payload"]):
            payload = bytes(payload)
            try:
                if payload[:2] == b"BM":
                    w, h, rgb = decode_bmp(payload)
                elif payload[:2] == b"P6":
                    w, h, rgb = decode_ppm(payload)
                elif payload[:8] == _PNG_MAGIC:
                    w, h, rgb = decode_png(payload)
                elif payload[:2] == b"\xff\xd8":
                    from ..functions.jpeg import decode_jpeg
                    w, h, rgb = decode_jpeg(payload)
                else:
                    raise ImageFormatError(
                        f"unrecognized magic {payload[:2]!r}")
                # dhash64 yields unsigned 64-bit; store as signed long
                # (two's complement) so Spark's bit ops apply directly
                ph = dhash64(w, h, rgb)
                if ph >= 1 << 63:
                    ph -= 1 << 64
                rows.append((doc_id, len(payload), w, h, ph, None))
            except (ImageFormatError, IndexError, ValueError) as exc:
                rows.append((doc_id, len(payload), None, None, None,
                             str(exc)))
        yield pd.DataFrame(rows, columns=["doc_id", "n_bytes", "width",
                                          "height", "phash",
                                          "decode_error"])


def image_phash(assets: DataFrame) -> DataFrame:
    """Per-image perceptual hash: ``(doc_id, n_bytes, width, height,
    phash, decode_error)`` — one Arrow-batched decode+hash pass over
    ``(doc_id, payload)``. Undecodable payloads yield a null hash and
    the error string (flag-don't-drop; they simply never pair)."""
    return assets.select("doc_id", "payload") \
        .mapInPandas(_phash_batches, _HASH_SCHEMA)


def hamming_near_dup_pairs(hashed: DataFrame,
                           max_hamming: int = _HAMMING_MAX,
                           max_bucket_size: int | None = None) -> DataFrame:
    """Hamming-≤``max_hamming`` pairs over ANY ``(doc_id, phash)``
    frame of 64-bit hashes (images, audio fingerprints, custom
    sketches): banded equi-join + exact bit_count filter, identical
    output to all-pairs (pigeonhole-lossless for ``max_hamming`` ≤ 6;
    raise the band count before raising the radius past that).

    ``max_bucket_size`` (default off) caps each (band, band_bits)
    group before the self-join (`dedup.cap_group_size`, dropped groups
    logged). The realistic degenerate bucket here is DHASH ZERO: every
    flat/monochrome image (solid thumbnails, blanks, test cards) hashes
    to all-zero gradients, so at corpus scale one bucket holds millions
    of rows and the candidate join goes quadratic in it. Unlike MinHash
    banding, a capped bucket here CAN lose true pairs in that bucket —
    but an all-zero dHash carries no discriminative signal anyway
    (route such assets to exact byte dedup instead)."""
    if max_hamming > len(_BANDS) - 1:
        raise ValueError(
            f"max_hamming {max_hamming} exceeds the lossless radius of "
            f"{len(_BANDS)} bands ({len(_BANDS) - 1})")
    hashed = hashed.where(F.col("phash").isNotNull())
    band_stack = ", ".join(
        f"{j}, (phash >> {off}) & {(1 << width) - 1}"
        for j, (off, width) in enumerate(_BANDS))
    bands = hashed.selectExpr(
        "doc_id", "phash",
        f"stack({len(_BANDS)}, {band_stack}) as (band, band_bits)")
    if max_bucket_size is not None:
        from .dedup import cap_group_size
        bands = cap_group_size(bands, ["band", "band_bits"],
                               max_bucket_size, "hamming_near_dup_pairs")
    hamming = F.expr("bit_count(a_phash ^ b_phash)")
    cand = (bands.alias("a")
            .join(bands.alias("b"),
                  (F.col("a.band") == F.col("b.band")) &
                  (F.col("a.band_bits") == F.col("b.band_bits")) &
                  (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"),
                    F.col("a.phash").alias("a_phash"),
                    F.col("b.phash").alias("b_phash")))
    return (cand.where(hamming <= max_hamming)
            .select("doc_a", "doc_b", hamming.cast("int").alias("hamming"))
            .distinct())


def image_near_dup_pairs(assets: DataFrame,
                         max_hamming: int = _HAMMING_MAX,
                         max_bucket_size: int | None = None) -> DataFrame:
    """Perceptually-near image pairs ``(doc_a, doc_b, hamming)`` with
    ``doc_a < doc_b`` and Hamming(dHash) ≤ ``max_hamming``."""
    return hamming_near_dup_pairs(image_phash(assets), max_hamming,
                                  max_bucket_size)


_AUDIO_SCHEMA = ("doc_id long, n_bytes long, sample_rate int, "
                 "n_frames long, phash long, decode_error string")


def _audio_fp_batches(batches: Iterator["pd.DataFrame"]  # noqa: F821
                      ) -> Iterator["pd.DataFrame"]:     # noqa: F821
    import pandas as pd

    from ..functions.audio import (AudioFormatError,
                                   afingerprint64_samples, decode_wav)
    for b in batches:
        rows = []
        for doc_id, payload in zip(b["doc_id"], b["payload"]):
            payload = bytes(payload)
            try:
                rate, _, samples = decode_wav(payload)
                fp = afingerprint64_samples(samples)
                if fp >= 1 << 63:
                    fp -= 1 << 64
                rows.append((doc_id, len(payload), rate,
                             int(samples.shape[0]), fp, None))
            except (AudioFormatError, ValueError, IndexError) as exc:
                rows.append((doc_id, len(payload), None, None, None,
                             str(exc)))
        yield pd.DataFrame(rows, columns=["doc_id", "n_bytes",
                                          "sample_rate", "n_frames",
                                          "phash", "decode_error"])


def audio_fingerprint(assets: DataFrame) -> DataFrame:
    """Per-clip 64-bit energy-contour fingerprint over RIFF/WAV PCM16
    payloads (`functions/audio.afingerprint64`): ``(doc_id, n_bytes,
    sample_rate, n_frames, phash, decode_error)`` — same Arrow-batched
    flag-don't-drop contract as `image_phash`."""
    return assets.select("doc_id", "payload") \
        .mapInPandas(_audio_fp_batches, _AUDIO_SCHEMA)


def audio_near_dup_pairs(assets: DataFrame,
                         max_hamming: int = _HAMMING_MAX,
                         max_bucket_size: int | None = None) -> DataFrame:
    """Perceptually-near audio pairs — gain-shifted or re-contained
    copies of a clip pair at small Hamming distance while exact dedup
    misses them. Same banded machinery as the image form (degenerate
    bucket: digital silence — the all-zero energy contour)."""
    return hamming_near_dup_pairs(audio_fingerprint(assets), max_hamming,
                                  max_bucket_size)


_FRAME_SCHEMA = ("doc_id long, frame_idx int, phash long, "
                 "decode_error string")


def _video_fp_batches(every_n: int):
    def fn(batches: Iterator["pd.DataFrame"]  # noqa: F821
           ) -> Iterator["pd.DataFrame"]:     # noqa: F821
        import pandas as pd

        from ..functions.imaging import (ImageFormatError, dhash64,
                                         split_p6_stream)
        for b in batches:
            rows = []
            for doc_id, payload in zip(b["doc_id"], b["payload"]):
                try:
                    frames = split_p6_stream(bytes(payload))
                    for idx, (w, h, rgb) in enumerate(frames):
                        if idx % every_n:
                            continue
                        ph = dhash64(w, h, rgb)
                        if ph >= 1 << 63:
                            ph -= 1 << 64
                        rows.append((doc_id, idx, ph, None))
                except (ImageFormatError, ValueError, IndexError) as exc:
                    rows.append((doc_id, None, None, str(exc)))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx",
                                              "phash", "decode_error"])
    return fn


def video_frame_phashes(assets: DataFrame, every_n: int = 2) -> DataFrame:
    """One row per SAMPLED frame of a concatenated-P6 video payload:
    ``(doc_id, frame_idx, phash, decode_error)`` — dHash over every
    n-th frame (the shot-signature practice: near-dup videos share
    near-dup frames at matching offsets)."""
    return assets.select("doc_id", "payload") \
        .mapInPandas(_video_fp_batches(every_n), _FRAME_SCHEMA)


def video_near_dup_pairs(assets: DataFrame, every_n: int = 2,
                         max_hamming: int = _HAMMING_MAX,
                         min_frame_frac: float = 0.5) -> DataFrame:
    """Video near-dup pairs ``(doc_a, doc_b, n_matched, frac_a,
    frac_b)``: two videos pair when ≥ ``min_frame_frac`` of the
    SHORTER one's sampled frames have a Hamming-≤``max_hamming``
    counterpart at the SAME frame offset in the other (re-encoded,
    brightness-shifted, or trailing-extended copies match; unrelated
    content does not).

    Scale: per-frame hashes ride the banded Hamming join keyed
    (frame_idx, band, band_bits) — same-offset frames only, so a
    popular static intro frame never cross-products across offsets;
    the per-video frame counts ride a broadcast-sized aggregate join."""
    frames = video_frame_phashes(assets, every_n) \
        .where(F.col("phash").isNotNull())
    counts = frames.groupBy("doc_id").agg(F.count("*").alias("nf"))
    band_stack = ", ".join(
        f"{j}, (phash >> {off}) & {(1 << width) - 1}"
        for j, (off, width) in enumerate(_BANDS))
    bands = frames.selectExpr(
        "doc_id", "frame_idx", "phash",
        f"stack({len(_BANDS)}, {band_stack}) as (band, band_bits)")
    hamming = F.expr("bit_count(a_phash ^ b_phash)")
    matched = (bands.alias("a")
               .join(bands.alias("b"),
                     (F.col("a.frame_idx") == F.col("b.frame_idx")) &
                     (F.col("a.band") == F.col("b.band")) &
                     (F.col("a.band_bits") == F.col("b.band_bits")) &
                     (F.col("a.doc_id") < F.col("b.doc_id")))
               .select(F.col("a.doc_id").alias("doc_a"),
                       F.col("b.doc_id").alias("doc_b"),
                       F.col("a.frame_idx").alias("frame_idx"),
                       F.col("a.phash").alias("a_phash"),
                       F.col("b.phash").alias("b_phash"))
               .where(hamming <= max_hamming)
               .select("doc_a", "doc_b", "frame_idx").distinct())
    agg = matched.groupBy("doc_a", "doc_b") \
        .agg(F.count("*").alias("n_matched"))
    return (agg
            .join(counts.select(F.col("doc_id").alias("doc_a"),
                                F.col("nf").alias("nf_a")), "doc_a")
            .join(counts.select(F.col("doc_id").alias("doc_b"),
                                F.col("nf").alias("nf_b")), "doc_b")
            .select("doc_a", "doc_b", "n_matched",
                    F.round(F.col("n_matched") / F.col("nf_a"), 4)
                     .alias("frac_a"),
                    F.round(F.col("n_matched") / F.col("nf_b"), 4)
                     .alias("frac_b"))
            .where(F.greatest("frac_a", "frac_b") >= min_frame_frac))


def curate_media(assets: DataFrame, max_hamming: int = _HAMMING_MAX,
                 modality: str = "image",
                 max_bucket_size: int | None = None
                 ) -> tuple[DataFrame, DataFrame]:
    """One-call media curation (the `curate.curate_corpus` contract for
    binary columns): returns ``(annotated, report)`` where ``annotated``
    is one row per asset — ``doc_id, n_bytes, phash, decode_error,
    decode_ok, cluster_id, dup_keep, keep`` — and ``report`` is a single
    row of survivor counts. Flag-don't-filter: undecodable payloads and
    perceptual duplicates are columns, not absences.

    ``modality``: 'image' (BMP/P6/PNG dHash) or 'audio' (WAV energy
    fingerprint). Perceptual duplicate clusters come from the banded
    Hamming pairs + `dedup.connected_components`; each cluster keeps
    its smallest doc_id (compose with `dedup.select_cluster_canonical`
    for quality-aware keepers).

    Scale: one Arrow decode+hash pass, one banded pair join, the
    pair-bounded CC iteration, one membership join — no stage touches
    payload bytes twice."""
    from .dedup import connected_components
    if modality == "image":
        hashed = image_phash(assets)
    elif modality == "audio":
        hashed = audio_fingerprint(assets) \
            .withColumnRenamed("n_frames", "n_units")
    else:
        raise ValueError(f"modality must be image|audio, got {modality!r}")
    hashed = hashed.select("doc_id", "n_bytes", "phash", "decode_error")
    pairs = hamming_near_dup_pairs(hashed, max_hamming, max_bucket_size) \
        .select("doc_a", "doc_b")
    labels = connected_components(pairs)
    annotated = (hashed
                 .join(labels.withColumnRenamed("doc_id", "d")
                       .withColumnRenamed("label", "cluster"),
                       F.col("doc_id") == F.col("d"), "left")
                 .select("doc_id", "n_bytes", "phash", "decode_error",
                         F.col("phash").isNotNull().cast("int")
                          .alias("decode_ok"),
                         F.coalesce("cluster", F.col("doc_id"))
                          .alias("cluster_id"))
                 .withColumn("dup_keep",
                             (F.col("cluster_id") == F.col("doc_id"))
                             .cast("int"))
                 .withColumn("keep",
                             (F.col("decode_ok") * F.col("dup_keep"))
                             .cast("int")))
    report = annotated.agg(
        F.count("*").alias("n_assets"),
        F.sum("decode_ok").alias("n_decoded"),
        F.sum("dup_keep").alias("n_canonical"),
        F.sum("keep").alias("n_kept"),
        F.sum(F.col("keep") * F.col("n_bytes")).alias("kept_bytes"))
    return annotated, report


# ---------------------------------------------------------------------------
# Oracle-gate row: the banded-Hamming pair machinery under full value check
# ---------------------------------------------------------------------------

from .registry import make_registry

QUERIES, ORACLES, query = make_registry()


# Deterministic synthetic 64-bit perceptual-hash column over `documents`:
# docs in the same (source, doc_id%13) group share a base hash (the 60-bit
# md5-derived `dedup` hash of the group key) perturbed by flipping
# (doc_id%5) known bits, so within-group pairs land at Hamming 0..8 —
# some inside the <=6 radius, some outside, exercising both the banded
# recall and the exact bit_count filter. Cross-group pairs sit at ~30 and
# never match. The ORACLE is brute-force all-pairs (O(n^2) is fine at
# gate scale), so a green row PROVES the banded equi-join is lossless
# versus all-pairs cross-engine, not just self-consistent.
def _mask_sql(shift_fmt: str) -> str:
    """The planted-bit mask with engine-specific shift syntax:
    ``shift_fmt`` formats a bit-position SQL snippet into a 1<<pos
    expression."""
    return " | ".join(
        "(CASE WHEN doc_id % 5 > {j} THEN {shifted}"
        " ELSE CAST(0 AS BIGINT) END)".format(
            j=j, shifted=shift_fmt.format(pos=f"(doc_id*7 + {13 * j}) % 60"))
        for j in range(4))


from .dedup import _SQL_HASH60 as _H60  # md5-derived 60-bit hash, shared


@query("dedup_hamming_pairs", oracle=f"""
    WITH keyed AS (
        SELECT doc_id,
               source || '|' || CAST(doc_id % 13 AS VARCHAR) AS shingle
        FROM documents),
    based AS (
        SELECT doc_id, {_H60} AS base FROM keyed),
    masked AS (
        SELECT doc_id,
               xor(base, {_mask_sql("(1::BIGINT << ({pos}))")}) AS phash
        FROM based)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
    FROM masked a JOIN masked b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.phash, b.phash)) <= {_HAMMING_MAX}
""")
def dedup_hamming_pairs(spark: DataFrame, sf_dir: str) -> DataFrame:
    """`hamming_near_dup_pairs` (the perceptual image/audio/video dedup
    core) under the value gate, on the planted synthetic hash column
    described above. Spark runs the production banded equi-join;
    DuckDB's oracle is brute-force all-pairs + bit_count — equality is
    a cross-engine losslessness proof for the banding."""
    from .tables import load_tables
    from .dedup import _spark_hash60
    t = load_tables(spark, sf_dir, ("documents",))
    base = _spark_hash60(
        F.concat_ws("|", F.col("source"),
                    (F.col("doc_id") % 13).cast("string")))
    mask = F.expr(_mask_sql(
        "shiftleft(CAST(1 AS BIGINT), CAST({pos} AS INT))"))
    hashed = t["documents"].select(
        "doc_id", base.bitwiseXOR(mask).alias("phash"))
    return hamming_near_dup_pairs(hashed, _HAMMING_MAX)
