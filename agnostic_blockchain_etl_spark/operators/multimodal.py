"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed by Arrow-batched ``mapInPandas`` stages.

The pattern for image/audio/video at 100 TB: the payload travels as a
``binary`` column next to a metadata struct; decode / feature-extract /
resize / frame-sample run as pandas-batched Python stages that see whole
Arrow record batches (one (de)serialization per ~10k rows, not per row).
Partitioning carries the payload column only through the stages that read
it — everything else projects it away (column pruning keeps the scan
narrow).

Decode kernels: ``real_decode=True`` runs the pure-Python BMP/PPM/PNG
decoder in ``functions/imaging.py`` (header parse, stride/padding,
BGR→RGB reorder, bottom-up flip, zlib inflate + scanline unfiltering,
plus the pure-numpy baseline JPEG codec in ``functions/jpeg.py`` —
real decoding, no external libs); ``real_decode=False`` derives a
deterministic fake feature row from the payload bytes, used by the gate
query whose payloads are text bytes, not images. The one remaining
disclosed format is MP3 (needs a subband filterbank; WAV covers the
audio slot with a real decoder) — such payloads flag ``decode_error``
and are never dropped; the Spark plumbing is format-agnostic.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .tables import load_tables

from .registry import make_registry

QUERIES, ORACLES, query = make_registry()


def decode_image_stub(payload: bytes, real_decode: bool = False) -> dict:
    """Decode kernel. ``real_decode=True`` → the BMP/P6 decoder in
    ``functions.imaging``; ``False`` → a deterministic fake feature row
    derived from the payload bytes (for non-image payloads, e.g. the gate
    query's text-byte stand-ins)."""
    if real_decode:
        from ..functions.imaging import decode_image
        return decode_image(payload)
    # deterministic fake "decode": metadata derived from the payload bytes
    n = len(payload)
    return {"n_bytes": n,
            "width": 64 + (n % 512),
            "height": 64 + ((n * 7) % 512),
            "checksum": sum(payload) % 65536}


_OUT_SCHEMA = ("doc_id BIGINT, modality STRING, n_chars BIGINT, "
               "chunk_count BIGINT, n_bytes BIGINT, width BIGINT, "
               "height BIGINT, checksum BIGINT, decode_error STRING")

_FEATURE_COLS = ["n_bytes", "width", "height", "checksum"]


def _decode_batches_fn(real_decode: bool):
    """mapInPandas kernel factory: whole Arrow batches in, decoded
    features out; the typed metadata columns pass through the stage
    untouched (the catalog row rides next to the decode — no re-join
    afterwards). Flag-don't-drop: an undecodable payload (malformed
    stream, unsupported format — e.g. MP3) emits its row with null
    features and the error string in ``decode_error`` instead of
    raising through the kernel and failing the whole Spark job (the
    `imagedup._phash_batches` contract; n_bytes is always real — it
    needs no decode)."""
    from ..functions.imaging import ImageFormatError

    def _decode_one(payload: bytes) -> dict:
        try:
            row = decode_image_stub(payload, real_decode=real_decode)
            return {**{c: row.get(c) for c in _FEATURE_COLS},
                    "n_bytes": row.get("n_bytes", len(payload)),
                    "decode_error": None}
        except (ImageFormatError, IndexError, ValueError) as exc:
            return {**dict.fromkeys(_FEATURE_COLS),
                    "n_bytes": len(payload), "decode_error": str(exc)}

    def _decode_batches(
            batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                # zero-row Arrow batches must not emit a column-less frame
                # (pd.DataFrame([]) has no columns -> schema mismatch)
                continue
            decoded = pd.DataFrame(
                [_decode_one(bytes(p)) for p in pdf["payload"]],
                columns=_FEATURE_COLS + ["decode_error"])
            passthrough = pdf[["doc_id", "modality", "n_chars",
                               "chunk_count"]].reset_index(drop=True)
            yield pd.concat([passthrough, decoded], axis=1)
    return _decode_batches


def decode_features(assets: DataFrame, real_decode: bool = False) -> DataFrame:
    """Arrow-batched decode stage over an asset frame with columns
    ``doc_id, payload, modality, n_chars, chunk_count``. Undecodable
    payloads keep their row: null features + ``decode_error`` string
    (flag-don't-drop; filter on ``decode_error IS NULL`` downstream)."""
    return assets.mapInPandas(_decode_batches_fn(real_decode), _OUT_SCHEMA)


_RESIZE_SCHEMA = ("doc_id BIGINT, width BIGINT, height BIGINT, "
                  "payload BINARY, checksum BIGINT")


def resize_images(assets: DataFrame, target_w: int,
                  target_h: int) -> DataFrame:
    """Arrow-batched resize stage: decode (BMP/P6 by magic),
    nearest-neighbor resample to ``target_w × target_h``, re-encode as
    P6. Input needs ``doc_id, payload``; output carries the resized
    payload plus its pixel checksum. The canonical thumbnail/normalize
    step of an image-corpus pipeline — payload bytes cross the Python
    boundary once per Arrow batch, and the stage is a 1:1 row map, so
    upstream partitioning is preserved."""
    from ..functions.imaging import (decode_bmp, decode_ppm, encode_ppm,
                                     resize_rgb)

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                p = bytes(payload)
                w, h, rgb = (decode_bmp(p) if p[:2] == b"BM"
                             else decode_ppm(p))
                out = resize_rgb(w, h, rgb, target_w, target_h)
                rows.append((int(doc_id), target_w, target_h,
                             encode_ppm(target_w, target_h, out),
                             sum(out) % 65536))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "width", "height", "payload", "checksum"])

    return assets.mapInPandas(_resize, _RESIZE_SCHEMA)


_AUDIO_SCHEMA = ("doc_id BIGINT, sample_rate BIGINT, channels BIGINT, "
                 "n_frames BIGINT, duration_s DOUBLE, rms DOUBLE, "
                 "peak BIGINT")


def audio_feature_stage(assets: DataFrame) -> DataFrame:
    """Arrow-batched audio feature extraction over RIFF/WAV PCM16
    payloads (``functions/audio.py`` — real header walk + numpy over the
    decoded samples). Input needs ``doc_id, payload``; 1:1 row map."""
    from ..functions.audio import audio_features

    def _features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats = pd.DataFrame(
                [audio_features(bytes(p)) for p in pdf["payload"]])
            out = pdf[["doc_id"]].reset_index(drop=True)
            yield pd.concat([out, feats], axis=1)

    return assets.mapInPandas(_features, _AUDIO_SCHEMA)


_MP3_SCHEMA = ("doc_id BIGINT, n_frames BIGINT, sample_rate BIGINT, "
               "channels BIGINT, mode STRING, version STRING, "
               "bitrate_kbps DOUBLE, vbr BOOLEAN, duration_s DOUBLE, "
               "decode_error STRING")

_MP3_COLS = ["n_frames", "sample_rate", "channels", "mode", "version",
             "bitrate_kbps", "vbr", "duration_s"]


def mp3_metadata_stage(assets: DataFrame) -> DataFrame:
    """Arrow-batched MP3 stream-metadata extraction (``functions/mp3.py``
    — spec-direct frame-header walk: sync, bitrate/samplerate tables,
    ID3v2 skip, Xing/Info VBR tag, frame count → duration). Input needs
    ``doc_id, payload``; 1:1 row map; undecodable payloads flag
    ``decode_error`` and keep their row (flag-don't-drop). This is the
    MP3 slot's deliberate scope — metadata, not PCM; see COVERAGE.md's
    multimodal close-out for the sample-decode decision."""
    from ..functions.mp3 import AudioFormatError, mp3_metadata

    def _meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    m = mp3_metadata(bytes(payload))
                    rows.append({"doc_id": int(doc_id),
                                 **{c: m[c] for c in _MP3_COLS},
                                 "decode_error": None})
                except (AudioFormatError, IndexError, ValueError) as exc:
                    rows.append({"doc_id": int(doc_id),
                                 **dict.fromkeys(_MP3_COLS),
                                 "decode_error": str(exc)})
            yield pd.DataFrame(rows, columns=["doc_id", *_MP3_COLS,
                                              "decode_error"])

    return assets.select("doc_id", "payload").mapInPandas(_meta,
                                                          _MP3_SCHEMA)


_FRAMES_SCHEMA = ("doc_id BIGINT, frame_idx BIGINT, width BIGINT, "
                  "height BIGINT, checksum BIGINT, payload BINARY")


def sample_frames(assets: DataFrame, every_n: int = 2) -> DataFrame:
    """Arrow-batched frame-sampling stage over a concatenated-P6 "video"
    payload (every frame is a self-describing P6 image — the no-codec
    container): keep frames 0, n, 2n, ..., emitting ONE ROW PER KEPT
    FRAME (a row-exploding pandas stage — output cardinality differs
    from input, which mapInPandas supports and a pandas_udf does not).
    Input needs ``doc_id, payload``."""
    from ..functions.imaging import encode_ppm, split_p6_stream

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for idx, (w, h, rgb) in enumerate(
                        split_p6_stream(bytes(payload))):
                    if idx % every_n == 0:
                        rows.append((int(doc_id), idx, w, h,
                                     sum(rgb) % 65536,
                                     encode_ppm(w, h, rgb)))
            if rows:
                yield pd.DataFrame(rows, columns=[
                    "doc_id", "frame_idx", "width", "height",
                    "checksum", "payload"])

    return assets.mapInPandas(_sample, _FRAMES_SCHEMA)


@query("multimodal_decode_features", oracle="""
    SELECT doc_id,
           'text/plain'                                           AS modality,
           CAST(length(text) AS BIGINT)                           AS n_chars,
           CAST(ceil(length(text) / 1024.0) AS BIGINT)            AS chunk_count,
           CAST(octet_length(payload) AS BIGINT)                  AS n_bytes,
           CAST(64 + octet_length(payload) % 512 AS BIGINT)       AS width,
           CAST(64 + (octet_length(payload) * 7) % 512 AS BIGINT) AS height,
           CAST(byte_sum % 65536 AS BIGINT)                       AS checksum,
           CAST(NULL AS VARCHAR)                                  AS decode_error
    FROM (
        SELECT doc_id, text, encode(text) AS payload,
               list_sum(list_transform(generate_series(1, length(text)),
                        i -> ascii(text[i]))) AS byte_sum
        FROM documents)
""")
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal asset pipeline, both facets in one stage:

    - typed metadata struct alongside the payload (modality tag, char
      size, chunking — the catalog row for the asset), built JVM-side
      and flattened;
    - binary-column decode: an opaque payload column (here from text
      bytes — stand-in for image bytes) through the Arrow-batched
      ``mapInPandas`` decode stage, metadata passing through.

    The oracle mirrors the stub's arithmetic, proving batch shape and
    row alignment survive the mapInPandas boundary."""
    t = load_tables(spark, sf_dir, ("documents",))
    # mapInPandas parallelism == input partitions: heal 1-partition scans
    # or the whole decode stage runs on a single Python worker
    from .tables import spread
    meta = spread(t["documents"]).select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("modality"),
            F.length("text").cast("long").alias("n_chars"),
            F.ceil(F.length("text") / 1024.0).cast("long").alias("chunk_count"),
        ).alias("meta"))
    flat = meta.select(
        "doc_id", "payload",
        F.col("meta.modality").alias("modality"),
        F.col("meta.n_chars").alias("n_chars"),
        F.col("meta.chunk_count").alias("chunk_count"))
    return decode_features(flat, real_decode=False)
