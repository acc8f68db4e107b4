"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed by Arrow-batched ``mapInPandas`` stages.

The pattern for image/audio/video at 100 TB: the payload travels as a
``binary`` column next to a metadata struct; decode / feature-extract /
resize / frame-sample run as pandas-batched Python stages that see whole
Arrow record batches (one (de)serialization per ~10k rows, not per row).
Partitioning carries the payload column only through the stages that read
it — everything else projects it away (column pruning keeps the scan
narrow).

The decode kernels themselves are STUBBED here (no image/audio libraries
in this container): ``decode_image_stub`` raises ``NotImplementedError``
when asked for a real decode and otherwise produces a deterministic fake
feature row, so the Spark-side plumbing — schema, batching, UDF signature,
partition behavior — is real and tested, and the kernel body is the only
swap-in needed for production.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .tables import load_tables

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


def decode_image_stub(payload: bytes, real_decode: bool = False) -> dict:
    """STUB decode kernel. With ``real_decode=True`` this is where a real
    image library would run — unavailable in this container."""
    if real_decode:
        raise NotImplementedError(
            "real image decoding requires an image library not present in "
            "this environment; the deterministic fake below exercises the "
            "identical Spark plumbing")
    # deterministic fake "decode": metadata derived from the payload bytes
    n = len(payload)
    return {"n_bytes": n,
            "width": 64 + (n % 512),
            "height": 64 + ((n * 7) % 512),
            "checksum": sum(payload) % 65536}


_OUT_SCHEMA = ("doc_id BIGINT, modality STRING, n_chars BIGINT, "
               "chunk_count BIGINT, n_bytes BIGINT, width BIGINT, "
               "height BIGINT, checksum BIGINT")


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: whole Arrow batches in, decoded features out;
    the typed metadata columns pass through the stage untouched (the
    catalog row rides next to the decode — no re-join afterwards)."""
    for pdf in batches:
        if pdf.empty:
            # zero-row Arrow batches must not emit a column-less frame
            # (pd.DataFrame([]) has no columns -> schema mismatch)
            continue
        decoded = pd.DataFrame([decode_image_stub(bytes(p))
                                for p in pdf["payload"]])
        passthrough = pdf[["doc_id", "modality", "n_chars",
                           "chunk_count"]].reset_index(drop=True)
        yield pd.concat([passthrough, decoded], axis=1)


@query("multimodal_decode_features", oracle="""
    SELECT doc_id,
           'text/plain'                                           AS modality,
           CAST(length(text) AS BIGINT)                           AS n_chars,
           CAST(ceil(length(text) / 1024.0) AS BIGINT)            AS chunk_count,
           CAST(octet_length(payload) AS BIGINT)                  AS n_bytes,
           CAST(64 + octet_length(payload) % 512 AS BIGINT)       AS width,
           CAST(64 + (octet_length(payload) * 7) % 512 AS BIGINT) AS height,
           CAST(byte_sum % 65536 AS BIGINT)                       AS checksum
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
    meta = t["documents"].select(
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
    return flat.mapInPandas(_decode_batches, _OUT_SCHEMA)
