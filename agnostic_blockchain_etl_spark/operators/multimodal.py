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


_OUT_SCHEMA = ("doc_id BIGINT, n_bytes BIGINT, width BIGINT, height BIGINT, "
               "checksum BIGINT")


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: whole Arrow batches in, decoded metadata out."""
    for pdf in batches:
        decoded = [decode_image_stub(bytes(p)) for p in pdf["payload"]]
        out = pd.DataFrame(decoded)
        out.insert(0, "doc_id", pdf["doc_id"].values)
        yield out


@query("multimodal_decode_features", oracle="""
    SELECT doc_id,
           CAST(octet_length(payload) AS BIGINT)                  AS n_bytes,
           CAST(64 + octet_length(payload) % 512 AS BIGINT)       AS width,
           CAST(64 + (octet_length(payload) * 7) % 512 AS BIGINT) AS height,
           CAST(byte_sum % 65536 AS BIGINT)                       AS checksum
    FROM (
        SELECT doc_id, encode(text) AS payload,
               list_sum(list_transform(generate_series(1, length(text)),
                        i -> ascii(text[i]))) AS byte_sum
        FROM documents)
""")
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column decode pipeline: build an opaque payload column (here
    from text bytes — stand-in for image bytes), run the Arrow-batched
    decode stage, emit typed metadata. The oracle mirrors the stub's
    arithmetic, proving batch shape and row alignment survive the
    mapInPandas boundary."""
    t = load_tables(spark, sf_dir, ("documents",))
    payloads = t["documents"].select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))
    return payloads.mapInPandas(_decode_batches, _OUT_SCHEMA)


@query("multimodal_metadata_struct", oracle="""
    SELECT doc_id, modality, n_bytes, CAST(chunk_count AS BIGINT) AS chunk_count
    FROM (
        SELECT doc_id,
               'text/plain'                                   AS modality,
               CAST(length(text) AS BIGINT)                   AS n_bytes,
               CAST(ceil(length(text) / 1024.0) AS BIGINT)    AS chunk_count
        FROM documents)
""")
def multimodal_metadata_struct(spark, sf_dir):
    """Typed metadata struct alongside the payload (modality tag, size,
    chunking) — the catalog row for a multimodal asset; built and read
    back entirely JVM-side."""
    t = load_tables(spark, sf_dir, ("documents",))
    meta = t["documents"].select(
        "doc_id",
        F.struct(
            F.lit("text/plain").alias("modality"),
            F.length("text").cast("long").alias("n_bytes"),
            F.ceil(F.length("text") / 1024.0).cast("long").alias("chunk_count"),
        ).alias("meta"))
    return meta.select(
        "doc_id", F.col("meta.modality").alias("modality"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.chunk_count").alias("chunk_count"))
