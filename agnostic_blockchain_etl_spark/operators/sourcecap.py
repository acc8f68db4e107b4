"""Per-source frequency caps (the C4 / FineWeb URL-and-domain practice:
Raffel et al. 2020, Penedo et al. 2024): a handful of hot domains —
patent mirrors, e-commerce catalogs, auto-generated forums — can
contribute millions of near-identical documents each, so a corpus
balanced at the document level is still dominated at the source level.
Cap each source's contribution at ``cap`` documents, picked as a
deterministic uniform sample (the ``cap`` smallest portable hashes of
``doc_id``), so the kept subset is stable across runs, layouts, and
engines.

Two variants with the same flag-don't-filter output contract
(input columns + ``cap_keep`` int):

- :func:`source_cap` — EXACT: keeps precisely ``min(cap, n_source)``
  documents per source. The selection is "k smallest (hash, doc_id)
  per key", computed with a two-level rank so a hot source never
  funnels into one sorting partition: ``salt_buckets > 1`` first ranks
  within (source, hash-salt-bucket) — bounded partitions — keeps each
  bucket's top ``cap``, then ranks the ≤ cap·salt_buckets survivors per
  source (a frame already capped in size). The kept SET is identical
  for every ``salt_buckets`` value (the k smallest hashes are the k
  smallest however you pre-partition them), which the tests pin — the
  knob trades a second tiny shuffle for skew immunity, never results.
- :func:`source_cap_rate` — EXPECTATION: zero windows, zero sorts.
  One count aggregation per source (map-side combinable), one equi-join
  back, keep iff ``hash/2^60 < cap/n_source``. Keeps ~cap per source
  (binomial, not exact) — the shape for a pass where ±5% on the cap is
  fine and the corpus is 100 TB.

Both hash ``doc_id`` salted with ``'sourcecap:'``, independent of the
dedup/sampling salts, so capping composes with the other hash-keyed
operators without correlation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _spark_hash60

_TWO60 = float(1 << 60)
_SALT = "sourcecap:"


def _cap_hash(doc_id_col):
    return _spark_hash60(F.concat(F.lit(_SALT),
                                  doc_id_col.cast("string")))


def source_doc_counts(docs: DataFrame,
                      source_col: str = "source") -> DataFrame:
    """(source, n_docs) — one map-side-combinable aggregation."""
    return (docs.groupBy(F.col(source_col).alias("source"))
            .agg(F.count("*").alias("n_docs")))


def source_cap(docs: DataFrame, cap: int, source_col: str = "source",
               salt_buckets: int = 64) -> DataFrame:
    """Exact per-source cap: ``cap_keep = 1`` for precisely the ``cap``
    documents with the smallest salted hashes in each source (all of
    them when the source is under the cap). Ties cannot occur — the
    rank key is (hash, doc_id) and doc_id is unique.

    ``salt_buckets`` defaults to 64 — skew-safe out of the box: level
    one ranks inside (source, hash-salt bucket) so no window partition
    sorts more than ~n_source/64 rows even when ONE source is the whole
    corpus (the realistic hot-domain failure), level two ranks a frame
    pre-capped to cap·64 rows per source. ``salt_buckets=1`` collapses
    to a single window over (source) — marginally cheaper when every
    source is known small. The kept SET is identical for every value
    (the k smallest hashes are the k smallest however you pre-partition
    them; pinned by tests)."""
    if cap < 0:
        raise ValueError(f"cap must be >= 0, got {cap}")
    keyed = docs.withColumn("_h", _cap_hash(F.col("doc_id")))
    if salt_buckets > 1:
        w1 = (Window.partitionBy(source_col, "_b")
              .orderBy("_h", "doc_id"))
        cand = (keyed
                .withColumn("_b", F.pmod(F.col("_h"),
                                         F.lit(salt_buckets)))
                .withColumn("_r1", F.row_number().over(w1))
                .where(F.col("_r1") <= cap))
        w2 = Window.partitionBy(source_col).orderBy("_h", "doc_id")
        kept = (cand.withColumn("_r2", F.row_number().over(w2))
                .where(F.col("_r2") <= cap)
                .select("doc_id", F.lit(1).alias("cap_keep")))
        return (keyed.join(kept, "doc_id", "left")
                .withColumn("cap_keep",
                            F.coalesce("cap_keep", F.lit(0)))
                .drop("_h"))
    w = Window.partitionBy(source_col).orderBy("_h", "doc_id")
    return (keyed.withColumn("_r", F.row_number().over(w))
            .withColumn("cap_keep",
                        (F.col("_r") <= cap).cast("int"))
            .drop("_h", "_r"))


def source_cap_rate(docs: DataFrame, cap: int,
                    source_col: str = "source") -> DataFrame:
    """Expectation-form cap: keep each document independently with
    probability ``min(1, cap/n_source)`` via the salted hash — ~cap
    survivors per source, zero windows/sorts (the 100 TB fast path).
    Sources at or under the cap keep everything (probability 1 is
    exact there)."""
    if cap < 0:
        raise ValueError(f"cap must be >= 0, got {cap}")
    counts = source_doc_counts(docs, source_col) \
        .withColumnRenamed("source", source_col)
    u = _cap_hash(F.col("doc_id")).cast("double") / F.lit(_TWO60)
    return (docs.join(counts, source_col)
            .withColumn("cap_keep",
                        (u * F.col("n_docs") < F.lit(float(cap)))
                        .cast("int"))
            .drop("n_docs"))
