"""Incremental near-dup dedup against a persisted signature store — the
day-2 operation of a 100 TB corpus: yesterday's corpus is already
deduplicated and its MinHash signatures sit in a store table; today's
batch must be checked against HISTORY and against ITSELF without ever
re-reading (let alone re-shingling) the historical text.

The store holds one row per retained document: the K-component MinHash
signature (`dedup.minhash_wide`'s m0..m15). Everything the incremental
pass needs derives from it:

- **candidates** come from LSH band-digest equality (`minhash_bands`),
  new-vs-store and new-vs-new — the same banding as the full-corpus
  pass, so a pair the batch pipeline would have caught is caught here;
- **verification** uses the unbiased MinHash estimate of Jaccard (the
  fraction of matching signature components) instead of exact shingle
  intersection — historical shingle sets are exactly what a store must
  NOT keep (they are the size of the corpus; K longs per doc is not).
  Estimator granularity is 1/K; pick the threshold on that grid.

Scale shape: the store is read once per batch as a (band, bucket)-keyed
join — at production scale the store is WRITTEN bucketed by band digest
(`sources/bucketed.py`) so this join co-locates without a store-side
shuffle and the new batch (the small side) is the only thing moving.
Store updates append only the KEPT documents' signatures, so the store
stays exactly one row per retained doc and replaying a batch is
idempotent at the store level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import (_K, PERMS_FINGERPRINT, cap_group_size,
                    connected_components, doc_shingles, minhash_bands,
                    minhash_wide)

_EST_THRESHOLD = 0.5   # on the 1/K grid; K=16 -> 8+ matching components


def signature_store(docs: DataFrame) -> DataFrame:
    """Build the persistable signature artifact for ``docs``
    (``doc_id``/``text``): one row per doc, ``doc_id, m0..m{K-1}``.
    Persist as parquet (bucketed by band digest at scale) and feed back
    into :func:`incremental_dedup` for every subsequent batch."""
    return minhash_wide(doc_shingles(docs).select("doc_id", "h"))


def _est_jaccard(a: DataFrame, b: DataFrame, pairs: DataFrame) -> DataFrame:
    """Annotate candidate ``(doc_a, doc_b)`` pairs with the MinHash
    Jaccard estimate: mean over K components of [m_i(a) == m_i(b)]."""
    eq = [(F.col(f"xa.m{i}") == F.col(f"xb.m{i}")).cast("int")
          for i in range(_K)]
    est = sum(eq) / float(_K)
    return (pairs
            .join(a.alias("xa"), F.col("xa.doc_id") == F.col("doc_a"))
            .join(b.alias("xb"), F.col("xb.doc_id") == F.col("doc_b"))
            .select("doc_a", "doc_b",
                    F.round(est, 4).alias("est_jaccard")))


def incremental_neardup_pairs(new_docs: DataFrame, store: DataFrame,
                              threshold: float = _EST_THRESHOLD,
                              max_bucket_size: int | None = None,
                              new_sigs: DataFrame | None = None
                              ) -> DataFrame:
    """Near-dup pairs of a new batch: ``(doc_a, doc_b, est_jaccard,
    against)`` where ``against`` is ``'history'`` (doc_a in the store,
    doc_b in the batch) or ``'batch'`` (both new, doc_a < doc_b).
    ``new_docs`` doc_ids must be disjoint from the store's.

    ``max_bucket_size`` (default off) caps each side's (band, bucket)
    group size before the candidate joins (`dedup.cap_group_size`) —
    the day-2 store accumulates every boilerplate-heavy batch's
    signatures, so a degenerate store bucket is the realistic skew
    hazard here; with the cap, per-batch candidate work is bounded by
    batch_size · cap per band regardless of store history.

    ``new_sigs``: pass the batch's `signature_store` frame (ideally
    persisted) when the caller also consumes it — the signature
    pipeline is the batch's heaviest DAG and is referenced here by BOTH
    candidate joins and both estimate joins."""
    if new_sigs is None:
        new_sigs = signature_store(new_docs)
    new_bands = minhash_bands(new_sigs)
    store_bands = minhash_bands(store)
    if max_bucket_size is not None:
        new_bands = cap_group_size(new_bands, ["band", "bucket"],
                                   max_bucket_size,
                                   "incremental_neardup_pairs[batch]")
        store_bands = cap_group_size(store_bands, ["band", "bucket"],
                                     max_bucket_size,
                                     "incremental_neardup_pairs[store]")

    hist_cand = (store_bands.alias("x").join(
        new_bands.alias("y"),
        (F.col("x.band") == F.col("y.band")) &
        (F.col("x.bucket") == F.col("y.bucket")))
        .select(F.col("x.doc_id").alias("doc_a"),
                F.col("y.doc_id").alias("doc_b"))
        .distinct())
    batch_cand = (new_bands.alias("x").join(
        new_bands.alias("y"),
        (F.col("x.band") == F.col("y.band")) &
        (F.col("x.bucket") == F.col("y.bucket")) &
        (F.col("x.doc_id") < F.col("y.doc_id")))
        .select(F.col("x.doc_id").alias("doc_a"),
                F.col("y.doc_id").alias("doc_b"))
        .distinct())

    hist = _est_jaccard(store, new_sigs, hist_cand) \
        .withColumn("against", F.lit("history"))
    batch = _est_jaccard(new_sigs, new_sigs, batch_cand) \
        .withColumn("against", F.lit("batch"))
    return (hist.unionByName(batch)
            .where(F.col("est_jaccard") >= threshold))


def write_signature_store_tables(store: DataFrame, name: str,
                                 buckets: int = 64,
                                 mode: str = "overwrite") -> None:
    """Persist the store as the 100 TB layout the module docstring
    promises: ``{name}_sigs`` bucketed by ``doc_id`` (signature lookups
    for estimate verification) and ``{name}_bands`` bucketed by
    ``bucket`` (the LSH band digest — the candidate-join key). The
    write pays the bucketing shuffle ONCE; every subsequent batch joins
    against both tables with no store-side Exchange (plan-asserted in
    test_incremental.py). Append kept batches with ``mode='append'`` —
    Spark appends into the existing bucket spec.

    The store is VERSIONED by the MinHash permutation family: a
    ``{name}_meta`` side table records `dedup.PERMS_FINGERPRINT`, and
    :func:`stored_neardup_pairs` refuses a store whose fingerprint does
    not match the running constants — signatures computed under a
    different family compare as noise, so a silent mismatch would turn
    verification into coin flips."""
    from ..sources.bucketed import write_bucketed
    spark = store.sparkSession
    if mode == "append" and spark.catalog.tableExists(f"{name}_sigs"):
        # an append into an EXISTING store must not stamp the CURRENT
        # fingerprint over rows written under different constants —
        # that would make a mixed-family store validate cleanly
        # forever. A fresh name (no sigs table yet) is a bootstrap, not
        # a version statement: append-only pipelines start here.
        _check_store_fingerprint(spark, name)
    write_bucketed(store, f"{name}_sigs", "doc_id", buckets, mode=mode)
    write_bucketed(minhash_bands(store), f"{name}_bands", "bucket",
                   buckets, mode=mode)
    spark.createDataFrame([(PERMS_FINGERPRINT,)], "perms_fingerprint string") \
        .write.mode("overwrite").format("parquet").saveAsTable(f"{name}_meta")


def _check_store_fingerprint(spark, name: str) -> None:
    """Refuse a store whose recorded permutation family differs from
    the running constants. A MISSING meta table is also a refusal:
    signatures from an unknown family compare as noise, and every store
    written before fingerprinting carries the pre-round-6 structured
    family this build no longer uses — silently accepting it is the
    exact coin-flip failure the guard exists to prevent. Only the
    table-not-found condition maps to "unversioned store"; any other
    read failure propagates (a transient catalog/IO error must not be
    reinterpreted as a version statement)."""
    from pyspark.errors import AnalysisException

    from ..errors import is_not_found
    try:
        meta = spark.table(f"{name}_meta").collect()
        got = meta[0].perms_fingerprint if meta else None
    except AnalysisException as exc:
        if not is_not_found(exc, "TABLE_OR_VIEW_NOT_FOUND",
                            "cannot be found"):
            raise
        got = None
    if got != PERMS_FINGERPRINT:
        raise ValueError(
            f"signature store '{name}' was written under MinHash "
            f"permutation family {got!r} (None = unversioned, "
            f"pre-fingerprint store), but this build uses "
            f"{PERMS_FINGERPRINT!r}; rebuild the store "
            f"(write_signature_store_tables) before incremental use. "
            "Note: the fingerprint constant changed in round 7 (order-"
            "sensitive md5-of-sequence replaced a commutative sum), so "
            "stores written by earlier builds fail this check even "
            "though the (a, b) permutation family itself is unchanged "
            "— the rebuild is a version-stamp refresh, not a "
            "signature-compatibility break")


def stored_neardup_pairs(new_docs: DataFrame, name: str,
                         threshold: float = _EST_THRESHOLD) -> DataFrame:
    """`incremental_neardup_pairs`, history side read from the bucketed
    store tables: the new batch (the small side) shuffles to the
    store's bucket layout; the store itself is scanned in place. Raises
    if the store's recorded permutation-family fingerprint (see
    :func:`write_signature_store_tables`) mismatches the running one."""
    spark = new_docs.sparkSession
    _check_store_fingerprint(spark, name)
    new_sigs = signature_store(new_docs)
    new_bands = minhash_bands(new_sigs)
    store_bands = spark.table(f"{name}_bands")
    store_sigs = spark.table(f"{name}_sigs")

    hist_cand = (store_bands.alias("x").join(
        new_bands.alias("y"),
        (F.col("x.band") == F.col("y.band")) &
        (F.col("x.bucket") == F.col("y.bucket")))
        .select(F.col("x.doc_id").alias("doc_a"),
                F.col("y.doc_id").alias("doc_b"))
        .distinct())
    return (_est_jaccard(store_sigs, new_sigs, hist_cand)
            .withColumn("against", F.lit("history"))
            .where(F.col("est_jaccard") >= threshold))


def incremental_dedup(new_docs: DataFrame, store: DataFrame,
                      threshold: float = _EST_THRESHOLD,
                      new_sigs: DataFrame | None = None
                      ) -> tuple[DataFrame, DataFrame]:
    """Run the incremental pass: returns ``(annotated, updated_store)``.

    ``annotated`` is one row per NEW doc: ``doc_id, dup_of_history,
    batch_group, keep`` — a doc is kept iff it matches nothing in the
    store and is the canonical (minimum-id) member of its within-batch
    duplicate group. ``updated_store`` is the store plus the kept new
    docs' signatures (dropped dups never enter, so replay is
    idempotent).

    The batch signature frame is referenced by the candidate joins,
    both estimate joins, and the kept-signatures union — scope-cached
    here so the shingle+MinHash pipeline materializes once per call
    (the multi-consumer recompute class; see `semantic_dedup`). Callers
    that already built (and persisted) the batch's `signature_store`
    pass it as ``new_sigs`` — the streaming form does, sharing it with
    its store-delta write."""
    if new_sigs is None:
        from .dedup import _scoped_cache
        new_sigs = _scoped_cache(signature_store(new_docs))
    pairs = incremental_neardup_pairs(new_docs, store, threshold,
                                      new_sigs=new_sigs)

    hist_hit = (pairs.where(F.col("against") == "history")
                .groupBy(F.col("doc_b").alias("doc_id"))
                .agg(F.min("doc_a").alias("dup_of_history")))
    batch_groups = connected_components(
        pairs.where(F.col("against") == "batch")
        .select("doc_a", "doc_b"))

    annotated = (new_docs.select("doc_id")
                 .join(hist_hit, "doc_id", "left")
                 .join(batch_groups.withColumnRenamed("label",
                                                      "batch_group"),
                       "doc_id", "left")
                 .select("doc_id", "dup_of_history",
                         F.coalesce("batch_group", "doc_id")
                         .alias("batch_group"))
                 .withColumn("keep",
                             (F.col("dup_of_history").isNull() &
                              (F.col("batch_group") == F.col("doc_id")))
                             .cast("int")))
    kept_sigs = new_sigs.join(
        annotated.where(F.col("keep") == 1).select("doc_id"), "doc_id")
    return annotated, store.unionByName(kept_sigs)


def digest_store(docs: DataFrame) -> DataFrame:
    """Exact-dedup store: one 16-byte md5 digest per retained document
    (`doc_id, content_key`) — the exact counterpart of the MinHash
    signature store, and the batch twin of `streaming/dedup.py`'s
    state-store keys, INCLUDING its null rule (`_null_safe_key`):
    ``md5(NULL)`` is NULL, and a NULL key is poison downstream —
    groupBy pools every null-text (metadata-only) doc into one group
    so all but one get swallowed, while equi-joins never match NULL so
    the same rows silently FALL OUT of inner joins (found as row loss
    in `incremental_exact_dedup` and 'added' misclassification in
    `corpus_diff`). Null text therefore keys per-doc (``null:<id>``):
    metadata-only rows are never duplicates of each other."""
    return docs.select(
        "doc_id",
        F.coalesce(F.md5(F.col("text").cast("binary")),
                   F.concat(F.lit("null:"), F.col("doc_id").cast("string")))
         .alias("content_key"))


def incremental_exact_dedup(new_docs: DataFrame, store: DataFrame
                            ) -> tuple[DataFrame, DataFrame]:
    """Exact first-seen dedup of a batch against a digest store:
    returns ``(annotated, updated_store)`` with one row per new doc —
    ``doc_id, content_key, dup_of_history (nullable), keep`` — keeping
    a doc iff its digest is absent from history AND it is the lowest
    doc_id carrying that digest within the batch. The store grows by
    the kept docs only, so replay is idempotent.

    Scale: the probe is one join keyed on the 16-byte digest (broadcast
    when history is small, shuffle-on-digest otherwise — at 100 TB the
    store is written bucketed by content_key so the probe co-locates
    like `write_signature_store_tables`); the within-batch canonical is
    one min-aggregation."""
    new_d = digest_store(new_docs)
    hist = (new_d.join(store.select(F.col("content_key"),
                                    F.col("doc_id").alias("dup_of_history")),
                       "content_key", "left")
            .groupBy("doc_id", "content_key")
            .agg(F.min("dup_of_history").alias("dup_of_history")))
    batch_min = new_d.groupBy("content_key") \
        .agg(F.min("doc_id").alias("batch_canonical"))
    annotated = (hist.join(batch_min, "content_key")
                 .withColumn("keep",
                             (F.col("dup_of_history").isNull() &
                              (F.col("doc_id") == F.col("batch_canonical")))
                             .cast("int"))
                 .select("doc_id", "content_key", "dup_of_history", "keep"))
    kept = new_d.join(annotated.where(F.col("keep") == 1)
                      .select("doc_id"), "doc_id")
    return annotated, store.unionByName(kept)


def corpus_diff(old_docs: DataFrame, new_docs: DataFrame) -> tuple[DataFrame,
                                                                   DataFrame]:
    """Snapshot diff for dataset versioning: returns ``(annotated,
    report)`` where ``annotated`` has one row per doc_id present in
    either snapshot — ``doc_id, status`` with status ∈ {'added',
    'removed', 'changed', 'unchanged'} (changed = same id, different
    content digest) — and ``report`` is the one-row count summary a
    dataset changelog publishes.

    Scale: both sides reduce to (doc_id, 16-byte digest) projections;
    the diff is ONE full outer equi-join on doc_id (co-locates for free
    when both snapshots are written bucketed by doc_id) and the report
    is one aggregation. No text crosses the shuffle."""
    old_d = digest_store(old_docs).withColumnRenamed("content_key", "ok")
    new_d = digest_store(new_docs).withColumnRenamed("content_key", "nk")
    annotated = (old_d.join(new_d, "doc_id", "full_outer")
                 .select("doc_id",
                         F.when(F.col("ok").isNull(), "added")
                          .when(F.col("nk").isNull(), "removed")
                          .when(F.col("ok") != F.col("nk"), "changed")
                          .otherwise("unchanged").alias("status")))
    report = annotated.agg(
        F.count("*").alias("n_ids"),
        *[F.sum((F.col("status") == s).cast("long")).alias(f"n_{s}")
          for s in ("added", "removed", "changed", "unchanged")])
    return annotated, report
