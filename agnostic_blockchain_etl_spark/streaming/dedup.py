"""Streaming exact deduplication: first-seen-wins over an unbounded
document stream.

The batch dedup suite (``operators/dedup.py``) answers "which documents
in this corpus are duplicates"; this operator answers the ingest-time
form — "have I seen this content before, across all micro-batches so
far" — the shape a continuously-fed training-data pipeline needs so a
re-crawled page never reaches the corpus twice.

Spark-first: this is built on the engine's native stateful dedup
(``dropDuplicates`` / ``dropDuplicatesWithinWatermark``), not a custom
state UDF — the state store (RocksDB-backed at cluster scale) keys on
the 16-byte content digest, partitioned by key, and the watermark
variant bounds state growth for infinite streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KEY_COL = "content_key"


class PruneRefusedError(ValueError):
    """`prune_store_deltas`' checkpoint-guard SAFETY refusal (the
    checkpoint's commit log is behind the snapshot it would prune
    under). A distinct type so callers — the CLI's one-JSON-line error
    contract — can catch exactly the refusal without also swallowing
    unrelated ``ValueError``s from a corrupted store layout (e.g.
    ``int()`` on a malformed ``upto=<junk>`` snapshot dir), which
    should traceback, not print as a clean refusal. Subclasses
    ``ValueError`` so pre-existing ``except ValueError`` callers keep
    working."""


def dedup_stream(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """First-seen exact dedup on a streaming DataFrame: each distinct
    ``text`` digest is emitted exactly once across the whole stream
    lifetime (state never expires — use :func:`dedup_stream_bounded`
    when the stream is infinite and re-crawls arrive within a known
    horizon).

    The dedup key is the md5 digest, not the text: state-store entries
    are 16 bytes + key overhead each, so a billion-document history is
    tens of GB of state across the cluster, not the corpus itself.

    NULL text gets a per-doc key (``null:<doc_id>``): md5(NULL) is NULL
    and ``dropDuplicates`` treats NULL keys as equal, which would
    silently swallow every null-text document after the first —
    metadata-only rows are not duplicates of each other
    (flag-don't-drop; filter on ``text IS NULL`` downstream if they
    must not pass)."""
    return (docs
            .withColumn(KEY_COL, _null_safe_key(text_col))
            .dropDuplicates([KEY_COL]))


def _null_safe_key(text_col: str):
    return F.coalesce(
        F.md5(F.col(text_col).cast("binary")),
        F.concat(F.lit("null:"), F.col("doc_id").cast("string")))


def _read_store_or(spark, store_path: str, batch_id: int,
                   empty) -> DataFrame:
    """Read a per-batch-partitioned store parquet, excluding partitions
    with ``batch_id >= N`` (the snapshot rule that makes replays see
    exactly the state their first attempt saw), or return ``empty`` (a
    zero-row frame, or a schema string to build one) iff the path does
    not exist yet — the first batch. ONLY the missing-path condition is
    treated as first-batch: a transient IO error or a corrupt partition
    must fail the micro-batch so the checkpoint replays it — swallowing
    it would silently discard the dedup history. This classification is
    safety-critical and shared by EVERY foreachBatch store operator in
    this module; do not re-inline it.

    One more condition is accepted for batch 0 ONLY: a store root that
    exists but holds zero committed parquet files (UNABLE_TO_INFER_
    SCHEMA). A crash mid-write of the very first delta leaves exactly
    that state — the committer made ``{store}/batch_id=0/_temporary``
    but committed nothing — and without this case every replay of
    batch 0 fails schema inference forever (a recovery deadlock).
    Batch 0's store state is empty BY DEFINITION, so the mapping is
    safe; for batch_id > 0 the same error still raises, because
    foreachBatch is sequential — batch N runs only after batch N-1's
    delta committed, so an uninferable root at N > 0 means the store
    was wiped out-of-band and silently treating it as empty would
    discard the dedup history."""
    from pyspark.errors import AnalysisException

    from ..errors import is_not_found
    try:
        return (spark.read.parquet(store_path)
                .where(F.col("batch_id") < batch_id)
                .drop("batch_id"))
    except AnalysisException as exc:
        empty_first = batch_id == 0 and is_not_found(
            exc, "UNABLE_TO_INFER_SCHEMA", "Unable to infer schema")
        if not (empty_first
                or is_not_found(exc, "PATH_NOT_FOUND",
                                "Path does not exist")):
            raise
        return spark.createDataFrame([], empty) \
            if isinstance(empty, str) else empty


def incremental_neardup_stream(docs: DataFrame, store_path: str,
                               out_path: str, checkpoint: str,
                               threshold: float | None = None,
                               compact_every: int | None = None,
                               prune_after_compact: bool = False):
    """NEAR-dup dedup over an unbounded stream: each micro-batch runs
    the batch-form :func:`operators.incremental.incremental_dedup`
    against the signature store parquet at ``store_path`` via
    ``foreachBatch``, writes the annotated batch under
    ``{out_path}/batch_id=N`` and appends the kept docs' signatures
    under ``{store_path}/batch_id=N``. Returns the started query.

    Exactly-once across failures WITHOUT a transactional sink: both
    writes go to a deterministic per-batch directory in overwrite mode
    (a replayed batch overwrites its own previous attempt), and the
    store read EXCLUDES partitions with ``batch_id >= N`` — so a replay
    of batch N sees exactly the state every first attempt saw and can
    never collide with its own half-written signatures. Batch ids are
    monotonic per checkpoint, which is what makes the exclusion a
    consistent snapshot rule.

    Near-dup state cannot ride the engine's keyed state store the way
    exact dedup does (`dedup_stream`): LSH candidate lookup is a JOIN
    against all historical band digests, not a point lookup on one key
    — so the state lives in the store table and each batch pays one
    bounded join against it (see `operators/incremental.py` for the
    100 TB layout).

    ``compact_every=N``: every N batches the post-batch store content
    is rewritten as ONE snapshot directory under
    ``{store_path}_compact/upto=<batch_id>``. Signatures are not
    collapsible (every kept row stays), so unlike the semantic /
    paragraph / source-cap snapshots this is an identity rewrite — the
    win is FILE-COUNT boundedness: without it batch K lists and scans
    K delta directories (10k micro-batches → 10k partitions per read);
    with it the read is one snapshot + ≤ N tails. Same snapshot/replay
    rule; reclaim with `prune_store_deltas` — or opt into
    ``prune_after_compact=True`` to reclaim IN-stream right after each
    snapshot commits (see `_prune_in_stream` for why that is safe by
    construction), keeping the raw-delta directory count bounded by
    ~2×``compact_every`` for the stream's whole lifetime."""
    from ..operators.incremental import _EST_THRESHOLD, incremental_dedup
    tau = _EST_THRESHOLD if threshold is None else threshold

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        from ..operators.incremental import signature_store
        # ONE shingle+MinHash build per batch, shared by the candidate
        # joins inside incremental_dedup AND the store-delta write —
        # un-shared, the signature pipeline ran ~3x per batch (the
        # recompute class semantic_dedup_stream fixed in round 6);
        # persist ann too: it feeds the output write and the kept join.
        sigs = signature_store(batch_df).persist()
        ann = None
        try:
            store = _read_store_snapshots_or(spark, store_path,
                                             batch_id, sigs.limit(0))
            ann, _ = incremental_dedup(batch_df, store, tau,
                                       new_sigs=sigs)
            ann = ann.persist()
            ann.write.mode("overwrite").parquet(
                f"{out_path}/batch_id={batch_id}")
            kept = ann.where(F.col("keep") == 1).select("doc_id")
            delta = sigs.join(kept, "doc_id")
            delta.write.mode("overwrite") \
                 .parquet(f"{store_path}/batch_id={batch_id}")
            if compact_every and (batch_id + 1) % compact_every == 0:
                (store.unionByName(delta)
                 .write.mode("overwrite")
                 .parquet(f"{store_path}_compact/upto={batch_id}"))
                if prune_after_compact:
                    _prune_in_stream(spark, store_path, batch_id)
        finally:
            sigs.unpersist()
            if ann is not None:
                ann.unpersist()

    return (docs.writeStream.foreachBatch(_process)
            .option("checkpointLocation", checkpoint).start())


def dedup_stream_bounded(docs: DataFrame, ts_col: str,
                         horizon: str = "1 hour",
                         text_col: str = "text") -> DataFrame:
    """Watermark-bounded variant: duplicates are suppressed only within
    the event-time ``horizon``; state older than the watermark is
    evicted, so state size is bounded by the duplicate-arrival window
    instead of stream lifetime — the infinite-ingest configuration.
    NULL text passes through per-doc (same key rule as
    :func:`dedup_stream`)."""
    return (docs
            .withColumn(KEY_COL, _null_safe_key(text_col))
            .withWatermark(ts_col, horizon)
            .dropDuplicatesWithinWatermark([KEY_COL]))


def paragraph_dedup_stream(docs: DataFrame, store_path: str,
                           out_path: str, checkpoint: str,
                           min_df: int = 2, min_chars: int = 1,
                           compact_every: int | None = None,
                           prune_after_compact: bool = False):
    """Boilerplate-paragraph excision over an unbounded stream: each
    micro-batch runs :func:`operators.paragraphs.
    incremental_dedup_paragraphs` against the paragraph-frequency store
    at ``store_path``, writes the de-boilerplated batch under
    ``{out_path}/batch_id=N`` and appends the BATCH's own frequency rows
    under ``{store_path}/batch_id=N``. Returns the started query.

    Same exactly-once construction as `incremental_neardup_stream`:
    deterministic per-batch overwrite directories + a store read that
    excludes ``batch_id >= N``, so a replayed batch sees exactly the
    state its first attempt saw. The store partitions are MERGEABLE
    frequency sketches — the read aggregates them (df sums, first_doc
    mins, `merge_paragraph_stores` semantics) instead of requiring a
    rewritten store per batch, which is what lets the write side stay
    append-only.

    ``compact_every=N``: every N batches the post-batch totals (one
    sealed row per paragraph — `compact_paragraph_store` of the read
    state plus this batch's rows) are written as a snapshot under
    ``{store_path}_compact/upto=<batch_id>``, and later reads take
    newest-snapshot + raw deltas after it (`_read_store_snapshots_or`,
    the rule `semantic_dedup_stream` introduced). Without it, batch K
    reads K delta partitions — after 10k micro-batches every read
    lists and scans 10k directories even though the aggregated store
    is small; with it the read is one snapshot + ≤ N tails. Sealing
    is safe here for the same reason the semantic snapshot is: the
    snapshot covers only committed batches plus this batch's
    DETERMINISTIC rows, and a replay of the compacting batch never
    sees its own snapshot. Reclaim pruned space with
    `prune_store_deltas` while the stream is stopped, or opt into
    ``prune_after_compact=True`` for in-stream reclaim right after
    each snapshot commits (`_prune_in_stream`)."""
    from ..operators.paragraphs import (incremental_dedup_paragraphs,
                                        paragraph_store)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        from ..operators.paragraphs import compact_paragraph_store
        spark = batch_df.sparkSession
        rows = _read_store_snapshots_or(spark, store_path, batch_id,
                                        paragraph_store(batch_df.limit(0)))
        # the read-side collapse IS compact_paragraph_store (sealed-sum
        # semantics for these untagged partitions) — reuse it so the
        # streaming read path can never diverge from batch compaction
        store = compact_paragraph_store(rows)
        deduped, _ = incremental_dedup_paragraphs(batch_df, store,
                                                  min_df=min_df,
                                                  min_chars=min_chars)
        deduped.write.mode("overwrite").parquet(
            f"{out_path}/batch_id={batch_id}")
        freq = paragraph_store(batch_df, min_chars=min_chars)
        freq.write.mode("overwrite").parquet(
            f"{store_path}/batch_id={batch_id}")
        if compact_every and (batch_id + 1) % compact_every == 0:
            compact_paragraph_store(rows.unionByName(freq)) \
                .write.mode("overwrite") \
                .parquet(f"{store_path}_compact/upto={batch_id}")
            if prune_after_compact:
                _prune_in_stream(spark, store_path, batch_id)

    return (docs.writeStream.foreachBatch(_process)
            .option("checkpointLocation", checkpoint).start())


def source_cap_stream(docs: DataFrame, store_path: str, out_path: str,
                      checkpoint: str, cap: int,
                      source_col: str = "source",
                      compact_every: int | None = None,
                      prune_after_compact: bool = False):
    """Per-source frequency caps over an unbounded stream: admit the
    first ``cap`` documents of each source across all micro-batches
    (first-come admission — the streaming semantics; the batch form's
    hash-uniform sample needs the whole corpus and lives in
    `operators/sourcecap.py`). Each batch writes its annotated rows
    (``cap_keep`` flagged, never dropped) under ``{out_path}/batch_id=N``
    and appends per-source ADMITTED counts under
    ``{store_path}/batch_id=N`` — the same exactly-once construction as
    the other foreachBatch operators here (deterministic per-batch
    overwrite + store read excluding ``batch_id >= N``), with the store
    a mergeable count sketch (sums on read).

    Within a batch, admission order is deterministic (smallest doc_id
    first) so a replayed batch admits the identical set.

    ``compact_every=N``: every N batches the post-batch per-source
    totals are written as a snapshot under
    ``{store_path}_compact/upto=<batch_id>`` (same schema as the
    deltas — counts are trivially mergeable) so the per-batch read
    stays one snapshot + ≤ N tail partitions instead of one per batch
    since stream birth; same snapshot/replay rule as the other
    compacting operators, reclaim with `prune_store_deltas` or
    in-stream via ``prune_after_compact=True`` (`_prune_in_stream`)."""
    from pyspark.sql import Window

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        hist = _read_store_snapshots_or(spark, store_path, batch_id,
                                        "source string, n_admitted long")
        used = (hist.groupBy("source")
                .agg(F.sum("n_admitted").alias("used")))
        w = Window.partitionBy(source_col).orderBy("doc_id")
        # join/store key rides a RESERVED alias: withColumn("source",
        # col(source_col)) would silently overwrite a pre-existing
        # `source` column when source_col names a different one
        # (corrupting the annotated output's provenance)
        ann = (batch_df
               .withColumn("_capsrc", F.col(source_col))
               .join(used.withColumnRenamed("source", "_capsrc"),
                     "_capsrc", "left")
               .withColumn("_rank", F.row_number().over(w))
               .withColumn("cap_keep",
                           ((F.col("_rank") + F.coalesce("used", F.lit(0)))
                            <= cap).cast("int"))
               .drop("_rank", "used")
               .persist())   # feeds the output write AND the count write
        try:
            ann.drop("_capsrc").write.mode("overwrite").parquet(
                f"{out_path}/batch_id={batch_id}")
            admitted = (ann.groupBy(F.col("_capsrc").alias("source"))
                        .agg(F.sum("cap_keep").alias("n_admitted")))
            admitted.write.mode("overwrite").parquet(
                f"{store_path}/batch_id={batch_id}")
            if compact_every and (batch_id + 1) % compact_every == 0:
                (hist.unionByName(admitted)
                 .groupBy("source")
                 .agg(F.sum("n_admitted").alias("n_admitted"))
                 .write.mode("overwrite")
                 .parquet(f"{store_path}_compact/upto={batch_id}"))
                if prune_after_compact:
                    _prune_in_stream(spark, store_path, batch_id)
        finally:
            ann.unpersist()

    return (docs.writeStream.foreachBatch(_process)
            .option("checkpointLocation", checkpoint).start())


def bloom_dedup_stream(docs: DataFrame, store_path: str, out_path: str,
                       checkpoint: str, *, m_words: int = 256,
                       k: int = 5, text_col: str = "text",
                       compact_every: int | None = None,
                       prune_after_compact: bool = False):
    """Streaming first-seen exact dedup with a BLOOM filter as the
    store — the bounded-state form of `dedup_stream`: where the
    engine-native state store (and this module's digest-delta
    operators) grow one key per retained document forever, this
    store's merged state is ≤ ``m_words`` filter words no matter how
    many batches fold in, at the Bloom trade-off documented in
    `operators/bloom.py` (false positives drop the occasional novel
    doc; duplicates are NEVER admitted — no false negatives).

    Construction is the module's standard exactly-once shape: each
    batch reads history (newest snapshot + deltas below its batch_id,
    `_read_store_snapshots_or`), bit_or-merges it (the filter is a
    mergeable sketch, like the source-cap counts), probes via the
    bounded-collect literal probe, flags ``bloom_hit``/``keep``
    (within-batch canonical = lowest doc_id — deterministic, so a
    replayed batch admits the identical set), writes annotated rows
    under ``{out_path}/batch_id=N`` and the KEPT docs' filter delta
    under ``{store_path}/batch_id=N`` (≤ m_words rows). Compaction is
    near-trivial — the post-batch merged filter IS the snapshot — so
    ``compact_every`` keeps reads at one snapshot + ≤ N tails and
    ``prune_after_compact`` bounds delta dirs, same rules as the other
    four store families (`_prune_in_stream`)."""
    from ..operators.bloom import bloom_build, bloom_filter_array, \
        bloom_probe

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        hist = _read_store_snapshots_or(spark, store_path, batch_id,
                                        "word int, bits long")
        merged = (hist.groupBy("word")
                  .agg(F.bit_or("bits").alias("bits")))
        arr = bloom_filter_array(merged, m_words)
        keyed = batch_df.withColumn(KEY_COL, _null_safe_key(text_col))
        probed = bloom_probe(keyed, arr, m_words=m_words, k=k,
                             key_col=KEY_COL)
        canon = (probed.groupBy(KEY_COL)
                 .agg(F.min("doc_id").alias("__canon")))
        ann = (probed.join(canon, KEY_COL)
               .withColumn("keep",
                           ((F.col("bloom_hit") == 0)
                            & (F.col("doc_id") == F.col("__canon")))
                           .cast("int"))
               .drop("__canon")
               .persist())   # feeds the output write AND the delta
        try:
            ann.write.mode("overwrite").parquet(
                f"{out_path}/batch_id={batch_id}")
            delta = bloom_build(ann.where(F.col("keep") == 1),
                                m_words=m_words, k=k, key_col=KEY_COL)
            delta.write.mode("overwrite").parquet(
                f"{store_path}/batch_id={batch_id}")
            if compact_every and (batch_id + 1) % compact_every == 0:
                (merged.unionByName(
                    spark.read.parquet(
                        f"{store_path}/batch_id={batch_id}"))
                 .groupBy("word")
                 .agg(F.bit_or("bits").alias("bits"))
                 .write.mode("overwrite")
                 .parquet(f"{store_path}_compact/upto={batch_id}"))
                if prune_after_compact:
                    _prune_in_stream(spark, store_path, batch_id)
        finally:
            ann.unpersist()

    return (docs.writeStream.foreachBatch(_process)
            .option("checkpointLocation", checkpoint).start())


_BM25_STORE_SCHEMA = ("term string, df long, n_docs long, n_dl long, "
                      "sum_dl long")


def bm25_stats_stream(docs: DataFrame, store_path: str, out_path: str,
                      checkpoint: str, *, queries: dict[int, str],
                      text_col: str = "text",
                      compact_every: int | None = None,
                      prune_after_compact: bool = False):
    """Streaming BM25 over a growing corpus: each micro-batch extends
    the mergeable statistics store (`operators.retrieval.bm25_stats` —
    per-term df rows + the corpus sentinel row) and scores ITSELF
    against the cumulative statistics INCLUDING its own contribution,
    so every emitted score equals the one-shot BM25 over the corpus as
    of that batch (the exactness `bm25_store_scoring` pins for the
    batch form). Only the new batch is ever tokenized — history is the
    vocabulary-sized store, never re-read text.

    The module's standard exactly-once shape: history = newest
    committed snapshot + deltas strictly below this batch_id
    (`_read_store_snapshots_or`); the batch's own delta is a pure
    function of the batch, so a crash-window replay rewrites
    identical ``{out_path}/batch_id=N`` scores and an identical
    ``{store_path}/batch_id=N`` delta. Compaction folds history + the
    committed delta into one summed snapshot (the store is
    vocabulary-sized, so the snapshot IS the merged table);
    ``prune_after_compact`` bounds raw delta dirs under the family's
    `_prune_in_stream` rules."""
    from ..operators.retrieval import (_tokenize, bm25_scores_from_stats,
                                       bm25_stats)

    # validate the workload EAGERLY (r10 ADVICE): an empty or
    # whitespace-only query dict must fail here at definition time,
    # like the module's other argument checks — not start a stream
    # that dies in batch 0 inside the foreachBatch body
    if not queries:
        raise ValueError("queries must be a non-empty {id: text} dict")
    if not {t for s in queries.values() for t in _tokenize(s)}:
        raise ValueError("queries tokenized to an empty term set")

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        hist = _read_store_snapshots_or(spark, store_path, batch_id,
                                        _BM25_STORE_SCHEMA)
        delta = bm25_stats(batch_df, text_col=text_col).persist()
        try:
            # raw union — the scorer re-aggregates store rows itself
            scored = bm25_scores_from_stats(
                batch_df, queries, hist.unionByName(delta),
                text_col=text_col)
            scored.write.mode("overwrite").parquet(
                f"{out_path}/batch_id={batch_id}")
            delta.write.mode("overwrite").parquet(
                f"{store_path}/batch_id={batch_id}")
            if compact_every and (batch_id + 1) % compact_every == 0:
                (hist.unionByName(
                    spark.read.parquet(
                        f"{store_path}/batch_id={batch_id}"))
                 .groupBy("term")
                 .agg(F.sum("df").alias("df"),
                      F.sum("n_docs").alias("n_docs"),
                      F.sum("n_dl").alias("n_dl"),
                      F.sum("sum_dl").alias("sum_dl"))
                 .write.mode("overwrite")
                 .parquet(f"{store_path}_compact/upto={batch_id}"))
                if prune_after_compact:
                    _prune_in_stream(spark, store_path, batch_id)
        finally:
            delta.unpersist()

    return (docs.writeStream.foreachBatch(_process)
            .option("checkpointLocation", checkpoint).start())


_HIST_STORE_SCHEMA = "term string, n long"


def drift_monitor_stream(docs: DataFrame, ref_hist: DataFrame,
                         store_path: str, out_path: str,
                         checkpoint: str, *, text_col: str = "text",
                         compact_every: int | None = None,
                         prune_after_compact: bool = False):
    """Streaming corpus-drift monitor: each micro-batch extends the
    mergeable unigram-histogram store (`observe.unigram_histogram` —
    per-term counts, summed by `merge_histograms`) and emits ONE
    `jsd_from_histograms` row — the Jensen-Shannon divergence of the
    CUMULATIVE corpus as of this batch against a fixed reference
    histogram — so an ingest pipeline watches its distribution drift
    away from (or toward) the reference day by day without ever
    re-reading history. Only the new batch is tokenized; history is
    the vocabulary-sized store.

    ``ref_hist`` is a ``(term, n)`` frame (a `unigram_histogram` of
    the reference corpus); it is collected ONCE here — a bounded,
    vocabulary-sized literal — so the per-batch plans carry no
    reference-corpus lineage to recompute.

    The module's standard exactly-once shape: history = newest
    committed snapshot + deltas strictly below this batch_id
    (`_read_store_snapshots_or`); the batch's own delta is a pure
    function of the batch, so a crash-window replay rewrites an
    identical ``{out_path}/batch_id=N`` row and an identical delta.
    Compaction folds history + the committed delta into one summed
    snapshot; ``prune_after_compact`` bounds raw delta dirs."""
    from ..operators.observe import jsd_from_histograms, merge_histograms

    ref_rows = ref_hist.select("term",
                               F.col("n").cast("long")).collect()
    if not ref_rows:
        raise ValueError("ref_hist is empty — a drift monitor needs a "
                         "non-empty reference histogram")

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        from ..operators.observe import unigram_histogram
        spark = batch_df.sparkSession
        ref = spark.createDataFrame(ref_rows, _HIST_STORE_SCHEMA)
        hist = _read_store_snapshots_or(spark, store_path, batch_id,
                                        _HIST_STORE_SCHEMA)
        delta = unigram_histogram(batch_df, text_col=text_col).persist()
        try:
            cum = merge_histograms(hist, delta)
            (jsd_from_histograms(cum, ref)
             .write.mode("overwrite")
             .parquet(f"{out_path}/batch_id={batch_id}"))
            delta.write.mode("overwrite").parquet(
                f"{store_path}/batch_id={batch_id}")
            if compact_every and (batch_id + 1) % compact_every == 0:
                (hist.unionByName(
                    spark.read.parquet(
                        f"{store_path}/batch_id={batch_id}"))
                 .groupBy("term").agg(F.sum("n").alias("n"))
                 .write.mode("overwrite")
                 .parquet(f"{store_path}_compact/upto={batch_id}"))
                if prune_after_compact:
                    _prune_in_stream(spark, store_path, batch_id)
        finally:
            delta.unpersist()

    return (docs.writeStream.foreachBatch(_process)
            .option("checkpointLocation", checkpoint).start())


def _read_store_snapshots_or(spark, store_path: str, batch_id: int,
                             empty) -> DataFrame:
    """Store read honoring compaction snapshots — the generic form
    shared by EVERY snapshot-compacting foreachBatch operator here
    (semantic members, paragraph frequencies, source-cap counts,
    near-dup signatures; ``empty`` is a schema string or zero-row
    frame, `_read_store_or`'s convention): the newest
    snapshot at ``{store_path}_compact/upto=K`` with ``K < batch_id``
    replaces every raw delta partition with ``batch_id <= K``; raw
    partitions in ``(K, batch_id)`` union on top. Without a snapshot
    this is exactly `_read_store_or`'s rule. A replay of batch N never
    sees its own (possibly half-written) snapshot — ``upto=N`` is not
    ``< N`` — so the exactly-once construction is unchanged.

    A snapshot root with zero committed files (a crash mid-write of
    the FIRST snapshot left only ``_temporary`` debris) reads as
    no-snapshot: unlike the raw store, falling back is safe at any
    batch_id because the raw partitions are a SUPERSET of every
    snapshot's content — dedup against them is strictly more
    conservative, never lossy."""
    from pyspark.errors import AnalysisException

    from ..errors import is_not_found
    try:
        snaps = spark.read.parquet(store_path + "_compact")
    except AnalysisException as exc:
        if not (is_not_found(exc, "PATH_NOT_FOUND",
                             "Path does not exist")
                or is_not_found(exc, "UNABLE_TO_INFER_SCHEMA",
                                "Unable to infer schema")):
            raise
        return _read_store_or(spark, store_path, batch_id, empty)
    upto = snaps.where(F.col("upto") < batch_id) \
                .agg(F.max("upto")).collect()[0][0]
    if upto is None:
        return _read_store_or(spark, store_path, batch_id, empty)
    try:
        tail = (spark.read.parquet(store_path)
                .where((F.col("batch_id") > upto)
                       & (F.col("batch_id") < batch_id))
                .drop("batch_id"))
    except AnalysisException as exc:
        # with a committed snapshot in hand, a missing or file-less raw
        # root is the normal post-prune state (`prune_store_deltas`
        # removed every delta <= upto and nothing arrived since) — the
        # snapshot IS the full history then
        if not (is_not_found(exc, "PATH_NOT_FOUND",
                             "Path does not exist")
                or is_not_found(exc, "UNABLE_TO_INFER_SCHEMA",
                                "Unable to infer schema")):
            raise
        tail = spark.createDataFrame([], empty) \
            if isinstance(empty, str) else empty.limit(0)
    return snaps.where(F.col("upto") == upto).drop("upto") \
                .unionByName(tail)


def kmv_cardinality_stream(docs, store_path: str, out_path: str,
                           checkpoint: str, *, key_col: str = "text",
                           k: int = 1024, salt: str = "kmv:",
                           compact_every: int | None = None,
                           prune_after_compact: bool = False):
    """Streaming distinct-count tracking with a KMV sketch as the
    store — the CARDINALITY member of the foreachBatch store family
    (exact dedup keys, near-dup signatures, paragraph frequencies,
    source caps, Bloom bits, BM25 stats — and now "how many distinct
    keys so far?" in ≤ k longs). The training-data use: vocabulary /
    unique-document / unique-url growth curves over an ingest stream
    without the ever-growing state an exact streaming distinct needs.

    Each batch reads history (newest snapshot + deltas below its
    batch_id, `_read_store_snapshots_or`), merges it with its own
    batch sketch (union + k-smallest — BIT-EXACT the sketch of
    everything ingested so far, `operators/kmv.py`'s closure
    property), and emits the cumulative ``(n_kept, est)`` AS OF this
    batch — including its own contribution, the `bm25_stats_stream`
    convention — under ``{out_path}/batch_id=N``; the batch's ≤ k
    sketch rows land under ``{store_path}/batch_id=N``. Replays are
    idempotent (hash-deterministic sketch, overwrite-per-batch-dir).
    The post-merge sketch IS the snapshot, so compaction is trivial:
    ``compact_every`` keeps reads at one snapshot + ≤ N tails and
    ``prune_after_compact`` bounds delta dirs (`_prune_in_stream`,
    same rules as the other store families)."""
    from ..operators.kmv import kmv_build, kmv_estimate, kmv_merge

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        hist = _read_store_snapshots_or(spark, store_path, batch_id,
                                        "h long")
        delta = kmv_build(batch_df, key_col, k=k, salt=salt)
        merged = kmv_merge(hist, delta, k=k).persist()  # est + snapshot
        try:
            kmv_estimate(merged, k=k).write.mode("overwrite").parquet(
                f"{out_path}/batch_id={batch_id}")
            delta.write.mode("overwrite").parquet(
                f"{store_path}/batch_id={batch_id}")
            if compact_every and (batch_id + 1) % compact_every == 0:
                # merged already folds this batch's delta in: it IS
                # the upto=batch_id snapshot
                merged.write.mode("overwrite").parquet(
                    f"{store_path}_compact/upto={batch_id}")
                if prune_after_compact:
                    _prune_in_stream(spark, store_path, batch_id)
        finally:
            merged.unpersist()

    return (docs.writeStream.foreachBatch(_process)
            .option("checkpointLocation", checkpoint).start())


def retention_hll_stream(activity, cohort_events, store_path: str,
                         out_path: str, checkpoint: str, *,
                         ts_col: str = "ts",
                         user_col: str = "user_id",
                         week_days: int = 7, p: int = 9,
                         salt: str = "rhll:",
                         compact_every: int | None = None,
                         prune_after_compact: bool = False):
    """Streaming RETENTION tracking with per-cell HLL registers as
    the store — the product-analytics member of the foreachBatch
    store family, and the end-to-end form of
    `operators.funnel.retention_hll_cells`' mergeability argument:
    exact per-cell ``countDistinct`` cannot be maintained
    incrementally, register cells can. Each batch builds its activity
    delta's register cells, merges them into history by per-register
    max (bit-exactly the one-shot build over everything ingested so
    far), and emits every cell's ``(zeros, s_int, est)`` AS OF this
    batch under ``{out_path}/batch_id=N``; the batch's register
    delta lands under ``{store_path}/batch_id=N`` (bounded:
    ≤ cells × 2^p rows, typically far fewer). ``cohort_events`` is a
    STATIC frame — cohort assignment is a property of a user's first
    event, the map any incremental retention system keeps. Replays
    are idempotent (hash-deterministic registers, overwrite-per-
    batch-dir); ``compact_every`` / ``prune_after_compact`` follow
    the family's snapshot rules (the post-merge frame IS the
    snapshot)."""
    if week_days <= 0:
        raise ValueError(f"week_days must be positive, got {week_days}")
    if not 4 <= p <= 20:
        raise ValueError(f"p must be in [4, 20], got {p}")
    from ..operators.funnel import retention_hll_cells
    from ..operators.hll import (hll_group_estimate_regs,
                                 hll_group_merge)
    gc = ["cohort_week", "week_offset"]

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        hist = _read_store_snapshots_or(
            spark, store_path, batch_id,
            "cohort_week bigint, week_offset bigint, "
            "bucket bigint, rho int")
        delta = retention_hll_cells(batch_df, cohort_events,
                                    ts_col=ts_col, user_col=user_col,
                                    week_days=week_days, p=p,
                                    salt=salt)
        merged = hll_group_merge(hist, delta, group_cols=gc).persist()
        try:
            hll_group_estimate_regs(merged, gc, p=p) \
                .write.mode("overwrite").parquet(
                    f"{out_path}/batch_id={batch_id}")
            delta.write.mode("overwrite").parquet(
                f"{store_path}/batch_id={batch_id}")
            if compact_every and (batch_id + 1) % compact_every == 0:
                merged.write.mode("overwrite").parquet(
                    f"{store_path}_compact/upto={batch_id}")
                if prune_after_compact:
                    _prune_in_stream(spark, store_path, batch_id)
        finally:
            merged.unpersist()

    return (activity.writeStream.foreachBatch(_process)
            .option("checkpointLocation", checkpoint).start())


# back-compat name from the round-8 semantic-store introduction; the
# snapshot rule is store-agnostic
_read_semantic_store = _read_store_snapshots_or


def semantic_dedup_stream(docs: DataFrame, codebook_path: str,
                          stats_path: str, store_path: str,
                          out_path: str, checkpoint: str,
                          tau: float = 0.99,
                          text_col: str = "text", dim: int = 256,
                          max_list_size: int | None = None,
                          compact_every: int | None = None,
                          tau_compact: float = 0.99,
                          prune_after_compact: bool = False,
                          allow_lossy_compaction: bool = False):
    """Day-2 SEMANTIC dedup over an unbounded text stream: each
    micro-batch embeds its documents (`hashed_tfidf_vectors` — no
    external model) under the FROZEN vocabulary statistics at
    ``stats_path`` (a persisted `fit_tfidf_stats` frame — per-batch
    statistics drift with batch composition, so an exact duplicate in
    a later batch would miss the tau bar on idf noise alone), runs
    :func:`operators.similarity.incremental_semantic_dedup` against
    the member store parquet at ``store_path`` using the FROZEN
    codebook at ``codebook_path`` (assignments under a retrained
    codebook are not comparable — train once with `ivf_train`,
    persist, reuse both artifacts together), writes the annotated
    batch under ``{out_path}/batch_id=N`` and appends kept members
    under ``{store_path}/batch_id=N``. Token-less documents (empty
    text) embed to nothing; they are still ANNOTATED — ``embedded=0,
    keep=1`` (no similarity signal is not a reason to drop a doc) —
    but never enter the store. Returns the started query.

    Exactly-once via the same per-batch-directory snapshot rule as
    `incremental_neardup_stream`: both writes overwrite their own
    deterministic directory, and the store read excludes partitions
    with ``batch_id >= N``, so a replayed batch sees exactly the state
    its first attempt saw. Semantic state is a per-cluster member
    JOIN, not a point lookup, so it lives in the store table rather
    than the engine's keyed state store — each batch pays one bounded
    cogrouped kernel against it.

    Day-N lifecycle: the store grows by every kept vector, and a
    flooded cluster eventually hits ``max_list_size``'s drop-and-log
    guard. ``compact_every=N`` schedules
    `operators.similarity.compact_semantic_store` IN-stream: every N
    batches the post-batch store state (mutually-near members
    collapsed to their oldest representative at ``tau_compact`` —
    keep it ≥ ``tau``, the recall contract) is written as a snapshot
    under ``{store_path}_compact/upto=<batch_id>``, and later store
    reads take newest-snapshot + raw deltas after it. The snapshot
    write follows the SAME exactly-once rule as the deltas: a
    deterministic per-batch directory in overwrite mode, and a replay
    of batch N reads only snapshots with ``upto < N`` — never its own
    half-written one — so it recomputes byte-identical state. Raw
    delta partitions at or below a committed snapshot's ``upto`` are
    dead weight (safe to prune once the checkpoint passes that batch)
    but never read again either way — ``prune_after_compact=True``
    deletes them in-stream on the PREVIOUS snapshot's authority
    (`_prune_in_stream`), and the ``tau_compact >= tau`` recall
    contract is enforced at call time (``allow_lossy_compaction=True``
    is the explicit opt-in to trade recall for store size).

    The manual form stays available between restarts: run
    `compact_semantic_store` over the store parquet and rewrite it as
    a ``batch_id=0`` baseline replacing the old partitions. THAT form
    rewrites partitions in place and so SEALS replay detection for
    the batches it absorbed (same contract as
    `compact_paragraph_store`'s terminal sum) — only do it while the
    stream is stopped; the in-stream snapshot path above exists
    precisely because it does not touch the raw partitions."""
    if compact_every and tau_compact < tau and not allow_lossy_compaction:
        # the recall contract the docstring states, now ENFORCED
        # (round-8 advisory): compacting at a looser threshold than
        # the dedup bar silently over-collapses the store — members a
        # later near-duplicate would have matched at tau get absorbed
        # into a representative it no longer clears, losing history
        # matches with no error anywhere. allow_lossy_compaction=True
        # is the explicit, greppable opt-in for the one legitimate use
        # (deliberately forgetting fine-grained history to trade
        # recall for store size — and the harness test that PROVES a
        # dropped member is gone).
        raise ValueError(
            f"tau_compact={tau_compact} < tau={tau}: in-stream "
            "compaction would collapse store members the dedup "
            "contract still needs; keep tau_compact >= tau (or pass "
            "allow_lossy_compaction=True to trade recall for store "
            "size deliberately)")
    from ..operators.similarity import (compact_semantic_store,
                                        hashed_tfidf_vectors,
                                        incremental_semantic_dedup)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        codebook = spark.read.parquet(codebook_path)
        stats = spark.read.parquet(stats_path)
        # the embedding DAG (two shuffles + the assignment kernel) is
        # consumed by three actions below (components inside the day-2
        # pass, the annotated write, the store-delta write) — persist
        # once per batch, release before returning
        emb = hashed_tfidf_vectors(
            batch_df.select("doc_id", text_col), dim=dim,
            text_col=text_col, stats=stats).persist()
        store = _read_semantic_store(
            spark, store_path, batch_id,
            "vec_id long, list_id int, e array<double>")
        ann, _ = incremental_semantic_dedup(
            emb, store, codebook, tau=tau, max_list_size=max_list_size)
        ann = ann.persist()
        # flag-don't-drop: docs whose text embeds to nothing are absent
        # from ann — annotate them (kept, unembedded) instead of losing
        # them from the output
        full = (batch_df.select(F.col("doc_id").alias("vec_id"))
                .join(ann, "vec_id", "left")
                .select("vec_id", "list_id", "dup_of_history",
                        F.coalesce("batch_group", F.col("vec_id"))
                        .alias("batch_group"),
                        F.coalesce("keep", F.lit(1)).alias("keep"),
                        F.col("list_id").isNotNull().cast("int")
                        .alias("embedded")))
        full.write.mode("overwrite").parquet(
            f"{out_path}/batch_id={batch_id}")
        # store delta from the BATCH frames only — joining the updated
        # store would rescan O(store) history per batch and duplicate
        # members on vec_id reuse
        kept_ids = ann.where(F.col("keep") == 1) \
            .select("vec_id", "list_id")
        delta = (emb.join(kept_ids, "vec_id")
                 .select("vec_id", "list_id",
                         F.col("embedding").cast("array<double>")
                         .alias("e")))
        delta.write.mode("overwrite") \
             .parquet(f"{store_path}/batch_id={batch_id}")
        if compact_every and (batch_id + 1) % compact_every == 0:
            # compact the POST-batch state (pre-batch store + this
            # batch's kept delta — both deterministic under replay)
            # into the snapshot for upto=batch_id; the member
            # projection is scope-cached inside compact_semantic_store
            compact_semantic_store(
                store.unionByName(delta), tau_compact=tau_compact,
                max_cluster_size=max_list_size) \
                .write.mode("overwrite") \
                .parquet(f"{store_path}_compact/upto={batch_id}")
            if prune_after_compact:
                _prune_in_stream(spark, store_path, batch_id)
        ann.unpersist()
        emb.unpersist()

    return (docs.writeStream.foreachBatch(_process)
            .option("checkpointLocation", checkpoint).start())


def _prune_in_stream(spark, store_path: str, batch_id: int) -> None:
    """The ``prune_after_compact=True`` body, shared by all five
    store-backed foreachBatch operators: right after batch N commits
    its snapshot, delete the raw deltas the PREVIOUS committed
    snapshot already covers. Safe by construction, without consulting
    the checkpoint:

    - foreachBatch is sequential — batch N running proves every batch
      < N is checkpoint-committed, so only batch ≥ N can ever replay;
    - a replay of N reads newest-snapshot(upto < N) + deltas above it
      (`_read_store_snapshots_or`), never the upto=N snapshot it may
      have half-written;
    - so ``before_batch=N`` bounds the prune authority to exactly the
      state that replay needs preserved: the previous snapshot stays,
      only deltas AT OR BELOW its upto (all unreadable by any possible
      future batch) are deleted.

    Net effect: raw-delta directories are bounded by ~2×compact_every
    (one un-pruned cycle + the live tail) for the stream's lifetime,
    instead of growing one per batch until an operator runs the
    ``store-prune`` CLI. The very first compaction is a no-op here
    (no previous snapshot to grant authority)."""
    prune_store_deltas(spark, store_path, before_batch=batch_id)


def last_committed_batch(spark, checkpoint: str) -> int | None:
    """Newest batch id the Structured Streaming checkpoint at
    ``checkpoint`` has COMMITTED (the ``commits/<batchId>`` write-ahead
    markers — a batch id appears there only after its ``foreachBatch``
    body returned and the engine sealed the batch). ``None`` when the
    checkpoint or its commits log doesn't exist yet. Used by
    `prune_store_deltas`' checkpoint guard; Hadoop FS so remote
    checkpoints work like local ones."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    commits = jvm.org.apache.hadoop.fs.Path(checkpoint + "/commits")
    fs = commits.getFileSystem(conf)
    if not fs.exists(commits):
        return None
    last = None
    for st in fs.listStatus(commits):
        name = st.getPath().getName()
        if st.isFile() and name.isdigit():
            last = max(last, int(name)) if last is not None else int(name)
    return last


def prune_store_deltas(spark, store_path: str,
                       dry_run: bool = False,
                       before_batch: int | None = None,
                       checkpoint: str | None = None) -> dict:
    """Reclaim store space made redundant by compaction — works on ANY
    of this module's snapshot-compacting stores (semantic members,
    paragraph frequencies, source-cap counts, near-dup signatures; the
    layout contract is ``{store}/batch_id=N`` deltas +
    ``{store}_compact/upto=K`` snapshots): delete raw delta partitions
    with ``batch_id <= upto`` of the newest COMMITTED snapshot, and
    superseded older snapshots. Returns ``{"upto": K, "pruned_deltas":
    [...], "pruned_snapshots": [...], "uncommitted_snapshots": [...]}``
    — the last lists snapshot dirs present WITHOUT a job-commit marker
    (debris, or a deployment that disabled
    ``marksuccessfuljobs`` — also warned about when it blocks all
    pruning, so a forever-no-op is visible, not silent).
    ``dry_run=True`` reports the same dict without deleting anything
    (the CLI ``store-prune --dry-run`` surface); a checkpoint-guard
    refusal under dry-run is reported in a ``refused`` field instead
    of raising, so a behind store can still be inspected.

    Safety rules (the same class as `compact_paragraph_store`'s
    sealing contract):

    - Run ONLY while the stream is stopped AND the checkpoint has
      committed past the snapshot's batch: a replay of batch
      ``N <= upto`` cannot see its own-or-later snapshots (the
      ``upto < N`` read rule) and would need the raw partitions below
      it — pruning under a live or behind checkpoint breaks replay.
      Pass ``checkpoint=`` to have that precondition VERIFIED instead
      of trusted: the prune refuses (`PruneRefusedError`) unless the
      checkpoint's newest committed batch is ``>= upto`` (the
      compacting batch sealed, so no batch ``<= upto`` can ever
      replay). The CLI surface is ``store-prune --checkpoint``.
    - A snapshot directory counts as committed only if it holds the
      job-commit ``_SUCCESS`` marker (written atomically at JOB commit
      by the parquet committer): a crash mid-snapshot-write can leave
      anything from ``_temporary`` debris to a PARTIAL subset of
      task-committed part files under a direct-write/v2-style
      committer, and a partial snapshot passing a data-files-exist
      test would authorize deleting raw history it cannot replace —
      irreversible loss (round-8 advisory). A deployment that disables
      ``mapreduce.fileoutputcommitter.marksuccessfuljobs`` therefore
      refuses to prune — fail-safe, never lossy.
    - ``before_batch=N`` bounds the authority to snapshots with
      ``upto < N`` — the IN-STREAM form (`prune_after_compact`): when
      batch N itself runs, every batch < N is checkpoint-committed by
      foreachBatch's sequential contract, so only batch ≥ N can ever
      replay, and a replay of N reads newest-snapshot(upto < N) +
      deltas above it — exactly what this bound preserves (the
      snapshot batch N just wrote is NEVER its own prune authority:
      N's replay cannot see it under the ``upto < N`` read rule).

    Uses Hadoop FileSystem operations (not driver-local ``os``), so it
    works against S3A/HDFS-backed stores exactly like the local tests
    (`sources/replacing.py` precedent)."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()

    def p(s):
        return jvm.org.apache.hadoop.fs.Path(s)

    root, snap_root = p(store_path), p(store_path + "_compact")
    fs = root.getFileSystem(conf)
    out = {"upto": None, "pruned_deltas": [], "pruned_snapshots": [],
           "uncommitted_snapshots": []}
    if not fs.exists(snap_root):
        return out

    def committed(dir_status):
        success = jvm.org.apache.hadoop.fs.Path(
            dir_status.getPath(), "_SUCCESS")
        return bool(fs.exists(success) and fs.getFileStatus(success)
                    .isFile())

    snaps = {}
    for st in fs.listStatus(snap_root):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("upto="):
            snaps[int(name.split("=", 1)[1])] = st
    committed_uptos = [k for k, st in snaps.items() if committed(st)
                       and (before_batch is None or k < before_batch)]
    out["uncommitted_snapshots"] = sorted(
        k for k, st in snaps.items() if not committed(st))
    if not committed_uptos:
        if snaps and not any(committed(st) for st in snaps.values()):
            # snapshots exist but NONE carries the job-commit marker:
            # either debris (fine — refusing protects the history) or a
            # deployment that disabled marksuccessfuljobs, where every
            # prune would silently no-op forever while deltas grow one
            # per batch — say so instead of looking like "no snapshots"
            import warnings
            warnings.warn(
                f"{store_path}_compact holds snapshot dirs "
                f"{sorted(snaps)} but none has a _SUCCESS job-commit "
                "marker; nothing pruned (if this deployment disables "
                "mapreduce.fileoutputcommitter.marksuccessfuljobs, "
                "prune can never establish a safe authority)",
                stacklevel=2)
        return out
    upto = max(committed_uptos)
    if checkpoint is not None:
        last = last_committed_batch(spark, checkpoint)
        if last is None or last < upto:
            msg = (
                f"refusing to prune {store_path}: checkpoint "
                f"{checkpoint} has committed through batch {last}, "
                f"behind the newest snapshot's upto={upto} — a replay "
                "of an uncommitted batch would need the raw deltas "
                "this prune deletes")
            if not dry_run:
                raise PruneRefusedError(msg)
            # dry-run is "report without acting": surface the refusal
            # AND what an (unsafe) prune would have deleted, so a store
            # whose checkpoint is behind can still be inspected
            out["refused"] = msg
    out["upto"] = upto
    if fs.exists(root):
        for st in fs.listStatus(root):
            name = st.getPath().getName()
            if st.isDirectory() and name.startswith("batch_id="):
                b = int(name.split("=", 1)[1])
                if b <= upto:
                    if not dry_run:
                        fs.delete(st.getPath(), True)
                    out["pruned_deltas"].append(b)
    for k, st in snaps.items():
        if k < upto:
            if not dry_run:
                fs.delete(st.getPath(), True)
            out["pruned_snapshots"].append(k)
    out["pruned_deltas"].sort()
    out["pruned_snapshots"].sort()
    return out


# back-compat name from the round-8 semantic-store introduction
prune_semantic_store_deltas = prune_store_deltas
