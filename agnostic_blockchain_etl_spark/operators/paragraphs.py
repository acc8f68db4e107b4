"""Paragraph-level exact deduplication (the Dolma / RefinedWeb recipe:
Soldaini et al. 2024, Penedo et al. 2023): a boilerplate paragraph —
nav bars, cookie banners, license footers — repeats across thousands
of pages while the surrounding documents are unique, so document-level
dedup never touches it. Split each document into paragraphs, count
each distinct paragraph's document frequency corpus-wide, and excise
the over-represented ones, keeping the document.

Semantics (deterministic, engine-portable):

- paragraphs = ``split(text, '\\n')``; a paragraph participates in
  dedup iff its trimmed form is non-empty and at least ``min_chars``
  long (blank / tiny lines are never counted and always kept in
  place, so formatting survives);
- a participating paragraph is DUPLICATED iff its 60-bit content hash
  appears in ≥ ``min_df`` distinct documents;
- ``keep_first=True`` (default): the document with the smallest
  ``doc_id`` keeps its occurrence (the corpus keeps exactly one copy —
  the `dedup_exact` first-seen convention); ``False``: every
  occurrence is removed (the RefinedWeb stance — boilerplate is noise
  everywhere);
- output rebuilds ``text`` with surviving paragraphs joined by
  ``'\\n'`` in original order, plus per-doc removal counts.

Spark-first scale shape: one posexplode scan; the paragraph
document-frequency table is corpus-sized (NOT broadcastable at
100 TB), so membership is a shuffle join keyed by the 8-byte paragraph
hash — map-side partial aggregation on the DF count, AQE handles the
skewed empty/boilerplate keys (the blank-line filter already removes
the worst hot key); reassembly is one (doc_id)-keyed aggregation with
``array_sort`` on carried positions (no window function, no global
sort). Everything is JVM-side built-ins; exact DuckDB twin in
tests/test_paragraphs.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _SQL_HASH60, _spark_hash60

from .registry import make_registry

QUERIES, ORACLES, query = make_registry()


def doc_paragraphs(docs: DataFrame, text_col: str = "text",
                   min_chars: int = 1) -> DataFrame:
    """(doc_id, pos, para, h) — one row per paragraph, in order;
    ``h`` is the portable 60-bit hash for participating paragraphs and
    NULL for blank/short ones (they never join, never count)."""
    trimmed = F.trim(F.col("para"))
    return (docs
            .select("doc_id",
                    F.posexplode(F.split(F.coalesce(F.col(text_col),
                                                    F.lit("")), "\n"))
                    .alias("pos", "para"))
            .withColumn("h", F.when(F.length(trimmed) >= min_chars,
                                    _spark_hash60(trimmed))))


def paragraph_frequency(paras: DataFrame) -> DataFrame:
    """(h, df, first_doc) over a `doc_paragraphs` frame: per distinct
    paragraph hash, the number of distinct documents containing it and
    the smallest doc_id among them (the keep-first canonical owner).
    One hash-keyed aggregation with map-side combine."""
    return (paras.where(F.col("h").isNotNull())
            .groupBy("h")
            .agg(F.count_distinct("doc_id").alias("df"),
                 F.min("doc_id").alias("first_doc")))


def dedup_paragraphs(docs: DataFrame, text_col: str = "text",
                     min_df: int = 2, min_chars: int = 1,
                     keep_first: bool = True) -> DataFrame:
    """Remove corpus-duplicated paragraphs from every document; returns
    ``(doc_id, text, n_paragraphs, n_removed)`` with ``text`` rebuilt
    from the surviving paragraphs in original order (documents losing
    every paragraph survive with empty text — flag-don't-drop, callers
    filter)."""
    paras = doc_paragraphs(docs, text_col, min_chars)
    freq = paragraph_frequency(paras)
    dup = F.col("df") >= min_df
    drop = dup & (~F.col("is_first") if keep_first else F.lit(True))
    marked = (paras.join(freq, "h", "left")
              .withColumn("is_first", F.col("doc_id") == F.col("first_doc"))
              .withColumn("drop",
                          F.coalesce(drop, F.lit(False))))
    return (marked.groupBy("doc_id")
            .agg(F.array_sort(F.collect_list(
                     F.when(~F.col("drop"),
                            F.struct("pos", "para")))).alias("kept"),
                 F.count("*").alias("n_paragraphs"),
                 F.sum(F.col("drop").cast("int")).alias("n_removed"))
            .select("doc_id",
                    F.array_join(F.transform("kept", lambda s: s.para),
                                 "\n").alias(text_col),
                    "n_paragraphs", "n_removed"))


_GATE_CHUNK = 8   # words per synthesized paragraph in the gate query


@query("dedup_paragraphs", oracle=f"""
    WITH w AS (
        SELECT doc_id, string_split(coalesce(text, ''), ' ') AS words
        FROM documents),
    chunked AS (
        SELECT doc_id,
               array_to_string(list_transform(
                   generate_series(1, CAST(ceil(len(words) / {_GATE_CHUNK}.0)
                                           AS BIGINT)),
                   i -> array_to_string(
                       words[(i-1)*{_GATE_CHUNK}+1 : i*{_GATE_CHUNK}], ' ')),
                   chr(10)) AS text
        FROM w),
    lines AS (
        SELECT doc_id, string_split(coalesce(text, ''), chr(10)) AS ls
        FROM chunked),
    p AS (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(ls)),
                      i -> {{'pos': i, 'para': ls[i]}}),
                      recursive := true)
        FROM lines),
    h AS (
        SELECT doc_id, pos, para,
               CASE WHEN length(trim(para)) >= 1 THEN (
                   SELECT {_SQL_HASH60}
                   FROM (SELECT trim(para) AS shingle)) END AS h
        FROM p),
    f AS (
        SELECT h, count(DISTINCT doc_id) AS df, min(doc_id) AS first_doc
        FROM h WHERE h IS NOT NULL GROUP BY h),
    m AS (
        SELECT h.doc_id, h.pos, h.para,
               coalesce(f.df >= 2 AND h.doc_id != f.first_doc,
                        FALSE) AS dropped
        FROM h LEFT JOIN f USING (h))
    SELECT doc_id,
           coalesce(string_agg(para, chr(10) ORDER BY pos)
                    FILTER (WHERE NOT dropped), '') AS text,
           CAST(count(*) AS BIGINT) AS n_paragraphs,
           CAST(sum(CASE WHEN dropped THEN 1 ELSE 0 END) AS BIGINT)
               AS n_removed
    FROM m GROUP BY doc_id
""")
def dedup_paragraphs_gate(spark, sf_dir):
    """Gate form of `dedup_paragraphs` over the testdata corpus: the
    documents have no newlines, so the gate deterministically
    synthesizes paragraphs by re-lining every 8 words (the corpus DOES
    share 8-word runs across documents — 153 at sf0.01 — so removals
    are exercised), then runs the full keep-first excision. Both
    engines chunk identically (plain space split, inclusive slices)."""
    from .tables import load_tables
    t = load_tables(spark, sf_dir, ("documents",))
    words = F.split(F.coalesce(F.col("text"), F.lit("")), " ")
    nchunks = F.ceil(F.size(words) / float(_GATE_CHUNK)).cast("int")
    chunked = t["documents"].select(
        "doc_id",
        F.array_join(
            F.transform(F.sequence(F.lit(1), nchunks),
                        lambda i: F.array_join(
                            F.slice(words, (i - 1) * _GATE_CHUNK + 1,
                                    _GATE_CHUNK), " ")),
            "\n").alias("text"))
    return dedup_paragraphs(chunked)


# ---------------------------------------------------------------------------
# Incremental form: the day-2 operation. History's paragraph statistics
# live in a persisted STORE of one row per distinct paragraph hash —
# (h, df, first_doc), 8-byte key + two longs, far smaller than the
# corpus text it summarizes — so a new batch is de-boilerplated against
# ALL of history without re-reading (let alone re-splitting) historical
# text. The invariant tested in test_paragraphs.py: the incremental
# pass produces EXACTLY what the full-corpus `dedup_paragraphs` over
# (history ∪ batch) would produce, restricted to the batch's documents.
# ---------------------------------------------------------------------------

_BIG = (1 << 62)


def paragraph_store(docs: DataFrame, text_col: str = "text",
                    min_chars: int = 1,
                    batch_id: int | None = None) -> DataFrame:
    """Build the persistable paragraph-frequency artifact for ``docs``:
    ``(h, df, first_doc)`` per distinct participating paragraph, plus a
    ``batch_id`` column when one is given. Persist as parquet (bucketed
    by ``h`` at scale — the probe join then co-locates with no
    store-side Exchange, exactly like
    `incremental.write_signature_store_tables`).

    TAG production batches with a stable ``batch_id`` (ingest epoch,
    file manifest id, ...): the append-log deployment writes tagged
    frequency rows per batch, and :func:`compact_paragraph_store`
    dedupes replayed appends by (h, batch_id) before summing — the
    exactly-once story for at-least-once ingest."""
    freq = paragraph_frequency(doc_paragraphs(docs, text_col, min_chars))
    if batch_id is not None:
        freq = freq.withColumn("batch_id", F.lit(batch_id).cast("long"))
    return freq


# batch_id for rows with no batch identity: pre-tagging stores and
# already-compacted totals. Rows sealed under this id have lost their
# provenance, so a replay of an ORIGINAL batch against sealed history is
# undetectable — tag batches at ingest and compact the tagged log.
_SEALED = -1


def _collapse_replays(log: DataFrame) -> DataFrame:
    """Per-(h, batch_id) replay collapse with ``batch_id`` RETAINED:
    a tagged append that ran twice contributes identical (h, batch_id)
    rows, which dedupe here (max df / min first_doc over identical
    values); untagged rows are one sealed batch (id -1) whose df
    contributions SUM within it — sealed rows have no batch identity
    to dedupe on, and collapsing distinct pre-tagging appends with max
    would silently undercount df (boilerplate thresholds would then
    misclassify common paragraphs as rare). Output is still a LOG
    (one row per (h, batch_id)), so downstream merges keep deduping
    replays — the step that loses that power is
    :func:`compact_paragraph_store`'s final sum, which seals."""
    if "batch_id" not in log.columns:
        log = log.withColumn("batch_id", F.lit(_SEALED).cast("long"))
    return (log.groupBy("h", "batch_id")
            .agg(F.max("df").alias("mdf"),
                 F.sum("df").alias("sdf"),
                 F.min("first_doc").alias("first_doc"))
            .select("h", "batch_id",
                    F.when(F.col("batch_id") == _SEALED,
                           F.col("sdf")).otherwise(F.col("mdf"))
                    .alias("df"),
                    "first_doc"))


def compact_paragraph_store(log: DataFrame) -> DataFrame:
    """Collapse an append LOG of per-batch frequency rows into the
    probe-ready totals ``(h, df, first_doc)``. Replay-safe for tagged
    rows — the (h, batch_id) dedupe (`_collapse_replays`) runs BEFORE
    the cross-batch sum, so compact(log + replayed batch) ≡
    compact(log).

    **Compaction SEALS.** The output drops ``batch_id``, so a later
    merge of an ORIGINAL tagged batch into a compacted store is
    undetectable (the sealed rows sum) — ``compact(merge(compact(
    log, b)), b)`` double-counts b. This is why the tagged-merge path
    of :func:`merge_paragraph_stores` does NOT route through here: the
    tagged append-log stays authoritative and replay-deduping through
    any chain of merges; compact is the terminal read-optimized view
    you derive from it (per probe, or on a schedule), never the frame
    you keep appending to. The asymmetry is the contract: tagged rows
    get replay protection, sealed rows get additive merge — tag at
    ingest to have both.

    Scale: two hash aggregations. The first shuffles the log on
    (h, batch_id) with map-side partial combine; the second shuffles
    the FIRST'S OUTPUT on h — already collapsed to one row per
    (paragraph, batch), i.e. at most batches× the final store size,
    far smaller than the log it summarizes."""
    return (_collapse_replays(log).groupBy("h")
            .agg(F.sum("df").alias("df"),
                 F.min("first_doc").alias("first_doc")))


def merge_paragraph_stores(a: DataFrame, b: DataFrame) -> DataFrame:
    """Stores are MERGEABLE sketches: df adds, first_doc mins — so a
    100 TB deployment appends each batch's frequency rows and compacts
    periodically (the ReplacingMergeTree pattern) instead of rewriting
    the store per batch. One hash-keyed aggregation; associativity and
    merge-equals-one-shot parity are pytest-pinned.

    When either side carries ``batch_id`` (see :func:`paragraph_store`),
    the result is the replay-collapsed LOG — per-(h, batch_id) rows
    with ``batch_id`` retained — NOT the sealed totals: merging the
    SAME tagged batch twice equals merging it once, and because the
    output keeps batch identity this holds through CHAINS of merges
    (``merge(merge(log, b), b) ≡ merge(log, b)``; an earlier revision
    compacted here, which sealed after the first merge and silently
    double-counted the replay). Derive the one-row-per-h probe view
    with :func:`compact_paragraph_store` at read time. Untagged frames
    are summed as-is to sealed totals (two untagged stores are assumed
    distinct)."""
    cols = ["h", "df", "first_doc"]
    if "batch_id" in a.columns or "batch_id" in b.columns:
        def tagged(df: DataFrame) -> DataFrame:
            if "batch_id" not in df.columns:
                df = df.withColumn("batch_id",
                                   F.lit(_SEALED).cast("long"))
            return df.select(*cols, "batch_id")
        return _collapse_replays(tagged(a).unionByName(tagged(b)))
    return (a.select(*cols)
            .unionByName(b.select(*cols))
            .groupBy("h")
            .agg(F.sum("df").alias("df"),
                 F.min("first_doc").alias("first_doc")))


def incremental_dedup_paragraphs(new_docs: DataFrame, store: DataFrame,
                                 text_col: str = "text", min_df: int = 2,
                                 min_chars: int = 1,
                                 batch_id: int | None = None
                                 ) -> tuple[DataFrame, DataFrame]:
    """De-boilerplate a new batch against history: returns
    ``(deduped, updated_store)`` where ``deduped`` has the
    `dedup_paragraphs` shape (plus ``n_removed_history`` — occurrences
    cut because history already owns the paragraph) and
    ``updated_store`` is the merged frequency store.

    Semantics = the full-corpus run over (history ∪ batch) restricted
    to batch docs: a paragraph is duplicated iff its COMBINED document
    frequency reaches ``min_df``; the keeper is the smallest doc_id
    across both sides (with disjoint, monotonically growing doc_ids —
    the normal ingest — history always wins, so a batch occurrence of
    a historical paragraph is always excised).

    Scale: the batch is split and counted once; the store is probed by
    ONE equi-join on the 8-byte hash touching only the batch's distinct
    hashes (store bucketed by ``h`` → no store-side shuffle); the
    rebuild is the same one doc-keyed aggregation as the batch form.
    Store growth is one merge aggregation — or append + compact via
    :func:`merge_paragraph_stores` at scale.

    ``store`` may be the probe-ready totals (one row per ``h``) OR the
    tagged append log (per-(h, batch_id) rows — the replay-safe
    deployment artifact); a log is compacted on the fly for the probe.
    Pass ``batch_id`` to tag THIS batch's contribution in the returned
    store, keeping the log authoritative end-to-end: replaying the call
    with the same tag leaves the (compacted) store unchanged."""
    paras = doc_paragraphs(new_docs, text_col, min_chars)
    batch_freq = paragraph_frequency(paras)
    probe_store = (compact_paragraph_store(store)
                   if "batch_id" in store.columns else store)
    if batch_id is not None:
        batch_freq = batch_freq.withColumn(
            "batch_id", F.lit(batch_id).cast("long"))
    probe = (batch_freq.select("h", "df", "first_doc")
             .select("h", F.col("df").alias("bdf"),
                     F.col("first_doc").alias("bfirst"))
             .join(probe_store.select("h", F.col("df").alias("hdf"),
                                      F.col("first_doc").alias("hfirst")),
                   "h", "left"))
    stats = probe.select(
        "h",
        (F.coalesce("hdf", F.lit(0)) + F.col("bdf")).alias("cdf"),
        F.least(F.coalesce("hfirst", F.lit(_BIG)), F.col("bfirst"))
         .alias("owner"),
        F.col("hdf").isNotNull().alias("in_history"))
    marked = (paras.join(stats, "h", "left")
              .withColumn("drop",
                          F.coalesce((F.col("cdf") >= min_df) &
                                     (F.col("doc_id") != F.col("owner")),
                                     F.lit(False)))
              .withColumn("hist_drop",
                          (F.col("drop") &
                           F.coalesce("in_history", F.lit(False)))
                          .cast("int")))
    deduped = (marked.groupBy("doc_id")
               .agg(F.array_sort(F.collect_list(
                        F.when(~F.col("drop"),
                               F.struct("pos", "para")))).alias("kept"),
                    F.count("*").alias("n_paragraphs"),
                    F.sum(F.col("drop").cast("int")).alias("n_removed"),
                    F.sum("hist_drop").alias("n_removed_history"))
               .select("doc_id",
                       F.array_join(F.transform("kept", lambda s: s.para),
                                    "\n").alias(text_col),
                       "n_paragraphs", "n_removed", "n_removed_history"))
    return deduped, merge_paragraph_stores(store, batch_freq)
