"""Exact-substring span deduplication (the Lee et al. 2022 "Deduplicating
Training Data Makes Language Models Better" operator): find every run of
``k`` or more consecutive words that occurs more than once in the corpus,
keep its first occurrence, and report the later copies as removable
(doc_id, word-span) ranges.

Document-level dedup (``operators/dedup.py``) misses boilerplate shared
by otherwise-distinct pages (licenses, navigation, quoted passages);
span-level dedup is the standard second pass. The reference suffix-array
formulation is inherently single-machine; this is the distributed
re-expression: k-gram digests replace suffix-array LCP runs, exact for
runs ≥ k by construction (a duplicated run of length L ≥ k duplicates
all L-k+1 of its k-grams, which merge back into one maximal span).

Plan shape at 100 TB: one tokenize+digest scan (O(k) slice/zip column
ops per doc — no per-position re-tokenization, see the O(n²) foot-gun
note in dedup.py), one groupBy on the 128-bit digest (the only
corpus-sized shuffle; partial aggregation collapses unique grams
map-side), a digest-keyed join back (AQE skew-split handles hot
boilerplate grams), then per-doc window merge — partitioned by doc, so
the merge shuffle carries only duplicated positions, a small fraction
of the corpus. Digest collisions at 10^14 grams: P ≈ 10^28/2^129
≈ 1.5e-11 — below hardware error rates; a paranoid deployment adds a
verify join on the gram text for flagged spans only.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _kgrams(words_col, k: int):
    """Array of the k-word gram STRINGS at positions 1..n-k+1, built by
    zipping k shifted slices (each slice evaluates the upstream split
    once — O(n·k) total work, never O(n²)). Digesting happens AFTER the
    explode, in whole-stage codegen (two independently-seeded xxhash64
    longs, see `_digest_cols`): hashing inside the transform() lambda
    runs interpreted per element — measured 2.4× slower (r11)."""
    n = F.size(words_col)
    m = n - (k - 1)  # gram count
    slices = [F.slice(words_col, i + 1, m) for i in range(k)]
    joined = reduce(
        lambda acc, s: F.zip_with(acc, s,
                                  lambda a, b: F.concat_ws(" ", a, b)),
        slices[1:], slices[0])
    return (F.when(n >= k, joined)
            .otherwise(F.array().cast("array<string>")))


def _digest_cols(g):
    """128-bit gram digest as two flat bigint columns (h1, h2): keeps
    the 10^14-gram collision budget of the old md5 form (P ≈ 10^28/2^129)
    while shuffling 16 fixed-width codegen-comparable bytes instead of a
    32-char hex string."""
    return [F.xxhash64(g).alias("h1"), F.xxhash64(g, F.lit(1)).alias("h2")]


_DIGEST_KEY = ["h1", "h2"]


def duplicate_spans(docs: DataFrame, k: int = 10,
                    words_df: DataFrame | None = None) -> DataFrame:
    """(doc_id, span_start, span_end, span_words) for every maximal span
    of words that duplicates an earlier occurrence somewhere in the
    corpus (first occurrence in (doc_id, pos) order is the keeper and is
    NOT reported). Positions are 1-based word indices; spans of
    overlapping or adjacent duplicated k-grams merge (gap ≤ k).

    ``words_df`` (doc_id, words) lets a caller share one cached
    tokenization across several operators: the k slice references would
    otherwise each re-evaluate the split through project-collapse
    (measured 2× on the gram scan)."""
    from .dedup import _scoped_cache, _scoped_cache_add

    if words_df is None:
        from .tables import spread
        words_src = spread(docs).select(
            "doc_id",
            F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("words"))
        cache_fn = _scoped_cache
    else:
        words_src = words_df.select("doc_id", "words")
        cache_fn = _scoped_cache_add   # don't pop the caller's words cache
    # one cached digest scan feeds BOTH sides (the dup-grouping and the
    # position join-back) — the tokenize+digest pass is the expensive
    # stage
    grams = cache_fn(
        words_src.select("doc_id",
                         F.posexplode(_kgrams(F.col("words"), k))
                         .alias("pos0", "g"))
        .select("doc_id", (F.col("pos0") + 1).alias("pos"),
                *_digest_cols(F.col("g"))))
    dups = (grams.groupBy(*_DIGEST_KEY)
            .agg(F.count("*").alias("n_occ"),
                 F.min(F.struct("doc_id", "pos")).alias("first"))
            .where(F.col("n_occ") > 1))
    # no .distinct(): grams carries exactly one row per (doc_id, pos)
    # and dups is unique per digest, so the join output is already
    # distinct — the old distinct was a pure extra shuffle+agg
    marked = (grams.join(dups, _DIGEST_KEY)
              .where(~((F.col("doc_id") == F.col("first.doc_id")) &
                       (F.col("pos") == F.col("first.pos"))))
              .select("doc_id", "pos"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    grp = F.sum(
        F.when(F.col("pos") - F.lag("pos").over(w) <= k, 0).otherwise(1)
    ).over(w)
    return (marked.withColumn("grp", grp)
            .groupBy("doc_id", "grp")
            .agg(F.min("pos").alias("span_start"),
                 (F.max("pos") + (k - 1)).alias("span_end"))
            .select("doc_id", "span_start", "span_end",
                    (F.col("span_end") - F.col("span_start") + 1)
                    .alias("span_words")))


def span_dedup_stats(docs: DataFrame, k: int = 10,
                     words_df: DataFrame | None = None) -> DataFrame:
    """Per-document span-dedup summary: how many removable spans, how
    many duplicated words, and the duplicated-word fraction — the
    corpus-health report a pipeline runs before deciding to cut."""
    spans = duplicate_spans(docs, k, words_df=words_df)
    per_doc = (spans.groupBy("doc_id")
               .agg(F.count("*").alias("n_dup_spans"),
                    F.sum("span_words").alias("n_dup_words")))
    # null-safe word count: size(NULL array) is -1 under Spark's
    # default sizeOfNull, which reported n_words = -1 (and a -0.0
    # fraction) for metadata-only null-text documents
    if words_df is None:
        warr = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
        sizes = docs.select(
            "doc_id",
            F.when(warr.isNull(), 0).otherwise(F.size(warr))
            .alias("n_words"))
    else:
        sizes = words_df.select(
            "doc_id",
            F.when(F.col("words").isNull(), 0)
            .otherwise(F.size("words")).alias("n_words"))
    frac = F.when(
        F.col("n_words") > 0,
        F.round(F.coalesce("n_dup_words", F.lit(0)).cast("double")
                / F.col("n_words"), 4))          # 0-word doc: no frac
    return (sizes
            .join(per_doc, "doc_id", "left")
            .select("doc_id", "n_words",
                    F.coalesce("n_dup_spans", F.lit(0)).alias("n_dup_spans"),
                    F.coalesce("n_dup_words", F.lit(0)).alias("n_dup_words"),
                    frac.alias("dup_word_frac")))


def remove_duplicate_spans(docs: DataFrame, k: int = 10) -> DataFrame:
    """The transform Lee et al. 2022 actually apply: DELETE every later
    occurrence of a duplicated ≥k-word run, keeping the corpus-wide
    first occurrence intact. Returns ``(doc_id, text, n_words,
    n_removed)`` where ``text`` is the cleaned document (words outside
    any reported span, original order, single-space joined, lowercased
    by the shared tokenizer) — `duplicate_spans` is the report, this is
    the surgery.

    Scale shape: the span frame is tiny (only duplicated regions), so it
    aggregates to one ``spans`` array per affected doc and joins back
    LEFT — untouched documents pay one null-check; affected documents
    rebuild via a single filter over (word, position) pairs, JVM-side
    (per-word span containment is O(spans-per-doc), and spans-per-doc is
    small by construction since overlapping spans merged)."""
    spans = (duplicate_spans(docs, k)
             .groupBy("doc_id")
             .agg(F.collect_list(F.struct("span_start", "span_end"))
                  .alias("spans")))
    words = docs.select(
        "doc_id",
        F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("words"))
    pos_words = F.zip_with(
        F.col("words"),
        F.sequence(F.lit(1), F.size("words")),
        lambda w, i: F.struct(w.alias("w"), i.alias("i")))
    in_span = lambda pw: F.exists(                      # noqa: E731
        F.col("spans"), lambda s: (pw["i"] >= s["span_start"]) &
                                  (pw["i"] <= s["span_end"]))
    kept = F.when(F.col("spans").isNull(), F.col("words")) \
        .otherwise(F.transform(F.filter(pos_words, lambda pw: ~in_span(pw)),
                               lambda pw: pw["w"]))
    return (words.join(spans, "doc_id", "left")
            .select("doc_id",
                    F.array_join(kept, " ").alias("text"),
                    F.size(kept).alias("n_words"),
                    (F.size("words") - F.size(kept)).alias("n_removed")))


def decontaminate_spans(train_docs: DataFrame, eval_docs: DataFrame,
                        k: int = 10) -> DataFrame:
    """Span-level benchmark decontamination — the middle ground between
    keeping a contaminated document and dropping it whole
    (`dedup.decontaminate` flags whole documents; this EXCISES the
    overlapping spans and keeps the clean remainder, the Llama-2-style
    treatment): every run of ≥ ``k`` consecutive train words that
    appears verbatim anywhere in the eval/benchmark set is deleted from
    the train document. Returns ``(doc_id, text, n_words, n_removed)``
    over ALL train docs — untouched documents pass through with
    ``n_removed = 0`` (text normalized by the shared tokenizer:
    lowercased, single-space joined).

    Unlike `remove_duplicate_spans` there is no first-occurrence
    keeper: eval text must not survive in the train set at all, so
    EVERY match is excised.

    Scale shape: the eval side is a benchmark suite (bounded), so its
    distinct k-gram digest set is explicitly ``broadcast()`` — the
    100 TB train corpus is scanned once with a map-side probe (the same
    shape as `decontaminate`); the span merge shuffles only MATCHED
    positions (a tiny fraction at any realistic contamination rate);
    the surgery joins the per-doc span arrays back LEFT."""
    tok = lambda c: F.split(F.lower(F.trim(c)), r"\s+")   # noqa: E731
    eval_grams = (eval_docs
                  .select(F.explode(_kgrams(tok(F.col("text")), k))
                          .alias("g"))
                  .select(*_digest_cols(F.col("g")))
                  .distinct())
    from .tables import spread
    words = spread(train_docs).select("doc_id",
                                      tok(F.col("text")).alias("words"))
    train_grams = (words
                   .select("doc_id",
                           F.posexplode(_kgrams(F.col("words"), k))
                           .alias("pos0", "g"))
                   .select("doc_id", (F.col("pos0") + 1).alias("pos"),
                           *_digest_cols(F.col("g"))))
    # no .distinct(): one gram row per (doc_id, pos) joined against a
    # by-construction-distinct eval digest set is already distinct
    marked = (train_grams.join(F.broadcast(eval_grams), _DIGEST_KEY)
              .select("doc_id", "pos"))
    # adjacent/overlapping matched k-grams merge into maximal spans
    # (gap ≤ k), exactly as in duplicate_spans: a contaminated run of
    # length L ≥ k marks positions p..p+L-k, merging to span p..p+L-1
    w = Window.partitionBy("doc_id").orderBy("pos")
    grp = F.sum(
        F.when(F.col("pos") - F.lag("pos").over(w) <= k, 0).otherwise(1)
    ).over(w)
    spans = (marked.withColumn("grp", grp)
             .groupBy("doc_id", "grp")
             .agg(F.min("pos").alias("span_start"),
                  (F.max("pos") + (k - 1)).alias("span_end"))
             .groupBy("doc_id")
             .agg(F.collect_list(F.struct("span_start", "span_end"))
                  .alias("spans")))
    pos_words = F.zip_with(
        F.col("words"),
        F.sequence(F.lit(1), F.size("words")),
        lambda wd, i: F.struct(wd.alias("w"), i.alias("i")))
    in_span = lambda pw: F.exists(                      # noqa: E731
        F.col("spans"), lambda s: (pw["i"] >= s["span_start"]) &
                                  (pw["i"] <= s["span_end"]))
    kept = F.when(F.col("spans").isNull(), F.col("words")) \
        .otherwise(F.transform(F.filter(pos_words, lambda pw: ~in_span(pw)),
                               lambda pw: pw["w"]))
    return (words.join(spans, "doc_id", "left")
            .select("doc_id",
                    F.array_join(kept, " ").alias("text"),
                    F.size(kept).alias("n_words"),
                    (F.size("words") - F.size(kept)).alias("n_removed")))
