"""One-call corpus curation: the full pre-training data recipe
(FineWeb/CCNet-shaped) composed from the engine's operators —

    PII scrub → quality signals → exact dedup → MinHash-LSH near-dup
    clustering → (optional) benchmark decontamination → unigram-LM
    perplexity buckets → final keep flag

**Flag, don't filter**: every stage ANNOTATES the corpus with its
verdict and the final ``keep`` is the conjunction, computed in one DAG.
That is the Spark-first shape — no stage materializes a filtered copy of
a 100 TB corpus, Catalyst fuses the scrub/quality/score projections onto
one scan, and the per-stage report is ONE aggregation over the final
frame instead of a count() action per stage. It is also what a data
auditor needs: the reason a document died is a column, not an absence.

Dedup (exact and near-dup) keys on the ORIGINAL text, not the redacted
text, mirroring ``examples/corpus_prep``: a redaction-rule change must
never resurrect duplicates.

The LM is trained only on documents that survive every earlier stage —
scoring against a model fit to the kept distribution, not to the
garbage being removed — then every document is scored (so the report
can show what the tail looked like).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import connected_components, exact_dedup, minhash_lsh_pairs
from .lm import perplexity_score, train_unigram_lm
from .pii import pii_scrub
from .textstats import text_stats


def curate_corpus(docs: DataFrame, eval_docs: DataFrame | None = None,
                  vocab_size: int = 20_000,
                  max_contamination: float = 0.2,
                  drop_tail: bool = True,
                  lm: str = "unigram",
                  gopher: bool = False,
                  c4: bool = False,
                  paragraphs: bool = False,
                  quality_model: DataFrame | None = None,
                  quality_alpha: float = 9.0,
                  best_duplicate: bool = False,
                  source_cap: int | None = None,
                  persist: bool = False) -> tuple[DataFrame, DataFrame]:
    """Annotate ``docs`` (needs ``doc_id``/``text``/``lang``) with every
    curation verdict and return ``(annotated, report)``.

    ``annotated``: doc_id, text (redacted), lang, n_words, pii_clean,
    quality_keep, exact_keep, neardup_keep, decontam_keep, c4_keep,
    gopher_keep, para_removed, q_score, clf_keep, bucket, avg_nll,
    keep — one row per input document. ``paragraphs=True`` excises
    corpus-duplicated boilerplate paragraphs
    (`paragraphs.dedup_paragraphs`) before any content-keyed stage;
    ``para_removed`` counts what was cut.

    ``quality_model``: a trained `quality.train_quality_classifier`
    frame — scores every document (``q_score``) and joins the GPT-3
    Pareto keep rule (``clf_keep``, `quality.quality_pareto_keep` with
    ``quality_alpha``) into the conjunction. Without a model both
    columns are neutral (``q_score`` null, ``clf_keep`` 1).

    ``best_duplicate=True`` (requires ``quality_model``): near-dup
    clusters keep their HIGHEST-``q_score`` member (the FineWeb /
    RefinedWeb keep-the-best practice, `dedup.select_cluster_canonical`)
    instead of the smallest-doc_id first-seen one.

    ``source_cap=<n>`` (requires a ``source`` column): joins the exact
    per-source frequency cap (`sourcecap.source_cap` — the C4/FineWeb
    hot-domain guard) into the conjunction as ``cap_keep``; without it
    the column is neutral (1).

    ``report``: a single row of per-stage survivor counts plus the kept
    token total — the number a capacity plan actually wants."""
    if best_duplicate and quality_model is None:
        raise ValueError("best_duplicate=True requires a quality_model")
    if source_cap is not None and "source" not in docs.columns:
        raise ValueError("source_cap requires a 'source' column")
    # Disabled stages NEVER touch the plan: their neutral flag columns
    # are attached with withColumn(lit) AFTER the joins of the enabled
    # stages (below), never materialized as doc_id-keyed frames — a
    # joined lit(1) frame costs a full-corpus shuffle per disabled
    # stage, which at 100 TB is a real bill for doing nothing.
    if source_cap is not None:
        from .sourcecap import source_cap as _source_cap
        cap_flag = _source_cap(docs.select("doc_id", "source"),
                               source_cap).select("doc_id", "cap_keep")
    else:
        cap_flag = None
    if "lang" not in docs.columns:   # lang only feeds the ID facet;
        docs = docs.withColumn("lang", F.lit("und"))  # absent is fine
    if c4:
        # line-level surgery FIRST: every later stage (dedup keys
        # included) sees the C4-cleaned text, mirroring the published
        # pipeline order; the page verdict joins the keep conjunction.
        # Off by default — newline-free short-document corpora would
        # lose every page to the min-kept-lines floor.
        from .clean import c4_clean
        cleaned = c4_clean(docs).select(
            "doc_id", F.col("text").alias("_c4_text"),
            F.col("c4_keep").alias("_c4_keep"))
        docs = (docs.drop("text").join(cleaned, "doc_id")
                .withColumnRenamed("_c4_text", "text"))
    if paragraphs:
        # corpus-wide boilerplate-paragraph excision (Dolma-style),
        # AFTER c4's per-line surgery and BEFORE every content-keyed
        # stage: dedup keys and LM training see the de-boilerplated
        # text. Off by default — single-paragraph corpora gain nothing
        # and genuinely-quoted shared passages would be excised.
        from .paragraphs import dedup_paragraphs
        rebuilt = dedup_paragraphs(docs.select("doc_id", "text")).select(
            "doc_id", F.col("text").alias("_p_text"),
            F.col("n_removed").alias("_para_removed"))
        docs = (docs.drop("text").join(rebuilt, "doc_id")
                .withColumnRenamed("_p_text", "text"))
    # The c4 / paragraph verdicts already live on `docs` after the
    # rebuild joins — carry them through the base projection instead of
    # re-joining them doc_id-keyed (one scan, zero extra shuffles).
    stage_flags = []
    if c4:
        stage_flags.append(F.col("_c4_keep").alias("c4_keep"))
    if paragraphs:
        stage_flags.append(F.col("_para_removed").alias("para_removed"))
    base_full = docs.select("doc_id", "text", "lang", *stage_flags)
    base = base_full.select("doc_id", "text", "lang")

    scrub = pii_scrub(base).select("doc_id", "pii_clean",
                                   F.col("redacted"))
    quality = (text_stats(base.join(scrub.select("doc_id", "redacted"),
                                    "doc_id")
                          .select("doc_id",
                                  F.col("redacted").alias("text"), "lang"))
               .select("doc_id", F.col("ws_tokens").alias("n_words"),
                       "quality_keep"))

    if quality_model is not None:
        # trained GPT-3/CCNet filter on the REDACTED text (what
        # survives is what trains): one broadcast of the (B+1)-row
        # model + one doc-keyed aggregation, then the zero-shuffle
        # Pareto keep projection.
        from .quality import quality_classifier_score, quality_pareto_keep
        clf = quality_pareto_keep(
            quality_classifier_score(
                scrub.select("doc_id", F.col("redacted").alias("text")),
                quality_model),
            alpha=quality_alpha).select(
                "doc_id", "q_score",
                F.col("keep").cast("int").alias("clf_keep"))
    else:
        clf = None   # neutral q_score/clf_keep attached post-join

    exact = exact_dedup(base)
    # LEFT join + default 1: md5(NULL) is NULL and an equi-join on a
    # NULL key matches nothing, so an inner join here silently DROPPED
    # null-text documents from the whole annotated frame — breaking the
    # one-row-per-input, flag-don't-filter contract. A null-text doc
    # has no content signal, so it is nobody's exact duplicate
    # (matching the streaming `dedup_stream` null rule) and keeps 1.
    exact_flag = (base
                  .select("doc_id",
                          F.md5(F.col("text").cast("binary"))
                          .alias("content_key"))
                  .join(exact.select("content_key", "keep_doc_id"),
                        "content_key", "left")
                  .select("doc_id",
                          F.coalesce(
                              (F.col("doc_id") == F.col("keep_doc_id"))
                              .cast("int"), F.lit(1))
                          .alias("exact_keep")))

    labels = connected_components(minhash_lsh_pairs(base)
                                  .select("doc_a", "doc_b"))
    if best_duplicate:
        # re-pick each cluster's survivor as the argmax q_score (ties →
        # smallest doc_id): one score join + one max-of-struct
        # aggregation, no window (dedup.select_cluster_canonical).
        from .dedup import select_cluster_canonical
        canon = select_cluster_canonical(
            labels.withColumnRenamed("label", "cluster_id"),
            clf.select("doc_id", "q_score"), "q_score")
        neardup_flag = (base.select("doc_id")
                        .join(canon.select(F.col("doc_id").alias("d"),
                                           "is_canonical"),
                              F.col("doc_id") == F.col("d"), "left")
                        .select("doc_id",
                                F.coalesce("is_canonical", F.lit(1))
                                .alias("neardup_keep")))
    else:
        neardup_flag = (base.select("doc_id")
                        .join(labels.withColumnRenamed("doc_id", "d")
                              .withColumnRenamed("label", "cluster"),
                              F.col("doc_id") == F.col("d"), "left")
                        .select("doc_id",
                                F.when(F.col("cluster").isNull()
                                       | (F.col("cluster")
                                          == F.col("doc_id")),
                                       1).otherwise(0)
                                 .alias("neardup_keep")))

    annotated = (base_full.join(scrub, "doc_id")
                 .join(quality, "doc_id")
                 .join(exact_flag, "doc_id")
                 .join(neardup_flag, "doc_id"))
    if clf is not None:
        annotated = annotated.join(clf, "doc_id")
    else:
        annotated = (annotated
                     .withColumn("q_score",
                                 F.lit(None).cast("double"))
                     .withColumn("clf_keep", F.lit(1)))
    if cap_flag is not None:
        annotated = annotated.join(cap_flag, "doc_id")
    else:
        annotated = annotated.withColumn("cap_keep", F.lit(1))
    if not c4:
        annotated = annotated.withColumn("c4_keep", F.lit(1))
    if not paragraphs:
        annotated = annotated.withColumn("para_removed",
                                         F.lit(0).cast("long"))

    if eval_docs is not None:
        from .dedup import decontaminate
        contam = decontaminate(base, eval_docs, max_contamination) \
            .select("doc_id", "decontam_keep")
        annotated = annotated.join(contam, "doc_id", "left") \
            .withColumn("decontam_keep",
                        F.coalesce("decontam_keep", F.lit(1)))
    else:
        annotated = annotated.withColumn("decontam_keep", F.lit(1))

    if gopher:
        # the full document-shape rule set on the REDACTED text (what
        # survives is what trains); off by default — the 50-word floor
        # is tuned for web pages, not short-document corpora
        from .textstats import gopher_quality
        gf = gopher_quality(
            annotated.select("doc_id",
                             F.col("redacted").alias("text"))) \
            .select("doc_id", "gopher_keep")
        annotated = annotated.join(gf, "doc_id")
    else:
        annotated = annotated.withColumn("gopher_keep", F.lit(1))

    pre_lm_keep = (F.col("pii_clean") * F.col("quality_keep")
                   * F.col("exact_keep") * F.col("neardup_keep")
                   * F.col("decontam_keep") * F.col("gopher_keep")
                   * F.col("c4_keep") * F.col("clf_keep")
                   * F.col("cap_keep"))
    survivors = annotated.where(pre_lm_keep == 1) \
        .select("doc_id", F.col("redacted").alias("text"))
    to_score = annotated.select("doc_id", F.col("redacted").alias("text"))
    # The trained model is a bounded artifact (V+1 rows) whose lineage
    # is the ENTIRE survivor DAG — without severing it, every broadcast
    # of the vocab replays scrub/dedup/clustering from the parquet scan
    # (measured −24% on the default path at sf0.1). Sever it by
    # collecting the rows and recreating the frame driver-side: unlike
    # localCheckpoint (the r5 mechanism), the severed model does not
    # live in non-reliable executor block storage, so executor loss or
    # dynamic-allocation deprovisioning on a real cluster cannot strand
    # downstream scoring — the rows travel with the plan. (At 100 TB
    # with a huge vocab, write the model to parquet and read it back —
    # SCALE.md's materialization-point rule — but V+1 rows is driver
    # cheap at any realistic vocab_size.)
    def _sever(model: DataFrame) -> DataFrame:
        return model.sparkSession.createDataFrame(
            model.collect(), model.schema)

    if lm == "bigram":
        from .lm import bigram_perplexity_score, train_bigram_lm
        scored = bigram_perplexity_score(
            to_score,
            _sever(train_bigram_lm(survivors, vocab_size=vocab_size)))
    elif lm == "unigram":
        scored = perplexity_score(
            to_score,
            _sever(train_unigram_lm(survivors, vocab_size=vocab_size)))
    else:
        raise ValueError(f"lm must be 'unigram' or 'bigram', got {lm!r}")

    lm_keep = (F.col("bucket") != "tail").cast("int") if drop_tail \
        else F.lit(1)
    final = (annotated
             .join(scored.select("doc_id", "avg_nll", "bucket"), "doc_id")
             .withColumn("lm_keep", lm_keep)
             .withColumn("keep", (pre_lm_keep * F.col("lm_keep"))
                         .cast("int"))
             .select("doc_id", F.col("redacted").alias("text"), "lang",
                     "n_words", "pii_clean", "quality_keep", "exact_keep",
                     "neardup_keep", "decontam_keep", "gopher_keep",
                     "c4_keep", "para_removed", "q_score", "clf_keep",
                     "cap_keep", "avg_nll", "bucket", "lm_keep", "keep"))

    if persist:
        # one curation DAG, but every ACTION replays it — a caller that
        # reads the report AND the annotated frame (or feeds several
        # downstream phases) pays N× without a materialization point.
        # Opt-in cache; at 100 TB write annotated to parquet instead and
        # read it back (the capstone flow in test_full_corpus_flow.py).
        final = final.persist()
    report = final.agg(
        F.count("*").alias("n_docs"),
        F.sum("pii_clean").alias("n_pii_clean"),
        F.sum("quality_keep").alias("n_quality"),
        F.sum("exact_keep").alias("n_exact"),
        F.sum("neardup_keep").alias("n_neardup"),
        F.sum("decontam_keep").alias("n_decontam"),
        F.sum("gopher_keep").alias("n_gopher"),
        F.sum("c4_keep").alias("n_c4"),
        F.sum("clf_keep").alias("n_clf"),
        F.sum("cap_keep").alias("n_cap"),
        F.sum("lm_keep").alias("n_lm"),
        F.sum("para_removed").alias("n_paras_removed"),
        F.sum("keep").alias("n_kept"),
        F.sum(F.col("keep") * F.col("n_words")).alias("kept_tokens"))
    return final, report


def corpus_datacard(annotated: DataFrame) -> DataFrame:
    """Dataset-card summary of a curated corpus (the numbers an HF-style
    datacard publishes), computed from :func:`curate_corpus`'s annotated
    frame in TWO aggregations (global facets; per-language facets) —
    never a pass per metric. Long form: ``(section, key, value)`` with
    value as double (counts are exact integers in double range).

    Sections: ``size`` (docs/tokens in and kept), ``attrition`` (docs
    removed by each stage, counted independently), ``quality`` (LM
    bucket distribution of the KEPT set), ``language`` (kept docs and
    tokens per language)."""
    g = annotated.agg(
        F.count("*").alias("docs_in"),
        F.sum("n_words").alias("tokens_in"),
        F.sum("keep").alias("docs_kept"),
        F.sum(F.col("keep") * F.col("n_words")).alias("tokens_kept"),
        *[F.sum(1 - F.col(c)).alias(f"drop_{c}")
          for c in ("pii_clean", "quality_keep", "exact_keep",
                    "neardup_keep", "decontam_keep", "gopher_keep",
                    "c4_keep", "clf_keep", "cap_keep", "lm_keep")],
        *[F.sum(F.when(F.col("keep") == 1, 1).otherwise(0) *
                F.when(F.col("bucket") == b, 1).otherwise(0))
          .alias(f"bucket_{b}") for b in ("head", "middle", "tail")]
    ).collect()[0]
    rows = ([("size", k, float(g[f]))
             for k, f in (("docs_in", "docs_in"), ("tokens_in", "tokens_in"),
                          ("docs_kept", "docs_kept"),
                          ("tokens_kept", "tokens_kept"))]
            + [("attrition", c, float(g[f"drop_{c}"]))
               for c in ("pii_clean", "quality_keep", "exact_keep",
                         "neardup_keep", "decontam_keep", "gopher_keep",
                         "c4_keep", "clf_keep", "cap_keep", "lm_keep")]
            + [("quality", f"kept_{b}", float(g[f"bucket_{b}"]))
               for b in ("head", "middle", "tail")])
    lang = (annotated.where(F.col("keep") == 1)
            .groupBy("lang")
            .agg(F.count("*").alias("docs"), F.sum("n_words").alias("toks"))
            .collect())
    for r in sorted(lang, key=lambda r: r.lang):
        rows.append(("language", f"{r.lang}_docs", float(r.docs)))
        rows.append(("language", f"{r.lang}_tokens", float(r.toks)))
    return annotated.sparkSession.createDataFrame(
        rows, "section string, key string, value double")
