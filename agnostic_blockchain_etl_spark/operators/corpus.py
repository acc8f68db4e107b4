"""Corpus-preparation operators: token-window chunking, vocabulary
statistics, TF-IDF term scoring, embedding quantization — the remaining
pre-training data-pipeline stages (BASELINE.json north star), all
JVM-side and DuckDB-oracle-verified.

Scale shapes: chunking is per-row array slicing (no shuffle); vocabulary
and TF-IDF shuffle once on the term; quantization is per-row arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .tables import load_tables, spread

from .registry import make_registry

QUERIES, ORACLES, query = make_registry()


_CHUNK, _STRIDE = 32, 24  # 32-token windows, 8-token overlap

_SQL_WORDS = "string_split_regex(lower(trim(text)), '\\s+')"


_PACK_BUDGET = 128   # tokens per training sequence
_PACK_SHARDS = 8     # parallel packing streams


# chunk -> pack CTE chain, shared by the chunk_pack_documents and
# pack_manifest_rollup oracles (one source of truth for the packing
# arithmetic both gates pin)
_PACK_CTE_SQL = f"""
    words_t AS (
        SELECT doc_id, {_SQL_WORDS} AS words FROM documents),
    chunked AS (
        SELECT doc_id,
               unnest(generate_series(0, CAST(floor((len(words) - 1) / {_STRIDE})
                                              AS BIGINT))) AS chunk_id,
               words
        FROM words_t),
    chunks AS (
        SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
               array_to_string(words[1 + chunk_id * {_STRIDE} :
                                     least(chunk_id * {_STRIDE} + {_CHUNK},
                                           len(words))],
                               ' ')                              AS chunk_text,
               CAST(least(chunk_id * {_STRIDE} + {_CHUNK}, len(words))
                    - chunk_id * {_STRIDE} AS BIGINT)            AS n_tokens
        FROM chunked
        WHERE chunk_id * {_STRIDE} < len(words)),
    pos AS (
        SELECT doc_id, chunk_id, chunk_text, n_tokens,
               doc_id % {_PACK_SHARDS} AS shard,
               CAST(sum(n_tokens) OVER (
                        PARTITION BY doc_id % {_PACK_SHARDS}
                        ORDER BY doc_id, chunk_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) - n_tokens AS start_pos
        FROM chunks)"""


@query("chunk_pack_documents", oracle=f"""
    WITH {_PACK_CTE_SQL}
    SELECT doc_id, chunk_id, chunk_text, n_tokens,
           CAST(shard AS INT)            AS shard,
           start_pos // {_PACK_BUDGET}   AS pack_id,
           start_pos % {_PACK_BUDGET}    AS pack_offset
    FROM pos
""")
def chunk_pack_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate form of `chunk` → `pack_sequences` over the testdata corpus:
    chunk grain with each chunk's (shard, pack_id, pack_offset) training-
    sequence assignment riding along."""
    t = load_tables(spark, sf_dir, ("documents",))
    return pack_sequences(chunk(spread(t["documents"]))).select(
        "doc_id", "chunk_id", "chunk_text", "n_tokens",
        "shard", "pack_id", "pack_offset")


def chunk(docs: DataFrame) -> DataFrame:
    """Sliding token-window chunking (32-token windows, 8-token overlap) —
    the context-window packing stage. Pure per-row array slicing: zero
    shuffle, scales with document count."""
    d = docs.select(
        "doc_id", F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("words"))
    d = d.select(
        "doc_id", "words",
        F.explode(F.sequence(
            F.lit(0),
            F.floor((F.size("words") - 1) / _STRIDE).cast("long"))).alias("chunk_id"))
    start = F.col("chunk_id") * _STRIDE + 1
    n_tok = (F.least(F.col("chunk_id") * _STRIDE + _CHUNK, F.size("words"))
             - F.col("chunk_id") * _STRIDE)
    return (d.where(F.col("chunk_id") * _STRIDE < F.size("words"))
            .select("doc_id", F.col("chunk_id").cast("int").alias("chunk_id"),
                    F.array_join(F.slice(F.col("words"), start, _CHUNK), " ")
                     .alias("chunk_text"),
                    n_tok.cast("long").alias("n_tokens")))


def pack_sequences(chunks: DataFrame, budget: int = _PACK_BUDGET,
                   n_shards: int = _PACK_SHARDS) -> DataFrame:
    """GPT-style sequence packing: concatenate the token stream of chunks
    in deterministic (doc_id, chunk_id) order and cut it into fixed
    ``budget``-token training sequences; each chunk is assigned the pack
    where it starts, with its offset inside that pack. A chunk may
    straddle a pack boundary — that is the standard concat-then-block
    packing (no padding waste), not a bug.

    The running position is a per-SHARD cumulative sum (shard = doc_id %
    n_shards; pack identity = (shard, pack_id)): a single global cumsum
    would serialize on one window partition — the classic scale
    anti-pattern — while per-shard windows pack N independent streams in
    parallel, exactly how a real pipeline packs per output shard. Zero
    joins; one shuffle on shard. Annotates in place: all input columns
    (chunk_text, …) survive, with shard/pack_id/pack_offset appended."""
    w = (Window.partitionBy("shard").orderBy("doc_id", "chunk_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    d = chunks.withColumn("shard",
                          (F.col("doc_id") % n_shards).cast("int"))
    d = d.withColumn("start_pos",
                     F.sum("n_tokens").over(w) - F.col("n_tokens"))
    return (d.withColumn("pack_id", F.expr(f"start_pos div {budget}"))
            .withColumn("pack_offset", F.col("start_pos") % budget)
            # carry the budget with the frame: `pack_manifest`'s spill
            # arithmetic must use the budget the packing actually ran
            # with, not an independently-suppliable duplicate
            .withColumn("pack_budget", F.lit(int(budget)).cast("long"))
            .drop("start_pos"))


def pack_manifest(packed: DataFrame,
                  budget: int | None = None) -> DataFrame:
    """Per-pack rollup of a `pack_sequences` frame — the artifact a
    training DATA LOADER reads: one row per (shard, pack_id) with
    ``n_chunks`` / ``n_docs`` / ``n_tokens`` (tokens STARTING in the
    pack — the last chunk may straddle, see ``spill_tokens`` =
    overhang into the next pack) and ``members``, the offset-ordered
    ``"doc_id:chunk_id:pack_offset:n_tokens"`` strings a loader needs
    to build block-diagonal attention masks / position ids across the
    packed document boundaries. Members are STRING-encoded, not
    structs, deliberately: the manifest round-trips engines and
    manifest files bit-identically (and the value oracle can hash it —
    nested structs normalize differently across drivers).

    Scale: one aggregation keyed by (shard, pack_id) — the same key
    the packing windows already partitioned by; members per pack are
    bounded by budget/min_chunk_tokens, so collect_list is bounded by
    the knob, never by data.

    ``budget``: taken from the frame's own ``pack_budget`` column (a
    `pack_sequences` output always carries it) so the spill arithmetic
    cannot silently desync from the budget the packing actually ran
    with; the explicit parameter exists only for frames from older
    parquet without the column, and passing BOTH is a conflict error
    when they disagree."""
    if "pack_budget" in packed.columns:
        if budget is not None:
            # cheap conflict check: the column is a constant literal
            got = packed.select(F.max("pack_budget")).first()[0]
            if got is not None and int(got) != int(budget):
                raise ValueError(
                    f"budget={budget} conflicts with the frame's own "
                    f"pack_budget={got} (pack_sequences carried it); "
                    "drop the parameter")
        bcol = F.col("pack_budget")
    elif budget is not None:
        bcol = F.lit(int(budget)).cast("long")
    else:
        raise ValueError(
            "frame has no pack_budget column (not a pack_sequences "
            "output?) — pass budget= explicitly")
    mem = F.concat_ws(":", "doc_id", "chunk_id", "pack_offset",
                      "n_tokens")
    return (packed.groupBy("shard", "pack_id")
            .agg(F.count("*").alias("n_chunks"),
                 F.countDistinct("doc_id").alias("n_docs"),
                 F.sum("n_tokens").alias("n_tokens"),
                 F.greatest(
                     F.max(F.col("pack_offset") + F.col("n_tokens")
                           - bcol),
                     F.lit(0).cast("long")).alias("spill_tokens"),
                 F.transform(
                     F.sort_array(F.collect_list(F.struct(
                         F.col("pack_offset").alias("o"),
                         F.col("doc_id").alias("d"),
                         F.col("chunk_id").alias("c"),
                         mem.alias("m")))),
                     lambda x: x["m"]).alias("members")))


@query("pack_manifest_rollup", oracle=f"""
    WITH {_PACK_CTE_SQL},
    assigned AS (
        SELECT doc_id, chunk_id, n_tokens,
               CAST(shard AS INT)          AS shard,
               start_pos // {_PACK_BUDGET} AS pack_id,
               start_pos % {_PACK_BUDGET}  AS pack_offset
        FROM pos)
    SELECT shard, pack_id,
           CAST(count(*) AS BIGINT)               AS n_chunks,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT)          AS n_tokens,
           greatest(CAST(max(pack_offset + n_tokens) AS BIGINT)
                    - {_PACK_BUDGET}, 0)          AS spill_tokens,
           list(doc_id || ':' || chunk_id || ':' || pack_offset
                || ':' || n_tokens
                ORDER BY pack_offset, doc_id, chunk_id) AS members
    FROM assigned GROUP BY shard, pack_id
""")
def pack_manifest_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate form of `pack_manifest` over the chunk → pack chain (the
    oracle reuses `_PACK_CTE_SQL`, the same CTE text
    `chunk_pack_documents` pins, then rolls it up independently —
    offset-ordered member lists value-hashed cross-engine). Registered
    PAST the driver's 50-slot window (see
    ``__spark_entry__._PAST_WINDOW``)."""
    t = load_tables(spark, sf_dir, ("documents",))
    return pack_manifest(pack_sequences(chunk(spread(t["documents"]))))


@query("vocab_tfidf_terms", oracle=f"""
    WITH words_t AS (
        SELECT doc_id, unnest({_SQL_WORDS}) AS word FROM documents),
    tf AS (
        SELECT doc_id, word, count(*) AS tf FROM words_t GROUP BY doc_id, word),
    counts AS (
        SELECT word, CAST(sum(tf) AS BIGINT) AS n,
               CAST(count(*) AS BIGINT) AS df
        FROM tf GROUP BY word),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.word,
               round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / counts.df), 6)
                   AS tfidf
        FROM tf JOIN counts USING (word) CROSS JOIN n),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY doc_id
                   ORDER BY tfidf DESC, word) AS rn
        FROM scored)
    SELECT 'vocab' AS facet, CAST(NULL AS BIGINT) AS doc_id, word, n, df,
           CAST(NULL AS DOUBLE) AS tfidf, CAST(NULL AS INT) AS rank
    FROM (SELECT word, n, df FROM counts ORDER BY n DESC, word LIMIT 100)
    UNION ALL
    SELECT 'tfidf', doc_id, word, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           tfidf, CAST(rn AS INT)
    FROM ranked WHERE rn <= 3
""")
def vocab_tfidf_terms(spark, sf_dir):
    """Vocabulary statistics + TF-IDF keyword extraction off ONE
    tokenization pass: the top-100 vocabulary (term + document
    frequency — the tokenizer-training shape) and the top-3 TF-IDF terms
    per document share the cached (doc, word, tf) aggregate; term totals
    and document frequencies both derive from it (n = Σtf, df = row
    count per word), so the corpus is tokenized exactly once.

    Scale: the only large shuffle is the (doc, word) term-frequency one;
    the df frame is VOCABULARY-sized — zipfian-tailed, not bounded —
    so the scoring join carries no broadcast hint (AQE broadcasts it
    while it fits, falls back to a word-keyed shuffle of the already
    word-keyed tf past the threshold; a forced broadcast of a web-scale
    token vocabulary would blow the 8 GB broadcast cap — review
    finding). Only the 1-row N frame is hint-broadcast. The vocabulary
    top-k is a TakeOrdered, not a global sort."""
    from .dedup import _scoped_cache
    t = load_tables(spark, sf_dir, ("documents",))
    # healing shuffle keyed by doc_id (r11): the tf aggregation below is
    # clustered by it, so its (doc_id, word) exchange disappears — words
    # of a document are co-partitioned either way, the exchange moved
    # already-collapsed rows
    words = spread(t["documents"], "doc_id").select(
        "doc_id", F.explode(
            F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("word"))
    tf = _scoped_cache(
        words.groupBy("doc_id", "word").agg(F.count("*").alias("tf")))
    counts = tf.groupBy("word").agg(
        F.sum("tf").cast("long").alias("n"),
        F.count("*").cast("long").alias("df"))
    vocab = (counts.orderBy(F.col("n").desc(), "word").limit(100)
             .select(F.lit("vocab").alias("facet"),
                     F.lit(None).cast("long").alias("doc_id"),
                     "word", "n", "df",
                     F.lit(None).cast("double").alias("tfidf"),
                     F.lit(None).cast("int").alias("rank")))
    n_docs = t["documents"].agg(F.count("*").alias("n_docs"))
    scored = (tf.join(counts.select("word", "df"), "word")
              .crossJoin(F.broadcast(n_docs))
              .select("doc_id", "word",
                      F.round(F.col("tf") * F.log(
                          F.col("n_docs").cast("double") / F.col("df")), 6)
                       .alias("tfidf")))
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "word")
    ranked = (scored.withColumn("rank", F.row_number().over(w))
              .where(F.col("rank") <= 3)
              .select(F.lit("tfidf").alias("facet"), "doc_id", "word",
                      F.lit(None).cast("long").alias("n"),
                      F.lit(None).cast("long").alias("df"),
                      "tfidf", F.col("rank").cast("int").alias("rank")))
    return vocab.unionByName(ranked)


@query("emb_quantize_centroid_facets", oracle="""
    WITH emb AS (SELECT vec_id, label,
                        CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    scaled AS (
        SELECT vec_id, label, e,
               127.0 / list_max(list_transform(e, x -> abs(x))) AS scale
        FROM emb),
    expanded AS (
        SELECT label, dim, e[dim] AS v,
               CAST(floor(e[dim] * scale + 0.5) AS BIGINT) AS q
        FROM scaled CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS dim))
    SELECT label, CAST(dim AS INT) AS dim,
           round(avg(v), 6)              AS centroid_v,
           CAST(sum(q) AS BIGINT)        AS sum_q,
           CAST(count(*) AS BIGINT)      AS n
    FROM expanded GROUP BY label, dim
""")
def emb_quantize_centroid_facets(spark, sf_dir):
    """Symmetric int8 quantization (max-abs scaling, the storage/serving
    compression stage) and per-label centroids (the aggregation shape of
    IVF list training) in ONE gate row (consolidating the r1-r3
    ``embedding_quantize_int8`` + ``emb_label_centroids`` rows; both
    stay value-pinned — ``sum_q`` is the exact integer sum of every
    vector's int8 codes per (label, dim), so any per-vector quantization
    change flips it). floor(x+0.5) rounding is spelled out so both
    engines use identical IEEE ops.

    Scale: per-row arithmetic for the quantization (no shuffle), then
    one shuffle keyed (label, dim) with partial aggregation — centroid
    training over billions of vectors stays a single pass."""
    t = load_tables(spark, sf_dir, ("embeddings",))
    emb = t["embeddings"].select(
        "label", F.col("embedding").cast("array<double>").alias("e"))
    scaled = emb.withColumn(
        "scale", 127.0 / F.array_max(F.transform("e", lambda x: F.abs(x))))
    return (scaled.select("label", "scale", F.posexplode("e"))
            .select("label", (F.col("pos") + 1).cast("int").alias("dim"),
                    F.col("col").alias("v"),
                    F.floor(F.col("col") * F.col("scale") + 0.5)
                     .cast("long").alias("q"))
            .groupBy("label", "dim")
            .agg(F.round(F.avg("v"), 6).alias("centroid_v"),
                 F.sum("q").cast("long").alias("sum_q"),
                 F.count("*").alias("n")))


_SAMPLE_RATES = {"en": 60, "es": 45, "de": 45, "fr": 25}  # keep-% per stratum
_RATE_CASE_SQL = ("CASE lang " + " ".join(
    f"WHEN '{k}' THEN {v}" for k, v in _SAMPLE_RATES.items()) + " ELSE 0 END")


def _sql_salted_h60(salt: str) -> str:
    """DuckDB twin of `_salted_h60` — doc_id-keyed form of
    `hashing.sql_keyed_h60` (the version-stability war story lives
    there; every salted-hash oracle must use that form)."""
    from .hashing import sql_keyed_h60
    return sql_keyed_h60(f"'{salt}'", "CAST(doc_id AS VARCHAR)")


def _salted_h60(salt: str):
    """THE deterministic-sampling primitive: 60-bit md5 hash of
    salt||doc_id as a Spark column. Every sampling decision in this
    module (stratified buckets, splits, A-Res uniforms, source caps)
    derives from it so membership is a pure, layout-independent
    function of doc_id. The hash algebra itself is single-sourced in
    `hashing.keyed_h60` (generalized to any key column — bloom
    positions and training order hash through the same primitive);
    do not re-inline EITHER form (the review found five hand-rolled
    copies drifting apart)."""
    from .hashing import keyed_h60
    return keyed_h60(salt, F.col("doc_id").cast("string"))


def _salted_bucket(salt: str, mod: int):
    return _salted_h60(salt) % mod


def _salted_u60(salt: str):
    """Uniform draw u ∈ (0, 1] as a pure hash of doc_id — the A-Res /
    Pareto / Gumbel sampling primitive (`weighted_sample`,
    `quality.quality_pareto_keep`, `dsir.dsir_sample` all draw through
    here; the +1 keeps u strictly positive for ln(u))."""
    return (_salted_h60(salt) + 1) / F.lit(_TWO60)


_CAP_HASH_SQL = _sql_salted_h60("sourcecap:")
_CAP = 15
_WSAMPLE_K = 200
_TWO60 = float(1 << 60)


@query("corpus_sampling_facets", oracle=f"""
    WITH base AS (
        SELECT doc_id, lang, source,
               {_sql_salted_h60('sample:')} % 100 AS sample_bucket,
               {_sql_salted_h60('split:')} % 10  AS split_bucket,
               CAST(1 + len(list_distinct({_SQL_WORDS})) AS DOUBLE)
                   / (1 + len({_SQL_WORDS}))             AS w,
               ({_sql_salted_h60('wsample:')} + 1)
                   / {_TWO60!r}                          AS u,
               {_CAP_HASH_SQL}                             AS caph
        FROM documents),
    topk AS (SELECT doc_id FROM base ORDER BY ln(u) / w DESC, doc_id
             LIMIT {_WSAMPLE_K}),
    cap AS (SELECT doc_id,
                   CASE WHEN row_number() OVER (PARTITION BY source
                                                ORDER BY caph, doc_id)
                             <= {_CAP} THEN 1 ELSE 0 END AS cap_keep
            FROM base)
    SELECT b.doc_id, b.lang,
           CAST(b.sample_bucket AS INT) AS sample_bucket,
           CASE WHEN b.sample_bucket < ({_RATE_CASE_SQL})
                THEN 1 ELSE 0 END       AS strat_keep,
           CASE WHEN b.split_bucket < 8 THEN 'train'
                WHEN b.split_bucket = 8 THEN 'val'
                ELSE 'test' END         AS split,
           round(b.w, 6)                AS weight,
           CASE WHEN t.doc_id IS NOT NULL THEN 1 ELSE 0 END AS topk_keep,
           c.cap_keep                   AS cap_keep
    FROM base b LEFT JOIN topk t USING (doc_id)
    JOIN cap c ON b.doc_id = c.doc_id
""")
def corpus_sampling_facets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every deterministic-sampling decision of the training-data
    pipeline as one per-document flag frame (consolidating the r1-r3
    ``corpus_stratified_sample`` + ``weighted_sample_topk`` gate rows
    and adding the per-source frequency cap — all value-pinned):

    - ``strat_keep``/``split``: hash-stratified per-language sampling +
      80/10/10 split (`stratified_sample` semantics);
    - ``weight``/``topk_keep``: Efraimidis-Spirakis A-Res weighted
      sampling without replacement, k = 200, lexical-diversity weight
      (`weighted_sample` — selection planned as TakeOrderedAndProject);
    - ``cap_keep``: exact per-source frequency cap at 15
      (`sourcecap.source_cap` — the C4/FineWeb hot-domain guard).

    Every decision is a pure function of doc_id (md5, per-purpose salt:
    'sample:'/'split:'/'wsample:'/'sourcecap:'), so membership is
    reproducible across runs/engines/partitionings and new corpus rows
    never reshuffle old ones. Scale: per-row hashing (zero shuffle),
    one top-k heap, one per-source rank (salt-bucketable for hot
    domains — see `source_cap`), one broadcast-sized membership join
    (the top-k frame is k rows)."""
    from .sourcecap import source_cap
    t = load_tables(spark, sf_dir, ("documents",))
    docs = t["documents"]

    words = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    w = ((F.lit(1) + F.size(F.array_distinct(words))).cast("double")
         / (F.lit(1) + F.size(words)))
    rate = F.coalesce(*([F.when(F.col("lang") == k, F.lit(v))
                         for k, v in _SAMPLE_RATES.items()] + [F.lit(0)]))
    base = docs.select(
        "doc_id", "lang", "source", w.alias("w"),
        _salted_bucket("sample:", 100).cast("int").alias("sample_bucket"),
        _salted_bucket("split:", 10).alias("split_bucket"),
        rate.alias("rate"))
    topk = (weighted_sample(docs.withColumn("w", w), "w", _WSAMPLE_K)
            .select("doc_id", F.lit(1).alias("topk_keep")))
    cap = source_cap(docs.select("doc_id", "source"), _CAP) \
        .select("doc_id", "cap_keep")
    return (base
            .join(F.broadcast(topk), "doc_id", "left")
            .join(cap, "doc_id")
            .select("doc_id", "lang", "sample_bucket",
                    (F.col("sample_bucket") < F.col("rate")).cast("int")
                     .alias("strat_keep"),
                    F.when(F.col("split_bucket") < 8, "train")
                     .when(F.col("split_bucket") == 8, "val")
                     .otherwise("test").alias("split"),
                    F.round("w", 6).alias("weight"),
                    F.coalesce("topk_keep", F.lit(0)).alias("topk_keep"),
                    "cap_keep"))


def stratified_sample(docs: DataFrame,
                      rates: dict[str, int] | None = None) -> DataFrame:
    """The DataFrame form of `corpus_stratified_sample`: sample any frame
    with ``doc_id``/``lang`` columns at the given keep-percent per
    stratum. Membership is a pure function of doc_id — the layout-
    independence is pinned by
    tests/test_llm_ops.py::test_membership_survives_repartitioning."""
    rates = rates if rates is not None else _SAMPLE_RATES

    rate = F.coalesce(*([F.when(F.col("lang") == k, F.lit(v))
                         for k, v in rates.items()] + [F.lit(0)]))
    d = docs.select(
        "doc_id", "lang",
        _salted_bucket("sample:", 100).alias("sample_bucket"),
        _salted_bucket("split:", 10).alias("split_bucket"))
    return (d.where(F.col("sample_bucket") < rate)
            .select("doc_id", "lang",
                    F.col("sample_bucket").cast("int").alias("sample_bucket"),
                    F.when(F.col("split_bucket") < 8, "train")
                     .when(F.col("split_bucket") == 8, "val")
                     .otherwise("test").alias("split")))


def weighted_sample(docs: DataFrame, weight_col: str, k: int) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis–
    Spirakis A-Res): each row draws u ∈ (0,1] as a pure hash of doc_id
    and gets priority ln(u)/w — the order statistic of the textbook key
    u^(1/w) — and the k largest priorities are the sample. Inclusion
    probability is proportional to weight, membership is reproducible
    across runs/engines/partitionings (no ``rand()``), and new corpus
    rows never re-draw old ones — the same properties
    `stratified_sample` guarantees, now with continuous weights (quality
    scores, importance weights).

    Scale: zero shuffle for scoring; selection is a global top-k, which
    Spark plans as TakeOrderedAndProject — per-partition heaps of k rows
    merged on the driver, never a full sort. The priority itself is
    dropped from the output: it exists only to order the heap."""
    u = _salted_u60("wsample:")
    priority = F.log(u) / F.col(weight_col)
    return (docs.withColumn("__priority", priority)
            .orderBy(F.col("__priority").desc(), "doc_id")
            .limit(k)
            .drop("__priority"))


_SHARD_N, _SHARD_BUCKETS = 8, 64


@query("shard_assign_balanced", oracle=f"""
    WITH b AS (
        SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
               CAST({_sql_salted_h60("shard:")} % {_SHARD_BUCKETS} AS INT)
                   AS bucket
        FROM documents),
    t AS (SELECT bucket, SUM(weight) AS w FROM b GROUP BY bucket),
    a AS (SELECT bucket,
                 COALESCE(SUM(w) OVER (ORDER BY bucket
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING), 0)  AS cumb,
                 SUM(w) OVER ()                 AS tot
          FROM t),
    m AS (SELECT bucket,
                 CAST(LEAST({_SHARD_N - 1},
                      CASE WHEN tot > 0 THEN (cumb * {_SHARD_N}) // tot
                           ELSE 0 END) AS INT) AS shard
          FROM a)
    SELECT b.doc_id, b.weight, m.shard
    FROM b JOIN m USING (bucket)
""")
def shard_assign_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate row for `shards.balanced_shard_assign` (round-7 verdict ask
    #3 — the operator that decides what a training job actually reads
    was the last pytest-only, oracle-expressible surface): per-document
    token-balanced shard ids over the corpus, verified value-for-value
    by the DuckDB twin. Uses the ``range`` strategy (cumulative packing
    — closed-form window arithmetic, so the twin reproduces the
    assignment exactly) over the portable salted md5-nibble bucket
    hash (`_salted_h60` — xxhash64 has no cross-engine twin). The LPT
    strategy shares every stage but the final greedy placement; its
    balance property is pytest-pinned (tests/test_shards.py)."""
    from .shards import balanced_shard_assign
    t = load_tables(spark, sf_dir, ("documents",))
    d = (t["documents"]
         .select("doc_id", F.col("n_chars").cast("long").alias("weight"))
         .withColumn("bucket",
                     (_salted_h60("shard:") % _SHARD_BUCKETS)
                     .cast("int")))
    out = balanced_shard_assign(d, "weight", _SHARD_N, key_col="doc_id",
                                n_buckets=_SHARD_BUCKETS,
                                strategy="range", bucket_col="bucket")
    return out.select("doc_id", "weight", "shard")


# target shares chosen binary-exact (0.5/0.25/0.125) so the Python-side
# normalization in mixture_weights and the SQL literals are the same
# doubles; 'es' is deliberately untargeted (rate-0 path under the gate)
_MIX_TARGET = {"en": 0.5, "zh": 0.25, "de": 0.125, "fr": 0.125}
_MIX_TGT_SQL = ("CASE stratum " + " ".join(
    f"WHEN '{k}' THEN CAST({v} AS DOUBLE)"
    for k, v in _MIX_TARGET.items()) + " ELSE CAST(0 AS DOUBLE) END")
_MIX_HASH_SQL = _sql_salted_h60("mixture:")
_TMIX_HASH_SQL = _sql_salted_h60("tempmix:")

# epoch multipliers for the upsample gate: 2.3 (2 copies + 30% of a
# third), 1.0 (integer boundary: frac 0, u>0 strictly -> exactly 1),
# 0.5 (pure-fractional = apply_mixture_rates semantics), 1.75
# (binary-exact frac). 'es' absent -> emits nothing. Every rate is
# CAST AS DOUBLE in the SQL: a bare 2.3 is DECIMAL in DuckDB, whose
# exact 0.3 fraction would disagree with the double boundary
# 0.2999999999999998 both engines otherwise share.
_EPOCH_RATES = {"en": 2.3, "zh": 1.0, "de": 0.5, "fr": 1.75}
_EPOCH_RATE_SQL = ("CASE lang " + " ".join(
    f"WHEN '{k}' THEN CAST({v} AS DOUBLE)"
    for k, v in _EPOCH_RATES.items()) + " ELSE CAST(0 AS DOUBLE) END")


@query("epoch_upsample", oracle=f"""
    WITH r AS (
        SELECT doc_id, lang, {_EPOCH_RATE_SQL} AS rate,
               ({_sql_salted_h60('epoch:')} + 1)
                   / 1152921504606846976.0      AS u
        FROM documents),
    c AS (
        SELECT doc_id, lang,
               CAST(floor(rate) AS INT)
               + CASE WHEN u <= rate - floor(rate) THEN 1 ELSE 0 END
                   AS copies
        FROM r)
    SELECT doc_id, lang,
           CAST(unnest(generate_series(1, copies)) AS INT) AS epoch
    FROM c WHERE copies > 0
""")
def epoch_upsample_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate form of `mixture.epoch_upsample` (mixture rates ABOVE 1 —
    the repetition pass): per-document copy counts AND 1-based epoch
    indices value-verified cross-engine, covering the integer boundary
    (zh ×1.0: frac 0, u > 0 strictly → exactly one copy), the
    pure-fractional r < 1 case (de ×0.5 ≡ `apply_mixture_rates`), a
    non-binary-exact fraction (en ×2.3) and a binary-exact one
    (fr ×1.75); 'es' has no rate → emits nothing. Registered PAST the
    driver's 50-slot window (see ``__spark_entry__._PAST_WINDOW``)."""
    from .mixture import epoch_upsample
    t = load_tables(spark, sf_dir, ("documents",))
    return epoch_upsample(t["documents"].select("doc_id", "lang"),
                          _EPOCH_RATES)


@query("mixture_apply", oracle=f"""
    WITH d AS (
        SELECT doc_id, lang,
               CASE WHEN doc_id % 29 = 0 THEN NULL ELSE text END AS text
        FROM documents),
    tok AS (
        SELECT doc_id, lang,
               CASE WHEN text IS NULL THEN 0
                    ELSE len(string_split_regex(trim(text), '\\s+')) END AS t
        FROM d),
    per AS (
        SELECT lang AS stratum, CAST(SUM(t) AS BIGINT) AS n_tokens
        FROM tok GROUP BY 1),
    shares AS (
        SELECT stratum, n_tokens,
               CASE WHEN CAST(SUM(n_tokens) OVER () AS BIGINT) > 0
                    THEN n_tokens / CAST(SUM(n_tokens) OVER () AS BIGINT)
                    ELSE CAST(0 AS DOUBLE) END AS share,
               {_MIX_TGT_SQL} AS tgt
        FROM per),
    bottleneck AS (
        SELECT stratum, n_tokens, share, tgt,
               MIN(CASE WHEN tgt > 0 AND share > 0
                        THEN share / tgt END) OVER ()           AS m,
               MIN(CASE WHEN share > 0
                        THEN share / sqrt(share) END) OVER ()   AS tm
        FROM shares),
    plan AS (
        SELECT stratum, n_tokens,
               round(CASE WHEN tgt > 0 AND share > 0
                          THEN tgt / share * m
                          ELSE CAST(0 AS DOUBLE) END, 6) AS rate,
               round(CASE WHEN share > 0
                          THEN sqrt(share) / share * tm
                          ELSE CAST(0 AS DOUBLE) END, 6) AS temp_rate
        FROM bottleneck)
    SELECT d.doc_id, d.lang, p.n_tokens, p.rate, p.temp_rate,
           CASE WHEN ({_MIX_HASH_SQL} + 1) / 1152921504606846976.0
                     <= COALESCE(p.rate, CAST(0 AS DOUBLE))
                THEN 1 ELSE 0 END AS mix_keep,
           CASE WHEN ({_TMIX_HASH_SQL} + 1) / 1152921504606846976.0
                     <= COALESCE(p.temp_rate, CAST(0 AS DOUBLE))
                THEN 1 ELSE 0 END AS temp_keep
    FROM d JOIN plan p ON d.lang = p.stratum
""")
def mixture_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate row for the WHOLE mixture planner family (round-8 verdict
    ask #1 — the operators deciding the FINAL corpus composition a
    training job reads were the last pytest-only, oracle-expressible
    surface): `mixture.mixture_weights` AND
    `mixture.temperature_mixture` (alpha=0.5, the canonical
    flattening temperature), each pushed through
    `mixture.apply_mixture_rates` end-to-end, per-document keep
    decisions value-verified by the DuckDB twin. The explicit target
    is a binary-exact 50/25/12.5/12.5 mix over en/zh/de/fr ('es' stays
    untargeted → rate 0, every row annotated, none dropped; the
    temperature facet covers es with a positive rate — both plan
    regimes on every row), and every 29th document's text is nulled so
    the null-text → 0-token path runs under the full value oracle
    inside satisfiable strata. Cross-engine exactness of the
    temperature rates comes from the Z-free rate algebra +
    correctly-rounded sqrt (see `temperature_mixture`); membership
    rides the portable salted md5-nibble hash (`_salted_u60`) under
    two independent salts, so every keep decision is a pure function
    of doc_id on both engines."""
    from .mixture import (apply_mixture_rates, mixture_weights,
                          stratum_counts, temperature_mixture)
    t = load_tables(spark, sf_dir, ("documents",))
    d = t["documents"].select(
        "doc_id", "lang",
        F.when(F.col("doc_id") % 29 == 0,
               F.lit(None).cast("string"))
         .otherwise(F.col("text")).alias("text"))
    counts = stratum_counts(d)     # ONE corpus aggregation, two plans
    plan = mixture_weights(d, _MIX_TARGET, counts=counts)
    tplan = temperature_mixture(d, 0.5, counts=counts)
    # chain the two REAL apply passes column-wise (no doc_id self-join:
    # each apply is a broadcast of its |strata|-row plan — the corpus
    # is still scanned exactly once, pinned by test_plan_shapes)
    ann = apply_mixture_rates(d, plan) \
        .withColumnRenamed("mix_keep", "__target_keep")
    ann = apply_mixture_rates(ann, tplan, salt="tempmix:") \
        .withColumnRenamed("mix_keep", "temp_keep") \
        .withColumnRenamed("__target_keep", "mix_keep")
    return (ann.join(F.broadcast(plan.select(
                F.col("stratum").alias("lang"), "n_tokens", "rate")),
                "lang")
            .join(F.broadcast(tplan.select(
                F.col("stratum").alias("lang"),
                F.col("rate").alias("temp_rate"))), "lang")
            .select("doc_id", "lang", "n_tokens", "rate", "temp_rate",
                    "mix_keep", "temp_keep"))


def token_budget_cap(docs: DataFrame, budget: int | dict[str, int],
                     strat_col: str = "lang", text_col: str = "text",
                     salt: str = "budget:",
                     n_buckets: int = 256,
                     eligible_col: str | None = None,
                     tokens_col: str | None = None) -> DataFrame:
    """EXACT per-stratum token-budget selection — "take N tokens of
    each language/domain" (the absolute-count companion to the
    mixture planners' proportional rates; compose them as plan rates
    → budget caps for a recipe like "web:code 5:3, at most 1T tokens
    each"): keep documents in deterministic salted-hash order while
    the stratum's running token total stays ≤ its budget. Membership
    is a pure function of doc_id (never ``rand()``, same contract as
    `stratified_sample`), so re-runs, engines, and partitionings
    agree, and the kept set is the maximal hash-order prefix within
    budget — adding corpus never reshuffles old decisions below the
    boundary. Documents in strata without a budget entry keep 0
    (flag-don't-drop, ``budget_keep``). A NULL stratum is a stratum
    like any other (the offsets join is null-safe): under a scalar
    budget it gets its own cap; under a dict budget it has no entry so
    its rows flag 0 — never dropped, matching the NULL tolerance of
    the rest of the composition pipeline (`stratum_counts` groups
    NULL, `apply_mixture_rates` left-joins).

    Scale shape (the `balanced_shard_assign` range trick, reused):
    a naive ``SUM OVER (PARTITION BY stratum ORDER BY hash)`` makes
    every stratum ONE window partition — a single-task hotspot at
    corpus scale. Instead the hash's top bits split each stratum into
    ``n_buckets`` contiguous hash ranges: per-(stratum, bucket) token
    sums (a ≤ |strata|×n_buckets summary) take a tiny windowed prefix
    per stratum, broadcast back as offsets, and the per-row running
    sum windows over (stratum, bucket) — every window partition holds
    ~1/n_buckets of a stratum, bounded by the knob. Exact integer
    arithmetic end-to-end: offset + within-bucket prefix equals the
    global prefix because buckets are monotone in the hash and ties
    break on doc_id — verified value-for-value against the one-level
    window formulation in DuckDB (`token_budget_prefix` oracle pair).

    ``eligible_col``: an int flag column (e.g. a curation ``keep`` or
    mixture ``mix_keep`` conjunction) — ineligible rows contribute 0
    tokens to the running totals and always get ``budget_keep`` 0, so
    budgets cap only what upstream stages kept, with ZERO extra joins
    (the flag rides the same projection; see
    `mixture.compose_corpus_mix`).

    ``tokens_col``: cap on a precomputed token-count column (real
    tokenizer counts) instead of the whitespace default — resolved
    through `mixture._token_expr`, the same definition the planners
    use, so a plan-then-cap recipe can never disagree about what a
    token is."""
    if n_buckets & (n_buckets - 1) or n_buckets <= 0:
        raise ValueError(f"n_buckets must be a power of two,"
                         f" got {n_buckets}")
    shift = 60 - n_buckets.bit_length() + 1   # h>>shift ∈ [0, n_buckets)
    if isinstance(budget, dict):
        bmap = F.create_map(*[F.lit(x) for kv in budget.items()
                              for x in (kv[0], int(kv[1]))])
        bexpr = F.coalesce(bmap[F.col(strat_col)].cast("long"),
                           F.lit(0).cast("long"))
    else:
        bexpr = F.lit(int(budget)).cast("long")
    # token semantics single-sourced with the mixture planners (null
    # text counts 0), so "plan a mix, then cap its token budgets"
    # composes without drift
    from .mixture import _token_expr
    h = _salted_h60(salt)
    tokens = _token_expr(text_col, tokens_col)
    if eligible_col is not None:
        tokens = F.when(F.col(eligible_col) == 1, tokens) \
                  .otherwise(F.lit(0).cast("long"))
    d = docs.withColumn("__t", tokens) \
            .withColumn("__h", h) \
            .withColumn("__b", F.shiftright("__h", shift).cast("int"))
    sums = (d.groupBy(F.col(strat_col).alias("__s"), "__b")
            .agg(F.sum("__t").alias("__bt")))
    woff = Window.partitionBy("__s").orderBy("__b") \
                 .rowsBetween(Window.unboundedPreceding, -1)
    offsets = sums.select(
        "__s", F.col("__b").alias("__ob"),
        F.coalesce(F.sum("__bt").over(woff), F.lit(0)).alias("__off"))
    wrow = Window.partitionBy(strat_col, "__b") \
                 .orderBy("__h", "doc_id") \
                 .rowsBetween(Window.unboundedPreceding, 0)
    return (d.join(F.broadcast(offsets),
                   F.col(strat_col).eqNullSafe(F.col("__s"))
                   & (F.col("__b") == F.col("__ob")))
            .withColumn("__cum", F.col("__off") + F.sum("__t").over(wrow))
            .withColumn("budget_keep",
                        ((F.col("__cum") <= bexpr)
                         & ((F.col(eligible_col) == 1)
                            if eligible_col is not None else F.lit(True)))
                        .cast("int"))
            .drop("__t", "__h", "__b", "__ob", "__s", "__off", "__cum"))


_BUDGETS = {"en": 3000, "zh": 2000, "de": 1000, "fr": 1000}
_BUDGET_SQL = ("CASE lang " + " ".join(
    f"WHEN '{k}' THEN {v}" for k, v in _BUDGETS.items()) + " ELSE 0 END")


@query("token_budget_prefix", oracle=f"""
    WITH tok AS (
        SELECT doc_id, lang,
               CAST(CASE WHEN text IS NULL THEN 0
                    ELSE len(string_split_regex(trim(text), '\\s+'))
                    END AS BIGINT)          AS n_tokens,
               {_sql_salted_h60("budget:")} AS h
        FROM documents),
    c AS (
        SELECT doc_id, lang, n_tokens,
               SUM(n_tokens) OVER (PARTITION BY lang ORDER BY h, doc_id
                                   ROWS UNBOUNDED PRECEDING) AS cum
        FROM tok)
    SELECT doc_id, lang, n_tokens,
           CASE WHEN cum <= {_BUDGET_SQL} THEN 1 ELSE 0 END AS budget_keep
    FROM c
""")
def token_budget_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle pair for `token_budget_cap` — the DuckDB twin is the
    NAIVE one-level formulation (one window per stratum over the whole
    corpus, exactly what the operator refuses to plan at scale), so
    the hash-verified equality proves the two-level bucketed prefix
    computes the identical keep set while its window partitions stay
    bounded by the n_buckets knob. Registered PAST the driver's
    50-slot gate window (the local harness checks every registered
    pair; see ``__spark_entry__._PAST_WINDOW``); 'es' deliberately has
    no budget → all its rows flagged 0, none dropped."""
    t = load_tables(spark, sf_dir, ("documents",))
    d = t["documents"].select("doc_id", "lang", "text")
    out = token_budget_cap(d, _BUDGETS)
    from .mixture import _n_tokens
    return out.select("doc_id", "lang",
                      _n_tokens("text").cast("long").alias("n_tokens"),
                      "budget_keep")


@query("compose_mix_budget", oracle=f"""
    WITH d AS (
        SELECT doc_id, lang, text,
               CASE WHEN doc_id % 4 = 0 THEN 0 ELSE 1 END AS keep
        FROM documents),
    tok AS (
        SELECT doc_id, lang, keep,
               CAST(CASE WHEN text IS NULL THEN 0
                    ELSE len(string_split_regex(trim(text), '\\s+'))
                    END AS BIGINT)            AS t,
               {_MIX_HASH_SQL}                AS hm,
               {_sql_salted_h60("budget:")}   AS hb
        FROM d),
    per AS (
        SELECT lang AS stratum,
               CAST(SUM(CASE WHEN keep = 1 THEN t ELSE 0 END) AS BIGINT)
                   AS n_tokens
        FROM tok GROUP BY 1),
    shares AS (
        SELECT stratum, n_tokens,
               CASE WHEN CAST(SUM(n_tokens) OVER () AS BIGINT) > 0
                    THEN n_tokens / CAST(SUM(n_tokens) OVER () AS BIGINT)
                    ELSE CAST(0 AS DOUBLE) END AS share,
               {_MIX_TGT_SQL} AS tgt
        FROM per),
    bott AS (
        SELECT stratum, share, tgt,
               MIN(CASE WHEN tgt > 0 AND share > 0
                        THEN share / tgt END) OVER () AS m
        FROM shares),
    plan AS (
        SELECT stratum,
               round(CASE WHEN tgt > 0 AND share > 0
                          THEN tgt / share * m
                          ELSE CAST(0 AS DOUBLE) END, 6) AS rate
        FROM bott),
    app AS (
        SELECT k.doc_id, k.lang, k.keep, k.t, k.hb, p.rate,
               CASE WHEN (k.hm + 1) / 1152921504606846976.0
                         <= COALESCE(p.rate, CAST(0 AS DOUBLE))
                    THEN 1 ELSE 0 END AS mix_keep
        FROM tok k JOIN plan p ON k.lang = p.stratum),
    cum AS (
        SELECT *, keep * mix_keep AS e,
               SUM(CASE WHEN keep * mix_keep = 1 THEN t ELSE 0 END)
                   OVER (PARTITION BY lang ORDER BY hb, doc_id
                         ROWS UNBOUNDED PRECEDING) AS c
        FROM app)
    SELECT doc_id, lang, rate, keep, mix_keep,
           CASE WHEN e = 1 AND c <= {_BUDGET_SQL} THEN 1 ELSE 0 END
               AS budget_keep,
           keep * mix_keep
               * (CASE WHEN e = 1 AND c <= {_BUDGET_SQL}
                       THEN 1 ELSE 0 END) AS final_keep
    FROM cum
""")
def compose_mix_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle pair for `mixture.compose_corpus_mix` — the whole
    composition phase as ONE verified conjunction, not just its
    pieces: a synthetic curation verdict (``keep`` = doc_id % 4 != 0)
    stands in for `curate_corpus`'s conjunction, the mixture plan is
    computed over the SURVIVORS only (the twin's per-stratum token
    sums are keep-conditional — a raw-corpus plan would differ exactly
    where the filter bites), ``mix_keep`` applies the plan to every
    row, and the token budgets cap only ``keep × mix`` survivors
    (`token_budget_cap`'s ``eligible_col``: ineligible rows cost 0 in
    the running totals and flag 0 — the twin's conditional window
    SUM). ``final_keep`` is the full product. Registered past the
    50-slot gate window (``__spark_entry__._PAST_WINDOW``)."""
    from .mixture import compose_corpus_mix
    t = load_tables(spark, sf_dir, ("documents",))
    d = t["documents"].select(
        "doc_id", "lang", "text",
        (F.col("doc_id") % 4 != 0).cast("int").alias("keep"))
    # report_realized=False: the gate only reads the PLAN's rate
    # column — the realized aggregation would recompute the whole
    # composed-output DAG just for join-row membership (r11 opt
    # round). The plan covers every stratum with keep=1 survivors;
    # the oracle's inner join against its own plan CTE has exactly
    # that membership, so the emitted rows are unchanged.
    out, report = compose_corpus_mix(d, target=_MIX_TARGET,
                                     token_budgets=_BUDGETS,
                                     report_realized=False)
    return (out.join(F.broadcast(report.select(
                F.col("stratum").alias("lang"), "rate")), "lang")
            .select("doc_id", "lang", "rate", "keep", "mix_keep",
                    "budget_keep", "final_keep"))


# the MIXED-regime gate target (binary-exact shares summing to exactly
# 1.0, so the Python normalization is a no-op and the SQL literals are
# the same doubles): at the gate corpus's shares, en lands BELOW 1
# (downsampled) while zh/de/fr land ABOVE 1 (epoch-repeated) under the
# token-preserving anchor; 'es' is untargeted (rate-0 path)
_EPOCH_MIX_TARGET = {"en": 0.25, "zh": 0.375, "de": 0.1875, "fr": 0.1875}
_EPOCH_MIX_TGT_SQL = ("CASE stratum " + " ".join(
    f"WHEN '{k}' THEN CAST({v} AS DOUBLE)"
    for k, v in _EPOCH_MIX_TARGET.items()) + " ELSE CAST(0 AS DOUBLE) END")


@query("compose_mix_epochs", oracle=f"""
    WITH d AS (
        SELECT doc_id, lang, text,
               CASE WHEN doc_id % 4 = 0 THEN 0 ELSE 1 END AS keep
        FROM documents),
    tok AS (
        SELECT doc_id, lang, keep,
               CAST(CASE WHEN text IS NULL THEN 0
                    ELSE len(string_split_regex(trim(text), '\\s+'))
                    END AS BIGINT)            AS t,
               {_MIX_HASH_SQL}                AS hm
        FROM d),
    per AS (
        SELECT lang AS stratum,
               CAST(SUM(CASE WHEN keep = 1 THEN t ELSE 0 END) AS BIGINT)
                   AS n_tokens
        FROM tok GROUP BY 1),
    shares AS (
        SELECT stratum, n_tokens,
               CASE WHEN CAST(SUM(n_tokens) OVER () AS BIGINT) > 0
                    THEN n_tokens / CAST(SUM(n_tokens) OVER () AS BIGINT)
                    ELSE CAST(0 AS DOUBLE) END AS share,
               {_EPOCH_MIX_TGT_SQL} AS tgt
        FROM per),
    plan AS (
        SELECT stratum,
               round(CASE WHEN tgt > 0 AND share > 0
                          THEN tgt / share
                          ELSE CAST(0 AS DOUBLE) END, 6) AS rate
        FROM shares),
    app AS (
        SELECT k.doc_id, k.lang, k.keep, p.rate,
               CAST(floor(p.rate) AS INT)
               + CASE WHEN (k.hm + 1) / 1152921504606846976.0
                           <= p.rate - floor(p.rate)
                      THEN 1 ELSE 0 END AS copies
        FROM tok k JOIN plan p ON k.lang = p.stratum),
    ex AS (
        SELECT doc_id, lang, rate, keep,
               CASE WHEN copies > 0 THEN 1 ELSE 0 END AS mix_keep,
               unnest(generate_series(
                   1, CASE WHEN keep = 1 AND rate > 1 THEN copies
                           ELSE 1 END)) AS epoch
        FROM app)
    SELECT doc_id, lang, rate, keep, mix_keep,
           CAST(epoch AS INT) AS epoch,
           keep * mix_keep AS final_keep
    FROM ex
""")
def compose_mix_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle pair for the UNIFIED mixture regimes (r10 verdict ask
    #4): one `compose_corpus_mix(allow_epochs=True)` call plans a
    token-preserving mix whose rates straddle 1 and routes application
    — the downsampled stratum (en) draws a keep flag through
    `apply_mixture_rates`, the upsampled strata (zh/de/fr) repeat
    surviving rows through `epoch_upsample` (same ``mixture:`` hash
    salt — the twin applies ONE copies formula to every stratum and
    must match both routes bit-exactly, including the integer-boundary
    rate-0 'es' path and the keep=0 pass-through-unrepeated rule).
    Registered past the 50-slot gate window
    (``__spark_entry__._PAST_WINDOW``)."""
    from .mixture import compose_corpus_mix
    t = load_tables(spark, sf_dir, ("documents",))
    d = t["documents"].select(
        "doc_id", "lang", "text",
        (F.col("doc_id") % 4 != 0).cast("int").alias("keep"))
    # report_realized=False — same reasoning as compose_mix_budget:
    # the gate joins only the plan's rate; skipping the realized
    # aggregation avoids recomputing the epoch-exploded output +
    # tokenize a second time (r11 opt round).
    out, report = compose_corpus_mix(d, target=_EPOCH_MIX_TARGET,
                                     allow_epochs=True,
                                     report_realized=False)
    return (out.join(F.broadcast(report.select(
                F.col("stratum").alias("lang"), "rate")), "lang")
            .select("doc_id", "lang", "rate", "keep", "mix_keep",
                    "epoch", "final_keep"))
