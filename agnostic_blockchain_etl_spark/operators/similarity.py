"""Similarity search over embedding columns (``embeddings`` table:
vec_id BIGINT, embedding ARRAY<FLOAT>, label INT).

Three tiers, all JVM-side column expressions (zip_with/aggregate — no
Python UDF in the scoring path):

- **brute-force top-k** — the correctness baseline: queries × corpus dot
  products. At scale this is only sane for small query sets; the corpus
  side stays partitioned and the query side broadcasts.
- **sign-LSH bucketed** — the scale path: an 8-bit hyperplane-sign
  signature (coordinate hyperplanes → deterministic, oracle-friendly)
  buckets the corpus; candidates come only from the query's bucket.
  At 100 TB this becomes: signature → shuffle-free bucket-partitioned
  layout → per-bucket scans.
- **near-dup pairs** — cosine ≥ τ within LSH buckets (pair output).

Determinism: cosines are computed in float64 from float32 inputs and
rounded to 4 decimals in both engines; DuckDB lists are cast to DOUBLE[]
before arithmetic so both engines sum float64.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .tables import load_tables

from .registry import make_registry

QUERIES, ORACLES, query = make_registry()


_N_QUERIES = 8        # vec_id < 8 are the query vectors
_TOP_K = 5
_SIGN_BITS = 8        # LSH signature bits (coordinate hyperplanes)
_NEAR_DUP_TAU = 0.45  # synthetic corpus max pairwise cosine ≈ 0.5


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def _as_double(col):
    return F.col(col).cast("array<double>")


_SQL_COS = """
    round(list_dot_product(qa, qb)
          / (sqrt(list_dot_product(qa, qa)) * sqrt(list_dot_product(qb, qb))), 4)
"""


@query("emb_cosine_topk", oracle=f"""
    WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               round(list_dot_product(q.e, c.e)
                     / (sqrt(list_dot_product(q.e, q.e))
                        * sqrt(list_dot_product(c.e, c.e))), 4) AS cosine
        FROM emb q CROSS JOIN emb c
        WHERE q.vec_id < {_N_QUERIES} AND q.vec_id <> c.vec_id),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id
                   ORDER BY cosine DESC, neighbor_id) AS rn
        FROM scored)
    SELECT query_id, neighbor_id, cosine, CAST(rn AS INT) AS rank
    FROM ranked WHERE rn <= {_TOP_K}
""")
def emb_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate form of `cosine_topk`: the testdata corpus searched with its
    own first `_N_QUERIES` vectors as the query set."""
    t = load_tables(spark, sf_dir, ("embeddings",))
    emb = t["embeddings"].select("vec_id", _as_double("embedding").alias("e"))
    q = emb.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe"))
    return cosine_topk(emb, q)


def cosine_topk(corpus: DataFrame, queries: DataFrame,
                k: int = _TOP_K) -> DataFrame:
    """Brute-force cosine top-k: ``corpus`` has ``(vec_id, e)``,
    ``queries`` has ``(query_id, qe)``, both array<double>.

    Scale: the query side is broadcast (the caller keeps it small — for
    large query sets use the LSH/IVF paths); the corpus scan stays
    partitioned; ranking is a per-query-group top-k — Spark turns the
    window + filter into a partial top-k under AQE."""
    scored = (F.broadcast(queries).crossJoin(corpus)
              .where(F.col("query_id") != F.col("vec_id"))
              .select("query_id", F.col("vec_id").alias("neighbor_id"),
                      F.round(_dot(F.col("qe"), F.col("e")) /
                              (_norm(F.col("qe")) * _norm(F.col("e"))), 4)
                       .alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               "neighbor_id")
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine",
                    F.col("rank").cast("int").alias("rank")))


def _sign_bucket_expr(vec_col: str = "e", bits: int = _SIGN_BITS):
    """Coordinate-hyperplane sign signature of an array column — the
    deterministic LSH bucket key (also the secondary split key for
    oversized semantic-dedup clusters). ``bits`` is the recall/cost
    knob: fewer bits → bigger buckets → more candidates."""
    return sum(
        (F.when(F.element_at(vec_col, i + 1) >= 0,
                F.lit(1 << i)).otherwise(0)
         for i in range(bits)), start=F.lit(0)).cast("long")


def _sql_sig(bits: int) -> str:
    """DuckDB twin of `_sign_bucket_expr` at ``bits`` bits."""
    return ("CAST(" + " + ".join(
        f"(CASE WHEN e[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END)"
        for i in range(bits)) + " AS BIGINT)")


# the 8-bit form the dedup/search oracles embed — derived, not a second
# hand-rolled copy (the drift class the round-6 review consolidated)
_SQL_SIG = _sql_sig(_SIGN_BITS)


@query("emb_lsh_bucketed_search", oracle=f"""
    WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    sig AS (SELECT vec_id, e, {_SQL_SIG} AS bucket FROM emb),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               round(list_dot_product(q.e, c.e)
                     / (sqrt(list_dot_product(q.e, q.e))
                        * sqrt(list_dot_product(c.e, c.e))), 4) AS cosine
        FROM sig q JOIN sig c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
        WHERE q.vec_id < {_N_QUERIES}),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id
                   ORDER BY cosine DESC, neighbor_id) AS rn
        FROM scored)
    SELECT query_id, neighbor_id, cosine, CAST(rn AS INT) AS rank
    FROM ranked WHERE rn <= {_TOP_K}
""")
def emb_lsh_bucketed_search(spark, sf_dir):
    """ANN via sign-LSH bucketing: candidates share the query's 8-bit
    hyperplane-sign signature (~1/256 of the corpus per bucket), then exact
    cosine within the bucket. The recall/cost knob is the bit count."""
    t = load_tables(spark, sf_dir, ("embeddings",))
    emb = t["embeddings"].select("vec_id", _as_double("embedding").alias("e"))
    sig = emb.withColumn("bucket", _sign_bucket_expr("e"))
    q = (sig.where(F.col("vec_id") < _N_QUERIES)
         .select(F.col("vec_id").alias("query_id"), F.col("e").alias("qe"),
                 F.col("bucket").alias("qbucket")))
    scored = (sig.join(F.broadcast(q),
                       (F.col("bucket") == F.col("qbucket")) &
                       (F.col("vec_id") != F.col("query_id")))
              .select("query_id", F.col("vec_id").alias("neighbor_id"),
                      F.round(_dot(F.col("qe"), F.col("e")) /
                              (_norm(F.col("qe")) * _norm(F.col("e"))), 4)
                       .alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               "neighbor_id")
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= _TOP_K)
            .select("query_id", "neighbor_id", "cosine",
                    F.col("rank").cast("int").alias("rank")))


@query("emb_near_dup_pairs", oracle=f"""
    WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    sig AS (SELECT vec_id, e, {_SQL_SIG} AS bucket FROM emb)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_dot_product(a.e, b.e)
                 / (sqrt(list_dot_product(a.e, a.e))
                    * sqrt(list_dot_product(b.e, b.e))), 4) AS cosine
    FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE list_dot_product(a.e, b.e)
          / (sqrt(list_dot_product(a.e, a.e))
             * sqrt(list_dot_product(b.e, b.e))) >= {_NEAR_DUP_TAU}
""")
def emb_near_dup_pairs(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs within LSH buckets (the
    embedding-space analog of minhash dedup): cosine ≥ τ, bucketed so the
    pair space never materializes globally."""
    t = load_tables(spark, sf_dir, ("embeddings",))
    emb = t["embeddings"].select("vec_id", _as_double("embedding").alias("e"))
    sig = emb.withColumn("bucket", _sign_bucket_expr("e"))
    a, b = sig.alias("a"), sig.alias("b")
    cos = (_dot(F.col("a.e"), F.col("b.e")) /
           (_norm(F.col("a.e")) * _norm(F.col("b.e"))))
    return (a.join(b, (F.col("a.bucket") == F.col("b.bucket")) &
                   (F.col("a.vec_id") < F.col("b.vec_id")))
            .where(cos >= _NEAR_DUP_TAU)
            .select(F.col("a.vec_id").alias("vec_a"),
                    F.col("b.vec_id").alias("vec_b"),
                    F.round(cos, 4).alias("cosine")))


_DECON_TAU = 0.25   # eval-similarity bar for the gate row
_DECON_BITS = 4     # wider buckets than dedup: recall matters more here
_DECON_EVAL_MOD = 25   # gate eval set: every 25th vector


def semantic_decontamination(corpus_emb: DataFrame, eval_emb: DataFrame,
                             tau: float = _DECON_TAU,
                             bits: int = _DECON_BITS,
                             id_col: str = "vec_id",
                             eval_id_col: str = "eval_id") -> DataFrame:
    """EMBEDDING-space decontamination: flag corpus documents whose
    embedding is cosine-≥ ``tau`` to ANY eval/benchmark embedding (the
    semantic complement of the n-gram `decontaminate` pass — paraphrased
    or reformatted eval leakage that shares no 8-gram still lands next
    to its source in embedding space; cf. the Llama-3 / GPT-4 report
    practice of embedding-similarity contamination checks).

    ``corpus_emb`` has ``(id_col, e)``, ``eval_emb`` ``(eval_id_col,
    qe)``, both array<double>. Returns ONE ROW PER CORPUS ROW
    (flag-don't-drop): ``nearest_eval_id`` / ``max_cosine`` (NULL when
    no candidate shares a bucket) and ``semdecon_keep`` (0 iff
    max_cosine ≥ tau). Ties on cosine break to the smallest eval id.

    Scale shape: the eval side is a benchmark suite — thousands of
    rows, always broadcast; candidates are generated by sign-LSH bucket
    equality at ``bits`` bits (the recall/cost knob — WIDER buckets
    than near-dup dedup since a miss here leaks eval data into
    training), so the corpus never joins the full eval cross product;
    the per-doc max is a partial aggregation (map-side combine) on a
    (cosine, -eval_id) struct, never a window over the corpus."""
    sig = corpus_emb.withColumn("__b", _sign_bucket_expr("e", bits))
    esig = eval_emb.withColumn("__qb", _sign_bucket_expr("qe", bits))
    cos = _dot(F.col("e"), F.col("qe")) / (_norm(F.col("e"))
                                           * _norm(F.col("qe")))
    best = (sig.join(F.broadcast(esig), F.col("__b") == F.col("__qb"))
            .select(id_col,
                    F.struct(cos.alias("c"),
                             (-F.col(eval_id_col)).alias("ni")).alias("s"))
            .groupBy(id_col).agg(F.max("s").alias("m")))
    return (corpus_emb.join(best, id_col, "left")
            .select(id_col,
                    (-F.col("m.ni")).cast("long").alias("nearest_eval_id"),
                    F.round(F.col("m.c"), 4).alias("max_cosine"),
                    F.when(F.col("m.c") >= tau, 0).otherwise(1)
                     .cast("int").alias("semdecon_keep")))


@query("semantic_decontamination", oracle=f"""
    WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                 FROM embeddings),
    sig AS (SELECT vec_id, e, {_sql_sig(_DECON_BITS)} AS bucket FROM emb),
    corpus AS (SELECT * FROM sig WHERE vec_id % {_DECON_EVAL_MOD} <> 0),
    ev AS (SELECT * FROM sig WHERE vec_id % {_DECON_EVAL_MOD} = 0),
    cand AS (
        SELECT c.vec_id AS vec_id, ev.vec_id AS eval_id,
               list_dot_product(c.e, ev.e)
               / (sqrt(list_dot_product(c.e, c.e))
                  * sqrt(list_dot_product(ev.e, ev.e))) AS cos
        FROM corpus c JOIN ev ON c.bucket = ev.bucket),
    best AS (
        SELECT vec_id, eval_id, cos,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, eval_id) AS rn
        FROM cand)
    SELECT c.vec_id AS vec_id,
           b.eval_id               AS nearest_eval_id,
           round(b.cos, 4)         AS max_cosine,
           CASE WHEN b.cos >= {_DECON_TAU} THEN 0 ELSE 1 END
                                   AS semdecon_keep
    FROM corpus c LEFT JOIN (SELECT * FROM best WHERE rn = 1) b
         USING (vec_id)
""")
def semantic_decontamination_gate(spark, sf_dir):
    """Gate form of `semantic_decontamination`: every 25th testdata
    vector plays the eval/benchmark set, the rest the corpus. The
    oracle is the naive window formulation (rank within ALL candidates)
    — hash-verified equal to the operator's struct-max partial
    aggregation, so tie order (smallest eval id) is pinned
    cross-engine. Registered PAST the driver's 50-slot window (see
    ``__spark_entry__._PAST_WINDOW``)."""
    t = load_tables(spark, sf_dir, ("embeddings",))
    emb = t["embeddings"].select("vec_id",
                                 _as_double("embedding").alias("e"))
    corpus = emb.where(F.col("vec_id") % _DECON_EVAL_MOD != 0)
    ev = (emb.where(F.col("vec_id") % _DECON_EVAL_MOD == 0)
          .select(F.col("vec_id").alias("eval_id"),
                  F.col("e").alias("qe")))
    return semantic_decontamination(corpus, ev)


_IVF_LISTS = 16   # coarse codebook size (nlist)
_IVF_NPROBE = 3   # lists probed per query


def _sql_cos_of(a: str, b: str) -> str:
    return (f"list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a}))"
            f" * sqrt(list_dot_product({b}, {b})))")


@query("emb_ivf_topk", oracle=f"""
    WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    seeds AS (
        SELECT vec_id AS seed_id, e AS se FROM emb
        WHERE vec_id >= {_N_QUERIES} ORDER BY vec_id LIMIT {_IVF_LISTS}),
    assigned AS (
        SELECT vec_id, e, seed_id AS list_id FROM (
            SELECT c.vec_id, c.e, s.seed_id,
                   row_number() OVER (PARTITION BY c.vec_id
                       ORDER BY {_sql_cos_of('c.e', 's.se')} DESC, s.seed_id)
                       AS rn
            FROM emb c CROSS JOIN seeds s)
        WHERE rn = 1),
    probes AS (
        SELECT query_id, qe, seed_id AS list_id FROM (
            SELECT q.vec_id AS query_id, q.e AS qe, s.seed_id,
                   row_number() OVER (PARTITION BY q.vec_id
                       ORDER BY {_sql_cos_of('q.e', 's.se')} DESC, s.seed_id)
                       AS rn
            FROM emb q CROSS JOIN seeds s
            WHERE q.vec_id < {_N_QUERIES})
        WHERE rn <= {_IVF_NPROBE}),
    scored AS (
        SELECT p.query_id, a.vec_id AS neighbor_id,
               round({_sql_cos_of('p.qe', 'a.e')}, 4) AS cosine
        FROM probes p JOIN assigned a ON a.list_id = p.list_id
        WHERE a.vec_id <> p.query_id),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id
                   ORDER BY cosine DESC, neighbor_id) AS rn
        FROM scored)
    SELECT query_id, neighbor_id, cosine, CAST(rn AS INT) AS rank
    FROM ranked WHERE rn <= {_TOP_K}
""")
def emb_ivf_topk(spark, sf_dir):
    """IVF approximate nearest neighbor: a coarse codebook of
    ``nlist={_IVF_LISTS}`` vectors partitions the corpus into inverted
    lists (each vector assigned to its nearest codebook entry); a query
    probes only its ``nprobe={_IVF_NPROBE}`` closest lists and scores
    exactly within them — the classic recall/cost dial between
    brute-force (`emb_cosine_topk`) and tiny-bucket LSH.

    The codebook here is a deterministic seed sample (the {_IVF_LISTS}
    lowest non-query vec_ids): raw data vectors are bit-identical across
    engines, so list assignment is oracle-exact — averaged centroids
    would be summation-order-dependent. Production would refine these
    seeds with Lloyd iterations (the aggregation shape is
    `emb_label_centroids`); the assignment/probe plan is unchanged.

    Scale: the codebook broadcasts (nlist rows); assignment is one
    broadcast-join pass over the corpus with a per-vector top-1 (at
    100 TB this materializes once as a bucketed-by-list layout, not per
    query); each query touches ~nprobe/nlist of the corpus."""
    t = load_tables(spark, sf_dir, ("embeddings",))
    emb = t["embeddings"].select("vec_id", _as_double("embedding").alias("e"))
    seeds = (emb.where(F.col("vec_id") >= _N_QUERIES)
             .orderBy("vec_id").limit(_IVF_LISTS)
             .select(F.col("vec_id").alias("seed_id"), F.col("e").alias("se")))

    def top_lists(vecs, id_out, vec_out, n):
        cos = (_dot(F.col("e"), F.col("se")) /
               (_norm(F.col("e")) * _norm(F.col("se"))))
        w = Window.partitionBy("vec_id").orderBy(F.col("sc").desc(), "seed_id")
        return (vecs.crossJoin(F.broadcast(seeds))
                .withColumn("sc", cos)
                .withColumn("rn", F.row_number().over(w))
                .where(F.col("rn") <= n)
                .select(F.col("vec_id").alias(id_out),
                        F.col("e").alias(vec_out),
                        F.col("seed_id").alias("list_id")))

    assigned = top_lists(emb, "neighbor_id", "ce", 1)
    probes = top_lists(emb.where(F.col("vec_id") < _N_QUERIES),
                       "query_id", "qe", _IVF_NPROBE)
    cos_qc = (_dot(F.col("qe"), F.col("ce")) /
              (_norm(F.col("qe")) * _norm(F.col("ce"))))
    scored = (assigned.join(F.broadcast(probes), "list_id")
              .where(F.col("neighbor_id") != F.col("query_id"))
              .select("query_id", "neighbor_id",
                      F.round(cos_qc, 4).alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               "neighbor_id")
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= _TOP_K)
            .select("query_id", "neighbor_id", "cosine",
                    F.col("rank").cast("int").alias("rank")))


def _nearest_assign(vecs: DataFrame,
                    centroids: list[tuple[int, list[float]]]) -> DataFrame:
    """Zero-shuffle nearest-centroid assignment against a LITERAL
    codebook: ``vecs`` (vec_id, e) → (vec_id, e, list_id, sc).

    The codebook is a bounded driver artifact (nlist rows — same class
    as the shard writer's bucket map), so it ships in the kernel's
    closure and the assignment is ONE Arrow-batched projection: a dense
    ``batch × codebook`` matmul + argmax, the BLAS kernel every
    production k-means assignment runs. This is the sanctioned
    pandas-UDF boundary (dense numeric kernel): the two declarative
    formulations both lose by orders of magnitude — broadcast crossJoin
    + row_number window shuffles n×nlist rows CARRYING THE VECTOR to
    sort them (measured 189 s at 20k×160), and a literal-array
    ``transform``/``array_max`` fold pays interpreted nested-HOF cosine
    per (row, centroid) (measured >10 min, same size; the matmul form:
    sub-second). Ties break to the lowest list_id (argmax returns the
    first maximum over an id-sorted codebook), matching the old
    window's (sc DESC, list_id ASC)."""
    from pyspark.sql.functions import pandas_udf

    order = sorted(range(len(centroids)), key=lambda i: centroids[i][0])
    ids = np.array([int(centroids[i][0]) for i in order])
    mat = np.array([[float(x) for x in centroids[i][1]] for i in order],
                   dtype=np.float64)
    cn = np.linalg.norm(mat, axis=1)
    cn[cn == 0.0] = 1.0
    matn = (mat.T / cn).T                     # row-normalized codebook

    @pandas_udf("struct<list_id:int, sc:double>")
    def nearest(col: pd.Series) -> pd.DataFrame:
        e = np.vstack(col.to_numpy())         # batch × dim
        en = np.linalg.norm(e, axis=1)
        en[en == 0.0] = 1.0
        scores = (e / en[:, None]) @ matn.T   # batch × nlist cosines
        arg = scores.argmax(axis=1)           # first max = lowest id
        return pd.DataFrame({
            "list_id": ids[arg].astype("int32"),
            "sc": scores[np.arange(len(arg)), arg]})

    return (vecs.withColumn("_best", nearest(F.col("e")))
            .select("vec_id", "e",
                    F.col("_best.list_id").alias("list_id"),
                    F.col("_best.sc").alias("sc")))


def _toplists_assign(vecs: DataFrame, centroids, nprobe: int,
                     id_col: str = "vec_id",
                     vec_col: str = "e") -> DataFrame:
    """Top-``nprobe`` nearest lists per vector against a literal
    codebook (the query-side of IVF search): one Arrow-batched matmul +
    argpartition per batch, exploded to (id, vec, list_id) rows.
    Probe order ties break to the lowest list_id (stable sort over an
    id-sorted codebook)."""
    from pyspark.sql.functions import pandas_udf

    order = sorted(range(len(centroids)), key=lambda i: centroids[i][0])
    ids = np.array([int(centroids[i][0]) for i in order])
    mat = np.array([[float(x) for x in centroids[i][1]] for i in order],
                   dtype=np.float64)
    cn = np.linalg.norm(mat, axis=1)
    cn[cn == 0.0] = 1.0
    matn = (mat.T / cn).T
    p = min(nprobe, len(ids))

    @pandas_udf("array<int>")
    def toplists(col: pd.Series) -> pd.Series:
        e = np.vstack(col.to_numpy())
        en = np.linalg.norm(e, axis=1)
        en[en == 0.0] = 1.0
        scores = (e / en[:, None]) @ matn.T
        # stable descending sort → ties to lowest list_id
        idx = np.argsort(-scores, axis=1, kind="stable")[:, :p]
        return pd.Series([ids[row].astype("int32").tolist()
                          for row in idx])

    return (vecs.withColumn("_lists", toplists(F.col(vec_col)))
            .select(id_col, vec_col, F.explode("_lists").alias("list_id")))


def ivf_search(emb: DataFrame, queries: DataFrame, codebook: DataFrame,
               k: int = 10, nprobe: int = 4) -> DataFrame:
    """IVF-flat ANN search, every dense stage a BLAS kernel (the
    production form of the gate's `emb_ivf_topk`, usable with the
    Lloyd-refined `ivf_train` codebook): assign the corpus to its list
    (`_nearest_assign`), probe each query's ``nprobe`` nearest lists
    (`_toplists_assign`), score query×corpus WITHIN each probed list as
    a per-list cogrouped matmul, then take the global top-``k`` per
    query. Returns (query_id, neighbor_id, cosine, rank); cosine is
    rounded to 6, ranking ties break to the lowest neighbor_id;
    self-matches (same id on both sides) are excluded.

    Scale shape: corpus vectors cross the Arrow boundary once per
    batch; each probed list's score matrix is (queries-probing-list ×
    list-size) in vectorized float64; the final top-k reduces
    queries × nprobe × k candidate rows — the only shuffles are the two
    list_id groupings and the k-row-per-query reduction. With
    ``nprobe = nlist`` the result is EXACT brute-force top-k (the
    recall dial's endpoint), which is how the test pins correctness."""
    vecs = emb.select("vec_id",
                      F.col("embedding").cast("array<double>").alias("e"))
    # bind the query id by NAME, not by position: column order is not a
    # stable property of a DataFrame through joins/selects, and a
    # positional bind of an array column surfaced as an opaque Arrow
    # type error at the kernel boundary. A conventional id name wins;
    # otherwise the id must be UNAMBIGUOUS — silently grabbing the
    # first of several metadata columns re-creates the positional
    # fragility this bind exists to remove.
    cand = [c for c in queries.columns if c != "embedding"]
    if "embedding" not in queries.columns or not cand:
        raise ValueError(
            "ivf_search queries need an 'embedding' column and an id "
            f"column; got {queries.columns}")
    named = [c for c in cand if c in ("query_id", "vec_id", "doc_id")]
    if named:
        qid = named[0]
    elif len(cand) == 1:
        qid = cand[0]
    else:
        raise ValueError(
            "ivf_search queries carry several non-embedding columns "
            f"({cand}) and none is named query_id/vec_id/doc_id — "
            "select the id column explicitly")
    qvecs = queries.select(
        F.col(qid).alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qe"))
    cb = [(r.list_id, list(r.centroid)) for r in codebook.collect()]
    assigned = _nearest_assign(vecs, cb).select("list_id", "vec_id", "e")
    probes = _toplists_assign(qvecs, cb, nprobe, "query_id", "qe")

    def score(corpus_pdf: pd.DataFrame,
              probes_pdf: pd.DataFrame) -> pd.DataFrame:
        if corpus_pdf.empty or probes_pdf.empty:
            return pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                                 "neighbor_id": pd.Series(dtype="int64"),
                                 "cosine": pd.Series(dtype="float64")})
        C = np.vstack(corpus_pdf["e"].to_numpy())
        cn = np.linalg.norm(C, axis=1)
        cn[cn == 0.0] = 1.0
        Q = np.vstack(probes_pdf["qe"].to_numpy())
        qn = np.linalg.norm(Q, axis=1)
        qn[qn == 0.0] = 1.0
        s = (Q / qn[:, None]) @ ((C.T / cn))          # nq × nc cosines
        nids = corpus_pdf["vec_id"].to_numpy()
        qids = probes_pdf["query_id"].to_numpy()
        # k+1 candidates per list: an in-corpus query vector scores 1.0
        # against itself and would otherwise displace its true k-th
        # neighbor before the self-match filter below runs (the final
        # window cuts back to k)
        kk = min(k + 1, s.shape[1])
        # cut by the SAME order the final window ranks on — rounded
        # cosine DESC, neighbor_id ASC. A stable argsort over raw
        # cosines cut ties by arbitrary pandas-group row order, so the
        # lowest-id tied neighbor could be dropped inside the kernel
        # before the window's tie-break ever saw it (nondeterministic
        # across task retries; broke the nprobe=nlist ≡ brute-force
        # identity under duplicate vectors).
        rs = np.round(s, 6)
        take = np.empty((len(qids), kk), dtype=np.int64)
        for i in range(len(qids)):
            take[i] = np.lexsort((nids, -rs[i]))[:kk]
        rows_q = np.repeat(qids, kk)
        rows_n = nids[take.ravel()]
        rows_c = rs[np.repeat(np.arange(len(qids)), kk), take.ravel()]
        keep = rows_q != rows_n
        return pd.DataFrame({"query_id": rows_q[keep],
                             "neighbor_id": rows_n[keep],
                             "cosine": rows_c[keep]})

    cand = (assigned.groupBy("list_id")
            .cogroup(probes.groupBy("list_id"))
            .applyInPandas(score,
                           "query_id long, neighbor_id long, cosine double"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               "neighbor_id")
    return (cand.dropDuplicates(["query_id", "neighbor_id"])
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine",
                    F.col("rank").cast("int").alias("rank")))


def ivf_train(spark: SparkSession, emb: DataFrame, nlist: int,
              iters: int = 2, persist: bool = True) -> DataFrame:
    """Lloyd refinement of an IVF codebook: start from a deterministic
    seed sample (the ``nlist`` lowest vec_ids of ``emb`` — note this is
    the generic rule over whatever frame the caller passes; `emb_ivf_topk`
    additionally excludes its query vectors and keeps seed vec_ids as
    list ids, so the two codebooks are NOT interchangeable — filter the
    queries out and remap ids if warm-starting the gate query) and run
    ``iters`` assign-then-recenter passes. Returns ``(list_id, centroid)``
    with centroid as ``array<double>``, list_id 1..nlist.

    Each pass is ONE shuffle regardless of corpus size: assignment is a
    zero-shuffle literal-codebook argmax (`_nearest_assign` — the
    codebook is a bounded driver artifact collected between passes,
    nlist × dim doubles), and the re-centering is one (list_id, dim)-
    keyed partial aggregation (`emb_label_centroids`' shape) folded
    back into arrays. Not a gate query: iterative refinement has no
    closed-form SQL oracle — the convergence property (non-increasing
    inertia) is unit-tested instead (tests/test_llm_ops.py::TestIvfTrain).

    ``emb`` must have columns ``vec_id`` and array-typed ``embedding``.

    The function drives ``1 + iters`` actions over ``emb``'s DAG (seed
    collect + one recenter collect per pass), so ``persist`` (default
    on) caches the vector projection for the duration of the call and
    releases it before returning — without it, an expensive upstream
    (a raw-text `hashed_tfidf_vectors` bridge, a remote scan) would be
    recomputed per action (the round-6 `x_text_embed_dedup` money bug).
    Callers that already persisted their input pass ``persist=False``
    to skip the redundant second materialization (`semantic_dedup`
    does)."""
    vecs = emb.select("vec_id", F.col("embedding").cast("array<double>")
                      .alias("e"))
    if persist:
        vecs = vecs.persist()
    try:
        cb = [(i + 1, list(r.e)) for i, r in
              enumerate(vecs.orderBy("vec_id").limit(nlist).collect())]
        for _ in range(iters):
            assigned = _nearest_assign(vecs, cb).select("vec_id", "e",
                                                        "list_id")
            recentred = (assigned
                         .select("list_id", F.posexplode("e"))
                         .groupBy("list_id", "pos")
                         .agg(F.avg("col").alias("v"))
                         .groupBy("list_id")
                         .agg(F.array_sort(F.collect_list(
                             F.struct("pos", "v"))).alias("pairs"))
                         .select("list_id",
                                 F.transform(F.col("pairs"),
                                             lambda p: p["v"])
                                 .alias("ce")))
            # a list that received ZERO members this pass emits no
            # recenter row — KEEP its previous centroid instead of
            # silently shrinking the codebook below nlist (duplicate
            # vectors in the seed prefix tie-assign to the first seed,
            # starving the second; callers size serving structures on
            # nlist, so a shrunken frame breaks the documented
            # 'list_id 1..nlist' contract)
            new_cb = {r.list_id: list(r.ce) for r in recentred.collect()}
            cb = [(lid, new_cb.get(lid, ce)) for lid, ce in cb]
    finally:
        if persist:
            vecs.unpersist()
    return spark.createDataFrame(
        [(i, ce) for i, ce in cb], "list_id int, centroid array<double>")


def emb_label_centroids(spark, sf_dir):
    """Per-label centroid vectors (the aggregation shape of IVF list
    training): posexplode the vectors, average per (label, dim).
    Gate coverage moved into ``corpus.emb_quantize_centroid_facets``
    (round-4 rotation); kept as a library entry point.

    Scale: one shuffle keyed (label, dim) with partial aggregation —
    centroid training over billions of vectors stays a single pass."""
    t = load_tables(spark, sf_dir, ("embeddings",))
    return (t["embeddings"]
            .select("label", F.posexplode(_as_double("embedding")))
            .select("label", (F.col("pos") + 1).cast("int").alias("dim"),
                    F.col("col").alias("v"))
            .groupBy("label", "dim")
            .agg(F.round(F.avg("v"), 6).alias("centroid_v")))


def _cluster_pairs(assigned: DataFrame, tau: float,
                   max_cluster_size: int | None = None) -> DataFrame:
    """Cosine-≥``tau`` pairs WITHIN each cluster of an ``assigned``
    frame (``vec_id, e, list_id``), as per-group BLAS kernels.

    ``max_cluster_size`` is the two-level skew guard for a
    pathologically popular cluster (the `semantic_dedup` hazard):

    1. clusters over the cap are SPLIT with a secondary sign-LSH
       subkey (`_sign_bucket_expr` — up to 2^8 subgroups): near-dup
       vectors have near-identical coordinate signs, so true duplicate
       pairs overwhelmingly co-locate while the cluster's bulk spreads;
    2. a subgroup STILL over the cap is sign-degenerate (an
       identical-vector flood) — the kernel falls back to a STAR probe
       against the subgroup's minimum-id member: O(m) scores instead of
       O(m²), and since such a flood is mutually near-identical, the
       star edges connect exactly what the full pairwise would have
       (connected components only need a spanning set, not all edges).

    Both levels trade recall at the margins for bounded compute —
    cross-subgroup pairs and flood members not within tau of the pivot
    are missed — and both are exercised by test_skew_guards.py. With
    the cap on, per-group kernel cost is bounded by max(cap², m)."""
    keyed = assigned.select("list_id", "vec_id", "e")
    if max_cluster_size is not None:
        sized = keyed.withColumn(
            "_cs", F.count("*").over(Window.partitionBy("list_id")))
        keyed = (sized.withColumn(
            "sub", F.when(F.col("_cs") > max_cluster_size,
                          _sign_bucket_expr("e")).otherwise(F.lit(0)))
            .drop("_cs"))
    else:
        keyed = keyed.withColumn("sub", F.lit(0))

    def _pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        E = np.vstack(pdf["e"].to_numpy())
        n = np.linalg.norm(E, axis=1)
        n[n == 0.0] = 1.0
        En = E / n[:, None]
        ids = pdf["vec_id"].to_numpy()
        if max_cluster_size is not None and len(ids) > max_cluster_size:
            pivot = int(np.argmin(ids))
            s = En @ En[pivot]
            keep = np.round(s, 6) >= tau
            keep[pivot] = False
            others = ids[keep]
            return pd.DataFrame({
                "doc_a": np.minimum(ids[pivot], others),
                "doc_b": np.maximum(ids[pivot], others)})
        s = En @ En.T
        iu = np.triu_indices(len(ids), k=1)
        keep = np.round(s[iu], 6) >= tau
        a, b = ids[iu[0][keep]], ids[iu[1][keep]]
        return pd.DataFrame({"doc_a": np.minimum(a, b),
                             "doc_b": np.maximum(a, b)})

    return (keyed.groupBy("list_id", "sub")
            .applyInPandas(_pairs, "doc_a long, doc_b long"))


def semantic_dedup(emb: DataFrame, nlist: int = 8, tau: float = 0.99,
                   iters: int = 2,
                   max_cluster_size: int | None = None,
                   codebook: DataFrame | None = None) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space with a k-means
    codebook, find cosine-≥``tau`` pairs WITHIN each cluster only, take
    connected components over those pairs, and keep one representative
    per duplicate group — the member LEAST similar to its cluster
    centroid (the paper's keep rule: low-similarity examples carry the
    most marginal information), ties broken by lowest ``vec_id``.

    Returns one row per input vector: ``(vec_id, group_id,
    cosine_to_centroid, keep)`` where ``group_id`` is the duplicate
    group's minimum ``vec_id`` (singletons are their own group and are
    always kept).

    Scale shape: the ``nlist``-row codebook broadcasts; assignment is a
    single broadcast pass over the corpus; the pairwise stage shuffles
    each vector once on ``list_id`` so the quadratic term is bounded by
    the largest cluster, not the corpus — ``nlist`` grows with corpus
    size to hold expected cluster size constant (the paper runs 50k
    clusters over 5B embeddings). A pathologically popular cluster is
    the skew risk; ``max_cluster_size`` (default off) is the shipped
    guard — oversized clusters split on a secondary sign-LSH subkey,
    and sign-degenerate floods fall back to a star probe (see
    :func:`_cluster_pairs` for the two levels and their recall trade).
    Components then iterate only the near-dup
    edge subgraph (`dedup.connected_components`), which is tiny
    relative to the corpus at any realistic duplicate rate.

    ``emb`` needs ``vec_id`` and an array-typed ``embedding``. Pass
    ``codebook`` (``list_id, centroid`` — e.g. a persisted `ivf_train`
    artifact, or a deterministic seed set) to skip the in-line Lloyd
    training; ``nlist``/``iters`` are then ignored."""
    from .dedup import _scoped_cache, connected_components

    # Scoped-cache the vector projection: the DAG above it (for
    # `text_semantic_dedup`, a full tokenize + two corpus shuffles) is
    # consumed by SEVERAL driver actions — ivf_train's seed + recenter
    # collects, the pair stage's eager checkpoint inside
    # connected_components, and the final member join. Un-persisted,
    # each action recomputed the whole upstream (~5-6×, the round-6
    # x_text_embed_dedup money bug — 41 s vs ~8 s at sf0.1); the cache
    # bounds that to one materialization, reclaimed by the calling
    # thread's next dedup-family query (`dedup._scoped_cache`).
    vecs = _scoped_cache(
        emb.select("vec_id",
                   F.col("embedding").cast("array<double>").alias("e")))
    if codebook is None:
        codebook = ivf_train(
            emb.sparkSession,
            vecs.select("vec_id", F.col("e").alias("embedding")),
            nlist, iters, persist=False)
    cb = [(r.list_id, list(r.centroid)) for r in codebook.collect()]
    # zero-shuffle codebook-kernel argmax (see _nearest_assign)
    assigned = (_nearest_assign(vecs, cb)
                .select("vec_id", "e", "list_id",
                        F.round(F.col("sc"), 4).alias("cc")))

    # Within-cluster pairs as a per-cluster BLAS kernel (the paper's
    # shape: per-cluster pairwise matmul), not a self-join: the equi-join
    # form caps parallel compute at nlist tasks and pays an interpreted
    # HOF cosine per candidate pair (O(m²) per cluster — measured 89 s
    # at 20k vecs / 16 lists vs 4 s for the kernel). Each cluster's
    # vectors cross the Arrow boundary ONCE; En @ En.T scores every pair
    # in vectorized float64; only pairs ≥ tau leave the kernel. Memory
    # is m² doubles per cluster — bounded because nlist scales with the
    # corpus to hold m constant, and hard-bounded by max_cluster_size
    # when set (see _cluster_pairs).
    pairs = _cluster_pairs(assigned, tau, max_cluster_size)

    labels = connected_components(pairs)
    member = (assigned.select("vec_id", "cc")
              .join(labels.withColumnRenamed("doc_id", "vec_id"),
                    "vec_id", "left")
              .withColumn("group_id",
                          F.coalesce(F.col("label"), F.col("vec_id"))))
    kw = Window.partitionBy("group_id").orderBy(F.col("cc").asc(), "vec_id")
    return (member
            .withColumn("keep",
                        (F.row_number().over(kw) == 1).cast("int"))
            .select("vec_id", "group_id",
                    F.col("cc").alias("cosine_to_centroid"), "keep"))


_SEM_NLIST = 8    # seed codebook size for the gate form
_SEM_TAU = 0.40   # within-cluster duplicate threshold (synthetic corpus
                  # max pairwise cosine ~0.5 -> ~20 dup pairs at sf0.01)


@query("semantic_dedup_seeded", oracle=f"""
    WITH RECURSIVE emb AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    seeds AS (
        SELECT vec_id AS seed_id, e AS se FROM emb
        ORDER BY vec_id LIMIT {_SEM_NLIST}),
    assigned AS (
        SELECT vec_id, e, seed_id AS list_id, round(sc, 4) AS cc FROM (
            SELECT c.vec_id, c.e, s.seed_id,
                   {_sql_cos_of('c.e', 's.se')} AS sc,
                   row_number() OVER (PARTITION BY c.vec_id
                       ORDER BY {_sql_cos_of('c.e', 's.se')} DESC, s.seed_id)
                       AS rn
            FROM emb c CROSS JOIN seeds s)
        WHERE rn = 1),
    prs AS (
        SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
        FROM assigned a JOIN assigned b
          ON a.list_id = b.list_id AND a.vec_id < b.vec_id
        WHERE round({_sql_cos_of('a.e', 'b.e')}, 6) >= {_SEM_TAU}),
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM prs
        UNION ALL
        SELECT doc_b AS src, doc_a AS dst FROM prs),
    reach(v, u) AS (
        SELECT src, src FROM edges
        UNION
        SELECT r.v, e.dst FROM reach r JOIN edges e ON e.src = r.u),
    labels AS (SELECT v AS vec_id, min(u) AS label FROM reach GROUP BY v),
    member AS (
        SELECT a.vec_id, coalesce(l.label, a.vec_id) AS group_id, a.cc
        FROM assigned a LEFT JOIN labels l ON l.vec_id = a.vec_id),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY group_id
                      ORDER BY cc ASC, vec_id) AS rn
        FROM member)
    SELECT vec_id, group_id, cc AS cosine_to_centroid,
           CAST(CASE WHEN rn = 1 THEN 1 ELSE 0 END AS INT) AS keep
    FROM ranked
""")
def semantic_dedup_seeded(spark, sf_dir):
    """Gate form of `semantic_dedup` (SemDeDup) with a DETERMINISTIC
    seed codebook — the `_SEM_NLIST` lowest vec_ids' raw vectors,
    list_id = seed vec_id (the `emb_ivf_topk` convention): Lloyd
    refinement averages float sums whose summation order is
    engine-specific, so the gate pins the full downstream pipeline
    instead — kernel cluster assignment (`_nearest_assign` argmax, ties
    to lowest list id), within-cluster pairwise kernel at
    tau={_SEM_TAU}, connected components over the duplicate pairs, and
    the paper's keep rule (least-similar-to-centroid, then lowest
    vec_id) — against a recursive-CTE transitive-closure SQL twin.
    Lloyd convergence itself is property-tested (TestIvfTrain);
    `semantic_dedup`'s kernels are ALSO differentially tested against
    an independent numpy implementation (test_semdedup.py)."""
    t = load_tables(spark, sf_dir, ("embeddings",))
    emb = t["embeddings"]
    vecs = emb.select("vec_id",
                      F.col("embedding").cast("array<double>").alias("e"))
    cb = (vecs.orderBy("vec_id").limit(_SEM_NLIST)
          .select(F.col("vec_id").cast("int").alias("list_id"),
                  F.col("e").alias("centroid")))
    return semantic_dedup(emb, tau=_SEM_TAU, codebook=cb)


# ---------------------------------------------------------------------------
# Text -> vector bridge: hashing-trick TF-IDF embeddings
# ---------------------------------------------------------------------------

def fit_tfidf_stats(docs: DataFrame, text_col: str = "text",
                    min_df: int = 1,
                    max_df_frac: float | None = None) -> DataFrame:
    """Fit the FROZEN vocabulary statistics for `hashed_tfidf_vectors`:
    one row per retained word ``(word, df)`` plus one ``(NULL, N)`` row
    carrying the document count (the LM model's OOV-row pattern, so the
    whole artifact is one persistable frame). Embedding different
    batches under the SAME stats frame yields comparable vectors —
    identical text always embeds identically — which is what any
    cross-batch consumer (the day-2 member store, an ANN index) needs;
    per-batch statistics drift with batch composition and silently
    break store comparisons (an exact duplicate can land at cosine
    ~0.97 under tau 0.99 purely from df differences). Fit once on a
    representative sample, persist as parquet next to the codebook,
    reuse for every batch. Words outside the fitted vocabulary are
    DROPPED at embed time (the fitted-vectorizer transform contract),
    so apply ``min_df``/``max_df_frac`` here, at fit."""
    from .dedup import _spark_words

    words = docs.select(
        F.col("doc_id"),
        F.explode(_spark_words(F.col(text_col))).alias("word")) \
        .where(F.col("word") != "")
    dfreq = (words.distinct().groupBy("word")
             .agg(F.count("*").alias("df")))
    n = docs.agg(F.countDistinct("doc_id").alias("n_docs"))
    if min_df > 1:
        dfreq = dfreq.where(F.col("df") >= min_df)
    if max_df_frac is not None:
        dfreq = dfreq.crossJoin(F.broadcast(n)) \
            .where(F.col("df") <= F.col("n_docs") * max_df_frac) \
            .drop("n_docs")
    n_row = n.select(F.lit(None).cast("string").alias("word"),
                     F.col("n_docs").cast("long").alias("df"))
    return dfreq.select("word", F.col("df").cast("long")) \
        .unionByName(n_row)


def hashed_tfidf_vectors(docs: DataFrame, dim: int = 256,
                         text_col: str = "text",
                         min_df: int = 1,
                         max_df_frac: float | None = None,
                         stats: DataFrame | None = None) -> DataFrame:
    """Deterministic document embeddings from raw text with NO external
    model: the feature-hashing trick (Weinberger et al. 2009) over
    smoothed TF-IDF — each token hashes to one of ``dim`` buckets with
    a ±1 sign bit (the sign unbiases hash collisions in expectation),
    weights are ``tf · (ln((N+1)/(df+1)) + 1)``, and the per-doc dense
    vector is L2-normalized. Returns ``(vec_id, embedding
    array<double>)`` — directly consumable by every operator in this
    module (`semantic_dedup`, `cosine_topk`, `ivf`, `near_dup_pairs`),
    closing the text → similarity loop without an embedding service.
    Token-less documents (empty/whitespace text) emit NO row — they
    carry no similarity signal; left-join and flag if you need them.

    Scale shape (all JVM-side, zero UDFs): one tokenize pass → (doc,
    word) tf aggregation → word-keyed df join (word space is zipfian
    but BOUNDED — the df frame is vocabulary-sized) → (doc, bucket)
    aggregation → one map-backed dense materialization per doc. The
    only corpus-sized shuffles are keyed (doc, word) and (doc, bucket);
    the N-doc count rides a 1-row broadcast. ``dim`` is a memory/recall
    knob: 256 doubles = 2 KB per doc.

    Vocabulary-tail knobs for the 100 TB corpus: ``min_df`` drops terms
    seen in fewer than that many documents BEFORE the feature join —
    the zipfian hapax tail is most of the distinct-word count but
    contributes only near-orthogonal noise to the vectors — and
    ``max_df_frac`` drops terms appearing in more than that fraction
    of documents (stopwords carry ~zero idf weight anyway; dropping
    them shrinks the join's build side). Both default off/1 so small-
    corpus results are knob-free.

    ``stats``: a frozen `fit_tfidf_stats` frame. When given, df/N come
    from IT (words outside the fitted vocabulary drop; ``min_df``/
    ``max_df_frac`` are ignored — they were applied at fit), so the
    same text embeds identically in every batch — REQUIRED whenever
    vectors from different runs are compared (member stores, indexes).
    Without it, statistics are corpus-local: fine for one-shot
    whole-corpus dedup, wrong for incremental use."""
    from .dedup import _spark_hash60, _spark_words

    # NO healing spread here — measured WORSE at sf0.1 (1.87 → 2.61 on
    # the embed gate, within-session interleaved A/B, r11): the md5
    # rides the vocabulary-sized build side (below), so the per-row
    # scan work is just split+explode — the same too-light-to-heal
    # class as BM25's scan (retrieval.py) — and the corpus-local path's
    # doubled tf reference makes the healing exchange pay twice
    words = docs.select(
        F.col("doc_id"),
        F.explode(_spark_words(F.col(text_col))).alias("word")) \
        .where(F.col("word") != "")   # split("") yields one empty token
    tf = words.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    if stats is not None:
        # single-reference plan: tf joins the stats frame once (AQE
        # broadcasts it while the fitted vocabulary is under the
        # threshold; past that it is a word-keyed shuffle — the
        # corpus-sized tf side is scanned ONCE either way, the
        # production per-batch property)
        dfreq = stats.where(F.col("word").isNotNull()) \
            .select("word", "df")
        n = stats.where(F.col("word").isNull()) \
            .select(F.col("df").alias("n_docs"))
    else:
        # corpus-local statistics reference tf TWICE (the feature rows
        # and the df aggregation), so this path tokenizes the corpus
        # twice per materialization — measured the CHEAPER trade at
        # sf0.1 (caching tf cost +14%: columnar cache encode exceeds
        # the second tokenize, the same measurement behind
        # `dedup._scoped_cache`'s lazy-fill note). At 100 TB don't use
        # this path repeatedly at all: fit once (`fit_tfidf_stats`),
        # persist, embed under ``stats`` — the single-scan shape above.
        dfreq = tf.groupBy("word").agg(F.count("*").alias("df"))
        n = docs.agg(F.countDistinct("doc_id").alias("n_docs"))
        if min_df > 1:
            dfreq = dfreq.where(F.col("df") >= min_df)
        if max_df_frac is not None:
            dfreq = dfreq.crossJoin(F.broadcast(n)) \
                .where(F.col("df") <= F.col("n_docs") * max_df_frac) \
                .drop("n_docs")

    h = _spark_hash60(F.col("word"))
    bucket = F.pmod(h, F.lit(dim)).cast("int")
    # sign from the hash's TOP bit (integer ops only — double division
    # of a 60-bit value loses parity past 2^53), independent of the
    # low-bit bucket
    sign = F.when(F.shiftright(h, 59) % 2 == 0, F.lit(1.0)) \
            .otherwise(F.lit(-1.0))
    # bucket/sign ride the VOCABULARY-sized dfreq frame, not the
    # corpus-sized tf frame: h is a pure function of the word, so
    # computing the md5 on the join's build side drops the per-row
    # hash count from |corpus (doc, word) pairs| to |vocabulary| —
    # exactly the oracle's own shape (its `hashed` CTE is DISTINCT
    # word). Values are bit-identical (r11 opt round, guide §1.2
    # per-task work).
    dfreq = dfreq.select("word", "df", bucket.alias("__b"),
                         sign.alias("__sign"))
    idf = F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + 1
    feat = (tf.join(dfreq, "word")
            .crossJoin(F.broadcast(n))
            .select("doc_id", F.col("__b").alias("b"),
                    (F.col("__sign") * F.col("tf") * idf).alias("w")))
    byb = feat.groupBy("doc_id", "b").agg(F.sum("w").alias("w"))
    dense = (byb.groupBy("doc_id")
             .agg(F.map_from_entries(
                 F.collect_list(F.struct("b", "w"))).alias("m"))
             .select(F.col("doc_id").alias("vec_id"),
                     F.transform(
                         F.sequence(F.lit(0), F.lit(dim - 1)),
                         lambda i: F.coalesce(F.element_at("m", i),
                                              F.lit(0.0))).alias("raw")))
    norm = F.sqrt(F.aggregate("raw", F.lit(0.0),
                              lambda acc, x: acc + x * x))
    return dense.select(
        "vec_id",
        F.when(norm > 0,
               F.transform("raw", lambda x: x / norm))
         .otherwise(F.col("raw")).alias("embedding"))


_EMBED_DIM = 32   # gate-row vector width (compact: 500 docs × 32 buckets)

_SQL_WORD_HASH60 = (
    "CAST(list_sum(list_transform(generate_series(1, 15), "
    "i -> (strpos('0123456789abcdef', substr(md5(word), i, 1)) - 1)::BIGINT"
    " << (4 * (15 - i)))) AS BIGINT)")


@query("text_hashed_tfidf_embed", oracle=f"""
    WITH words_t AS (
        SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+'))
               AS word
        FROM documents),
    w2 AS (SELECT doc_id, word FROM words_t WHERE word <> ''),
    tf AS (SELECT doc_id, word, count(*) AS tf FROM w2
           GROUP BY doc_id, word),
    dfreq AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
    n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
    hashed AS (
        SELECT word, {_SQL_WORD_HASH60} AS h
        FROM (SELECT DISTINCT word FROM w2)),
    feat AS (
        SELECT tf.doc_id,
               CAST(h % {_EMBED_DIM} AS INT) AS b,
               (CASE WHEN (h >> 59) % 2 = 0 THEN 1.0 ELSE -1.0 END)
                 * tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1) AS w
        FROM tf JOIN dfreq USING (word) JOIN hashed USING (word)
        CROSS JOIN n),
    byb AS (SELECT doc_id, b, sum(w) AS w FROM feat GROUP BY doc_id, b),
    nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS nm FROM byb
            GROUP BY doc_id),
    grid AS (
        SELECT d.doc_id, g.bucket
        FROM (SELECT DISTINCT doc_id FROM byb) d
        CROSS JOIN (SELECT unnest(generate_series(0, {_EMBED_DIM - 1}))
                    AS bucket) g)
    SELECT g.doc_id AS vec_id, CAST(g.bucket AS INT) AS bucket,
           round(coalesce(byb.w, 0)
                 / (CASE WHEN nrm.nm > 0 THEN nrm.nm ELSE 1 END), 6) AS w
    FROM grid g
    LEFT JOIN byb ON byb.doc_id = g.doc_id AND byb.b = g.bucket
    JOIN nrm ON nrm.doc_id = g.doc_id
""")
def text_hashed_tfidf_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate form of `hashed_tfidf_vectors` — the text→vector bridge that
    feeds every text-similarity flow — exploded to one row per (doc,
    bucket) so the driver value-hash pins the WHOLE arithmetic chain:
    whitespace tokenization, the portable md5 60-bit word hash, bucket
    = h mod dim, the ±1 top-bit sign, smoothed idf ``ln((N+1)/(df+1))
    + 1``, the per-(doc, bucket) signed sum, and L2 normalization.
    Everything is exact integer/md5 arithmetic except the float
    products/sums, which are summation-order noise (~1e-16 relative)
    under the 1e-6 rounding — the same tolerance discipline as the
    cosine gate rows. Token-less documents emit no row on either side
    (no similarity signal — the operator's documented contract)."""
    t = load_tables(spark, sf_dir, ("documents",))
    emb = hashed_tfidf_vectors(t["documents"].select("doc_id", "text"),
                               dim=_EMBED_DIM)
    return (emb.select("vec_id", F.posexplode("embedding"))
            .select("vec_id", F.col("pos").cast("int").alias("bucket"),
                    F.round("col", 6).alias("w")))


def text_semantic_dedup(docs: DataFrame, dim: int = 256, tau: float = 0.9,
                        nlist: int = 8, text_col: str = "text",
                        stats: DataFrame | None = None,
                        **kwargs) -> DataFrame:
    """`semantic_dedup` straight over raw text: hashing-trick TF-IDF
    embeddings feed the SemDeDup pipeline, so paraphrase-level
    near-dups (shared vocabulary, shuffled order) cluster without any
    external embedding model. Output contract = `semantic_dedup` with
    ``vec_id`` = ``doc_id``. Corpus-local statistics are correct here
    (one corpus, one pass); pass a `fit_tfidf_stats` frame as ``stats``
    only when these vectors must stay comparable to vectors from OTHER
    runs. The embedding DAG is scope-cached inside `semantic_dedup`, so
    the tokenize + shuffle pipeline materializes ONCE across the
    training/pair/member actions (round-6 finding: un-persisted it
    recomputed ~5-6×). At 100 TB: persist the embedding frame once
    (parquet), reuse for dedup AND ANN serving."""
    return semantic_dedup(
        hashed_tfidf_vectors(docs, dim, text_col, stats=stats),
        nlist=nlist, tau=tau, **kwargs)


# ---------------------------------------------------------------------------
# Incremental (day-2) semantic dedup against a persisted member store
# ---------------------------------------------------------------------------

def semantic_member_store(emb: DataFrame,
                          codebook: DataFrame) -> DataFrame:
    """Build the persistable SemDeDup member store: one row per retained
    vector, ``(vec_id, list_id, e)`` — the vector assigned once to its
    codebook cluster. Persist as parquet bucketed by ``list_id``
    (`sources/bucketed.py`) and the day-2 probe join co-locates with no
    store-side shuffle, exactly like the MinHash signature store; the
    codebook itself (nlist rows) persists beside it and must be REUSED
    for every subsequent batch — assignments under a retrained codebook
    are not comparable.

    Lifecycle: `incremental_semantic_dedup` appends kept vectors every
    batch, so at day-N a popular cluster grows until the
    ``max_list_size`` guard starts dropping its HISTORY from the probe
    (bounded work, lost matches). Run :func:`compact_semantic_store` on
    a schedule (the `compact_paragraph_store` pattern) to collapse
    mutually-near members to representatives BEFORE the cap ever
    bites — compaction keeps the matches the cap would have dropped."""
    vecs = emb.select("vec_id",
                      F.col("embedding").cast("array<double>").alias("e"))
    cb = [(r.list_id, list(r.centroid)) for r in codebook.collect()]
    return _nearest_assign(vecs, cb).select("vec_id", "list_id", "e")


def compact_semantic_store(store: DataFrame, tau_compact: float = 0.99,
                           max_cluster_size: int | None = None
                           ) -> DataFrame:
    """Bound day-N growth of a `semantic_member_store`: within each
    list, members that are mutually cosine-≥``tau_compact`` collapse to
    ONE representative (the minimum ``vec_id`` of the connected
    component — the oldest member, so representative identity is stable
    across compactions). Returns the same ``(vec_id, list_id, e)``
    schema, ready to persist over the old store.

    Why this beats the cap: ``max_list_size`` on the probe side DROPS
    an oversized cluster wholesale — bounded work, but every history
    match in it is silently lost. A flooded cluster is flooded
    precisely because its members are near-identical, which is exactly
    what compaction removes: the flood collapses to ~1 row, the list
    drops back under the cap, and future probes still hit the
    representative. Run it append-heavy-store → compact on a schedule,
    the `compact_paragraph_store` rhythm.

    Recall contract: set ``tau_compact`` ≥ the probe ``tau``. Dropping
    member d because rep r has cos(r, d) ≥ tau_compact loses a future
    probe v only when cos(v, d) ≥ tau but cos(v, r) < tau — possible in
    the angular sliver θ(v,r) ≤ θ(v,d) + θ(d,r), which shrinks to zero
    as tau_compact → 1 (exact-dup compaction is lossless). The same
    trade `_cluster_pairs` documents for its split guard.

    Scale: one list_id-keyed shuffle into the per-cluster BLAS pair
    kernel (``max_cluster_size`` passes through to its split/star-probe
    guard — a degenerate flood costs O(m), not O(m²)), components over
    the near-dup edge subgraph only, one hash anti-join to drop the
    non-representatives. The member projection is scope-cached: the
    pair kernel's component checkpoint and the final anti-join both
    consume it, and a lineage-backed store (a text bridge under test,
    a remote scan) would otherwise recompute its upstream per action
    (the same multi-consumer class as `semantic_dedup`'s cache)."""
    from .dedup import _scoped_cache, connected_components

    members = _scoped_cache(store.select("vec_id", "list_id", "e"))
    pairs = _cluster_pairs(members, tau_compact, max_cluster_size)
    dropped = (connected_components(pairs)
               .where(F.col("label") != F.col("doc_id"))
               .select(F.col("doc_id").alias("vec_id")))
    return members.join(dropped, "vec_id", "left_anti")


def incremental_semantic_dedup(new_emb: DataFrame, store: DataFrame,
                               codebook: DataFrame, tau: float = 0.99,
                               max_list_size: int | None = None
                               ) -> tuple[DataFrame, DataFrame]:
    """Day-2 SemDeDup: check a new batch of embeddings against HISTORY
    (a `semantic_member_store`) and against ITSELF without re-scoring
    any historical pair. Returns ``(annotated, updated_store)``:
    ``annotated`` has one row per new vector — ``vec_id, list_id,
    dup_of_history (nullable), batch_group, keep`` — keeping a vector
    iff no stored member of its cluster is cosine-≥``tau`` AND it is
    the minimum-id member of its within-batch duplicate group;
    ``updated_store`` appends only the kept vectors, so replaying a
    batch (disjoint ids) adds nothing — the same idempotence contract
    as `incremental.incremental_dedup`.

    Scale shape: new vectors assign via the zero-shuffle literal-
    codebook kernel; new-vs-history scores run as ONE cogrouped BLAS
    kernel per cluster (new m × stored n matmul — each side crosses the
    Arrow boundary once, keyed by ``list_id`` so a bucketed store scans
    in place); new-vs-new reuses `_cluster_pairs`. ``max_list_size``
    (default off) guards the degenerate-cluster hazard ASYMMETRICALLY:
    the STORE side (where accumulation makes a flood realistic) drops
    oversized clusters and logs them (`dedup.cap_group_size`) — their
    history matches are lost, bounded work is kept; the BATCH side is
    NEVER dropped (the one-row-per-new-vector contract above must
    hold — a dropped batch row would be neither kept nor rejected, and
    a streaming caller would mis-admit it), so within-batch pairs ride
    `_cluster_pairs`' split-don't-drop guard instead (sign-LSH subkey
    split, star-probe fallback). Scale ``nlist`` with the corpus to
    keep expected list size constant."""
    from .dedup import _scoped_cache, cap_group_size, connected_components

    cb = [(r.list_id, list(r.centroid)) for r in codebook.collect()]
    new_vecs = new_emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e"))
    # Scoped-cache the assigned batch: it feeds FOUR consumers (the
    # history cogroup, the within-batch pair kernel, the annotation
    # join, the kept-rows store append) plus connected_components'
    # eager checkpoint action — un-persisted, each consumer recomputes
    # the batch embedding DAG upstream (for a text bridge: the full
    # tokenize + shuffles — the same recompute class as the round-6
    # text_semantic_dedup finding, fixed the same way).
    assigned = _scoped_cache(_nearest_assign(new_vecs, cb)
                             .select("vec_id", "list_id", "e"))
    hist = store.select("vec_id", "list_id", "e")
    if max_list_size is not None:
        hist = cap_group_size(hist, ["list_id"], max_list_size,
                              "incremental_semantic_dedup[store]")

    def _cross(new_pdf: pd.DataFrame,
               hist_pdf: pd.DataFrame) -> pd.DataFrame:
        if new_pdf.empty or hist_pdf.empty:
            return pd.DataFrame({"doc_b": pd.Series([], dtype="int64"),
                                 "doc_a": pd.Series([], dtype="int64")})
        En = np.vstack(new_pdf["e"].to_numpy())
        Eh = np.vstack(hist_pdf["e"].to_numpy())
        for E in (En, Eh):
            n = np.linalg.norm(E, axis=1)
            n[n == 0.0] = 1.0
            E /= n[:, None]
        s = En @ Eh.T                         # new m × hist n cosines
        bi, hi = np.nonzero(np.round(s, 6) >= tau)
        return pd.DataFrame({
            "doc_b": new_pdf["vec_id"].to_numpy()[bi],
            "doc_a": hist_pdf["vec_id"].to_numpy()[hi]})

    hist_pairs = (assigned.select("list_id", "vec_id", "e")
                  .groupBy("list_id")
                  .cogroup(hist.select("list_id", "vec_id", "e")
                           .groupBy("list_id"))
                  .applyInPandas(_cross, "doc_b long, doc_a long"))
    hist_hit = hist_pairs.groupBy(F.col("doc_b").alias("vec_id")) \
        .agg(F.min("doc_a").alias("dup_of_history"))

    batch_pairs = _cluster_pairs(assigned, tau,
                                 max_cluster_size=max_list_size)
    groups = connected_components(batch_pairs) \
        .withColumnRenamed("doc_id", "vec_id") \
        .withColumnRenamed("label", "batch_group")

    annotated = (assigned.select("vec_id", "list_id")
                 .join(hist_hit, "vec_id", "left")
                 .join(groups, "vec_id", "left")
                 .select("vec_id", "list_id", "dup_of_history",
                         F.coalesce("batch_group", "vec_id")
                         .alias("batch_group"))
                 .withColumn("keep",
                             (F.col("dup_of_history").isNull() &
                              (F.col("batch_group") == F.col("vec_id")))
                             .cast("int")))
    kept = assigned.join(
        annotated.where(F.col("keep") == 1).select("vec_id"), "vec_id") \
        .select("vec_id", "list_id", "e")
    return annotated, store.select("vec_id", "list_id", "e") \
                           .unionByName(kept)
