"""Term co-occurrence and pointwise mutual information — the word-
association read of the corpus-diagnostics family (`zipf.py` fits
the frequency law, `observe.py` tracks distribution drift; this
answers "which terms travel together?"): document-level
co-occurrence counts over a bounded top-V vocabulary with PMI
scores, the classic collocation / topic-coherence statistic (Church
& Hanks 1990) used to sanity-check corpus composition and to build
term-association features.

Definitions: the vocabulary is the top ``v`` terms by DOCUMENT
frequency (ties break on term asc — a deterministic cut);
``n_pair(a,b)`` counts documents containing BOTH terms (unordered,
``a < b``), ``n_a``/``n_b`` count documents containing each, and
``PMI = ln(N·n_pair / (n_a·n_b))`` over N = all document rows. All
counts are exact longs; the single ``ln`` runs on the identical
double both sides and rounds to 6 (the `zipf._fit` precedent).
Tokenization is the corpus convention: lower(trim(text)) split on
whitespace, NULL text yields no tokens.

Scale (100 TB): the vocabulary cut is a TakeOrdered over the
document-frequency summary (v rows to the driver-side plan, never
the vocabulary); the incidence frame is filtered to the BROADCAST
vocabulary BEFORE the self-join (the `retrieval.bm25` hit-only
discipline), so the doc_id equi-join fans out at most v terms per
document — the pair space is ≤ v²/2 cells regardless of corpus
size, and the per-doc expansion is v-bounded even for a document
containing the whole vocabulary.

Reference: no counterpart; LLM-data-pipeline mandate, sibling of
zipf.py / observe.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import make_registry
from .tables import load_tables, spread

QUERIES, ORACLES, query = make_registry()

_GATE_V = 48
_SQL_WORDS = "string_split_regex(lower(trim(text)), '\\s+')"


def term_cooccurrence(docs: DataFrame, *, v: int = _GATE_V,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """``(term_a, term_b, n_pair, n_a, n_b, pmi)`` for every
    unordered pair of top-v-document-frequency terms co-occurring in
    at least one document."""
    if v < 2:
        raise ValueError(f"v must be >= 2 (pairs need it), got {v}")
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    # per-doc array_distinct replaces the corpus-wide .distinct():
    # doc_id is unique in the corpus convention, so deduping within the
    # token array IS the (doc_id, term) distinct — zero shuffle instead
    # of a full-corpus exchange, and dfreq's groupBy collapses map-side
    # (r11; the old distinct was the query's only corpus-sized shuffle)
    inc_all = (spread(docs)
               .select(F.col(id_col).alias("doc_id"),
                       F.explode(F.array_distinct(words)).alias("term")))
    dfreq = inc_all.groupBy("term").agg(F.count("*").alias("n_doc"))
    # NOT cached, although the static plan re-plans the incidence scan
    # under dfreq, both self-join sides and the ca/cb vocab lookups
    # (6 Generate nodes): runtime exchange reuse dedupes them at
    # dfreq's term exchange and the self-join's doc_id exchanges, and
    # scoped caches on vocab+inc measured WORSE (1.28 → 1.42 s,
    # within-session interleaved A/B, r11 — the materialization
    # barrier and columnar encode beat the recompute they save; the
    # ordering.py / pagerank lesson again).
    vocab = (dfreq.orderBy(F.col("n_doc").desc(), "term").limit(v)
             .select("term", "n_doc"))
    inc = inc_all.join(F.broadcast(vocab.select("term")), "term")
    a = inc.select("doc_id", F.col("term").alias("term_a"))
    b = inc.select("doc_id", F.col("term").alias("term_b"))
    pairs = (a.join(b, "doc_id")
             .filter(F.col("term_a") < F.col("term_b"))
             .groupBy("term_a", "term_b")
             .agg(F.count("*").cast("long").alias("n_pair")))
    n_docs = docs.agg(F.count("*").cast("long").alias("__nd"))
    ca = vocab.select(F.col("term").alias("term_a"),
                      F.col("n_doc").cast("long").alias("n_a"))
    cb = vocab.select(F.col("term").alias("term_b"),
                      F.col("n_doc").cast("long").alias("n_b"))
    pmi = F.log((F.col("__nd") * F.col("n_pair")).cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double"))
    return (pairs.join(F.broadcast(ca), "term_a")
            .join(F.broadcast(cb), "term_b")
            .crossJoin(F.broadcast(n_docs))
            .select("term_a", "term_b", "n_pair", "n_a", "n_b",
                    F.round(pmi, 6).alias("pmi")))


# ---------------------------------------------------------------------------
# Gate query + DuckDB oracle
# ---------------------------------------------------------------------------


def _sql_cooc() -> str:
    return f"""
    WITH inc_all AS (SELECT DISTINCT doc_id, word AS term
                     FROM (SELECT doc_id, unnest({_SQL_WORDS}) AS word
                           FROM documents)),
    dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS n_doc
              FROM inc_all GROUP BY term),
    vocab AS (SELECT term, n_doc FROM dfreq
              ORDER BY n_doc DESC, term LIMIT {_GATE_V}),
    inc AS (SELECT i.doc_id, i.term
            FROM inc_all i JOIN vocab v ON i.term = v.term),
    pairs AS (SELECT a.term AS term_a, b.term AS term_b,
                     CAST(count(*) AS BIGINT) AS n_pair
              FROM inc a JOIN inc b
                ON a.doc_id = b.doc_id AND a.term < b.term
              GROUP BY a.term, b.term),
    nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents)
    SELECT p.term_a, p.term_b, p.n_pair,
           va.n_doc AS n_a, vb.n_doc AS n_b,
           round(ln(CAST((SELECT n FROM nd) * p.n_pair AS DOUBLE)
                    / CAST(va.n_doc * vb.n_doc AS DOUBLE)), 6) AS pmi
    FROM pairs p
    JOIN vocab va ON p.term_a = va.term
    JOIN vocab vb ON p.term_b = vb.term
    """


@query("term_cooccurrence_pmi", oracle=_sql_cooc())
def term_cooccurrence_pmi(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """Gate row for term association: document-level co-occurrence of
    the top-48-document-frequency terms with 6-dp PMI — pair counts,
    marginals, and scores all value-pinned against DuckDB running the
    identical vocabulary cut and join. Registered PAST the driver's
    50-slot window."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"] \
        .select("doc_id", "text")
    return term_cooccurrence(docs, v=_GATE_V)
