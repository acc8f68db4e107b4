"""Length-bucketed dynamic batching — the inference/eval counterpart
of `corpus.pack_sequences`: group sequences of similar length into
fixed-count batches so that padding-to-batch-max wastes as little
accelerator time as possible (the bucketed-batching discipline every
serving stack applies; arrival-order batching pads every sequence to
the batch's longest straggler).

Two operators:
- `length_bucketed_batches` — per-sequence assignment: a power-of-two
  LENGTH BAND (integer bit-length of the token count — never
  float log2, whose cross-engine ceil is a known ulp trap), a salted-
  hash rank WITHIN the band (deterministic batch composition,
  reproducible from the salt alone), and the batch id
  ``(rank-1) // batch_size``.
- `batch_padding_report` — the per-batch cost frame: sequences, max
  length (the pad target), real tokens, padding tokens, and the pad
  fraction — the number that justifies the bucketing (compare against
  one band = arrival-order batching).

Scale shape: the within-band rank is `ordering._grouped_rank` — the
two-level bucketed form whose window partitions hold ~1/n_buckets of a
band, never a whole band (per-(band, bucket) counts give the offsets
via a bounded summary window). The report is one aggregation keyed by
(band, batch) — |batches| rows out. NULL text is flag-don't-drop: it
counts 0 tokens and batches in band 0 with the other empties.

Reference: no counterpart (the reference has no loader surface);
LLM-data-pipeline mandate, sibling of `corpus.pack_sequences` (train
packing) and `ordering.py` (train order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import make_registry
from .tables import load_tables

QUERIES, ORACLES, query = make_registry()

_DEFAULT_BUCKETS = 4096


def _band(n_tokens):
    """Power-of-two length band: the INTEGER bit-length of the token
    count (band b holds lengths [2^(b-1), 2^b - 1]; 0 tokens → band 0).
    Computed as the length of the binary string — exact integer
    arithmetic on both engines, immune to the ceil(log2(2^k)) ulp flip
    a libm log2 can produce."""
    return (F.when(n_tokens <= 0, F.lit(0))
            .otherwise(F.length(F.conv(n_tokens.cast("string"),
                                       10, 2))).cast("int"))


def length_bucketed_batches(docs: DataFrame, *, batch_size: int = 32,
                            text_col: str = "text",
                            tokens_col: str | None = None,
                            salt: str = "lbb:",
                            n_buckets: int = _DEFAULT_BUCKETS,
                            id_col: str = "doc_id") -> DataFrame:
    """``(id, n_tokens, band, batch_rank, batch_id)`` — each sequence's
    length band, its deterministic rank within the band (salted hash;
    new salt = new batch composition), and its batch. Token cost is
    `mixture._token_expr`'s convention (whitespace count, or a caller-
    supplied real-tokenizer ``tokens_col``; NULL text costs 0) so
    batching agrees with the composition family's budgets."""
    if batch_size < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}")
    from .mixture import _token_expr
    from .ordering import _check_buckets, _grouped_rank
    _check_buckets(n_buckets)
    d = docs.withColumn("n_tokens", _token_expr(text_col, tokens_col)) \
            .withColumn("band", _band(F.col("n_tokens")))
    ranked = _grouped_rank(d, "band", salt, n_buckets, id_col,
                           "batch_rank")
    return (ranked.withColumn(
        "batch_id",
        F.call_function("div", F.col("batch_rank") - 1,
                        F.lit(batch_size)).cast("long"))
        .select(id_col, "n_tokens", "band", "batch_rank", "batch_id"))


def batch_padding_report(assigned: DataFrame) -> DataFrame:
    """``(band, batch_id, n_seqs, max_len, n_tokens, pad_tokens,
    pad_frac)`` over a `length_bucketed_batches` frame: every batch
    pads to its own max, so ``pad_tokens = n_seqs·max_len − Σ tokens``
    and ``pad_frac`` is the wasted fraction of the batch's compute
    (0.0 for an all-empty batch — its capacity is 0, guarded, never
    0/0). One aggregation, |batches| rows out; ``pad_frac`` is one
    IEEE division of exact integers, so round(6) is cross-engine
    stable."""
    cap = F.col("n_seqs") * F.col("max_len")
    return (assigned.groupBy("band", "batch_id")
            .agg(F.count("*").alias("n_seqs"),
                 F.max("n_tokens").alias("max_len"),
                 F.sum("n_tokens").alias("n_tokens"))
            .select("band", "batch_id", "n_seqs", "max_len",
                    F.col("n_tokens").cast("long").alias("n_tokens"),
                    (cap - F.col("n_tokens")).cast("long")
                    .alias("pad_tokens"),
                    F.when(cap > 0,
                           F.round((cap - F.col("n_tokens"))
                                   .cast("double") / cap.cast("double"),
                                   6))
                    .otherwise(F.lit(0.0)).alias("pad_frac")))


# ---------------------------------------------------------------------------
# Gate query + DuckDB oracle (the naive one-level per-band window)
# ---------------------------------------------------------------------------

_GATE_BATCH = 8


def _oracle() -> str:
    from .corpus import _sql_salted_h60
    return f"""
    WITH t AS (
        SELECT doc_id,
               CASE WHEN text IS NULL THEN 0
                    ELSE len(string_split_regex(trim(text), '\\s+'))
               END AS n_tokens,
               {_sql_salted_h60('lbb:')} AS h
        FROM documents),
    b AS (
        SELECT doc_id, n_tokens, h,
               CASE WHEN n_tokens <= 0 THEN 0
                    ELSE length(bin(n_tokens)) END AS band
        FROM t),
    r AS (
        SELECT doc_id, n_tokens, band,
               row_number() OVER (PARTITION BY band
                                  ORDER BY h, doc_id) AS batch_rank
        FROM b),
    a AS (
        SELECT band, (batch_rank - 1) // {_GATE_BATCH} AS batch_id,
               n_tokens
        FROM r)
    SELECT CAST(band AS INT) AS band,
           CAST(batch_id AS BIGINT) AS batch_id,
           CAST(count(*) AS BIGINT) AS n_seqs,
           CAST(MAX(n_tokens) AS BIGINT) AS max_len,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           CAST(count(*) * MAX(n_tokens) - SUM(n_tokens) AS BIGINT)
               AS pad_tokens,
           CASE WHEN count(*) * MAX(n_tokens) > 0 THEN
               round(CAST(count(*) * MAX(n_tokens) - SUM(n_tokens)
                          AS DOUBLE)
                     / CAST(count(*) * MAX(n_tokens) AS DOUBLE), 6)
           ELSE 0.0 END AS pad_frac
    FROM a GROUP BY 1, 2
    """


@query("length_bucketed_batching", oracle=_oracle())
def length_bucketed_batching(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Gate row for the batching family: documents bucketed into
    power-of-two length bands and batches of {8}, the per-batch padding
    cost frame value-pinned against DuckDB's naive per-band window (the
    one-partition-per-band plan `_grouped_rank` refuses at scale).
    Registered past the 50-slot gate window
    (``__spark_entry__._PAST_WINDOW``)."""
    t = load_tables(spark, sf_dir, ("documents",))
    d = t["documents"].select("doc_id", "text")
    assigned = length_bucketed_batches(d, batch_size=_GATE_BATCH)
    out = batch_padding_report(assigned)
    return out.select("band",
                      F.col("batch_id").cast("long").alias("batch_id"),
                      "n_seqs",
                      F.col("max_len").cast("long").alias("max_len"),
                      "n_tokens", "pad_tokens", "pad_frac")
