"""Token-balanced training-shard writer — the output stage of a corpus
pipeline: split a scored/packed corpus into ``n_shards`` parquet shards
whose TOKEN totals (not row counts) are balanced, deterministically.

Plain ``pmod(hash(key), n_shards)`` balances row counts in expectation
but token totals only if document lengths are i.i.d. — real corpora are
heavy-tailed, and a trainer reading shards in lockstep is paced by the
largest one. The engine uses the two-level pattern Spark's own range
partitioner uses (sample/summarize driver-side, partition executor-side):

1. hash every row into ``n_buckets`` micro-buckets (``n_buckets`` is a
   knob independent of corpus size — 4096 summaries describe a 100 TB
   corpus as well as a 100 MB one);
2. aggregate per-bucket token totals — ONE map-side-combined shuffle of
   ``n_buckets`` tiny rows — and collect them (the only driver
   materialization: bounded by the knob, never by data);
3. greedily assign buckets to shards, heaviest bucket first onto the
   currently-lightest shard (LPT scheduling — max shard exceeds the
   mean by at most the heaviest single bucket's weight);
4. broadcast the ``bucket → shard`` map back and write
   ``partitionBy("shard")``.

Every step is deterministic (xxhash64 is seeded-fixed; LPT ties break on
bucket then shard index), so re-running a write replays identical files
— the same replay-idempotence contract as the ReplacingMergeTree sink.
"""

from __future__ import annotations

import heapq

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEFAULT_BUCKETS = 1024


def balanced_shard_assign(df: DataFrame, weight_col: str, n_shards: int,
                          key_col: str = "doc_id",
                          n_buckets: int = _DEFAULT_BUCKETS,
                          shard_col: str = "shard",
                          strategy: str = "lpt",
                          bucket_col: str | None = None) -> DataFrame:
    """Annotate ``df`` with a ``shard_col`` column (0..n_shards-1)
    balancing ``sum(weight_col)`` per shard. All input columns survive;
    a clashing input column is an explicit error (pack_sequences e.g.
    already emits a ``shard`` packing-stream id — pass ``shard_col`` or
    rename rather than letting a silent overwrite eat data).

    Rows sharing ``key_col`` land in the same shard (bucket granularity),
    so a document's chunks never straddle shards.

    Two assignment strategies over the same bucket summaries, both with
    max-shard-overshoot bounded by the heaviest single bucket:

    - ``"lpt"`` (default): greedy longest-processing-time — heaviest
      bucket onto the currently-lightest shard. Tightest balance; the
      greedy loop runs driver-side over the ≤ ``n_buckets``-row summary
      (bounded by the knob, never by data).
    - ``"range"``: cumulative packing — buckets in bucket-id order,
      ``shard = (cum_weight_before * n_shards) div total`` (exact
      integer arithmetic; requires an integral, non-negative weight
      column such as a token count). Fully distributed — no collect at
      all (the cumulative window runs over the ``n_buckets``-row
      summary) — and closed-form SQL-expressible, which is what lets
      the driver's DuckDB oracle verify the assignment end-to-end
      (gate row `shard_assign_balanced`).

    ``bucket_col``: use a caller-computed bucket column (values must
    already be in ``[0, n_buckets)``) instead of the built-in
    ``pmod(xxhash64(key_col), n_buckets)`` — e.g. the portable
    md5-nibble hash when the assignment must reproduce outside Spark.
    The column survives in the output like any other input column."""
    if n_buckets < n_shards:
        raise ValueError(
            f"n_buckets ({n_buckets}) must be >= n_shards ({n_shards})")
    if shard_col in df.columns:
        raise ValueError(
            f"input already has a {shard_col!r} column "
            "(pack_sequences' packing-stream id?) — pass a different "
            "shard_col= or rename the input column")
    if strategy not in ("lpt", "range"):
        raise ValueError(f"unknown strategy {strategy!r} "
                         "(expected 'lpt' or 'range')")
    if bucket_col is not None:
        bucketed, bcol = df, bucket_col
    else:
        bcol = "_bucket"
        bucketed = df.withColumn(
            bcol, F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets))
            .cast("int"))

    if strategy == "range":
        from pyspark.sql.types import IntegralType
        if not isinstance(df.schema[weight_col].dataType, IntegralType):
            raise ValueError(
                f"strategy='range' needs an integral weight column "
                f"(exact cumulative division); {weight_col!r} is "
                f"{df.schema[weight_col].dataType.simpleString()}")
        from pyspark.sql import Window
        totals = (bucketed.groupBy(F.col(bcol).alias("_b"))
                  .agg(F.sum(F.col(weight_col).cast("long")).alias("_w")))
        # single-partition windows over <= n_buckets summary rows —
        # bounded by the knob, never by data (same scale contract as
        # the LPT collect)
        w_cum = Window.orderBy("_b").rowsBetween(
            Window.unboundedPreceding, -1)
        w_all = Window.orderBy("_b").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing)
        map_df = (totals
                  .select("_b",
                          F.coalesce(F.sum("_w").over(w_cum), F.lit(0))
                          .alias("_cumb"),
                          F.sum("_w").over(w_all).alias("_tot"))
                  .select("_b",
                          F.when(F.col("_tot") > 0,
                                 F.least(F.lit(n_shards - 1),
                                         F.expr(f"(_cumb * {n_shards})"
                                                " div _tot")))
                          .otherwise(F.lit(0))
                          .cast("int").alias(shard_col)))
    else:
        totals = (bucketed.groupBy(F.col(bcol).alias("_b"))
                  .agg(F.sum(weight_col).alias("_w"))
                  .collect())  # <= n_buckets rows: bounded driver summary
        # LPT: heaviest bucket first onto the lightest shard; heap
        # entries (load, shard) tie-break on shard index, bucket order
        # ties on id
        heap = [(0, s) for s in range(n_shards)]
        heapq.heapify(heap)
        mapping = []
        for row in sorted(totals,
                          key=lambda r: (-(r["_w"] or 0), r["_b"])):
            load, shard = heapq.heappop(heap)
            mapping.append((row["_b"], shard))
            heapq.heappush(heap, (load + (row["_w"] or 0), shard))
        spark = df.sparkSession
        map_df = spark.createDataFrame(mapping,
                                       f"_b int, {shard_col} int")
    joined = bucketed.join(
        F.broadcast(map_df),
        bucketed[bcol] == map_df["_b"]).drop("_b")
    return joined if bucket_col is not None else joined.drop(bcol)


def write_training_shards(df: DataFrame, path: str, weight_col: str,
                          n_shards: int, key_col: str = "doc_id",
                          order_cols: tuple[str, ...] = ("doc_id",),
                          n_buckets: int = _DEFAULT_BUCKETS,
                          shard_col: str = "shard",
                          shuffle_salt: str | None = None,
                          strategy: str = "lpt") -> DataFrame:
    """Write ``df`` to ``path`` as ``shard=N`` parquet partitions with
    balanced token totals and a deterministic row order inside each
    shard. Returns the per-shard summary ``(shard, n_rows, total_weight)``
    — the manifest a training job reads to pace its data loaders.

    ``shuffle_salt``: shuffle ONCE at materialization (the T5/GPT
    practice — training readers then stream shards sequentially): rows
    are ordered inside each shard by a salted hash of ``key_col``
    instead of ``order_cols``. Deterministic — the same salt replays
    the identical permutation (the replay-idempotence contract holds),
    a different salt is a fresh epoch-level reshuffle. Costs nothing
    over the sorted write: same single data-moving shuffle, the sort
    key is just a hash.

    One shuffle moves the data (``repartition`` on the shard id, so each
    shard is written by one task and stays one sorted run; at cluster
    scale with huge shards, ``repartitionByRange(shard, *order_cols)``
    splits a shard across tasks at the cost of multiple files per
    shard)."""
    assigned = balanced_shard_assign(df, weight_col, n_shards,
                                     key_col=key_col, n_buckets=n_buckets,
                                     shard_col=shard_col,
                                     strategy=strategy)
    if shuffle_salt is not None:
        order = [F.md5(F.concat(F.lit(shuffle_salt),
                                F.col(key_col).cast("string"))
                       .cast("binary")), F.col(key_col)]
    else:
        order = [F.col(c) for c in order_cols]
    (assigned.repartition(F.col(shard_col))
     .sortWithinPartitions(F.col(shard_col), *order)
     .write.mode("overwrite").partitionBy(shard_col).parquet(path))
    spark = df.sparkSession
    return (spark.read.parquet(path)
            .groupBy(shard_col)
            .agg(F.count("*").alias("n_rows"),
                 F.sum(weight_col).alias("total_weight"))
            .orderBy(shard_col))
