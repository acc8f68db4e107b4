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
                          shard_col: str = "shard") -> DataFrame:
    """Annotate ``df`` with a ``shard_col`` column (0..n_shards-1)
    balancing ``sum(weight_col)`` per shard. All input columns survive;
    a clashing input column is an explicit error (pack_sequences e.g.
    already emits a ``shard`` packing-stream id — pass ``shard_col`` or
    rename rather than letting a silent overwrite eat data).

    Rows sharing ``key_col`` land in the same shard (bucket granularity),
    so a document's chunks never straddle shards."""
    if n_buckets < n_shards:
        raise ValueError(
            f"n_buckets ({n_buckets}) must be >= n_shards ({n_shards})")
    if shard_col in df.columns:
        raise ValueError(
            f"input already has a {shard_col!r} column "
            "(pack_sequences' packing-stream id?) — pass a different "
            "shard_col= or rename the input column")
    bucketed = df.withColumn(
        "_bucket", F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets))
        .cast("int"))
    totals = (bucketed.groupBy("_bucket")
              .agg(F.sum(weight_col).alias("_w"))
              .collect())  # <= n_buckets rows: the bounded driver summary
    # LPT: heaviest bucket first onto the lightest shard; heap entries
    # (load, shard) tie-break on shard index, bucket order ties on id
    heap = [(0, s) for s in range(n_shards)]
    heapq.heapify(heap)
    mapping = []
    for row in sorted(totals, key=lambda r: (-(r["_w"] or 0), r["_bucket"])):
        load, shard = heapq.heappop(heap)
        mapping.append((row["_bucket"], shard))
        heapq.heappush(heap, (load + (row["_w"] or 0), shard))
    spark = df.sparkSession
    map_df = spark.createDataFrame(mapping,
                                   f"_bucket int, {shard_col} int")
    return (bucketed.join(F.broadcast(map_df), "_bucket")
            .drop("_bucket"))


def write_training_shards(df: DataFrame, path: str, weight_col: str,
                          n_shards: int, key_col: str = "doc_id",
                          order_cols: tuple[str, ...] = ("doc_id",),
                          n_buckets: int = _DEFAULT_BUCKETS,
                          shard_col: str = "shard",
                          shuffle_salt: str | None = None) -> DataFrame:
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
                                     shard_col=shard_col)
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
