"""Bucketed co-located joins must plan WITHOUT a shuffle — the plan-level
proof behind SCALE.md's "bucket the sink once, join map-side forever"
claim. A regression here (an Exchange reappearing between two
same-bucketed tables) silently reintroduces the biggest per-batch cost
at 100 TB.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
import uuid

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from agnostic_blockchain_etl_spark.sources.bucketed import (colocated_join,
                                                            write_bucketed)


@pytest.fixture(scope="module")
def spark():
    from agnostic_blockchain_etl_spark.session import get_session
    s = get_session(master="local[8]",
                    conf={"spark.sql.shuffle.partitions": "8",
                          # force the SortMergeJoin path: broadcast would
                          # hide the exchange question entirely
                          "spark.sql.autoBroadcastJoinThreshold": "-1"})
    yield s


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    left = f"bkt_blocks_{uuid.uuid4().hex[:8]}"
    right = f"bkt_txs_{uuid.uuid4().hex[:8]}"
    unbucketed = f"plain_{uuid.uuid4().hex[:8]}"
    try:
        blocks = spark.range(0, 10_000).select(
            F.col("id").alias("number"),
            (F.col("id") * 13 % 997).alias("gas_used"))
        txs = spark.range(0, 30_000).select(
            (F.col("id") % 10_000).alias("number"),
            F.col("id").alias("tx_id"))
        write_bucketed(blocks, left, "number", 8)
        write_bucketed(txs, right, "number", 8)

        joined = colocated_join(spark, left, right, "number")
        plan = _plan_of(joined)
        assert "Exchange" not in plan, \
            f"bucketed join still shuffles:\n{plan}"
        assert "SortMergeJoin" in plan

        # and it is not correctness-for-speed: same result as a plain join
        plain = (blocks.join(txs, "number")
                 .agg(F.count("*").alias("n"),
                      F.sum(F.col("gas_used") * F.col("tx_id")).alias("s"))
                 .collect()[0])
        got = (joined.agg(F.count("*").alias("n"),
                          F.sum(F.col("gas_used") * F.col("tx_id")).alias("s"))
               .collect()[0])
        assert (got["n"], got["s"]) == (plain["n"], plain["s"])

        # one-side-only bucketing must still work (Spark shuffles just the
        # unbucketed side) — guard against a silent full-shuffle regression
        txs.write.format("parquet").mode("overwrite").saveAsTable(unbucketed)
        half = spark.table(left).join(spark.table(unbucketed), "number")
        half_plan = _plan_of(half)
        # count tree nodes, not the detail-section headers repeating them
        assert half_plan.count("+- Exchange") == 1, \
            f"expected exactly one exchange (unbucketed side only):\n{half_plan}"
    finally:
        for t in (left, right, unbucketed):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
