"""applyInPandasWithState: state must fold across micro-batches (two file
batches, maxFilesPerTrigger=1 → the second batch's output includes the
first batch's counts)."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from agnostic_blockchain_etl_spark.streaming.stateful import running_totals


@pytest.fixture(scope="module")
def spark():
    from agnostic_blockchain_etl_spark.session import get_session
    s = get_session(master="local[8]",
                    conf={"spark.sql.shuffle.partitions": "8"})
    yield s


def test_state_folds_across_microbatches(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    spark.createDataFrame([(1, 10.0), (1, 5.0), (2, 7.0)],
                          "user_id LONG, value DOUBLE") \
        .coalesce(1).write.parquet(src + "/b1")
    spark.createDataFrame([(1, 1.0), (3, 2.0)],
                          "user_id LONG, value DOUBLE") \
        .coalesce(1).write.parquet(src + "/b2")

    stream = (spark.readStream.schema("user_id LONG, value DOUBLE")
              .option("maxFilesPerTrigger", 1).parquet(src + "/*"))
    out = running_totals(stream)
    q = (out.writeStream.outputMode("update")
         .format("memory").queryName("running").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.table("running").collect()
    # final state per user: latest emitted row wins
    final = {}
    for r in rows:
        final[r["user_id"]] = (r["count"], r["total"])
    assert final[1] == (3, 16.0)   # 2 events in b1 + 1 in b2 — state folded
    assert final[2] == (1, 7.0)
    assert final[3] == (1, 2.0)
    # user 1 was emitted in BOTH micro-batches (update mode)
    assert len([r for r in rows if r["user_id"] == 1]) == 2
