"""Tests for the startup probe, metrics endpoint, per-stage settings
application, and the metadata-only partition listing."""

import os
import sys
import urllib.request

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from agnostic_blockchain_etl_spark.plans.pipeline import StageMetrics
from agnostic_blockchain_etl_spark.plans.probe import (MetricsServer,
                                                       run_startup_probe,
                                                       stage_metrics_collector)
from agnostic_blockchain_etl_spark.sources.listing import (
    list_partition_files, partition_summary)


@pytest.fixture(scope="module")
def spark():
    from agnostic_blockchain_etl_spark.session import get_session
    s = get_session(master="local[8]",
                    conf={"spark.sql.shuffle.partitions": "8"})
    yield s


class TestProbe:
    def test_ready_session_passes(self, spark):
        run_startup_probe(spark, max_delay_s=5)


class TestMetricsServer:
    def test_serves_prometheus_text(self):
        m = StageMetrics(executions=3, rows=42, elapsed_s=1.25)
        server = MetricsServer(port=19999)
        server.register(stage_metrics_collector([{"create_buffer.sql": m}]))
        server.start()
        try:
            body = urllib.request.urlopen(
                "http://127.0.0.1:19999/metrics", timeout=5).read().decode()
        finally:
            server.stop()
        assert 'query_executions_total{stage="0",file="create_buffer_sql"} 3' in body
        assert 'query_rows_total{stage="0",file="create_buffer_sql"} 42' in body


class TestStageSettings:
    def test_settings_applied_at_worker_start(self, spark):
        import queue

        from agnostic_blockchain_etl_spark.plans.config import StageConfig
        from agnostic_blockchain_etl_spark.plans.executor import SparkExecutor
        from agnostic_blockchain_etl_spark.plans.pipeline import (
            _Ctx, run_stage_workers)
        from agnostic_blockchain_etl_spark.plans.templates import TemplateSet
        from agnostic_blockchain_etl_spark.plans.types import CLOSE

        spark.conf.set("spark.sql.cbo.enabled", "false")
        ctx = _Ctx()
        inq, outq = queue.Queue(), queue.Queue(maxsize=10)
        inq.put(CLOSE)
        run_stage_workers(
            ctx, SparkExecutor(spark), TemplateSet({}), inq, outq,
            StageConfig(Files=[], Settings={"spark.sql.cbo.enabled": "true"}),
            workers=1)
        assert spark.conf.get("spark.sql.cbo.enabled") == "true"


class TestPartitionListing:
    def test_metadata_only_listing(self, spark, tmp_path):
        target = str(tmp_path / "part")
        df = spark.createDataFrame(
            [(1, "2024-01-01"), (2, "2024-01-02"), (3, "2024-01-02")],
            "id INT, date STRING")
        df.write.partitionBy("date").parquet(target)

        files = list_partition_files(spark, target)
        rows = files.collect()
        assert len(rows) >= 2
        assert all(r["partitions"]["date"].startswith("2024-01") for r in rows)

        n, max_date = partition_summary(spark, target, "date")
        assert n == len(rows)
        assert max_date == "2024-01-02"

    def test_missing_path_is_empty(self, spark, tmp_path):
        n, max_date = partition_summary(spark, str(tmp_path / "nope"), "date")
        assert n == 0 and max_date is None

    def test_ancestor_key_value_dirs_do_not_leak(self, spark, tmp_path):
        """Review finding: Hadoop echoes fully-qualified paths
        (file:/...), so the bare-path prefix strip never matched and
        key=value segments from ANCESTOR directories (env=prod) leaked
        into every row's partitions map."""
        base = tmp_path / "env=prod" / "events"
        spark.createDataFrame([(1, "2024-01-01")], "id INT, date STRING") \
            .write.partitionBy("date").parquet(str(base))
        rows = list_partition_files(spark, str(base)).collect()
        assert rows, "listing must see the files"
        for r in rows:
            assert "env" not in r["partitions"], r["partitions"]
            assert r["partitions"]["date"] == "2024-01-01"
