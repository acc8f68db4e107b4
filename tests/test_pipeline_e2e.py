"""End-to-end pipeline integration tests on real Spark (SURVEY.md §5 item
2): full init → tip → batch → stages → sequencer → sink flows, sink
contents vs a single-shot query, and idempotent replay."""

import os
import sys
import uuid

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from agnostic_blockchain_etl_spark.plans.config import PipelineConfig
from agnostic_blockchain_etl_spark.plans.executor import SparkExecutor
from agnostic_blockchain_etl_spark.plans.pipeline import run_pipeline
from agnostic_blockchain_etl_spark.plans.templates import TemplateSet
from agnostic_blockchain_etl_spark.sources.replacing import read_replacing

EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples")
SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    os.environ["AGN_RPC_MOCK"] = "tests.mock_chain:transport"
    from agnostic_blockchain_etl_spark.session import get_session
    s = get_session(master="local[8]",
                    conf={"spark.sql.shuffle.partitions": "8"})
    yield s


def _run(spark, example: str, vars: dict):
    conf = PipelineConfig.from_yaml(
        os.path.join(EXAMPLES, example, "pipeline.yaml"), env={})
    templates = TemplateSet.load(os.path.join(EXAMPLES, example))
    return conf, run_pipeline(SparkExecutor(spark), templates, conf, vars)


class TestOrdersToDailyParquet:
    @pytest.mark.heavy
    def test_export_resume_and_idempotent_replay(self, spark, tmp_path):
        sink = f"orders_daily_{uuid.uuid4().hex[:8]}"
        vars = {"SOURCE_PATH": f"{SF_DIR}/orders.parquet",
                "TARGET_PATH": str(tmp_path / "daily"),
                "SINK_TABLE": sink}
        conf, result = _run(spark, "orders_to_daily_parquet", vars)
        assert result.stats.batches > 0

        src = spark.read.parquet(vars["SOURCE_PATH"])
        max_day = src.agg(F.max(F.to_date("o_orderdate"))).collect()[0][0]
        expected = src.where(F.to_date("o_orderdate") < max_day)  # tip = max-1
        got = spark.table(sink)
        assert got.count() == expected.count()
        # partition layout: hive date=... directories
        dirs = [d for d in os.listdir(tmp_path / "daily") if d.startswith("date=")]
        assert len(dirs) > 300

        # resume: a second run starts past the exported range → 0 new batches
        _, result2 = _run(spark, "orders_to_daily_parquet", vars)
        assert result2.start > 0
        assert spark.table(sink).count() == expected.count()

        # forced replay of the whole range (ForceStart=DefaultStart):
        # dynamic partition overwrite keeps contents identical
        conf3 = PipelineConfig.from_yaml(
            os.path.join(EXAMPLES, "orders_to_daily_parquet", "pipeline.yaml"),
            env={})
        conf3.Init.ForceStart = conf3.Init.DefaultStart
        templates = TemplateSet.load(
            os.path.join(EXAMPLES, "orders_to_daily_parquet"))
        run_pipeline(SparkExecutor(spark), templates, conf3, vars)
        assert spark.table(sink).count() == expected.count()
        total = spark.table(sink).agg(
            F.round(F.sum("o_totalprice"), 2).alias("s")).collect()[0]["s"]
        exp_total = expected.agg(
            F.round(F.sum("o_totalprice"), 2).alias("s")).collect()[0]["s"]
        assert total == exp_total


class TestBlocksIngest:
    def test_rpc_ingest_decode_and_replay_dedup(self, spark, tmp_path):
        from tests.mock_chain import CHAIN_TIP, GENESIS_TS, block_hash, make_block
        sink = f"blocks_{uuid.uuid4().hex[:8]}"
        vars = {"RPC_ENDPOINT": "mock://chain",
                "LATEST_BLOCK_STATUS": "latest",
                "TARGET_PATH": str(tmp_path / "blocks"),
                "SINK_TABLE": sink}
        conf, result = _run(spark, "blocks_ingest", vars)
        # tip 149, batch size 100 → 2 batches, 150 items
        assert result.stats.batches == 2
        assert result.stats.items == CHAIN_TIP + 1
        assert result.stats.max_end == CHAIN_TIP

        got = spark.table(sink)
        assert got.count() == CHAIN_TIP + 1
        row = got.where(F.col("number") == 7).collect()[0]
        assert bytes(row["hash"]) == block_hash(7)
        assert row["timestamp"].timestamp() == GENESIS_TS + 12 * 7
        assert row["gas_limit"] == 30_000_000
        assert int(row["base_fee_per_gas"]) == 10 ** 9 + 7 * 13
        # buffers were dropped by delete_buffer.sql
        views = [v.name for v in spark.catalog.listTables()
                 if v.name.startswith("buffer_")]
        assert views == []

        # replay the full range: appends physically, Replacing read dedups
        conf2 = PipelineConfig.from_yaml(
            os.path.join(EXAMPLES, "blocks_ingest", "pipeline.yaml"), env={})
        conf2.Init.ForceStart = 0
        templates = TemplateSet.load(os.path.join(EXAMPLES, "blocks_ingest"))
        run_pipeline(SparkExecutor(spark), templates, conf2, vars)
        assert spark.table(sink).count() == 2 * (CHAIN_TIP + 1)
        deduped = read_replacing(spark.table(sink), keys=["number"])
        assert deduped.count() == CHAIN_TIP + 1
        # dedup preserved the exact decoded values
        row2 = deduped.where(F.col("number") == 42).collect()[0]
        assert bytes(row2["hash"]) == block_hash(42)

    def test_finality_default_stops_at_finalized_head(self, spark, tmp_path):
        """Without LATEST_BLOCK_STATUS, tip.sql asks for the block tagged
        'finalized' (reference examples/ethereum_blocks/tip.sql:6) — the
        only reorg-safety knob the reference exposes. Ingestion must stop
        at the finalized height, not the chain head."""
        from tests.mock_chain import CHAIN_TIP, FINALIZED_LAG, block_hash
        finalized = CHAIN_TIP - FINALIZED_LAG
        sink = f"blocks_fin_{uuid.uuid4().hex[:8]}"
        vars = {"RPC_ENDPOINT": "mock://chain",
                "TARGET_PATH": str(tmp_path / "blocks_fin"),
                "SINK_TABLE": sink}
        _, result = _run(spark, "blocks_ingest", vars)
        assert result.stats.max_end == finalized
        assert result.stats.items == finalized + 1

        got = spark.table(sink)
        assert got.count() == finalized + 1
        assert got.agg(F.max("number")).collect()[0][0] == finalized
        # the unfinalized head never entered the sink, but was ingested
        # faithfully up to the finalized block
        row = got.where(F.col("number") == finalized).collect()[0]
        assert bytes(row["hash"]) == block_hash(finalized)
