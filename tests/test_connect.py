"""Spark Connect (RemoteEngine-proper) path: ``get_session("sc://...")``.

The reference's RemoteEngine points at an existing server
(/root/reference/internal/engine/impl/remote/remote_engine.go:10-44);
Spark Connect is the Spark-native form of that contract. This container
ships the server jar but not the Python client deps (grpcio), so the
live round-trip skips here and the import gate is asserted instead —
the same honest environment-gating as the multimodal decode stub.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from agnostic_blockchain_etl_spark.session import get_session


def _has_grpc() -> bool:
    try:
        import grpc  # noqa: F401
        return True
    except ImportError:
        return False


@pytest.mark.skipif(_has_grpc(), reason="grpc present: gate not reachable")
def test_connect_gate_is_actionable_without_client():
    with pytest.raises(RuntimeError, match="grpcio"):
        get_session(master="sc://localhost:15002")


def test_connect_conf_keeps_sql_semantics_drops_driver_conf():
    """What a Connect session would receive (runs with or without grpc):
    every semantics-bearing spark.sql.* default, none of the
    driver/server-side knobs, caller overrides winning."""
    from agnostic_blockchain_etl_spark.session import connect_conf
    c = connect_conf({"spark.sql.shuffle.partitions": "7"})
    assert c["spark.sql.session.timeZone"] == "UTC"
    assert c["spark.sql.sources.partitionOverwriteMode"] == "dynamic"
    assert c["spark.sql.legacy.parquet.nanosAsLong"] == "true"
    assert c["spark.sql.shuffle.partitions"] == "7"
    assert "spark.scheduler.mode" not in c
    assert "spark.ui.enabled" not in c
    assert not any(k.startswith("spark.driver.") for k in c)


@pytest.mark.skipif(not _has_grpc(), reason="no Spark Connect client deps")
def test_connect_roundtrip_against_local_server():
    """Live Connect round-trip (runs where grpcio is installed): Spark 4
    auto-starts a local Connect server for ``sc://local``-style sessions;
    the engine's UDF registry and a reference-shaped query must work
    through the client."""
    spark = get_session(master="sc://localhost:15002")
    row = spark.sql(
        "SELECT evm_hex_decode_int('0x2a', 'UInt64') AS v").collect()[0]
    assert row["v"] == 42
