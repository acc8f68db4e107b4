"""SCD2 time-travel family (`operators/scd2.py`): interval chaining
per key (open current row, zero-width same-instant intervals with the
tiebreak rule), snapshot-equals-interval-read consistency, absent-
before-first-change keys, the bounded cursor series, and argument
validation. The cross-engine window/snapshot/series algebra is pinned
by the registered `scd2_state_snapshot` oracle pair."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from agnostic_blockchain_etl_spark.operators.scd2 import (  # noqa: E402
    scd2_intervals, state_at, state_series)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def spark():
    from agnostic_blockchain_etl_spark.session import get_session
    yield get_session(master="local[8]",
                      conf={"spark.sql.shuffle.partitions": "8"})


@pytest.fixture(scope="module")
def log(spark):
    """Hand-built change log: key 'a' changes at t=10,20,30 (with a
    same-instant pair at t=20), key 'b' changes once at t=25."""
    rows = [("a", 10, 1, "v1"), ("a", 20, 2, "v2a"), ("a", 20, 3, "v2b"),
            ("a", 30, 4, "v3"), ("b", 25, 5, "w1")]
    return spark.createDataFrame(rows, "k string, ts long, seq int, v string")


class TestIntervals:
    def test_chain_and_current_flag(self, spark, log):
        iv = scd2_intervals(log, key_cols=["k"], tiebreak_cols=["seq"])
        by = {(r["k"], r["seq"]): r for r in iv.collect()}
        assert (by[("a", 1)]["valid_from"], by[("a", 1)]["valid_to"]) == (10, 20)
        # same-instant pair: seq=2 gets the zero-width interval,
        # seq=3 carries forward to the next change
        assert (by[("a", 2)]["valid_from"], by[("a", 2)]["valid_to"]) == (20, 20)
        assert (by[("a", 3)]["valid_from"], by[("a", 3)]["valid_to"]) == (20, 30)
        assert by[("a", 4)]["valid_to"] is None
        assert by[("a", 4)]["is_current"] == 1
        assert by[("b", 5)]["valid_to"] is None
        assert sum(r["is_current"] for r in by.values()) == 2

    def test_requires_keys(self, spark, log):
        with pytest.raises(ValueError, match="key_cols"):
            scd2_intervals(log, key_cols=[])


class TestStateAt:
    def test_snapshot_matches_interval_read(self, spark, log):
        """The window-free max-of-struct path must equal reading the
        interval table at the same cursor — for every interesting
        cursor incl. the same-instant tie and before-first-change."""
        iv = scd2_intervals(log, key_cols=["k"], tiebreak_cols=["seq"])
        for cursor in (9, 10, 20, 24, 25, 30, 99):
            snap = {(r["k"],): (r["ts"], r["seq"], r["v"])
                    for r in state_at(log, key_cols=["k"], cursor=cursor,
                                      tiebreak_cols=["seq"]).collect()}
            active = {(r["k"],): (r["valid_from"], r["seq"], r["v"])
                      for r in state_series(iv, [cursor]).collect()}
            assert snap == active, f"cursor={cursor}"

    def test_key_absent_before_first_change(self, spark, log):
        snap = state_at(log, key_cols=["k"], cursor=24,
                        tiebreak_cols=["seq"])
        assert {r["k"] for r in snap.collect()} == {"a"}

    def test_same_instant_tiebreak_wins(self, spark, log):
        snap = state_at(log, key_cols=["k"], cursor=20,
                        tiebreak_cols=["seq"])
        a = [r for r in snap.collect() if r["k"] == "a"][0]
        assert (a["seq"], a["v"]) == (3, "v2b")

    def test_no_window_in_plan(self, spark, log):
        """The scale claim: the snapshot path aggregates, never
        windows."""
        plan = state_at(log, key_cols=["k"], cursor=20,
                        tiebreak_cols=["seq"]) \
            ._jdf.queryExecution().optimizedPlan().toString()
        assert "Window" not in plan


class TestSeries:
    def test_multi_cursor_counts(self, spark, log):
        iv = scd2_intervals(log, key_cols=["k"], tiebreak_cols=["seq"])
        ser = state_series(iv, [15, 26])
        n = {r["cursor"]: 0 for r in ser.collect()}
        for r in ser.collect():
            n[r["cursor"]] += 1
        assert n == {15: 1, 26: 2}

    def test_rejects_empty_cursor_list(self, spark, log):
        iv = scd2_intervals(log, key_cols=["k"], tiebreak_cols=["seq"])
        with pytest.raises(ValueError, match="non-empty"):
            state_series(iv, [])


class TestGateShape:
    def test_facets_and_consistency(self, spark):
        from agnostic_blockchain_etl_spark.operators.scd2 import (
            _CURSORS, scd2_state_snapshot)
        out = scd2_state_snapshot(spark, SF_DIR).collect()
        facets = {r["facet"] for r in out}
        assert facets == {"interval", "state", "series"}
        series = {r["cursor"]: r["n_entities"] for r in out
                  if r["facet"] == "series"}
        assert set(series) == set(_CURSORS)
        # the state facet and the series' first cursor must agree on
        # how many entities existed
        n_state = sum(1 for r in out if r["facet"] == "state")
        assert series[_CURSORS[0]] == n_state
        # current intervals are open, superseded ones end before the
        # successor starts... weakly: valid_to >= valid_from always
        for r in out:
            if r["facet"] == "interval" and r["valid_to"] is not None:
                assert r["valid_to"] >= r["valid_from"]
