"""Event-rate anomaly monitor (`operators/anomaly.py`): spike and
silence detection on a hand-built series, zero-densification of gap
buckets, warm-up NULLs until the trailing frame fills, constant-
window NULL z, self-exclusion of the scored bucket, and validation.
The cross-engine window algebra is pinned by the registered
`event_rate_anomaly_report` oracle pair."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from agnostic_blockchain_etl_spark.operators.anomaly import (  # noqa: E402
    event_rate_zscores)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def spark():
    from agnostic_blockchain_etl_spark.session import get_session
    yield get_session(master="local[8]",
                      conf={"spark.sql.shuffle.partitions": "8"})


def _series(spark, counts_by_bucket, grp="a", bucket_us=10):
    """Events laid out so bucket b (width 10 µs) holds counts[b]
    rows, with a jitter inside the bucket to exercise flooring."""
    rows = [(grp, b * bucket_us + (i % bucket_us))
            for b, n in counts_by_bucket.items() for i in range(n)]
    return spark.createDataFrame(rows, "event_type string, ts long")


class TestZscores:
    @pytest.mark.heavy
    def test_spike_flagged_silence_flagged(self, spark):
        # 10 warm-up buckets alternating 4/6 (the baseline needs
        # variance — a constant window scores NULL by contract), then
        # a SILENT bucket (present only through densification), then
        # a 50-spike, then a closing bucket
        base = {b: 4 + 2 * (b % 2) for b in range(10)}
        base[11] = 50
        base[12] = 5            # bucket 10 missing -> densified 0
        ev = _series(spark, base)
        out = {r["bucket"]: r for r in event_rate_zscores(
            ev, bucket_micros=10, trailing=4).collect()}
        assert out[10]["n"] == 0
        assert out[10]["is_anomaly"] == 1 and out[10]["z"] < -3
        assert out[11]["is_anomaly"] == 1 and out[11]["z"] > 3
        # steady rows are not anomalies
        assert out[6]["is_anomaly"] == 0

    def test_warm_up_rows_score_null(self, spark):
        ev = _series(spark, {b: 5 for b in range(8)})
        out = {r["bucket"]: r for r in event_rate_zscores(
            ev, bucket_micros=10, trailing=4).collect()}
        for b in range(4):              # frame not yet full
            assert out[b]["z"] is None and out[b]["is_anomaly"] == 0
        # constant window: full frame but zero variance -> NULL z
        assert out[5]["z"] is None and out[5]["mean"] == 5.0

    def test_spike_excluded_from_its_own_window(self, spark):
        """The scored bucket must not contaminate its own baseline:
        a second spike right after the first is still flagged."""
        base = {b: 4 + 2 * (b % 2) for b in range(6)}
        base[6] = 50
        base[7] = 50
        ev = _series(spark, base)
        out = {r["bucket"]: r for r in event_rate_zscores(
            ev, bucket_micros=10, trailing=4).collect()}
        assert out[6]["is_anomaly"] == 1 and out[6]["z"] > 3
        # bucket 7's window now contains one 50: sd explodes but the
        # mean is still ~16 — z stays positive
        assert out[7]["z"] > 0

    def test_groups_scored_independently(self, spark):
        a = _series(spark, {c: 4 + 2 * (c % 2) for c in range(6)},
                    grp="a")
        b_counts = {c: 4 + 2 * (c % 2) for c in range(5)}
        b_counts[5] = 99
        b = _series(spark, b_counts, grp="b")
        out = event_rate_zscores(a.unionByName(b), bucket_micros=10,
                                 trailing=4).collect()
        flags = {(r["grp"], r["bucket"]): r["is_anomaly"] for r in out}
        assert flags[("b", 5)] == 1 and flags[("a", 5)] == 0

    def test_validation(self, spark):
        ev = _series(spark, {0: 1})
        with pytest.raises(ValueError, match="bucket_micros"):
            event_rate_zscores(ev, bucket_micros=0)
        with pytest.raises(ValueError, match="trailing"):
            event_rate_zscores(ev, trailing=1)


class TestGateShape:
    def test_densified_and_consistent(self, spark):
        from agnostic_blockchain_etl_spark.operators.anomaly import (
            event_rate_anomaly_report)
        out = event_rate_anomaly_report(spark, SF_DIR).collect()
        by_grp = {}
        for r in out:
            by_grp.setdefault(r["grp"], []).append(r)
        spans = {g: (min(r["bucket"] for r in rows),
                     max(r["bucket"] for r in rows), len(rows))
                 for g, rows in by_grp.items()}
        # densified: every group covers the identical full span
        assert len({s for s in spans.values()}) == 1
        lo, hi, n = next(iter(spans.values()))
        assert n == hi - lo + 1
        # total n equals the events row count
        from agnostic_blockchain_etl_spark.operators.tables import (
            load_tables)
        n_events = load_tables(spark, SF_DIR, ("events",))[
            "events"].count()
        assert sum(r["n"] for r in out) == n_events
