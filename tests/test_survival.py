"""Kaplan–Meier survival (`operators/survival.py`): hand-computed
curves on planted cohorts, censoring at the observation end, the
everyone-converts zero flag, and ordering rules. Cross-engine value
parity is pinned by the registered `km_survival_curve` oracle pair."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from agnostic_blockchain_etl_spark.operators.survival import (  # noqa: E402
    km_survival)

_DAY = 86_400_000_000


@pytest.fixture(scope="module")
def spark():
    from agnostic_blockchain_etl_spark.session import get_session
    yield get_session(master="local[8]",
                      conf={"spark.sql.shuffle.partitions": "8"})


def _ev(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts long")


class TestKmSurvival:
    def test_hand_computed_curve_with_censoring(self, spark):
        starts = _ev(spark, [(1, 0), (2, 0), (3, 0), (4, 0)])
        terms = _ev(spark, [(1, 1 * _DAY + 5), (2, 1 * _DAY + 9),
                            (3, 3 * _DAY + 1)])
        # subject 4 never converts -> censored at the observation end
        # (day 3); KM: S(1) = 1 - 2/4 = 0.5; at t=3 the risk set is
        # {3 (event), 4 (censored at 3, still at risk)} -> 0.25
        out = {r["t"]: r for r in km_survival(starts, terms).collect()}
        assert out[1]["n_risk"] == 4 and out[1]["n_events"] == 2
        assert out[1]["survival"] == 0.5
        assert out[3]["n_risk"] == 2 and out[3]["n_events"] == 1
        assert out[3]["survival"] == 0.25
        assert set(out) == {1, 3}        # censor times emit no row

    def test_everyone_converts_zeroes_the_curve(self, spark):
        starts = _ev(spark, [(1, 0), (2, 0)])
        terms = _ev(spark, [(1, 2 * _DAY), (2, 2 * _DAY)])
        r = km_survival(starts, terms).collect()[0]
        assert (r["t"], r["n_risk"], r["n_events"]) == (2, 2, 2)
        assert r["survival"] == 0.0

    def test_terminal_at_or_before_start_is_censoring(self, spark):
        # strict ordering: a terminal row at exactly t0 (or before)
        # does not count as conversion; the subject censors
        starts = _ev(spark, [(1, 5), (2, 5)])
        terms = _ev(spark, [(1, 5), (1, 3), (2, 5 + _DAY)])
        out = km_survival(starts, terms).collect()
        assert len(out) == 1
        assert out[0]["n_events"] == 1 and out[0]["n_risk"] == 2

    def test_terminal_without_start_is_ignored(self, spark):
        starts = _ev(spark, [(1, 0)])
        terms = _ev(spark, [(1, _DAY), (9, _DAY)])
        out = km_survival(starts, terms).collect()
        assert [r["n_risk"] for r in out] == [1]

    def test_validation(self, spark):
        s = _ev(spark, [(1, 0)])
        with pytest.raises(ValueError, match="bucket_micros"):
            km_survival(s, s, bucket_micros=0)
