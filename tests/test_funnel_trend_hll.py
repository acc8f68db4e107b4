"""Funnel/retention (`operators/funnel.py`), rate trend
(`operators/trend.py`), and the value-pinnable HyperLogLog
(`operators/hll.py`): chain semantics on hand-built journeys,
cohort/offset algebra, exact-sum OLS on planted lines, and
merge-equals-one-shot on the register frames. Cross-engine value
parity is pinned by the registered oracle pairs."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from agnostic_blockchain_etl_spark.operators.funnel import (  # noqa: E402
    cohort_retention, event_transitions, funnel_latency,
    funnel_report, funnel_user_levels, retention_hll_cells)
from agnostic_blockchain_etl_spark.operators.cooc import (  # noqa: E402
    term_cooccurrence)
from agnostic_blockchain_etl_spark.operators.hll import (  # noqa: E402
    hll_build, hll_estimate, hll_group_estimate, hll_merge)
from agnostic_blockchain_etl_spark.operators.trend import (  # noqa: E402
    rate_trend)


@pytest.fixture(scope="module")
def spark():
    from agnostic_blockchain_etl_spark.session import get_session
    yield get_session(master="local[8]",
                      conf={"spark.sql.shuffle.partitions": "8"})


def _events(spark, rows):
    """rows: (user_id, ts_us, event_type)"""
    return spark.createDataFrame(
        rows, "user_id long, ts long, event_type string")


STEPS = ("view", "click", "purchase")


class TestFunnelLevels:
    def test_chain_semantics(self, spark):
        W = 40
        ev = _events(spark, [
            (1, 0, "view"), (1, 10, "click"), (1, 20, "purchase"),
            # equal timestamps do NOT advance the chain (strict order)
            (2, 0, "view"), (2, 10, "click"), (2, 10, "purchase"),
            # step order matters: click BEFORE the first view is dead
            (3, 0, "click"), (3, 10, "view"),
            # window measured from t1, boundary INCLUSIVE
            (4, 0, "view"), (4, 5, "click"), (4, 40, "purchase"),
            # past the window
            (5, 0, "view"), (5, W + 1, "click"),
            # earliest-anchor simplification: the LATER view would
            # start a live chain, but the chain anchors at ts=0
            (6, 0, "view"), (6, 50, "view"), (6, 55, "click"),
            # no step-1 event at all -> absent from the level frame
            (7, 3, "purchase"),
        ])
        lv = {r["user_id"]: r for r in
              funnel_user_levels(ev, STEPS, window_micros=W).collect()}
        assert lv[1]["level"] == 3 and lv[1]["t3"] == 20
        assert lv[2]["level"] == 2 and lv[2]["t3"] is None
        assert lv[3]["level"] == 1
        assert lv[4]["level"] == 3 and lv[4]["t3"] == 40
        assert lv[5]["level"] == 1
        assert lv[6]["level"] == 1
        assert 7 not in lv

    def test_report_counts_and_ratios(self, spark):
        ev = _events(spark, [
            (1, 0, "view"), (1, 1, "click"), (1, 2, "purchase"),
            (2, 0, "view"), (2, 1, "click"),
            (3, 0, "view"),
            (4, 0, "error"),        # in the base, never in the funnel
        ])
        rep = {r["level"]: r for r in
               funnel_report(ev, STEPS, window_micros=100).collect()}
        assert [rep[k]["n_users"] for k in (1, 2, 3)] == [3, 2, 1]
        assert rep[1]["conv_prev"] == 0.75        # 3 of 4 users
        assert rep[2]["conv_prev"] == 0.666667    # 2/3 half-up at 6dp
        assert rep[3]["conv_prev"] == 0.5
        assert rep[3]["conv_start"] == 0.25
        assert rep[1]["step"] == "view"

    def test_empty_stage_yields_null_ratio(self, spark):
        ev = _events(spark, [(1, 0, "click")])   # nobody views
        rep = {r["level"]: r for r in
               funnel_report(ev, STEPS, window_micros=10).collect()}
        assert rep[1]["n_users"] == 0
        assert rep[2]["conv_prev"] is None       # 0-denominator
        assert rep[2]["n_users"] == 0

    def test_validation(self, spark):
        ev = _events(spark, [(1, 0, "view")])
        with pytest.raises(ValueError, match=">= 2 steps"):
            funnel_user_levels(ev, ("view",))
        with pytest.raises(ValueError, match="window_micros"):
            funnel_user_levels(ev, STEPS, window_micros=0)


class TestFunnelLatency:
    def test_gap_stats_per_transition(self, spark):
        ev = _events(spark, [
            (1, 0, "view"), (1, 10, "click"), (1, 30, "purchase"),
            (2, 0, "view"), (2, 40, "click"),
            (3, 0, "view"),
        ])
        out = {r["level"]: r for r in
               funnel_latency(ev, STEPS, window_micros=100).collect()}
        # click gaps: 10 and 40 -> mean 25, min 10, max 40
        assert out[2]["n_users"] == 2
        assert (out[2]["mean_us"], out[2]["min_us"],
                out[2]["max_us"]) == (25, 10, 40)
        # purchase gap: 30 - 10 = 20 for the one converting user
        assert out[3]["n_users"] == 1 and out[3]["mean_us"] == 20

    def test_half_up_mean(self, spark):
        # gaps 1 and 2 -> mean 1.5 rounds half-up to 2
        ev = _events(spark, [
            (1, 0, "view"), (1, 1, "click"),
            (2, 0, "view"), (2, 2, "click"),
        ])
        out = {r["level"]: r for r in
               funnel_latency(ev, STEPS, window_micros=100).collect()}
        assert out[2]["mean_us"] == 2

    def test_skipped_level_never_counts(self, spark):
        """The chain invariant the r11 conditional-agg rewrite rests
        on (r11 verdict flag #7): ``count(dt)`` with dt = t_k − t_{k−1}
        equals the old filtered ``count(*)`` over t_k only because a
        user can NEVER have t_k without t_{k−1} — `funnel_user_levels`
        derives each t_k from an inner join on t_{k−1}. Crafted skip:
        a user who purchases without ever clicking must be absent from
        level 3's n_users (and level 3 must not inherit them via a
        NULL-gap row)."""
        ev = _events(spark, [
            (1, 0, "view"), (1, 50, "purchase"),          # skips click
            (2, 0, "view"), (2, 10, "click"), (2, 30, "purchase"),
        ])
        lv = {r["user_id"]: r for r in
              funnel_user_levels(ev, STEPS,
                                 window_micros=100).collect()}
        assert lv[1]["t2"] is None and lv[1]["t3"] is None
        assert lv[1]["level"] == 1
        out = {r["level"]: r for r in
               funnel_latency(ev, STEPS, window_micros=100).collect()}
        assert out[2]["n_users"] == 1          # user 2 only
        assert out[3]["n_users"] == 1 and out[3]["mean_us"] == 20


_DAY = 86_400_000_000


class TestRetention:
    def test_cohort_offsets_and_exclusions(self, spark):
        coh = _events(spark, [
            (1, 0 * _DAY + 5, "signup"),
            (2, 1 * _DAY + 5, "signup"),
        ])
        act = _events(spark, [
            (1, 0 * _DAY + 9, "purchase"),
            (1, 0 * _DAY + 7, "purchase"),   # same day, dedups
            (1, 2 * _DAY + 1, "purchase"),
            (2, 0 * _DAY + 1, "purchase"),   # BEFORE cohort: excluded
            (2, 3 * _DAY + 1, "purchase"),
            (3, 5 * _DAY + 1, "purchase"),   # no cohort row: absent
        ])
        out = {(r["cohort_week"], r["week_offset"]): r
               for r in cohort_retention(act, coh,
                                         week_days=1).collect()}
        assert out[(0, 0)]["n_active"] == 1
        assert out[(0, 2)]["n_active"] == 1
        assert out[(1, 2)]["n_active"] == 1
        assert out[(1, 2)]["n_cohort"] == 1
        assert out[(1, 2)]["retention"] == 1.0
        assert all(k[1] >= 0 for k in out)
        assert len(out) == 3

    def test_default_cohort_is_first_activity(self, spark):
        act = _events(spark, [(1, 0, "purchase"),
                              (1, 7 * _DAY, "purchase")])
        out = {r["week_offset"]: r
               for r in cohort_retention(act).collect()}
        assert out[0]["n_active"] == 1 and out[1]["n_active"] == 1

    def test_validation(self, spark):
        act = _events(spark, [(1, 0, "purchase")])
        with pytest.raises(ValueError, match="week_days"):
            cohort_retention(act, week_days=0)

    def test_hll_cells_merge_equals_one_shot_and_track_exact(
            self, spark):
        from agnostic_blockchain_etl_spark.operators.hll import (
            hll_group_estimate_regs, hll_group_merge)
        rows = [(u, d * _DAY + u, "purchase")
                for u in range(1, 9) for d in range(0, u)]
        act = _events(spark, rows)
        gc = ["cohort_week", "week_offset"]
        # split activity rows arbitrarily; merged registers must be
        # IDENTICAL to the one-shot build (the store property)
        halves = [retention_hll_cells(
            act.filter(F.col("ts") % 2 == i), act, week_days=1)
            for i in (0, 1)]
        merged = hll_group_merge(*halves, group_cols=gc)
        oneshot = retention_hll_cells(act, act, week_days=1)
        assert sorted(map(tuple, merged.collect())) \
            == sorted(map(tuple, oneshot.collect()))
        # under-full estimates hug the exact matrix
        est = {(r["cohort_week"], r["week_offset"]): r["est"]
               for r in hll_group_estimate_regs(merged, gc).collect()}
        exact = {(r["cohort_week"], r["week_offset"]): r["n_active"]
                 for r in cohort_retention(act, week_days=1).collect()}
        assert set(est) == set(exact)
        for cell, n in exact.items():
            assert abs(est[cell] - n) < 0.2 + 0.05 * n


class TestRetentionHllStream:
    """`streaming.dedup.retention_hll_stream`: the product-analytics
    member of the foreachBatch store family — cumulative per-cell
    estimates bit-equal to one-shot builds, restart continuation."""

    @pytest.mark.heavy
    def test_cumulative_equals_one_shot_and_restart(self, spark,
                                                    tmp_path):
        from agnostic_blockchain_etl_spark.operators.hll import (
            hll_group_estimate_regs)
        from agnostic_blockchain_etl_spark.operators.funnel import (
            retention_hll_cells)
        from agnostic_blockchain_etl_spark.streaming.dedup import (
            retention_hll_stream)
        src, out, store, ckpt = (str(tmp_path / d)
                                 for d in ("src", "out", "store",
                                           "ckpt"))
        schema = "user_id long, ts long, event_type string"
        cohort = _events(spark, [(u, (u % 3) * _DAY + u, "signup")
                                 for u in range(1, 9)])
        batches = [
            [(u, (u % 3 + d) * _DAY + 7, "purchase")
             for u in range(1, 5) for d in range(2)],
            [(u, (u % 3 + d) * _DAY + 9, "purchase")
             for u in range(3, 9) for d in range(3)],
            [(u, (u % 3) * _DAY + 11, "purchase")       # replays day 0
             for u in range(1, 9)],
        ]

        def write(rows):
            spark.createDataFrame(rows, schema) \
                .coalesce(1).write.mode("append").parquet(src)

        def drain():
            stream = (spark.readStream.schema(schema)
                      .option("maxFilesPerTrigger", 1).parquet(src))
            q = retention_hll_stream(stream, cohort, store, out, ckpt,
                                     week_days=1, p=9)
            try:
                q.processAllAvailable()
            finally:
                q.stop()

        write(batches[0]); write(batches[1])
        drain()
        write(batches[2])                     # restart continuation
        drain()

        gc = ["cohort_week", "week_offset"]
        seen: list = []
        for b, rows in enumerate(batches):
            seen.extend(rows)
            got = sorted(map(tuple, spark.read.parquet(
                f"{out}/batch_id={b}").collect()))
            oneshot = sorted(map(tuple, hll_group_estimate_regs(
                retention_hll_cells(
                    spark.createDataFrame(seen, schema), cohort,
                    week_days=1, p=9), gc, p=9).collect()))
            assert got == oneshot, f"batch {b}"

    def test_validation_is_eager(self, spark, tmp_path):
        from agnostic_blockchain_etl_spark.streaming.dedup import (
            retention_hll_stream)
        cohort = _events(spark, [(1, 0, "signup")])
        src = tmp_path / "nosrc"
        src.mkdir()
        stream = (spark.readStream
                  .schema("user_id long, ts long, event_type string")
                  .parquet(str(src)))
        with pytest.raises(ValueError, match="week_days"):
            retention_hll_stream(stream, cohort, "s", "o", "c",
                                 week_days=0)
        with pytest.raises(ValueError, match="p must be"):
            retention_hll_stream(stream, cohort, "s", "o", "c", p=2)


class TestTransitions:
    def _ev(self, spark, rows):
        """rows: (user_id, ts, event_type, event_id)"""
        return spark.createDataFrame(
            rows, "user_id long, ts long, event_type string, "
                  "event_id long")

    def test_counts_and_row_normalization(self, spark):
        ev = self._ev(spark, [
            (1, 0, "a", 0), (1, 1, "b", 1), (1, 2, "a", 2),
            (1, 3, "c", 3),
            (2, 0, "a", 4), (2, 1, "b", 5),
        ])
        out = {(r["from_type"], r["to_type"]): r
               for r in event_transitions(ev).collect()}
        assert out[("a", "b")]["n"] == 2
        assert out[("b", "a")]["n"] == 1
        assert out[("a", "c")]["n"] == 1
        assert out[("a", "b")]["p"] == 0.666667   # 2/3 half-up
        assert len(out) == 3                      # last events emit nothing

    def test_users_do_not_bleed_into_each_other(self, spark):
        ev = self._ev(spark, [(1, 0, "a", 0), (2, 1, "b", 1)])
        assert event_transitions(ev).count() == 0

    def test_timestamp_ties_break_on_event_id(self, spark):
        ev = self._ev(spark, [(1, 5, "x", 2), (1, 5, "y", 1)])
        out = event_transitions(ev).collect()
        assert [(r["from_type"], r["to_type"]) for r in out] \
            == [("y", "x")]

    def test_null_event_type_is_a_real_state(self, spark):
        # flag-don't-drop: a NULL type participates as from AND to;
        # the totals join must not silently drop its row (self-review
        # fix — a plain equi-join did)
        ev = self._ev(spark, [(1, 0, None, 0), (1, 1, "a", 1),
                              (1, 2, None, 2)])
        out = {(r["from_type"], r["to_type"]): r
               for r in event_transitions(ev).collect()}
        assert out[(None, "a")]["n"] == 1
        assert out[(None, "a")]["p"] == 1.0
        assert out[("a", None)]["n"] == 1


class TestTrend:
    def _bucketed(self, spark, counts, grp="a", width=10):
        rows = [(grp, b * width + (i % width))
                for b, n in counts.items() for i in range(n)]
        return spark.createDataFrame(rows, "event_type string, ts long")

    def test_perfect_line(self, spark):
        ev = self._bucketed(spark, {b: 3 + 2 * b for b in range(6)})
        r = rate_trend(ev, bucket_micros=10).collect()[0]
        assert r["slope"] == 2.0
        assert r["intercept"] == 3.0
        assert r["r2"] == 1.0
        assert r["n_buckets"] == 6

    def test_densified_zero_bucket_changes_fit(self, spark):
        # events at buckets 0 (y=6) and 3 (y=3); buckets 1-2 exist
        # only through densification -> slope -0.9 (it would be -1.0
        # on the sparse rows, so the value pins the zero-fill)
        ev = self._bucketed(spark, {0: 6, 3: 3})
        r = rate_trend(ev, bucket_micros=10).collect()[0]
        assert r["slope"] == -0.9
        assert r["n_buckets"] == 4

    def test_constant_series(self, spark):
        ev = self._bucketed(spark, {b: 5 for b in range(4)})
        r = rate_trend(ev, bucket_micros=10).collect()[0]
        assert r["slope"] == 0.0
        assert r["intercept"] == 5.0
        assert r["r2"] is None           # zero y-variance

    def test_single_bucket_is_null_fit(self, spark):
        ev = self._bucketed(spark, {0: 7})
        r = rate_trend(ev, bucket_micros=10).collect()[0]
        assert r["slope"] is None and r["r2"] is None
        assert r["y_total"] == 7

    def test_validation(self, spark):
        ev = self._bucketed(spark, {0: 1})
        with pytest.raises(ValueError, match="bucket_micros"):
            rate_trend(ev, bucket_micros=0)


class TestCooccurrence:
    def _docs(self, spark, texts):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string")

    def test_counts_vocab_cut_and_pmi(self, spark):
        docs = self._docs(spark, ["a b", "a b c", "a", "d"])
        out = {(r["term_a"], r["term_b"]): r
               for r in term_cooccurrence(docs, v=3).collect()}
        # vocab = top 3 by doc freq, tie (c=1, d=1) breaks to 'c'
        assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
        ab = out[("a", "b")]
        assert (ab["n_pair"], ab["n_a"], ab["n_b"]) == (2, 3, 2)
        # PMI = ln(N·n_pair / (n_a·n_b)) = ln(4·2 / 6)
        assert ab["pmi"] == 0.287682
        # repeated terms within one doc count once (incidence, not tf)
        dup = self._docs(spark, ["a a b b", "a b"])
        r = term_cooccurrence(dup, v=2).collect()[0]
        assert r["n_pair"] == 2 and r["n_a"] == 2

    def test_null_text_counts_in_n_but_emits_nothing(self, spark):
        docs = spark.createDataFrame(
            [(0, "x y"), (1, None)], "doc_id long, text string")
        r = term_cooccurrence(docs, v=2).collect()[0]
        # N = 2 (the NULL row counts): pmi = ln(2·1 / 1) = ln 2
        assert r["pmi"] == 0.693147

    def test_validation(self, spark):
        docs = self._docs(spark, ["a"])
        with pytest.raises(ValueError, match="v must be"):
            term_cooccurrence(docs, v=1)


class TestHll:
    def _keys(self, spark, n, prefix="k"):
        return spark.range(n).select(
            F.concat(F.lit(prefix), F.col("id")).alias("key"))

    def test_merge_equals_one_shot(self, spark):
        df = self._keys(spark, 500)
        a = df.filter(F.expr("CAST(substr(key, 2) AS LONG) % 2 = 0"))
        b = df.filter(F.expr("CAST(substr(key, 2) AS LONG) % 2 = 1"))
        merged = sorted(hll_merge(hll_build(a, "key"),
                                  hll_build(b, "key")).collect())
        oneshot = sorted(hll_build(df, "key").collect())
        assert merged == oneshot

    def test_estimate_tracks_cardinality(self, spark):
        est = hll_estimate(
            hll_build(self._keys(spark, 500), "key")).collect()[0]
        assert est["n_registers"] == 512
        assert abs(est["est"] - 500) < 75       # ~4.6% std error
        # duplicates do not move the sketch
        dup = self._keys(spark, 500).unionAll(self._keys(spark, 500))
        est2 = hll_estimate(hll_build(dup, "key")).collect()[0]
        assert est2["s_int"] == est["s_int"]

    def test_null_keys_hash_under_sentinel(self, spark):
        df = spark.createDataFrame(
            [(None,), ("x",), (None,)], "key string")
        regs = hll_build(df, "key").collect()
        assert 1 <= len(regs) <= 2               # NULL is ONE key

    def test_empty_input_estimates_zero(self, spark):
        df = self._keys(spark, 0)
        est = hll_estimate(hll_build(df, "key")).collect()[0]
        assert est["zeros"] == 512
        assert est["est"] == 0.0                 # ln(m/m) = 0

    def test_group_estimate_matches_global_per_group(self, spark):
        # a group's (zeros, s_int) must equal a standalone build over
        # just that group's rows — the grouped path adds no algebra
        df = self._keys(spark, 300).withColumn(
            "grp", F.expr("CAST(substr(key, 2) AS LONG) % 3"))
        by_grp = {r["grp"]: r for r in
                  hll_group_estimate(df, "grp", "key").collect()}
        for g in (0, 1, 2):
            solo = hll_estimate(hll_build(
                df.filter(F.col("grp") == g), "key")).collect()[0]
            assert by_grp[g]["s_int"] == solo["s_int"]
            assert by_grp[g]["est"] == solo["est"]

    def test_validation(self, spark):
        df = self._keys(spark, 1)
        with pytest.raises(ValueError, match="p must be"):
            hll_build(df, "key", p=2)
        with pytest.raises(ValueError, match="at least one"):
            hll_merge()
