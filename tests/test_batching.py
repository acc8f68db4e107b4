"""Length-bucketed batching (`operators/batching.py`): band geometry
(integer bit-length, zero/NULL text), batch size bounds, the padding
arithmetic, determinism + salt behavior, the bucketing's padding
advantage over one-band (arrival-order) batching, and the plan-shape
claim that no window partition holds a whole band. Cross-engine values
are pinned by the registered `length_bucketed_batching` pair."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from agnostic_blockchain_etl_spark.operators.batching import (  # noqa: E402
    batch_padding_report, length_bucketed_batches)


@pytest.fixture(scope="module")
def spark():
    from agnostic_blockchain_etl_spark.session import get_session
    yield get_session(master="local[8]",
                      conf={"spark.sql.shuffle.partitions": "8"})


def _docs(spark, lengths):
    rows = [(i, None if n is None else " ".join(["w"] * n))
            for i, n in enumerate(lengths)]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestBands:
    def test_band_is_bit_length(self, spark):
        d = _docs(spark, [1, 2, 3, 4, 7, 8, 15, 16, 100])
        got = {r["n_tokens"]: r["band"] for r in
               length_bucketed_batches(d).collect()}
        assert got == {1: 1, 2: 2, 3: 2, 4: 3, 7: 3, 8: 4, 15: 4,
                       16: 5, 100: 7}

    def test_null_text_bands_zero(self, spark):
        d = _docs(spark, [None, None, 5])
        rows = length_bucketed_batches(d).collect()
        nulls = [r for r in rows if r["doc_id"] < 2]
        assert all(r["n_tokens"] == 0 and r["band"] == 0 for r in nulls)

    def test_tokens_col_overrides_text(self, spark):
        d = _docs(spark, [3, 3]).withColumn(
            "real_tokens", F.col("doc_id") * 100 + 1)
        got = {r["doc_id"]: r["n_tokens"] for r in
               length_bucketed_batches(
                   d, tokens_col="real_tokens").collect()}
        assert got == {0: 1, 1: 101}


class TestBatches:
    def test_batches_respect_size_and_cover(self, spark):
        d = _docs(spark, [5] * 21 + [40] * 3)
        rows = length_bucketed_batches(d, batch_size=4).collect()
        per = {}
        for r in rows:
            per.setdefault((r["band"], r["batch_id"]), []).append(r)
        # band of the 5-token docs: 21 docs -> batches of 4,4,4,4,4,1
        sizes5 = sorted(len(v) for (b, _), v in per.items() if b == 3)
        assert sizes5 == [1, 4, 4, 4, 4, 4]
        sizes40 = [len(v) for (b, _), v in per.items() if b == 6]
        assert sizes40 == [3]
        # ranks within a band are 1..n without gaps
        ranks5 = sorted(r["batch_rank"] for r in rows if r["band"] == 3)
        assert ranks5 == list(range(1, 22))

    def test_salt_changes_composition_not_counts(self, spark):
        d = _docs(spark, [(7 * i) % 30 + 1 for i in range(40)])
        a = length_bucketed_batches(d, batch_size=4, salt="s1:")
        b = length_bucketed_batches(d, batch_size=4, salt="s2:")
        ga = {r["doc_id"]: (r["band"], r["batch_id"]) for r in a.collect()}
        gb = {r["doc_id"]: (r["band"], r["batch_id"]) for r in b.collect()}
        assert {k: v[0] for k, v in ga.items()} == \
            {k: v[0] for k, v in gb.items()}     # bands salt-free
        assert ga != gb                           # composition moved

    def test_validation(self, spark):
        d = _docs(spark, [1])
        with pytest.raises(ValueError, match="batch_size"):
            length_bucketed_batches(d, batch_size=0)
        with pytest.raises(ValueError, match="power of two"):
            length_bucketed_batches(d, n_buckets=100)


class TestPaddingReport:
    def test_padding_arithmetic(self, spark):
        d = _docs(spark, [4, 5, 6, 7])       # one band (3), one batch
        rep = batch_padding_report(
            length_bucketed_batches(d, batch_size=8)).collect()
        assert len(rep) == 1
        r = rep[0]
        assert (r["n_seqs"], r["max_len"], r["n_tokens"]) == (4, 7, 22)
        assert r["pad_tokens"] == 4 * 7 - 22
        assert r["pad_frac"] == pytest.approx(6 / 28, abs=1e-6)

    def test_all_empty_batch_pads_zero_not_nan(self, spark):
        d = _docs(spark, [None, None])
        rep = batch_padding_report(
            length_bucketed_batches(d, batch_size=8)).collect()
        assert len(rep) == 1
        assert rep[0]["pad_tokens"] == 0
        assert rep[0]["pad_frac"] == 0.0

    def test_bucketing_beats_one_band(self, spark):
        """The operator's reason to exist: mixed lengths batched
        within bands pad less than the same batch size over one band
        (arrival-order batching pads everything to the straggler)."""
        lengths = [2] * 16 + [300] * 16
        d = _docs(spark, lengths)
        assigned = length_bucketed_batches(d, batch_size=8)
        pad_b = sum(r["pad_tokens"] for r in
                    batch_padding_report(assigned).collect())
        assert pad_b == 0   # equal lengths within band -> zero padding
        # arrival-order strawman: erase the bands (batch_id i of band 2
        # merges with batch_id i of band 9 -> every merged batch mixes
        # 2-token and 300-token sequences and pads the short ones)
        mixed = batch_padding_report(
            assigned.withColumn("band", F.lit(0))).collect()
        pad_flat = sum(r["pad_tokens"] for r in mixed)
        assert pad_flat > pad_b


class TestPlanShape:
    def test_no_whole_band_window_partition(self, spark):
        """Every data-side window must partition on the (band, bucket)
        pair, never on band alone — the `_grouped_rank` scale claim."""
        import re
        d = _docs(spark, [5] * 50)
        plan = length_bucketed_batches(d) \
            ._jdf.queryExecution().executedPlan().toString()
        specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
        data_side = [s for s in specs if "__h" in s]
        assert data_side and all("__bk" in s for s in data_side), plan
