"""Corpus observability (`operators/observe.py`): JSD's identity /
disjoint / symmetry properties against a pure-Python reference, the
overlap matrix's unordered-pair rollup, and packing-utilization
arithmetic. Cross-engine values are pinned by the three registered
oracle pairs."""

from __future__ import annotations

import math
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from agnostic_blockchain_etl_spark.operators.observe import (  # noqa: E402
    corpus_js_divergence, pack_efficiency_report, source_overlap_matrix,
    unigram_histogram)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def spark():
    from agnostic_blockchain_etl_spark.session import get_session
    yield get_session(master="local[8]",
                      conf={"spark.sql.shuffle.partitions": "8"})


def _docs(spark, texts, start=1):
    return spark.createDataFrame(
        [(start + i, t) for i, t in enumerate(texts)],
        "doc_id long, text string")


def _py_jsd(p_counts, q_counts):
    tp, tq = sum(p_counts.values()), sum(q_counts.values())
    terms = set(p_counts) | set(q_counts)
    kp = kq = 0.0
    for t in terms:
        p = p_counts.get(t, 0) / tp
        q = q_counts.get(t, 0) / tq
        m = (p + q) / 2.0
        if p > 0:
            kp += p * math.log(p / m)
        if q > 0:
            kq += q * math.log(q / m)
    return (0.5 * kp + 0.5 * kq) / math.log(2.0)


class TestJsd:
    def test_identical_corpora_zero(self, spark):
        a = _docs(spark, ["x y z", "x x"])
        b = _docs(spark, ["x x x", "y z"], start=10)   # same distribution
        got = corpus_js_divergence(a, b).collect()[0]
        assert got.jsd_bits == 0.0
        assert got.n_shared == got.n_terms_p == got.n_terms_q == 3

    def test_disjoint_corpora_one_bit(self, spark):
        a = _docs(spark, ["x y", "z"])
        b = _docs(spark, ["u v", "w"], start=10)
        got = corpus_js_divergence(a, b).collect()[0]
        assert got.jsd_bits == pytest.approx(1.0)
        assert got.n_shared == 0

    def test_matches_python_reference_and_symmetry(self, spark):
        a = _docs(spark, ["a a b c", "b d"])
        b = _docs(spark, ["a c c", "e e e"], start=10)
        pc = {"a": 2, "b": 2, "c": 1, "d": 1}
        qc = {"a": 1, "c": 2, "e": 3}
        want = round(_py_jsd(pc, qc), 6)
        ab = corpus_js_divergence(a, b).collect()[0]
        ba = corpus_js_divergence(b, a).collect()[0]
        assert ab.jsd_bits == pytest.approx(want)
        assert ab.jsd_bits == ba.jsd_bits            # symmetric
        assert 0.0 < ab.jsd_bits < 1.0

    def test_null_text_contributes_nothing(self, spark):
        a = _docs(spark, ["x y", None])
        b = _docs(spark, ["x y"], start=10)
        assert corpus_js_divergence(a, b).collect()[0].jsd_bits == 0.0

    def test_histogram_counts(self, spark):
        h = {r.term: r.n
             for r in unigram_histogram(_docs(spark, ["a B b", "a"]))
             .collect()}
        assert h == {"a": 2, "b": 2}                 # lowercased


class TestOverlapMatrix:
    def test_unordered_rollup_and_diagonal(self, spark):
        # two near-identical docs across sources + two within one source
        base = " ".join(f"w{i}" for i in range(40))
        rows = [(1, base, "s1"), (2, base + " tail", "s0"),
                (3, base + " x", "s1"), (4, "totally different " * 10, "s0")]
        d = spark.createDataFrame(
            rows, "doc_id long, text string, source string")
        got = {(r.source_a, r.source_b): r
               for r in source_overlap_matrix(d).collect()}
        assert ("s0", "s1") in got                   # cross-source, ordered
        assert all(a <= b for a, b in got)           # unordered contract
        for r in got.values():
            assert r.n_pairs >= 1
            assert 0.0 < r.max_jaccard <= 1.0
            # mean is derivable and bounded by the max
            assert r.sum_jaccard / r.n_pairs <= r.max_jaccard + 1e-9

    def test_gate_query_runs(self, spark):
        from agnostic_blockchain_etl_spark.operators.observe import \
            source_overlap_matrix_gate
        rows = source_overlap_matrix_gate(spark, SF_DIR).collect()
        assert rows, "the corpus has near-dups; the matrix must fill"
        assert all(r.source_a <= r.source_b for r in rows)


class TestPackEfficiency:
    def test_arithmetic(self, spark):
        from agnostic_blockchain_etl_spark.operators.corpus import (
            chunk, pack_sequences)
        d = _docs(spark, [" ".join(["w"] * n) for n in (40, 50, 33, 7)])
        packed = pack_sequences(chunk(d), budget=64, n_shards=2)
        rep = {r.shard: r for r in pack_efficiency_report(packed).collect()}
        import pyspark.sql.functions as F
        per = {r.shard: (r.nt, r.np) for r in
               packed.groupBy("shard")
               .agg(F.sum("n_tokens").alias("nt"),
                    F.countDistinct("pack_id").alias("np")).collect()}
        for shard, r in rep.items():
            nt, np_ = per[shard]
            assert r.n_tokens == nt and r.n_packs == np_
            # abs tolerance, not Python round(): F.round is HALF_UP,
            # Python round is banker's — they split on exact .5 ulps
            assert r.utilization == pytest.approx(nt / (np_ * 64),
                                                  abs=1e-6)
            assert 0 < r.utilization <= 1.0 + 32 / 64   # straddle bound
            assert r.spill_tokens >= 0

    def test_requires_pack_budget_column(self, spark):
        d = spark.createDataFrame(
            [(0, 0, 0, 10)],
            "shard int, pack_id long, pack_offset long, n_tokens long")
        with pytest.raises(ValueError, match="pack_budget"):
            pack_efficiency_report(d)

    def test_gate_query_runs(self, spark):
        from agnostic_blockchain_etl_spark.operators.observe import \
            pack_efficiency_report_gate
        rows = pack_efficiency_report_gate(spark, SF_DIR).collect()
        assert rows and all(0.0 < r.utilization for r in rows)
        assert all(r.n_chunks >= r.n_packs for r in rows)


class TestHistogramStore:
    def test_merge_equals_one_shot(self, spark):
        from agnostic_blockchain_etl_spark.operators.observe import (
            jsd_from_histograms, merge_histograms)
        a = _docs(spark, ["x y z", "x"])
        b = _docs(spark, ["y q"], start=10)
        both = _docs(spark, ["x y z", "x", "y q"], start=20)
        merged = merge_histograms(unigram_histogram(a),
                                  unigram_histogram(b))
        assert sorted(map(tuple, merged.collect())) == \
            sorted(map(tuple, unigram_histogram(both).collect()))
        ref = unigram_histogram(_docs(spark, ["x y"], start=30))
        got = jsd_from_histograms(merged, ref).collect()[0]
        want = corpus_js_divergence(both, _docs(spark, ["x y"],
                                                start=30)).collect()[0]
        assert tuple(got) == tuple(want)        # bit-identical

    def test_empty_side_is_guarded(self, spark):
        from agnostic_blockchain_etl_spark.operators.observe import \
            jsd_from_histograms, merge_histograms
        h = unigram_histogram(_docs(spark, ["x y"]))
        empty = h.limit(0)
        got = jsd_from_histograms(empty, h).collect()[0]
        # only the non-empty side's KL term survives: q·ln2 halves to 0.5
        assert got.jsd_bits == pytest.approx(0.5)
        assert got.n_terms_p == 0
        both_empty = jsd_from_histograms(empty, empty).collect()[0]
        # r11 self-review finding #5: counts defined 0, never NULL
        assert tuple(both_empty) == (0, 0, 0, 0.0)
        with pytest.raises(ValueError):
            merge_histograms()


class TestDriftMonitorStream:
    @staticmethod
    def _write(spark, src, rows):
        spark.createDataFrame(rows, "doc_id long, text string") \
            .coalesce(1).write.mode("append").parquet(src)

    @staticmethod
    def _drain(spark, src, ref, store, out, ckpt, **kw):
        from agnostic_blockchain_etl_spark.streaming.dedup import \
            drift_monitor_stream
        stream = (spark.readStream.schema("doc_id LONG, text STRING")
                  .option("maxFilesPerTrigger", 1).parquet(src))
        q = drift_monitor_stream(stream, ref, store, out, ckpt, **kw)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    def test_each_batch_equals_one_shot_cumulative(self, spark,
                                                   tmp_path):
        from agnostic_blockchain_etl_spark.operators.observe import \
            jsd_from_histograms
        src, out, store, ckpt = (str(tmp_path / d)
                                 for d in ("src", "out", "store",
                                           "ckpt"))
        ref_docs = _docs(spark, ["x y z z", "w x"], start=100)
        ref = unigram_histogram(ref_docs)
        batches = [[(1, "x y"), (2, "z w")],
                   [(3, None)],                      # all-null batch
                   [(4, "q q q"), (5, "x")]]
        for b in batches:
            self._write(spark, src, b)
        self._drain(spark, src, ref, store, out, ckpt,
                    compact_every=2, prune_after_compact=True)
        cum = []
        for i, b in enumerate(batches):
            cum.extend(b)
            want = jsd_from_histograms(
                unigram_histogram(
                    spark.createDataFrame(cum,
                                          "doc_id long, text string")),
                ref).collect()[0]
            got = spark.read.parquet(f"{out}/batch_id={i}").collect()[0]
            assert tuple(got) == tuple(want), f"batch {i}"
        import os
        assert any(s.startswith("upto=")
                   for s in os.listdir(f"{store}_compact"))

    def test_restart_continues_history(self, spark, tmp_path):
        from agnostic_blockchain_etl_spark.operators.observe import \
            jsd_from_histograms
        src, out, store, ckpt = (str(tmp_path / d)
                                 for d in ("rsrc", "rout", "rstore",
                                           "rckpt"))
        ref = unigram_histogram(_docs(spark, ["a b"], start=100))
        self._write(spark, src, [(1, "a a")])
        self._drain(spark, src, ref, store, out, ckpt)
        self._write(spark, src, [(2, "b c")])
        self._drain(spark, src, ref, store, out, ckpt)
        want = jsd_from_histograms(
            unigram_histogram(_docs(spark, ["a a", "b c"])),
            ref).collect()[0]
        got = spark.read.parquet(f"{out}/batch_id=1").collect()[0]
        assert tuple(got) == tuple(want)

    def test_empty_reference_raises(self, spark, tmp_path):
        from agnostic_blockchain_etl_spark.streaming.dedup import \
            drift_monitor_stream
        ref = unigram_histogram(_docs(spark, ["x"])).limit(0)
        stream = spark.readStream.format("rate").load()
        with pytest.raises(ValueError):
            drift_monitor_stream(stream, ref, str(tmp_path / "s"),
                                 str(tmp_path / "o"),
                                 str(tmp_path / "c"))


class TestStratumDivergence:
    def test_uniform_strata_score_zero(self, spark):
        from agnostic_blockchain_etl_spark.operators.observe import \
            stratum_divergence_report
        rows = [(1, "x y", "a"), (2, "x y", "b"), (3, "x y", "c")]
        d = spark.createDataFrame(
            rows, "doc_id long, text string, source string")
        got = stratum_divergence_report(d).collect()
        assert len(got) == 3
        assert all(r.jsd_bits == 0.0 and r.n_terms == 2 for r in got)

    def test_anomalous_stratum_is_the_outlier(self, spark):
        from agnostic_blockchain_etl_spark.operators.observe import \
            stratum_divergence_report
        # a and b share the corpus shape; c is disjoint vocabulary
        rows = [(1, "x y z", "a"), (2, "x y z", "b"),
                (3, "q q r", "c")]
        d = spark.createDataFrame(
            rows, "doc_id long, text string, source string")
        got = {r.stratum: r for r in
               stratum_divergence_report(d).collect()}
        assert got["c"].jsd_bits > got["a"].jsd_bits
        assert got["c"].jsd_bits > got["b"].jsd_bits
        assert got["a"].jsd_bits == got["b"].jsd_bits   # symmetric pair
        # absent-term evidence counts: c's n_terms is its OWN vocab
        assert got["c"].n_terms == 2

    def test_matches_python_reference(self, spark):
        from agnostic_blockchain_etl_spark.operators.observe import \
            stratum_divergence_report
        rows = [(1, "a a b", "s1"), (2, "b c", "s2")]
        d = spark.createDataFrame(
            rows, "doc_id long, text string, source string")
        got = {r.stratum: r.jsd_bits
               for r in stratum_divergence_report(d).collect()}
        corpus = {"a": 2, "b": 2, "c": 1}
        for s, cnt in (("s1", {"a": 2, "b": 1}), ("s2", {"b": 1, "c": 1})):
            assert got[s] == pytest.approx(
                round(_py_jsd(cnt, corpus), 6), abs=2e-6), s

    def test_gate_query_runs(self, spark):
        from agnostic_blockchain_etl_spark.operators.observe import \
            stratum_divergence_report_gate
        rows = stratum_divergence_report_gate(spark, SF_DIR).collect()
        assert rows and all(0.0 <= r.jsd_bits <= 1.0 for r in rows)
