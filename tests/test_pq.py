"""Product quantization (`operators/pq.py`): encode geometry (code
range, tie direction, seed self-reconstruction), ADC exactness on
codebook members (reconstruction is exact there, so ADC == true
squared L2), a NumPy end-to-end reference for the search, the bounded
diagnostics frame, and plan shape (the ADC scoring stage is pure JVM —
no Arrow eval past the encode boundary). Cross-engine values are
pinned by the registered `emb_pq_adc_topk` / `pq_code_stats` pairs."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from agnostic_blockchain_etl_spark.operators.pq import (  # noqa: E402
    pq_adc_topk, pq_code_stats, pq_encode, pq_seed_codebook)


@pytest.fixture(scope="module")
def spark():
    from agnostic_blockchain_etl_spark.session import get_session
    yield get_session(master="local[8]",
                      conf={"spark.sql.shuffle.partitions": "8"})


M, DSUB, KSUB = 4, 3, 5          # dim 12, tiny geometry for the units
DIM = M * DSUB


@pytest.fixture(scope="module")
def mat():
    rng = np.random.RandomState(11)
    return rng.randn(60, DIM)


def _emb(spark, mat, start_id=0):
    rows = [(start_id + i, [float(x) for x in row])
            for i, row in enumerate(mat)]
    return spark.createDataFrame(rows, "vec_id long, e array<double>")


@pytest.fixture(scope="module")
def seeds(spark, mat):
    return pq_seed_codebook(_emb(spark, mat), KSUB, exclude_below=0)


class TestEncode:
    def test_codes_shape_and_range(self, spark, mat, seeds):
        rows = pq_encode(_emb(spark, mat), seeds, M).collect()
        assert len(rows) == len(mat)
        for r in rows:
            assert len(r["codes"]) == M
            assert all(0 <= c < KSUB for c in r["codes"])

    def test_seed_vectors_reconstruct_exactly(self, spark, mat, seeds):
        """A vector that IS centroid c has distance exactly 0.0 to
        itself in every subspace — its codes are its own cid and its
        reconstruction error is 0 (the quantizer's fixed points)."""
        rows = (pq_encode(_emb(spark, mat[:KSUB]), seeds, M,
                          with_dists=True)
                .orderBy("vec_id").collect())
        for cid, r in enumerate(rows):
            assert r["codes"] == [cid] * M
            assert all(d == 0.0 for d in r["dists"])

    def test_ties_break_to_lowest_code(self, spark):
        """Two identical centroids: argmin must pick the lower cid
        (the oracle's ORDER BY d, cid)."""
        dup = np.ones((KSUB, DIM))
        dup[2:] = np.arange(2, KSUB)[:, None] * 10.0
        vec = _emb(spark, np.ones((1, DIM)))
        codes = pq_encode(vec, dup, M).collect()[0]["codes"]
        assert codes == [0] * M      # centroids 0 and 1 tie; 0 wins

    def test_uneven_geometry_rejected(self, spark, mat, seeds):
        with pytest.raises(ValueError, match="split evenly"):
            pq_encode(_emb(spark, mat), seeds, m=5).collect()

    def test_short_seed_sample_rejected(self, spark, mat):
        with pytest.raises(ValueError, match="seed vectors"):
            pq_seed_codebook(_emb(spark, mat[:3]), KSUB)


def _numpy_adc_topk(mat, seeds, queries, qids, k):
    """End-to-end NumPy reference: encode + LUT + rank."""
    cube = seeds.reshape(KSUB, M, DSUB)
    x = mat.reshape(len(mat), M, DSUB)
    d = ((x[:, None, :, :] - cube[None, :, :, :]) ** 2).sum(axis=3)
    codes = d.argmin(axis=1)                        # n × M
    out = []
    for qi, q in zip(qids, queries):
        lut = ((q.reshape(M, DSUB)[None] - cube) ** 2).sum(axis=2)
        adc = lut[codes, np.arange(M)[None, :]].sum(axis=1)
        order = sorted(range(len(mat)),
                       key=lambda i: (round(adc[i], 4), i))
        out += [(qi, i, round(adc[i], 4), r + 1)
                for r, i in enumerate(order[:k])]
    return out


class TestAdcSearch:
    def test_matches_numpy_reference(self, spark, mat, seeds):
        corpus = _emb(spark, mat)
        qmat = np.random.RandomState(5).randn(3, DIM)
        queries = spark.createDataFrame(
            [(100 + i, [float(x) for x in row])
             for i, row in enumerate(qmat)],
            "query_id long, qe array<double>")
        got = sorted(tuple(r) for r in pq_adc_topk(
            pq_encode(corpus, seeds, M), queries, seeds, M, k=4)
            .collect())
        want = sorted(_numpy_adc_topk(mat, seeds, qmat,
                                      [100, 101, 102], 4))
        assert got == want

    def test_adc_exact_on_codebook_members(self, spark, mat, seeds):
        """Corpus rows that are codebook members reconstruct exactly,
        so their ADC distance equals the TRUE squared L2 distance."""
        corpus = _emb(spark, mat[:KSUB])
        q = mat[40]
        queries = spark.createDataFrame(
            [(900, [float(x) for x in q])],
            "query_id long, qe array<double>")
        got = {r["neighbor_id"]: r["adc_l2"]
               for r in pq_adc_topk(pq_encode(corpus, seeds, M),
                                    queries, seeds, M,
                                    k=KSUB).collect()}
        for nid, adc in got.items():
            true = round(float(((q - mat[nid]) ** 2).sum()), 4)
            assert adc == pytest.approx(true, abs=2e-4)

    def test_self_match_excluded(self, spark, mat, seeds):
        corpus = _emb(spark, mat)
        queries = spark.createDataFrame(
            [(0, [float(x) for x in mat[0]])],
            "query_id long, qe array<double>")
        rows = pq_adc_topk(pq_encode(corpus, seeds, M), queries,
                           seeds, M, k=3).collect()
        assert rows and all(r["neighbor_id"] != 0 for r in rows)

    def test_scoring_stage_is_jvm_only(self, spark, mat, seeds):
        """The ADC scoring path past the encode boundary is pure
        column algebra: scoring a PRE-MATERIALIZED codes frame plans
        with no Python/Arrow eval node at all."""
        codes = spark.createDataFrame(
            [(r["vec_id"], r["codes"]) for r in
             pq_encode(_emb(spark, mat), seeds, M).collect()],
            "vec_id long, codes array<int>")
        queries = spark.createDataFrame(
            [(7, [float(x) for x in mat[7]])],
            "query_id long, qe array<double>")
        plan = pq_adc_topk(codes, queries, seeds, M) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "Arrow" not in plan


class TestCodeStats:
    def test_bounded_and_conserving(self, spark, mat, seeds):
        rows = pq_code_stats(_emb(spark, mat), seeds, M).collect()
        assert len(rows) <= M * KSUB
        assert {r["subspace"] for r in rows} == set(range(M))
        # every vector lands in exactly one cell per subspace
        per_sub = {}
        for r in rows:
            per_sub[r["subspace"]] = \
                per_sub.get(r["subspace"], 0) + r["n_vectors"]
            assert r["sum_l2"] >= 0.0
        assert set(per_sub.values()) == {len(mat)}

    def test_distortion_zero_for_pure_seed_corpus(self, spark, mat,
                                                  seeds):
        rows = pq_code_stats(_emb(spark, mat[:KSUB]), seeds,
                             M).collect()
        assert all(r["sum_l2"] == 0.0 for r in rows)
        assert all(r["code"] >= 0 for r in rows)


class TestGateShapes:
    def test_gate_queries_run_on_testdata(self, spark):
        from agnostic_blockchain_etl_spark.operators.pq import QUERIES
        sf = os.environ.get("SPARK_GRAFT_TEST_SF",
                            "/root/testdata/sf0.001")
        topk = QUERIES["emb_pq_adc_topk"](spark, sf)
        rows = topk.collect()
        assert {r["query_id"] for r in rows} == set(range(8))
        assert all(1 <= r["rank"] <= 5 for r in rows)
        stats = QUERIES["pq_code_stats"](spark, sf).collect()
        assert 0 < len(stats) <= 8 * 16

    def test_adc_is_monotone_in_rank(self, spark):
        from agnostic_blockchain_etl_spark.operators.pq import QUERIES
        sf = os.environ.get("SPARK_GRAFT_TEST_SF",
                            "/root/testdata/sf0.001")
        df = QUERIES["emb_pq_adc_topk"](spark, sf)
        bad = df.groupBy("query_id").agg(
            F.max(F.struct("rank", "adc_l2")).alias("hi"),
            F.min(F.struct("rank", "adc_l2")).alias("lo")).where(
            F.col("hi.adc_l2") < F.col("lo.adc_l2")).count()
        assert bad == 0


def _numpy_ivfpq(mat, coarse_mat, coarse_ids, seeds, queries, qids,
                 nprobe, k):
    """NumPy reference for the composed search (cosine route + raw-
    vector PQ + ADC within probed lists)."""
    def cos(a, B):
        an = a / (np.linalg.norm(a) or 1.0)
        Bn = B / np.linalg.norm(B, axis=1, keepdims=True)
        return Bn @ an

    cube = seeds.reshape(KSUB, M, DSUB)
    x = mat.reshape(len(mat), M, DSUB)
    d = ((x[:, None, :, :] - cube[None, :, :, :]) ** 2).sum(axis=3)
    codes = d.argmin(axis=1)
    # stable top-1 routing, ties to lowest seed id (ids are sorted)
    assigned = [coarse_ids[int(np.argmax(cos(v, coarse_mat)))]
                for v in mat]
    out = []
    for qi, q in zip(qids, queries):
        sc = cos(q, coarse_mat)
        probe = [coarse_ids[j] for j in
                 np.argsort(-sc, kind="stable")[:nprobe]]
        lut = ((q.reshape(M, DSUB)[None] - cube) ** 2).sum(axis=2)
        cand = [i for i in range(len(mat)) if assigned[i] in probe]
        adc = {i: round(float(
            lut[codes[i], np.arange(M)].sum()), 4) for i in cand}
        order = sorted(cand, key=lambda i: (adc[i], i))
        out += [(qi, i, adc[i], r + 1)
                for r, i in enumerate(order[:k])]
    return out


class TestIvfPq:
    NLIST, NPROBE = 6, 2

    def _setup(self, spark, mat):
        corpus = _emb(spark, mat)
        coarse_ids = list(range(self.NLIST))
        coarse_mat = mat[:self.NLIST]
        coarse = spark.createDataFrame(
            [(i, [float(x) for x in coarse_mat[i]])
             for i in coarse_ids],
            "seed_id long, se array<double>")
        return corpus, coarse, coarse_mat, coarse_ids

    def test_matches_numpy_reference(self, spark, mat, seeds):
        from agnostic_blockchain_etl_spark.operators.pq import \
            ivfpq_topk
        corpus, coarse, cmat, cids = self._setup(spark, mat)
        qmat = np.random.RandomState(9).randn(3, DIM)
        queries = spark.createDataFrame(
            [(200 + i, [float(x) for x in row])
             for i, row in enumerate(qmat)],
            "query_id long, qe array<double>")
        got = sorted(tuple(r) for r in
                     ivfpq_topk(corpus, queries, coarse, seeds, M,
                                k=4, nprobe=self.NPROBE).collect())
        want = sorted(_numpy_ivfpq(mat, cmat, cids, seeds, qmat,
                                   [200, 201, 202], self.NPROBE, 4))
        assert got == want

    def test_neighbors_come_only_from_probed_lists(self, spark, mat,
                                                   seeds):
        """The IVF contract: every returned neighbor is routed to one
        of the query's nprobe lists — the scan never touched the
        rest of the corpus."""
        from agnostic_blockchain_etl_spark.operators.pq import \
            _route, ivfpq_topk
        corpus, coarse, _, _ = self._setup(spark, mat)
        queries = spark.createDataFrame(
            [(300, [float(x) for x in mat[30]])],
            "query_id long, qe array<double>")
        res = ivfpq_topk(corpus, queries, coarse, seeds, M,
                         k=10, nprobe=self.NPROBE).collect()
        assigned = {r["vec_id"]: r["list_id"] for r in
                    _route(corpus, coarse, "vec_id", 1).collect()}
        probed = {r["list_id"] for r in _route(
            queries.select(F.col("query_id").alias("vec_id"),
                           F.col("qe").alias("e")),
            coarse, "query_id", self.NPROBE).collect()}
        assert res
        assert all(assigned[r["neighbor_id"]] in probed for r in res)

    def test_probing_all_lists_equals_flat_adc(self, spark, mat,
                                               seeds):
        """nprobe = nlist degrades IVF-PQ to the flat ADC scan — the
        recall dial's endpoint."""
        from agnostic_blockchain_etl_spark.operators.pq import \
            ivfpq_topk, pq_adc_topk, pq_encode
        corpus, coarse, _, _ = self._setup(spark, mat)
        queries = spark.createDataFrame(
            [(400, [float(x) for x in mat[50]])],
            "query_id long, qe array<double>")
        full = sorted(tuple(r) for r in
                      ivfpq_topk(corpus, queries, coarse, seeds, M,
                                 k=5, nprobe=self.NLIST).collect())
        flat = sorted(tuple(r) for r in pq_adc_topk(
            pq_encode(corpus, seeds, M), queries, seeds, M,
            k=5).collect())
        # query_id 400 is not a corpus id, so self-exclusion is moot
        assert full == flat
