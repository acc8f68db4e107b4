"""Embedding moments + PCA (`operators/embstats.py`): the gram scale
path pinned value-for-value against the declarative path and a NumPy
reference, eigenvector determinism, projection geometry (diagonal
covariance, variance ordering), and plan shape (no generator in the
gram path). Cross-engine values are pinned by the registered
`emb_covariance_matrix` pair."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from agnostic_blockchain_etl_spark.operators.embstats import (  # noqa: E402
    embedding_covariance, pca_components, pca_project)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def spark():
    from agnostic_blockchain_etl_spark.session import get_session
    yield get_session(master="local[8]",
                      conf={"spark.sql.shuffle.partitions": "8"})


def _emb(spark, mat, with_null=False):
    rows = [(i, [float(x) for x in row]) for i, row in enumerate(mat)]
    if with_null:
        rows.append((len(rows), None))
    return spark.createDataFrame(rows,
                                 "vec_id long, embedding array<double>")


@pytest.fixture(scope="module")
def rng_mat():
    rng = np.random.RandomState(7)
    # anisotropic on purpose: dim 0 has 4x the variance of dim 3
    return rng.randn(120, 4) * np.array([2.0, 1.0, 0.7, 0.5]) \
        + np.array([1.0, -2.0, 0.0, 3.0])


class TestCovariance:
    def test_gram_equals_declarative_and_numpy(self, spark, rng_mat):
        emb = _emb(spark, rng_mat)
        want = np.cov(rng_mat, rowvar=False, bias=True)   # population
        for method in ("gram", "declarative"):
            got = {(r.i, r.j): r.cov
                   for r in embedding_covariance(
                       emb, method=method).collect()}
            assert len(got) == 16
            for (i, j), v in got.items():
                assert v == pytest.approx(want[i, j], abs=2e-6), \
                    (method, i, j)
                assert got[(i, j)] == got[(j, i)]          # symmetric

    def test_null_vectors_skipped(self, spark, rng_mat):
        a = embedding_covariance(_emb(spark, rng_mat)).collect()
        b = embedding_covariance(_emb(spark, rng_mat,
                                      with_null=True)).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_null_element_vectors_skipped_by_both_methods(self, spark,
                                                          rng_mat):
        # r11 self-review finding #4: a vector with a NULL ELEMENT must
        # be excluded identically in both paths (declarative avg would
        # skip per-coordinate; the gram fold would NaN-poison rows)
        rows = [(i, [float(x) for x in r]) for i, r in enumerate(rng_mat)]
        rows.append((len(rows), [1.0, None, 2.0, 3.0]))
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>")
        clean = embedding_covariance(_emb(spark, rng_mat)).collect()
        for method in ("gram", "declarative"):
            got = embedding_covariance(emb, method=method).collect()
            assert sorted(map(tuple, got)) == sorted(map(tuple, clean)), \
                method

    def test_gram_partials_one_row_per_partition(self, spark, rng_mat):
        # r11 self-review finding #2: the driver fold must be bounded
        # by partition count, not Arrow batch count
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                       "16")
        try:
            emb = _emb(spark, rng_mat).repartition(3)  # 120 rows, 3 parts
            rows = emb.selectExpr(
                "cast(embedding as array<double>) as v")
            import numpy as np
            import pandas as pd

            def probe(it):
                n, out = 0, []
                for pdf in it:
                    n += len(pdf)
                if n:
                    out.append(pd.DataFrame({"n": [n]}))
                return iter(out)
            parts = rows.mapInPandas(probe, "n long").collect()
            assert len(parts) <= 3          # the accumulation contract
            # and the real operator still matches numpy on this layout
            got = {(r.i, r.j): r.cov
                   for r in embedding_covariance(emb).collect()}
            want = np.cov(rng_mat, rowvar=False, bias=True)
            for (i, j), v in got.items():
                assert v == pytest.approx(want[i, j], abs=2e-6)
        finally:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")

    def test_validation(self, spark, rng_mat):
        emb = _emb(spark, rng_mat)
        with pytest.raises(ValueError):
            embedding_covariance(emb, method="nope")
        empty = spark.createDataFrame(
            [], "vec_id long, embedding array<double>")
        with pytest.raises(ValueError):
            embedding_covariance(empty)

    def test_gram_plan_has_no_generator(self, spark, rng_mat):
        # the scale path must never explode n*d^2 rows: its only
        # Python boundary is the mapInPandas partial, no Generate node
        import contextlib
        import io
        from pyspark.sql import functions as F
        emb = _emb(spark, rng_mat)
        rows = emb.where(F.col("embedding").isNotNull()) \
                  .select(F.col("embedding").cast("array<double>")
                          .alias("v"))
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rows.explain("formatted")
        assert "Generate" not in buf.getvalue()

    def test_gate_query_runs(self, spark):
        from agnostic_blockchain_etl_spark.operators.embstats import \
            emb_covariance_matrix
        rows = emb_covariance_matrix(spark, SF_DIR).collect()
        d = max(r.i for r in rows) + 1
        assert len(rows) == d * d
        got = {(r.i, r.j): r.cov for r in rows}
        assert all(got[(i, j)] == got[(j, i)] for i, j in got)
        assert all(got[(i, i)] > 0 for i in range(d))   # positive var


class TestPca:
    def test_components_capture_variance_in_order(self, spark, rng_mat):
        emb = _emb(spark, rng_mat)
        comps, vals = pca_components(emb, 4)
        assert comps.shape == (4, 4)
        assert all(a >= b for a, b in zip(vals, vals[1:]))  # descending
        # orthonormal columns
        assert np.allclose(comps.T @ comps, np.eye(4), atol=1e-6)
        # sign fix: the largest-|entry| of each column is positive
        for c in range(4):
            assert comps[np.abs(comps[:, c]).argmax(), c] > 0
        # eigenvalues ~ the anisotropic construction's variances
        assert vals[0] == pytest.approx(
            np.cov(rng_mat, rowvar=False, bias=True)[0, 0], rel=0.2)

    def test_projection_diagonalizes_covariance(self, spark, rng_mat):
        emb = _emb(spark, rng_mat)
        comps, vals = pca_components(emb, 2)
        proj = pca_project(emb, comps)
        got = np.stack([r.proj for r in proj.orderBy("vec_id").collect()])
        centered = got - got.mean(axis=0)
        pcov = centered.T @ centered / len(got)
        assert pcov[0, 1] == pytest.approx(0.0, abs=1e-4)
        assert pcov[0, 0] == pytest.approx(vals[0], rel=1e-3)
        assert pcov[1, 1] == pytest.approx(vals[1], rel=1e-3)
        # and projection equals the plain matmul
        want = (rng_mat @ comps)
        assert np.allclose(got, want, atol=1e-9)

    def test_validation(self, spark, rng_mat):
        emb = _emb(spark, rng_mat)
        with pytest.raises(ValueError):
            pca_components(emb, 0)
        with pytest.raises(ValueError):
            pca_components(emb, 5)      # k > d
