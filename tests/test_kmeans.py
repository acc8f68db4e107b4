"""Lloyd k-means trainer (`operators/kmeans.py`): parity against a
NumPy reference implementation of the same algorithm (seed init +
argmin assignment + 6-dp rounded means), inertia monotonicity across
iterations, empty-cluster centroid retention, tie-to-lowest-cid
assignment, codebook consumability by the ANN operators, and argument
validation. The cross-engine iterative algebra is pinned by the
registered `kmeans_train_diagnostics` oracle pair."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from agnostic_blockchain_etl_spark.operators.kmeans import (  # noqa: E402
    kmeans_train, kmeans_update, l2_assign)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def spark():
    from agnostic_blockchain_etl_spark.session import get_session
    yield get_session(master="local[8]",
                      conf={"spark.sql.shuffle.partitions": "8"})


@pytest.fixture(scope="module")
def emb(spark):
    from agnostic_blockchain_etl_spark.operators.tables import load_tables
    return load_tables(spark, SF_DIR, ("embeddings",))["embeddings"] \
        .select("vec_id", F.col("embedding").cast("array<double>")
                .alias("e"))


def _np_lloyd(x: np.ndarray, k: int, iters: int) -> np.ndarray:
    """The reference algorithm: identical seed, argmin, rounded
    means, empty-cluster retention — in plain NumPy."""
    cb = x[:k].copy()
    for _ in range(iters):
        d = ((x[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        nxt = cb.copy()
        for c in range(k):
            if (a == c).any():
                nxt[c] = np.round(x[a == c].mean(axis=0), 6)
        cb = nxt
    return cb


def _collected(emb):
    rows = emb.orderBy("vec_id").collect()
    return np.array([r["e"] for r in rows], dtype=np.float64)


class TestTrainer:
    def test_matches_numpy_reference(self, spark, emb):
        """2 Spark iterations == 2 NumPy iterations of the identical
        algorithm, to within the 6-dp rounding the contract states
        (float sum order may differ at the last ulp BEFORE rounding,
        so compare at the rounded precision with one-ulp slack)."""
        x = _collected(emb)
        got = kmeans_train(emb, k=8, iters=2)
        want = _np_lloyd(x, k=8, iters=2)
        assert got.shape == want.shape == (8, 64)
        assert np.abs(got - want).max() <= 1.1e-6

    def test_inertia_never_increases(self, spark, emb):
        inertias = []
        for iters in (0, 1, 2):
            cb = kmeans_train(emb, k=8, iters=iters)
            inertia = (l2_assign(emb, cb).agg(F.sum("dist"))
                       .collect()[0][0])
            inertias.append(inertia)
        assert inertias[0] >= inertias[1] >= inertias[2] - 1e-9

    def test_negative_iters_rejected(self, spark, emb):
        with pytest.raises(ValueError, match="iters"):
            kmeans_train(emb, k=8, iters=-1)


class TestAssignAndUpdate:
    def test_tie_breaks_to_lowest_cid(self, spark):
        d = spark.createDataFrame([(0, [1.0, 1.0])], "vec_id long, e array<double>")
        cb = np.array([[0.0, 0.0], [2.0, 2.0]])   # equidistant
        got = l2_assign(d, cb).collect()[0]
        assert got["cid"] == 0 and got["dist"] == 2.0

    def test_empty_cluster_keeps_previous_centroid(self, spark):
        d = spark.createDataFrame(
            [(i, [float(i), 0.0]) for i in range(4)],
            "vec_id long, e array<double>")
        cb = np.array([[0.0, 0.0], [100.0, 100.0]])  # cid 1 never wins
        out = kmeans_update(l2_assign(d, cb), cb)
        assert np.allclose(out[1], [100.0, 100.0])
        assert np.allclose(out[0], [1.5, 0.0])

    def test_trained_codebook_feeds_the_ann_ladder(self, spark, emb):
        """The contract with `pq`/`similarity`: a trained codebook
        drops into pq_encode unchanged."""
        from agnostic_blockchain_etl_spark.operators.pq import pq_encode
        cb = kmeans_train(emb, k=16, iters=1)
        codes = pq_encode(emb, cb, 8).limit(5).collect()
        assert all(len(r["codes"]) == 8 for r in codes)


class TestGateShape:
    def test_facets_consistent(self, spark):
        from agnostic_blockchain_etl_spark.operators.kmeans import (
            kmeans_train_diagnostics)
        out = kmeans_train_diagnostics(spark, SF_DIR).collect()
        facets = {r["facet"] for r in out}
        assert facets == {"centroid", "assign", "size"}
        n_vec = sum(1 for r in out if r["facet"] == "assign")
        sizes = [r for r in out if r["facet"] == "size"]
        assert sum(r["n"] for r in sizes) == n_vec
        assert sum(1 for r in out if r["facet"] == "centroid") == 8 * 64
        # inertia per cluster equals the sum of its members' distances
        by_cid = {r["cid"]: r["inertia"] for r in sizes}
        for cid, want in by_cid.items():
            got = sum(r["dist"] for r in out
                      if r["facet"] == "assign" and r["cid"] == cid)
            assert abs(got - want) < 1e-2
