"""Semantic dedup (SemDeDup-style): differential test against an
independent numpy implementation of the same algorithm — same
deterministic seeding, Lloyd refinement, within-cluster pairwise rule,
components, and keep policy — plus the structural invariants (one keep
per group, exact duplicates always collapse, tau above max similarity
keeps everything)."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from agnostic_blockchain_etl_spark.session import get_session
    yield get_session(master="local[8]",
                      conf={"spark.sql.shuffle.partitions": "8"})


def _cos(a, b):
    return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))


def _ref_semdedup(vid, X, nlist, tau, iters):
    """Independent reference: mirrors semantic_dedup's contract without
    touching Spark. Seeds are the nlist lowest vec_ids; assignment is
    max-cosine with ties to the lowest list_id; centroids are per-dim
    means; pairs are within-cluster cosine >= tau (rounded to 6, as the
    operator rounds before comparing); groups are connected components;
    keep is the member with the LOWEST rounded cosine-to-centroid,
    ties to lowest vec_id."""
    order = np.argsort(vid)
    seeds = [X[i] for i in order[:nlist]]
    centroids = {i + 1: np.array(s, dtype=float) for i, s in enumerate(seeds)}
    for _ in range(iters):
        assign = {}
        for i, v in enumerate(vid):
            best = max(sorted(centroids),
                       key=lambda l: (_cos(X[i], centroids[l]), -l))
            assign[v] = best
        new = {}
        for l in centroids:
            members = [X[i] for i, v in enumerate(vid) if assign[v] == l]
            if members:
                new[l] = np.mean(members, axis=0)
        centroids = new
    assign, cc = {}, {}
    for i, v in enumerate(vid):
        best = max(sorted(centroids),
                   key=lambda l: (_cos(X[i], centroids[l]), -l))
        assign[v] = best
        cc[v] = round(_cos(X[i], centroids[best]), 4)
    parent = {v: v for v in vid}

    def find(v):
        while parent[v] != v:
            parent[v] = parent[parent[v]]
            v = parent[v]
        return v

    idx = {v: i for i, v in enumerate(vid)}
    for a in vid:
        for b in vid:
            if a < b and assign[a] == assign[b] \
                    and round(_cos(X[idx[a]], X[idx[b]]), 6) >= tau:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    groups = {}
    for v in vid:
        groups.setdefault(find(v), []).append(v)
    out = {}
    for root, members in groups.items():
        gid = min(members)
        keeper = min(members, key=lambda v: (cc[v], v))
        for v in members:
            out[v] = (gid, cc[v], 1 if v == keeper else 0)
    return out


class TestSemanticDedup:
    def _planted(self, spark):
        """Two well-separated blobs in R^4; vec 0 seeds blob A, vec 1
        seeds blob B (ivf_train seeds = lowest vec_ids), so Lloyd's
        outcome is unambiguous. Blob A carries an exact duplicate pair
        (10, 11) and a distinct member 12; blob B a near-dup pair
        (20, 21) and an outlier-ish 22."""
        rows = [
            (0, [1.0, 0.05, 0.0, 0.0]),
            (1, [0.0, 0.05, 1.0, 0.0]),
            (10, [0.9, 0.1, 0.02, 0.0]),
            (11, [0.9, 0.1, 0.02, 0.0]),     # exact dup of 10
            (12, [0.8, -0.3, 0.05, 0.1]),    # same blob, not a dup
            (20, [0.02, 0.1, 0.9, 0.05]),
            (21, [0.02, 0.1, 0.901, 0.05]),  # near dup of 20
            (22, [0.0, -0.4, 0.7, 0.2]),
        ]
        return rows, spark.createDataFrame(
            rows, "vec_id long, embedding array<double>")

    def test_matches_numpy_reference(self, spark):
        from agnostic_blockchain_etl_spark.operators.similarity import \
            semantic_dedup
        rows, emb = self._planted(spark)
        got = {r.vec_id: (r.group_id, r.cosine_to_centroid, r.keep)
               for r in semantic_dedup(emb, nlist=2, tau=0.999,
                                       iters=2).collect()}
        vid = [r[0] for r in rows]
        X = [np.array(r[1]) for r in rows]
        want = _ref_semdedup(vid, X, nlist=2, tau=0.999, iters=2)
        assert set(got) == set(want)
        for v in vid:
            assert got[v][0] == want[v][0], f"group mismatch for {v}"
            assert got[v][2] == want[v][2], f"keep mismatch for {v}"
            assert abs(got[v][1] - want[v][1]) < 1e-3, f"cc mismatch for {v}"

    def test_exact_duplicates_collapse_and_one_keep_per_group(self, spark):
        from agnostic_blockchain_etl_spark.operators.similarity import \
            semantic_dedup
        _, emb = self._planted(spark)
        res = semantic_dedup(emb, nlist=2, tau=0.999, iters=2).collect()
        by_group = {}
        for r in res:
            by_group.setdefault(r.group_id, []).append(r)
        for gid, members in by_group.items():
            assert sum(m.keep for m in members) == 1
            assert gid == min(m.vec_id for m in members)
        g = {r.vec_id: r.group_id for r in res}
        assert g[10] == g[11], "exact duplicates must share a group"
        assert g[20] == g[21], "planted near-dups must share a group"
        assert g[12] != g[10], "non-dup blob member must stay separate"

    def test_tau_above_one_keeps_everything(self, spark):
        from agnostic_blockchain_etl_spark.operators.similarity import \
            semantic_dedup
        _, emb = self._planted(spark)
        res = semantic_dedup(emb, nlist=2, tau=1.5, iters=1).collect()
        assert all(r.keep == 1 for r in res)
        assert all(r.group_id == r.vec_id for r in res)

    def test_on_testdata_corpus(self, spark):
        """Real embeddings table: output covers every vector exactly
        once, keeps == number of groups, dropped vectors always share a
        group with their keeper."""
        from agnostic_blockchain_etl_spark.operators.similarity import \
            semantic_dedup
        from agnostic_blockchain_etl_spark.operators.tables import load_tables
        emb = load_tables(spark, SF_DIR, ("embeddings",))["embeddings"]
        n = emb.count()
        res = semantic_dedup(emb, nlist=4, tau=0.9, iters=1).collect()
        assert len(res) == n
        assert len({r.vec_id for r in res}) == n
        groups = {r.group_id for r in res}
        assert sum(r.keep for r in res) == len(groups)


def test_semantic_decontamination_semantics(spark):
    """Embedding-space decontamination: a contaminated doc flags 0, a
    same-bucket far doc keeps 1 with its max_cosine populated, a doc
    sharing no bucket keeps 1 with NULL max (one row out per row in),
    and cosine ties break to the smallest eval id."""
    from agnostic_blockchain_etl_spark.operators.similarity import (
        semantic_decontamination)
    # bits=4 bucket = sign pattern of the first 4 dims (0 counts +)
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]),       # cos 1 vs eval -> flag 0
         (2, [-1.0, 0.0, 0.0, 0.0]),      # different bucket -> NULL
         (3, [0.1, 0.1, 0.1, 10.0])],     # same bucket, cos ~0.01 -> 1
        "vec_id long, e array<double>")
    ev = spark.createDataFrame(
        [(10, [1.0, 0.0, 0.0, 0.0]),      # identical eval vectors:
         (5, [1.0, 0.0, 0.0, 0.0])],      # tie -> nearest is id 5
        "eval_id long, qe array<double>")
    out = {r.vec_id: r for r in
           semantic_decontamination(corpus, ev, tau=0.25, bits=4)
           .collect()}
    assert len(out) == 3                          # flag, don't drop
    assert out[1].semdecon_keep == 0 and out[1].max_cosine == 1.0
    assert out[1].nearest_eval_id == 5            # tie -> smallest id
    assert out[2].semdecon_keep == 1 and out[2].max_cosine is None
    assert out[2].nearest_eval_id is None
    assert out[3].semdecon_keep == 1
    assert out[3].max_cosine is not None and out[3].max_cosine < 0.25
    # layout independence (broadcast + partial agg, no rand())
    again = {r.vec_id: (r.semdecon_keep, r.nearest_eval_id) for r in
             semantic_decontamination(corpus.repartition(5), ev,
                                      tau=0.25, bits=4).collect()}
    assert again == {k: (v.semdecon_keep, v.nearest_eval_id)
                     for k, v in out.items()}
