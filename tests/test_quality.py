"""Trained quality classifier: domain discrimination, exact numpy
parity of the distributed gradient descent, DuckDB parity of the
scoring pass, and the deterministic Pareto keep rule."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from agnostic_blockchain_etl_spark.operators.dedup import (  # noqa: E402
    _SQL_HASH60, _SQL_WORDS)
from agnostic_blockchain_etl_spark.operators.quality import (  # noqa: E402
    _design, quality_classifier_score, quality_pareto_keep,
    train_quality_classifier)

B = 256


@pytest.fixture(scope="module")
def spark():
    from agnostic_blockchain_etl_spark.session import get_session
    yield get_session(master="local[8]",
                      conf={"spark.sql.shuffle.partitions": "8"})


def _corpora():
    import random
    rng = random.Random(7)
    hi = ["the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog"]
    lo = ["buy", "cheap", "pills", "click", "here", "now", "win", "cash"]

    def doc(vocab, n):
        return " ".join(rng.choice(vocab) for _ in range(n))

    pos = [(i, doc(hi, 20)) for i in range(30)]
    neg = [(i, doc(lo, 20)) for i in range(30)]
    return pos, neg


@pytest.fixture(scope="module")
def model(spark):
    pos, neg = _corpora()
    pos_df = spark.createDataFrame(pos, "doc_id long, text string")
    neg_df = spark.createDataFrame(neg, "doc_id long, text string")
    return train_quality_classifier(pos_df, neg_df, buckets=B,
                                    iters=25, lr=2.0, l2=1e-4).cache()


def test_separates_domains_on_held_out(spark, model):
    pos, neg = _corpora()
    # held-out docs drawn from the same vocabularies, fresh word order
    import random
    rng = random.Random(99)
    hi = ["the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog"]
    lo = ["buy", "cheap", "pills", "click", "here", "now", "win", "cash"]
    held = ([(i, " ".join(rng.choice(hi) for _ in range(15)), 1)
             for i in range(20)] +
            [(100 + i, " ".join(rng.choice(lo) for _ in range(15)), 0)
             for i in range(20)])
    df = spark.createDataFrame(held, "doc_id long, text string, y int")
    got = {r.doc_id: r.q_score for r in
           quality_classifier_score(df, model).collect()}
    acc = sum(1 for d, _, y in held
              if (got[d] > 0.5) == bool(y)) / len(held)
    assert acc == 1.0, acc


def test_gd_matches_numpy_reference(spark):
    """The distributed trainer IS full-batch GD: replay the identical
    updates in numpy over the collected design matrix and compare the
    final weights."""
    pos, neg = _corpora()
    pos_df = spark.createDataFrame(pos, "doc_id long, text string")
    neg_df = spark.createDataFrame(neg, "doc_id long, text string")
    iters, lr, l2 = 7, 1.5, 1e-3
    got = {r.b: r.w for r in
           train_quality_classifier(pos_df, neg_df, buckets=B,
                                    iters=iters, lr=lr, l2=l2).collect()}

    rows = (_design(pos_df, 1, B, "text").unionAll(
        _design(neg_df, 0, B, "text")).collect())
    keys = sorted({(r.key, r.y) for r in rows})
    kidx = {k: i for i, (k, _) in enumerate(keys)}
    y = np.array([yy for _, yy in keys], dtype=float)
    X = np.zeros((len(keys), B))
    for r in rows:
        X[kidx[r.key], r.b] += r.x
    w = np.zeros(B)
    bias = 0.0
    n = len(keys)
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ w + bias)))
        err = p - y
        w -= lr * ((X.T @ err) / n + l2 * w)
        bias -= lr * err.sum() / n
    for b in range(B):
        assert abs(got[b] - w[b]) <= 1e-8, b
    assert abs(got[-1] - bias) <= 1e-8


def test_score_matches_duckdb(spark, model):
    """Given the trained model frame, the scoring pass has an exact SQL
    twin: q_score = sigmoid(bias + avg(w over hashed features))."""
    pos, neg = _corpora()
    docs = ([(i, t) for i, t in pos] +
            [(1000 + i, t) for i, t in neg] + [(9999, None)])
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r for r in
           quality_classifier_score(df, model).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", docs)
    con.execute("CREATE TABLE model (b INTEGER, w DOUBLE)")
    con.executemany("INSERT INTO model VALUES (?, ?)",
                    [(r.b, r.w) for r in model.collect()])
    feats = f"""
        SELECT doc_id, unnest(list_concat(words,
            CASE WHEN len(words) >= 2 THEN list_transform(
                generate_series(1, len(words) - 1),
                i -> words[i] || ' ' || words[i+1])
            ELSE [] END)) AS shingle
        FROM (SELECT doc_id, {_SQL_WORDS} AS words FROM docs)"""
    want = dict(con.execute(f"""
        WITH f AS (SELECT doc_id, ({_SQL_HASH60}) % {B} AS b
                   FROM ({feats})),
        per AS (SELECT f.doc_id, count(*) AS n, avg(m.w) AS mw
                FROM f JOIN model m USING (b) GROUP BY f.doc_id),
        bias AS (SELECT w FROM model WHERE b = -1)
        SELECT d.doc_id,
               round(1.0 / (1.0 + exp(-(coalesce(per.mw, 0) + bias.w))), 6)
        FROM docs d LEFT JOIN per ON d.doc_id = per.doc_id
        CROSS JOIN bias
    """).fetchall())
    for doc_id, s in want.items():
        assert abs(got[doc_id].q_score - s) <= 1e-6, doc_id
    assert got[9999].n_feats == 0      # null text scores sigmoid(bias)


def test_pareto_keep_deterministic_and_monotone(spark, model):
    pos, neg = _corpora()
    df = spark.createDataFrame(
        [(i, t) for i, t in pos] + [(1000 + i, t) for i, t in neg],
        "doc_id long, text string")
    scored = quality_classifier_score(df, model)
    kept = {r.doc_id: r.keep for r in quality_pareto_keep(scored).collect()}
    again = {r.doc_id: r.keep for r in
             quality_pareto_keep(
                 quality_classifier_score(df.repartition(5), model))
             .collect()}
    assert kept == again                      # layout-independent
    hi_rate = sum(kept[i] for i, _ in pos) / len(pos)
    lo_rate = sum(kept[1000 + i] for i, _ in neg) / len(neg)
    assert hi_rate > lo_rate                  # keeps track the scores
    # survival bounds, decoupled from trainer confidence: a saturated
    # score always survives (max threshold among these doc_ids is
    # 0.99071), a hopeless one never does (min threshold is 0.2327)
    synth = spark.createDataFrame(
        [(i, 0.999999) for i in range(30)] +
        [(1000 + i, 0.05) for i in range(30)],
        "doc_id long, q_score double")
    skept = {r.doc_id: r.keep for r in quality_pareto_keep(synth).collect()}
    assert all(skept[i] for i in range(30))
    assert not any(skept[1000 + i] for i in range(30))
    # the rule is score > 1 - pareto(alpha): verify one doc by hand
    row = quality_pareto_keep(scored).where("doc_id = 0").first()
    import hashlib
    u = (int(hashlib.md5(b"quality:0").hexdigest()[:15], 16) + 1) / 2.0**60
    x = u ** (-1.0 / 9.0) - 1.0
    assert row.keep == (row.q_score > 1.0 - x)


def test_select_cluster_canonical(spark):
    from agnostic_blockchain_etl_spark.operators.dedup import (
        select_cluster_canonical)
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 5), (6, 5)],
        "doc_id long, cluster_id long")
    scores = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (4, 0.5), (5, 0.1), (6, 0.7)],
        "doc_id long, q double")
    got = {r.doc_id: r.is_canonical for r in
           select_cluster_canonical(clusters, scores, "q").collect()}
    # argmax per cluster; tie in cluster 1 (docs 2, 3) → smallest id
    assert got == {1: 0, 2: 1, 3: 0, 4: 1, 5: 0, 6: 1}
    lo = {r.doc_id: r.is_canonical for r in
          select_cluster_canonical(clusters, scores, "q",
                                   higher_is_better=False).collect()}
    assert lo == {1: 1, 2: 0, 3: 0, 4: 1, 5: 1, 6: 0}
    # layout-independent determinism
    again = {r.doc_id: r.is_canonical for r in
             select_cluster_canonical(clusters.repartition(4),
                                      scores.repartition(3), "q").collect()}
    assert again == got


def test_model_is_bounded_artifact(model):
    rows = model.collect()
    assert len(rows) == B + 1
    assert sum(1 for r in rows if r.b == -1) == 1
    assert all(math.isfinite(r.w) for r in rows)


def test_quality_weighted_sample_semantics(spark):
    """Soft quality sampling: score 1 always keeps (u ∈ (0,1]), score 0
    never keeps, NULL score keeps 0 with the row intact, out-of-range
    scores clamp, sharpening (gamma 2) keeps a SUBSET of gamma 1, and
    membership is layout-independent + matches the hand-computed hash
    boundary."""
    from agnostic_blockchain_etl_spark.operators.quality import (
        quality_weighted_sample)
    rows = ([(i, 1.0) for i in range(20)]            # always kept
            + [(100 + i, 0.0) for i in range(20)]    # never kept
            + [(200 + i, 0.5) for i in range(200)]   # probabilistic
            + [(900, None), (901, 5.0), (902, -2.0),
               (903, float("nan"))])
    df = spark.createDataFrame(rows, "doc_id long, q_score double")
    out = quality_weighted_sample(df)
    assert out.count() == len(rows)                  # flag, don't drop
    k = {r.doc_id: r.sample_keep for r in out.collect()}
    assert all(k[i] == 1 for i in range(20))
    assert all(k[100 + i] == 0 for i in range(20))
    assert k[900] == 0                               # NULL -> keep 0
    assert k[901] == 1 and k[902] == 0               # clamped to 1 / 0
    # NaN -> keep 0, NOT 1: Spark orders NaN above every double, so an
    # unguarded clamp sends a 0/0-scored doc to keep-probability 1
    assert k[903] == 0
    mid = sum(k[200 + i] for i in range(200))
    assert 0 < mid < 200                             # the u-draw binds
    # hand-check one boundary: keep == (u <= p)
    import hashlib
    u = (int(hashlib.md5(b"qsample:200").hexdigest()[:15], 16) + 1) / 2.0**60
    assert k[200] == int(u <= 0.5)
    # gamma sharpening: keeps(gamma=2) is a subset of keeps(gamma=1)
    k2 = {r.doc_id: r.sample_keep for r in
          quality_weighted_sample(df, gamma=2.0).collect()}
    assert all(k2[d] <= k[d] for d in k)
    assert sum(k2[200 + i] for i in range(200)) < mid   # strictly fewer
    # sqrt path flattens: keeps(gamma=0.5) is a superset at score 0.5
    k05 = {r.doc_id: r.sample_keep for r in
           quality_weighted_sample(df, gamma=0.5).collect()}
    assert all(k05[d] >= k[d] for d in k if k[d] is not None)
    # layout independence
    again = {r.doc_id: r.sample_keep for r in
             quality_weighted_sample(df.repartition(7)).collect()}
    assert again == k
