"""DSIR importance resampling: domain-discrimination semantics, exact
DuckDB parity of the hashed-n-gram importance log-weights, and the
deterministic Gumbel-top-k selection."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from agnostic_blockchain_etl_spark.operators.dedup import (  # noqa: E402
    _SQL_HASH60, _SQL_WORDS)
from agnostic_blockchain_etl_spark.operators.dsir import (  # noqa: E402
    dsir_log_weights, dsir_sample)

B = 512   # small bucket space so collisions actually occur in-test


@pytest.fixture(scope="module")
def spark():
    from agnostic_blockchain_etl_spark.session import get_session
    yield get_session(master="local[8]",
                      conf={"spark.sql.shuffle.partitions": "8"})


def _corpora():
    import random
    rng = random.Random(3)
    a_vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    b_vocab = ["zulu", "yankee", "xray", "whiskey", "victor", "uniform"]

    def doc(vocab, n):
        return " ".join(rng.choice(vocab) for _ in range(n))

    target = [(1000 + i, doc(a_vocab, 30)) for i in range(10)]
    raw = ([(i, doc(a_vocab, 25)) for i in range(20)] +          # A-like
           [(100 + i, doc(b_vocab, 25)) for i in range(20)])     # off-domain
    return target, raw


def test_weights_separate_domains_and_match_duckdb(spark):
    target, raw = _corpora()
    raw_df = spark.createDataFrame(raw, "doc_id long, text string")
    targ_df = spark.createDataFrame(target, "doc_id long, text string")
    got = {r.doc_id: r for r in
           dsir_log_weights(raw_df, targ_df, buckets=B).collect()}

    # 1) every in-domain raw doc outweighs every off-domain one
    a_w = [got[i].log_weight for i in range(20)]
    b_w = [got[100 + i].log_weight for i in range(20)]
    assert min(a_w) > max(b_w)

    # 2) exact DuckDB parity of n_feats and log_weight
    con = duckdb.connect()
    con.execute("CREATE TABLE raw (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO raw VALUES (?, ?)", raw)
    con.execute("CREATE TABLE targ (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO targ VALUES (?, ?)", target)
    feats = f"""
        SELECT doc_id, unnest(list_concat(words,
            CASE WHEN len(words) >= 2 THEN list_transform(
                generate_series(1, len(words) - 1),
                i -> words[i] || ' ' || words[i+1])
            ELSE [] END)) AS shingle
        FROM (SELECT doc_id, {_SQL_WORDS} AS words FROM {{t}})"""
    want = dict(con.execute(f"""
        WITH rf AS (SELECT doc_id, ({_SQL_HASH60}) % {B} AS b
                    FROM ({feats.format(t='raw')})),
        tf AS (SELECT doc_id, ({_SQL_HASH60}) % {B} AS b
               FROM ({feats.format(t='targ')})),
        cr AS (SELECT b, count(*) AS c FROM rf GROUP BY b),
        ct AS (SELECT b, count(*) AS c FROM tf GROUP BY b),
        tr AS (SELECT count(*) AS t FROM rf),
        tt AS (SELECT count(*) AS t FROM tf),
        lr AS (
            SELECT cr.b,
                   ln((coalesce(ct.c, 0) + 1.0) / (tt.t + {B}))
                   - ln((cr.c + 1.0) / (tr.t + {B})) AS lr
            FROM cr LEFT JOIN ct USING (b) CROSS JOIN tr CROSS JOIN tt)
        SELECT rf.doc_id, round(sum(lr.lr), 6)
        FROM rf JOIN lr USING (b) GROUP BY rf.doc_id
    """).fetchall())
    n_feats = dict(con.execute(
        f"SELECT doc_id, count(*) FROM ({feats.format(t='raw')}) "
        "GROUP BY doc_id").fetchall())
    for doc_id, w in want.items():
        assert abs(got[doc_id].log_weight - w) <= 1e-6, doc_id
        assert got[doc_id].n_feats == n_feats[doc_id], doc_id


def test_null_text_scores_zero_and_survives(spark):
    target, raw = _corpora()
    raw_df = spark.createDataFrame(raw + [(999, None)],
                                   "doc_id long, text string")
    targ_df = spark.createDataFrame(target, "doc_id long, text string")
    got = {r.doc_id: r for r in
           dsir_log_weights(raw_df, targ_df, buckets=B).collect()}
    assert got[999].n_feats == 0 and got[999].log_weight == 0.0


def test_per_token_is_total_over_count(spark):
    target, raw = _corpora()
    raw_df = spark.createDataFrame(raw, "doc_id long, text string")
    targ_df = spark.createDataFrame(target, "doc_id long, text string")
    tot = {r.doc_id: r for r in
           dsir_log_weights(raw_df, targ_df, buckets=B).collect()}
    per = {r.doc_id: r for r in
           dsir_log_weights(raw_df, targ_df, buckets=B,
                            per_token=True).collect()}
    for d in tot:
        assert abs(per[d].log_weight * tot[d].n_feats
                   - tot[d].log_weight) <= 1e-2, d


def test_gumbel_topk_selection_biased_and_deterministic(spark):
    target, raw = _corpora()
    raw_df = spark.createDataFrame(raw, "doc_id long, text string")
    targ_df = spark.createDataFrame(target, "doc_id long, text string")
    picked = [r.doc_id for r in
              dsir_sample(raw_df, targ_df, k=10, buckets=B).collect()]
    assert len(picked) == 10
    in_domain = sum(1 for d in picked if d < 100)
    assert in_domain >= 8, picked            # selection tracks the weights
    again = [r.doc_id for r in
             dsir_sample(raw_df.repartition(7), targ_df, k=10,
                         buckets=B).collect()]
    assert set(picked) == set(again)         # layout-independent draw
    # output carries the weight columns alongside the original row
    row = dsir_sample(raw_df, targ_df, k=1, buckets=B).first()
    assert {"doc_id", "text", "n_feats", "log_weight"} <= set(
        dsir_sample(raw_df, targ_df, k=1, buckets=B).columns)
    assert row.text is not None
