"""Gopher document-shape quality rules: each published rule killed by a
crafted offender and only that rule's flag drops; a normal document
passes everything."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from agnostic_blockchain_etl_spark.operators.textstats import (  # noqa: E402
    gopher_quality)

PROSE = ("the quick brown fox jumps over that lazy dog and runs away "
         "to be seen with friends of another pack having fun ") * 3  # 66 words


@pytest.fixture(scope="module")
def spark():
    from agnostic_blockchain_etl_spark.session import get_session
    yield get_session(master="local[8]",
                      conf={"spark.sql.shuffle.partitions": "8"})


def _flags(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {r.doc_id: r for r in gopher_quality(df).collect()}


def test_each_rule_kills_its_offender(spark):
    bullets = "\n".join(f"- bullet item {i} of the list here now"
                        for i in range(20))
    ellipses = "\n".join(f"the line number {i} trails off here..."
                         for i in range(20))
    docs = [
        (1, PROSE),
        (2, "too short to be of use and that is it"),        # wc
        (3, " ".join(["a"] * 80) + " the of"),               # mean word len < 3
        (4, " ".join(["1234567"] * 80) + " the of and"),     # alpha frac
        (5, PROSE + " " + "# " * 30),                        # symbols
        (6, bullets),                                        # bullets
        (7, ellipses),                                       # ellipsis
        (8, " ".join(f"w{i}xyz" for i in range(60))),        # no stop words
    ]
    f = _flags(spark, docs)
    ok = f[1]
    assert ok.gopher_keep == 1 and all(
        getattr(ok, k) == 1 for k in
        ("wc_ok", "wordlen_ok", "alpha_ok", "symbol_ok", "bullet_ok",
         "ellipsis_ok", "stopword_ok"))
    assert f[2].wc_ok == 0 and f[2].gopher_keep == 0
    assert f[3].wordlen_ok == 0 and f[3].gopher_keep == 0
    assert f[4].alpha_ok == 0
    assert f[5].symbol_ok == 0 and f[5].gopher_keep == 0
    assert f[6].bullet_ok == 0 and f[6].gopher_keep == 0
    assert f[7].ellipsis_ok == 0 and f[7].gopher_keep == 0
    assert f[8].stopword_ok == 0 and f[8].gopher_keep == 0


def test_signals_are_sane_on_real_corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "text")
    rows = gopher_quality(docs).collect()
    assert len(rows) == docs.count()
    for r in rows:
        assert 0.0 <= r.alpha_word_frac <= 1.0
        assert r.gopher_keep in (0, 1)
        assert r.gopher_keep == (
            r.wc_ok * r.wordlen_ok * r.alpha_ok * r.symbol_ok
            * r.bullet_ok * r.ellipsis_ok * r.stopword_ok)
