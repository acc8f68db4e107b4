"""C4 line-level cleaning: each published rule exercised on a crafted
page, plus a DuckDB twin of the whole transform for cross-engine
semantics."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from agnostic_blockchain_etl_spark.operators.clean import c4_clean  # noqa: E402

GOOD = ("This is a proper sentence with enough words.\n"
        "Another good line follows right here!\n"
        'Is this a question line with words?\n'
        "Short line.\n"                      # < 3 words -> dropped
        "no terminal punctuation here\n"     # no punct  -> dropped
        "Please enable javascript to view.\n"  # javascript -> dropped
        "The last proper line stands here.")


@pytest.fixture(scope="module")
def spark():
    from agnostic_blockchain_etl_spark.session import get_session
    yield get_session(master="local[8]",
                      conf={"spark.sql.shuffle.partitions": "8"})


def test_line_rules_and_page_rules(spark):
    docs = [
        (1, GOOD),
        (2, "One good sentence is here.\nAnother fine sentence lands."),
        (3, GOOD + "\nsome lorem ipsum filler text."),
        (4, GOOD.replace("question line", "question {brace} line")),
        (5, ""),
    ]
    out = {r.doc_id: r for r in c4_clean(
        spark.createDataFrame(docs, "doc_id long, text string")).collect()}

    r1 = out[1]
    assert r1.n_lines == 7 and r1.n_kept_lines == 4 and r1.c4_keep == 1
    kept = r1.text.split("\n")
    assert "Short line." not in kept
    assert all("javascript" not in l for l in kept)
    assert kept[0].startswith("This is a proper")
    # doc 2: both lines fine but fewer than min_lines=3 kept -> page dies
    assert out[2].n_kept_lines == 2 and out[2].c4_keep == 0
    assert out[3].c4_keep == 0, "lorem ipsum kills the page"
    assert out[4].c4_keep == 0, "curly brace kills the page"
    assert out[5].n_kept_lines == 0 and out[5].c4_keep == 0


def test_duckdb_parity(spark):
    docs = [(1, GOOD),
            (2, "Tiny.\nBigger proper sentence here.\nAnd one more now.\n"
                "Plus a final sentence too."),
            (3, "all lowercase no punct\nsecond line also bare")]
    got = {r.doc_id: (r.text, r.n_lines, r.n_kept_lines, r.c4_keep)
           for r in c4_clean(
               spark.createDataFrame(docs, "doc_id long, text string"))
           .collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", docs)
    rows = con.execute(r"""
        WITH base AS (
            SELECT doc_id, text, string_split(text, chr(10)) AS lines
            FROM d),
        k AS (
            SELECT doc_id, text, lines,
                   list_filter(lines, l ->
                       regexp_matches(l, '[.!?"]\s*$')
                       AND len(string_split_regex(trim(l), '\s+')) >= 3
                       AND NOT contains(lower(l), 'javascript')) AS kept
            FROM base)
        SELECT doc_id, coalesce(array_to_string(kept, chr(10)), ''),
               len(lines), len(kept),
               CASE WHEN NOT contains(lower(text), 'lorem ipsum')
                         AND NOT contains(text, '{')
                         AND len(kept) >= 3 THEN 1 ELSE 0 END
        FROM k
    """).fetchall()
    want = {r[0]: (r[1], r[2], r[3], r[4]) for r in rows}
    assert got == want


def test_null_text_docs_flagged_not_poisoned(spark):
    """Round-8 review: size(NULL) = -1 and contains(NULL) = NULL made
    a metadata-only document report n_lines = -1 with a NULL c4_keep
    that vanished from datacard sums. Null text must be an explicit
    0-line kill with the row intact (flag-don't-drop)."""
    from agnostic_blockchain_etl_spark.operators.clean import c4_clean
    docs = spark.createDataFrame(
        [(1, "This line is long enough to keep and ends properly."),
         (2, None)], "doc_id long, text string")
    got = {r.doc_id: r for r in c4_clean(docs, min_lines=1).collect()}
    assert got[1].c4_keep == 1
    assert got[2].n_lines == 0 and got[2].n_kept_lines == 0
    assert got[2].c4_keep == 0          # not NULL
    assert got[2].text is None
