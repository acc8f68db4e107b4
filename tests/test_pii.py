"""PII scrubbing: semantics on crafted documents plus cross-engine
(Spark vs DuckDB) equality of counts AND the fully redacted text — the
gate only sees the synthetic corpus, which is PII-free, so the real
patterns are exercised here."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from agnostic_blockchain_etl_spark.operators.pii import (  # noqa: E402
    count_sql, pii_scrub, redact_sql)

DOCS = [
    (1, "reach me at alice.smith+spam@example.co.uk or bob@test.io thanks"),
    (2, "server 10.0.0.1 and 192.168.255.254 are up, 999.999.999.999 too"),
    (3, "call +1 (415) 555-0134 or 0800 111 222 33"),
    (4, "mixed: eve@corp.example from 172.16.0.9 dialed +44 20 7946 0958"),
    (5, "clean document with no personal information at all"),
    (6, ""),
]


@pytest.fixture(scope="module")
def spark():
    from agnostic_blockchain_etl_spark.session import get_session
    yield get_session(master="local[8]",
                      conf={"spark.sql.shuffle.partitions": "8"})


def test_pii_scrub_semantics(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = {r["doc_id"]: r for r in pii_scrub(docs).collect()}

    assert out[1]["n_email"] == 2 and out[1]["pii_clean"] == 0
    assert "<EMAIL>" in out[1]["redacted"]
    assert "alice" not in out[1]["redacted"]

    # the out-of-range quad still matches the regex (documented: \d{1,3}
    # does not range-check); what matters is that real addresses go
    assert out[2]["n_ipv4"] == 3
    assert "10.0.0.1" not in out[2]["redacted"]

    assert out[3]["n_phone"] >= 2
    assert "555-0134" not in out[3]["redacted"]

    assert out[4]["n_email"] == 1 and out[4]["n_ipv4"] == 1 \
        and out[4]["n_phone"] >= 1
    for tok in ("<EMAIL>", "<IP>", "<PHONE>"):
        assert tok in out[4]["redacted"]

    assert out[5]["pii_clean"] == 1 and out[5]["redacted"] == DOCS[4][1]
    assert out[6]["n_pii"] == 0 and out[6]["redacted"] == ""


def test_pii_cross_engine_parity(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    srows = {r["doc_id"]: r for r in pii_scrub(docs).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", DOCS)
    orows = con.execute(f"""
        SELECT doc_id,
               {count_sql('text', 'email')} AS n_email,
               {count_sql('text', 'ipv4')}  AS n_ipv4,
               {count_sql('text', 'phone')} AS n_phone,
               {redact_sql('text')}         AS redacted
        FROM d""").fetchall()
    for doc_id, n_email, n_ipv4, n_phone, redacted in orows:
        s = srows[doc_id]
        assert (s["n_email"], s["n_ipv4"], s["n_phone"]) == \
            (n_email, n_ipv4, n_phone), doc_id
        assert s["redacted"] == redacted, doc_id


def test_quality_score_orders_prose_above_junk(spark):
    from agnostic_blockchain_etl_spark.operators.textstats import text_stats
    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat and looked out of the window at the "
             "garden while the rain fell on the roof of the old house", "en"),
         (2, "$$$!!! ### ??? ***&&& ^^^%%% @@@(((! )))", "en")],
        "doc_id long, text string, lang string")
    rows = {r["doc_id"]: r for r in text_stats(docs).collect()}
    assert rows[1]["quality_score"] > rows[2]["quality_score"]
    assert 0.0 <= rows[2]["quality_score"] <= 1.0


# ---------------------------------------------------------------------------
# Differential fuzz: Java regex (Spark) vs RE2 (DuckDB) on PII-shaped text
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

# alphabet dense in PII metacharacters: digits, dots, @, +, -, (), spaces
_PII_ALPHABET = "ab01. @+-()x7"
_pii_text = st.text(alphabet=_PII_ALPHABET, min_size=0, max_size=60)


@given(texts=st.lists(_pii_text, min_size=1, max_size=8))
@settings(max_examples=15, deadline=None)
def test_pii_regex_semantics_match_duckdb(spark, texts):
    docs = [(i + 1, t) for i, t in enumerate(texts)]
    srows = {r["doc_id"]: r for r in
             pii_scrub(spark.createDataFrame(
                 docs, "doc_id long, text string")).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", docs)
    for doc_id, n_email, n_ipv4, n_phone, redacted in con.execute(f"""
            SELECT doc_id,
                   {count_sql('text', 'email')},
                   {count_sql('text', 'ipv4')},
                   {count_sql('text', 'phone')},
                   {redact_sql('text')}
            FROM d""").fetchall():
        s = srows[doc_id]
        assert (s["n_email"], s["n_ipv4"], s["n_phone"]) == \
            (n_email, n_ipv4, n_phone), (doc_id, docs[doc_id - 1][1])
        assert s["redacted"] == redacted, (doc_id, docs[doc_id - 1][1])


class TestCreditCards:
    VALID = ["4532015112830366",          # visa, luhn-valid
             "5425233430109903",          # mastercard, luhn-valid
             "4532 0151 1283 0366",       # grouped form
             "4532-0151-1283-0366"]
    INVALID = ["4532015112830367",        # one digit off
               "1234567812345678",
               "1234 5678 1234 5678"]

    def test_luhn_known_vectors(self, spark):
        from agnostic_blockchain_etl_spark.operators.pii import luhn_valid
        from pyspark.sql import functions as F
        nums = [(s.replace(" ", "").replace("-", ""),)
                for s in self.VALID + self.INVALID]
        df = spark.createDataFrame(nums, "s string")
        got = {r.s: r.ok for r in
               df.select("s", luhn_valid(F.col("s")).alias("ok")).collect()}
        for s in self.VALID:
            assert got[s.replace(" ", "").replace("-", "")] is True, s
        for s in self.INVALID:
            assert got[s.replace(" ", "").replace("-", "")] is False, s

    def test_extended_scrub_redacts_valid_cards_only(self, spark):
        from agnostic_blockchain_etl_spark.operators.pii import (
            pii_scrub_extended)
        docs = [(1, f"pay with {self.VALID[0]} please"),
                (2, f"card {self.VALID[2]} on file"),
                (3, f"order id {self.INVALID[0]} shipped"),
                (4, "no digits here at all")]
        out = {r.doc_id: r for r in pii_scrub_extended(
            spark.createDataFrame(docs, "doc_id long, text string"))
            .collect()}
        assert out[1].n_ccn == 1 and "<CCN>" in out[1].redacted
        assert self.VALID[0] not in out[1].redacted
        assert out[2].n_ccn == 1 and "<CCN>" in out[2].redacted
        # luhn-invalid run: counted 0, NOT ccn-redacted (the loose phone
        # pattern may still catch it downstream — that is the base scrub)
        assert out[3].n_ccn == 0 and "<CCN>" not in out[3].redacted
        assert out[4].n_ccn == 0 and out[4].pii_clean == 1
        assert out[1].pii_clean == 0

    def test_ccn_count_duckdb_parity(self, spark):
        """Random digit runs (some forced luhn-valid by check digit):
        Spark count == DuckDB twin count on every doc."""
        import random
        from pyspark.sql import functions as F
        from agnostic_blockchain_etl_spark.operators.pii import (
            ccn_count, ccn_count_sql)

        def make_valid(rng, n):
            ds = [rng.randint(0, 9) for _ in range(n - 1)]
            total = 0
            for i, d in enumerate(reversed(ds)):
                dd = d * 2 if i % 2 == 0 else d   # check digit at end
                total += dd - 9 if dd > 9 else dd
            return "".join(map(str, ds)) + str((10 - total % 10) % 10)

        rng = random.Random(11)
        docs = []
        for i in range(30):
            parts = [f"w{j}" for j in range(rng.randint(2, 6))]
            if rng.random() < 0.5:
                parts.append(make_valid(rng, rng.choice([13, 16, 19])))
            if rng.random() < 0.5:
                parts.append("".join(str(rng.randint(0, 9))
                                     for _ in range(16)))
            docs.append((i, " ".join(parts)))
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {r.doc_id: r.n for r in
               df.select("doc_id", ccn_count(F.col("text")).alias("n"))
               .collect()}
        con = duckdb.connect()
        con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO d VALUES (?, ?)", docs)
        want = dict(con.execute(
            f"SELECT doc_id, {ccn_count_sql('text')} FROM d").fetchall())
        assert got == {k: (v or 0) for k, v in want.items()}


def test_extended_scrub_attributes_each_run_to_one_family(spark):
    """A card run that the loose phone pattern also matches must be
    counted ONCE (as ccn, since it wins the redaction): base counts are
    computed over the card-redacted text, so n_pii never double-counts
    and n_phone agrees with the redacted output."""
    from pyspark.sql import functions as F  # noqa: F401
    from agnostic_blockchain_etl_spark.operators.pii import (
        pii_scrub_extended)
    card = "4532 0151 1283 0366"            # luhn-valid, phone-shaped
    docs = [(1, f"pay {card} today"),
            (2, f"pay {card} or call +1 (415) 555-0134")]
    out = {r.doc_id: r for r in pii_scrub_extended(
        spark.createDataFrame(docs, "doc_id long, text string")).collect()}
    # doc 1: the only digit run is the card — phone must NOT also claim it
    assert out[1].n_ccn == 1 and out[1].n_phone == 0
    assert out[1].n_pii == 1
    assert "<CCN>" in out[1].redacted and "<PHONE>" not in out[1].redacted
    # doc 2: one card + one real phone, each counted exactly once
    assert out[2].n_ccn == 1 and out[2].n_phone == 1
    assert out[2].n_pii == 2
    assert "<CCN>" in out[2].redacted and "<PHONE>" in out[2].redacted
