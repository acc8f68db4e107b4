"""BPE tokenizer: the merge loop is checked against a hand-derived
Sennrich-style trace, and the distributed pieces against the pure-Python
core (the distributed histogram + driver merge loop must equal training
run entirely in Python on the same corpus)."""

from __future__ import annotations

import os
import sys
from collections import Counter

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from agnostic_blockchain_etl_spark.operators.bpe import (  # noqa: E402
    EOW, bpe_encode, encode_word, train_bpe, train_bpe_merges)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from agnostic_blockchain_etl_spark.session import get_session
    yield get_session(master="local[8]",
                      conf={"spark.sql.shuffle.partitions": "8"})


class TestMergeLoop:
    def test_textbook_trace(self):
        # corpus: low ×5, lower ×2 — the classic worked example.
        # Pair counts round 1: (l,o)=7, (o,w)=7, (w,</w>)=5, (w,e)=2,
        # (e,r)=2, (r,</w>)=2 → tie (l,o)/(o,w) breaks lexicographically
        # to (l,o); round 2 merges (lo,w); round 3 (low,</w>)=5 wins.
        merges = train_bpe_merges([("low", 5), ("lower", 2)], 3)
        assert merges == [("l", "o"), ("lo", "w"), ("low", EOW)]

    def test_merges_are_deterministic(self):
        words = [("banana", 3), ("bandana", 2), ("cabana", 4)]
        assert train_bpe_merges(words, 10) == train_bpe_merges(words, 10)

    def test_encode_reconstructs_word(self):
        merges = train_bpe_merges([("hello", 4), ("help", 3)], 6)
        ranks = {tuple(p): i for i, p in enumerate(merges)}
        toks = encode_word("hello", ranks)
        assert "".join(toks) == "hello" + EOW  # lossless segmentation
        # a trained frequent word compresses below character count
        assert len(toks) < len("hello") + 1

    def test_unseen_characters_pass_through(self):
        merges = train_bpe_merges([("abc", 5)], 4)
        ranks = {tuple(p): i for i, p in enumerate(merges)}
        assert "".join(encode_word("xyz", ranks)) == "xyz" + EOW


class TestDistributedParity:
    def test_spark_training_equals_pure_python(self, spark):
        from agnostic_blockchain_etl_spark.operators.tables import \
            load_tables
        docs = load_tables(spark, SF_DIR, ("documents",))["documents"]
        got = train_bpe(docs, n_merges=30, vocab_words=100_000)

        counts = Counter()
        for r in docs.select("text").collect():
            for w in (r["text"] or "").lower().split():
                counts[w] += 1
        expected = train_bpe_merges(counts.items(), 30)
        assert got == expected

    @pytest.mark.heavy
    def test_encode_stage_matches_kernel(self, spark):
        from agnostic_blockchain_etl_spark.operators.tables import \
            load_tables
        docs = load_tables(spark, SF_DIR, ("documents",))["documents"] \
            .limit(50)
        merges = train_bpe(docs, n_merges=40)
        out = {r["doc_id"]: r for r in
               bpe_encode(docs, merges).collect()}
        ranks = {tuple(p): i for i, p in enumerate(merges)}
        for r in docs.collect():
            toks = []
            for w in (r["text"] or "").lower().split():
                toks.extend(encode_word(w, ranks))
            assert list(out[r["doc_id"]]["tokens"]) == toks
            assert out[r["doc_id"]]["n_bpe_tokens"] == len(toks)

    def test_encode_plan_is_map_only(self, spark):
        import contextlib
        import io
        from agnostic_blockchain_etl_spark.operators.tables import \
            load_tables
        docs = load_tables(spark, SF_DIR, ("documents",))["documents"]
        df = bpe_encode(docs, [("t", "h"), ("th", "e")])
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        # one healing round-robin Exchange at most; never a hash shuffle
        assert "hashpartitioning" not in plan
        assert "ArrowEvalPython" in plan  # pandas UDF, not row-at-a-time
