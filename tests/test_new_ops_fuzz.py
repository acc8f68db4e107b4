"""Property fuzz for the round-3 additions: shard balancing holds its
LPT bound on arbitrary weight distributions, the LM train+score pipeline
stays DuckDB-parity on random corpora (not just the crafted one), and
the MinHash estimate tracks true Jaccard on random document pairs.

Example counts are small (each case runs Spark jobs); the generators
aim at the structural edge cases — empty-ish buckets, all-equal weights,
whale weights, single-word docs — rather than volume.
"""

from __future__ import annotations

import os
import random
import sys

import duckdb
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


pytestmark = pytest.mark.heavy  # builder-side e2e/fuzz; driver gate covers families via the fast tests

@pytest.fixture(scope="module")
def spark():
    from agnostic_blockchain_etl_spark.session import get_session
    yield get_session(master="local[8]",
                      conf={"spark.sql.shuffle.partitions": "8"})


class TestShardFuzz:
    @given(seed=st.integers(0, 10**6), n_shards=st.integers(2, 6),
           whale=st.booleans())
    @settings(max_examples=6, deadline=None)
    def test_lpt_bound_and_coverage(self, spark, seed, n_shards, whale):
        from agnostic_blockchain_etl_spark.operators.shards import (
            balanced_shard_assign)
        rng = random.Random(seed)
        rows = [(i, rng.choice([1, 5, 50, 500])) for i in range(300)]
        if whale:
            rows.append((300, 50_000))
        df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
        out = balanced_shard_assign(df, "n_tokens", n_shards,
                                    n_buckets=64).collect()
        assert len(out) == len(rows)
        assert {r.shard for r in out} <= set(range(n_shards))
        loads = {}
        for r in out:
            loads[r.shard] = loads.get(r.shard, 0) + r.n_tokens
        # LPT bound: max load <= mean + heaviest bucket. Recompute the
        # bucket weights exactly as the operator does.
        bw = {r.b: r.w for r in df.withColumn(
            "b", F.pmod(F.xxhash64("doc_id"), F.lit(64)))
            .groupBy("b").agg(F.sum("n_tokens").alias("w")).collect()}
        mean = sum(loads.values()) / n_shards
        assert max(loads.values()) <= mean + max(bw.values()) + 1e-9

    @given(seed=st.integers(0, 10**6), n_shards=st.integers(2, 6),
           whale=st.booleans())
    @settings(max_examples=6, deadline=None)
    def test_range_bound_coverage_and_python_twin(self, spark, seed,
                                                  n_shards, whale):
        """strategy='range' (round-8 oracle-gated form): same fuzz
        corpus as LPT, the cumulative-packing bound (max load ≤ bin
        width + heaviest bucket), plus an exact pure-python twin of the
        assignment arithmetic — the same closed form the DuckDB gate
        oracle runs, pinned here under random weights."""
        from agnostic_blockchain_etl_spark.operators.shards import (
            balanced_shard_assign)
        rng = random.Random(seed)
        rows = [(i, rng.choice([1, 5, 50, 500])) for i in range(300)]
        if whale:
            rows.append((300, 50_000))
        df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
        out = balanced_shard_assign(df, "n_tokens", n_shards,
                                    n_buckets=64,
                                    strategy="range").collect()
        assert len(out) == len(rows)
        loads = {}
        for r in out:
            loads[r.shard] = loads.get(r.shard, 0) + r.n_tokens
        bw = {r.b: r.w for r in df.withColumn(
            "b", F.pmod(F.xxhash64("doc_id"), F.lit(64)))
            .groupBy("b").agg(F.sum("n_tokens").alias("w")).collect()}
        total = sum(bw.values())
        assert max(loads.values()) \
            <= total / n_shards + max(bw.values()) + 1e-9
        # python twin of the closed-form assignment
        cum, twin = 0, {}
        for b in sorted(bw):
            twin[b] = min(n_shards - 1, cum * n_shards // total)
            cum += bw[b]
        bucket_of = {r.doc_id: r.b for r in df.withColumn(
            "b", F.pmod(F.xxhash64("doc_id"), F.lit(64)))
            .select("doc_id", "b").collect()}
        for r in out:
            assert r.shard == twin[bucket_of[r.doc_id]], r.doc_id


class TestLmFuzz:
    @given(seed=st.integers(0, 10**6))
    @settings(max_examples=5, deadline=None)
    def test_duckdb_parity_on_random_corpora(self, spark, seed):
        from agnostic_blockchain_etl_spark.operators.lm import (
            perplexity_score, train_unigram_lm)
        rng = random.Random(seed)
        vocab = [f"w{i}" for i in range(30)]
        docs = [(i, " ".join(rng.choices(vocab, k=rng.randint(1, 40))))
                for i in range(12)]
        V = 15
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {r.doc_id: (r.n_tokens, r.avg_nll, r.bucket)
               for r in perplexity_score(
                   df, train_unigram_lm(df, vocab_size=V)).collect()}
        con = duckdb.connect()
        con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO d VALUES (?, ?)", docs)
        rows = con.execute(f"""
            WITH words_t AS (
                SELECT doc_id,
                       unnest(string_split_regex(lower(trim(text)),
                                                 '\\s+')) AS word
                FROM d),
            counts AS (SELECT word, count(*) AS c FROM words_t
                       GROUP BY word),
            top AS (SELECT word, c FROM counts
                    ORDER BY c DESC, word LIMIT {V}),
            stats AS (SELECT (SELECT sum(c) FROM counts) AS t,
                             (SELECT least({V}, count(*)) FROM counts)
                                 AS v),
            vocab AS (SELECT word, -ln((c + 1.0) / (t + v + 1)) AS nll
                      FROM top CROSS JOIN stats),
            oov AS (SELECT -ln(1.0 / (t + v + 1)) AS oov_nll FROM stats),
            perdoc AS (
                SELECT w.doc_id, count(w.word) AS n_tokens,
                       round(avg(coalesce(vb.nll, o.oov_nll)), 6)
                           AS avg_nll
                FROM words_t w
                LEFT JOIN vocab vb USING (word) CROSS JOIN oov o
                GROUP BY w.doc_id),
            bounds AS (SELECT round(quantile_cont(avg_nll, 1.0/3.0), 6)
                                  AS b1,
                              round(quantile_cont(avg_nll, 2.0/3.0), 6)
                                  AS b2
                       FROM perdoc)
            SELECT doc_id, n_tokens, avg_nll,
                   CASE WHEN avg_nll <= b1 THEN 'head'
                        WHEN avg_nll <= b2 THEN 'middle'
                        ELSE 'tail' END
            FROM perdoc CROSS JOIN bounds
        """).fetchall()
        want = {r[0]: (r[1], r[2], r[3]) for r in rows}
        assert set(got) == set(want)
        for d in want:
            assert got[d][0] == want[d][0], (seed, d)
            assert abs(got[d][1] - want[d][1]) <= 1e-6, (seed, d)
            assert got[d][2] == want[d][2], (seed, d)


class TestMinhashEstimatorFuzz:
    @given(seed=st.integers(0, 10**6), overlap=st.integers(0, 40))
    @settings(max_examples=6, deadline=None)
    def test_estimate_tracks_true_jaccard(self, spark, seed, overlap):
        """Two docs sharing `overlap` of 40 trailing words: the K=16
        estimate must sit within 4 standard errors of true shingle
        Jaccard (catches systematic estimator bugs, tolerates noise)."""
        from agnostic_blockchain_etl_spark.operators.dedup import (
            doc_shingles)
        from agnostic_blockchain_etl_spark.operators.incremental import (
            _est_jaccard, signature_store)
        rng = random.Random(seed)
        shared = [f"s{rng.randrange(10**9)}" for _ in range(overlap)]
        a_txt = " ".join([f"a{i}" for i in range(40 - overlap)] + shared)
        b_txt = " ".join([f"b{i}" for i in range(40 - overlap)] + shared)
        df = spark.createDataFrame([(1, a_txt), (2, b_txt)],
                                   "doc_id long, text string")
        sh = doc_shingles(df).select("doc_id", "h").collect()
        sa = {r.h for r in sh if r.doc_id == 1}
        sb = {r.h for r in sh if r.doc_id == 2}
        true_j = len(sa & sb) / len(sa | sb)
        sigs = signature_store(df)
        pair = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
        est = _est_jaccard(sigs, sigs, pair).collect()[0].est_jaccard
        se = (true_j * (1 - true_j) / 16) ** 0.5
        assert abs(est - true_j) <= 4 * se + 1e-9, (seed, overlap)


class TestSpanRemovalFuzz:
    @given(seed=st.integers(0, 10**6))
    @settings(max_examples=5, deadline=None)
    def test_matches_independent_reference(self, spark, seed):
        """Random corpora with planted shared runs: the cleaned output
        must equal an independent python implementation of the same
        contract (k-gram first-occurrence marking, gap<=k merge,
        span excision)."""
        from agnostic_blockchain_etl_spark.operators.spans import (
            remove_duplicate_spans)
        rng = random.Random(seed)
        k = 4
        shared = [f"s{seed}_{i}" for i in range(rng.randint(4, 9))]
        docs = []
        for d in range(6):
            words = [f"d{d}w{i}" for i in range(rng.randint(0, 12))]
            if rng.random() < 0.7:
                at = rng.randint(0, len(words))
                words = words[:at] + shared + words[at:]
            docs.append((d, " ".join(words) if words else "x"))

        # independent reference
        toks = {d: t.lower().split() for d, t in docs}
        first = {}
        marked = {d: set() for d in toks}
        for d in sorted(toks):
            ws = toks[d]
            for p in range(len(ws) - k + 1):
                g = tuple(ws[p:p + k])
                if g in first:
                    marked[d].add(p + 1)
                else:
                    first[g] = (d, p + 1)
        expect = {}
        for d, ws in toks.items():
            pos = sorted(marked[d])
            spans = []
            for p in pos:
                if spans and p - spans[-1][1] <= k:
                    spans[-1] = (spans[-1][0], p)
                else:
                    spans.append((p, p))
            spans = [(s, e + k - 1) for s, e in spans]
            kept = [w for i, w in enumerate(ws, 1)
                    if not any(s <= i <= e for s, e in spans)]
            expect[d] = " ".join(kept)

        got = {r.doc_id: r.text for r in remove_duplicate_spans(
            spark.createDataFrame(docs, "doc_id long, text string"),
            k).collect()}
        assert got == expect, seed


class TestEpochUpsampleFuzz:
    @given(seed=st.integers(0, 10**6),
           rates=st.dictionaries(
               st.sampled_from(["en", "zh", "de", "fr"]),
               st.floats(0.0, 5.0, allow_nan=False), max_size=4))
    @settings(max_examples=6, deadline=None)
    def test_matches_python_reference(self, spark, seed, rates):
        """epoch_upsample on arbitrary rate vectors: per-doc copy counts
        equal the pure-python replay of the same hash rule (floor(r) +
        [u <= frac]), epoch indices are dense 1..c, and total output
        size is exactly sum(copies)."""
        import hashlib
        import math

        from agnostic_blockchain_etl_spark.operators.mixture import (
            epoch_upsample)
        rng = random.Random(seed)
        rows = [(i, rng.choice(["en", "zh", "de", "fr", "es"]))
                for i in range(150)]
        docs = spark.createDataFrame(rows, "doc_id long, lang string")
        got = {}
        for r in epoch_upsample(docs, rates).collect():
            got.setdefault(r.doc_id, []).append(r.epoch)
        expect = {}
        for doc_id, lang in rows:
            rate = float(rates.get(lang, 0.0))
            u = (int(hashlib.md5(f"epoch:{doc_id}".encode())
                     .hexdigest()[:15], 16) + 1) / 2.0**60
            c = int(math.floor(rate)) + (1 if u <= rate - math.floor(rate)
                                         else 0)
            if c:
                expect[doc_id] = list(range(1, c + 1))
        assert {d: sorted(e) for d, e in got.items()} == expect


class TestQualityWeightedSampleFuzz:
    @given(seed=st.integers(0, 10**6),
           gamma=st.sampled_from([0.5, 1.0, 2.0]))
    @settings(max_examples=6, deadline=None)
    def test_matches_python_reference(self, spark, seed, gamma):
        """quality_weighted_sample on arbitrary scores (incl. NULLs and
        out-of-range): keep == [u <= clamp(score)^gamma] replayed in
        pure python, rows conserved."""
        import hashlib

        from agnostic_blockchain_etl_spark.operators.quality import (
            quality_weighted_sample)
        rng = random.Random(seed)
        rows = [(i, rng.choice([None, rng.uniform(-0.5, 1.5),
                                0.0, 1.0, rng.random()]))
                for i in range(200)]
        docs = spark.createDataFrame(rows, "doc_id long, q_score double")
        got = {r.doc_id: r.sample_keep for r in
               quality_weighted_sample(docs, gamma=gamma).collect()}
        assert len(got) == len(rows)
        for doc_id, score in rows:
            s = 0.0 if score is None else min(max(score, 0.0), 1.0)
            p = s if gamma == 1.0 else (s * s if gamma == 2.0
                                        else s ** 0.5)
            u = (int(hashlib.md5(f"qsample:{doc_id}".encode())
                     .hexdigest()[:15], 16) + 1) / 2.0**60
            assert got[doc_id] == int(u <= p), (doc_id, score, gamma)
