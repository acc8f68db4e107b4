"""hashed_tfidf_vectors: independent-implementation parity + the
text → SemDeDup composition (the no-external-model similarity loop)."""

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from agnostic_blockchain_etl_spark.operators.similarity import (
    hashed_tfidf_vectors, text_semantic_dedup)

DIM = 64


@pytest.fixture(scope="module")
def spark():
    from agnostic_blockchain_etl_spark.session import get_session
    yield get_session(master="local[8]",
                      conf={"spark.sql.shuffle.partitions": "8"})


def _ref_embed(corpus: dict[int, str], dim: int = DIM) -> dict:
    """Independent pure-python reference (no shared code with the
    operator beyond the md5-hash CONTRACT it documents)."""
    n = len(corpus)
    tf = {d: {} for d in corpus}
    for d, text in corpus.items():
        for w in text.lower().strip().split():
            tf[d][w] = tf[d].get(w, 0) + 1
    df = {}
    for d in corpus:
        for w in tf[d]:
            df[w] = df.get(w, 0) + 1
    out = {}
    for d in corpus:
        v = np.zeros(dim)
        for w, c in tf[d].items():
            h = int(hashlib.md5(w.encode()).hexdigest()[:15], 16)
            b = h % dim
            sign = 1.0 if (h >> 59) % 2 == 0 else -1.0
            v[b] += sign * c * (math.log((n + 1) / (df[w] + 1)) + 1)
        nm = np.linalg.norm(v)
        out[d] = v / nm if nm > 0 else v
    return out


def test_matches_independent_reference(spark):
    corpus = {
        1: "the quick brown fox jumps over the lazy dog",
        2: "pack my box with five dozen liquor jugs",
        3: "the quick brown fox naps beside the lazy dog",
        4: "sphinx of black quartz judge my vow",
        5: "",
    }
    df = spark.createDataFrame(list(corpus.items()),
                               "doc_id long, text string")
    got = {r.vec_id: np.array(r.embedding) for r in
           hashed_tfidf_vectors(df, dim=DIM).collect()}
    want = _ref_embed(corpus)
    assert set(got) == {1, 2, 3, 4}          # doc 5 has no tokens
    for d in got:
        assert np.allclose(got[d], want[d], atol=1e-9), d
    # unit norm
    for d in got:
        assert abs(np.linalg.norm(got[d]) - 1.0) < 1e-9


def test_paraphrase_pairs_cluster(spark):
    """Shared-vocabulary paraphrases (shuffled word order — invisible
    to shingle MinHash at high thresholds) land in one semantic group;
    unrelated docs stay singletons."""
    docs = [
        (1, "solar panels convert sunlight into electricity for homes"),
        (2, "electricity for homes convert sunlight into solar panels"),
        (3, "the stock market closed higher on strong earnings reports"),
        (4, "gardening requires patience water sunlight and good soil"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    ann = text_semantic_dedup(df, dim=DIM, tau=0.95, nlist=1)
    rows = {r.vec_id: r for r in ann.collect()}
    assert rows[1].group_id == rows[2].group_id
    assert rows[3].group_id != rows[1].group_id
    assert rows[4].group_id != rows[1].group_id
    kept = sorted(v.vec_id for v in rows.values() if v.keep == 1)
    assert len(kept) == 3 and 3 in kept and 4 in kept


def test_plan_stays_jvm_side(spark):
    """No Python UDFs in the embedding plan (the bridge must not pay
    the Arrow boundary; SemDeDup's kernels are the sanctioned one)."""
    import contextlib
    import io
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        hashed_tfidf_vectors(df, dim=DIM).explain("formatted")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan.replace(
        "BroadcastNestedLoopJoin", "")  # the 1-row N broadcast is fine


def test_vocab_tail_knobs(spark):
    """min_df drops hapax terms; max_df_frac drops stopword-ish terms;
    the inner-join semantics mean dropped terms simply vanish from the
    vectors (docs left with no surviving terms emit no row)."""
    docs = [
        (1, "common common rare1"),
        (2, "common mid rare2"),
        (3, "common mid rare3"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    base = {r.vec_id for r in
            hashed_tfidf_vectors(df, dim=DIM).collect()}
    assert base == {1, 2, 3}
    # min_df=2 keeps only 'common' (df 3) and 'mid' (df 2)
    got = {r.vec_id: np.array(r.embedding) for r in
           hashed_tfidf_vectors(df, dim=DIM, min_df=2).collect()}
    assert set(got) == {1, 2, 3}
    # docs 2 and 3 become identical under min_df=2 (same surviving bag)
    assert np.allclose(got[2], got[3])
    # max_df_frac below 1.0 kills 'common'; doc 1 then has only rare1
    got2 = {r.vec_id: np.array(r.embedding) for r in
            hashed_tfidf_vectors(df, dim=DIM,
                                 max_df_frac=0.99).collect()}
    assert set(got2) == {1, 2, 3}
    nz = np.nonzero(got2[1])[0]
    assert len(nz) == 1          # exactly the 'rare1' bucket survives


def test_embedding_dag_materializes_once(spark):
    """The round-6 money bug: `text_semantic_dedup` drives ~5 driver
    actions (ivf_train's seed + recenter collects, the component
    checkpoint, the member join) over the embedding DAG; un-persisted,
    every action recomputed the full tokenize+shuffle upstream. The
    scoped cache in `semantic_dedup` (similarity.py) bounds that to ONE
    materialization — pinned here by an accumulator ticked per source
    row: one materialization of `hashed_tfidf_vectors` scans the docs
    frame twice (the tf branch and the 1-row N-count branch), so the
    cached path ticks 2n; the un-persisted path ticked ~10-12n (one 2n
    scan pair per action)."""
    sc = spark.sparkContext
    acc = sc.accumulator(0)

    @F.udf("string")
    def tick(t):
        acc.add(1)
        return t

    n = 40
    docs = spark.createDataFrame(
        [(i, f"alpha beta common word{i} gamma{i % 7}") for i in range(n)],
        "doc_id long, text string").withColumn("text", tick("text"))
    out = text_semantic_dedup(docs, dim=DIM, tau=0.95, nlist=2, iters=2)
    assert out.count() == n
    # cached: 2n (two branches of ONE materialization); broken: ~10n+
    assert acc.value <= 3 * n, (
        f"embedding DAG recomputed: {acc.value} source-row evaluations "
        f"for {n} rows — the semantic_dedup scoped cache is not holding")


def test_incremental_semantic_plan_has_no_cartesian(spark):
    """The day-2 kernel path must stay cogrouped equi-keyed — never a
    cross join of batch x store."""
    import contextlib
    import io
    from agnostic_blockchain_etl_spark.operators.similarity import (
        incremental_semantic_dedup)
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>")
    store = spark.createDataFrame(
        [(10, 0, [1.0, 0.0])], "vec_id long, list_id int, e array<double>")
    cb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "list_id int, centroid array<double>")
    ann, _ = incremental_semantic_dedup(emb, store, cb, tau=0.99)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        ann.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "FlatMapCoGroupsInPandas" in plan or "CoGroup" in plan
