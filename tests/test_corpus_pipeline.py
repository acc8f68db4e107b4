"""E2e: LLM-corpus preparation on the micro-batch pipeline machinery
(quality gate → dedup → chunking → sink), checked against the standalone
operator implementations over the same data."""

import os
import sys
import uuid

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from agnostic_blockchain_etl_spark.operators import corpus, textstats
from agnostic_blockchain_etl_spark.plans.config import PipelineConfig
from agnostic_blockchain_etl_spark.plans.executor import SparkExecutor
from agnostic_blockchain_etl_spark.plans.pipeline import run_pipeline
from agnostic_blockchain_etl_spark.plans.templates import TemplateSet

EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples")
SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def spark():
    from agnostic_blockchain_etl_spark.session import get_session
    s = get_session(master="local[8]",
                    conf={"spark.sql.shuffle.partitions": "8"})
    yield s


def test_corpus_prep_pipeline(spark, tmp_path):
    sink = f"chunks_{uuid.uuid4().hex[:8]}"
    conf = PipelineConfig.from_yaml(
        os.path.join(EXAMPLES, "corpus_prep", "pipeline.yaml"), env={})
    templates = TemplateSet.load(os.path.join(EXAMPLES, "corpus_prep"))
    result = run_pipeline(SparkExecutor(spark), templates, conf, {
        "SOURCE_PATH": f"{SF_DIR}/documents.parquet",
        "TARGET_PATH": str(tmp_path / "chunks"),
        "SINK_TABLE": sink})
    assert result.stats.batches > 0

    got = spark.table(sink)
    # cross-check against the standalone operators over the same corpus:
    # the sink holds exactly (quality-kept ∩ stratified-sampled) docs,
    # with the operator's split labels; chunk rows match chunk_documents
    # restricted to those docs
    quality = textstats.QUERIES["text_stats_facets"](spark, SF_DIR)
    kept_ids = {r["doc_id"] for r in
                quality.where(F.col("quality_keep") == 1).collect()}
    from agnostic_blockchain_etl_spark.operators.tables import load_tables
    sample = {r["doc_id"]: r["split"] for r in
              corpus.stratified_sample(
                  load_tables(spark, SF_DIR,
                              ("documents",))["documents"]).collect()}
    expect_ids = kept_ids & set(sample)
    sink_split = {r["doc_id"]: r["split"] for r in
                  got.select("doc_id", "split").distinct().collect()}
    # the synthetic corpus has no exact dups, so all kept docs chunk through
    assert set(sink_split) == expect_ids
    assert all(sink_split[d] == sample[d] for d in sink_split)

    chunks = corpus.QUERIES["chunk_pack_documents"](spark, SF_DIR)
    expected = chunks.where(F.col("doc_id").isin(list(expect_ids)))
    assert got.count() == expected.count()
    # spot-check chunk text equality for one doc
    some_id = min(expect_ids)
    a = {(r["chunk_id"], r["chunk_text"])
         for r in got.where(F.col("doc_id") == some_id).collect()}
    b = {(r["chunk_id"], r["chunk_text"])
         for r in expected.where(F.col("doc_id") == some_id).collect()}
    assert a == b


def test_postpass_lm_scoring_and_shard_write(spark, tmp_path):
    """The global post-pass a real corpus pipeline runs AFTER micro-batch
    ingest: train the unigram LM on the sink's train split, score every
    chunk, and write the train split as token-balanced shards — the new
    operators compose with the pipeline machinery's output unchanged."""
    from agnostic_blockchain_etl_spark.operators import (
        perplexity_score, train_unigram_lm, write_training_shards)

    sink = f"post_{uuid.uuid4().hex[:8]}"
    conf = PipelineConfig.from_yaml(
        os.path.join(EXAMPLES, "corpus_prep", "pipeline.yaml"), env={})
    templates = TemplateSet.load(os.path.join(EXAMPLES, "corpus_prep"))
    run_pipeline(SparkExecutor(spark), templates, conf, {
        "SOURCE_PATH": f"{SF_DIR}/documents.parquet",
        "TARGET_PATH": str(tmp_path / "post_chunks"),
        "SINK_TABLE": sink})
    chunks = spark.table(sink)
    train = chunks.where(F.col("split") == "train")

    model = train_unigram_lm(train, text_col="chunk_text", vocab_size=5000)
    scored = perplexity_score(
        chunks.select(
            (F.col("doc_id") * 1000 + F.col("chunk_id")).alias("doc_id"),
            F.col("chunk_text").alias("text")),
        model)
    assert scored.count() == chunks.count()
    buckets = {r.bucket for r in
               scored.select("bucket").distinct().collect()}
    assert buckets == {"head", "middle", "tail"}

    summary = write_training_shards(
        train, str(tmp_path / "train_shards"), "n_tokens", 4,
        key_col="doc_id", order_cols=("doc_id", "chunk_id")).collect()
    ws = [r.total_weight for r in summary]
    assert len(ws) == 4 and max(ws) / min(ws) < 1.3
    assert sum(r.n_rows for r in summary) == train.count()


def test_pipeline_redacts_pii(spark, tmp_path):
    """A crafted source with an email address must reach the sink with the
    placeholder, proving the scrub stage runs inside the pipeline."""
    filler = " ".join(f"word{i}" for i in range(40))
    src = str(tmp_path / "pii_src")
    spark.createDataFrame(
        [(1, f"{filler} contact bob@example.com thanks", "en", "web"),
         (2, f"{filler} clean document", "en", "web")],
        "doc_id long, text string, lang string, source string") \
        .write.parquet(src)

    sink = f"pii_{uuid.uuid4().hex[:8]}"
    conf = PipelineConfig.from_yaml(
        os.path.join(EXAMPLES, "corpus_prep", "pipeline.yaml"), env={})
    templates = TemplateSet.load(os.path.join(EXAMPLES, "corpus_prep"))
    run_pipeline(SparkExecutor(spark), templates, conf, {
        "SOURCE_PATH": src,
        "TARGET_PATH": str(tmp_path / "pii_chunks"),
        "SINK_TABLE": sink})

    text = " ".join(r["chunk_text"] for r in
                    spark.table(sink).where(F.col("doc_id") == 1)
                    .orderBy("chunk_id").collect())
    # chunk_text is lowercased by the chunking stage
    assert "<email>" in text and "bob@example.com" not in text


def test_pack_manifest_reconstructs_packs(spark):
    """pack_manifest: members are offset-ordered and CONTIGUOUS (each
    chunk starts where the previous ended, pack 0 of a shard starts at
    0), token counts conserve vs the chunk frame, spill_tokens is
    exactly the last member's overhang, and member counts stay bounded
    by the budget."""
    from agnostic_blockchain_etl_spark.operators.corpus import (
        _PACK_BUDGET, chunk, pack_manifest, pack_sequences)
    from agnostic_blockchain_etl_spark.operators.tables import (
        load_tables, spread)
    from pyspark.sql import functions as F
    docs = spread(load_tables(spark, SF_DIR, ("documents",))["documents"])
    packed = pack_sequences(chunk(docs))
    man = pack_manifest(packed).collect()
    assert sum(r.n_chunks for r in man) == packed.count()
    assert (sum(r.n_tokens for r in man)
            == packed.agg(F.sum("n_tokens")).first()[0])
    per_shard = {}
    for r in man:
        per_shard.setdefault(r.shard, []).append(r)
        parts = [tuple(map(int, m.split(":"))) for m in r.members]
        assert len(parts) == r.n_chunks
        assert len({(d, c) for d, c, _, _ in parts}) == r.n_chunks
        offs = [o for _, _, o, _ in parts]
        assert offs == sorted(offs)
        # contiguity inside the pack: each member starts where the
        # previous ended (straddle only at the END, captured by spill)
        for (_, _, o1, n1), (_, _, o2, _) in zip(parts, parts[1:]):
            assert o2 == o1 + n1, r
        last = parts[-1]
        assert r.spill_tokens == max(last[2] + last[3] - _PACK_BUDGET, 0)
        assert r.n_docs == len({d for d, _, _, _ in parts})
    # pack chain per shard: ids dense from 0, every non-final pack
    # filled to the budget (offset+len of last member >= budget)
    for shard, rows in per_shard.items():
        rows.sort(key=lambda r: r.pack_id)
        assert [r.pack_id for r in rows] == list(range(len(rows)))
        first = [tuple(map(int, m.split(":"))) for m in rows[0].members]
        assert first[0][2] == 0
        for r in rows[:-1]:
            lastm = tuple(map(int, r.members[-1].split(":")))
            assert lastm[2] + lastm[3] >= _PACK_BUDGET


def test_pack_manifest_budget_rides_the_frame(spark):
    """pack_manifest derives its budget from pack_sequences' own
    pack_budget column, so the spill arithmetic cannot silently desync
    from the budget the packing ran with; a conflicting explicit
    budget= is an error, a budget-free frame without the column is an
    error, and an old frame without the column still works with an
    explicit budget."""
    import pytest
    from agnostic_blockchain_etl_spark.operators.corpus import (
        chunk, pack_manifest, pack_sequences)
    docs = spark.createDataFrame(
        [(i, "w " * 100) for i in range(20)], "doc_id long, text string")
    packed = pack_sequences(chunk(docs), budget=256)
    man = pack_manifest(packed).collect()          # budget from frame
    for r in man:
        parts = [tuple(map(int, m.split(":"))) for m in r.members]
        last = parts[-1]
        assert r.spill_tokens == max(last[2] + last[3] - 256, 0), r
    assert pack_manifest(packed, budget=256).count() == len(man)
    with pytest.raises(ValueError, match="conflicts"):
        pack_manifest(packed, budget=128)
    legacy = packed.drop("pack_budget")
    with pytest.raises(ValueError, match="pack_budget"):
        pack_manifest(legacy)
    leg = {(r.shard, r.pack_id): r.spill_tokens
           for r in pack_manifest(legacy, budget=256).collect()}
    assert leg == {(r.shard, r.pack_id): r.spill_tokens for r in man}
