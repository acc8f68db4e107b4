"""Scan-hygiene audits: filters must reach the parquet scan and the scan
must read only the projected columns. A query whose scan reads every
column for a narrow projection, or whose range predicate evaluates
post-scan, multiplies I/O by the table width / selectivity at 100 TB —
this pins the `PushedFilters` / pruned-`ReadSchema` behavior SCALE.md
relies on.
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from agnostic_blockchain_etl_spark.session import get_session
    yield get_session(master="local[8]",
                      conf={"spark.sql.shuffle.partitions": "8"})


def _scans(df):
    """[(table, n_read_columns, pushed_filters_str)] for each parquet scan."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    out = []
    for m in re.finditer(
            r"Scan parquet[^\n]*\n((?:[^\n]+\n)*?)\s*\n", buf.getvalue()):
        seg = m.group(0)
        loc = re.search(r"Location:.*/(\w+)\.parquet", seg)
        rs = re.search(r"ReadSchema: (.*)", seg)
        pf = re.search(r"PushedFilters: (.*)", seg)
        if loc and rs:
            out.append((loc.group(1), rs.group(1).count(":"),
                        pf.group(1) if pf else ""))
    return out


# (query, table, max columns the scan may read, required pushed-filter bit)
CASES = [
    # q1 projects 6 of lineitem's 16 columns; the shipdate cutoff must
    # ride the scan
    ("q1_pricing_summary", "lineitem", 6, "l_shipdate"),
    # per-doc text stats touch doc_id/text/lang only
    ("text_stats_facets", "documents", 3, None),
    # the merged sampling facets read doc_id/lang/source/text — nothing
    # else of the documents schema
    ("corpus_sampling_facets", "documents", 4, None),
    # the cursor range is the reference's hottest predicate shape: it
    # must reach the scan as a min/max-prunable range; the dropped
    # l_shipdate must never leave the scan (15 of 16 columns)
    ("projection_struct_facets", "lineitem", 15, "l_orderkey"),
    # chunk+pack reads doc_id/text only (chunking is pure slicing)
    ("chunk_pack_documents", "documents", 2, None),
    # the mixture APPLY pass reads doc_id/lang only — the plan side is
    # a collected literal, and text (needed only for the plan's token
    # counts, a separate bounded job) must be pruned from the apply scan
    ("mixture_apply", "documents", 2, None),
    # decontamination scans doc_id/text; the train/eval split predicate
    # must push to the scan
    ("decontamination_overlap", "documents", 2, "doc_id"),
    # epoch repetition reads doc_id/lang only — copies are per-row
    # array work, no text ever touched
    ("epoch_upsample", "documents", 2, None),
    # the eval-split predicate (vec_id % 25) rides the embedding scans;
    # both sides read vec_id/embedding only
    ("semantic_decontamination", "embeddings", 2, None),
    # the soft sampler's score is computed from text: 3 columns, no more
    ("quality_weighted_sample", "documents", 3, None),
    # r11 observability family: JSD halves read doc_id/text with the
    # parity split pushed; the per-source report reads source/text
    ("corpus_js_divergence", "documents", 2, "doc_id"),
    ("stratum_divergence_report", "documents", 2, None),
    # covariance reads ONLY the embedding column (vec_id pruned)
    ("emb_covariance_matrix", "embeddings", 1, None),
    # packing efficiency inherits chunk_pack's 2-column scan
    ("pack_efficiency_report", "documents", 2, None),
    # passage spans read doc_id/text like the pair op
    ("winnow_passage_spans", "documents", 2, None),
    # r11 event-analytics family: the funnel reads user/ts/type, the
    # retention scans carry the event_type predicate, transitions add
    # the event_id tie-break, trend + anomaly read ts/type only
    ("funnel_conversion_report", "events", 3, None),
    ("cohort_retention_matrix", "events", 3, "event_type"),
    ("event_transition_matrix", "events", 4, None),
    ("event_trend_report", "events", 2, None),
    ("event_rate_anomaly_report", "events", 2, None),
    # PMI reads doc_id/text; PageRank reads the two edge keys; the HLL
    # and KMV-set gates read their key (+ split / group / flag) column
    ("term_cooccurrence_pmi", "documents", 2, None),
    ("pagerank_supplier_part", "lineitem", 2, None),
    ("hll_distinct_estimate", "lineitem", 2, None),
    ("hll_group_distinct", "lineitem", 2, None),
    ("kmv_set_overlap", "lineitem", 2, "l_returnflag"),
    # KM survival reads user/ts/type; every scan carries a type filter
    ("km_survival_curve", "events", 3, "event_type"),
]


@pytest.mark.parametrize("name,table,max_cols,filter_bit", CASES)
def test_scan_reads_only_what_it_needs(spark, name, table, max_cols,
                                       filter_bit):
    import __spark_entry__ as entry
    df = entry.queries()[name](spark, SF_DIR)
    scans = [s for s in _scans(df) if s[0] == table]
    assert scans, f"{name}: no parquet scan of {table} found in plan"
    for _, n_cols, filters in scans:
        assert n_cols <= max_cols, \
            f"{name}: scan of {table} reads {n_cols} columns (max {max_cols})"
        if filter_bit is not None:
            assert filter_bit in filters, \
                f"{name}: predicate on {filter_bit} not pushed to {table} scan"
