"""Plan-shape audits: the scale-pattern operators must never degrade to
quadratic joins. A BroadcastNestedLoopJoin or CartesianProduct in any of
these plans means the banding/bucketing trick silently stopped working
(Spark falls back to nested-loop for non-equi join conditions), which is
exactly the failure mode that kills these operators at 100 TB.
"""

from __future__ import annotations

import contextlib
import io

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from agnostic_blockchain_etl_spark.session import get_session
    yield get_session(master="local[8]",
                      conf={"spark.sql.shuffle.partitions": "8"})

# Queries whose entire point is avoiding the quadratic plan. The inequality
# (doc_a < doc_b / tolerance) predicates must ride an equi-join, not drive
# the join strategy.
# (emb_ivf_topk is exempt: its corpus × codebook crossJoin is a broadcast
# nested loop BY DESIGN, bounded to nlist=16 rows on the broadcast side —
# the quadratic risk banding protects against does not apply to a
# constant-size codebook.)
LINEAR_PLAN_QUERIES = [
    "dedup_cluster_components",
    "dedup_simhash_pairs",
    "dedup_minhash_lsh_pairs",
    "dedup_ngram_jaccard",
    "decontamination_overlap",
    "emb_near_dup_pairs",
    "emb_lsh_bucketed_search",
    "range_join_banded",
    "skew_salted_join",
    "asof_join_last_click",
    "doc_fingerprint_repetition",
]


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.mark.parametrize("name", LINEAR_PLAN_QUERIES)
def test_no_quadratic_join(spark, name):
    import __spark_entry__ as entry

    df = entry.queries()[name](spark, SF_DIR)
    plan = _plan_of(df)
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian:\n{plan}"
    assert "BroadcastNestedLoopJoin" not in plan, \
        f"{name} plans a nested loop join:\n{plan}"
