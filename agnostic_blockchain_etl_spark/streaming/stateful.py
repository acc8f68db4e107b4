"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference keeps its pipelines stateless (SURVEY.md §2.8) — but the
engine exposes Spark's arbitrary-state API for workloads that fold state
across micro-batches (running balances, cross-batch dedup, counters).

``running_totals`` is the canonical shape: per-key state (count, sum)
carried across micro-batches in the state store, emitted as updated
aggregates each batch. At scale the state store is RocksDB-backed and
partitioned by key; the watermark/timeout policy bounds its growth.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "count LONG, total DOUBLE"
OUTPUT_SCHEMA = "user_id LONG, count LONG, total DOUBLE"


def _update_running_totals(key, pdfs: Iterable[pd.DataFrame],
                           state: GroupState):
    """Fold (count, sum) state for one key across a micro-batch."""
    count, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        count += len(pdf)
        total += float(pdf["value"].sum())
    state.update((count, total))
    yield pd.DataFrame({"user_id": [key[0]], "count": [count],
                        "total": [total]})


def running_totals(events: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Per-key running (count, sum) over an unbounded stream — state lives
    in the store, one row per key emitted per micro-batch it appears in."""
    return (events.groupBy(key_col)
            .applyInPandasWithState(
                _update_running_totals,
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))
