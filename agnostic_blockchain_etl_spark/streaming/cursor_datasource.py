"""The cursor/tip micro-batch model as a REAL Structured Streaming
source, via Spark 4's Python Data Source API.

Reference analog: TipTracker + Batcher (internal/pipeline/tip_tracker.go:
32-96, batcher.go:59-91) — poll a tip, emit bounded [start, end] ranges,
never past the tip, resume from the last committed cursor. Here that
whole loop IS the engine's offset protocol: ``initialOffset`` is the
configured start, ``read`` advances the offset by at most
``max_batch_size`` but never past the tip, and Spark's checkpoint
commits replace the reference's Finalizer cursor writes — restart
resumes exactly where the last batch committed, replays are
exactly-once by offset-range construction.

Usage::

    spark.dataSource.register(CursorDataSource)
    stream = (spark.readStream.format("agn_cursor")
              .option("start", 0)
              .option("max_batch_size", 100)
              .option("tip_path", "/path/to/tipfile")   # int, polled
              .load())                                  # column: n BIGINT

Each micro-batch holds the cursor numbers of one bounded range — the
streaming twin of the ``generate_series`` scan every ingest buffer
starts from; downstream stages (RPC enrichment, decode, sink) are
ordinary transformations on it. The tip lives in a file so anything can
feed it (a block-head poller, a partition lister); reading it is the
``tip.sql`` poll. At cluster scale the rows-per-batch is bounded by
``max_batch_size`` exactly like the reference's Batcher, so state and
memory are bounded regardless of backlog depth.

The reader runs on the driver (SimpleDataSourceStreamReader) — correct
for cursor *generation*, which is control-plane work; the data plane
(the per-range queries) executes distributed downstream, same split as
the reference's Go-orchestrator-plus-SQL design.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader


def _read_tip(path: str) -> int:
    try:
        with open(path) as fh:
            return int(fh.read().strip() or -1)
    except (OSError, ValueError):
        return -1


class CursorStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self.start = int(options.get("start", 0))
        self.max_batch = int(options.get("max_batch_size", 1000))
        self.tip_path = options.get("tip_path")
        if not self.tip_path:
            raise ValueError("agn_cursor requires option 'tip_path'")

    def initialOffset(self) -> dict:
        return {"cursor": self.start}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        # the engine's prefetch cache copies AND pickles this iterator, so
        # it must be a list_iterator over materialized rows (a lazy
        # generator fails pickling) — bounded by max_batch, which is the
        # whole point of the Batcher cap
        lo = start["cursor"]
        tip = _read_tip(self.tip_path)
        hi = min(tip + 1, lo + self.max_batch)   # tip inclusive, bounded
        if hi <= lo:
            return iter([]), start                # nothing new: empty batch
        return iter([(n,) for n in range(lo, hi)]), {"cursor": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # deterministic replay of a committed range (restart recovery)
        return iter([(n,) for n in range(start["cursor"], end["cursor"])])

    def commit(self, end: dict) -> None:
        pass  # Spark's checkpoint IS the cursor store


class CursorDataSource(DataSource):
    """``format("agn_cursor")`` — tip-bounded cursor ranges as a stream."""

    @classmethod
    def name(cls) -> str:
        return "agn_cursor"

    def schema(self) -> str:
        return "n BIGINT"

    def simpleStreamReader(self, schema) -> CursorStreamReader:
        return CursorStreamReader(self.options)
