"""Cursor micro-batch generator — the reference's unbounded-stream model
(tip_tracker.go + batcher.go) as a simple generator usable from both the
pipeline runner and ad-hoc driver loops.

This is deliberately a driver-side construct (SURVEY.md §2.8 'chosen:
driver loop'): each yielded range becomes one Spark job over
``spark.range(start, end+1)`` or a cursor-filtered table scan, so Spark's
own parallelism applies within the batch while the stream stays ordered
across batches."""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

from ..plans.types import Batch


def cursor_stream_batches(get_tip: Callable[[], int | None], start: int,
                          max_batch_size: int = 100,
                          poll_interval_s: float = 10.0,
                          stop_after_batches: int | None = None,
                          stop_when_caught_up: bool = False) -> Iterator[Batch]:
    """Yield contiguous ``Batch`` ranges forever (or until bounded).

    ``get_tip`` is polled like tip.sql; non-increasing tips are ignored
    (batcher.go:55-57); ranges are ≤ ``max_batch_size`` wide and cover
    ``[start, tip]`` exactly once."""
    number = 0
    cursor = start
    last_tip: int | None = None
    while True:
        tip = get_tip()
        if tip is None:
            # a None tip signals source exhaustion; non-increasing tips just
            # mean no new work yet (keep polling, batcher.go:55-57)
            if stop_when_caught_up:
                return
        elif last_tip is None or tip > last_tip:
            last_tip = tip
            while cursor <= tip:
                end = min(cursor + max_batch_size - 1, tip)
                yield Batch(number=number, start=cursor, end=end,
                            vars={"NUMBER": number, "START": cursor, "END": end})
                number += 1
                cursor = end + 1
                if stop_after_batches is not None and number >= stop_after_batches:
                    return
        if poll_interval_s:
            time.sleep(poll_interval_s)
