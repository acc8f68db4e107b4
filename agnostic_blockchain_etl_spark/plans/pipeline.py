"""Micro-batch pipeline orchestration (reference: internal/pipeline/*.go).

The reference assembles goroutines linked by bounded channels
(pipeline.go:64-149): TipTracker → Batcher → Steps (Stage xor Sequencer)
→ Finalizer. This module re-implements that dataflow with Python threads
and bounded ``queue.Queue``s over a shared (thread-safe) SparkSession.

Scale stance: intra-query parallelism belongs to Spark (partitions, AQE);
this layer adds *inter-batch* concurrency — N worker threads each driving
independent Spark jobs, sharing the cluster via FAIR scheduler pools —
plus in-order commit, which Spark does not provide across jobs.
"""

from __future__ import annotations

import logging
import queue
import threading
import time
import uuid as uuidlib
from dataclasses import dataclass, field

from .config import (BatcherConfig, InitConfig, PipelineConfig, StageConfig,
                     StepConfig, TipTrackerConfig)
from .executor import Executor, select_single_row
from .templates import TemplateSet
from .types import CLOSE, Batch, BatchBuffer

log = logging.getLogger("agnostic_blockchain_etl_spark.pipeline")


class PipelineCancelled(RuntimeError):
    pass


@dataclass
class _Ctx:
    """Shared cancellation context (the analog of errgroup + ctx cancel,
    pipeline.go:60-65)."""
    cancel: threading.Event = field(default_factory=threading.Event)
    error: BaseException | None = None
    _lock: threading.Lock = field(default_factory=threading.Lock)

    def fail(self, e: BaseException) -> None:
        with self._lock:
            if self.error is None:
                self.error = e
        self.cancel.set()

    def check(self) -> None:
        if self.cancel.is_set():
            raise PipelineCancelled()


def _put(ctx: _Ctx, q: queue.Queue, item) -> None:
    """Bounded put that honors cancellation (backpressure parity with the
    reference's bounded channels, pipeline.go:66-67)."""
    while True:
        ctx.check()
        try:
            q.put(item, timeout=0.1)
            return
        except queue.Full:
            continue


def _get(ctx: _Ctx, q: queue.Queue):
    while True:
        ctx.check()
        try:
            return q.get(timeout=0.1)
        except queue.Empty:
            continue


# ---------------------------------------------------------------------------
# Init (internal/pipeline/init.go:11-66)
# ---------------------------------------------------------------------------

def run_init(executor: Executor, templates: TemplateSet, vars: dict,
             conf: InitConfig) -> int:
    """Run setup DDL once, then resolve the resume cursor.

    Precedence (init.go:33-37,61-63): ForceStart > start.sql row > DefaultStart.
    """
    for name in conf.Setup:
        executor.exec(templates.render(name, vars))
    if conf.ForceStart is not None:
        return conf.ForceStart
    if conf.Start not in templates.templates:
        return conf.DefaultStart
    row = select_single_row(executor, templates.render(conf.Start, vars))
    start = row.get("start")
    if start is None:
        return conf.DefaultStart
    return int(start)


# ---------------------------------------------------------------------------
# TipTracker (internal/pipeline/tip_tracker.go:32-96)
# ---------------------------------------------------------------------------

def run_tip_tracker(ctx: _Ctx, executor: Executor, templates: TemplateSet,
                    vars: dict, out: queue.Queue, conf: TipTrackerConfig,
                    consumer_done: threading.Event | None = None) -> None:
    """Poll tip.sql every PollInterval; re-send even if unchanged
    (tip_tracker.go:70-75 — the Batcher filters non-increasing tips).

    ``consumer_done`` is set by the Batcher when IT exits (its own
    StopAfter, or its input closing): with nobody draining the
    maxsize-1 tip queue, an unbounded tracker would block in `_put`
    forever and `run_pipeline`'s join would hang even though all work
    finished (round-7 review finding — Batcher.StopAfter set without
    TipTracker.StopAfter deadlocked the process)."""
    def _stopped() -> bool:
        return ctx.cancel.is_set() or (consumer_done is not None
                                       and consumer_done.is_set())

    sent = 0
    try:
        while not _stopped():
            row = select_single_row(executor, templates.render(conf.Tip, vars))
            tip = row.get("tip")
            if tip is not None:
                while not _stopped():          # bounded put, stop-aware
                    try:
                        out.put(int(tip), timeout=0.1)
                        break
                    except queue.Full:
                        continue
                else:
                    break
                sent += 1
                if conf.StopAfter is not None and sent >= conf.StopAfter:
                    break
            # sleep in small slices so cancel/consumer-exit is responsive
            deadline = time.monotonic() + conf.PollIntervalS
            while time.monotonic() < deadline and not _stopped():
                time.sleep(min(0.05, conf.PollIntervalS))
    except PipelineCancelled:
        pass
    except BaseException as e:
        ctx.fail(e)
    finally:
        _safe_close(ctx, out)


# ---------------------------------------------------------------------------
# Batcher (internal/pipeline/batcher.go:24-94)
# ---------------------------------------------------------------------------

def run_batcher(ctx: _Ctx, vars: dict, start: int, tips: queue.Queue,
                out: queue.Queue, conf: BatcherConfig,
                done: threading.Event | None = None) -> None:
    """Cut ``[start, tip]`` into ≤MaxBatchSize ranges; inject NUMBER/START/
    END vars (batcher.go:76-78); ignore non-increasing tips (batcher.go:55-57).
    ``done`` is set on ANY exit so the tip tracker stops producing into a
    queue nobody drains (see `run_tip_tracker`)."""
    number = 0
    cursor = start
    last_tip: int | None = None
    try:
        while True:
            item = _get(ctx, tips)
            if item is CLOSE:
                break
            tip = int(item)
            if last_tip is not None and tip <= last_tip:
                continue
            last_tip = tip
            while cursor <= tip:
                end = min(cursor + conf.MaxBatchSize - 1, tip)  # batcher.go:73
                b = Batch(number=number, start=cursor, end=end,
                          vars={**vars, "NUMBER": number,
                                "START": cursor, "END": end})
                _put(ctx, out, b)
                number += 1
                cursor = end + 1
                if conf.StopAfter is not None and number >= conf.StopAfter:
                    return
    except PipelineCancelled:
        pass
    except BaseException as e:
        ctx.fail(e)
    finally:
        if done is not None:
            done.set()
        _safe_close(ctx, out)


# ---------------------------------------------------------------------------
# Stage (internal/pipeline/stage.go:64-165)
# ---------------------------------------------------------------------------

@dataclass
class StageMetrics:
    """Per-file counters (stage.go:17-43)."""
    executions: int = 0
    rows: int = 0
    elapsed_s: float = 0.0


def run_stage_workers(ctx: _Ctx, executor: Executor, templates: TemplateSet,
                      inq: queue.Queue, out: queue.Queue, conf: StageConfig,
                      workers: int, pool_name: str = "stage",
                      metrics: dict[str, StageMetrics] | None = None,
                      scheduler_hook=None) -> None:
    """N worker threads sharing in/out queues (pipeline.go:100-143). Each
    renders + executes the stage's file list per batch in order
    (stage.go:101-106). Any error cancels the whole pipeline."""
    metrics = metrics if metrics is not None else {}
    lock = threading.Lock()

    def worker(widx: int) -> None:
        if scheduler_hook:
            scheduler_hook(pool_name)  # set FAIR pool for this thread's jobs
        if conf.Settings:
            executor.apply_settings(conf.Settings)  # stage.go:88-90 parity
        try:
            while True:
                item = _get(ctx, inq)
                if item is CLOSE:
                    # Go's closed channel wakes every receiver; our sentinel
                    # is consumed — re-enqueue it for sibling workers.
                    _put(ctx, inq, CLOSE)
                    return
                batch: Batch = item
                for name in conf.Files:
                    t0 = time.monotonic()
                    md = executor.exec(templates.render(name, batch.vars))
                    with lock:
                        m = metrics.setdefault(name, StageMetrics())
                        m.executions += 1
                        m.rows += md.rows
                        m.elapsed_s += time.monotonic() - t0
                _put(ctx, out, batch)
        except PipelineCancelled:
            pass
        except BaseException as e:
            ctx.fail(e)

    threads = [threading.Thread(target=worker, args=(i,),
                                name=f"{pool_name}-w{i}", daemon=True)
               for i in range(workers)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    _safe_close(ctx, out)


# ---------------------------------------------------------------------------
# Sequencer (internal/pipeline/sequencer.go:24-84)
# ---------------------------------------------------------------------------

def run_sequencer(ctx: _Ctx, inq: queue.Queue, out: queue.Queue,
                  start_number: int = 0) -> None:
    """Restore total order: buffer out-of-order batches, emit only while the
    buffered head equals the next expected sequence number
    (sequencer.go:52-80)."""
    buf = BatchBuffer()
    next_number = start_number
    try:
        while True:
            item = _get(ctx, inq)
            if item is CLOSE:
                break
            buf.push(item)
            while buf.peek() is not None and buf.peek().number == next_number:
                _put(ctx, out, buf.pop())
                next_number += 1
        # drain whatever is in order at close (a gap here means lost batches
        # upstream — surface it rather than silently dropping)
        while buf.peek() is not None and buf.peek().number == next_number:
            _put(ctx, out, buf.pop())
            next_number += 1
        if len(buf):
            raise RuntimeError(
                f"sequencer closed with {len(buf)} out-of-order batches "
                f"buffered (next expected {next_number})")
    except PipelineCancelled:
        pass
    except BaseException as e:
        ctx.fail(e)
    finally:
        _safe_close(ctx, out)


# ---------------------------------------------------------------------------
# Finalizer (internal/pipeline/finalizer.go:28-70)
# ---------------------------------------------------------------------------

@dataclass
class FinalizerStats:
    items: int = 0
    batches: int = 0
    max_end: int = 0
    started_at: float = field(default_factory=time.monotonic)

    @property
    def items_per_s(self) -> float:
        dt = time.monotonic() - self.started_at
        return self.items / dt if dt > 0 else 0.0


def run_finalizer(ctx: _Ctx, inq: queue.Queue, stats: FinalizerStats,
                  on_commit=None) -> None:
    """Terminal consumer: count items ``(end-start)+1``, track maxEnd, log
    throughput (finalizer.go:53-67); ``on_commit(batch)`` is the commit
    hook (cursor checkpoint, temp-view cleanup)."""
    try:
        while True:
            item = _get(ctx, inq)
            if item is CLOSE:
                return
            batch: Batch = item
            if on_commit is not None:
                on_commit(batch)
            stats.items += batch.items
            stats.batches += 1
            stats.max_end = max(stats.max_end, batch.end)
            log.info("finalized batch %d [%d,%d] — %.1f items/s",
                     batch.number, batch.start, batch.end, stats.items_per_s)
    except PipelineCancelled:
        pass
    except BaseException as e:
        ctx.fail(e)


def _safe_close(ctx: _Ctx, q: queue.Queue) -> None:
    """Enqueue CLOSE, blocking as long as the pipeline is healthy.

    A slow consumer (e.g. a finalizer commit writing a sink) may hold the
    queue full for a long time — keep trying while the pipeline is alive;
    only a cancelled pipeline stops the close (its consumers exit via
    ctx). Never give up silently: an undelivered CLOSE deadlocks the
    downstream _get loop."""
    while not ctx.cancel.is_set():
        try:
            q.put(CLOSE, timeout=0.1)
            return
        except queue.Full:
            continue


# ---------------------------------------------------------------------------
# Pipeline assembly (internal/pipeline/pipeline.go:18-152)
# ---------------------------------------------------------------------------

@dataclass
class PipelineResult:
    stats: FinalizerStats
    stage_metrics: list[dict]
    start: int


def run_pipeline(executor: Executor, templates: TemplateSet,
                 conf: PipelineConfig, vars: dict | None = None,
                 on_commit=None, scheduler_hook=None,
                 stage_metrics_out: list | None = None) -> PipelineResult:
    """Assemble and run the full dataflow; blocks until the stream closes
    (StopAfter bounds) or a component errors (error cancels all, parity
    with the errgroup at pipeline.go:60-65).

    ``stage_metrics_out``: pass a LIVE list and the per-stage metric
    dicts are appended to it as the stages spawn, so a metrics endpoint
    registered BEFORE the (blocking) run can serve real counters during
    it — the counters mutate in place (review finding: the CLI's
    --metrics-port served an empty body for the whole run because
    nothing could reach these dicts until the run returned)."""
    run_vars = {**conf.Vars, **(vars or {}),
                "UUID": str(uuidlib.uuid4())}  # pipeline.go:48-54
    # sink DDL for decoded-JSON columns follows the session's dynamic-JSON
    # mode (VARIANT when supported, STRING fallback) unless the caller
    # pinned it — the analog of the reference's ClickHouse Dynamic columns
    if "JSON_COL_TYPE" not in run_vars and hasattr(executor, "spark"):
        from ..functions.registry import json_variant_mode, register_all
        register_all(executor.spark)
        run_vars["JSON_COL_TYPE"] = (
            "VARIANT" if json_variant_mode(executor.spark) else "STRING")
    start = run_init(executor, templates, run_vars, conf.Init)

    ctx = _Ctx()
    tip_q: queue.Queue = queue.Queue(maxsize=1)    # pipeline.go:66
    batch_q: queue.Queue = queue.Queue(maxsize=3)  # pipeline.go:67

    threads: list[threading.Thread] = []

    def spawn(fn, *args, name: str):
        t = threading.Thread(target=fn, args=args, name=name, daemon=True)
        threads.append(t)
        t.start()

    batcher_done = threading.Event()   # tips unconsumed past this point
    spawn(run_tip_tracker, ctx, executor, templates, run_vars, tip_q,
          conf.TipTracker, batcher_done, name="tip-tracker")
    spawn(run_batcher, ctx, run_vars, start, tip_q, batch_q, conf.Batcher,
          batcher_done, name="batcher")

    if stage_metrics_out is not None:
        stage_metrics_out.clear()   # a retry re-run must not duplicate
    stage_metrics: list[dict] = (stage_metrics_out
                                 if stage_metrics_out is not None else [])
    inq = batch_q
    for i, step in enumerate(conf.Steps):
        outq: queue.Queue = queue.Queue(maxsize=step.ChanSize)
        if step.Sequencer is not None:
            spawn(run_sequencer, ctx, inq, outq, name=f"sequencer-{i}")
        else:
            m: dict[str, StageMetrics] = {}
            stage_metrics.append(m)
            spawn(run_stage_workers, ctx, executor, templates, inq, outq,
                  step.Stage, step.Workers, f"stage-{i}", m, scheduler_hook,
                  name=f"stage-{i}")
        inq = outq

    stats = FinalizerStats()
    fin = threading.Thread(target=run_finalizer,
                           args=(ctx, inq, stats, on_commit),
                           name="finalizer", daemon=True)
    fin.start()
    threads.append(fin)

    for t in threads:
        t.join()
    if ctx.error is not None:
        raise ctx.error
    return PipelineResult(stats=stats, stage_metrics=stage_metrics, start=start)


# ---------------------------------------------------------------------------
# Retrier (internal/pipeline_retrier/pipeline_retrier.go:16-64)
# ---------------------------------------------------------------------------

_OOM_MARKERS = ("outofmemory", "memory limit", "memorylimitexceeded",
                "total memory", "java heap space", "gc overhead")


def is_memory_error(e: BaseException) -> bool:
    s = str(e).lower().replace(" ", "")
    return isinstance(e, MemoryError) or any(
        m.replace(" ", "") in s for m in _OOM_MARKERS)


def run_with_retry(executor: Executor, templates: TemplateSet,
                   conf: PipelineConfig, vars: dict | None = None,
                   on_commit=None, scheduler_hook=None,
                   stage_metrics_out: list | None = None) -> PipelineResult:
    """Re-run the whole pipeline with MaxBatchSize × multiplier on memory
    errors (pipeline_retrier.go:47-58); other errors propagate. Safe because
    sinks are replay-idempotent (range-keyed writes, SURVEY.md §7.2)."""
    original = conf.Batcher.MaxBatchSize
    batch_size = float(original)
    try:
        for attempt in range(conf.Retry.MaxRetries + 1):
            conf.Batcher.MaxBatchSize = max(1, int(batch_size))
            try:
                return run_pipeline(executor, templates, conf, vars,
                                    on_commit, scheduler_hook,
                                    stage_metrics_out)
            except BaseException as e:
                if not is_memory_error(e) or attempt == conf.Retry.MaxRetries:
                    raise
                batch_size *= conf.Retry.MaxBatchSizeMultiplier
                log.warning("memory error (%s); retrying with MaxBatchSize=%d",
                            e, max(1, int(batch_size)))
        raise AssertionError("unreachable")
    finally:
        # the shrink is per-run state, not a lasting config edit
        conf.Batcher.MaxBatchSize = original
