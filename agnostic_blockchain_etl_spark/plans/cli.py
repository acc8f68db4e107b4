"""CLI: ``pipeline`` and ``render`` subcommands.

Reference: cmd/main.go:19-43 (urfave/cli app), cmd/pipeline/pipeline.go:31-159,
cmd/render/render.go:12-63.

    python -m agnostic_blockchain_etl_spark.plans.cli pipeline <dir>/pipeline.yaml \
        --var SOURCE_TABLE=events --var TARGET=/tmp/out
    python -m agnostic_blockchain_etl_spark.plans.cli render <dir> --var K=V [--filter glob]
"""

from __future__ import annotations

import argparse
import fnmatch
import sys

from .config import PipelineConfig
from .templates import TemplateSet


def _parse_vars(pairs: list[str]) -> dict:
    out = {}
    for p in pairs or []:
        if "=" not in p:
            raise SystemExit(f"--var expects k=v, got {p!r}")
        k, v = p.split("=", 1)
        out[k] = v
    return out


def cmd_render(args) -> int:
    ts = TemplateSet.load(args.path)
    vars = _parse_vars(args.var)
    for name in ts.names():
        if args.filter and not fnmatch.fnmatch(name, args.filter):
            continue
        print(f"----------- {name} -----------")
        print(ts.render(name, vars))
    return 0


def cmd_pipeline(args) -> int:
    from ..session import get_session
    from .executor import SparkExecutor
    from .pipeline import run_with_retry

    from .objstr import parent_url

    # config + templates resolve through objstr-style URLs (file/http(s)/
    # s3) exactly like the reference (cmd/pipeline/pipeline.go:63-78):
    # templates default to the config URL's directory prefix
    conf = PipelineConfig.from_yaml(args.path)
    tdir = args.template_path if args.template_path else parent_url(args.path)
    templates = TemplateSet.load(tdir)
    vars = {**conf.Vars, **_parse_vars(args.var)}
    spark = get_session(master=conf.Engine.master,
                        conf=conf.Engine.spark_conf)

    def scheduler_hook(pool: str) -> None:
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", pool)

    metrics_server = None
    live_metrics: list = []   # run_pipeline appends stage dicts LIVE
    if args.metrics_port:
        from .probe import (MetricsServer, run_startup_probe,
                            stage_metrics_collector)
        run_startup_probe(spark)
        metrics_server = MetricsServer(port=int(args.metrics_port))
        # register BEFORE the blocking run: the collector reads the
        # live per-stage counters while the pipeline executes
        metrics_server.register(stage_metrics_collector(live_metrics))
        metrics_server.start()

    try:
        result = run_with_retry(SparkExecutor(spark), templates, conf,
                                vars, scheduler_hook=scheduler_hook,
                                stage_metrics_out=live_metrics)
    finally:
        if metrics_server is not None:
            metrics_server.stop()
    print(f"pipeline done: {result.stats.batches} batches, "
          f"{result.stats.items} items, max_end={result.stats.max_end}, "
          f"{result.stats.items_per_s:.1f} items/s")
    return 0


def cmd_store_prune(args) -> int:
    """Maintenance: reclaim snapshot-compacted streaming-store space
    (`streaming.dedup.prune_store_deltas` — semantic members, paragraph
    frequencies, source-cap counts, near-dup signatures all share the
    ``batch_id=/upto=`` layout). Run while the stream is STOPPED and
    its checkpoint has committed past the newest snapshot's batch —
    the library docstring's safety contract. Pass ``--checkpoint`` to
    have that precondition VERIFIED against the stream's commit log
    instead of trusted (the prune refuses when the checkpoint is
    behind the snapshot)."""
    import json

    from ..session import get_session
    from ..streaming.dedup import PruneRefusedError, prune_store_deltas
    spark = get_session(master=args.master)
    try:
        result = prune_store_deltas(spark, args.store_path,
                                    dry_run=args.dry_run,
                                    checkpoint=args.checkpoint)
    except PruneRefusedError as exc:
        # the checkpoint guard's refusal ONLY — keep the one-JSON-line
        # stdout contract (scripts parse it) instead of a traceback; any
        # other ValueError (e.g. a malformed upto=<junk> snapshot dir)
        # is store corruption and must propagate as a traceback
        print(json.dumps({"store": args.store_path,
                          "dry_run": args.dry_run, "error": str(exc)}))
        return 1
    print(json.dumps({"store": args.store_path,
                      "dry_run": args.dry_run, **result}))
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="agnostic-blockchain-etl-spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p1 = sub.add_parser("pipeline", help="run a pipeline from its yaml config")
    p1.add_argument("path")
    p1.add_argument("--var", action="append", default=[])
    p1.add_argument("--template-path", default=None)
    p1.add_argument("--metrics-port", default=None,
                    help="serve Prometheus-text metrics (reference :9999)")
    p1.set_defaults(fn=cmd_pipeline)

    p2 = sub.add_parser("render", help="render templates without executing")
    p2.add_argument("path")
    p2.add_argument("--var", action="append", default=[])
    p2.add_argument("--filter", default=None)
    p2.set_defaults(fn=cmd_render)

    p3 = sub.add_parser(
        "store-prune",
        help="reclaim snapshot-compacted streaming-store space "
             "(run with the stream STOPPED)")
    p3.add_argument("store_path")
    p3.add_argument("--master", default="local[*]")
    p3.add_argument("--dry-run", action="store_true",
                    help="report what would be pruned without deleting")
    p3.add_argument("--checkpoint", default=None,
                    help="the stream's checkpointLocation: verify its "
                         "commit log has sealed the snapshot batch "
                         "before pruning (refuse otherwise)")
    p3.set_defaults(fn=cmd_store_prune)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
