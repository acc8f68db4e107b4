"""Startup probe + metrics endpoint (reference: internal/ch/startup_probe.go
:16-62 and the Prometheus scrape server on :9999,
cmd/pipeline/pipeline.go:90-111).

The probe is near-trivial for Spark (the session blocks until ready) but
kept for interface parity and for Spark Connect remotes where readiness
is real. The metrics endpoint serves the pipeline's stage/finalizer
counters in Prometheus text format over stdlib HTTP — no client library
dependency.
"""

from __future__ import annotations

import os
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class ProbeTimeout(RuntimeError):
    pass


def supports_variant(spark) -> bool:
    """Probe once per session whether VariantType + variant_get exist
    (Spark 4+). Decoded-JSON columns ride VARIANT when available —
    ``variant_get`` subpath reads are pushdown-friendly and skip
    re-parsing the JSON text per access (the reference stores decoded
    inputs as ClickHouse ``Dynamic``,
    examples/ethereum_decoded_logs/create_table.sql:12). Set
    ``AGN_DISABLE_VARIANT=1`` to force the JSON-string fallback."""
    if os.environ.get("AGN_DISABLE_VARIANT"):
        return False
    # cached as an attribute ON the session (id(spark) keys are unsafe:
    # a stopped session's id can be reused by a new object)
    cached = getattr(spark, "_agn_supports_variant", None)
    if cached is None:
        try:
            spark.sql(
                """SELECT variant_get(parse_json('{"a": 1}'), '$.a')"""
            ).collect()
            cached = True
        except Exception:
            cached = False
        spark._agn_supports_variant = cached
    return cached


def run_startup_probe(spark, max_delay_s: float = 10.0,
                      poll_interval_s: float = 1.0) -> None:
    """Ping the engine until it answers (probe defaults MaxDelay 10s /
    PollInterval 1s, startup_probe.go:19-25)."""
    deadline = time.monotonic() + max_delay_s
    last: Exception | None = None
    while time.monotonic() < deadline:
        try:
            spark.sql("SELECT 1").collect()
            return
        except Exception as e:  # session still initializing (Connect remotes)
            last = e
            time.sleep(poll_interval_s)
    raise ProbeTimeout(f"engine not ready after {max_delay_s}s: {last}")


class MetricsServer:
    """Prometheus-text metrics endpoint over the pipeline's counters.

    ``collect()`` callbacks return dicts of ``name{labels} -> value``;
    stage metrics and finalizer stats register themselves here. Serves on
    ``addr`` (default mirrors the reference's :9999)."""

    def __init__(self, port: int = 9999):
        self.port = port
        self._collectors: list = []
        self._server: ThreadingHTTPServer | None = None

    def register(self, collect) -> None:
        self._collectors.append(collect)

    def render(self) -> str:
        lines: list[str] = []
        for collect in self._collectors:
            for name, value in collect().items():
                lines.append(f"{name} {value}")
        return "\n".join(lines) + "\n"

    def start(self) -> None:
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self):
                body = outer.render().encode()
                self.send_response(200)
                self.send_header("Content-Type",
                                 "text/plain; version=0.0.4")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *args):  # quiet
                pass

        self._server = ThreadingHTTPServer(("127.0.0.1", self.port), Handler)
        threading.Thread(target=self._server.serve_forever,
                         name="metrics-server", daemon=True).start()

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server = None


def stage_metrics_collector(stage_metrics: list[dict]):
    """Adapt run_pipeline's per-stage metrics to Prometheus lines
    (counter names mirror internal/pipeline/stage.go:17-43)."""

    def collect() -> dict:
        out = {}
        for i, stage in enumerate(stage_metrics):
            for fname, m in stage.items():
                key = fname.replace(".", "_")
                out[f'query_executions_total{{stage="{i}",file="{key}"}}'] = m.executions
                out[f'query_rows_total{{stage="{i}",file="{key}"}}'] = m.rows
                out[f'query_elapsed_seconds_total{{stage="{i}",file="{key}"}}'] = \
                    round(m.elapsed_s, 3)
        return out

    return collect
