"""`ethereum_rpc` UDF-as-source as a REAL Spark batch data source.

Reference analog: the `ethereum_rpc(...)` table-function scans in every
ingest buffer (examples/ethereum_blocks/create_buffer.sql:38-73) — a
range of block numbers fanned out to JSON-RPC calls. Here that is a
first-class ``spark.read.format("agn_rpc")`` source (Spark 4 Python
Data Source API): the driver plans one InputPartition per bounded block
range, and each partition's calls execute ON AN EXECUTOR with its own
transport — distributed fan-out with connection reuse, not a UDF over a
pre-built frame and not a driver loop.

Usage::

    spark.dataSource.register(RpcDataSource)
    df = (spark.read.format("agn_rpc")
          .option("endpoint", "https://...")
          .option("method", "eth_getBlockByNumber")
          .option("start", 0).option("end", 999)
          .option("batch_size", 100)        # blocks per partition/task
          .option("params_template", '["{n_hex}", false]')
          .load())                          # n BIGINT, response STRING

``params_template`` formats each call's params: ``{n}`` substitutes the
decimal cursor, ``{n_hex}`` the 0x-hex form. ``response`` carries the
reference's ``{"value":…, "error":…}`` envelope JSON — failures are
rows, not exceptions, exactly like the UDF form.

Scale: parallelism = ceil(range / batch_size) tasks; each task is one
transport and ``batch_size`` sequential calls — the same two knobs
(Workers × MaxBatchSize) the reference tunes. The mock transport
(``AGN_RPC_MOCK``) rides an env var, so executors resolve it the same
way the pandas stages do.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class RpcReader(DataSourceReader):
    def __init__(self, options: dict):
        self.endpoint = options.get("endpoint")
        if not self.endpoint:
            raise ValueError("agn_rpc requires option 'endpoint'")
        self.method = options.get("method")
        if not self.method:
            raise ValueError("agn_rpc requires option 'method'")
        self.start = int(options.get("start", 0))
        self.end = int(options.get("end", self.start))
        self.batch = max(1, int(options.get("batch_size", 1000)))
        self.template = options.get("params_template", "[]")
        # validate the template ONCE at plan time with a probe value: a
        # malformed template (a typo'd comma) used to be swallowed
        # per-row into params=[], turning a 100%-of-rows config error
        # into per-row -32602 RPC envelopes with no hint at the cause
        # (review finding). Substitution only swaps the placeholder
        # values, so probe-parseable ⇒ every row parseable.
        probe = self.template.replace("{n_hex}", "0x0").replace("{n}", "0")
        try:
            json.loads(probe)
        except ValueError as exc:
            raise ValueError(
                f"agn_rpc params_template is not valid JSON after "
                f"substitution: {self.template!r} ({exc})") from exc

    def partitions(self) -> list[RangePartition]:
        return [RangePartition(lo, min(lo + self.batch - 1, self.end))
                for lo in range(self.start, self.end + 1, self.batch)]

    def read(self, partition: RangePartition) -> Iterator[tuple]:
        # runs on the executor: one transport per task, sequential calls
        # within the bounded range (the reference's Worker loop)
        from ..functions import rpc as rpcmod
        transport = rpcmod.get_default_transport()
        for n in range(partition.start, partition.end + 1):
            params_json = (self.template
                           .replace("{n_hex}", hex(n))
                           .replace("{n}", str(n)))
            # template validated at plan time (__init__); a failure
            # here is a real bug and must kill the task, not silently
            # degrade to params=[]
            params = json.loads(params_json)
            yield (n, rpcmod.ethereum_rpc(self.method, params,
                                          self.endpoint,
                                          transport=transport))


class RpcDataSource(DataSource):
    """``format("agn_rpc")`` — JSON-RPC block-range fan-out as a scan."""

    @classmethod
    def name(cls) -> str:
        return "agn_rpc"

    def schema(self) -> str:
        return "n BIGINT, response STRING"

    def reader(self, schema) -> RpcReader:
        return RpcReader(self.options)
