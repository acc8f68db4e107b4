"""Batched JSON-RPC source stage over ``mapInPandas``.

The row-at-a-time ``ethereum_rpc`` UDF exists for SQL-name parity with the
reference templates; pipelines that fan out thousands of calls should use
this stage instead: one transport per Python worker (connection reuse),
whole Arrow batches per crossing, and the same ``{"value", "error"}``
envelope + endpoint fragment-option semantics
(/root/reference/examples/ethereum_blocks/create_buffer.sql:38-73).

Scale: parallelism = input partitions × pipeline Workers, the same two
knobs the reference tunes (pipeline.yaml:13,26). Repartition the request
DataFrame to set the concurrent-connection count explicitly.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..functions import rpc as rpcmod


def rpc_response_stage(requests: DataFrame, endpoint: str,
                       method_col: str = "method",
                       params_col: str = "params",
                       response_col: str = "response") -> DataFrame:
    """Append ``response_col`` (the rpc envelope JSON) to a request frame.

    ``requests`` carries ``method_col`` (string) and ``params_col`` (JSON
    array string); all other columns pass through untouched."""
    from pyspark.sql.types import StringType, StructField, StructType

    # build a fresh StructType — StructType.add mutates in place, which
    # would corrupt the input DataFrame's resolved schema
    out_schema = StructType(list(requests.schema.fields)
                            + [StructField(response_col, StringType())])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        transport = rpcmod.get_default_transport()  # one per worker
        for pdf in batches:
            responses = [
                rpcmod.ethereum_rpc(m, json.loads(p) if p else [], endpoint,
                                    transport=transport)
                for m, p in zip(pdf[method_col], pdf[params_col])]
            out = pdf.copy()
            out[response_col] = responses
            yield out

    return requests.mapInPandas(run, out_schema)


def block_range_requests(spark, start: int, end: int, method: str,
                         extra_params: list | None = None,
                         num_partitions: int | None = None) -> DataFrame:
    """Request frame for a block range: (n, method, params) — the
    generate_series fan-out shape (blocks create_buffer.sql:7-11)."""
    from pyspark.sql import functions as F

    from ..functions.registry import register_all
    register_all(spark)
    rng = spark.range(start, end + 1)
    if num_partitions:
        rng = rng.repartition(num_partitions)
    extra = [F.lit(p) for p in (extra_params or [])]
    params = F.to_json(F.array(F.expr("evm_hex_encode_int(id)"), *extra))
    return rng.select(F.col("id").alias("n"),
                      F.lit(method).alias("method"),
                      params.alias("params"))
