"""Register the kernel library as Spark SQL functions.

The reference activates its UDF bundle by server config
(internal/engine/impl/local/local_engine.go:236-275); our analog is
``register_all(spark)``, called by the session factory, after which the
reference's SQL (hex/keccak/ABI-decode expressions) runs near-verbatim via
``spark.sql``.

Design notes (scale): the pure kernels (hex, keccak) are registered as
**pandas UDFs** so values move executor→Python in Arrow record batches
rather than pickled rows; the decode UDFs are pandas UDFs too (CPU-bound,
benefit from batch amortization). The RPC functions are pandas UDFs as
well: one transport is resolved per Arrow batch, so SQL-verbatim
pipelines get connection/retry-state reuse too; high-fan-out pipelines
should still prefer the ``mapInPandas`` source in
``operators/rpc_source.py`` (transport pooled per worker, request
batching). Where possible prefer the *native column expressions* in
``native`` below (hex encode/decode compile to JVM ``unhex``/``hex``
and stay inside whole-stage codegen — no Python at all).
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (BinaryType, DecimalType, LongType, StringType)

from . import abi, hex as hexmod, keccak, rpc



# ---------------------------------------------------------------------------
# Native (JVM-side, codegen-friendly) equivalents — use these in DataFrame
# code; the Python UDFs below exist for SQL-name parity with the reference.
# ---------------------------------------------------------------------------

class native:
    """Column-expression versions that never leave the JVM."""

    @staticmethod
    def evm_hex_decode(col: Column | str) -> Column:
        c = F.col(col) if isinstance(col, str) else col
        h = F.regexp_replace(c, "^0[xX]", "")
        # left-pad odd-length nibble strings, '' → empty binary
        h = F.when(F.length(h) % 2 == 1, F.concat(F.lit("0"), h)).otherwise(h)
        return F.unhex(h)

    @staticmethod
    def evm_hex_decode_int(col: Column | str) -> Column:
        """≤63-bit hex quantity → long (JVM ``conv``)."""
        c = F.col(col) if isinstance(col, str) else col
        h = F.regexp_replace(c, "^0[xX]", "")
        return F.when(c.isNull(), F.lit(None).cast(LongType())).otherwise(
            F.conv(F.when(h == "", F.lit("0")).otherwise(h), 16, 10).cast(LongType()))

    @staticmethod
    def evm_hex_encode(col: Column | str) -> Column:
        c = F.col(col) if isinstance(col, str) else col
        return F.concat(F.lit("0x"), F.lower(F.hex(c)))


# ---------------------------------------------------------------------------
# pandas UDF kernels
# ---------------------------------------------------------------------------

@pandas_udf(BinaryType())
def _udf_hex_decode(s: pd.Series) -> pd.Series:
    return s.map(lambda v: hexmod.evm_hex_decode(v) if v is not None else None)


@pandas_udf(LongType())
def _udf_hex_decode_int(s: pd.Series, t: pd.Series) -> pd.Series:
    # zip value+type rows together — a separate iterator would desync on
    # null values (null rows must still consume their type argument)
    return pd.Series([
        hexmod.evm_hex_decode_int(v, ty) if v is not None else None
        for v, ty in zip(s, t)])


@pandas_udf(DecimalType(38, 0))
def _udf_hex_decode_dec(s: pd.Series) -> pd.Series:
    import decimal

    def conv(v):
        if v is None:
            return None
        n = hexmod.evm_hex_decode_int(v, "UInt256")
        return decimal.Decimal(n) if n < 10 ** 38 else None

    return s.map(conv)


@pandas_udf(BinaryType())
def _udf_hex_decode_word(s: pd.Series) -> pd.Series:
    """0x-hex quantity → canonical 32-byte big-endian word (UInt256 exact)."""

    def conv(v):
        if v is None:
            return None
        n = hexmod.evm_hex_decode_int(v, "UInt256")
        return n.to_bytes(32, "big")

    return s.map(conv)


@pandas_udf(StringType())
def _udf_hex_encode(b: pd.Series) -> pd.Series:
    return b.map(lambda v: hexmod.evm_hex_encode(bytes(v)) if v is not None else None)


@pandas_udf(StringType())
def _udf_hex_encode_int(n: pd.Series) -> pd.Series:
    return n.map(lambda v: hexmod.evm_hex_encode_int(int(v)) if v is not None and not pd.isna(v) else None)


@pandas_udf(BinaryType())
def _udf_keccak256(s: pd.Series) -> pd.Series:
    return s.map(lambda v: keccak.keccak256(v) if v is not None else None)


@pandas_udf(StringType())
def _udf_decode_event(topics: pd.Series, data: pd.Series, fullsigs: pd.Series) -> pd.Series:
    out = []
    for t, d, f in zip(topics, data, fullsigs):
        out.append(abi.evm_decode_event(
            list(t) if t is not None else [], d,
            list(f) if f is not None else []))
    return pd.Series(out)


@pandas_udf(StringType())
def _udf_decode_call(inp: pd.Series, outp: pd.Series, fullsigs: pd.Series) -> pd.Series:
    out = []
    for i, o, f in zip(inp, outp, fullsigs):
        out.append(abi.evm_decode_call(i, o, list(f) if f is not None else []))
    return pd.Series(out)


@pandas_udf(StringType())
def _udf_ethereum_rpc(method: pd.Series, params: pd.Series,
                      endpoint: pd.Series) -> pd.Series:
    # one transport per Arrow batch: connection/retry state is reused
    # across the batch's calls instead of re-resolved per row
    t = rpc.get_default_transport()

    def one(m, p, e):
        # null-safe like every other kernel UDF here: a NULL method/
        # endpoint returns the error envelope instead of raising out
        # of the UDF and killing the task (review finding); pd.isna
        # because Arrow surfaces numeric NULLs as NaN, not None
        if pd.isna(m) or pd.isna(e):
            return json.dumps({"value": None,
                               "error": "null method or endpoint"})
        return rpc.ethereum_rpc(m, list(p) if p is not None else [], e,
                                transport=t)

    return pd.Series([one(m, p, e)
                      for m, p, e in zip(method, params, endpoint)])


@pandas_udf(StringType())
def _udf_ethereum_rpc_call(to: pd.Series, func_sig: pd.Series,
                           args_json: pd.Series, block_number: pd.Series,
                           endpoint: pd.Series) -> pd.Series:
    t = rpc.get_default_transport()

    def one(a, f, j, b, e):
        if any(pd.isna(v) for v in (a, f, b, e)):
            return json.dumps({"value": None,
                               "error": "null to/func_sig/block_number/"
                                        "endpoint"})
        return rpc.ethereum_rpc_call(a, f,
                                     "" if pd.isna(j) else j,
                                     int(b), e, transport=t)

    return pd.Series([one(a, f, j, b, e)
                      for a, f, j, b, e in zip(to, func_sig, args_json,
                                               block_number, endpoint)])


def register_all(spark: SparkSession) -> None:
    """Register every kernel under its reference name (idempotent).

    Session-scoped state lives as attributes ON the session object, not
    in module dicts keyed by ``id(spark)``: a stopped session's id can be
    reused by a new object, which would silently inherit stale
    registered/variant flags."""
    if getattr(spark, "_agn_udfs_registered", False):
        return
    spark.udf.register("evm_hex_decode", _udf_hex_decode)
    spark.udf.register("evm_hex_decode_int", _udf_hex_decode_int)
    spark.udf.register("evm_hex_decode_dec", _udf_hex_decode_dec)
    spark.udf.register("evm_hex_decode_word", _udf_hex_decode_word)
    spark.udf.register("evm_hex_encode", _udf_hex_encode)
    spark.udf.register("evm_hex_encode_int", _udf_hex_encode_int)
    spark.udf.register("keccak256", _udf_keccak256)
    spark.udf.register("evm_decode_event", _udf_decode_event)
    spark.udf.register("evm_decode_call", _udf_decode_call)
    spark.udf.register("ethereum_rpc", _udf_ethereum_rpc)
    spark.udf.register("ethereum_rpc_call", _udf_ethereum_rpc_call)
    from .words import register_words
    register_words(spark)
    register_json_helpers(spark)
    # custom data sources: SQL `USING agn_rpc` / `USING agn_cursor` views
    # work in pipeline templates once registered (Connect sessions lack
    # spark.dataSource — degrade to UDF-form there)
    try:
        from ..sources.rpc_datasource import RpcDataSource
        from ..streaming.cursor_datasource import CursorDataSource
        spark.dataSource.register(RpcDataSource)
        spark.dataSource.register(CursorDataSource)
    except Exception:  # noqa: BLE001 — registration is best-effort
        pass
    _register_rpc_udtf(spark)
    spark._agn_udfs_registered = True


def _register_rpc_udtf(spark: SparkSession) -> None:
    """Register ``ethereum_rpc_range`` as a Python UDTF so SQL can use
    the reference's table-function shape VERBATIM:

        SELECT * FROM ethereum_rpc_range(0, 99,
            'eth_getBlockByNumber', '["{n_hex}", false]', 'https://...')

    (reference: `FROM ethereum_rpc(...)` scans in every ingest buffer,
    examples/ethereum_blocks/create_buffer.sql:38-73). A scalar-args
    UDTF call evaluates on one task — the distributed forms are the
    `agn_rpc` data source (partition-planned) and the mapInPandas stage
    (`operators/rpc_source.py`); this form exists for verbatim-SQL
    parity and bounded lookups."""
    import json as _json

    from pyspark.sql.functions import udtf

    @udtf(returnType="n BIGINT, response STRING")
    class EthereumRpcRange:
        def eval(self, start: int, end: int, method: str,
                 params_template: str, endpoint: str):
            from . import rpc as rpcmod
            transport = rpcmod.get_default_transport()
            for n in range(int(start), int(end) + 1):
                tmpl = (params_template or "[]") \
                    .replace("{n_hex}", hex(n)).replace("{n}", str(n))
                try:
                    params = _json.loads(tmpl)
                except ValueError:
                    params = []
                yield n, rpcmod.ethereum_rpc(method, params, endpoint,
                                             transport=transport)

    try:
        spark.udtf.register("ethereum_rpc_range", EthereumRpcRange)
    except Exception:  # noqa: BLE001 — best-effort (older/Connect sessions)
        pass


def register_json_helpers(spark: SparkSession,
                          use_variant: bool | None = None) -> None:
    """(Re-)register the dynamic-JSON SQL helpers the decode templates
    use, choosing the storage form for decoded payload columns:

    - ``agn_json_pack(s)`` — JSON text → the storage value (VARIANT via
      try_parse_json when the session supports it, else the string);
    - ``agn_json_get(v, path)`` — subpath read as STRING (variant_get
      with pushdown, else get_json_object re-parse);
    - ``agn_json_str(v)`` — canonical JSON text of the stored value (the
      reference's ``toJSONString(Dynamic)``, decoded_logs_to_daily).

    SQL-defined functions, so they inline into whole-stage codegen —
    no Python boundary. Pass ``use_variant`` to force a mode (tests run
    the pipelines under both)."""
    if use_variant is None:
        from ..plans.probe import supports_variant
        use_variant = supports_variant(spark)
    if use_variant:
        spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION agn_json_pack(s STRING)
                     RETURNS VARIANT RETURN try_parse_json(s)""")
        spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION agn_json_get(v VARIANT, p STRING)
                     RETURNS STRING RETURN CAST(variant_get(v, p) AS STRING)""")
        spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION agn_json_str(v VARIANT)
                     RETURNS STRING RETURN CAST(v AS STRING)""")
    else:
        spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION agn_json_pack(s STRING)
                     RETURNS STRING RETURN s""")
        spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION agn_json_get(v STRING, p STRING)
                     RETURNS STRING RETURN get_json_object(v, p)""")
        spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION agn_json_str(v STRING)
                     RETURNS STRING RETURN v""")
    spark._agn_json_variant = use_variant


def json_variant_mode(spark: SparkSession) -> bool:
    """Whether decoded-JSON columns are stored as VARIANT this session."""
    return getattr(spark, "_agn_json_variant", False)
