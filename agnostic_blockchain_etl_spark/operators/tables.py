"""Testdata table loading + view registration.

Reads the driver-provided parquet tables (TESTDATA.md) and registers them as
temp views so both DataFrame code and ``spark.sql`` can address them. Reads
are lazy scans — Catalyst prunes columns and pushes filters into the parquet
reader, so loading "all tables" costs only footer reads.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def avg_units(sum_dec: Column, count: Column, scale: int) -> Column:
    """Cross-engine-exact rounded average: half-up integer arithmetic.

    ``round(sum_double / count, scale)`` is not portable — when the true
    quotient terminates exactly at ``scale+1`` digits ending in 5 (a tie,
    ~1/(2·count) of groups), Spark and DuckDB round the nearest-double
    differently. ``(2s + c) div (2c)`` over the exactly-scaled integer sum
    is the same integer on every engine, and the final division by
    ``10^scale`` is one identical IEEE op. DuckDB twin:
    ``((2 * CAST(sum(dec) * 10^scale AS BIGINT) + count(*)) //
    (2 * count(*))) / 10^scale.0``.

    Exact while the scaled sum fits a signed 64-bit int (~9e18 — at
    DECIMAL(18,4) money scale that is ~900 T currency units per group)."""
    s = (sum_dec * (10 ** scale)).cast("long")
    return F.call_function("div", 2 * s + count, 2 * count) / float(10 ** scale)


# Schema-drift guard. The round-2 testdata regeneration silently flipped
# events.ts from TIMESTAMP(NANOS)/nanos-long to timestamp[us], which cost
# the round 5 correctness rows and the whole bench to late AnalysisExceptions.
# Checking dtypes at load time turns the next drift into one early, named
# error. Sets are ALLOWED alternatives: integer widths are interchangeable
# to every query (all cast), and time-typed columns legitimately arrive as
# nanos-longs (legacy nanosAsLong), timestamp, timestamp_ntz, or date.
_INTISH = {"tinyint", "smallint", "int", "bigint"}
_TIMEISH = {"bigint", "timestamp", "timestamp_ntz", "date"}
_STR = {"string"}
# decimal is ALLOWED and normalized to double at load (see
# _normalize_decimals): TPC-H-style generators flip money columns
# between double and DECIMAL(p,2) across versions; 2dp decimals at
# these magnitudes are exactly representable as doubles, and every
# exact-arithmetic query re-casts to DECIMAL explicitly anyway — so
# adapting the reader preserves all 50 oracle pairs under the flip
# (verified against a synthetic decimal-cast testdata copy).
_DBL = {"double", "float"} | {f"decimal({p},2)" for p in range(3, 39)}
_EXPECTED: dict[str, dict[str, set]] = {
    "region": {"r_regionkey": _INTISH, "r_name": _STR},
    "nation": {"n_nationkey": _INTISH, "n_name": _STR,
               "n_regionkey": _INTISH},
    "customer": {"c_custkey": _INTISH, "c_name": _STR,
                 "c_nationkey": _INTISH, "c_acctbal": _DBL,
                 "c_mktsegment": _STR},
    "supplier": {"s_suppkey": _INTISH, "s_name": _STR,
                 "s_nationkey": _INTISH, "s_acctbal": _DBL},
    "part": {"p_partkey": _INTISH, "p_name": _STR, "p_brand": _STR,
             "p_type": _STR, "p_size": _INTISH, "p_retailprice": _DBL},
    "orders": {"o_orderkey": _INTISH, "o_custkey": _INTISH,
               "o_orderstatus": _STR, "o_totalprice": _DBL,
               "o_orderdate": _TIMEISH, "o_orderpriority": _STR},
    "lineitem": {"l_orderkey": _INTISH, "l_partkey": _INTISH,
                 "l_suppkey": _INTISH, "l_linenumber": _INTISH,
                 "l_quantity": _DBL, "l_extendedprice": _DBL,
                 "l_discount": _DBL, "l_tax": _DBL, "l_returnflag": _STR,
                 "l_linestatus": _STR, "l_shipdate": _TIMEISH},
    "events": {"event_id": _INTISH, "ts": _TIMEISH, "user_id": _INTISH,
               "event_type": _STR, "value": _DBL, "props": _STR},
    "documents": {"doc_id": _INTISH, "text": _STR, "lang": _STR,
                  "source": _STR, "n_chars": _INTISH},
    "embeddings": {"vec_id": _INTISH,
                   "embedding": {"array<float>", "array<double>"},
                   "label": _INTISH},
}


def check_schema(name: str, df: DataFrame) -> None:
    """Raise one clear message naming the drifted column (extra columns are
    fine — queries select by name)."""
    expected = _EXPECTED.get(name)
    if expected is None:
        return
    actual = dict(df.dtypes)
    for col, allowed in expected.items():
        got = actual.get(col)
        if got is None:
            raise ValueError(
                f"testdata schema drift: table {name!r} is missing expected "
                f"column {col!r}; actual columns: {sorted(actual)}")
        if got not in allowed:
            raise ValueError(
                f"testdata schema drift: {name}.{col} reads as {got!r}, "
                f"expected one of {sorted(allowed)}. The parquet physical "
                "type changed between testdata generations — adapt the "
                "reader (see events_us) rather than letting queries fail "
                "downstream with opaque AnalysisExceptions.")


def events_us(events: DataFrame) -> DataFrame:
    """``events`` with ``ts`` rewritten to epoch-microsecond BIGINT,
    adapting to whatever physical type the parquet carries.

    The driver has shipped ``events.ts`` as TIMESTAMP(NANOS) (read as a
    nanosecond long under ``nanosAsLong``) and as ``timestamp[us]`` (read
    as TIMESTAMP_NTZ) across testdata regenerations; both must produce the
    exact micros DuckDB's ``epoch_us(ts)`` yields. The NTZ branch uses
    ``timestampdiff`` against an NTZ epoch literal — pure wall-clock
    arithmetic, identical under any ``spark.sql.session.timeZone``
    (``cast(ts as timestamp)`` + ``unix_micros`` would shift by the
    session offset on non-UTC drivers)."""
    dt = dict(events.dtypes)["ts"]
    if dt == "bigint":            # legacy TIMESTAMP(NANOS) as nanos-longs
        expr = "ts div 1000"
    elif dt == "timestamp_ntz":   # timestamp[us], isAdjustedToUTC=false
        expr = ("timestampdiff(MICROSECOND, "
                "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    elif dt == "timestamp":       # instant-typed: unix_micros is exact
        expr = "unix_micros(ts)"
    else:
        raise TypeError(
            f"events.ts has unsupported type {dt!r}; expected bigint "
            "(nanosAsLong), timestamp_ntz, or timestamp")
    return events.withColumn("ts", F.expr(expr))


def spread(df: DataFrame, *cols: str) -> DataFrame:
    """Heal a pathologically under-split scan before CPU-heavy per-row
    work (tokenize → shingle → hash pipelines).

    A parquet file with ONE row group scans as ONE task no matter what
    ``spark.sql.files.maxPartitionBytes`` says — row groups are the
    split atom — so everything Catalyst fuses onto that scan runs on a
    single core (measured 2.5× on the sf0.1 shingle scan, 1 of 32 cores
    busy). Repartition to the session's default parallelism when the
    source plans fewer than half that many partitions; the shuffled
    payload is the raw text column, far smaller than the exploded gram
    stream any of these pipelines produce. At production scale writers
    emit many row groups per file and this is a NO-OP — the guard keeps
    the healing shuffle out of every properly-split plan.

    ``cols``: optional hash-partitioning keys for the healing shuffle.
    When the downstream pipeline's first shuffle boundary is keyed by a
    column that is already unique-per-group at the INPUT grain (a
    per-document window or a ``groupBy(doc_id, …)`` over exploded
    grams), hashing the healing repartition by that key makes the
    exchange do double duty: every row of a group lands together, so
    Catalyst's EnsureRequirements drops the downstream exchange
    entirely (HashPartitioning on a subset of the clustering keys
    satisfies the distribution, and Project/Generate are alias-aware /
    partitioning-preserving). The round-robin form stays the default —
    keying is only a win when a consumer is actually clustered by it.
    NULL-key caveat (r11 advice): hashpartitioning sends every
    NULL-key row to one partition, so a null-heavy key would make the
    healing shuffle itself skewed where round-robin would not — key
    only by columns that are non-null by construction (the callers all
    key by ``doc_id``, a parquet primary key here).

    Streaming frames pass through untouched: ``.rdd`` is illegal on an
    unstarted stream, and micro-batch parallelism is the source's
    concern (maxOffsetsPerTrigger etc.), not a static scan property."""
    if df.isStreaming:
        return df
    cores = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() * 2 <= cores:
        return df.repartition(cores, *cols) if cols else df.repartition(cores)
    return df


def epoch_day(us_col: str = "ts") -> Column:
    """Calendar day of an epoch-µs BIGINT column, timezone-independently
    (valid for non-negative epochs; DuckDB twin: ``CAST(ts AS DATE)`` on
    the naive timestamp)."""
    return F.date_add(F.lit("1970-01-01").cast("date"),
                      (F.col(us_col) / 86_400_000_000).cast("int"))


def load_tables(spark: SparkSession, sf_dir: str,
                names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    """Register ``{sf_dir}/{name}.parquet`` as temp views; return the dfs."""
    try:
        # events.parquet carries TIMESTAMP(NANOS); without this flag the scan
        # fails on schema inference (session-settable in Spark 4)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    # the driver may call queries() on a fresh session without entry() —
    # make every query self-sufficient (idempotent, no-op after first call)
    from ..functions.registry import register_all
    register_all(spark)
    out: dict[str, DataFrame] = {}
    for name in names:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        check_schema(name, df)
        df = _normalize_decimals(df)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def _normalize_decimals(df: DataFrame) -> DataFrame:
    """Cast decimal-typed columns to double so the operator library sees
    ONE numeric dtype whichever way the generator emitted money columns
    (see the _DBL note). Lossless for the allowed (p,2) scales at data
    magnitudes; queries needing exact arithmetic re-cast to DECIMAL."""
    dec = [name for name, dtype in df.dtypes
           if dtype.startswith("decimal(")]
    for name in dec:
        df = df.withColumn(name, F.col(name).cast("double"))
    return df
