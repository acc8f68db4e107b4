"""HyperLogLog distinct-count sketch — the CANONICAL cardinality
estimator (Flajolet et al. 2007), built here value-pinnably: Spark's
native ``approx_count_distinct`` IS HLL++ but its registers are
opaque (`analytics.approx_sketches` uses it, rows-only checked;
`kmv.py` exists because of that gap). This module builds the
registers as plain rows from the repo's one cross-engine hash, so
the sketch, its merge, and the estimate are value-identical across
Spark and DuckDB — the gate pins the REGISTER SUM, not just the
estimate.

Construction from the 60-bit salted hash (`hashing.keyed_h60`): the
top ``p`` bits pick the register, the remaining ``60-p`` bits feed
the rank ``rho = (60-p) - msb_len(rem) + 1`` (``rem = 0`` → the
maximal rank ``60-p+1``), where ``msb_len`` is ``length(bin(rem))``
— both engines print minimal binary ('101'; bin(0) = '0' is guarded
explicitly). A register's value is ``max(rho)`` over its keys, so
two sketches over the same (p, salt) merge by per-register max —
bit-exactly the sketch of the union, which the gate pins by building
its sketch as a two-half merge while the oracle builds one-shot.

Estimator: the indicator sum ``S = Σ_j 2^(-rho_j)`` is carried as
the EXACT integer ``S_int = Σ_j 2^(maxrank - rho_j)`` (empty
registers contribute ``2^maxrank``; ≤ m·2^52 < 2^63 at p = 9), so
both engines divide the same integer; ``raw = alpha_m · m² / S``
with ``alpha_m = 0.7213 / (1 + 1.079/m)``, and the small-range
branch (raw ≤ 2.5 m with empty registers) is linear counting
``m · ln(m / zeros)``. The 2^32 upper-range correction of the paper
is unnecessary under a 60-bit hash (collisions dominate only near
2^60). NULL keys hash under the chr(0) sentinel (the kmv/cms/bloom
convention; flag-don't-drop).

Scale (100 TB): the build is one map-side-combinable ``groupBy
bucket → max(rho)`` onto ≤ m rows — the shuffle carries registers,
never keys; merge is the same aggregation over concatenated register
frames; the estimate reads one ≤ m-row frame. Versus `kmv`: KMV
ships k exact hash values (k · 8 bytes, exact under-full), HLL ships
m byte-sized ranks (fixed error ~1.04/√m at any cardinality) — the
standard trade, now both available and both oracle-pinned.

Reference: no counterpart (the reference's distinct counts are
exact); LLM-data-pipeline mandate, completing the sketch family
bloom (membership) / cms (frequency) / kmv + hll (cardinality).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .hashing import keyed_h60, sql_keyed_h60
from .registry import make_registry
from .tables import load_tables

QUERIES, ORACLES, query = make_registry()

_DEFAULT_P = 9                  # 512 registers, ~4.6% std error
_NULL_SENTINEL = "\x00"
_HASH_BITS = 60


def _check_p(p: int) -> None:
    # p <= 20 keeps S_int = m·2^maxrank inside a signed long with slack
    if not 4 <= p <= 20:
        raise ValueError(f"p must be in [4, 20], got {p}")


def _hll_key(key_col: str) -> Column:
    return F.coalesce(F.col(key_col).cast("string"),
                      F.lit(_NULL_SENTINEL))


def hll_build(df: DataFrame, key_col: str, *, p: int = _DEFAULT_P,
              salt: str = "hll:") -> DataFrame:
    """Build the sketch: ``(bucket long, rho int)`` — one row per
    NON-EMPTY register (≤ 2^p rows), ``rho`` the register's max rank.
    Map-side combinable; the shuffle carries registers, not keys."""
    _check_p(p)
    rem_bits = _HASH_BITS - p
    h = keyed_h60(salt, _hll_key(key_col))
    rows = df.select(
        F.call_function("div", h, F.lit(1 << rem_bits)).alias("bucket"),
        (h % F.lit(1 << rem_bits)).alias("rem"))
    rho = F.when(F.col("rem") == 0, F.lit(rem_bits + 1)) \
           .otherwise(F.lit(rem_bits + 1) - F.length(F.bin("rem")))
    return (rows.select("bucket", rho.cast("int").alias("rho"))
            .groupBy("bucket").agg(F.max("rho").alias("rho")))


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Per-register max over sketches built with the same (p, salt) —
    bit-exactly the sketch of the concatenated inputs."""
    if not sketches:
        raise ValueError("hll_merge needs at least one sketch")
    return (reduce(DataFrame.unionByName, sketches)
            .groupBy("bucket").agg(F.max("rho").alias("rho")))


def hll_estimate(sketch: DataFrame, *, p: int = _DEFAULT_P) -> DataFrame:
    """One row ``(n_registers, zeros, s_int, raw_est, est)``: the
    exact scaled indicator sum, the raw HLL estimate, and the
    small-range-corrected estimate (6-dp rounded — the only float
    step is the final division / single ln)."""
    _check_p(p)
    m = 1 << p
    rem_bits = _HASH_BITS - p
    maxrank = rem_bits + 1
    agg = sketch.agg(
        F.count("*").cast("long").alias("__present"),
        F.coalesce(
            F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), "
                         f"{maxrank} - rho)")),
            F.lit(0)).cast("long").alias("__s_present"))
    zeros = F.lit(m) - F.col("__present")
    s_int = F.col("__s_present") + zeros * F.lit(1 << maxrank)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    # raw = alpha·m²/S, S = s_int / 2^maxrank — one double division
    raw = (F.lit(alpha) * F.lit(float(m)) * F.lit(float(m))
           * F.lit(float(1 << maxrank)) / s_int.cast("double"))
    lin = F.lit(float(m)) * F.log(F.lit(float(m))
                                  / zeros.cast("double"))
    est = F.when((raw <= F.lit(2.5 * m)) & (zeros > 0), lin) \
           .otherwise(raw)
    return agg.select(
        F.lit(m).cast("long").alias("n_registers"),
        zeros.cast("long").alias("zeros"),
        s_int.alias("s_int"),
        F.round(raw, 6).alias("raw_est"),
        F.round(est, 6).alias("est"))


def hll_group_build(df: DataFrame, group_cols: list[str],
                    key_col: str, *, p: int = _DEFAULT_P,
                    salt: str = "hll:") -> DataFrame:
    """Per-group register frame ``(*group_cols, bucket, rho)`` — one
    HLL register set per group (the `kmv_group_build` counterpart,
    but with FIXED ≤ 2^p state per group by construction, so no
    cutoff pruning is needed: the groupBy lands on (group × register)
    cells, map-side combinable, never on keys). Frames over the same
    (p, salt) merge with `hll_group_merge` — per-register max, so a
    day-N incremental store of these cells is exactly the one-shot
    build (the mergeability exact countDistinct lacks)."""
    _check_p(p)
    clash = {"bucket", "rem", "rho"} & set(group_cols)
    if clash:
        raise ValueError(f"group_cols may not use the reserved "
                         f"register-column names {sorted(clash)}")
    rem_bits = _HASH_BITS - p
    maxrank = rem_bits + 1
    h = keyed_h60(salt, _hll_key(key_col))
    rows = df.select(
        *group_cols,
        F.call_function("div", h, F.lit(1 << rem_bits)).alias("bucket"),
        (h % F.lit(1 << rem_bits)).alias("rem"))
    rho = F.when(F.col("rem") == 0, F.lit(maxrank)) \
           .otherwise(F.lit(maxrank) - F.length(F.bin("rem")))
    return (rows.select(*group_cols, "bucket",
                        rho.cast("int").alias("rho"))
            .groupBy(*group_cols, "bucket")
            .agg(F.max("rho").alias("rho")))


def hll_group_merge(*regs: DataFrame,
                    group_cols: list[str]) -> DataFrame:
    """Per-(group, register) max over register frames built with the
    same (p, salt) — bit-exactly the frame of the concatenated
    inputs."""
    if not regs:
        raise ValueError("hll_group_merge needs at least one frame")
    return (reduce(DataFrame.unionByName, regs)
            .groupBy(*group_cols, "bucket")
            .agg(F.max("rho").alias("rho")))


def hll_group_estimate_regs(regs: DataFrame, group_cols: list[str],
                            *, p: int = _DEFAULT_P) -> DataFrame:
    """Per-group ``(*group_cols, zeros, s_int, est)`` from a register
    frame — the `hll_estimate` algebra applied groupwise."""
    _check_p(p)
    m = 1 << p
    maxrank = (_HASH_BITS - p) + 1
    agg = regs.groupBy(*group_cols).agg(
        F.count("*").cast("long").alias("__present"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {maxrank} - rho)"))
        .cast("long").alias("__s_present"))
    zeros = F.lit(m) - F.col("__present")
    s_int = F.col("__s_present") + zeros * F.lit(1 << maxrank)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = (F.lit(alpha) * F.lit(float(m)) * F.lit(float(m))
           * F.lit(float(1 << maxrank)) / s_int.cast("double"))
    lin = F.lit(float(m)) * F.log(F.lit(float(m))
                                  / zeros.cast("double"))
    est = F.when((raw <= F.lit(2.5 * m)) & (zeros > 0), lin) \
           .otherwise(raw)
    return agg.select(*group_cols, zeros.cast("long").alias("zeros"),
                      s_int.alias("s_int"),
                      F.round(est, 6).alias("est"))


def hll_group_estimate(df: DataFrame, group_col: str, key_col: str, *,
                       p: int = _DEFAULT_P,
                       salt: str = "hll:") -> DataFrame:
    """Single-group-column convenience: ``(grp, zeros, s_int, est)``
    — build + estimate in one call under the ``grp`` output name."""
    base = df.select(F.col(group_col).alias("grp"),
                     F.col(key_col).alias("__k"))
    regs = hll_group_build(base, ["grp"], "__k", p=p, salt=salt)
    return hll_group_estimate_regs(regs, ["grp"], p=p)


# ---------------------------------------------------------------------------
# Gate query + DuckDB oracle
# ---------------------------------------------------------------------------

_GATE_P = _DEFAULT_P
_GATE_SALT = "hll:"


def _sql_hll() -> str:
    m = 1 << _GATE_P
    rem_bits = _HASH_BITS - _GATE_P
    maxrank = rem_bits + 1
    key = f"coalesce(CAST(l_orderkey AS VARCHAR), chr(0))"
    h = sql_keyed_h60(f"'{_GATE_SALT}'", key)
    alpha = f"(0.7213 / (1.0 + 1.079 / {m}))"
    return f"""
    WITH hashed AS (SELECT {h} AS h FROM lineitem),
    rows_ AS (SELECT h // {1 << rem_bits} AS bucket,
                     h % {1 << rem_bits} AS rem
              FROM hashed),
    regs AS (SELECT bucket,
                    max(CASE WHEN rem = 0 THEN {maxrank}
                        ELSE {maxrank} - length(bin(rem)) END) AS rho
             FROM rows_ GROUP BY bucket),
    agg AS (SELECT CAST(count(*) AS BIGINT) AS present,
                   CAST(coalesce(sum(1::BIGINT << ({maxrank} - rho)),
                                 0) AS BIGINT) AS s_present
            FROM regs),
    est AS (SELECT present, s_present,
                   {m} - present AS zeros,
                   s_present + ({m} - present)
                       * {1 << maxrank} AS s_int
            FROM agg),
    fin AS (SELECT zeros, s_int,
                   {alpha} * {float(m)!r} * {float(m)!r}
                       * {float(1 << maxrank)!r}
                       / CAST(s_int AS DOUBLE) AS raw,
                   CAST({float(m)!r} * ln({float(m)!r}
                       / CAST(zeros AS DOUBLE)) AS DOUBLE) AS lin
            FROM est)
    SELECT (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT)
            FROM lineitem) AS n_exact,
           CAST({m} AS BIGINT) AS n_registers,
           CAST(zeros AS BIGINT) AS zeros,
           CAST(s_int AS BIGINT) AS s_int,
           round(raw, 6) AS raw_est,
           round(CASE WHEN raw <= {2.5 * m} AND zeros > 0
                      THEN lin ELSE raw END, 6) AS est
    FROM fin
    """


@query("hll_distinct_estimate", oracle=_sql_hll())
def hll_distinct_estimate(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """Gate row for the HLL sketch: distinct ``l_orderkey`` over
    lineitem at p = 9, the Spark side built as a TWO-HALF MERGE
    (rows split on l_linenumber parity, per-register max) while the
    oracle builds one-shot — merge-equals-one-shot is the pinned
    property, plus the exact register indicator sum ``s_int``, both
    estimates, and the exact distinct count alongside. Registered
    PAST the driver's 50-slot window."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"] \
        .select("l_orderkey", "l_linenumber")
    half_a = li.filter(F.col("l_linenumber") % 2 == 0)
    half_b = li.filter(F.col("l_linenumber") % 2 == 1)
    merged = hll_merge(
        hll_build(half_a, "l_orderkey", p=_GATE_P, salt=_GATE_SALT),
        hll_build(half_b, "l_orderkey", p=_GATE_P, salt=_GATE_SALT))
    exact = li.agg(F.countDistinct("l_orderkey").cast("long")
                   .alias("n_exact"))
    return (F.broadcast(exact)
            .crossJoin(hll_estimate(merged, p=_GATE_P)))


def _sql_hll_group() -> str:
    m = 1 << _GATE_P
    rem_bits = _HASH_BITS - _GATE_P
    maxrank = rem_bits + 1
    key = "coalesce(CAST(l_orderkey AS VARCHAR), chr(0))"
    h = sql_keyed_h60(f"'{_GATE_SALT}'", key)
    alpha = f"(0.7213 / (1.0 + 1.079 / {m}))"
    return f"""
    WITH hashed AS (SELECT l_returnflag AS grp, {h} AS h
                FROM lineitem),
    rows_ AS (SELECT grp,
                     h // {1 << rem_bits} AS bucket,
                     h % {1 << rem_bits} AS rem
              FROM hashed),
    regs AS (SELECT grp, bucket,
                    max(CASE WHEN rem = 0 THEN {maxrank}
                        ELSE {maxrank} - length(bin(rem)) END) AS rho
             FROM rows_ GROUP BY grp, bucket),
    agg AS (SELECT grp, CAST(count(*) AS BIGINT) AS present,
                   CAST(sum(1::BIGINT << ({maxrank} - rho))
                        AS BIGINT) AS s_present
            FROM regs GROUP BY grp),
    est AS (SELECT grp, {m} - present AS zeros,
                   s_present + ({m} - present)
                       * {1 << maxrank} AS s_int
            FROM agg),
    fin AS (SELECT grp, zeros, s_int,
                   {alpha} * {float(m)!r} * {float(m)!r}
                       * {float(1 << maxrank)!r}
                       / CAST(s_int AS DOUBLE) AS raw,
                   CAST({float(m)!r} * ln({float(m)!r}
                       / CAST(zeros AS DOUBLE)) AS DOUBLE) AS lin
            FROM est)
    SELECT grp, CAST(zeros AS BIGINT) AS zeros,
           CAST(s_int AS BIGINT) AS s_int,
           round(CASE WHEN raw <= {2.5 * m} AND zeros > 0
                      THEN lin ELSE raw END, 6) AS est
    FROM fin
    """


@query("hll_group_distinct", oracle=_sql_hll_group())
def hll_group_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate row for the per-group HLL: distinct orders per return
    flag over lineitem — the three flags see genuinely different
    order subsets (every part and supplier appears under every flag,
    which would make the sketches identical and pin nothing), so
    register sums, zeros, and estimates all separate per group and
    pin the grouped algebra (the main gate row pins the global
    raw-estimator + merge path). Registered PAST the driver's
    50-slot window."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"] \
        .select("l_returnflag", "l_orderkey")
    return hll_group_estimate(li, "l_returnflag", "l_orderkey",
                              p=_GATE_P, salt=_GATE_SALT)
