"""Count-min sketch — bounded-memory per-key frequency estimation, the
COUNTING twin of the Bloom filter (`operators/bloom.py` answers "seen
before?"; this answers "roughly how many times?"). The training-data
uses: hot-domain / hot-source detection before an exact per-source cap
pass, shingle document-frequency screening at corpus scale, heavy-
hitter detection over any key column — all places where an exact
``groupBy(key).count()`` is a corpus-keyed shuffle whose result is
itself corpus-sized, while the sketch is ``depth × width`` counters
regardless of cardinality.

Guarantee (the classic CMS bound): estimates are NEVER below the true
count — hash collisions only ever ADD to a counter — and with
independent row hashes the overestimate is bounded by ~N/width with
probability 1 - (1/2)^depth. The one-sided direction is what makes it
safe for guard rails: a heavy-hitter can never hide (no false
negatives at a threshold), a light key is occasionally over-flagged.

Counters are exact longs aggregated with map-side-combined SUMs onto
≤ depth × width keys (bounded by knobs, never data — the
`bloom_build` shuffle shape), positions are salted md5 hashes of the
key (`hashing.keyed_h60` — the engine's one hash primitive), so
sketches are deterministic, mergeable by cell-wise addition, and
bit-identical across engines: the gate pair pins real collision
overestimates value-for-value against DuckDB.

NULL keys count under one sentinel bucket (chr(0) — a real key can't
start with NUL in any sane corpus; documented caveat, matching the
flag-don't-drop posture).

Reference: no counterpart (the reference's aggregations are exact);
LLM-data-pipeline mandate, sibling of `analytics.approx_sketches`'
HLL/quantile family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .hashing import keyed_h60, sql_keyed_h60
from .registry import make_registry
from .tables import load_tables

QUERIES, ORACLES, query = make_registry()

_DEFAULT_WIDTH = 8192
_DEFAULT_DEPTH = 4
_NULL_SENTINEL = "\x00"


def _check_params(width: int, depth: int) -> None:
    if width <= 0 or depth <= 0:
        raise ValueError(f"width/depth must be positive, "
                         f"got {width}/{depth}")


def _cms_key(key_col: str) -> Column:
    return F.coalesce(F.col(key_col).cast("string"),
                      F.lit(_NULL_SENTINEL))


def cms_build(df: DataFrame, key_col: str, *,
              width: int = _DEFAULT_WIDTH, depth: int = _DEFAULT_DEPTH,
              weight_col: str | None = None,
              salt: str = "cms:") -> DataFrame:
    """Build the sketch: ``(row int, col int, c long)``, one cell per
    touched counter. Each input row adds its weight (default 1) to one
    counter per sketch row; the shuffle is keyed on ≤ depth × width
    cells with map-side partial sums. Sketches with equal (width,
    depth, salt) merge by cell-wise addition (`cms_merge`)."""
    _check_params(width, depth)
    key = _cms_key(key_col)
    w = (F.col(weight_col).cast("long") if weight_col
         else F.lit(1).cast("long"))
    cells = df.select(F.explode(F.array(*[
        F.struct(F.lit(i).alias("row"),
                 (keyed_h60(f"{salt}{i}:", key) % width)
                 .cast("int").alias("col"))
        for i in range(depth)])).alias("p"), w.alias("__w"))
    return (cells.select("p.row", "p.col", "__w")
            .groupBy("row", "col")
            .agg(F.sum("__w").alias("c")))


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise addition of two sketches built with the same (width,
    depth, salt) — day-1 + day-2 equals one build over both days."""
    return (a.unionByName(b).groupBy("row", "col")
            .agg(F.sum("c").alias("c")))


def cms_counters(sketch: DataFrame, width: int,
                 depth: int) -> list[int]:
    """Densify a sketch to one flat list (index = row·width + col,
    untouched cells 0) — bounded by the knobs, never by data (the
    `bloom_filter_array` contract; repeated cells sum)."""
    arr = [0] * (width * depth)
    for r in sketch.collect():          # ≤ depth × width rows
        if not (0 <= r["row"] < depth and 0 <= r["col"] < width):
            raise ValueError(
                f"sketch cell ({r['row']},{r['col']}) out of range for "
                f"width={width}/depth={depth} — geometry mismatch "
                f"between build and estimate")
        arr[r["row"] * width + r["col"]] += r["c"]
    return arr


def cms_estimate(df: DataFrame, counters: list[int], *,
                 key_col: str, width: int = _DEFAULT_WIDTH,
                 depth: int = _DEFAULT_DEPTH, salt: str = "cms:",
                 out_col: str = "est") -> DataFrame:
    """Scan-local estimate: MIN over the key's depth counters, read
    from the inlined counter literal — zero shuffle, zero join, all
    input columns ride through. ``out_col`` ≥ the key's true total
    weight, always (one-sided — pinned by test_cms.py)."""
    _check_params(width, depth)
    if len(counters) != width * depth:
        raise ValueError(f"counters has {len(counters)} cells, "
                         f"expected width*depth={width * depth}")
    key = _cms_key(key_col)
    lit_arr = F.lit(counters).cast("array<long>")
    reads = [F.get(lit_arr,
                   (F.lit(i * width)
                    + (keyed_h60(f"{salt}{i}:", key) % width)
                    .cast("int")))
             for i in range(depth)]
    est = reads[0] if depth == 1 else F.least(*reads)
    return df.withColumn(out_col, est)


# ---------------------------------------------------------------------------
# Gate query + DuckDB oracle
# ---------------------------------------------------------------------------

_GW, _GD = 16, 3     # gate geometry: 20 sources into 16 columns forces
#                      real collisions — overestimates run under the
#                      value oracle at every SF
_H = sql_keyed_h60("'cms:' || CAST(i.i AS VARCHAR) || ':'", "d.source")


@query("cms_frequency_estimate", oracle=f"""
    WITH pos AS (
        SELECT d.doc_id, d.source, i.i,
               ({_H}) % {_GW} AS col
        FROM documents d,
             (SELECT unnest(generate_series(0, {_GD - 1})) AS i) i),
    cnt AS (
        SELECT i, col, CAST(count(*) AS BIGINT) AS c
        FROM pos GROUP BY i, col),
    est AS (
        SELECT p.doc_id, p.source, MIN(c.c) AS est
        FROM pos p JOIN cnt c ON p.i = c.i AND p.col = c.col
        GROUP BY p.doc_id, p.source),
    exact AS (
        SELECT source, CAST(count(*) AS BIGINT) AS exact_n
        FROM documents GROUP BY source)
    SELECT e.doc_id, e.source, CAST(e.est AS BIGINT) AS est, x.exact_n
    FROM est e JOIN exact x ON e.source IS NOT DISTINCT FROM x.source
""")
def cms_frequency_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate row for the count-min family: build a deliberately tight
    sketch (20 sources into 16 columns × 3 rows) over the documents'
    source column, estimate every document's source frequency through
    the zero-shuffle literal read, and emit it next to the exact
    count — so the value oracle pins the position hashing, counter
    sums, and min-read INCLUDING the collision overestimates, cell for
    cell (est ≥ exact_n on every row is the CMS bound; which rows
    exceed and by how much is hash-determined and must agree across
    engines). Registered PAST the driver's 50-slot window
    (``__spark_entry__._PAST_WINDOW``)."""
    t = load_tables(spark, sf_dir, ("documents",))
    d = t["documents"].select("doc_id", "source")
    sketch = cms_build(d, "source", width=_GW, depth=_GD)
    arr = cms_counters(sketch, _GW, _GD)
    est = cms_estimate(d, arr, key_col="source", width=_GW, depth=_GD)
    exact = d.groupBy("source").agg(F.count("*").alias("exact_n"))
    return (est.join(exact, est["source"].eqNullSafe(exact["source"]))
            .select("doc_id", est["source"].alias("source"),
                    F.col("est").cast("long").alias("est"), "exact_n"))
