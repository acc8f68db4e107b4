"""PageRank in exact integer arithmetic — the link-analysis sibling
of `dedup.py`'s connected components (cluster structure) and
`kmeans.py`'s Lloyd trainer (iterative refinement): importance
scores over a directed graph, used on training corpora for
citation/link-weighted document sampling and on blockchain data for
address-importance over transfer graphs.

Determinism is the design: ranks are fixed-point longs at ``scale``
(default 10¹²), the damping factor is the RATIONAL 17/20 (= 0.85
exactly), and every per-iteration step — contribution splitting
(``rank div outdeg``), damping (``17·x div 20``), the teleport term
(``3·scale div (20·N)``), the dangling-mass share (``dang div N``) —
is integer division of non-negative longs, identical on both engines
(Spark ``div`` truncates toward zero, DuckDB ``//`` floors; equal on
non-negatives). No float is ever summed, so partition order cannot
move a value and the gate pins every node's rank BIT-EXACTLY.
Truncation dust (≤ 1/scale per divide) is the documented price; at
scale = 10¹² it is far below any ranking decision.

Update rule per iteration (the standard dangling-aware form):

    r'(v) = 3·scale div (20·N)
          + 17 · ( Σ_{(u,v)∈E} r(u) div outdeg(u)
                   + (Σ_{dangling u} r(u)) div N ) div 20

Scale (100 TB): each iteration is one ranks⋈edges equi-join on src
(ranks is a |V|-row summary; edges shuffle on their natural key) and
one map-side-combinable sum onto dst; the dangling term is a 1-row
aggregate crossJoined back (broadcast); N rides a 1-row frame — no
driver collect anywhere. Iteration count is a knob (fixed here, as
in `kmeans.py` — convergence testing would need a driver-side loop,
which callers own).

Reference: no counterpart; LLM-data-pipeline mandate (link-based
document weighting), graph sibling of dedup.py's components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import make_registry
from .tables import load_tables

QUERIES, ORACLES, query = make_registry()

_SCALE = 10 ** 12
_D_NUM, _D_DEN = 17, 20          # damping 0.85, exact


def _div(a, b):
    return F.call_function("div", a, b)


def pagerank(edges: DataFrame, *, iters: int = 2,
             scale: int = _SCALE,
             src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """``(node, rank_int, rank)`` over the DISTINCT (src, dst) edge
    set — ``rank_int`` the exact fixed-point rank after ``iters``
    rounds from the uniform start, ``rank`` its double read
    (rank_int / scale, 12-dp). Multi-edges collapse (simple-graph
    semantics); self-loops count as ordinary edges."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if scale < 10 ** 6:
        raise ValueError(f"scale must be >= 1e6 (truncation dust), "
                         f"got {scale}")
    # Deliberately NOT cached: iteration k's ranks frame is referenced
    # by iteration k+1 through shared shuffle subtrees Spark's exchange
    # reuse serves from shuffle files — measured at sf0.1 in one
    # harness, adding scoped caches on edges/outdeg/per-iteration ranks
    # read 10.2 s vs 5.3 s WITHOUT them (columnar cache encode + broken
    # ReusedExchange). The per-iteration work is instead kept to ONE
    # equi-join: out-degree rides ON the ranks frame (deg, NULL for
    # dangling nodes), so the contribution pass is e ⋈ ranks and the
    # dangling mass is a filter + 1-row aggregate, not an anti-join.
    e = (edges.select(F.col(src_col).alias("src"),
                      F.col(dst_col).alias("dst"))
         .distinct())
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct())
    outdeg = e.groupBy("src").agg(F.count("*").alias("deg"))
    n1 = nodes.agg(F.count("*").cast("long").alias("__n"))
    base = (nodes.join(outdeg, nodes["node"] == outdeg["src"], "left")
            .select("node", "deg")
            .crossJoin(F.broadcast(n1)))
    ranks = base.withColumn("r", _div(F.lit(scale), F.col("__n")))
    teleport = _div(F.lit(_D_DEN - _D_NUM) * F.lit(scale),
                    F.lit(_D_DEN) * F.col("__n"))
    for _ in range(iters):
        contrib = (e.join(ranks.select(F.col("node").alias("src"),
                                       _div(F.col("r"), F.col("deg"))
                                       .alias("c")),
                          "src")
                   .groupBy("dst").agg(F.sum("c").alias("inflow")))
        dang = (ranks.where(F.col("deg").isNull())
                .agg(F.coalesce(F.sum("r"), F.lit(0)).cast("long")
                     .alias("__dang")))
        ranks = (base.join(contrib,
                           F.col("node") == F.col("dst"), "left")
                 .crossJoin(F.broadcast(dang))
                 .select("node", "deg", "__n",
                         (teleport
                          + _div(F.lit(_D_NUM)
                                 * (F.coalesce(F.col("inflow"),
                                               F.lit(0))
                                    + _div(F.col("__dang"),
                                           F.col("__n"))),
                                 F.lit(_D_DEN))).alias("r")))
    return ranks.select(
        "node", F.col("r").alias("rank_int"),
        F.round(F.col("r").cast("double") / F.lit(float(scale)), 12)
        .alias("rank"))


# ---------------------------------------------------------------------------
# Gate query + DuckDB oracle (2 iterations unrolled)
# ---------------------------------------------------------------------------

_GATE_ITERS = 2


def _sql_pagerank() -> str:
    s, dn, dd = _SCALE, _D_NUM, _D_DEN
    tele = f"(({dd - dn} * {s}) // ({dd} * (SELECT n FROM n)))"

    def step(prev: str, idx: int) -> str:
        return f"""
    c{idx} AS (SELECT e.dst,
                      sum({prev}.r // o.deg) AS inflow
               FROM edges e
               JOIN {prev} ON e.src = {prev}.node
               JOIN outdeg o ON e.src = o.src
               GROUP BY e.dst),
    d{idx} AS (SELECT coalesce(sum(r), 0) AS dang
               FROM {prev} LEFT JOIN outdeg o ON {prev}.node = o.src
               WHERE o.src IS NULL),
    r{idx} AS (SELECT nodes.node,
                      {tele}
                      + ({dn} * (coalesce(c{idx}.inflow, 0)
                                 + (SELECT dang FROM d{idx})
                                   // (SELECT n FROM n))) // {dd} AS r
               FROM nodes LEFT JOIN c{idx}
                 ON nodes.node = c{idx}.dst)"""

    steps = ",".join(step(f"r{i - 1}" if i > 1 else "r0", i)
                     for i in range(1, _GATE_ITERS + 1))
    last = f"r{_GATE_ITERS}"
    return f"""
    WITH edges AS (SELECT DISTINCT 's:' || l_suppkey AS src,
                                   'p:' || l_partkey AS dst
                   FROM lineitem),
    nodes AS (SELECT src AS node FROM edges
              UNION SELECT dst FROM edges),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
    outdeg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg
               FROM edges GROUP BY src),
    r0 AS (SELECT node, {s} // (SELECT n FROM n) AS r FROM nodes),
    {steps}
    SELECT node, CAST(r AS BIGINT) AS rank_int,
           round(CAST(r AS DOUBLE) / {float(s)!r}, 12) AS rank
    FROM {last}
    """


@query("pagerank_supplier_part", oracle=_sql_pagerank())
def pagerank_supplier_part(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """Gate row for exact-arithmetic PageRank: 2 iterations over the
    supplier → part bipartite graph from lineitem (parts are all
    dangling — the dangling-mass redistribution is exercised on
    every node, every iteration); every node's fixed-point rank
    pinned BIT-EXACTLY against DuckDB running the identical unrolled
    integer algebra. Registered PAST the driver's 50-slot window."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    # run the iterations on LONG node keys (suppkey·2 / partkey·2+1 —
    # injective, so the graph is isomorphic and every integer rank is
    # bit-identical) and render the "s:"/"p:" names once at the end:
    # every distinct/union/join/groupBy in the loop then shuffles
    # 8-byte longs instead of ~10-char strings (r11; the oracle keeps
    # the string form — the VALUES are what is pinned)
    edges = li.select(
        (F.col("l_suppkey").cast("long") * 2).alias("src"),
        (F.col("l_partkey").cast("long") * 2 + 1).alias("dst"))
    pr = pagerank(edges, iters=_GATE_ITERS)
    node = F.when(F.col("node") % 2 == 0,
                  F.concat(F.lit("s:"),
                           F.shiftright(F.col("node"), 1))) \
            .otherwise(F.concat(F.lit("p:"),
                                F.shiftright(F.col("node"), 1)))
    return pr.select(node.alias("node"), "rank_int", "rank")
