"""Embedding-space moment statistics and PCA — the dimensionality
tooling an embedding-heavy pipeline needs beside ANN search: the d×d
covariance of a vector column (drift monitoring, whitening, the input
to every spectral method) and a principal-component projection
(compression before clustering/IVF, anisotropy diagnostics).

Two covariance implementations, one contract:

- ``method="declarative"``: double position-explode → one (i, j)-keyed
  aggregation. Pure Catalyst, engine-parity-exact against the DuckDB
  twin (identical avg-of-products algebra) — the registered gate path.
- ``method="gram"`` (default): per-partition NumPy Gram matrices via
  `mapInPandas` (one b×d BLAS syrk per Arrow batch) folded on the
  driver — the 100 TB path: the shuffle is ≤ one (count, Σx, XᵀX)
  triple per partition (d² + d + 1 doubles, ~32 KB at d=64) instead
  of n·d² exploded rows. The fold is a bounded collect (one row per
  partition), annotated as such. Both methods agree to float
  round-off; pytest pins them within 1e-9 and pins the gram plan free
  of generators.

PCA stays deliberately driver-finished: the d×d eigendecomposition is
O(d³) on 32 KB of state — there is nothing to distribute — while the
projection is a broadcast d×k literal matmul over the corpus
(`pandas_udf`, Arrow-batched), the IVF-assignment pattern.

Reference: no counterpart; LLM-data-pipeline mandate, sibling of
`similarity.py` (which consumes these embeddings for ANN) and
`extended.py`'s int8 quantization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import make_registry
from .tables import load_tables

QUERIES, ORACLES, query = make_registry()


def _as_double(vec_col: str):
    return F.col(vec_col).cast("array<double>")


def embedding_covariance(emb: DataFrame, *, vec_col: str = "embedding",
                         method: str = "gram") -> DataFrame:
    """``(i, j, cov)`` — the d² entries of the population covariance
    matrix of the vector column, ``cov(i,j) = E[xᵢxⱼ] − E[xᵢ]E[xⱼ]``,
    rounded to 6. NULL vectors AND vectors containing a NULL element
    are skipped (a partially-defined vector has no single consistent
    row count: the declarative avg would skip per-COORDINATE while the
    Gram fold would NaN-poison whole rows — the one-contract promise
    requires excluding them identically in both paths; flag upstream
    if partial vectors matter). See the module docstring for the two
    methods' cost shapes."""
    if method not in ("gram", "declarative"):
        raise ValueError(f"method must be 'gram' or 'declarative', "
                         f"got {method!r}")
    rows = emb.where(F.col(vec_col).isNotNull()
                     & ~F.exists(_as_double(vec_col),
                                 lambda x: x.isNull())) \
              .select(_as_double(vec_col).alias("v"))
    if method == "declarative":
        x = rows.select(F.posexplode("v").alias("i", "xi"),
                        F.col("v"))
        pairs = x.select("i", "xi", F.posexplode("v").alias("j", "xj"))
        # + 0.0 normalizes IEEE negative zero (a cov that rounds to
        # zero from below is -0.0 in one engine and 0.0 in the other,
        # which the value hash distinguishes)
        return (pairs.groupBy("i", "j")
                .agg((F.round(F.avg(F.col("xi") * F.col("xj"))
                              - F.avg("xi") * F.avg("xj"), 6)
                      + F.lit(0.0)).alias("cov"))
                .select(F.col("i").cast("int"), F.col("j").cast("int"),
                        "cov"))
    import numpy as np
    import pandas as pd

    def _partials(it):
        # accumulate across the WHOLE partition iterator and yield one
        # row: `it` yields one pandas frame per Arrow batch (~10k rows
        # each), so per-batch yields would grow the driver collect with
        # corpus size instead of partition count (r11 self-review
        # finding #2)
        n, s, g = 0, None, None
        for pdf in it:
            if not len(pdf):
                continue
            m = np.stack(pdf["v"].to_numpy())          # b × d, float64
            n += len(m)
            s = m.sum(axis=0) if s is None else s + m.sum(axis=0)
            gg = m.T @ m
            g = gg if g is None else g + gg
        if n:
            yield pd.DataFrame({"n": [n], "s": [s.tolist()],
                                "g": [g.ravel().tolist()]})
    parts = rows.mapInPandas(
        _partials, "n long, s array<double>, g array<double>").collect()
    # bounded collect: ≤ one (count, Σx, XᵀX) row per partition
    if not parts:
        raise ValueError("no non-null vectors to aggregate")
    import numpy as np
    n = sum(p["n"] for p in parts)
    s = np.sum([p["s"] for p in parts], axis=0)
    g = np.sum([p["g"] for p in parts], axis=0)
    d = len(s)
    cov = (g.reshape(d, d) / n) - np.outer(s / n, s / n)
    spark = emb.sparkSession
    out = [(i, j, float(round(cov[i, j], 6)) + 0.0)
           for i in range(d) for j in range(d)]
    return spark.createDataFrame(out, "i int, j int, cov double")


def pca_components(emb: DataFrame, k: int, *,
                   vec_col: str = "embedding"):
    """Top-``k`` principal components of the vector column as a
    ``(components, eigenvalues)`` NumPy pair — ``components`` is d×k,
    columns ordered by descending eigenvalue, each column's sign fixed
    so its largest-magnitude entry is positive (eigenvectors are
    sign-ambiguous; the fix makes re-runs and engines agree).

    The eigendecomposition runs on the DRIVER over the d×d covariance
    (32 KB at d=64 — nothing to distribute); the corpus contributes
    only through `embedding_covariance`'s bounded Gram fold."""
    import numpy as np
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    cov_rows = embedding_covariance(emb, vec_col=vec_col,
                                    method="gram").collect()
    d = max(r["i"] for r in cov_rows) + 1
    if k > d:
        raise ValueError(f"k={k} exceeds embedding dim {d}")
    cov = np.zeros((d, d))
    for r in cov_rows:
        cov[r["i"], r["j"]] = r["cov"]
    vals, vecs = np.linalg.eigh(cov)        # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order]
    for c in range(comps.shape[1]):
        if comps[np.abs(comps[:, c]).argmax(), c] < 0:
            comps[:, c] = -comps[:, c]
    return comps, vals[order]


def pca_project(emb: DataFrame, components, *,
                vec_col: str = "embedding",
                id_col: str = "vec_id",
                out_col: str = "proj") -> DataFrame:
    """Project each vector onto the component columns: ``(id, proj)``
    with ``proj`` a length-k double array. The d×k matrix rides the
    UDF closure as a broadcast literal; projection is one Arrow-batched
    matmul per batch (the IVF-assignment pattern) — zero shuffle."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    comp = np.asarray(components, dtype=np.float64)

    # no type annotations: `from __future__ import annotations` turns
    # them into strings, which pandas_udf's signature inference rejects
    @pandas_udf("array<double>")
    def _proj(vs):
        m = np.stack(vs.to_numpy())                 # b × d
        return pd.Series(list(m @ comp))            # b × k
    return (emb.where(F.col(vec_col).isNotNull())
            .select(F.col(id_col),
                    _proj(_as_double(vec_col)).alias(out_col)))


@query("emb_covariance_matrix", oracle="""
    WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings
               WHERE embedding IS NOT NULL
                 AND len(list_filter(CAST(embedding AS DOUBLE[]),
                                     x -> x IS NULL)) = 0),
    x AS (SELECT v,
                 unnest(list_transform(
                     generate_series(0, len(v) - 1),
                     k -> {'i': k, 'xi': v[k + 1]})) AS s
          FROM e),
    pairs AS (SELECT s.i AS i, s.xi AS xi,
                     unnest(list_transform(
                         generate_series(0, len(v) - 1),
                         k -> {'j': k, 'xj': v[k + 1]})) AS t
              FROM x)
    SELECT CAST(i AS INT) AS i, CAST(t.j AS INT) AS j,
           round(avg(xi * t.xj) - avg(xi) * avg(t.xj), 6) + 0.0 AS cov
    FROM pairs GROUP BY i, t.j
""")
def emb_covariance_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate form of `embedding_covariance` over the embeddings table —
    the DECLARATIVE path (identical avg-of-products algebra in both
    engines; the gram path's per-partition summation order varies with
    partitioning, so it is pinned against this one by pytest instead
    of by the cross-engine hash). Registered past the 50-slot gate
    window (``__spark_entry__._PAST_WINDOW``)."""
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    return embedding_covariance(emb, method="declarative")
