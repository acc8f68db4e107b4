"""Generate a larger synthetic corpus for scale probing BEYOND the driver
testdata (default: sf1 = 10× sf0.1's documents/embeddings).

Replication preserves workload shape instead of inflating it:

- documents: each replica r suffixes every word with ``_r{r}`` and offsets
  doc_id by r*1_000_000 — replicas are NOT near-dups of each other (disjoint
  token space), so the near-dup pair/cluster density per document stays that
  of the source corpus; pair counts grow ~linearly with documents, exactly
  what real corpus growth does. Naive duplication would instead create
  10-cliques of exact dups everywhere and turn the probe into a dedup
  stress test (quadratic by construction, measuring nothing about scaling).
- embeddings: each replica rotates the vector by r dims (norms and
  pairwise-within-replica geometry preserved; LSH/IVF bucket occupancy
  stays realistic) and offsets vec_id.

Writes parquet under .scale_tmp/sf{N}/ (gitignored). Usage:

    python scale_corpus.py [replicas] [out_dir]
    python scale_probe.py /root/testdata/sf0.1 .scale_tmp/sf1 <queries...>
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".scale_tmp",
        f"sf{replicas // 10}" if replicas % 10 == 0 else f"x{replicas}")
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    con.sql(f"""
        COPY (
            SELECT d.doc_id + r.r * 1000000 AS doc_id,
                   CASE WHEN r.r = 0 THEN d.text
                        ELSE array_to_string(list_transform(
                                 string_split(d.text, ' '),
                                 x -> x || '_r' || r.r), ' ')
                   END AS text,
                   d.lang, d.source, d.n_chars
            FROM '{SRC}/documents.parquet' d
            CROSS JOIN (SELECT unnest(generate_series(0, {replicas - 1})) AS r) r
        ) TO '{out}/documents.parquet' (FORMAT parquet,
                                        COMPRESSION zstd)
    """)

    con.sql(f"""
        COPY (
            SELECT e.vec_id + r.r * 1000000 AS vec_id,
                   CAST(e.embedding[r.r + 1:] || e.embedding[:r.r]
                        AS FLOAT[]) AS embedding,
                   e.label
            FROM '{SRC}/embeddings.parquet' e
            CROSS JOIN (SELECT unnest(generate_series(0, {replicas - 1})) AS r) r
        ) TO '{out}/embeddings.parquet' (FORMAT parquet,
                                         COMPRESSION zstd)
    """)

    # events: replicas offset the user (10x users, per-user volume and
    # time span preserved — the growth shape funnel/retention/transition
    # costs follow) and the event id (uniqueness)
    con.sql(f"""
        COPY (
            SELECT e.* REPLACE (
                       e.event_id + r.r * 10000000 AS event_id,
                       e.user_id + r.r * 100000 AS user_id)
            FROM '{SRC}/events.parquet' e
            CROSS JOIN (SELECT unnest(generate_series(0, {replicas - 1})) AS r) r
        ) TO '{out}/events.parquet' (FORMAT parquet, COMPRESSION zstd)
    """)

    # lineitem: replicas offset order/part/supplier keys — 10x orders,
    # parts, AND suppliers (nodes and edges of the supplier-part graph
    # both grow 10x; per-key densities preserved)
    con.sql(f"""
        COPY (
            SELECT l.* REPLACE (
                       l.l_orderkey + r.r * 10000000 AS l_orderkey,
                       l.l_partkey + r.r * 1000000 AS l_partkey,
                       l.l_suppkey + r.r * 100000 AS l_suppkey)
            FROM '{SRC}/lineitem.parquet' l
            CROSS JOIN (SELECT unnest(generate_series(0, {replicas - 1})) AS r) r
        ) TO '{out}/lineitem.parquet' (FORMAT parquet, COMPRESSION zstd)
    """)

    for t in ("documents", "embeddings", "events", "lineitem"):
        n = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{out}/{t}.parquet: {n} rows")


if __name__ == "__main__":
    main()
