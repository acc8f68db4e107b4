"""Local re-implementation of the driver's correctness gate: run each
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB, compare
row count + order-insensitive value hash (columns sorted by name).

Usage:  python tests/oracle_harness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from datetime import date, datetime
from decimal import Decimal

import duckdb

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def _norm(v):
    """Normalize a cell for cross-engine comparison."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Full precision: the driver hashes raw values, so a 6-sig-digit
        # truncation here masked a real ULP divergence in round 1.
        return f"{v:.17g}"
    if isinstance(v, Decimal):
        return f"{float(v):.17g}"
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S")
    if isinstance(v, date):
        return v.strftime("%Y-%m-%d") + " 00:00:00"
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_norm(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def rows_signature(cols: list[str], rows: list[tuple]) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_norm(r[i]) for i in order) for r in rows)


def duckdb_run(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def compare(name: str, spark, sf_dir: str, q, oracle: str | None) -> str:
    df = q(spark, sf_dir)
    s_cols = df.columns
    s_rows = [tuple(r) for r in df.collect()]
    if oracle is None:
        return f"ROWS_ONLY({len(s_rows)})"
    d_cols, d_rows = duckdb_run(oracle, sf_dir)
    if len(s_rows) != len(d_rows):
        return f"ROWCOUNT spark={len(s_rows)} duckdb={len(d_rows)}"
    if sorted(s_cols) != sorted(d_cols):
        return f"SCHEMA spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    sig_s = rows_signature(s_cols, s_rows)
    sig_d = rows_signature(d_cols, d_rows)
    if sig_s != sig_d:
        diff = next((i for i, (a, b) in enumerate(zip(sig_s, sig_d)) if a != b), -1)
        return (f"VALUES first-diff row {diff}:\n  spark : {sig_s[diff][:300]}"
                f"\n  duckdb: {sig_d[diff][:300]}")
    return "OK"


def main():
    args = [a for a in sys.argv[1:]]
    plain = "--plain-session" in args
    if plain:
        args.remove("--plain-session")
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    if plain:
        # Driver-like session: NONE of the repo factory's confs, and a
        # deliberately hostile session timezone — queries must be
        # conf-independent (every query registers its own UDFs and
        # adapts to the parquet schema via load_tables)
        from pyspark.sql import SparkSession
        spark = (SparkSession.builder.master("local[8]")
                 .config("spark.sql.shuffle.partitions", "8")
                 .config("spark.sql.session.timeZone", "America/New_York")
                 .config("spark.ui.enabled", "false")
                 .getOrCreate())
    else:
        from agnostic_blockchain_etl_spark.session import get_session
        spark = get_session(master="local[8]",
                            conf={"spark.sql.shuffle.partitions": "8"})
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failed = []
    for name, q in qs.items():
        if only and name not in only:
            continue
        try:
            status = compare(name, spark, sf_dir, q, oracles.get(name))
        except Exception as e:
            status = f"ERROR {type(e).__name__}: {str(e)[:400]}"
        flag = "PASS" if status.startswith(("OK", "ROWS_ONLY")) else "FAIL"
        if flag == "FAIL":
            failed.append(name)
        print(f"[{flag}] {name}: {status}")
    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
