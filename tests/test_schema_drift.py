"""Testdata-drift resilience: the r2 round was lost to a silent
timestamp type flip in regenerated testdata. `load_tables` now ADAPTS
to the two realistic flips instead of failing 18 gate rows:

- events.ts nanos-bigint ↔ timestamp[us]  (events_us, test_tables_guard)
- money columns double ↔ DECIMAL(p,2)     (_normalize_decimals, here)

This test manufactures the decimal flip from the real sf0.001 corpus
and replays the ENTIRE oracle gate against it in a subprocess — which
is how the exact_p50 median tie (double-vs-decimal interpolation) was
found and fixed to cent-integer interpolation."""

from __future__ import annotations

import os

import pytest
import subprocess
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.001"
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")
CASTS = {
    "lineitem": ("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
    "orders": ("o_totalprice",),
    "customer": ("c_acctbal",),
    "supplier": ("s_acctbal",),
    "part": ("p_retailprice",),
}


def _make_decimal_copy(out: str) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()]
        dec = CASTS.get(t, ())
        sel = ", ".join(
            f"CAST({c} AS DECIMAL(12,2)) AS {c}" if c in dec else c
            for c in cols)
        con.execute(f"COPY (SELECT {sel} FROM '{SRC}/{t}.parquet') "
                    f"TO '{out}/{t}.parquet' (FORMAT PARQUET)")


@pytest.mark.heavy
def test_full_gate_survives_decimal_money_columns(tmp_path):
    out = str(tmp_path / "sf_decimal")
    _make_decimal_copy(out)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tests", "oracle_harness.py"),
         out],
        capture_output=True, text=True, timeout=900,
        env={**os.environ, "PYTHONPATH": REPO})
    assert proc.returncode == 0, \
        f"gate broke under decimal drift:\n{proc.stdout[-3000:]}"
    assert "0 failures" in proc.stdout
