"""THE cross-engine 60-bit salted md5 hash — single-sourced.

Every deterministic decision in the operator library (sampling,
splits, mixture membership, budget prefixes, Bloom positions,
training order) derives from this primitive so membership is a pure,
layout-independent function of the key on BOTH engines. Review
history: five hand-rolled copies drifted apart once (r4), and the
bloom/corpus pair re-inlined it again in r10 — all call sites now
route here (`corpus._salted_h60` delegates with key = doc_id).

Version-stability war story (do not "simplify"): the DuckDB twin uses
nibble arithmetic, never a hex CAST — ``CAST('0x'||hex AS BIGINT)``
changed semantics across DuckDB releases and red-rowed the gate once
(r2, dedup_signatures). 15 nibbles = 60 bits keeps every value in
positive signed-long territory on both engines (the same sign-dodge
`bloom.BITS_PER_WORD` documents for filter words).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def keyed_h60(salt: str, key: Column) -> Column:
    """60-bit salted md5 hash of an arbitrary key column (Spark side):
    md5 of the utf-8 bytes of ``salt || key``, top 15 hex nibbles via
    conv(). NULL key → NULL hash — callers own null-keying (see
    `bloom.bloom_content_key`'s ``null:<id>`` rule)."""
    h = F.md5(F.concat(F.lit(salt), key).cast("binary"))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long")


def sql_keyed_h60(salt_sql: str, key_sql: str) -> str:
    """DuckDB twin of `keyed_h60` — nibble arithmetic, bit-identical
    (``salt_sql``/``key_sql`` are SQL string expressions; the lambda
    variable is ``j`` so callers can alias tables ``i``)."""
    return ("CAST(list_sum(list_transform(generate_series(1, 15), "
            f"j -> (strpos('0123456789abcdef', substr(md5({salt_sql} || "
            f"{key_sql}), j, 1)) - 1)::BIGINT"
            " << (4 * (15 - j)))) AS BIGINT)")
