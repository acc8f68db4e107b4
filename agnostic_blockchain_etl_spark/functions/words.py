"""UInt256 word arithmetic (SURVEY.md §7.2's hard-type resolution).

Spark's widest exact numeric is Decimal(38) (~1e38); 2^256 needs 78
digits. The engine's dual representation:

- canonical: 32-byte big-endian ``BinaryType`` word — exact, bytewise-
  sortable (``evm_hex_decode_word``);
- convenience: ``DecimalType(38,0)`` projection, NULL on overflow
  (``evm_hex_decode_dec``) — sufficient for real token amounts, matching
  the reference's own float derivation (erc20 create_buffer.sql:118).

This module supplies exact arithmetic on the canonical words for the
overflow cases, as Arrow-batched pandas UDFs registered alongside the
rest of the kernel library.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BinaryType, IntegerType, StringType

_MASK256 = (1 << 256) - 1


def word_to_int(w: bytes | None) -> int | None:
    return None if w is None else int.from_bytes(w, "big")


def int_to_word(n: int) -> bytes:
    return (n & _MASK256).to_bytes(32, "big")


@pandas_udf(BinaryType())
def evm_word_add(a: pd.Series, b: pd.Series) -> pd.Series:
    """Exact 256-bit addition (wrapping, EVM semantics)."""
    return pd.Series([
        None if (x is None or y is None)
        else int_to_word(word_to_int(bytes(x)) + word_to_int(bytes(y)))
        for x, y in zip(a, b)])


@pandas_udf(BinaryType())
def evm_word_sub(a: pd.Series, b: pd.Series) -> pd.Series:
    """Exact 256-bit subtraction (wrapping)."""
    return pd.Series([
        None if (x is None or y is None)
        else int_to_word(word_to_int(bytes(x)) - word_to_int(bytes(y)))
        for x, y in zip(a, b)])


@pandas_udf(IntegerType())
def evm_word_cmp(a: pd.Series, b: pd.Series) -> pd.Series:
    """Three-way compare of 256-bit words (-1/0/1). Big-endian words also
    compare correctly as raw bytes — this exists for explicit intent."""
    out = []
    for x, y in zip(a, b):
        if x is None or y is None:
            out.append(None)
        else:
            xi, yi = word_to_int(bytes(x)), word_to_int(bytes(y))
            out.append((xi > yi) - (xi < yi))
    return pd.Series(out)


@pandas_udf(StringType())
def evm_word_to_str(a: pd.Series) -> pd.Series:
    """Decimal string of a 256-bit word (exact, any magnitude)."""
    return a.map(lambda w: None if w is None else str(word_to_int(bytes(w))))


def register_words(spark) -> None:
    spark.udf.register("evm_word_add", evm_word_add)
    spark.udf.register("evm_word_sub", evm_word_sub)
    spark.udf.register("evm_word_cmp", evm_word_cmp)
    spark.udf.register("evm_word_to_str", evm_word_to_str)
