"""Refreshable broadcast dictionary (SURVEY.md §2.2).

Reference: ``CREATE DICTIONARY … SOURCE(http(url … format 'Parquet'))
LIFETIME(min 3600 max 7200) LAYOUT(hashed())`` + ``dictGet``
(examples/ethereum_decoded_logs/create_evm_abi_decoding_dictionary.sql:1-8).

Spark analog: a small DataFrame re-read on TTL expiry and joined with a
broadcast hint — ``dictGet(dict, attr, key)`` becomes a broadcast left
join, which Catalyst turns into a hash-map lookup on every executor
(exactly the hashed() layout, minus the refresh daemon)."""

from __future__ import annotations

import random
import threading
import time
from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


class RefreshableDictionary:
    """TTL-cached DataFrame with broadcast-join lookup.

    ``loader(spark) -> DataFrame`` re-reads the source (parquet path, HTTP
    download staged to a local file, JDBC table, …). Lifetime is jittered
    between min and max like the reference's LIFETIME(min,max) so many
    executick refreshes don't stampede the source."""

    def __init__(self, spark: SparkSession, loader: Callable[[SparkSession], DataFrame],
                 key_col: str, lifetime_min_s: float = 3600.0,
                 lifetime_max_s: float = 7200.0):
        self.spark = spark
        self.loader = loader
        self.key_col = key_col
        self.lifetime_min_s = lifetime_min_s
        self.lifetime_max_s = lifetime_max_s
        self._df: DataFrame | None = None
        self._expires_at = 0.0
        self._lock = threading.Lock()

    def df(self) -> DataFrame:
        # locked: the pipeline's N stage workers all call dict_get —
        # un-locked, two threads seeing the same TTL expiry both
        # loader().cache(), the loser's cached frame leaks in executor
        # storage until session end, and one thread can unpersist the
        # frame another is mid-join on (review finding). The lock holds
        # for the refresh only; steady-state calls take it briefly.
        # The OLD frame is unpersisted with blocking=False AFTER the
        # replacement is live, so an in-flight join on it just
        # recomputes rather than failing.
        with self._lock:
            now = time.monotonic()
            if self._df is None or now >= self._expires_at:
                prev = self._df
                fresh = self.loader(self.spark).cache()
                fresh.count()  # materialize once; later joins reuse
                self._df = fresh
                self._expires_at = now + random.uniform(
                    self.lifetime_min_s, self.lifetime_max_s)
                if prev is not None:
                    prev.unpersist(False)
            return self._df

    def dict_get(self, df: DataFrame, attr: str, key: Column,
                 alias: str | None = None) -> DataFrame:
        """``dictGet(dict, attr, key)``: broadcast-left-join ``attr`` onto
        ``df`` under ``alias`` (default: attr)."""
        d = self.df().select(F.col(self.key_col).alias("__dict_key"),
                             F.col(attr).alias(alias or attr))
        return (df.withColumn("__dict_key", key)
                .join(F.broadcast(d), "__dict_key", "left")
                .drop("__dict_key"))
