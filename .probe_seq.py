"""Reproduce the 32-core session-accumulated slowdown: run the first
SCALE_SET queries in scale_bench's exact order at 32c, with and
without a driver System.gc() between queries (ContextCleaner is
GC-triggered; without it, finished shuffles/broadcasts are never
released in a long session)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from agnostic_blockchain_etl_spark.session import get_session  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402

SF = "/root/repo/.scale_tmp/sf1"
GC = os.environ.get("SEQ_GC", "0") == "1"
SEQ = ["bloom_decontamination", "bloom_decontamination_v2",
       "dedup_cluster_components", "dedup_minhash_lsh_pairs",
       "dedup_ngram_jaccard"]

spark = get_session(master="local[32]",
                    conf={"spark.sql.shuffle.partitions": "32"},
                    app_name="probe_seq")
qs = entrymod.queries()
spark.range(1000).selectExpr("sum(id)").collect()

for name in SEQ:
    q = qs[name]
    q(spark, SF).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    if GC:
        spark.sparkContext._jvm.System.gc()
    best = None
    for _ in range(2):
        t0 = time.monotonic()
        q(spark, SF).write.format("noop").mode("overwrite").save()
        sec = time.monotonic() - t0
        spark.catalog.clearCache()
        if GC:
            spark.sparkContext._jvm.System.gc()
        best = sec if best is None else min(best, sec)
    print(f"{name}: {best:.2f}", flush=True)
