"""Component profile + v1/v2 A/B at 8 cores (CPU-bound regime)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from agnostic_blockchain_etl_spark.session import get_session  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402
from agnostic_blockchain_etl_spark.operators.dedup import doc_shingles  # noqa: E402
from agnostic_blockchain_etl_spark.operators.tables import load_tables  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("AB_CPUS", "8")
spark = get_session(master=f"local[{CPUS}]", app_name="ab_bloom8")
qs = entrymod.queries()
spark.range(1000).selectExpr("sum(id)").collect()


def t(label, df):
    df.write.format("noop").mode("overwrite").save()  # warm
    best = None
    for _ in range(2):
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    spark.catalog.clearCache()
    print(f"{label}: {best:.3f}")
    return best


docs = load_tables(spark, SF, ("documents",))["documents"]
t("shingles_only", doc_shingles(docs))

names = ["bloom_decontamination", "bloom_decontamination_v2"]
for n in names:
    qs[n](spark, SF).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
best = {n: None for n in names}
for rnd in range(3):
    order = names if rnd % 2 == 0 else names[::-1]
    for n in order:
        t0 = time.monotonic()
        qs[n](spark, SF).write.format("noop").mode("overwrite").save()
        dt = time.monotonic() - t0
        spark.catalog.clearCache()
        b = best[n]
        best[n] = dt if b is None else min(b, dt)
print({k: round(v, 3) for k, v in best.items()})
print("v2/v1 =", round(best[names[1]] / best[names[0]], 3))
