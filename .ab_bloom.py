"""Interleaved A/B: bloom_decontamination v1 (5 salted md5) vs v2 (KM 2-hash).

One session, alternating order, min-of-3 each, noop sink — the r11
measurement discipline. Also dumps the formatted plans to plans/r12/.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from agnostic_blockchain_etl_spark.session import get_session  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_session(master="local[32]", app_name="ab_bloom")
qs = entrymod.queries()
spark.range(1000).selectExpr("sum(id)").collect()

names = ["bloom_decontamination", "bloom_decontamination_v2"]
for n in names:  # plan dumps
    plan = qs[n](spark, SF)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))
    tag = "after" if n.endswith("_v2") else "before"
    with open(f"plans/r12/bloom_decontamination_v2_{tag}.txt", "w") as f:
        f.write(plan)

# warm both
for n in names:
    qs[n](spark, SF).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

best = {n: None for n in names}
for rnd in range(3):
    order = names if rnd % 2 == 0 else names[::-1]
    for n in order:
        spark.sparkContext.setJobDescription(f"ab:{n}:r{rnd}")
        t0 = time.monotonic()
        qs[n](spark, SF).write.format("noop").mode("overwrite").save()
        dt = time.monotonic() - t0
        spark.catalog.clearCache()
        b = best[n]
        best[n] = dt if b is None else min(b, dt)
        print(f"{n} r{rnd}: {dt:.3f}")
print({k: round(v, 3) for k, v in best.items()})
print("v2/v1 =", round(best[names[1]] / best[names[0]], 3))
