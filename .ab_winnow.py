"""Interleaved A/B: winnow selection md5-per-gram (v1) vs poly (v2),
plus the full gate pair. 8 cores (CPU-bound regime), min-of-3,
noop sink; dumps the gate plans to plans/r12/."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from agnostic_blockchain_etl_spark.session import get_session  # noqa: E402
from agnostic_blockchain_etl_spark.operators.tables import load_tables  # noqa: E402
from agnostic_blockchain_etl_spark.operators.winnow import (  # noqa: E402
    _K, _SALT, _SALT2, _W, _selected)
import __spark_entry__ as entrymod  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("AB_CPUS", "8")
spark = get_session(master=f"local[{CPUS}]",
                    conf={"spark.sql.shuffle.partitions": CPUS},
                    app_name="ab_winnow")
qs = entrymod.queries()
spark.range(1000).selectExpr("sum(id)").collect()

for n, tag in (("winnow_dup_pairs", "before"), ("winnow_dup_pairs_v2",
                                                "after")):
    plan = qs[n](spark, SF)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))
    with open(f"plans/r12/winnow_dup_pairs_v2_{tag}.txt", "w") as f:
        f.write(plan)
    spark.catalog.clearCache()

docs = load_tables(spark, SF, ("documents",))["documents"]
variants = {
    "sel_md5": lambda: _selected(docs, _K, _W, "text", "doc_id", _SALT),
    "sel_poly": lambda: _selected(docs, _K, _W, "text", "doc_id", _SALT2,
                                  "poly"),
    "pairs_v1": lambda: qs["winnow_dup_pairs"](spark, SF),
    "pairs_v2": lambda: qs["winnow_dup_pairs_v2"](spark, SF),
}
for name, f in variants.items():
    f().write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
best = {n: None for n in variants}
names = list(variants)
for rnd in range(3):
    order = names if rnd % 2 == 0 else names[::-1]
    for n in order:
        spark.sparkContext.setJobDescription(f"ab_winnow:{n}:r{rnd}")
        t0 = time.monotonic()
        variants[n]().write.format("noop").mode("overwrite").save()
        dt = time.monotonic() - t0
        spark.catalog.clearCache()
        b = best[n]
        best[n] = dt if b is None else min(b, dt)
        print(f"{n} r{rnd}: {dt:.3f}", flush=True)
print({k: round(v, 3) for k, v in best.items()})
print("selection md5/poly =", round(best["sel_md5"] / best["sel_poly"], 3))
print("pairs v1/v2 =", round(best["pairs_v1"] / best["pairs_v2"], 3))
