"""Why do the shingle-family queries collapse at 32 cores on the 10x
corpus? Run the worst offender with the UI on and read stage-level GC
time, spill, and shuffle bytes from the REST API (guide §7.1)."""
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from agnostic_blockchain_etl_spark.session import get_session  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.scale_tmp/sf1")
CPUS = os.environ.get("AB_CPUS", "32")
NAME = os.environ.get("PROBE_Q", "dedup_cluster_components")

spark = get_session(master=f"local[{CPUS}]",
                    conf={"spark.sql.shuffle.partitions": CPUS,
                          "spark.ui.enabled": "true"},
                    app_name="probe_collapse")
qs = entrymod.queries()
spark.range(1000).selectExpr("sum(id)").collect()

q = qs[NAME]
q(spark, SF).write.format("noop").mode("overwrite").save()   # warm
spark.catalog.clearCache()
t0 = time.monotonic()
q(spark, SF).write.format("noop").mode("overwrite").save()
wall = time.monotonic() - t0
print(f"{NAME} @{CPUS}c: {wall:.2f}s")

ui = spark.sparkContext.uiWebUrl
app = spark.sparkContext.applicationId
stages = json.loads(urllib.request.urlopen(
    f"{ui}/api/v1/applications/{app}/stages?status=complete").read())
tot = {"run_ms": 0, "gc_ms": 0, "spill_mem": 0, "spill_disk": 0,
       "sh_read": 0, "sh_write": 0, "cpu_ms": 0}
big = []
for s in stages:
    tot["run_ms"] += s["executorRunTime"]
    tot["gc_ms"] += s["jvmGcTime"]
    tot["cpu_ms"] += s.get("executorCpuTime", 0) // 1_000_000
    tot["spill_mem"] += s["memoryBytesSpilled"]
    tot["spill_disk"] += s["diskBytesSpilled"]
    tot["sh_read"] += s["shuffleReadBytes"]
    tot["sh_write"] += s["shuffleWriteBytes"]
    if s["executorRunTime"] > 3000:
        big.append((s["stageId"], s["executorRunTime"], s["jvmGcTime"],
                    s["memoryBytesSpilled"] // 2**20,
                    s["shuffleReadBytes"] // 2**20, s["numTasks"],
                    s.get("name", "")[:60]))
print("totals:", {k: (v // 2**20 if "spill" in k or "sh_" in k else v)
                  for k, v in tot.items()},
      "(spill/shuffle in MiB)")
print("gc share of run:", round(tot["gc_ms"] / max(tot["run_ms"], 1), 3))
print("big stages (id, run_ms, gc_ms, spillMiB, shReadMiB, tasks, name):")
for b in sorted(big, key=lambda x: -x[1])[:10]:
    print("  ", b)
