"""SHJ-at-scale probe (r11 verdict ask #5): run the largest SHJ-carrying
queries at the 10x replica corpus and capture each ShuffledHashJoin's
build-side metrics (total + per-task max via the UI REST API), so the
preferSortMergeJoin=false guardrail is validated with numbers instead
of asserted."""
import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from agnostic_blockchain_etl_spark.session import get_session  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.scale_tmp/sf1")
QUERIES = ["quality_score_fixed_model", "dsir_log_weights",
           "pagerank_supplier_part", "bm25_store_scoring",
           "bloom_decontamination", "source_overlap_matrix"]

spark = get_session(master="local[32]",
                    conf={"spark.ui.enabled": "true"},
                    app_name="probe_shj")
qs = entrymod.queries()
spark.range(1000).selectExpr("sum(id)").collect()
ui = spark.sparkContext.uiWebUrl
app = spark.sparkContext.applicationId

for name in QUERIES:
    spark.sparkContext.setJobDescription(f"shjprobe:{name}")
    qs[name](spark, SF).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

req = urllib.request.urlopen(
    f"{ui}/api/v1/applications/{app}/sql?details=true&planDescription=false"
    "&length=200")
sqls = json.loads(req.read())
out = []
for s in sqls:
    desc = s.get("description", "")
    if "shjprobe:" not in desc:
        continue
    qname = desc.split("shjprobe:", 1)[1].split(":")[0].strip()
    for node in s.get("nodes", []):
        nn = node.get("nodeName", "")
        if "Join" not in nn:
            continue
        mets = {m["name"]: m["value"] for m in node.get("metrics", [])}
        keep = {k: v for k, v in mets.items()
                if "build" in k or "rows" in k or "size" in k}
        out.append({"query": qname, "node": nn, "metrics": keep})
print(json.dumps(out, indent=1))
