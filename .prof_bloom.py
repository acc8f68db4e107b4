"""Decompose bloom_decontamination wall at the 10x corpus, 8 cores."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402
from agnostic_blockchain_etl_spark.session import get_session  # noqa: E402
from agnostic_blockchain_etl_spark.operators.tables import load_tables  # noqa: E402
from agnostic_blockchain_etl_spark.operators.dedup import (  # noqa: E402
    _EVAL_MOD, doc_shingles, _contamination_flags)
from agnostic_blockchain_etl_spark.operators import bloom as B  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.scale_tmp/sf1")
spark = get_session(master="local[8]", app_name="prof_bloom")
spark.range(1000).selectExpr("sum(id)").collect()


def t(label, fn):
    fn()  # warm
    best = None
    for _ in range(2):
        t0 = time.monotonic()
        fn()
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    spark.catalog.clearCache()
    print(f"{label}: {best:.3f}", flush=True)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


docs = load_tables(spark, SF, ("documents",))["documents"]
is_eval = F.col("doc_id") % _EVAL_MOD == 0
train, ev = docs.where(~is_eval), docs.where(is_eval)

ev_keys = (doc_shingles(ev).select(F.col("h").cast("string").alias("__ck"))
           .distinct())
t("a_eval_keys", lambda: noop(ev_keys))
filt = B.bloom_build(ev_keys, m_words=B._DM, k=B._DK, key_col="__ck",
                     salt="bloomdecon:")
t("b_filter_build", lambda: noop(filt))
t("c_filter_collect", lambda: B.bloom_filter_array(filt, B._DM))
arr = B.bloom_filter_array(filt, B._DM)
train_sh = doc_shingles(train).select(
    "doc_id", F.col("h").cast("string").alias("__ck"))
t("d_train_shingles", lambda: noop(train_sh))
probed = B.bloom_probe(train_sh, arr, m_words=B._DM, k=B._DK,
                       key_col="__ck", salt="bloomdecon:", out_col="__hit")
t("e_probe", lambda: noop(probed))
agg = (probed.groupBy("doc_id")
       .agg(F.count("*").alias("n_shingles"),
            F.sum("__hit").cast("long").alias("n_overlap")))
t("f_probe_agg", lambda: noop(agg))
t("g_full", lambda: noop(_contamination_flags(train, agg, 0.05)))
