"""Interleaved A/B for evm_kernel_roundtrip (r11 verdict ask #7):
new = the r11 constant-hoisted topic0 literal; old = re-inline
keccak256('Transfer(...)') so the pure-Python keccak runs per row.
Same session, alternating order, min-of-3, noop sink."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from agnostic_blockchain_etl_spark.session import get_session  # noqa: E402
from agnostic_blockchain_etl_spark.operators.tables import (  # noqa: E402
    load_tables, spread)
import __spark_entry__ as entrymod  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("AB_CPUS", "32")
spark = get_session(master=f"local[{CPUS}]", app_name="ab_evm")
qs = entrymod.queries()
spark.range(1000).selectExpr("sum(id)").collect()

_SQL = """
    WITH built AS (
        SELECT doc_id, source,
               array({topic0},
                     concat(cast(repeat(x'00', 12) as binary),
                            substring(keccak256(concat('a', doc_id)), 1, 20)),
                     concat(cast(repeat(x'00', 12) as binary),
                            substring(keccak256(concat('b', doc_id)), 1, 20)))
                   AS topics,
               concat(cast(repeat(x'00', 25) as binary),
                      substring(keccak256(concat('v', doc_id)), 1, 7)) AS data,
               cast(conv(hex(substring(keccak256(concat('v', doc_id)), 1, 7)),
                         16, 10) AS BIGINT) AS expect_amount
        FROM documents
    ),
    decoded AS (
        SELECT doc_id, source, expect_amount,
               evm_decode_event(
                   topics, data,
                   array('event Transfer(address indexed,address indexed,uint256)'))
                   AS evt
        FROM built
    )
    SELECT doc_id,
           evm_hex_encode(encode(source, 'UTF-8'))                AS encoded,
           decode(evm_hex_decode(
               evm_hex_encode(encode(source, 'UTF-8'))), 'UTF-8') AS decoded_back,
           get_json_object(evt, '$.value.signature')              AS signature,
           get_json_object(evt, '$.error') IS NULL
             AND CAST(get_json_object(evt, '$.value.inputs.arg2') AS BIGINT)
                 = expect_amount                                  AS amount_ok
    FROM decoded"""


def old(spark, sf_dir):
    t = load_tables(spark, sf_dir, ("documents",))
    spread(t["documents"]).createOrReplaceTempView("documents")
    return spark.sql(_SQL.format(
        topic0="keccak256('Transfer(address,address,uint256)')"))


variants = {"old_inline": lambda: old(spark, SF),
            "new_hoisted": lambda: qs["evm_kernel_roundtrip"](spark, SF)}
for name, f in variants.items():
    f().write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
best = {n: None for n in variants}
names = list(variants)
for rnd in range(3):
    order = names if rnd % 2 == 0 else names[::-1]
    for n in order:
        spark.sparkContext.setJobDescription(f"ab_evm:{n}:r{rnd}")
        t0 = time.monotonic()
        variants[n]().write.format("noop").mode("overwrite").save()
        dt = time.monotonic() - t0
        spark.catalog.clearCache()
        b = best[n]
        best[n] = dt if b is None else min(b, dt)
        print(f"{n} r{rnd}: {dt:.3f}", flush=True)
print({k: round(v, 3) for k, v in best.items()})
print("new/old =", round(best["new_hoisted"] / best["old_inline"], 3))
