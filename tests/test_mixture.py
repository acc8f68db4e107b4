"""Mixture weighting: the computed rates must (a) cap at 1 exactly on
the bottleneck stratum, (b) reproduce the target mix among kept tokens,
(c) drop untargeted strata, and (d) maximize kept data (any stratum
above its computed rate would break the mix)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from agnostic_blockchain_etl_spark.operators.mixture import (  # noqa: E402
    mixture_weights)


@pytest.fixture(scope="module")
def spark():
    from agnostic_blockchain_etl_spark.session import get_session
    yield get_session(master="local[8]",
                      conf={"spark.sql.shuffle.partitions": "8"})


def _corpus(spark):
    # en: 60 tokens, de: 30, fr: 10, xx: 5 (untargeted)
    rows = []
    did = 0
    for lang, docs, words in (("en", 6, 10), ("de", 3, 10),
                              ("fr", 1, 10), ("xx", 1, 5)):
        for _ in range(docs):
            did += 1
            rows.append((did, " ".join(["w"] * words), lang))
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_rates_hit_target_mix(spark):
    # target 50/25/25 over en/de/fr; fr is the bottleneck:
    # available share fr = 10/105... targets normalized over en+de+fr
    out = {r["stratum"]: r
           for r in mixture_weights(
               _corpus(spark), {"en": 2, "de": 1, "fr": 1}).collect()}

    assert out["xx"]["rate"] == 0.0 and out["xx"]["target_share"] == 0.0
    # fr has the smallest share/target -> kept whole
    assert out["fr"]["rate"] == 1.0
    # kept tokens follow the 2:1:1 target exactly
    kept = {s: out[s]["kept_tokens"] for s in ("en", "de", "fr")}
    assert kept["en"] == 2 * kept["de"] == 2 * kept["fr"]
    # and nothing exceeds availability
    for s in ("en", "de", "fr"):
        assert out[s]["rate"] <= 1.0
        assert out[s]["kept_tokens"] <= out[s]["n_tokens"] + 1e-9


def test_already_matching_mix_keeps_everything(spark):
    rows = [(1, " ".join(["w"] * 30), "en"), (2, " ".join(["w"] * 10), "de"),
            (3, " ".join(["w"] * 40), "en"), (4, " ".join(["w"] * 20), "de")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["stratum"]: r
           for r in mixture_weights(docs, {"en": 70, "de": 30}).collect()}
    assert out["en"]["rate"] == 1.0 and out["de"]["rate"] == 1.0


def test_temperature_mixture_flattens_the_mix(spark):
    """alpha<1 upweights low-resource strata: target shares follow
    q^alpha (normalized), the largest stratum downsamples, the
    bottleneck keeps rate 1, and kept tokens reproduce the implied
    mix. alpha=1 is the identity (every rate 1)."""
    from agnostic_blockchain_etl_spark.operators.mixture import (
        temperature_mixture)
    docs = _corpus(spark)
    got = {r.stratum: r for r in temperature_mixture(docs, 0.5).collect()}
    # shares: en 60/105, de 30/105, fr 10/105, xx 5/105
    shares = {"en": 60 / 105, "de": 30 / 105, "fr": 10 / 105,
              "xx": 5 / 105}
    z = sum(s ** 0.5 for s in shares.values())
    for s, q in shares.items():
        assert abs(got[s].target_share - q ** 0.5 / z) < 1e-6, s
        # temperature targets exceed raw share iff below-average stratum
    # kept tokens hit the implied mix
    kept = {s: got[s].kept_tokens for s in shares}
    tot = sum(kept.values())
    for s, q in shares.items():
        # kept_tokens is rounded to 2 decimals in the plan frame, so
        # the mix check tolerates that grid on this tiny corpus
        assert abs(kept[s] / tot - q ** 0.5 / z) < 1e-3, s
    # the bottleneck (largest share/target ratio smallest => xx or fr?)
    assert max(r.rate for r in got.values()) == 1.0
    assert all(0 < r.rate <= 1.0 for r in got.values())
    # alpha=1: identity — everything kept at rate 1
    ident = {r.stratum: r.rate for r in
             temperature_mixture(docs, 1.0).collect()}
    assert all(abs(v - 1.0) < 1e-6 for v in ident.values())
    import pytest as _pytest
    with _pytest.raises(ValueError):
        temperature_mixture(docs, 0.0)


def test_apply_mixture_rates(spark):
    """Applying the computed plan keeps ~rate per stratum, is
    layout-independent, drops untargeted strata entirely, and keeps a
    rate-1.0 stratum entirely (the boundary is inclusive)."""
    from agnostic_blockchain_etl_spark.operators.mixture import (
        apply_mixture_rates, mixture_weights)
    rows = [(i, " ".join(["w"] * 10),
             "en" if i < 600 else ("fr" if i < 700 else "xx"))
            for i in range(800)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    plan = mixture_weights(docs, {"en": 50, "fr": 50})
    rates = {r.stratum: r.rate for r in plan.collect()}
    assert rates["fr"] == 1.0 and rates["xx"] == 0.0
    got = apply_mixture_rates(docs, plan)
    kept = {r.doc_id: r.mix_keep for r in got.collect()}
    assert len(kept) == 800                  # flag, don't filter
    by = {"en": [], "fr": [], "xx": []}
    for i, _, lang in rows:
        by[lang].append(kept[i])
    assert sum(by["xx"]) == 0                # untargeted stratum dropped
    assert sum(by["fr"]) == 100              # rate 1.0 keeps everything
    # en downsamples to ~rate (600 * rate ± sampling noise)
    expect = rates["en"] * 600
    assert abs(sum(by["en"]) - expect) < 60
    again = {r.doc_id: r.mix_keep
             for r in apply_mixture_rates(docs.repartition(7),
                                          plan).collect()}
    assert again == kept                     # layout-independent


def test_unsatisfiable_target_raises(spark):
    """Round-8 advisory: a TARGETED stratum the corpus cannot supply
    (present with zero tokens, or absent entirely) used to zero every
    rate (all-empty plan) in the first case and be silently ignored in
    the second. Both are one unsatisfiable-mix config error now: raise
    by default, and under on_unsatisfiable='ignore' both are excluded
    from the bottleneck consistently — the remaining strata still get a
    sane plan instead of all-zero rates."""
    from agnostic_blockchain_etl_spark.operators.mixture import (
        mixture_weights)
    rows = [(1, "one two three four", "en"), (2, "uno dos", "es"),
            (3, None, "empty"), (4, None, "empty")]
    docs = spark.createDataFrame(rows,
                                 "doc_id long, text string, lang string")
    # present-but-zero-token targeted stratum
    with pytest.raises(ValueError, match=r"empty.*zero tokens"):
        mixture_weights(docs, {"en": 1, "empty": 1})
    # wholly absent targeted stratum — same error, consistently
    with pytest.raises(ValueError, match=r"missing.*zero tokens"):
        mixture_weights(docs, {"en": 1, "missing": 1})
    with pytest.raises(ValueError, match="on_unsatisfiable"):
        mixture_weights(docs, {"en": 1}, on_unsatisfiable="nope")
    # ignore: the supplied strata are planned as if the unsupplied one
    # were never targeted — NOT the old all-zero-rate plan
    plan = {r.stratum: r for r in
            mixture_weights(docs, {"en": 1, "es": 1, "empty": 2},
                            on_unsatisfiable="ignore").collect()}
    assert plan["empty"].rate == 0.0
    assert max(plan["en"].rate, plan["es"].rate) == 1.0
    assert plan["en"].rate > 0 and plan["es"].rate > 0
    # kept tokens still follow the 1:1 target among supplied strata
    assert abs(plan["en"].kept_tokens - plan["es"].kept_tokens) < 1e-6
    # ...and the REPORTED target_share renormalizes over the supplied
    # strata (review finding: a plan advertising shares its rates
    # cannot deliver fails downstream kept-vs-target validation)
    assert plan["en"].target_share == 0.5
    assert plan["es"].target_share == 0.5
    assert plan["empty"].target_share == 0.0


def test_plan_is_literal_no_corpus_rescan(spark):
    """The plan frame must carry no corpus lineage: mixture_weights
    materializes the bounded stratum table once, so collecting the plan
    twice (or joining it downstream) re-evaluates a 4-row literal, not
    the corpus aggregation (recompute-multiplier rule)."""
    from agnostic_blockchain_etl_spark.operators.mixture import (
        mixture_weights)
    acc = spark.sparkContext.accumulator(0)

    def tick(x):
        acc.add(1)
        return x

    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType
    tick_udf = F.udf(tick, StringType())
    docs = spark.createDataFrame(
        [(1, "a b c", "en"), (2, "d e", "es")],
        "doc_id long, text string, lang string") \
        .withColumn("text", tick_udf("text"))
    plan = mixture_weights(docs, {"en": 1, "es": 1})
    plan.collect()
    plan.collect()
    assert acc.value <= 2 * 2   # corpus evaluated once (2 rows), not 3x

    # counts= shares ONE aggregation across several planners: planning
    # a targeted mix AND a temperature mix from the same stratum table
    # adds zero further corpus evaluations
    from agnostic_blockchain_etl_spark.operators.mixture import (
        stratum_counts, temperature_mixture)
    before = acc.value
    counts = stratum_counts(docs)
    mixture_weights(docs, {"en": 1, "es": 1}, counts=counts).collect()
    temperature_mixture(docs, 0.5, counts=counts).collect()
    assert acc.value - before <= 2 * 2   # the stratum_counts scan only

    # a counts= frame that is not a stratum_counts() result fails
    # loudly (schema-only check) instead of planning a wrong mix
    import pytest
    with pytest.raises(ValueError, match="stratum_counts"):
        mixture_weights(docs, {"en": 1}, counts=docs)
    with pytest.raises(ValueError, match="stratum_counts"):
        temperature_mixture(docs, 0.5,
                            counts=counts.drop("n_docs"))


def test_null_text_counts_zero_tokens(spark):
    """size(split(NULL)) is -1 under Spark's default sizeOfNull, so a
    metadata-only (null-text) document used to SUBTRACT a token from
    its stratum — and an all-null stratum went negative, corrupting
    every share/rate downstream (round-8 review finding). Null text
    must count 0 tokens and leave the rate arithmetic intact."""
    from agnostic_blockchain_etl_spark.operators.mixture import (
        mixture_weights, temperature_mixture)
    rows = [(1, "one two three", "en"), (2, None, "en"),
            (3, "uno dos", "es"), (4, None, "nulls"), (5, None, "nulls")]
    docs = spark.createDataFrame(rows,
                                 "doc_id long, text string, lang string")
    plan = {r.stratum: r for r in
            mixture_weights(docs, {"en": 1, "es": 1}).collect()}
    assert plan["en"].n_tokens == 3          # not 3 - 1
    assert plan["es"].n_tokens == 2
    assert plan["nulls"].n_tokens == 0       # not -2
    assert plan["nulls"].rate == 0.0
    assert all(0.0 <= r.rate <= 1.0 for r in plan.values())
    tplan = {r.stratum: r for r in
             temperature_mixture(docs, 0.5).collect()}
    assert tplan["en"].n_tokens == 3 and tplan["nulls"].n_tokens == 0


def test_token_budget_cap_prefix_semantics(spark):
    """token_budget_cap: the kept set is exactly the maximal
    salted-hash-order prefix whose running token total fits the
    stratum's budget; membership is layout-independent; strata without
    a budget entry flag 0 with every row intact; scalar budgets apply
    to all strata; null text costs 0 tokens; a NULL stratum is never
    dropped (the offsets join is null-safe)."""
    from agnostic_blockchain_etl_spark.operators.corpus import (
        _salted_h60, token_budget_cap)
    from pyspark.sql import functions as F
    rows = [(i, " ".join(["w"] * (3 + i % 5)),
             "en" if i % 3 else "de") for i in range(120)]
    rows += [(900, None, "en")]                  # null text: 0 tokens
    rows += [(910 + i, "a b c", None) for i in range(5)]  # NULL stratum
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string")
    budgets = {"en": 100}                        # de: no entry -> keep 0
    got = token_budget_cap(docs, budgets, n_buckets=8)
    assert got.count() == len(rows)              # flag, don't filter
    # NULL-stratum rows survive the (null-safe) offsets join; with a
    # dict budget they have no entry -> flagged 0, never dropped
    nulls = got.where(F.col("lang").isNull()).collect()
    assert len(nulls) == 5
    assert all(r.budget_keep == 0 for r in nulls)
    res = {r.doc_id: r.budget_keep for r in got.collect()}
    assert set(res.values()) <= {0, 1}
    assert all(res[i] == 0 for i, _, lang in rows if lang == "de")
    # oracle: replay the prefix in python over the same hash order
    hashed = {r.doc_id: r.h for r in docs.select(
        "doc_id", _salted_h60("budget:").alias("h")).collect()}
    en = sorted(((hashed[i], i, (0 if t is None else len(t.split()))) 
                 for i, t, lang in rows if lang == "en"))
    cum, expect = 0, {}
    for h, i, n in en:
        cum += n
        expect[i] = 1 if cum <= budgets["en"] else 0
    assert {i: res[i] for i in expect} == expect
    # the boundary binds: something kept, something dropped
    assert 0 < sum(expect.values()) < len(expect)
    # layout independence
    again = {r.doc_id: r.budget_keep for r in
             token_budget_cap(docs.repartition(13), budgets,
                              n_buckets=8).collect()}
    assert again == res
    # scalar budget applies to every stratum; n_buckets validation
    sc = token_budget_cap(docs, 50, n_buckets=4)
    per = {r.lang: r.n for r in
           sc.where("budget_keep = 1")
             .groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert per.get("en", 0) > 0 and per.get("de", 0) > 0
    import pytest as _pytest
    with _pytest.raises(ValueError, match="power of two"):
        token_budget_cap(docs, 50, n_buckets=6)


def test_token_budget_two_level_equals_naive_window(spark):
    """The scale-shaped two-level bucketed prefix must equal the naive
    one-stratum-one-partition window bit-for-bit (the DuckDB oracle
    pins this cross-engine; this pins it within Spark so a bucketing
    regression can't hide behind the oracle's own window)."""
    from agnostic_blockchain_etl_spark.operators.corpus import (
        _salted_h60, token_budget_cap)
    from agnostic_blockchain_etl_spark.operators.mixture import _n_tokens
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    rows = [(i, " ".join(["w"] * (1 + i % 7)),
             ["en", "es", "de"][i % 3]) for i in range(200)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string")
    two = {r.doc_id: r.budget_keep for r in
           token_budget_cap(docs, 80, n_buckets=16).collect()}
    w = Window.partitionBy("lang").orderBy(_salted_h60("budget:"),
                                           "doc_id") \
              .rowsBetween(Window.unboundedPreceding, 0)
    naive = {r.doc_id: r.k for r in docs.select(
        "doc_id",
        (F.sum(_n_tokens("text").cast("long")).over(w) <= 80)
        .cast("int").alias("k")).collect()}
    assert two == naive


def test_compose_corpus_mix_phases(spark):
    """compose_corpus_mix: the plan is computed over SURVIVORS only
    (keep=0 rows cannot drag a stratum's share), budgets cap only what
    keep x mix kept, final_keep is the conjunction, every row survives
    (flag-don't-drop), and omitted stages attach neutral flags."""
    from agnostic_blockchain_etl_spark.operators.mixture import (
        compose_corpus_mix)
    from pyspark.sql import functions as F
    # en: 40 surviving docs x5 tokens; es: 20 x5; plus keep=0 noise
    # whose strata would skew the plan if it leaked in
    rows = ([(i, "a b c d e", "en", 1) for i in range(40)]
            + [(100 + i, "a b c d e", "es", 1) for i in range(20)]
            + [(200 + i, "x " * 200, "en", 0) for i in range(30)])
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, keep int")
    ann, report = compose_corpus_mix(
        docs, target={"en": 1, "es": 1}, token_budgets={"en": 60,
                                                        "es": 1000})
    assert ann.count() == len(rows)                      # no row loss
    got = ann.collect()
    assert all(r.final_keep <= r.keep for r in got)
    assert all(r.budget_keep <= r.keep * r.mix_keep for r in got)
    # plan over survivors: es (100 tokens) is the bottleneck at 1:1 vs
    # en's 200 -> es rate 1.0, en rate 0.5
    rep = {r.stratum: r for r in report.collect()}
    assert rep["es"].rate == 1.0 and abs(rep["en"].rate - 0.5) < 1e-9
    # realized tokens respect the budgets exactly
    assert rep["en"].final_tokens <= 60
    assert rep["es"].final_tokens <= 1000
    assert rep["en"].n_final > 0 and rep["es"].n_final > 0
    # keep=0 rows never pass any stage
    assert all(r.final_keep == 0 for r in got if r.keep == 0)
    # budget-only composition: mix flag neutral
    ann2, rep2 = compose_corpus_mix(docs, token_budgets=30)
    g2 = {r.doc_id: r for r in ann2.collect()}
    assert all(r.mix_keep == 1 for r in g2.values())
    t2 = {r.stratum: r.final_tokens for r in rep2.collect()}
    assert t2["en"] <= 30 and t2["es"] <= 30
    # no-stage composition: final_keep == keep
    ann3, _ = compose_corpus_mix(docs)
    assert all(r.final_keep == r.keep for r in ann3.collect())
    # temperature regime + both-given rejection
    ann4, rep4 = compose_corpus_mix(docs, alpha=0.5)
    assert {r.stratum for r in rep4.collect()} == {"en", "es"}
    import pytest as _pytest
    with _pytest.raises(ValueError, match="not both"):
        compose_corpus_mix(docs, target={"en": 1}, alpha=0.5)


def test_compose_persist_materializes_once(spark):
    """compose_corpus_mix(persist=True) is the phase boundary: report
    and output aggregate ONE materialization — consuming both must not
    replay the mix+budget pipeline (multi-action rule; the accumulator
    template from test_text_embed). Without persist the second action
    recomputes the corpus DAG; with it, the post-report action adds
    ZERO upstream evaluations."""
    from agnostic_blockchain_etl_spark.operators.mixture import (
        compose_corpus_mix)
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType
    acc = spark.sparkContext.accumulator(0)

    def tick(x):
        acc.add(1)
        return x

    tick_udf = F.udf(tick, StringType())
    docs = spark.createDataFrame(
        [(i, "a b c d e", ["en", "es"][i % 2], 1) for i in range(20)],
        "doc_id long, text string, lang string, keep int") \
        .withColumn("text", tick_udf("text"))
    ann, report = compose_corpus_mix(
        docs, target={"en": 1, "es": 1}, token_budgets=40, persist=True)
    try:
        report.collect()           # populates the phase-boundary cache
        mid = acc.value
        assert ann.count() == 20   # served from cache:
        assert acc.value == mid    # zero new corpus evaluations
        ann.collect()
        assert acc.value == mid
    finally:
        ann.unpersist()


@pytest.mark.heavy
def test_epoch_upsample_semantics(spark):
    """epoch_upsample: floor(r) guaranteed copies + one more with
    hash-prob frac(r); integer rates are exact (u > 0 strictly);
    rate < 1 degrades to apply_mixture_rates-style fractional keep;
    absent strata emit nothing; epoch indices are 1..copies; a plan
    frame works as the rates input; negative rates raise; membership
    is layout-independent."""
    from agnostic_blockchain_etl_spark.operators.mixture import (
        epoch_upsample, mixture_weights)
    from pyspark.sql import functions as F
    rows = [(i, ["en", "zh", "de", "es"][i % 4], "w " * 5)
            for i in range(400)]
    docs = spark.createDataFrame(rows,
                                 "doc_id long, lang string, text string")
    rates = {"en": 2.3, "zh": 1.0, "de": 0.5}
    out = epoch_upsample(docs.select("doc_id", "lang"), rates)
    per = {r.lang: r.cnt for r in
           out.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    assert "es" not in per                        # no rate -> emits 0
    assert per["zh"] == 100                       # x1.0 exact
    assert 200 <= per["en"] <= 300                # 2 + Bernoulli(0.3)
    assert 0 < per["de"] < 100                    # pure fractional
    # per-doc contract: copies is floor(r) or floor(r)+1, epochs 1..c
    g = {r.doc_id: r.epochs for r in
         out.groupBy("doc_id")
            .agg(F.sort_array(F.collect_list("epoch")).alias("epochs"))
            .collect()}
    for doc_id, lang, _ in rows:
        c = len(g.get(doc_id, []))
        base = {"en": 2, "zh": 1, "de": 0, "es": 0}[lang]
        extra = {"en": 1, "zh": 0, "de": 1, "es": 0}[lang]
        assert base <= c <= base + extra, (doc_id, lang, c)
        if c:
            assert g[doc_id] == list(range(1, c + 1))
    # layout independence
    again = {r.doc_id: r.cnt for r in
             epoch_upsample(docs.select("doc_id", "lang")
                            .repartition(13), rates)
             .groupBy("doc_id").agg(F.count("*").alias("cnt")).collect()}
    assert again == {d: len(e) for d, e in g.items()}
    # a planner's frame feeds straight in (rates <= 1: pure dedup-side)
    plan = mixture_weights(docs, {"en": 1, "zh": 1})
    pout = epoch_upsample(docs.select("doc_id", "lang"), plan)
    assert pout.where("lang = 'de'").count() == 0   # unplanned -> 0
    assert pout.groupBy("doc_id").count().agg(F.max("count")) \
               .first()[0] == 1                     # r <= 1: no repeats
    import pytest as _pytest
    with _pytest.raises(ValueError, match="negative"):
        epoch_upsample(docs, {"en": -1.0})
    # NaN must fail like negative (float('nan') < 0 is False; unguarded
    # it would NULL the floor and silently zero the stratum's epochs)
    with _pytest.raises(ValueError, match="NaN"):
        epoch_upsample(docs, {"en": float("nan")})
    # a corrupted PLAN FRAME fails the same way, not silently
    bad_plan = spark.createDataFrame([("en", -1.0)],
                                     "stratum string, rate double")
    with _pytest.raises(ValueError, match="negative/NaN"):
        epoch_upsample(docs.select("doc_id", "lang"), bad_plan)


@pytest.mark.heavy
def test_tokens_col_threads_the_whole_composition(spark):
    """tokens_col: planning, capping, and the realized report all run
    on a precomputed (tokenizer) token column through one definition —
    a corpus whose n_bpe column equals another corpus's whitespace
    counts composes IDENTICALLY (flags and report), and NULL counts
    cost 0 like NULL text."""
    from agnostic_blockchain_etl_spark.operators.corpus import (
        token_budget_cap)
    from agnostic_blockchain_etl_spark.operators.mixture import (
        compose_corpus_mix, mixture_weights)
    from pyspark.sql import functions as F
    rows = [(i, ["en", "es"][i % 2], 3 + i % 5) for i in range(120)]
    rows += [(900, "en", None)]                    # NULL count: 0 cost
    # frame A: real text whose whitespace count == n_bpe; frame B: the
    # counts alone (text deliberately garbage — must be ignored)
    a = spark.createDataFrame(
        [(i, lang, None if n is None else " ".join(["w"] * n), 1)
         for i, lang, n in rows],
        "doc_id long, lang string, text string, keep int")
    b = spark.createDataFrame(
        [(i, lang, "XXX", n, 1) for i, lang, n in rows],
        "doc_id long, lang string, text string, n_bpe long, keep int")
    pa = {r.stratum: r for r in mixture_weights(
        a, {"en": 2, "es": 1}).collect()}
    pb = {r.stratum: r for r in mixture_weights(
        b, {"en": 2, "es": 1}, tokens_col="n_bpe").collect()}
    assert {s: (p.n_tokens, p.rate) for s, p in pa.items()} \
        == {s: (p.n_tokens, p.rate) for s, p in pb.items()}
    ka = {r.doc_id: r.budget_keep for r in
          token_budget_cap(a, {"en": 100, "es": 80}).collect()}
    kb = {r.doc_id: r.budget_keep for r in
          token_budget_cap(b, {"en": 100, "es": 80},
                           tokens_col="n_bpe").collect()}
    assert ka == kb and 0 < sum(ka.values()) < len(ka)
    ca, ra = compose_corpus_mix(a, target={"en": 2, "es": 1},
                                token_budgets=90)
    cb, rb = compose_corpus_mix(b, target={"en": 2, "es": 1},
                                token_budgets=90, tokens_col="n_bpe")
    fa = {r.doc_id: r.final_keep for r in ca.collect()}
    fb = {r.doc_id: r.final_keep for r in cb.collect()}
    assert fa == fb
    assert ({r.stratum: (r.n_final, r.final_tokens)
             for r in ra.collect()}
            == {r.stratum: (r.n_final, r.final_tokens)
                for r in rb.collect()})


def test_epoch_anchor_rates_straddle_one(spark):
    """allow_epochs=True (r10 verdict ask #4): token-preserving anchor
    — rate = target/share, emitted totals equal survivor totals, strata
    above their target downsample and strata below it exceed 1."""
    docs = _corpus(spark)          # shares en 60/105, de 30/105, fr 10/105
    out = {r["stratum"]: r
           for r in mixture_weights(docs, {"en": 2, "de": 1, "fr": 1},
                                    allow_epochs=True).collect()}
    assert out["xx"]["rate"] == 0.0
    # en share (60/105 ≈ .571) exceeds its target (.5) -> rate < 1;
    # de (.286 vs .25) also above target -> < 1... fr (.095 vs .25) -> > 1
    assert out["en"]["rate"] < 1.0
    assert out["fr"]["rate"] > 1.0
    # token preservation: sum of kept_tokens over targeted strata equals
    # the full corpus token total (xx's share is reabsorbed by the mix)
    total = sum(out[s]["n_tokens"] for s in out)
    kept = sum(out[s]["kept_tokens"] for s in ("en", "de", "fr"))
    assert kept == pytest.approx(total, rel=1e-4)
    # and the kept mix still follows the 2:1:1 target
    assert out["en"]["kept_tokens"] == pytest.approx(
        2 * out["de"]["kept_tokens"], rel=1e-4)


def test_compose_allow_epochs_routes_both_regimes(spark):
    """One compose(allow_epochs=True) call: downsampled strata keep the
    one-row-per-row flag contract (epoch 1), upsampled strata repeat
    surviving rows with a 1-based epoch index; dropped (keep=0) rows
    pass through once, unrepeated; the two routes agree with calling
    the underlying operators directly on the same plan."""
    from pyspark.sql import functions as F

    from agnostic_blockchain_etl_spark.operators.mixture import (
        apply_mixture_rates, compose_corpus_mix, epoch_upsample)
    rows = []
    did = 0
    for lang, docs, words in (("en", 20, 10), ("fr", 4, 10)):
        for _ in range(docs):
            did += 1
            rows.append((did, " ".join(["w"] * words), lang,
                         0 if did % 7 == 0 else 1))  # doc 21 = fr, keep 0
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, keep int")
    target = {"en": 0.5, "fr": 0.5}   # fr is tiny -> rate > 1, en < 1
    out, report = compose_corpus_mix(d, target=target, allow_epochs=True)
    got = out.collect()
    plan = {r["stratum"]: r["rate"] for r in report.collect()}
    assert plan["en"] < 1.0 < plan["fr"]
    # en rows: exactly one row each, epoch 1, mix flag 0/1
    en = [r for r in got if r.lang == "en"]
    assert len(en) == 20 and all(r.epoch == 1 for r in en)
    # fr keep=0 rows: one row, unrepeated
    fr_dead = [r for r in got if r.lang == "fr" and r.keep == 0]
    assert len(fr_dead) == 1 and fr_dead[0].epoch == 1
    # fr survivors: every copy count >= floor(rate) >= 1, epochs 1..n
    fr_live = {}
    for r in got:
        if r.lang == "fr" and r.keep == 1:
            fr_live.setdefault(r.doc_id, []).append(r.epoch)
    import math
    for doc_id, epochs in fr_live.items():
        assert sorted(epochs) == list(range(1, len(epochs) + 1))
        assert len(epochs) >= math.floor(plan["fr"])
        assert len(epochs) <= math.ceil(plan["fr"])
    # route-equivalence: the composed output matches the underlying
    # operators applied manually with the same plan + salt
    plan_df = spark.createDataFrame(
        [(s, r) for s, r in plan.items()], "stratum string, rate double")
    manual_en = apply_mixture_rates(d.where(F.col("lang") == "en"),
                                    plan_df)
    want_en = {(r.doc_id, r.mix_keep) for r in manual_en.collect()}
    assert {(r.doc_id, r.mix_keep) for r in en} == want_en
    manual_fr = epoch_upsample(
        d.where((F.col("lang") == "fr") & (F.col("keep") == 1)),
        plan_df, salt="mixture:")
    want_fr = {}
    for r in manual_fr.collect():
        want_fr.setdefault(r.doc_id, []).append(r.epoch)
    assert {k: sorted(v) for k, v in fr_live.items()} == \
        {k: sorted(v) for k, v in want_fr.items()}
    # final_keep conjunction holds on the expanded frame
    assert all((r.final_keep == 1) == (r.keep == 1 and r.mix_keep == 1)
               for r in got)


def test_compose_allow_epochs_validation(spark):
    from agnostic_blockchain_etl_spark.operators.mixture import \
        compose_corpus_mix
    d = spark.createDataFrame(
        [(1, "w w", "en", 1)],
        "doc_id long, text string, lang string, keep int")
    with pytest.raises(ValueError):       # epochs need a mix regime
        compose_corpus_mix(d, allow_epochs=True)
    with pytest.raises(ValueError):       # budgets cap BEFORE epochs
        compose_corpus_mix(d, target={"en": 1.0}, token_budgets=10,
                           allow_epochs=True)
