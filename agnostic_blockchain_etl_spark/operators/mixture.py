"""Domain-mixture weighting: given a target token-share per stratum
(language, source domain, ...), compute the per-stratum sampling rates
that hit the target mix exactly while keeping as much data as possible.

The pre-training recipe question ("30% code, 50% English web, 20%
multilingual") reduces to: find rates r_s ≤ 1 with kept-token shares
proportional to the target. The binding stratum is the one with the
smallest available/target ratio — it is kept at rate 1 and every other
stratum downsamples to match, so the solution maximizes total kept
tokens subject to the mix (any larger rate vector would break a share
or exceed 1 on the bottleneck).

One groupBy over the corpus plus scalar normalization — the stratum
table is tiny (|languages| × |sources| rows), so the normalization
terms ride a window over it rather than a driver collect. Rates are
deterministic arithmetic; pair with the hash-based
``corpus_stratified_sample`` (never rand()) to apply them
reproducibly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def mixture_weights(docs: DataFrame, target: dict[str, float],
                    strat_col: str = "lang",
                    text_col: str = "text") -> DataFrame:
    """Per-stratum plan: ``(stratum, n_docs, n_tokens, share,
    target_share, rate, kept_tokens)``. Strata absent from ``target``
    get rate 0 (dropped); target shares are normalized to sum to 1, so
    callers can pass unnormalized proportions."""
    tot_target = sum(target.values())
    tmap = F.create_map(*[F.lit(x) for kv in target.items()
                          for x in (kv[0], kv[1] / tot_target)])
    n_tokens = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    per = (docs
           .select(F.col(strat_col).alias("stratum"),
                   n_tokens.alias("t"))
           .groupBy("stratum")
           .agg(F.count("*").alias("n_docs"),
                F.sum("t").cast("long").alias("n_tokens")))
    w = Window.partitionBy()  # the stratum table is tiny — see module doc
    share = F.col("n_tokens") / F.sum("n_tokens").over(w)
    tgt = F.coalesce(tmap[F.col("stratum")], F.lit(0.0))
    # bottleneck m = min over targeted strata of share/target; rate_s =
    # (target_s / share_s) * m  →  max rate is exactly 1, kept shares
    # proportional to target
    m = F.min(F.when(tgt > 0, share / tgt)).over(w)
    rate = F.when(tgt > 0, tgt / share * m).otherwise(F.lit(0.0))
    return (per.select(
        "stratum", "n_docs", "n_tokens",
        F.round(share, 6).alias("share"),
        F.round(tgt, 6).alias("target_share"),
        F.round(rate, 6).alias("rate"),
        F.round(F.col("n_tokens") * rate, 2).alias("kept_tokens")))


def temperature_mixture(docs: DataFrame, alpha: float,
                        strat_col: str = "lang",
                        text_col: str = "text") -> DataFrame:
    """Temperature-based resampling rates (the multilingual pre-training
    practice of mBERT / XLM-R, Conneau et al. 2020: sample stratum s
    with probability ``q_s^alpha / Σ_t q_t^alpha`` where ``q_s`` is the
    corpus token share): ``alpha < 1`` flattens the mix — low-resource
    strata are upweighted relative to their raw share — and
    ``alpha = 1`` keeps the corpus as-is. Returns the same plan frame
    as :func:`mixture_weights` with the temperature-implied target.

    Same scale shape: one corpus aggregation; the stratum table is tiny
    so the normalizations ride windows over it. The rate vector is the
    token-maximal one hitting the implied mix (bottleneck stratum at
    rate 1), ready for hash-deterministic application via
    `corpus.stratified_sample`."""
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    n_tokens = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    per = (docs
           .select(F.col(strat_col).alias("stratum"), n_tokens.alias("t"))
           .groupBy("stratum")
           .agg(F.count("*").alias("n_docs"),
                F.sum("t").cast("long").alias("n_tokens")))
    w = Window.partitionBy()
    share = F.col("n_tokens") / F.sum("n_tokens").over(w)
    powered = F.pow(share, F.lit(float(alpha)))
    tgt = powered / F.sum(powered).over(w)
    m = F.min(share / tgt).over(w)
    rate = tgt / share * m
    return (per.select(
        "stratum", "n_docs", "n_tokens",
        F.round(share, 6).alias("share"),
        F.round(tgt, 6).alias("target_share"),
        F.round(rate, 6).alias("rate"),
        F.round(F.col("n_tokens") * rate, 2).alias("kept_tokens")))


def apply_mixture_rates(docs: DataFrame, plan: DataFrame,
                        strat_col: str = "lang",
                        salt: str = "mixture:") -> DataFrame:
    """Apply a `mixture_weights` / `temperature_mixture` plan to the
    corpus: adds ``mix_keep`` (1 iff the document survives its
    stratum's rate). Membership is hash-deterministic per doc_id
    (never ``rand()``), so the applied mix is reproducible across
    runs/engines/partitionings and new corpus rows never reshuffle old
    ones — the same contract as `corpus.stratified_sample`, with the
    rates computed instead of configured.

    Scale: the plan frame is |strata| rows → broadcast; the pass is one
    zero-shuffle projection over the corpus."""
    u = ((F.conv(F.substring(
            F.md5(F.concat(F.lit(salt), F.col("doc_id").cast("string"))
                  .cast("binary")),
            1, 15), 16, 10).cast("long") + 1) / F.lit(float(1 << 60)))
    rates = plan.select(F.col("stratum").alias(strat_col),
                        F.col("rate").alias("__rate"))
    return (docs.join(F.broadcast(rates), strat_col, "left")
            .withColumn("mix_keep",
                        (u <= F.coalesce("__rate", F.lit(0.0)))
                        .cast("int"))
            .drop("__rate"))
