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

One groupBy over the corpus plus scalar normalization. The stratum
table is tiny (|languages| × |sources| rows) and the planner must
VALIDATE it (an unsatisfiable target is a config error, not a plan),
so it is materialized once — a bounded collect, |strata| rows — and
rebuilt as a literal frame: the share/rate windows then run over the
literal, the corpus is scanned exactly once per plan, and the plan
frame downstream consumers join against carries no corpus lineage to
recompute (the repo's recompute-multiplier rule for multi-consumer
artifacts). Rates are deterministic arithmetic; pair with the
hash-based ``corpus_stratified_sample`` (never rand()) to apply them
reproducibly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _n_tokens(text_col: str):
    """Whitespace token count, NULL-safe: ``size(split(NULL))`` is -1
    under Spark's default sizeOfNull, so a null-text (metadata-only)
    document would SUBTRACT from its stratum's token total — and an
    all-null stratum would go negative, breaking every share/rate
    downstream. Null text counts 0 tokens."""
    return F.when(F.col(text_col).isNull(), F.lit(0)).otherwise(
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")))


def _token_expr(text_col: str, tokens_col: str | None):
    """The per-document token COST every composition stage shares:
    whitespace count of ``text_col`` by default, or a caller-supplied
    precomputed ``tokens_col`` (REAL tokenizer counts — e.g.
    `bpe.bpe_encode` lengths persisted next to the text) when budgets
    and mixes must be tokenizer-accurate rather than
    whitespace-approximate. NULL costs 0 either way, and the whole
    family (`stratum_counts`, both planners, `token_budget_cap`,
    `compose_corpus_mix`) resolves through HERE, so a recipe that
    plans on tokenizer counts caps on the same counts — no drift."""
    if tokens_col is not None:
        return F.coalesce(F.col(tokens_col).cast("long"),
                          F.lit(0).cast("long"))
    return _n_tokens(text_col).cast("long")


def stratum_counts(docs: DataFrame, strat_col: str = "lang",
                   text_col: str = "text",
                   tokens_col: str | None = None) -> DataFrame:
    """One corpus aggregation → the per-stratum ``(stratum, n_docs,
    n_tokens)`` table, materialized as a literal frame. The collect is
    bounded by stratum cardinality (a knob-free contract:
    |languages| × |sources|), never by corpus size; rebuilding via
    ``createDataFrame`` severs the corpus lineage so every downstream
    consumer of the plan (the apply-join, repeated collects in tests)
    reuses the |strata|-row literal instead of re-scanning the corpus.

    Public so several planners can share ONE corpus scan: pass the
    result as ``counts=`` to `mixture_weights` /
    `temperature_mixture` when planning multiple mixes over the same
    corpus (the gate row plans a targeted AND a temperature mix from
    one aggregation this way). The planners validate the column set of
    a provided ``counts=`` frame; that it was built over the SAME
    ``strat_col``/``text_col`` as the plan call is the caller's
    contract — a mismatched stratification is not detectable from the
    frame. ``tokens_col``: plan on precomputed (tokenizer) token
    counts instead of the whitespace default — see `_token_expr`."""
    frame, _ = _stratum_counts(docs, strat_col, text_col,
                               tokens_col=tokens_col)
    return frame


def _stratum_counts(docs: DataFrame, strat_col: str, text_col: str,
                    counts: DataFrame | None = None,
                    tokens_col: str | None = None):
    """`stratum_counts` as ``(literal_frame, collected_rows)``; with
    ``counts`` given (a prior `stratum_counts` result — a bounded
    literal), skips the corpus aggregation and just re-collects the
    literal. The provided frame's column set is validated (schema-only,
    no job) so a frame that is not a `stratum_counts` result fails
    loudly here instead of planning a wrong mix; a counts frame built
    over a DIFFERENT strat_col/text_col is semantically undetectable —
    that contract stays with the caller (see `stratum_counts`)."""
    if counts is not None:
        expected = {"stratum", "n_docs", "n_tokens"}
        if set(counts.columns) != expected:
            raise ValueError(
                "counts= must be a stratum_counts() result with columns "
                f"{sorted(expected)}, got {sorted(counts.columns)}")
        rows = counts.collect()    # collecting a literal: no corpus scan
        return counts, rows
    n_tokens = _token_expr(text_col, tokens_col)
    per = (docs
           .select(F.col(strat_col).alias("stratum"),
                   n_tokens.alias("t"))
           .groupBy("stratum")
           .agg(F.count("*").alias("n_docs"),
                F.sum("t").cast("long").alias("n_tokens")))
    rows = per.collect()
    return docs.sparkSession.createDataFrame(rows, per.schema), rows


def mixture_weights(docs: DataFrame, target: dict[str, float],
                    strat_col: str = "lang",
                    text_col: str = "text",
                    on_unsatisfiable: str = "raise",
                    counts: DataFrame | None = None,
                    tokens_col: str | None = None,
                    allow_epochs: bool = False) -> DataFrame:
    """Per-stratum plan: ``(stratum, n_docs, n_tokens, share,
    target_share, rate, kept_tokens)``. Strata absent from ``target``
    get rate 0 (dropped); target shares are normalized to sum to 1, so
    callers can pass unnormalized proportions.

    A TARGETED stratum the corpus cannot supply — absent entirely, or
    present with zero tokens (all-null/empty text) — makes the mix
    unsatisfiable. Under the default ``on_unsatisfiable="raise"`` that
    is a ``ValueError`` naming the strata: the planner decides the
    final corpus composition, and silently emitting a degenerate plan
    (the old behavior zeroed EVERY rate when a present stratum had no
    tokens, yet ignored a wholly absent one — an inconsistent,
    easy-to-miss failure) ships an empty or mis-mixed corpus.
    ``on_unsatisfiable="ignore"`` plans the remaining mix as if the
    unsupplied strata were never targeted: they are excluded from the
    bottleneck the way absent strata always were, AND the target
    shares renormalize over the supplied strata only — so the reported
    ``target_share`` column matches the mix the rates actually achieve
    (a plan advertising shares its own rates cannot deliver would fail
    any downstream kept-tokens-vs-target validation forever).

    ``allow_epochs=True`` switches the rate anchor from the bottleneck
    (max rate exactly 1 — a pure downsampling plan) to the
    TOKEN-PRESERVING constant c=1: ``rate_s = target_s / share_s``, so
    the emitted token total equals the survivor total while hitting
    the mix — strata above their target share downsample (< 1) and
    strata below it repeat via epochs (> 1). Apply such a plan through
    `compose_corpus_mix(allow_epochs=True)` (or `epoch_upsample`
    directly), never `apply_mixture_rates` alone — a rate above 1 is
    a repetition count, not a keep probability."""
    if on_unsatisfiable not in ("raise", "ignore"):
        raise ValueError(
            f"on_unsatisfiable must be 'raise' or 'ignore',"
            f" got {on_unsatisfiable!r}")
    per, rows = _stratum_counts(docs, strat_col, text_col, counts,
                                tokens_col=tokens_col)
    supply = {r["stratum"]: r["n_tokens"] for r in rows}
    unsupplied = {s for s, v in target.items()
                  if v > 0 and supply.get(s, 0) <= 0}
    if unsupplied and on_unsatisfiable == "raise":
        raise ValueError(
            f"unsatisfiable mixture target: strata {sorted(unsupplied)} "
            "are targeted but hold zero tokens in the corpus (absent, "
            "or all-null/empty text); pass on_unsatisfiable='ignore' "
            "to plan the remaining mix without them")
    eff = {s: v for s, v in target.items() if s not in unsupplied}
    tot_target = sum(eff.values())
    if eff and tot_target > 0:
        tmap = F.create_map(*[F.lit(x) for kv in eff.items()
                              for x in (kv[0], kv[1] / tot_target)])
        tgt = F.coalesce(tmap[F.col("stratum")], F.lit(0.0))
    else:
        # every targeted stratum unsupplied (ignore mode): an honest
        # all-zero plan — nothing is kept, and target_share says so
        tgt = F.lit(0.0)
    w = Window.partitionBy()  # the stratum table is tiny — see module doc
    # ANSI-safe division guards (Spark 4 defaults ANSI on, where /0 is
    # an ArithmeticException, not NULL): an all-empty corpus never
    # divides, and a zero-token stratum contributes no bottleneck term
    total_t = F.sum("n_tokens").over(w)
    share = F.when(total_t > 0,
                   F.col("n_tokens") / total_t).otherwise(F.lit(0.0))
    # bottleneck m = min over targeted SUPPLIED strata of share/target;
    # rate_s = (target_s / share_s) * m  →  max rate is exactly 1, kept
    # shares proportional to target. Zero-token targeted strata are
    # excluded from m exactly like absent ones (the validation above
    # already raised unless the caller opted into that consistency).
    if allow_epochs:
        rate = F.when((tgt > 0) & (share > 0),
                      tgt / share).otherwise(F.lit(0.0))
    else:
        m = F.min(F.when((tgt > 0) & (share > 0), share / tgt)).over(w)
        rate = F.when((tgt > 0) & (share > 0),
                      tgt / share * m).otherwise(F.lit(0.0))
    return (per.select(
        "stratum", "n_docs", "n_tokens",
        F.round(share, 6).alias("share"),
        F.round(tgt, 6).alias("target_share"),
        F.round(rate, 6).alias("rate"),
        F.round(F.col("n_tokens") * rate, 2).alias("kept_tokens")))


def temperature_mixture(docs: DataFrame, alpha: float,
                        strat_col: str = "lang",
                        text_col: str = "text",
                        counts: DataFrame | None = None,
                        tokens_col: str | None = None,
                        allow_epochs: bool = False) -> DataFrame:
    """Temperature-based resampling rates (the multilingual pre-training
    practice of mBERT / XLM-R, Conneau et al. 2020: sample stratum s
    with probability ``q_s^alpha / Σ_t q_t^alpha`` where ``q_s`` is the
    corpus token share): ``alpha < 1`` flattens the mix — low-resource
    strata are upweighted relative to their raw share — and
    ``alpha = 1`` keeps the corpus as-is. Returns the same plan frame
    as :func:`mixture_weights` with the temperature-implied target.

    Same scale shape: one corpus aggregation (materialized like
    `mixture_weights` — bounded |strata|-row literal, no corpus
    lineage in the plan). The rate vector is the token-maximal one
    hitting the implied mix (bottleneck stratum at rate 1), ready for
    hash-deterministic application via `apply_mixture_rates` /
    `corpus.stratified_sample`; rates are computed normalization-free
    (the q^alpha sum cancels — see inline note), which makes them
    cross-engine bit-reproducible at alpha=0.5 (sqrt path) — the
    `mixture_apply` gate row's temperature facet."""
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    per, _ = _stratum_counts(docs, strat_col, text_col, counts,
                             tokens_col=tokens_col)
    w = Window.partitionBy()
    # same ANSI-safe guards as mixture_weights: zero-token strata get
    # share/tgt/rate 0 instead of a DIVIDE_BY_ZERO ArithmeticException
    total_t = F.sum("n_tokens").over(w)
    share = F.when(total_t > 0,
                   F.col("n_tokens") / total_t).otherwise(F.lit(0.0))
    # alpha=0.5 (the canonical flattening temperature) goes through
    # sqrt, which IEEE-754 REQUIRES to be correctly rounded — pow is
    # libm-approximate (±1 ulp, engine-dependent), so sqrt is both
    # more accurate and cross-engine reproducible (what lets the
    # mixture_apply gate row value-verify this planner in DuckDB)
    powered = (F.sqrt(share) if float(alpha) == 0.5
               else F.pow(share, F.lit(float(alpha))))
    # the RATE path is normalization-free: with p = share^alpha and
    # tgt = p/Z, rate = tgt/share * min(share/tgt) — the constant
    # Z = sum(p) cancels algebraically, so computing
    # rate = p/share * min(share/p) directly drops a whole division
    # chain of rounding error AND the order-dependent double summation
    # (window SUM over doubles adds in row order; engines disagree in
    # the last ulp). Z survives only in the REPORTED target_share.
    total_p = F.sum(powered).over(w)
    tgt = F.when(total_p > 0, powered / total_p).otherwise(F.lit(0.0))
    if allow_epochs:
        # token-preserving anchor (see mixture_weights): rate =
        # tgt/share — here the Z = sum(p) normalization does NOT
        # cancel, so epoch-mode temperature rates carry the window
        # sum; the plan frame's round-6 rate (what application joins
        # against) keeps them engine-reproducible regardless
        rate = F.when(share > 0, tgt / share).otherwise(F.lit(0.0))
    else:
        m = F.min(F.when(share > 0, share / powered)).over(w)
        rate = F.when(share > 0,
                      powered / share * m).otherwise(F.lit(0.0))
    return (per.select(
        "stratum", "n_docs", "n_tokens",
        F.round(share, 6).alias("share"),
        F.round(tgt, 6).alias("target_share"),
        F.round(rate, 6).alias("rate"),
        F.round(F.col("n_tokens") * rate, 2).alias("kept_tokens")))


def compose_corpus_mix(annotated: DataFrame,
                       target: dict[str, float] | None = None,
                       alpha: float | None = None,
                       token_budgets: int | dict[str, int] | None = None,
                       strat_col: str = "lang",
                       text_col: str = "text",
                       keep_col: str = "keep",
                       on_unsatisfiable: str = "raise",
                       persist: bool = False,
                       tokens_col: str | None = None,
                       allow_epochs: bool = False,
                       report_realized: bool = True
                       ) -> tuple[DataFrame, DataFrame]:
    """The COMPOSITION phase after curation: given `curate_corpus`'s
    annotated frame (or any frame with ``doc_id``/``text``/strata and a
    0/1 ``keep`` conjunction), decide what the training corpus actually
    contains — a proportional mix (``target`` → `mixture_weights`, or
    ``alpha`` → `temperature_mixture`) and/or absolute per-stratum
    ``token_budgets`` (→ `corpus.token_budget_cap`) — and return
    ``(annotated', report)``.

    The plan is computed over the SURVIVORS (``keep_col`` = 1): planning
    over the raw corpus would mint rates the earlier filters already
    invalidated, so the achieved mix would drift from the target by
    exactly the filters' per-stratum attrition. Flags compose without
    re-joins: ``mix_keep`` is hash-deterministic per doc, budgets see
    only rows with ``keep × mix_keep`` = 1 (`token_budget_cap`'s
    ``eligible_col`` — ineligible rows cost 0 tokens and flag 0), and
    ``final_keep = keep × mix_keep × budget_keep``. Omitted stages
    attach neutral flags (1 wherever ``keep`` is 1) — flag-don't-drop,
    one row out per row in.

    ``report``: one row per stratum — plan columns (share/target/rate
    where a mix was planned) plus the REALIZED ``n_final`` /
    ``final_tokens``, the numbers a capacity plan checks against the
    target.

    Scale: one survivor aggregation for the plan (bounded literal), a
    broadcast join to apply it, and the budget pass's bounded windows —
    the corpus is never shuffled on a data-sized key. ``persist=True``
    caches the annotated frame at the phase boundary so consuming both
    the report AND the output runs the pipeline once (multi-action
    rule; at 100 TB prefer writing the output to parquet).

    ``tokens_col``: run the WHOLE phase — plan shares, budget caps,
    realized report — on a precomputed token-count column (real
    tokenizer counts, e.g. `bpe.bpe_encode` lengths) instead of the
    whitespace default; one definition end-to-end (`_token_expr`), so
    the plan and the cap can never disagree about what a token is.

    ``allow_epochs=True`` unifies the two mixture regimes (r10 verdict
    ask #4): the planner runs with the token-preserving anchor (see
    `mixture_weights(allow_epochs=True)`), so rates straddle 1, and
    application ROUTES by stratum — rate ≤ 1 strata through
    `apply_mixture_rates` (one row out per row in, ``epoch`` = 1),
    rate > 1 strata through `epoch_upsample` (surviving rows REPEAT
    with ``epoch`` = 1..n; rows the curation already dropped pass
    through once, unrepeated). Both draws share the ``mixture:`` hash
    salt, so the fractional decision is one primitive across regimes.
    The output contract gains an ``epoch`` column everywhere (1 for
    every non-repeated row) and is otherwise identical; the realized
    report counts emitted (post-repetition) rows and tokens. Epoch
    expansion is the LAST physical pass of a recipe by the module's
    own convention, so ``token_budgets`` cannot be combined with it —
    cap in a prior compose call, then epoch-expand."""
    if target is not None and alpha is not None:
        raise ValueError("pass target= or alpha=, not both (chain two "
                         "compose calls to stack regimes)")
    if allow_epochs and target is None and alpha is None:
        raise ValueError("allow_epochs=True needs a mix regime "
                         "(target= or alpha=)")
    if allow_epochs and token_budgets is not None:
        raise ValueError(
            "allow_epochs=True cannot be combined with token_budgets: "
            "epoch repetition is the last physical pass — cap budgets "
            "in a prior compose call, then epoch-expand the result")
    out = annotated
    if target is not None or alpha is not None:
        cost_col = tokens_col if tokens_col is not None else text_col
        survivors = out.where(F.col(keep_col) == 1) \
                       .select("doc_id", strat_col, cost_col)
        counts = stratum_counts(survivors, strat_col, text_col,
                                tokens_col=tokens_col)
        plan = (mixture_weights(survivors, target, strat_col=strat_col,
                                text_col=text_col,
                                on_unsatisfiable=on_unsatisfiable,
                                counts=counts, allow_epochs=allow_epochs)
                if target is not None else
                temperature_mixture(survivors, alpha, strat_col=strat_col,
                                    text_col=text_col, counts=counts,
                                    allow_epochs=allow_epochs))
        if allow_epochs:
            # route by stratum rate: the plan is a bounded literal, so
            # collecting the |strata| rate rows is a no-scan job
            gt1 = sorted(r["stratum"] for r in
                         plan.select("stratum", "rate").collect()
                         if r["rate"] > 1.0)
            is_gt = (F.col(strat_col).isin(gt1) if gt1 else F.lit(False))
            le = apply_mixture_rates(
                out.where(~F.coalesce(is_gt, F.lit(False))),
                plan, strat_col=strat_col) \
                .withColumn("epoch", F.lit(1).cast("int"))
            gt = out.where(F.coalesce(is_gt, F.lit(False)))
            # surviving rows of upsampled strata repeat (rate > 1 ⇒
            # floor ≥ 1 ⇒ epoch_upsample drops nothing here); rows
            # curation dropped pass through once — repeating a dead
            # row would inflate the frame with final_keep=0 copies
            gt_kept = epoch_upsample(gt.where(F.col(keep_col) == 1),
                                     plan, strat_col=strat_col,
                                     salt="mixture:") \
                .withColumn("mix_keep", F.lit(1).cast("int"))
            gt_dead = (gt.where(~(F.col(keep_col) == 1)
                                | F.col(keep_col).isNull())
                       .withColumn("mix_keep", F.lit(1).cast("int"))
                       .withColumn("epoch", F.lit(1).cast("int")))
            out = le.unionByName(gt_kept).unionByName(gt_dead)
        else:
            out = apply_mixture_rates(out, plan, strat_col=strat_col)
    else:
        plan = None   # no mix stage: neutral flag, curate's convention
        out = out.withColumn("mix_keep", F.lit(1))
    out = out.withColumn("__elig",
                         (F.col(keep_col) * F.col("mix_keep"))
                         .cast("int"))
    if token_budgets is not None:
        from .corpus import token_budget_cap
        out = token_budget_cap(out, token_budgets, strat_col=strat_col,
                               text_col=text_col, eligible_col="__elig",
                               tokens_col=tokens_col)
    else:
        out = out.withColumn("budget_keep", F.col("__elig"))
    out = (out.withColumn("final_keep",
                          (F.col(keep_col) * F.col("mix_keep")
                           * F.col("budget_keep")).cast("int"))
           .drop("__elig"))
    if persist:
        # one composition DAG, two consumers: `report` aggregates the
        # SAME lineage as `out`, so a caller that reads the report and
        # then writes `final_keep = 1` (the README recipe — every real
        # caller) replays the whole mix+budget pipeline, including
        # `token_budget_cap`'s corpus-wide (stratum, bucket) shuffle,
        # once per action. Opt-in cache at the phase boundary, same
        # convention as `curate_corpus(persist=)`; at 100 TB write
        # `out` to parquet and read it back instead (the capstone flow
        # in test_full_corpus_flow.py).
        out = out.persist()
    if not report_realized and plan is not None:
        # plan-only report (r11 opt round): the realized columns
        # aggregate the SAME lineage as `out`, so a consumer that only
        # reads the PLAN columns (stratum/share/rate — e.g. a rate
        # join) would pay a full recompute of the composed output
        # (epoch explode + tokenize) purely for the full-outer join's
        # row membership, which Catalyst cannot prune away. The plan
        # frame is a bounded literal with no corpus lineage; rates are
        # identical — only n_final/final_tokens are absent.
        return out, plan
    realized = (out.groupBy(F.col(strat_col).alias("stratum"))
                .agg(F.sum("final_keep").alias("n_final"),
                     F.sum(F.when(F.col("final_keep") == 1,
                                  _token_expr(text_col, tokens_col))
                           .otherwise(F.lit(0))).cast("long")
                     .alias("final_tokens")))
    report = realized if plan is None else \
        plan.join(realized, "stratum", "full_outer")
    return out, report


def epoch_upsample(docs: DataFrame,
                   rates: dict[str, float] | DataFrame,
                   strat_col: str = "lang",
                   salt: str = "epoch:") -> DataFrame:
    """Mixture rates ABOVE 1 — epoch-based upsampling (the LLaMA /
    Gopher recipe practice of giving low-resource or high-value strata
    several epochs per training run, e.g. "books ×2.3, wikipedia ×4"):
    a document in a stratum with rate ``r`` is emitted ``floor(r)``
    times plus one more iff ``u(doc_id) <= r - floor(r)``, so every
    stratum's EXPECTED token multiplier is exactly ``r`` and the
    realized multiplier is within one document of exact per stratum.
    Rates below 1 degrade to `apply_mixture_rates` semantics (0 full
    copies + a fractional draw — the same keep rule, same hash
    family), so one operator covers the whole r ∈ [0, ∞) recipe line.

    The extra-copy draw is hash-deterministic per doc_id (never
    ``rand()``): re-runs, engines, and partitionings agree, and new
    corpus rows never re-draw old ones. Output adds ``epoch`` (1-based
    copy index) and CONTAINS REPEATED ROWS BY DESIGN — this is the
    physical repetition pass a training-data writer runs last, after
    every keep-flag stage (it is the one operator in this module that
    is not flag-don't-drop: rate-0 strata emit nothing; run it on the
    ``final_keep = 1`` slice). When shard-writing a repeated corpus,
    key the writer by a COMPOSITE of (doc_id, epoch) — e.g.
    ``withColumn("rep_key", concat_ws(":", "doc_id", "epoch"))`` then
    ``write_training_shards(..., key_col="rep_key", shuffle_salt=...)``
    — both the shard assignment and the in-shard shuffle order hash
    ``key_col``, so keying by bare doc_id would CLUSTER all copies of
    a document into one shard, adjacent to each other (the opposite of
    what epoch repetition wants).

    ``rates`` is a ``{stratum: multiplier}`` dict or a plan frame with
    ``(stratum, rate)`` (any `mixture_weights` / `temperature_mixture`
    output works — their rates are ≤ 1 by construction; pass hand
    multipliers for upsampling). Strata absent from ``rates`` get 0.

    Scale: the rate rides a broadcast (map literal or |strata|-row
    frame); copies come from ``explode(sequence(1, n))`` — per-row
    array work, ZERO shuffle; output size is Σ r_s·|s|, the number a
    capacity plan already budgets for the training run."""
    import math

    from .corpus import _salted_u60
    if isinstance(rates, dict):
        # NaN needs its own test: float('nan') < 0 is False, and a NaN
        # rate downstream makes floor() NULL -> the stratum silently
        # emits nothing instead of failing loudly
        bad = {k: v for k, v in rates.items()
               if float(v) < 0 or math.isnan(float(v))}
        if bad:
            raise ValueError(f"negative/NaN upsample rates: {bad}")
        if rates:
            rmap = F.create_map(*[F.lit(x) for kv in rates.items()
                                  for x in (kv[0], float(kv[1]))])
            r = F.coalesce(rmap[F.col(strat_col)].cast("double"),
                           F.lit(0.0))
        else:
            r = F.lit(0.0)
        d = docs
    else:
        plan_rates = rates.select(F.col("stratum").alias(strat_col),
                                  F.col("rate").cast("double")
                                  .alias("__r"))
        # same validation as the dict path (a corrupted or mis-joined
        # plan must not silently zero a stratum's epochs): the plan
        # frame is |strata| rows by contract, so this is a bounded job
        bad_rows = (plan_rates
                    .where((F.col("__r") < 0) | F.isnan("__r"))
                    .limit(5).collect())
        if bad_rows:
            raise ValueError(
                "negative/NaN upsample rates in the plan frame: "
                + str([(r[strat_col], r["__r"]) for r in bad_rows]))
        d = docs.join(F.broadcast(plan_rates), strat_col, "left")
        r = F.coalesce(F.col("__r"), F.lit(0.0))
    u = _salted_u60(salt)
    copies = (F.floor(r).cast("int")
              + F.when(u <= r - F.floor(r), 1).otherwise(0).cast("int"))
    out = (d.withColumn("__copies", copies)
           .where(F.col("__copies") > 0)
           .withColumn("epoch",
                       F.explode(F.sequence(F.lit(1), F.col("__copies"))))
           .drop("__copies"))
    return out.drop("__r") if not isinstance(rates, dict) else out


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
    from .corpus import _salted_u60
    u = _salted_u60(salt)   # the single-sourced sampling primitive —
    #                         an inline copy here was the drift class
    #                         the round-6 review consolidated
    rates = plan.select(F.col("stratum").alias(strat_col),
                        F.col("rate").alias("__rate"))
    return (docs.join(F.broadcast(rates), strat_col, "left")
            .withColumn("mix_keep",
                        (u <= F.coalesce("__rate", F.lit(0.0)))
                        .cast("int"))
            .drop("__rate"))
