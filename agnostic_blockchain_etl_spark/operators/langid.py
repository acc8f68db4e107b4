"""Character-n-gram language identification (Cavnar–Trenkle-style).

`textstats.text_stats` ships the cheap distinctive-stopword detector
(exact, oracle-paired). This is the heavier, more general n-gram
heuristic: per-language character-trigram profiles learned from a
labeled sample, detection by profile overlap — works on text whose
languages share no stopword list with the seed set, and on short
fragments where whole-word evidence is sparse.

Scale shape:

- **Training** is one distributed aggregation: explode char trigrams,
  count per (lang, trigram), keep the top-`profile_size` per language
  (window over the tiny per-language count table). The collected
  profiles are bounded at languages × profile_size rows — aggregate,
  not corpus.
- **Detection** broadcasts the profiles as array literals and scores
  every document with pure built-ins: distinct doc trigrams ∩ profile
  (`array_intersect`), argmax across languages with a deterministic
  first-wins tie order. Zero shuffle, zero Python — the whole detector
  is one projection, linear at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _char_trigrams(col, max_chars: int = 4000):
    """Distinct character trigrams of ``lower(col)``, capped at
    ``max_chars`` (language evidence saturates long before that; the cap
    bounds per-row work on degenerate megabyte documents)."""
    s = F.substring(F.lower(col), 1, max_chars)
    n = F.length(s)
    # guarded: Spark sequence AUTO-DESCENDS when start > stop (the
    # dedup._spark_shingles gotcha) — greatest(n-2, 0) still yields
    # sequence(1, 0) = [1, 0] for docs under 3 chars, emitting the
    # whole short string (or '') as junk "trigrams" that pollute
    # trained profiles and give short docs phantom language evidence
    idx = F.sequence(F.lit(1), n - 2)
    return F.when(n >= 3,
                  F.array_distinct(
                      F.transform(idx, lambda i: s.substr(i, F.lit(3))))) \
            .otherwise(F.array().cast("array<string>"))


def train_language_profiles(docs: DataFrame, lang_col: str = "lang",
                            text_col: str = "text",
                            profile_size: int = 300
                            ) -> dict[str, list[str]]:
    """{lang: [top trigrams by frequency]} — ONE distributed aggregation
    over the labeled sample; ties break lexicographically so profiles
    are deterministic across runs and partitionings."""
    from pyspark.sql import Window
    from .tables import spread
    tri = (spread(docs)
           .select(F.col(lang_col).alias("lang"),
                   F.explode(_char_trigrams(F.col(text_col))).alias("t"))
           .groupBy("lang", "t").agg(F.count("*").alias("c")))
    w = Window.partitionBy("lang").orderBy(F.col("c").desc(), "t")
    top = (tri.withColumn("rn", F.row_number().over(w))
           .where(F.col("rn") <= profile_size)
           .select("lang", "t", "rn").collect())
    profiles: dict[str, list[str]] = {}
    for r in sorted(top, key=lambda r: (r["lang"], r["rn"])):
        profiles.setdefault(r["lang"], []).append(r["t"])
    return profiles


def detect_language(docs: DataFrame, profiles: dict[str, list[str]],
                    text_col: str = "text") -> DataFrame:
    """``doc_id, detected_lang, lang_score`` — overlap of the document's
    distinct trigrams with each language profile, argmax with a
    deterministic first-language-wins tie order (languages iterate in
    sorted order). Profiles ride the plan as array literals (bounded at
    profile_size each): one zero-shuffle projection over the corpus."""
    langs = sorted(profiles)
    tri = _char_trigrams(F.col(text_col))
    d = docs.select("doc_id", tri.alias("_tri"))
    scores = [
        F.size(F.array_intersect(
            F.col("_tri"), F.array(*[F.lit(t) for t in profiles[lang]])))
        .alias(f"_s_{lang}")
        for lang in langs]
    d = d.select("doc_id", *scores)
    best = F.greatest(*[F.col(f"_s_{lang}") for lang in langs]) \
        if len(langs) > 1 else F.col(f"_s_{langs[0]}")
    detected = F.lit(langs[-1])
    for lang in reversed(langs[:-1] if len(langs) > 1 else []):
        detected = F.when(F.col(f"_s_{lang}") == best, F.lit(lang)) \
                    .otherwise(detected)
    return d.select(
        "doc_id",
        detected.alias("detected_lang"),
        best.cast("long").alias("lang_score"))
