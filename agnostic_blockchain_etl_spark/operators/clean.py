"""C4-style line-level cleaning (Raffel et al. 2020, the rules behind
the C4 corpus): keep only lines that end in terminal punctuation and
carry at least ``min_words`` words, drop lines mentioning javascript,
and kill whole documents containing "lorem ipsum" or curly braces or
retaining fewer than ``min_lines`` kept lines.

Spark-first shape: the whole transform is ONE projection of array HOFs
over ``split(text, '\\n')`` — no explode, no shuffle, linear at 100 TB;
the DuckDB twin (`test_clean.py`) pins the semantics cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .tables import load_tables

from .registry import make_registry

QUERIES, ORACLES, query = make_registry()


_TERMINAL = r'[.!?"]\s*$'
_MIN_WORDS = 3
_MIN_LINES = 3


def c4_clean(docs: DataFrame, text_col: str = "text",
             min_words: int = _MIN_WORDS,
             min_lines: int = _MIN_LINES) -> DataFrame:
    """Returns ``(doc_id, text, n_lines, n_kept_lines, c4_keep)``:
    ``text`` is the document rebuilt from its kept lines, ``c4_keep``
    the page-level verdict. Flag-don't-filter, like `curate_corpus` —
    callers decide what to do with killed pages."""
    lines = F.split(F.col(text_col), "\n")
    lkeep = F.filter(
        lines,
        lambda l: l.rlike(_TERMINAL) &
        (F.size(F.split(F.trim(l), r"\s+")) >= min_words) &
        ~F.lower(l).contains("javascript"))
    low = F.lower(F.col(text_col))
    page_ok = (~low.contains("lorem ipsum") &
               ~F.col(text_col).contains("{") &
               (F.size(lkeep) >= min_lines))
    # metadata-only (null-text) documents: size(NULL) is -1 and every
    # contains() is NULL, which reported n_lines = -1 and a NULL
    # c4_keep that silently vanished from datacard sums — flag them as
    # an explicit 0-line kill instead (flag-don't-drop: the row stays)
    isnull = F.col(text_col).isNull()
    return docs.select(
        "doc_id",
        F.when(isnull, F.lit(None).cast("string"))
        .otherwise(F.array_join(lkeep, "\n")).alias("text"),
        F.when(isnull, 0).otherwise(F.size(lines)).alias("n_lines"),
        F.when(isnull, 0).otherwise(F.size(lkeep)).alias("n_kept_lines"),
        F.when(isnull, 0).otherwise(page_ok.cast("int")).alias("c4_keep"))


@query("c4_clean_page_rules", oracle=r"""
    WITH base AS (
        SELECT doc_id, text, string_split(text, chr(10)) AS lines
        FROM documents),
    k AS (
        SELECT doc_id, text, lines,
               list_filter(lines, l ->
                   regexp_matches(l, '[.!?"]\s*$')
                   AND len(string_split_regex(trim(l), '\s+')) >= 3
                   AND NOT contains(lower(l), 'javascript')) AS kept
        FROM base)
    SELECT doc_id,
           CASE WHEN text IS NULL THEN NULL
                -- array_to_string([]) is NULL in DuckDB but
                -- array_join([]) is '' in Spark: coalesce the
                -- no-kept-lines page to the empty string
                ELSE coalesce(array_to_string(kept, chr(10)), '')
           END                                                AS text,
           CASE WHEN text IS NULL THEN 0
                ELSE len(lines) END                           AS n_lines,
           CASE WHEN text IS NULL THEN 0
                ELSE len(kept) END                            AS n_kept_lines,
           CASE WHEN text IS NULL THEN 0
                WHEN NOT contains(lower(text), 'lorem ipsum')
                     AND NOT contains(text, '{')
                     AND len(kept) >= 3 THEN 1 ELSE 0 END     AS c4_keep
    FROM k
""")
def c4_clean_page_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle pair for `c4_clean` (promoted from the test-only DuckDB
    twin, test_clean.py, per the round-9 verdict): the whole line- and
    page-rule family — terminal punctuation, min-words, javascript
    lines, lorem-ipsum / curly-brace / min-kept-lines page kills, and
    the null-text explicit 0-line-kill semantics — value-pinned
    cross-engine on the documents table. Registered PAST the driver's
    50-slot gate window (the local harness checks every pair; see
    ``__spark_entry__._PAST_WINDOW``)."""
    t = load_tables(spark, sf_dir, ("documents",))
    return c4_clean(t["documents"].select("doc_id", "text"))
