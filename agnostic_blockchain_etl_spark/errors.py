"""Shared error-classification helpers.

The "does this AnalysisException mean NOT-FOUND (a legitimate empty /
first-run state) or a REAL failure" decision is safety-critical in every
store-backed operator: mapping a transient IO or catalog error to
"first run" silently discards dedup history (re-admitting duplicates)
or accepts an unversioned store. Keep the classification in ONE place
so a Spark error-class rename is fixed once.
"""

from __future__ import annotations


def is_not_found(exc: Exception, condition: str, fragment: str) -> bool:
    """True iff ``exc`` (a pyspark AnalysisException) carries the given
    error ``condition`` (e.g. ``PATH_NOT_FOUND`` /
    ``TABLE_OR_VIEW_NOT_FOUND``) or, on engines predating error
    conditions, the message ``fragment``. Substring-matches the
    condition because newer Spark versions prefix sub-conditions
    (``TABLE_OR_VIEW_NOT_FOUND.XXX``)."""
    getter = getattr(exc, "getCondition", None) \
        or getattr(exc, "getErrorClass", lambda: None)
    cond = getter() or ""
    return condition in cond or fragment in str(exc)
