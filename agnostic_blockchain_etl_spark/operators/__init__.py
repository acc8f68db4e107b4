"""Operator library: the reference's relational surface (SURVEY.md §2.3-§2.7)
re-expressed as Spark DataFrame plans, plus the LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns).

Every public operator has a ``queries()`` entry in ``__spark_entry__.py``
paired with DuckDB oracle SQL for the driver's correctness gate.
"""

from .tables import load_tables

__all__ = ["load_tables"]
