"""Sources & sinks (SURVEY.md §2.2): partitioned parquet tables with
Replacing semantics, proxy (JDBC) tables, refreshable dictionaries."""

from .replacing import read_replacing
from .dictionary import RefreshableDictionary

__all__ = ["read_replacing", "RefreshableDictionary"]
