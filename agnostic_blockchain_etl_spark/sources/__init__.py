"""Sources & sinks (SURVEY.md §2.2): partitioned parquet tables with
Replacing semantics, proxy (JDBC) tables, refreshable dictionaries."""

from .dictionary import RefreshableDictionary
from .replacing import read_replacing
from .rpc_datasource import RpcDataSource

__all__ = ["read_replacing", "RefreshableDictionary", "RpcDataSource"]
