from .catalog import CATALOG, QuerySpec, queries, oracle_sql

__all__ = ["CATALOG", "QuerySpec", "queries", "oracle_sql"]
