from .catalog import CATALOG, QuerySpec, queries, oracle_sql  # noqa: F401
