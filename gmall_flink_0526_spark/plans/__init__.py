from .catalog import CATALOG, QuerySpec, queries, oracle_sql, setups  # noqa: F401
