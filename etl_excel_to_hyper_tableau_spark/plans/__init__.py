from .macro import format_query, sql_table_name
from .dialect import sqlite_to_spark

__all__ = ["format_query", "sql_table_name", "sqlite_to_spark"]
