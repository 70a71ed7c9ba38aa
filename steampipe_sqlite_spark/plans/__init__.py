"""Query corpus proving the engine's SQL surface (SURVEY.md §2.3).

Each module registers named queries into the shared registry; every query has
a Spark implementation (DataFrame or spark.sql) and, where SQL-expressible, a
DuckDB oracle string the driver hash-compares at sf0.01.
"""

from steampipe_sqlite_spark.plans.registry import ORACLES, QUERIES, collect

__all__ = ["QUERIES", "ORACLES", "collect"]
