"""Registry wiring query implementations to their DuckDB oracles.

The driver contract (__spark_entry__.py) wants two dicts:
  queries() -> {name: fn(spark, sf_dir) -> DataFrame}
  oracle_sql() -> {name: ANSI SQL for DuckDB over the same tables}

Column names must match exactly between the two (the driver sorts columns by
name before value-hashing), so every computed column is aliased identically
on both sides.  Aggregates over double columns are rounded (or cast to
decimal) identically on both sides so JVM/DuckDB summation-order ULP noise
cannot flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[["SparkSession", str], "DataFrame"]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle=None`` marks a non-SQL-expressible op
    (driver falls back to a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def sql_query(name: str, spark_sql: str, oracle: str | None = None) -> None:
    """Register a pure-SQL query: Spark runs ``spark_sql`` against the
    registered temp views; DuckDB runs ``oracle`` (defaults to the same
    string — most of the corpus is dialect-shared ANSI SQL)."""
    from steampipe_sqlite_spark.tables import referenced_tables, register_views

    tables = referenced_tables(spark_sql)

    def fn(spark: "SparkSession", sf_dir: str) -> "DataFrame":
        register_views(spark, sf_dir, tables)
        return spark.sql(spark_sql)

    fn.__name__ = f"q_{name}"
    fn.__doc__ = spark_sql
    query(name, oracle if oracle is not None else spark_sql)(fn)


def collect() -> tuple[dict[str, QueryFn], dict[str, str]]:
    """Import every corpus module (side-effect: registration) and return
    the combined (queries, oracles).

    Import order is deliberate: the external driver verifies queries in
    registration order with a bounded budget, so the flagship relational
    surface (TPC-H, joins/windows/set-ops/CTEs, temporal) registers first,
    then the LLM-pipeline operators, then the long tail of scalar-function
    coverage.
    """
    from steampipe_sqlite_spark.plans import (  # noqa: F401
        tpch,
        relational,
        temporal,
        llm,
        multimodal,
        streaming_batch,
        compat,
        functions_corpus,
    )

    # Duplicate-semantics witnesses register at the very back of the order.
    if "tpch_q1_dataframe" not in QUERIES:
        query("tpch_q1_dataframe", oracle=tpch.Q1_SQL)(tpch.tpch_q1_dataframe)

    return QUERIES, ORACLES
