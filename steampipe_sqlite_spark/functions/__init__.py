"""Function layer: SQLite-dialect compat + LLM-pipeline text/vector exprs.

All builders return pyspark Columns composed of built-in functions — they
stay inside whole-stage codegen (no Python UDFs in the hot path).
"""

from steampipe_sqlite_spark.functions import text, vectors  # noqa: F401
