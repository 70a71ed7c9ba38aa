"""SparkSession factory tuned for this engine.

Local mode is the test bed (local[N], one JVM); the settings below are chosen
so the same code scales to a multi-executor cluster:

- AQE on (runtime re-plan, skew-join splitting, partition coalescing) —
  replaces any hand-tuned partition counts at 100 TB.
- shuffle.partitions sized to cores locally; on a real cluster AQE's
  coalescing makes the initial number mostly irrelevant.
- Arrow enabled for every Python<->JVM hop (Pandas UDFs, createDataFrame,
  Python DataSource batches).
- Session timezone pinned UTC so timestamp semantics match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "steampipe_sqlite_spark", cpus: str | int | None = None) -> SparkSession:
    """Build (or reuse) the engine's SparkSession."""
    n = str(cpus or _DEFAULT_CPUS)
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", n)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        # enable pushFilters on Python data sources (the connector bridge)
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # events.parquet carries TIMESTAMP(NANOS) which the vectorized reader
        # rejects; read as long and convert in tables.load_table.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Split size tuned for the local[N] test bed: single-file
        # sub-GB parquet inputs must split into ≥N tasks or the scan+
        # partial-agg stage runs on 3 of 32 cores (measured: tpch_q1
        # 0.72 s → 0.45 s at sf0.1 going 128m → 8–16m).  On a real
        # cluster with many multi-GB files, override toward the 128m
        # default — more splits than cores just adds scheduler load.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "16m"),
        )
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
