"""Test-table catalog: load the driver's parquet tables and register views.

TESTDATA.md: tables ``region nation customer supplier part orders lineitem
events documents embeddings`` exist as one parquet file each under
``/root/testdata/sf{0.001,0.01,0.1}/``.

These are plain Catalyst parquet scans (columnar, predicate/column pushdown,
partition splitting at scale) — the right way to read files in Spark.  The
connector bridge in ``sources/`` is for *API-backed* tables, mirroring the
reference's virtual-table role; routing parquet through it would only add a
Python hop the reference architecture doesn't imply (its SQLite core reads
plugin rows, our Catalyst core reads parquet natively).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
)
EXTRA_TABLES = ("events", "documents", "embeddings")
ALL_TABLES = TPCH_TABLES + EXTRA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SMOKE_SF_DIR = "/root/testdata/sf0.001"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # ts is TIMESTAMP(NANOS) in the file, surfaced as long nanos under
        # spark.sql.legacy.parquet.nanosAsLong; convert to native micros
        # timestamp.  Integer division — double division would lose
        # precision on ~1e18 nanosecond epochs.
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


_REGISTERED: dict[tuple[int, tuple[str, ...]], str] = {}


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = ALL_TABLES) -> None:
    """Register one temp view per table for spark.sql() queries.

    Mirrors the reference's per-table module registration
    (/root/reference/configure_fn.go:167-182) — there DDL is synthesized
    into SQLite's catalog; here each table becomes a temp view over a
    native parquet scan.  Registration is memoized per (session, table
    set): every query calls this, and re-registering 10 views costs
    ~0.3 s of driver round-trips per query otherwise.
    """
    key = (id(spark), tables)
    if _REGISTERED.get(key) == sf_dir:
        return
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    _REGISTERED[key] = sf_dir
