"""Pins for tools/bridge_scan_probe.py: the firehose connector must keep
exercising the real bridge (partitions honored, config reaching the
executor-side rebuild, both generation regimes checksum-identical)."""

import os
import sys

import pytest

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from steampipe_sqlite_spark.engine import Engine


@pytest.fixture(scope="module")
def eng(spark):
    e = Engine(spark)
    e.load(
        "tools.bridge_scan_probe:FirehoseConnector",
        alias="bench",
        config="10000:4",
    )
    return e


@pytest.mark.parametrize("table", ["firehose", "rowgen"])
def test_scan_is_partitioned_and_checksum_exact(eng, table):
    df = eng.table("bench", table)
    # config must survive the executor-side load_connector -> set_config
    # rebuild (an __init__-only parse silently scans the default corpus)
    assert df.rdd.getNumPartitions() == 4
    row = df.agg(
        F.sum("id").alias("s"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    assert (row.s, row.n) == (10000 * 9999 // 2, 10000)


def test_regimes_agree_row_for_row(eng):
    a = eng.table("bench", "firehose")
    b = eng.table("bench", "rowgen")
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
