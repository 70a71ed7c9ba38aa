"""Scaling probe: how does the engine-vs-DuckDB ratio move with data size?

Writes a 10×-replicated lineitem (~6M rows, distinct keys preserved via
offset re-keying) to /tmp, then times the q1 and q6 aggregation shapes on
both engines at 1× and 10×.  The point: Spark's per-query overhead
(~0.4 s of scheduling + planning) is constant while its throughput scales
with cores, so the ratio collapses as data grows — the regime the engine
is built for.

Usage: python tools/scaling_probe.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from steampipe_sqlite_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"
BIG = "/tmp/lineitem_10x"

Q1 = """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty,
  CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
         * CAST(ROUND((1 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_disc_price,
  COUNT(*) AS count_order
FROM {t}
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

Q6 = """
SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           * CAST(ROUND(l_discount * 100) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
FROM {t}
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


def best_of(fn, runs=3):
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    spark = get_spark("scaling_probe")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    if not os.path.exists(BIG):
        from functools import reduce

        from pyspark.sql import functions as F

        copies = [
            li.withColumn("l_orderkey", li.l_orderkey + F.lit(i * 10_000_000)) for i in range(10)
        ]
        # 32 output files so the 10x scan parallelizes (the sf0.1 fixture is
        # a single row group — its scan is single-threaded by construction)
        reduce(lambda a, b: a.unionByName(b), copies).repartition(32).write.parquet(BIG)

    con = duckdb.connect()
    results = {}
    for label, table_spark, table_duck in [
        ("1x", f"parquet.`{SF_DIR}/lineitem.parquet`", f"read_parquet('{SF_DIR}/lineitem.parquet')"),
        ("10x", f"parquet.`{BIG}`", f"read_parquet('{BIG}/*.parquet')"),
    ]:
        for qname, q in [("q1", Q1), ("q6", Q6)]:
            s = best_of(lambda: spark.sql(q.format(t=table_spark)).collect())
            d = best_of(lambda: con.execute(q.format(t=table_duck)).fetchall())
            results[f"{qname}_{label}"] = {
                "spark_s": s,
                "duckdb_s": d,
                "ratio": round(s / d, 2),
            }
    print(json.dumps(results))
    shutil.rmtree(BIG, ignore_errors=True)


if __name__ == "__main__":
    main()
