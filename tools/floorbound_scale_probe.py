"""Scale probe for the floor-bound headline shapes (round 8).

BENCH's ex-floor>2× set is dominated by queries whose DuckDB twin runs in
10-40 ms at sf0.1 — the ratio there measures Spark's fixed local-mode
overhead against a tiny denominator, not plan quality.  This probe makes
the convergence claim measurable for the two events-table members
(join_asof_events, window_tumbling_1h): replicate events 10× and 100×
(user_id re-keyed per replica so per-user event density — the asof
window's work unit — is preserved), time BOTH engines' corpus forms, and
report the ratio trajectory.  PASS = ratio falls toward ~1 as data grows
(Spark wall-clock ~flat, the scan absorbing into the cores, while the
single-process engine grows ~linearly).

Usage: python tools/floorbound_scale_probe.py [reps ...]   (default 1 10 100)
Prints one JSON line:
  {"rows": {rep: n}, "asof": {rep: {"spark_s", "duckdb_s", "ratio"}},
   "tumbling": {...}}

Committed reading (round 8, local[32], sf0.1 base = 100k events):

  reps   rows    asof spark/duck (ratio)      tumbling spark/duck (ratio)
    1    100 k    0.485 / 0.037  (13.1×)        0.459 / 0.014  (32.0×)
   10      1 M    0.547 / 0.090  ( 6.1×)        0.368 / 0.017  (21.1×)
  100     10 M    2.602 / 0.574  ( 4.5×)        0.453 / 0.052  ( 8.7×)

  Tumbling: Spark wall-clock is FLAT across 100× data (the scan absorbs
  into the cores) — the sf0.1 ratio is pure fixed overhead over a 14 ms
  denominator.  As-of: both engines grow at 100× (the 10M-row keyed
  window sort is real work) but the ratio falls monotonically 13→6→4.5;
  the Spark side partitions by user_id and scales OUT, which the
  single-process engine cannot.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from pyspark.sql import functions as F

from steampipe_sqlite_spark.operators.temporal import asof_join_same_source
from steampipe_sqlite_spark.session import get_spark
from steampipe_sqlite_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.1"
SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".cache",
    "floorscale",
)

TUMBLING_SQL = """
SELECT CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS bucket, event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
FROM {t}
GROUP BY 1, 2 ORDER BY bucket, event_type
"""

ASOF_DD = """
SELECT l.event_id, l.user_id, l.ts, r.click_value, r.ts AS matched_ts
FROM (SELECT event_id, user_id, ts FROM {t} WHERE event_type = 'purchase') l
ASOF LEFT JOIN (SELECT user_id, ts, value AS click_value
                FROM {t} WHERE event_type = 'click') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
ORDER BY l.event_id
"""


def build(spark, reps: int) -> str:
    out = os.path.join(SCRATCH, f"x{reps}")
    if os.path.exists(out):
        return out
    ev = load_table(spark, SF_DIR, "events")
    hi_user = ev.agg(F.max("user_id")).first()[0] + 1
    hi_ev = ev.agg(F.max("event_id")).first()[0] + 1
    (
        ev.crossJoin(F.broadcast(spark.range(reps).select(F.col("id").alias("rep"))))
        .select(
            (F.col("event_id") + F.col("rep") * hi_ev).alias("event_id"),
            F.col("ts"),
            (F.col("user_id") + F.col("rep") * hi_user).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        .repartition(max(32, reps // 2))
        .write.mode("overwrite")
        .parquet(out)
    )
    return out


def spark_asof(spark, path: str):
    ev = spark.read.parquet(path).withColumn("click_value", F.col("value"))
    return asof_join_same_source(
        ev, key="user_id", ts="ts",
        left_pred="event_type = 'purchase'",
        right_pred="event_type = 'click'",
        left_cols=["event_id"], payload_cols=["click_value"],
    ).select("event_id", "user_id", "ts", "click_value", "matched_ts").orderBy(
        "event_id"
    )


def spark_tumbling(spark, path: str):
    return (
        spark.read.parquet(path)
        .groupBy(
            F.date_trunc("hour", "ts").alias("bucket"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias(
                "cents"
            ),
        )
        .orderBy("bucket", "event_type")
    )


def main() -> None:
    reps_list = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    spark = get_spark("floorscale")
    con = duckdb.connect()
    rows, asof, tumb = {}, {}, {}
    for reps in reps_list:
        path = build(spark, reps)
        rows[reps] = spark.read.parquet(path).count()
        t = f"read_parquet('{path}/*.parquet')"
        for label, mk, dd in (
            ("asof", spark_asof, ASOF_DD),
            ("tumbling", spark_tumbling, TUMBLING_SQL),
        ):
            spark.catalog.clearCache()
            mk(spark, path).toPandas()  # warm
            best_s = best_d = float("inf")
            for _ in range(3):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                mk(spark, path).toPandas()
                best_s = min(best_s, time.perf_counter() - t0)
                t0 = time.perf_counter()
                con.execute(dd.format(t=t)).df()
                best_d = min(best_d, time.perf_counter() - t0)
            rec = {
                "spark_s": round(best_s, 3),
                "duckdb_s": round(best_d, 3),
                "ratio": round(best_s / best_d, 2),
            }
            (asof if label == "asof" else tumb)[reps] = rec
            print(f"# reps={reps} {label}: {rec}", file=sys.stderr)
    print(json.dumps({"rows": rows, "asof": asof, "tumbling": tumb}))
    shutil.rmtree(SCRATCH, ignore_errors=True)


if __name__ == "__main__":
    main()
