"""Sink-mode A/B for the floor-capped global-window rewrites (VERDICT
r12 #3).

The round-12 100x A/B of win_range_frame (3.2x) and win_rank_family
(1.4x) measured both arms through a shared 15M-row toPandas
driver-materialization floor (BASELINE.md round-12 section), diluting
the compute-side win.  This probe re-runs the same naive-vs-rewrite
comparison writing to a PARQUET SINK — the cluster-scale consumer shape:
no driver materialization, no presentation sort, result stays
distributed end to end.

Arms (both sink-write, both WITHOUT the corpus entries' final
presentation ORDER BY — a sink consumer doesn't globally sort):
  naive    the window-form spelling (the registered oracle text, run ON
           SPARK): a data-sized empty-OVER window -> every row through
           ONE task
  rewrite  the corpus plan shape (win_range_frame: binned 2-bucket range
           join; win_rank_family: <=5-row count-table window +
           broadcast join-back), verbatim from plans/relational.py
           minus the final ORDER BY

Before timing, both arms are checksum-compared at 1x (row count + value
sums) — hash parity of the full forms is already driver-proven at
sf0.01; this pins the A/B copies to the same answer.

A second mode demonstrates the single-task arm's memory failure mode:
--constrained re-runs each arm in a SUBPROCESS with
SPARK_GRAFT_DRIVER_MEM=1g.  The rewrite's stages handle ~500k rows per
task and fit; the naive arm must sort the whole replicated corpus in
one task's execution memory, which spills catastrophically or dies —
the asymmetry the rewrite exists to remove.

Usage:
  python tools/window_sink_ab.py [reps]              timed sink A/B
  python tools/window_sink_ab.py [reps] --constrained   + 1g subprocess arms
  python tools/window_sink_ab.py --arm <query>:<naive|rewrite> <reps>
                                                     (internal: one arm)
Prints one JSON line:
  {"reps": N, "rows": n, "queries": {q: {"naive_s": s, "rewrite_s": s,
   "speedup": x}}, "constrained": {q: {arm: {"s": s|null, "err": ...}}}}
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SINK = os.path.join(REPO, ".cache", "winsink")

# --- the two arms per query, as SQL over a temp view `orders` ----------
# naive = the registered oracle window text; rewrite = the corpus
# spelling from plans/relational.py — both minus the final ORDER BY.

NAIVE = {
    "win_range_frame": """
SELECT o_orderkey, o_totalprice,
       COUNT(*) OVER (ORDER BY o_totalprice
                      RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS n_within_1000
FROM orders
""",
    "win_rank_family": """
SELECT o_orderkey, o_orderpriority,
       RANK() OVER (ORDER BY o_orderpriority) AS rnk,
       DENSE_RANK() OVER (ORDER BY o_orderpriority) AS drnk,
       CAST(PERCENT_RANK() OVER (ORDER BY o_orderpriority) AS DOUBLE) AS prnk,
       CAST(CUME_DIST() OVER (ORDER BY o_orderpriority) AS DOUBLE) AS cdist
FROM orders
""",
}

REWRITE = {
    "win_range_frame": """
WITH d AS (
  SELECT o_totalprice AS v, CAST(COUNT(*) AS BIGINT) AS c
  FROM orders GROUP BY o_totalprice),
db AS (SELECT v, c, CAST(FLOOR(v / 1000.0e0) AS BIGINT) AS b FROM d),
cand AS (
  SELECT t.v AS tv, t.b - o.k AS cb
  FROM db t CROSS JOIN (SELECT 0 AS k UNION ALL SELECT 1) o),
counts AS (
  SELECT cand.tv, CAST(SUM(db.c) AS BIGINT) AS n_within
  FROM cand JOIN db ON db.b = cand.cb
  WHERE db.v >= cand.tv - 1000.0e0 AND db.v <= cand.tv
  GROUP BY cand.tv)
SELECT o.o_orderkey, o.o_totalprice, counts.n_within AS n_within_1000
FROM orders o JOIN counts ON counts.tv = o.o_totalprice
""",
    "win_rank_family": """
WITH pr AS (
  SELECT o_orderpriority AS p, CAST(COUNT(*) AS BIGINT) AS c
  FROM orders GROUP BY o_orderpriority),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM pr),
r AS (
  SELECT p,
         CAST(COALESCE(SUM(c) OVER (ORDER BY p
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1
           AS INT) AS rnk,
         CAST(ROW_NUMBER() OVER (ORDER BY p) AS INT) AS drnk,
         CAST(SUM(c) OVER (ORDER BY p
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS cum_le
  FROM pr)
SELECT o.o_orderkey, o.o_orderpriority,
       r.rnk AS rnk, r.drnk AS drnk,
       CASE WHEN t.n = 1 THEN 0.0e0
            ELSE CAST(r.rnk - 1 AS DOUBLE) / CAST(t.n - 1 AS DOUBLE)
       END AS prnk,
       CAST(r.cum_le AS DOUBLE) / CAST(t.n AS DOUBLE) AS cdist
FROM orders o JOIN r ON o.o_orderpriority = r.p CROSS JOIN tot t
""",
}

# checksum projections (order-insensitive, catch value divergence)
CHECKSUM = {
    "win_range_frame": "SELECT COUNT(*) AS n, SUM(n_within_1000) AS s1 FROM t",
    "win_rank_family": (
        "SELECT COUNT(*) AS n, SUM(rnk) AS s1, SUM(drnk) AS s2, "
        "ROUND(SUM(prnk), 6) AS s3, ROUND(SUM(cdist), 6) AS s4 FROM t"
    ),
}


def _orders_view(spark, reps: int) -> int:
    """Register the replicated orders as temp view `orders`; return rows."""
    from tools.floorbound_scale_probe import build

    sf_dir = build(spark, reps, {"orders"}) if reps > 1 else "/root/testdata/sf0.1"
    df = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    df.createOrReplaceTempView("orders")
    return df.count()


def _sink_run(spark, sql: str, tag: str) -> float:
    out = os.path.join(SINK, tag)
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    spark.sql(sql).write.mode("overwrite").parquet(out)
    dt = time.perf_counter() - t0
    shutil.rmtree(out, ignore_errors=True)
    return dt


def _one_arm(spec: str, reps: int) -> None:
    """Subprocess entry: run one arm once, print {"s": wall}."""
    from steampipe_sqlite_spark.session import get_spark

    name, arm = spec.split(":")
    sql = (NAIVE if arm == "naive" else REWRITE)[name]
    spark = get_spark(f"winsink_{arm}")
    _orders_view(spark, reps)
    print(json.dumps({"s": round(_sink_run(spark, sql, f"{name}_{arm}_sub"), 3)}))


def main() -> None:
    args = [a for a in sys.argv[1:]]
    if "--arm" in args:
        i = args.index("--arm")
        spec = args[i + 1]
        reps = int(next((a for a in args if a.isdigit()), "100"))
        _one_arm(spec, reps)
        return
    constrained = "--constrained" in args
    reps = int(next((a for a in args if a.isdigit()), "100"))

    from steampipe_sqlite_spark.session import get_spark

    spark = get_spark("winsink_ab")
    # 1x parity gate: both arms must agree before anything is timed
    _orders_view(spark, 1)
    for name in NAIVE:
        sums = []
        for sql in (NAIVE[name], REWRITE[name]):
            spark.sql(sql).createOrReplaceTempView("t")
            sums.append(tuple(spark.sql(CHECKSUM[name]).first()))
        assert sums[0] == sums[1], f"{name}: arm checksums diverge: {sums}"

    rows = _orders_view(spark, reps)
    results: dict = {}
    for name in NAIVE:
        best = {}
        for arm, sql in (("naive", NAIVE[name]), ("rewrite", REWRITE[name])):
            best[arm] = min(_sink_run(spark, sql, f"{name}_{arm}") for _ in range(2))
        results[name] = {
            "naive_s": round(best["naive"], 2),
            "rewrite_s": round(best["rewrite"], 2),
            "speedup": round(best["naive"] / best["rewrite"], 2),
        }

    constrained_out: dict = {}
    if constrained:
        env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM="1g")
        for name in NAIVE:
            constrained_out[name] = {}
            for arm in ("naive", "rewrite"):
                t0 = time.perf_counter()
                p = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--arm", f"{name}:{arm}", str(reps)],
                    env=env, capture_output=True, text=True, timeout=3600,
                )
                wall = round(time.perf_counter() - t0, 1)
                try:
                    s = json.loads(p.stdout.strip().splitlines()[-1])["s"]
                    constrained_out[name][arm] = {"s": s, "total_wall": wall}
                except Exception:
                    tail = (p.stderr or p.stdout or "")[-400:]
                    constrained_out[name][arm] = {
                        "s": None, "total_wall": wall, "rc": p.returncode,
                        "err": tail.replace("\n", " ")[-200:],
                    }
    print(json.dumps({
        "reps": reps, "rows": rows, "queries": results,
        **({"constrained_1g": constrained_out} if constrained else {}),
    }))


if __name__ == "__main__":
    main()
