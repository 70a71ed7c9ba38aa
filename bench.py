"""Benchmark harness (driver contract: one JSON line on stdout).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS], best-of-3 per query after a warm-up action, and
prints {"metric","value","unit","queries","sf"}.

Headline set: the queries that exercise each execution shape — wide
aggregation, multi-way join, top-k, window, event-time bucketing, minhash
dedup, vector top-k — the ones whose plans must stay healthy at scale.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from steampipe_sqlite_spark.plans.registry import collect
from steampipe_sqlite_spark.session import get_spark

HEADLINE = [
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q9",
    "tpch_q18",
    "win_running_sum",
    "window_tumbling_1h",
    "dedup_minhash_lsh",
    "knn_cosine_bruteforce",
]

RUNS = 3


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    queries, _ = collect()

    # warm the JVM + parquet footers once
    queries["tpch_q6"](spark, sf_dir).collect()

    per_query: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        best = float("inf")
        for _ in range(RUNS):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        per_query[name] = round(best, 3)

    total = round(sum(per_query.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total_best_of_3",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
