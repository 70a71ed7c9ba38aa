"""Stage-isolate knn_cosine_pq's cost (VERDICT r14 #3).

The r14 attribution: the Lloyd training chain is ~15 sequential
broadcast-join barriers (every `_pq_assign` broadcasts the previous
`_pq_update` output, whose subtree nests the previous assign, etc.), and
the spread/persist fix was measured NEGATIVE.  This probe measures, in
one session at $SPARK_GRAFT_SF_DIR:

  1. job/stage count + wall for pq_codebooks alone (noop sink),
  2. wall for the full declared query (toPandas, bench-symmetric),
  3. the same two after any rewrite (run it again post-change).

Usage: python tools/pq_stage_probe.py [N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from steampipe_sqlite_spark.session import get_spark
from steampipe_sqlite_spark.tables import load_table


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("pq-probe")
    sc = spark.sparkContext

    def n_jobs() -> int:
        return sc._jsc.sc().dagScheduler().nextJobId()

    from steampipe_sqlite_spark.operators.similarity import (
        pq_codebooks,
        pq_topk_rerank,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    # warm-up
    pq_codebooks(emb, "embedding", "vec_id", m=4, codebook=16).write.format(
        "noop"
    ).mode("overwrite").save()

    for label, build in (
        (
            "pq_codebooks(noop)",
            lambda: pq_codebooks(emb, "embedding", "vec_id", m=4, codebook=16)
            .write.format("noop")
            .mode("overwrite")
            .save(),
        ),
        (
            "knn_cosine_pq(toPandas)",
            lambda: pq_topk_rerank(
                emb,
                emb.filter(F.col("vec_id") < 10),
                "embedding",
                "vec_id",
                k=5,
                shortlist=50,
            ).toPandas(),
        ),
    ):
        walls = []
        jobs = None
        for _ in range(n):
            spark.catalog.clearCache()
            sc.setJobDescription(label)
            j0 = n_jobs()
            t0 = time.perf_counter()
            build()
            walls.append(round(time.perf_counter() - t0, 3))
            jobs = n_jobs() - j0
        print(f"{label}: jobs/run={jobs}  walls={walls}  best={min(walls)}")


if __name__ == "__main__":
    main()
