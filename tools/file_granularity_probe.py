"""File-granularity probe: the small-files problem, measured against the
engine's own split-size policy.

A 100 TB landing zone's worst enemy is not data volume but FILE COUNT:
streaming sinks and per-partition writers leave thousands of sub-MB
parquet files, and every scan pays per-file open cost (footer read,
schema merge-check) plus Spark's bin-packing padding
(spark.sql.files.openCostInBytes, default 4 MB, added to every file
when packing splits).  The engine also OVERRIDES
spark.sql.files.maxPartitionBytes down to 16m for the local test bed
(session.py: single-file sub-GB fixtures must split into >= N tasks) —
a knob tuned for too-FEW files that could misfire on too-MANY.

The probe writes the SAME ~2 GB, 60M-row lineitem (the floorbound 100x
replica) at 32 / 512 / 4096 files and runs the REGISTERED tpch_q1
(reads only lineitem) under both the engine's 16m override and Spark's
128m default, fresh session per arm (SPARK_GRAFT_MAX_PARTITION_BYTES),
best-of-3 warm, recording wall + the scan's actual partition count.

PASS = results identical everywhere; the probe quantifies (a) the raw
small-files tax at fixed split config, (b) whether the 16m override is
harmful at high file counts (bin-packing: partitions ~= sum(bytes +
4 MB/file) / maxPartitionBytes, so padding dominates when files are
small), and (c) the compaction payback (the 32-file layout IS the
compacted form of the 4096-file one — same rows, one repartition+write
away).

Usage: python tools/file_granularity_probe.py [granularities...]
       (default 32 512 4096; replica shared under .cache/floorscale)
Prints one JSON line per (files, maxPartitionBytes) arm.

Committed reading (round 10, local[32], 60M-row/~2 GB lineitem,
registered tpch_q1, best-of-3 warm):

  files   mpb     scan parts   wall
  32      16m         72       1.817 s
  32      128m        32       1.662 s
  512     16m        171       1.626 s
  512     128m        32       1.523 s
  4096    16m       1024       2.255 s
  4096    128m       137       1.980 s

  Readings: (1) fragmenting the same rows 128x (32 -> 4096 files)
  costs ~1.3x wall under either split config — the per-file
  open/footer tax, the measured case for compacting at landing (one
  repartition+write, amortized over every later scan).  (2) The
  engine's then-default 16m split override — tuned for SINGLE-file
  sub-GB fixtures, where it is worth 1.6x (tpch_q1 0.72 -> 0.45 s at
  sf0.1) — was ~8% SLOWER than Spark's 128m default at EVERY
  granularity here, and its partition counts scale with the
  fragmentation (1024 tasks at 4096 files; ~6M tasks per query at
  100 TB).  A same-window interleaved A/B on the 50-file floorbound
  x100 corpus agreed (q1 median 1.90 s at 128m vs 2.62 s at 16m, q18
  5.12 vs 5.36).  This probe therefore CHANGED the policy:
  session._max_partition_bytes now derives the split size from the
  input's file layout — 16m only when some dataset has fewer part
  files than cores (the fan-out case it was measured on), Spark's
  128m default once every dataset is already cores-wide.  Fourth
  session-policy defect found by a probe (directory input sizing,
  size-first coalescing, GC-storm heap sizing, and now split size).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.floorbound_scale_probe import SCRATCH, build  # noqa: E402
from steampipe_sqlite_spark.plans.registry import collect  # noqa: E402
from steampipe_sqlite_spark.session import get_spark, stop_spark  # noqa: E402


def build_granularity(spark, src_dir: str, n_files: int) -> str:
    """<SCRATCH>/gran<N>/lineitem.parquet — the same rows at N files."""
    out_dir = os.path.join(SCRATCH, f"gran{n_files}")
    out = os.path.join(out_dir, "lineitem.parquet")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        df = spark.read.parquet(os.path.join(src_dir, "lineitem.parquet"))
        df.repartition(n_files).write.mode("overwrite").parquet(out)
    return out_dir


def main() -> None:
    grans = [int(a) for a in sys.argv[1:]] or [32, 512, 4096]

    spark = get_spark("granprobe-build")
    src = build(spark, 100, {"lineitem"})
    dirs = {g: build_granularity(spark, src, g) for g in grans}
    stop_spark()

    queries, _ = collect()
    q1 = getattr(queries["tpch_q1"], "__wrapped__", queries["tpch_q1"])

    fingerprints = set()
    for g in grans:
        for mpb in ("16m", "128m"):
            os.environ["SPARK_GRAFT_SF_DIR"] = dirs[g]
            os.environ["SPARK_GRAFT_MAX_PARTITION_BYTES"] = mpb
            spark = get_spark(f"granprobe-{g}-{mpb}")
            parts = spark.read.parquet(
                os.path.join(dirs[g], "lineitem.parquet")
            ).rdd.getNumPartitions()
            best, rows = float("inf"), None
            for _ in range(3):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                rows = sorted(map(str, q1(spark, dirs[g]).collect()))
                best = min(best, time.perf_counter() - t0)
            fingerprints.add("\n".join(rows))
            print(
                json.dumps(
                    {
                        "files": g,
                        "max_partition_bytes": mpb,
                        "scan_partitions": parts,
                        "best_s": round(best, 3),
                    }
                ),
                flush=True,
            )
            stop_spark()
    del os.environ["SPARK_GRAFT_MAX_PARTITION_BYTES"]
    print(json.dumps({"all_arms_agree": len(fingerprints) == 1}), flush=True)


if __name__ == "__main__":
    main()
