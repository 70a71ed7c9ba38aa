"""Streaming throughput probe: sustainable rows/s through the REAL
streaming job builders (streaming/jobs.py) on this box.

The streaming family has correctness evidence (11 oracle-paired corpus
queries; restart/exactly-once suites) but — unlike every batch family —
no committed performance evidence.  This probe closes that: it drives
each stateful job shape with Spark's ``rate-micro-batch`` source
(deterministic rows-per-batch, event time advancing one minute per
batch so watermarks/windows actually close and state is actually
evicted) into a noop sink, and reports the median
``processedRowsPerSecond`` and batch duration over the steady-state
batches (the first WARM batches are discarded: state-store load + JIT).

Two batch sizes are measured because local micro-batch throughput is
FIXED-OVERHEAD dominated (checkpoint commit + planning ≈ 0.5–0.9 s per
batch regardless of rows): the 5× batch shows how far amortizing that
overhead raises rows/s — the same lever (trigger interval / maxOffsets
per trigger) that sizes a production cluster's micro-batches.

Usage: python tools/streaming_throughput_probe.py [rows_per_batch ...]
Prints one JSON line:
  {"<job>": {rows_per_batch: {"rows_s": median processedRowsPerSecond,
                              "batch_ms": median, "batches": n}}}

Committed reading (round 9, local[32], quiet window; rows/s medians over
8 steady-state batches, event-time advance 1 min/batch):

  job                    100k/batch (ms)       500k/batch (ms)
  tumbling_watermarked   126 k rows/s (792)    644 k rows/s (777)
  dedup_watermark        102 k rows/s (984)    483 k rows/s (1035)
  stateful_user_totals    14 k rows/s (7143)    70 k rows/s (7185)
  cdc_latest              11 k rows/s (9290)    59 k rows/s (8466)

  The headline fact: batch DURATION is ~constant across 5× rows for
  every job — throughput is overhead-bound, not row-bound, at these
  sizes.  For the JVM state-store jobs the overhead is the per-batch
  fixed cost (checkpoint commit + planning, ~0.8–1.0 s), so rows/s
  scales ~linearly with micro-batch size — the production lever is the
  trigger interval.  For the applyInPandasWithState jobs the overhead
  is per distinct KEY per batch (both batch sizes touch the same 50k
  user keys; 7–9 s ≈ 0.15 ms/key of Python group iteration), so rows/s
  grows with per-key row density, and cluster deployment shards the key
  space across executors' Python worker pools — the local reading is a
  single node's ceiling, not the design's.

  Post-optimization A/B (round 9): rewriting the per-key update bodies
  from pandas intermediates to numpy (measured 23–26× cheaper per key
  in isolation) moved cdc_latest 9.29 → 6.89 s/batch at 100k (-26%) and
  stateful_user_totals 7.14 → 6.47 s (-9%), no change at 500k for cdc —
  i.e. the REMAINING per-key cost is the framework's own group framing
  + state-store round trip, not user code.  The 1-row output DataFrame
  (~0.08 ms, dict-of-lists already optimal) is the irreducible
  user-side floor of the one-emission-per-key update contract.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from steampipe_sqlite_spark.session import get_spark
from steampipe_sqlite_spark.streaming import jobs

EVENT_TYPES = ["click", "view", "purchase", "scroll", "login", "logout"]
WARM_BATCHES = 4
MEASURE_BATCHES = 8


def rate_events(spark, rows_per_batch: int):
    """rate-micro-batch → the events schema the job builders expect.

    Event time advances 60 s per batch so 1-hour windows close every 60
    batches and 10-minute watermarks evict state every 10 — the jobs run
    their real state lifecycle, not an ever-growing accumulation.
    user_id spans 50k, so keyed state is bounded and realistic."""
    raw = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rows_per_batch)
        .option("numPartitions", 32)
        .option("advanceMillisPerBatch", 60_000)
        .load()
    )
    return raw.select(
        F.col("value").alias("event_id"),
        (F.col("value") % 50_000).alias("user_id"),
        F.element_at(
            F.array(*[F.lit(t) for t in EVENT_TYPES]),
            ((F.col("value") % 6) + 1).cast("int"),
        ).alias("event_type"),
        F.col("timestamp").alias("ts"),
        ((F.col("value") % 1000) / 10.0).alias("value"),
    )


JOBS = {
    "tumbling_watermarked": (jobs.watermarked_tumbling_agg, "append"),
    "dedup_watermark": (jobs.dedup_within_watermark, "append"),
    "stateful_user_totals": (jobs.stateful_user_totals, "update"),
    "cdc_latest": (jobs.cdc_latest_state_stream, "update"),
}


def measure(spark, name: str, rows_per_batch: int) -> dict:
    builder, mode = JOBS[name]
    ckpt = tempfile.mkdtemp(prefix=f"sprobe_{name}_")
    q = (
        builder(rate_events(spark, rows_per_batch))
        .writeStream.outputMode(mode)
        .format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 240
        want = WARM_BATCHES + MEASURE_BATCHES
        while len(q.recentProgress) < want and time.time() < deadline:
            time.sleep(0.5)
        prog = list(q.recentProgress)
    finally:
        q.stop()
        q.awaitTermination(30)
        shutil.rmtree(ckpt, ignore_errors=True)
    steady = [p for p in prog[WARM_BATCHES:] if p["numInputRows"] > 0]
    return {
        "rows_s": round(
            statistics.median(p["processedRowsPerSecond"] for p in steady)
        ),
        "batch_ms": statistics.median(p["batchDuration"] for p in steady),
        "batches": len(steady),
    }


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:] if a.isdigit()] or [100_000, 500_000]
    spark = get_spark("stream-throughput")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    out: dict = {}
    for name in JOBS:
        out[name] = {}
        for rows in sizes:
            rec = measure(spark, name, rows)
            out[name][rows] = rec
            print(f"# {name} @ {rows}/batch: {rec}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
