"""Streaming through the connector bridge: SimpleDataSourceStreamReader
polling a deterministic feed connector by offset ranges."""

import pytest
from pyspark.sql import functions as F

from steampipe_sqlite_spark.engine import Engine

FEED = "steampipe_sqlite_spark.sources.chaos:FeedConnector"


@pytest.fixture(scope="module")
def feed_engine(spark):
    eng = Engine(spark)
    eng.load(FEED, config='{"max_seq": 230}')
    return eng


def test_stream_reads_whole_feed_in_micro_batches(spark, feed_engine):
    stream = feed_engine.stream("feed", "ticks", batch_rows=100)
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("feed_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()  # terminates: exhausted feed stops advancing
    finally:
        q.stop()
    rows = spark.table("feed_out").collect()
    assert len(rows) == 230
    assert {r.seq for r in rows} == set(range(230))
    # 230 rows at 100/batch → at least 3 micro-batches
    assert q.lastProgress["batchId"] >= 2


def test_stream_windowed_agg_matches_batch(spark, feed_engine):
    stream = feed_engine.stream("feed", "ticks", batch_rows=64)
    agg = (
        stream.groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("win_start"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("feed_agg")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r.win_start, r.n) for r in spark.table("feed_agg").collect()}
    batch = feed_engine.table("feed", "ticks")
    expected = {
        (r.win_start, r.n)
        for r in batch.groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("win_start"), "n")
        .collect()
    }
    assert got == expected


def test_stream_restart_is_exactly_once(spark, feed_engine, tmp_path):
    """Stop mid-feed and resume from the checkpoint: committed offset
    ranges must not be re-emitted and the final set must be complete —
    deterministic connectors + readBetweenOffsets replay ⇒ exactly-once."""
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    def run_until(min_rows):
        stream = feed_engine.stream("feed", "ticks", batch_rows=50)
        q = (
            stream.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        try:
            import time

            deadline = time.time() + 60
            while time.time() < deadline:
                files = spark.read.parquet(out_dir).count() if q.lastProgress else 0
                if files >= min_rows:
                    break
                time.sleep(0.5)
        finally:
            q.stop()

    run_until(50)   # phase 1: at least one committed batch, then kill
    run_until(230)  # phase 2: resume from checkpoint to completion

    rows = spark.read.parquet(out_dir).collect()
    seqs = [r.seq for r in rows]
    assert len(seqs) == len(set(seqs)), "duplicate rows across restart"
    assert set(seqs) == set(range(230)), "gap in resumed stream"


def test_watermarked_window_agg_over_bridge_stream(spark, feed_engine):
    """Event-time windowing + watermark directly on a connector stream —
    the full streaming stack over the zero-ETL source."""
    stream = feed_engine.stream("feed", "ticks", batch_rows=100)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("win_start"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("feed_wm")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # append mode emits only windows sealed by the watermark: all but the
    # last hour of the 230-minute feed
    emitted = {r.win_start: r.n for r in spark.table("feed_wm").collect()}
    assert len(emitted) >= 2
    assert all(n == 60 for n in emitted.values())
