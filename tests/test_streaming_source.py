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
