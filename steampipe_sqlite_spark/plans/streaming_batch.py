"""Event-time windowing corpus (streaming semantics, batch-checkable).

The same transformations streaming/jobs.py runs as Structured Streaming
queries, applied to the batch events table so the driver's DuckDB oracle
can validate them.  ``streaming_tumbling_1h`` additionally runs THROUGH the
streaming engine (readStream → availableNow → memory sink) — unified-API
semantics make its oracle identical to the batch one.
"""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from steampipe_sqlite_spark.plans.registry import query, sql_query
from steampipe_sqlite_spark.tables import load_table

# Tumbling window via batch SQL on both engines.
sql_query(
    "window_tumbling_1h",
    """
SELECT window.start AS win_start, event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_value
FROM (SELECT * FROM events)
GROUP BY window(ts, '1 hour'), event_type
ORDER BY win_start, event_type
""",
    oracle="""
SELECT DATE_TRUNC('hour', ts) AS win_start, event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_value
FROM events
GROUP BY 1, 2
ORDER BY win_start, event_type
""",
    present_sort=["win_start", "event_type"],
)

# Sliding window: every event belongs to 2 windows (1h width, 30m slide).
sql_query(
    "window_sliding_1h_30m",
    """
SELECT window.start AS win_start, event_type, COUNT(*) AS n
FROM (SELECT * FROM events)
GROUP BY window(ts, '1 hour', '30 minutes'), event_type
ORDER BY win_start, event_type
""",
    # A 1h window sliding by 30m assigns each event to the two 30m-grid
    # starts s with s <= ts < s+3600: trunc-to-30m(ts) and that minus 30m.
    # CAST ... AS TIMESTAMP: DuckDB to_timestamp() is TIMESTAMPTZ (tz-aware
    # datetime64[us, Etc/UTC] in pandas) while Spark emits naive timestamps —
    # the r4 schema_match red; the cast makes the oracle naive like Spark.
    oracle="""
WITH starts AS (
  SELECT event_type,
         CAST(to_timestamp(CAST(floor(epoch(ts) / 1800) * 1800 - off AS BIGINT)) AS TIMESTAMP) AS win_start
  FROM events, UNNEST([0, 1800]) AS t(off)
)
SELECT win_start, event_type, COUNT(*) AS n
FROM starts
GROUP BY win_start, event_type
ORDER BY win_start, event_type
""",
)


# Session windows (5-minute gap) per user — gaps-and-islands oracle.
@query(
    "window_session_5m",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 5 MINUTE
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events
),
numbered AS (
  SELECT user_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_no
  FROM flagged
)
SELECT MIN(ts) AS sess_start, user_id, COUNT(*) AS n_events
FROM numbered
GROUP BY user_id, sess_no
ORDER BY user_id, sess_start
""",
)
def window_session_5m(spark, sf_dir):
    """session_window(ts, '5 minutes') per user — batch mode; the oracle is
    the classic lag/cumsum islands construction."""
    from steampipe_sqlite_spark.streaming.jobs import session_agg

    events = load_table(spark, sf_dir, "events")
    return session_agg(events, gap="5 minutes").orderBy("user_id", "sess_start")


@query(
    "streaming_tumbling_1h",
    oracle="""
SELECT DATE_TRUNC('hour', ts) AS win_start, event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_value
FROM events
GROUP BY 1, 2
ORDER BY win_start, event_type
""",
)
def streaming_tumbling_1h(spark, sf_dir):
    """The tumbling aggregation run THROUGH Structured Streaming:
    readStream(parquet) → window agg → availableNow → memory sink.
    Unified-API semantics ⇒ identical to the batch oracle."""
    from steampipe_sqlite_spark.streaming.jobs import (
        read_events_stream,
        run_stream_to_memory,
        tumbling_agg,
    )

    name = f"stream_out_{uuid.uuid4().hex[:8]}"
    agg = tumbling_agg(read_events_stream(spark, sf_dir), width="1 hour")
    result = run_stream_to_memory(spark, agg, name, output_mode="complete")
    return result.orderBy("win_start", "event_type")


@query(
    "streaming_sliding_30m",
    oracle="""
WITH starts AS (
  SELECT event_type,
         CAST(to_timestamp(CAST(floor(epoch(ts) / 1800) * 1800 - off AS BIGINT)) AS TIMESTAMP) AS win_start
  FROM events, UNNEST([0, 1800]) AS t(off)
)
SELECT win_start, event_type, COUNT(*) AS n
FROM starts
GROUP BY win_start, event_type
ORDER BY win_start, event_type
""",
)
def streaming_sliding_30m(spark, sf_dir):
    """Sliding windows (1 h width, 30 min slide) run THROUGH the streaming
    engine — every event lands in two windows; availableNow + complete
    output over the finite fixture equals the batch grid oracle."""
    from steampipe_sqlite_spark.streaming.jobs import (
        read_events_stream,
        run_stream_to_memory,
        sliding_agg,
    )

    name = f"sliding_out_{uuid.uuid4().hex[:8]}"
    agg = sliding_agg(read_events_stream(spark, sf_dir), width="1 hour", slide="30 minutes")
    result = run_stream_to_memory(spark, agg, name, output_mode="complete")
    return result.orderBy("win_start", "event_type")


@query(
    "streaming_stateful_user_totals",
    oracle="""
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_value
FROM events
GROUP BY user_id
ORDER BY user_id
""",
)
def streaming_stateful_user_totals(spark, sf_dir):
    """Custom stateful operator (applyInPandasWithState) driven through the
    streaming engine: per-user GroupState of (count, integer cents).
    availableNow + update mode over the fixture ⇒ final state per user,
    which the batch GROUP BY oracle reproduces exactly."""
    import uuid as _uuid

    from steampipe_sqlite_spark.streaming.jobs import (
        read_events_stream,
        run_stream_to_memory,
        stateful_user_totals,
    )

    name = f"stateful_out_{_uuid.uuid4().hex[:8]}"
    agg = stateful_user_totals(read_events_stream(spark, sf_dir))
    result = run_stream_to_memory(spark, agg, name, output_mode="update")
    # update mode re-emits a row per key per micro-batch; the last one per
    # user is the final state (single-batch availableNow emits exactly one)
    return (
        result.groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"), F.max("total_value").alias("total_value"))
        .orderBy("user_id")
    )


@query(
    "streaming_stream_stream_join",
    oracle="""
SELECT p.event_id AS p_id, c.event_id AS c_id
FROM events p
JOIN events c
  ON p.user_id = c.user_id
 AND c.ts >= p.ts - INTERVAL 1 HOUR
 AND c.ts <= p.ts
WHERE p.event_type = 'purchase' AND c.event_type = 'click'
ORDER BY p_id, c_id
""",
)
def streaming_stream_stream_join(spark, sf_dir):
    """Stream-stream inner join through the streaming engine: purchases ×
    clicks per user within a 1-hour lookback, both sides watermarked so
    state is bounded; availableNow + append over the finite fixture ⇒
    exactly the batch interval join, which is the oracle."""
    import uuid as _uuid

    from steampipe_sqlite_spark.streaming.jobs import (
        read_events_stream,
        run_stream_to_memory,
    )

    def side(event_type, id_alias, ts_alias):
        return (
            read_events_stream(spark, sf_dir)
            .filter(F.col("event_type") == event_type)
            .select(
                F.col("event_id").alias(id_alias),
                "user_id",
                F.col("ts").alias(ts_alias),
            )
            .withWatermark(ts_alias, "2 hours")
        )

    purchases = side("purchase", "p_id", "p_ts")
    clicks = side("click", "c_id", "c_ts").withColumnRenamed("user_id", "c_user")
    joined = purchases.join(
        clicks,
        (purchases.user_id == clicks.c_user)
        & (clicks.c_ts >= purchases.p_ts - F.expr("INTERVAL 1 HOUR"))
        & (clicks.c_ts <= purchases.p_ts),
    ).select("p_id", "c_id")
    name = f"ssj_out_{_uuid.uuid4().hex[:8]}"
    result = run_stream_to_memory(spark, joined, name, output_mode="append")
    return result.orderBy("p_id", "c_id")


@query(
    "streaming_dedup_watermark",
    oracle="""
SELECT DISTINCT user_id, event_type
FROM events
ORDER BY user_id, event_type
""",
)
def streaming_dedup_watermark(spark, sf_dir):
    """dropDuplicatesWithinWatermark over the event stream: first
    (user_id, event_type) occurrence wins, state bounded by the 10-minute
    watermark.  Emitting keys only makes the batch DISTINCT oracle exact."""
    import uuid as _uuid

    from steampipe_sqlite_spark.streaming.jobs import (
        dedup_within_watermark,
        read_events_stream,
        run_stream_to_memory,
    )

    name = f"dedup_out_{_uuid.uuid4().hex[:8]}"
    deduped = dedup_within_watermark(read_events_stream(spark, sf_dir))
    result = run_stream_to_memory(spark, deduped, name, output_mode="append")
    return result.orderBy("user_id", "event_type")


@query(
    "streaming_cdc_latest",
    oracle="""
SELECT user_id, event_id, ts, event_type, value FROM (
  SELECT user_id, event_id, ts, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS r
  FROM events
) t WHERE r = 1
ORDER BY user_id
""",
)
def streaming_cdc_latest(spark, sf_dir):
    """CDC latest-record materialization driven through the streaming
    engine (applyInPandasWithState keyed on user_id, state = the current
    winning record).  update-mode emissions are folded with the BATCH
    latest_by_key operator — any prefix of micro-batches re-emits its
    running winner, and the fold keeps the global one — so the query is
    correct for any micro-batch split, and the batch window oracle
    reproduces it exactly."""
    import uuid as _uuid

    from steampipe_sqlite_spark.operators.temporal import latest_by_key
    from steampipe_sqlite_spark.streaming.jobs import (
        cdc_latest_state_stream,
        read_events_stream,
        run_stream_to_memory,
    )

    name = f"cdc_latest_out_{_uuid.uuid4().hex[:8]}"
    agg = cdc_latest_state_stream(read_events_stream(spark, sf_dir))
    result = run_stream_to_memory(spark, agg, name, output_mode="update")
    return latest_by_key(
        result,
        key_cols=["user_id"],
        order_cols=["ts", "event_id"],
        payload_cols=["event_id", "ts", "event_type", "value"],
    ).orderBy("user_id")


@query(
    "streaming_trending_types",
    oracle="""
WITH counts AS (
  SELECT DATE_TRUNC('hour', ts) AS win_start, event_type,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT win_start, event_type, n, rank FROM (
  SELECT win_start, event_type, n,
         ROW_NUMBER() OVER (PARTITION BY win_start
                            ORDER BY n DESC, event_type) AS rank
  FROM counts
) t
WHERE rank <= 3
ORDER BY win_start, rank
""",
)
def streaming_trending_types(spark, sf_dir):
    """Trending top-3 event types per hour, the live-dashboard shape: the
    windowed counts run THROUGH the streaming engine (availableNow +
    complete memory sink — ranking inside an append-mode stream is
    unsupported by design, so the rank is a batch query OVER the sink,
    exactly how a serving layer reads a materialized aggregate).  The
    batch oracle replays counts + ROW_NUMBER."""
    from steampipe_sqlite_spark.streaming.jobs import (
        read_events_stream,
        run_stream_to_memory,
        tumbling_agg,
    )

    name = f"trending_out_{uuid.uuid4().hex[:8]}"
    agg = tumbling_agg(read_events_stream(spark, sf_dir), width="1 hour")
    result = run_stream_to_memory(spark, agg, name, output_mode="complete")
    return (
        result.selectExpr(
            "win_start",
            "event_type",
            "cast(n AS bigint) AS n",
            "row_number() OVER (PARTITION BY win_start"
            " ORDER BY n DESC, event_type) AS rank",
        )
        .where("rank <= 3")
        .orderBy("win_start", "rank")
    )


@query(
    "streaming_static_enrich",
    oracle="""
SELECT c.c_mktsegment AS segment,
       DATE_TRUNC('hour', e.ts) AS win_start,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(ROUND(e.value * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1, 2
ORDER BY segment, win_start
""",
)
def streaming_static_enrich(spark, sf_dir):
    """Stream-STATIC enrichment join run through the streaming engine: the
    event stream joins the static customer dimension (broadcast — no state
    store, no stream-side shuffle), then aggregates revenue per market
    segment per hour.  availableNow + complete output over the finite
    fixture equals the batch join+group oracle exactly."""
    from steampipe_sqlite_spark.streaming.jobs import (
        enrich_with_dim,
        read_events_stream,
        run_stream_to_memory,
    )
    from steampipe_sqlite_spark.tables import load_table

    dim = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    enriched = enrich_with_dim(read_events_stream(spark, sf_dir), dim)
    agg = (
        enriched.groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.window("ts", "1 hour"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("total_cents"),
        )
        .select("segment", F.col("window.start").alias("win_start"), "n", "total_cents")
    )
    name = f"enrich_out_{uuid.uuid4().hex[:8]}"
    result = run_stream_to_memory(spark, agg, name, output_mode="complete")
    return result.orderBy("segment", "win_start")


@query(
    "streaming_session_5m",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 5 MINUTE
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events
),
numbered AS (
  SELECT user_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_no
  FROM flagged
)
SELECT MIN(ts) AS sess_start, user_id, CAST(COUNT(*) AS BIGINT) AS n_events
FROM numbered
GROUP BY user_id, sess_no
ORDER BY user_id, sess_start
""",
)
def streaming_session_5m(spark, sf_dir):
    """Session windows (5-minute gap) run THROUGH the streaming engine:
    watermarked session_window aggregation, availableNow + complete memory
    sink — the stateful merge-adjacent-sessions operator, checked against
    the batch gaps-and-islands oracle (identical over the finite
    fixture)."""
    from steampipe_sqlite_spark.streaming.jobs import (
        read_events_stream,
        run_stream_to_memory,
    )

    ev = read_events_stream(spark, sf_dir).withWatermark("ts", "10 minutes")
    agg = (
        ev.groupBy(F.session_window("ts", "5 minutes"), "user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .select(
            F.col("session_window.start").alias("sess_start"),
            "user_id",
            "n_events",
        )
    )
    name = f"sess_out_{uuid.uuid4().hex[:8]}"
    result = run_stream_to_memory(spark, agg, name, output_mode="complete")
    return result.orderBy("user_id", "sess_start")


@query(
    "streaming_stream_stream_left",
    oracle="""
SELECT p.event_id AS p_id, p.ts AS p_ts, c.event_id AS c_id
FROM events p
LEFT JOIN events c
  ON p.user_id = c.user_id
 AND c.event_type = 'click'
 AND c.ts >= p.ts - INTERVAL 1 HOUR
 AND c.ts <= p.ts
WHERE p.event_type = 'purchase'
  AND p.ts <= (SELECT MAX(ts) FROM events) - INTERVAL 2 HOUR
ORDER BY p_id, c_id
""",
)
def streaming_stream_stream_left(spark, sf_dir):
    """Stream-stream LEFT OUTER join: every purchase, with its same-user
    clicks in the 1-hour lookback, or NULL if none — the stateful outer
    behavior (unmatched rows are held in the state store and NULL-emitted
    only once the watermark proves no match can still arrive) that the
    inner-join query cannot exercise.

    Determinism contract: rows whose eviction the END of a finite stream
    would race (p_ts inside the final watermark horizon) are excluded on
    BOTH sides — the batch post-filter ``p_ts <= max_ts - 2h`` sits
    strictly inside the 0-delay watermark's eviction boundary
    (p_ts + 1h < max_ts), so every retained unmatched row has provably
    flushed; the oracle applies the same bound.  State is bounded by the
    watermark either way."""
    import uuid as _uuid

    from steampipe_sqlite_spark.streaming.jobs import (
        read_events_stream,
        run_stream_to_memory,
    )

    def side(event_type, id_alias, ts_alias):
        return (
            read_events_stream(spark, sf_dir)
            .filter(F.col("event_type") == event_type)
            .select(
                F.col("event_id").alias(id_alias),
                "user_id",
                F.col("ts").alias(ts_alias),
            )
            .withWatermark(ts_alias, "0 seconds")
        )

    purchases = side("purchase", "p_id", "p_ts")
    clicks = side("click", "c_id", "c_ts").withColumnRenamed("user_id", "c_user")
    joined = purchases.join(
        clicks,
        (purchases.user_id == clicks.c_user)
        & (clicks.c_ts >= purchases.p_ts - F.expr("INTERVAL 1 HOUR"))
        & (clicks.c_ts <= purchases.p_ts),
        "left_outer",
    ).select("p_id", "p_ts", "c_id")
    name = f"ssl_out_{_uuid.uuid4().hex[:8]}"
    result = run_stream_to_memory(spark, joined, name, output_mode="append")
    max_ts = load_table(spark, sf_dir, "events").agg(
        F.max("ts").alias("max_ts")
    )
    return (
        result.crossJoin(F.broadcast(max_ts))
        .where("p_ts <= max_ts - INTERVAL 2 HOUR")
        .select("p_id", "p_ts", "c_id")
        .orderBy("p_id", "c_id")
    )
