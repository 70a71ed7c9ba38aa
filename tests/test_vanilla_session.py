"""Regression: the corpus must run under the DRIVER'S vanilla SparkSession.

Round-1 post-mortem (VERDICT.md): 24/28 CORRECTNESS failures came from
load_table assuming spark.sql.legacy.parquet.nanosAsLong was pre-set on the
session — true for our session.py builder, false for the external driver's
vanilla session, so events.parquet (TIMESTAMP NANOS) killed register_views
for every SQL query.  These tests simulate the vanilla session by unsetting
the conf and clearing the memo, then exercising the read paths.
"""

import pytest

from steampipe_sqlite_spark import tables
from steampipe_sqlite_spark.tables import ALL_TABLES, load_table, referenced_tables

SF = "/root/testdata/sf0.001"


def _make_vanilla(spark):
    """Strip the conf our builder pre-sets, so reads behave as under the
    driver's session."""
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    # one weak per-session map now holds table, view, and conf memos
    if tables._SESSION_STATE is not None:
        tables._SESSION_STATE.clear()


def test_load_events_sets_nanos_conf_itself(spark):
    _make_vanilla(spark)
    df = load_table(spark, SF, "events")
    assert df.count() > 0
    assert dict(df.dtypes)["ts"] in ("timestamp", "timestamp_ntz")
    assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"


def test_sql_query_registers_only_referenced_tables(spark):
    _make_vanilla(spark)
    # a lineitem-only query must not be taken down by an unrelated table
    from steampipe_sqlite_spark.plans.registry import collect

    q, _ = collect()
    assert q["tpch_q6"](spark, SF).count() >= 0


def test_referenced_tables_word_boundary():
    assert referenced_tables("SELECT * FROM lineitem") == ("lineitem",)
    # 'nation' inside 'denationalized' must not match
    assert "nation" not in referenced_tables("SELECT denationalized FROM part")
    assert referenced_tables("SELECT 1") == ALL_TABLES
    got = referenced_tables("SELECT * FROM orders JOIN customer ON c_custkey = o_custkey")
    assert set(got) == {"orders", "customer"}


def test_non_utc_session_is_pinned_to_utc(spark):
    """A driver session in another timezone must not shift epochs: the
    oracles treat naive timestamps as UTC, so load_table pins the session
    timezone.  Without the pin, unix_timestamp() here returns values
    offset by the zone difference (a silent wrong answer, same failure
    class as round 2's streaming bug)."""
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    _make_vanilla(spark)
    events = load_table(spark, SF, "events")
    events.createOrReplaceTempView("events")
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    got = spark.sql(
        "SELECT unix_timestamp(DATE_TRUNC('second', ts)) AS e FROM events ORDER BY event_id LIMIT 1"
    ).first().e
    import duckdb

    expected = duckdb.sql(
        f"SELECT CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT) AS e FROM '{SF}/events.parquet' ORDER BY event_id LIMIT 1"
    ).fetchone()[0]
    assert got == expected


@pytest.fixture(autouse=True)
def _restore(spark):
    yield
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
