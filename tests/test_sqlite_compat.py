"""Parity tests for the SQLite-compat layer — oracle is the stdlib
``sqlite3`` engine itself (same core the reference bundles)."""

import sqlite3

import pytest
from pyspark.sql import functions as F

from steampipe_sqlite_spark.functions.sqlite_compat import (
    apply_modifiers,
    glob_match,
    glob_to_regex,
    julianday,
    sqlite_date,
    sqlite_datetime,
    strftime,
    unixepoch,
)

TS_SAMPLES = [
    "2024-01-31 23:59:59",
    "2024-02-29 00:00:00",
    "1995-07-16 12:34:56",
    "1998-12-01 06:00:01",
    "2000-01-01 00:00:00",
]

GLOB_CASES = [
    ("abc*", ["abc", "abcdef", "ABCdef", "xabc"]),
    ("*tab?e*", ["table scan", "tabXe", "tab e ", "tale"]),
    ("[a-c]it*", ["bit", "cite", "dit", "ait hello"]),
    ("[^a-c]it", ["dit", "ait", "it"]),
    ("a[]]b", ["a]b", "ab"]),
    ("100% *", ["100% sure", "100x sure"]),
    ("a.b|c", ["a.b|c", "aXb|c"]),
]


@pytest.fixture(scope="module")
def lite():
    con = sqlite3.connect(":memory:")
    yield con
    con.close()


def test_glob_matches_sqlite(spark, lite):
    for pattern, texts in GLOB_CASES:
        expected = [
            bool(lite.execute("SELECT ? GLOB ?", (t, pattern)).fetchone()[0]) for t in texts
        ]
        df = spark.createDataFrame([(t,) for t in texts], ["t"])
        got = [r.m for r in df.select(glob_match(F.col("t"), pattern).alias("m")).collect()]
        assert got == expected, f"pattern {pattern!r}: {got} != {expected} (regex {glob_to_regex(pattern)!r})"


MODIFIER_SETS = [
    (),
    ("+7 days",),
    ("-3 months",),
    ("+1 years", "start of month"),
    ("start of year", "+90 days"),
    ("start of day",),
    ("weekday 1",),
    ("-36 hours", "weekday 0"),
    ("+90 minutes", "+30 seconds"),
]


def _spark_vals(spark, col):
    df = spark.createDataFrame([(t,) for t in TS_SAMPLES], ["s"])
    return [
        r.v for r in df.select(col(F.to_timestamp(F.col("s"))).alias("v")).collect()
    ]


def test_date_and_datetime_with_modifiers(spark, lite):
    for mods in MODIFIER_SETS:
        exp_date = [
            lite.execute(f"SELECT date(?{',?' * len(mods)})", (t, *mods)).fetchone()[0]
            for t in TS_SAMPLES
        ]
        got_date = _spark_vals(spark, lambda c, m=mods: sqlite_date(c, *m))
        assert got_date == exp_date, f"date mods {mods}"
        exp_dt = [
            lite.execute(f"SELECT datetime(?{',?' * len(mods)})", (t, *mods)).fetchone()[0]
            for t in TS_SAMPLES
        ]
        got_dt = _spark_vals(spark, lambda c, m=mods: sqlite_datetime(c, *m))
        assert got_dt == exp_dt, f"datetime mods {mods}"


def test_strftime_token_subset(spark, lite):
    fmts = ["%Y-%m-%d", "%H:%M:%S", "%Y/%j", "%s", "%w", "%Y-%m-%dT%H:%M", "%d.%m.%Y %% %T"]
    for fmt in fmts:
        expected = [
            lite.execute("SELECT strftime(?, ?)", (fmt, t)).fetchone()[0] for t in TS_SAMPLES
        ]
        if any(e is None for e in expected):
            continue  # token postdates the stdlib's bundled SQLite
        got = _spark_vals(spark, lambda c, f=fmt: strftime(f, c))
        assert got == expected, f"fmt {fmt!r}"


def test_julianday_and_unixepoch(spark, lite):
    exp_jd = [float(lite.execute("SELECT julianday(?)", (t,)).fetchone()[0]) for t in TS_SAMPLES]
    got_jd = _spark_vals(spark, julianday)
    assert got_jd == pytest.approx(exp_jd, abs=1e-9)
    exp_ue = [int(lite.execute("SELECT unixepoch(?)", (t,)).fetchone()[0]) for t in TS_SAMPLES]
    got_ue = _spark_vals(spark, unixepoch)
    assert got_ue == exp_ue


def test_unsupported_constructs_raise(spark):
    with pytest.raises(ValueError):
        apply_modifiers(F.lit("2024-01-01").cast("timestamp"), "localtime")
    with pytest.raises(ValueError):
        strftime("%G", F.lit("2024-01-01").cast("timestamp"))


def test_groups_frame_is_a_documented_rejection(spark):
    """SQLite (3.28+) supports GROUPS window frames; Spark does not
    (SURVEY §7.5.3 documents the rejection). Pin that the gap surfaces as
    a parse error, not silent misbehavior."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import ParseException

    with pytest.raises((ParseException, Py4JJavaError, Exception)) as ei:
        spark.sql(
            "SELECT sum(o_totalprice) OVER (ORDER BY o_orderkey "
            "GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) FROM orders"
        ).collect()
    assert "GROUPS" in str(ei.value).upper() or "PARSE" in type(ei.value).__name__.upper()


class TestWindowFrameEmulation:
    """Ground truth for the GROUPS/EXCLUDE rewrites (plans/relational.py
    win_groups_frame / win_exclude_*): stdlib sqlite3 runs the NATIVE
    construct, Spark runs the emulation, results must match row for row."""

    ROWS = [
        (1, "a", "2024-01-01", 10),
        (2, "a", "2024-01-02", 20),
        (3, "a", "2024-01-02", 21),
        (4, "a", "2024-01-03", 30),
        (5, "b", "2024-01-01", 5),
        (6, "b", "2024-01-01", 7),
    ]

    @pytest.fixture()
    def sqlite_conn(self):
        import sqlite3

        c = sqlite3.connect(":memory:")
        c.execute("CREATE TABLE t(id INT, p TEXT, d TEXT, x INT)")
        c.executemany("INSERT INTO t VALUES (?,?,?,?)", self.ROWS)
        return c

    @pytest.fixture()
    def sdf(self, spark):
        return spark.createDataFrame(self.ROWS, "id int, p string, d string, x int")

    def test_groups_frame_rewrite_matches_native(self, sqlite_conn, sdf):
        native = sqlite_conn.execute(
            "SELECT id, SUM(x) OVER (PARTITION BY p ORDER BY d "
            "GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) FROM t ORDER BY id"
        ).fetchall()
        sdf.createOrReplaceTempView("t_groups")
        emulated = sdf.sparkSession.sql(
            """
            WITH g AS (
              SELECT id, x,
                     DENSE_RANK() OVER (PARTITION BY p ORDER BY d) AS grp, p
              FROM t_groups
            )
            SELECT id, SUM(x) OVER (PARTITION BY p ORDER BY grp
                 RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) AS s
            FROM g ORDER BY id
            """
        ).collect()
        assert [(r.id, r.s) for r in emulated] == native

    def test_exclude_current_row_rewrite_matches_native(self, sqlite_conn, sdf):
        native = sqlite_conn.execute(
            "SELECT id, SUM(x) OVER (PARTITION BY p ORDER BY id "
            "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW EXCLUDE CURRENT ROW) "
            "FROM t ORDER BY id"
        ).fetchall()
        sdf.createOrReplaceTempView("t_excl")
        emulated = sdf.sparkSession.sql(
            """
            SELECT id,
                   CASE WHEN COUNT(*) OVER w = 1 THEN NULL
                        ELSE (SUM(x) OVER w) - x END AS s
            FROM t_excl
            WINDOW w AS (PARTITION BY p ORDER BY id
                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
            ORDER BY id
            """
        ).collect()
        assert [(r.id, r.s) for r in emulated] == native

    def test_exclude_group_rewrite_matches_native(self, sqlite_conn, sdf):
        native = sqlite_conn.execute(
            "SELECT id, SUM(x) OVER (PARTITION BY p ORDER BY d "
            "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW EXCLUDE GROUP) "
            "FROM t ORDER BY id"
        ).fetchall()
        sdf.createOrReplaceTempView("t_exg")
        emulated = sdf.sparkSession.sql(
            """
            SELECT id,
                   CASE WHEN COUNT(*) OVER run = COUNT(*) OVER peers THEN NULL
                        ELSE (SUM(x) OVER run) - (SUM(x) OVER peers) END AS s
            FROM t_exg
            WINDOW run AS (PARTITION BY p ORDER BY d
                           RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   peers AS (PARTITION BY p, d)
            ORDER BY id
            """
        ).collect()
        assert [(r.id, r.s) for r in emulated] == native
