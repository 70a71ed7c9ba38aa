"""generate_series TVF: SQLite series-extension parity.

Ground truth is the sqlite3 stdlib module where available (it may lack the
series extension; then literal expectations apply — the SQLite docs define
the exact contract: inclusive stop, default step 1, negative steps count
down, step 0 errors).
"""

import pytest

from steampipe_sqlite_spark.functions.series import ensure_generate_series


def _series(spark, sql):
    ensure_generate_series(spark)
    return [r.value for r in spark.sql(sql).collect()]


def test_basic_range(spark):
    assert _series(spark, "SELECT * FROM generate_series(1, 5, 1)") == [1, 2, 3, 4, 5]


def test_step_and_inclusive_stop(spark):
    assert _series(spark, "SELECT * FROM generate_series(0, 10, 3)") == [0, 3, 6, 9]
    assert _series(spark, "SELECT * FROM generate_series(0, 9, 3)") == [0, 3, 6, 9]


def test_negative_step(spark):
    assert _series(spark, "SELECT * FROM generate_series(5, 1, -2)") == [5, 3, 1]


def test_empty_when_start_past_stop(spark):
    assert _series(spark, "SELECT * FROM generate_series(5, 1, 1)") == []


def test_zero_step_errors(spark):
    ensure_generate_series(spark)
    with pytest.raises(Exception, match="step size must not be zero"):
        spark.sql("SELECT * FROM generate_series(1, 5, 0)").collect()


def test_lateral_correlated_argument(spark):
    ensure_generate_series(spark)
    rows = spark.sql(
        """
        SELECT k, t.value AS v
        FROM VALUES (1), (3) AS src(k),
             LATERAL generate_series(1, k, 1) t
        ORDER BY k, v
        """
    ).collect()
    assert [(r.k, r.v) for r in rows] == [(1, 1), (3, 1), (3, 2), (3, 3)]


def test_sqlite_parity_if_extension_present(spark):
    import sqlite3

    con = sqlite3.connect(":memory:")
    try:
        expected = [r[0] for r in con.execute("SELECT value FROM generate_series(2, 20, 5)")]
    except sqlite3.OperationalError:
        pytest.skip("sqlite3 build lacks the series extension")
    assert _series(spark, "SELECT * FROM generate_series(2, 20, 5)") == expected
