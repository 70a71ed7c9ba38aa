"""bench.py is a driver contract (one JSON line with per-query seconds) —
pin the pieces a refactor could silently break without running Spark."""

import sys


def test_headline_queries_registered_with_oracles():
    sys.path.insert(0, "/root/repo")
    from bench import HEADLINE, RUNS

    from steampipe_sqlite_spark.plans.registry import collect

    q, o = collect()
    missing = [n for n in HEADLINE if n not in q]
    assert not missing, f"headline names not registered: {missing}"
    # every headline query must have a DuckDB twin so the ratio covers it
    no_oracle = [n for n in HEADLINE if n not in o]
    assert not no_oracle, f"headline queries without oracle SQL: {no_oracle}"
    assert RUNS >= 3
