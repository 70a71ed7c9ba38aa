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


def test_round9_driver_window_is_least_recently_checked():
    """The driver verifies the FIRST 50 collect() entries per round; the
    round-9 rotation (VERDICT r8 #6) is strictly least-recently-checked —
    the 2 new round-9 queries (first driver row) plus names whose last
    green row is the r3/r4 window.  Pin both the new names and the
    freshness property so a registration-order or priority-list refactor
    can't silently evict them."""
    import glob
    import json

    sys.path.insert(0, "/root/repo")
    from steampipe_sqlite_spark.plans.registry import collect

    q, _ = collect()
    window = list(q)[:50]
    must_lead = {"text_bpe_apply_fidelity", "compat_collate_nocase"}
    missing = must_lead - set(window)
    assert not missing, f"rotation window lost the new round-9 names: {missing}"
    # freshness: no window member (other than new names) was last checked
    # after round 5 — computed from the committed driver artifacts
    last = {}
    for f in sorted(glob.glob("/root/repo/CORRECTNESS_r0*.json")):
        rnd = int(f.rsplit("r0", 1)[1].split(".")[0])
        for name in json.load(open(f)):
            last[name] = max(last.get(name, 0), rnd)
    stale_violations = [
        n for n in window if n in last and last[n] > 5
    ]
    assert not stale_violations, (
        f"window contains recently-checked names: {stale_violations}"
    )
