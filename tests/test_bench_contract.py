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


# The round this _WINDOW_PRIORITY was built for.  Freshness below is
# computed ONLY from driver artifacts of rounds BEFORE this one: the
# driver drops CORRECTNESS_r{WINDOW_ROUND}.json mid-round recording the
# very window this test polices, so including it would mark every member
# fresh and fail the assertion (the round-9 time bomb — VERDICT r9 #1).
WINDOW_ROUND = 15

# Corpus names with no driver row in any pre-window-round artifact lead
# the window (r11/r12 precedent).  Round 14 added `bridge_paged_scan_bulk`
# AFTER the r14 window had rotated, so it has never had a driver row and
# leads the round-15 window (VERDICT r14 #4).
NEVER_CHECKED_LEAD: list[str] = ["bridge_paged_scan_bulk"]


def test_round15_driver_window_is_least_recently_checked():
    """The driver verifies the FIRST 50 collect() entries per round; the
    round-15 rotation (VERDICT r14 #4) is the never-checked bulk-bridge
    lead + least-recently-checked continuation — the names whose most
    recent driver row is oldest.  Recompute that order here from the
    committed pre-window-round artifacts (round order, then artifact
    insertion order within a round — the same tiebreak the rotation
    uses) and pin window == lead + first 49 of it, so a
    registration-order or priority-list refactor can't silently evict a
    stale name."""
    import glob
    import json
    import re

    sys.path.insert(0, "/root/repo")
    from steampipe_sqlite_spark.plans.registry import collect

    q, _ = collect()
    window = list(q)[:50]
    last = {}
    rounds = []
    for f in sorted(glob.glob("/root/repo/CORRECTNESS_r*.json")):
        rnd = int(re.search(r"_r0*(\d+)\.json$", f).group(1))
        if rnd >= WINDOW_ROUND:
            continue  # the window's own (or a later) artifact — see above
        rounds.append((rnd, f))
        for name in json.load(open(f)):
            last[name] = max(last.get(name, 0), rnd)
    stale_order = []
    for rnd, f in sorted(rounds):
        for name in json.load(open(f)):
            if last[name] == rnd and name not in stale_order:
                stale_order.append(name)
    for n in NEVER_CHECKED_LEAD:
        assert n not in last, f"lead name {n} already has a driver row"
        assert n in q, f"lead name {n} not registered"
    expected = NEVER_CHECKED_LEAD + stale_order[: 50 - len(NEVER_CHECKED_LEAD)]
    assert window == expected, (
        "window must be the never-checked lead + the least-recently-"
        f"driver-checked names (computed from pre-r{WINDOW_ROUND} "
        f"artifacts); "
        f"unexpected: {[n for n in window if n not in expected]}, "
        f"evicted: {[n for n in expected if n not in window]}"
    )


def test_compact_summary_line_fits_driver_tail_capture():
    """The driver records only the LAST ~2000 stdout chars and parses the
    last JSON line out of them (BENCH_r07 parsed; r08/r09 did not once the
    single detail line outgrew the window).  bench.py now prints a compact
    summary as its final line — pin that a worst-case rendering of it
    (every per-query float at full width) still fits with headroom, so
    adding a headline query can't silently break ``parsed`` again."""
    import json

    sys.path.insert(0, "/root/repo")
    from bench import HEADLINE

    worst = {n: 123.456 for n in HEADLINE}
    line = json.dumps(
        {
            "metric": "headline_total_best_of_5",
            "value": 12345.678,
            "unit": "sec",
            "queries": worst,
            "duckdb": worst,
            "duckdb_total": 12345.678,
            "ratio_vs_duckdb": 123.456,
            "ratio_med": 123.456,
            # r15 additions (VERDICT r14 #2): the min-across-all-runs
            # rollup and the multi-core contention sentinel pair
            "qmin": 12345.678,
            "noise": {
                "sentinel_before": 123.4567,
                "sentinel_after": 123.4567,
                "mc_before": 123.4567,
                "mc_after": 123.4567,
            },
            "sf": 0.001,
        }
    )
    # the interleaved_pair_ratios middle line (VERDICT r12 #6) must fit
    # the tail capture TOGETHER with the compact line, or the compact
    # parse survives but the drift annotation is truncated away
    ratio_line = json.dumps(
        {
            "metric": "interleaved_pair_ratios",
            "ratios": {n: [123.45, 123.45] for n in HEADLINE},
            "ratio_med_total": 123.456,
        }
    )
    # the compact line ALONE must parse even if the ratios line is
    # truncated — it is the machine-readable contract
    assert len(line) < 1400, f"compact summary grew to {len(line)} chars"
    # the measured driver capture is exactly 2000 chars (BENCH_r14.json
    # tail); the worst case here (123.456 s per query — 100x today's
    # realities) must still fit it.  The pre-r15 1950 headroom was spent
    # on the VERDICT r14 #2 additions (qmin + mc sentinels).
    assert len(line) + len(ratio_line) < 2000, (
        f"compact summary ({len(line)}) + pair-ratio line "
        f"({len(ratio_line)}) = {len(line) + len(ratio_line)} chars — "
        "exceeds the driver's 2000-char tail capture; trim fields"
    )
