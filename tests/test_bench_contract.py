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


def test_round8_driver_window_leads_with_unverified_names():
    """The driver verifies the FIRST 50 collect() entries per round; the
    round-8 rotation plan (VERDICT r7 #2) puts the 12 never-driver-checked
    backlog names and the 7 round-8 additions at the head.  Pin it so a
    registration-order or priority-list refactor can't silently evict the
    names the window exists to certify."""
    sys.path.insert(0, "/root/repo")
    from steampipe_sqlite_spark.plans.registry import collect

    q, _ = collect()
    window = list(q)[:50]
    must_lead = {
        # round-7 deferrals + round-7 additions (the never-checked 12)
        "agg_bitwise", "agg_mode_per_group", "compat_printf_integer",
        "stats_benford_first_digit", "stats_benford_deviation",
        "group_cube_grouping_flags", "agg_any_value_functional",
        "dedup_soft_weights", "bitext_margin_pairs", "dedup_keep_best",
        "eval_calibration_bins", "mining_hard_negatives",
        # round-8 additions
        "eval_confusion_matrix", "privacy_l_diversity",
        "text_zipf_band_counts", "graph_label_prop_step",
        "emb_power_iteration_step", "ts_mann_kendall_daily",
        "win_percent_rank_cume_dist",
    }
    missing = must_lead - set(window)
    assert not missing, f"rotation window lost never-verified names: {missing}"
