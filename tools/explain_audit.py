"""Dump executed physical plans for the headline queries into PLANS.md.

Usage: python tools/explain_audit.py [sf_dir]

The audit extracts, per query, the plan facts that matter at scale —
join strategies, exchange count, pushed filters, scan schema width,
codegen spans — then the full final plan.  Regenerate after any plan-
affecting change; tests/test_plans.py pins the critical properties, this
file makes all of them reviewable at once.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE
from steampipe_sqlite_spark.plans.registry import collect
from steampipe_sqlite_spark.session import get_spark

EXTRA = [
    "join_range_binned",
    "window_rollup_hierarchy",
    "knn_cosine_lsh",
    "sketch_hll_users",
    "dedup_components",
    "sessionize_events",
    "knn_cosine_int8",
    "text_gopher_flags",
    "cluster_kmeans",
    "dedup_semantic",
    "sketch_quantile_hist",
    "text_decontaminate_bloom",
    "win_global_rownum_scale",
    "sketch_topk_tokens",
    "text_chunk_sliding",
    "ts_gapfill_locf",
    "sample_weighted_md5",
    "dedup_cdc_chunks",
    "cdc_latest_state",
    "cdc_scd2_intervals",
    "schema_evolution_union",
    "dedup_exact_substrings",
    "search_bm25_topk",
    "search_inverted_index",
    "knn_cosine_filtered",
    "ts_ohlc_hourly",
    "ts_twap_hourly",
    "graph_pagerank",
    "curation_keep_list",
    # round 5
    "knn_cosine_pq",
    "dedup_containment_ngram",
    "contamination_source_matrix",
    "search_hybrid_rrf",
    "text_keyword_tag",
    "dataset_epochs_schedule",
    "agg_corr_covar_moments",
    "join_lateral_topn",
    "search_mmr_diversified",
    "mm_video_scene_cuts",
    "mm_audio_silence_runs",
    "text_oov_rate",
    "emb_random_projection",
    "quality_constraints_audit",
    "dataset_drift_tvd",
    "win_range_interval",
    "dedup_ppjoin_exact",
    "graph_bfs_distances",
    "sketch_cms_token_counts",
    "dataset_snapshot_diff",
    # round 6
    "mm_image_phash_neardup",
    "bpe_merge_step",
    "vocab_growth_curve",
    "text_novelty_ordered",
    "emb_matryoshka_fidelity",
    "sample_systematic_weighted",
    "join_asof_tolerance",
    "ts_interval_union",
    "agg_weighted_median",
    "key_skew_profile",
    "stats_equidepth_bins",
    "shard_by_bytes",
    "graph_triangle_count",
    "user_activity_streaks",
    "funnel_latency_stats",
    "attribution_last_touch",
    "rfm_segmentation",
    "impute_by_group_median",
    "str_edit_distance",
    "winsorized_length_stats",
    "dataset_split_temporal",
    "market_basket_pairs",
    # round 6, continuation session
    "eval_auc_mann_whitney",
    "stats_gini_spend",
    "stats_benford_first_digit",
    "stats_pareto_topdecile",
    "agg_mode_per_group",
    "ts_seasonal_naive_mae",
    "token_pair_lift",
    "graph_two_hop_reach",
    "dataset_kfold_stratified",
    "stats_chi2_lang_source",
    "text_hapax_ratio",
    "emb_label_centroid_geometry",
    "eval_ndcg_at10",
    "events_transition_matrix",
    "events_interarrival_hist",
    "events_growth_daily",
    "ts_threshold_crossings",
    "join_fuzzy_blocked_prefix",
    "compat_printf_integer",
    "join_scd2_point_in_time",
    "agg_bitwise",
    "agg_width_bucket_hist",
    "win_running_distinct",
    "stats_join_size_profile",
    "mm_video_neardup_shingles",
    "stats_ks_lengths",
    "events_user_hhi",
    "ts_autocorr_lag1",
    "text_vocab_jaccard_langs",
    "privacy_k_anonymity",
    "group_cube_grouping_flags",
    "agg_any_value_functional",
    "ts_cusum_changepoint",
    "stats_benford_deviation",
]


def facts(plan: str) -> list[str]:
    out = []
    joins = re.findall(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)", plan)
    if joins:
        out.append("joins: " + ", ".join(joins))
    out.append(f"exchanges: {plan.count('Exchange')}")
    cg = sorted(set(re.findall(r"\*\((\d+)\)", plan)), key=int)
    out.append(f"codegen spans: {len(cg)}")
    pushed = re.findall(r"PushedFilters: \[([^\]\n]*)", plan)  # toString may truncate the line
    nonempty = [p for p in pushed if p.strip()]
    if nonempty:
        out.append(f"pushed filters: {nonempty[0][:120]}")
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    if schemas:
        widths = [len(s.split(",")) for s in schemas]
        out.append(f"scan widths (cols): {widths}")
    if "MapInPandas" in plan:
        out.append("python stage: MapInPandas (Arrow-batched)")
    if "FlatMapGroupsInPandasWithState" in plan:
        out.append("python stage: applyInPandasWithState")
    return out


def main() -> None:
    # FULL-corpus audit (VERDICT r6 #4): every registered query gets a plan
    # entry — HEADLINE + EXTRA first (reviewed order), then the remainder
    # of the corpus in registration order.
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("explain_audit")
    queries, _ = collect()
    curated = list(dict.fromkeys(HEADLINE + EXTRA))
    names = curated + [n for n in queries if n not in set(curated)]
    lines = [
        "# PLANS — executed physical plans of the full query corpus",
        "",
        f"Generated by `tools/explain_audit.py` at `{sf_dir}`. Regenerate after",
        "plan-affecting changes; tests/test_plans.py enforces the critical",
        "properties, this file shows all of them.  Headline + curated",
        "queries first, then the rest of the corpus in registration order.",
        "",
    ]
    errors = []
    for name in names:
        fn = queries[name]
        try:
            df = fn(spark, sf_dir)
            df.collect()
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001 — record, keep auditing
            errors.append(name)
            lines += [f"## {name}", "", f"- ERROR: {str(exc)[:200]}", ""]
            continue
        finally:
            # drop persisted intermediates (dedup pair sets, distributed-
            # helper range shuffles) — 270 queries' worth accumulating in
            # one session is the heap-exhaustion mode selfcheck's chunked
            # sweep exists to avoid; each query is fully collected before
            # its cache is cleared, so stale-offset re-execution can't
            # occur
            spark.catalog.clearCache()
        final = plan.split("== Initial Plan ==")[0].rstrip()
        lines.append(f"## {name}")
        lines.append("")
        for f in facts(final):
            lines.append(f"- {f}")
        lines.append("")
        lines.append("```")
        lines.append(final)
        lines.append("```")
        lines.append("")
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as fh:
        fh.write("\n".join(lines))
    print(f"PLANS.md written ({len(names)} queries; {len(errors)} errors: {errors})")


if __name__ == "__main__":
    main()
