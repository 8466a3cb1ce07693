#!/usr/bin/env python
"""Regenerate PLANS.md: physical-plan evidence for the headline queries.

Usage: python tools/dump_plans.py  (writes /root/repo/PLANS.md)

For each query: the PlanFacts summary (exchanges, join strategies,
aggregate split, Python eval mode) plus every parquet scan's pushed
filters and read schema — the observable form of "filters reach the
scan, dims broadcast, aggregation is partial→final".
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_wordcounter_spark import get_spark  # noqa: E402
from mapreduce_wordcounter_spark.plans.inspect import plan_facts  # noqa: E402
from mapreduce_wordcounter_spark.registry import all_queries  # noqa: E402

SHOWCASE = [
    "wc_counts",
    "scan_filter_project",
    "q5_regional_revenue",
    "join_fact_revenue",
    "join_asof_last_purchase",
    "tf_idf",
    "minhash_signatures",
    "lsh_verified_pairs",
    "simhash32",
    "ann_ivf_topk",
    "ev_session_windows",
    "mm_features_pandas",
    "q10_returned_items",
    "q18_large_volume",
    "unpivot_measures",
    "word_typo_pairs",
    "mm_audio_windows",
    "ev_resample_ffill",
    "dedup_components_canonical",
    "join_not_in_nulls",
    "embedding_top_pairs_bucketed",
    "q6_forecast_revenue",
    "q4_order_priority",
    "q14_promo_revenue",
    "q19_discounted_revenue",
    "window_qualify_pareto",
    "grouped_ols_slope",
    # round 3
    "quality_score_gopher",
    "benchmark_contamination_rate",
    "bm25_topk",
    "semantic_dedup_components",
    "dedup_incremental_new",
    "boilerplate_ngrams",
    "pack_sequences",
    "vocab_top1k",
    "jaccard_capped_pairs",
    "minhash_jaccard_est",
    "dataset_split_assign",
    "pipeline_curate",
    "source_unigram_kl",
    "ann_lsh_topk",
    "chunk_documents",
    "ev_interpolate_linear",
    "q7_nation_volume",
    "q13_customer_distribution",
    "q17_small_quantity_revenue",
    "winnowing_fingerprints",
    "mixture_weights",
    "ev_ohlc_hourly",
    "mm_chunk_dedup",
    # round 4
    "q2_min_cost_supplier",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_stock",
    "q15_top_supplier",
    "q21_waiting_orders",
    "q22_global_sales_opportunity",
    "dedup_paragraphs",
    "dedup_substring_spans",
    "c4_line_filter",
    "pii_redacted_stats",
    "quality_classifier_score",
    "wc_cms_heavy_hitters",
    "mixture_temperature_weights",
    "ann_ivfpq_topk",
    "ev_scd2_user_state",
    "ev_funnel_conversion",
    "ev_retention_cohorts",
    "ev_value_outliers",
    "ev_value_histogram",
    "variant_props_agg",
    "sql_recursive_calendar",
    "doc_mean_word_rank",
    "trigram_index_match",
    "doc_unigram_logprob",
    "merge_upsert_orders",
    "table_quality_audit",
    "skew_top_keys",
    "pyds_wordcount",
    # round 4, second wave
    "graph_pagerank",
    "graph_triangle_counts",
    "graph_adjacent_users",
    "doc_bigram_logprob",
    "bpe_top_pairs",
    "ev_type_transitions",
    "ev_distinct_users_hourly",
    "source_gated_docs",
    # round 4, third wave
    "graph_label_propagation",
    "graph_common_neighbors",
    "ev_top_paths",
    "ev_anomaly_mad",
    "ev_gap_stats",
    "ev_rolling_stats",
    "bigram_pmi_top50",
    "doc_keywords_top3",
    "join_bucketed_colocated",
    "join_lateral_topn",
    "sql_pipe_q",
    "mm_features_arrow",
    "source_lang_chisq",
    "stratified_topk_sample",
    # round 4, fourth wave
    "pipeline_tokenize_pack",
    "doc_token_ids",
    "part_affinity_lift",
    "orders_rfm_segments",
    "lineitem_abc_analysis",
    "orders_open_backlog",
    "experiment_assignment_lift",
    "graph_degree_assortativity",
    "embedding_centroid_shift",
    "ann_ivf_recall",
    "join_hinted_shuffle_hash",
    "udf_arrow_vowel_ratio",
    "ev_rolling_zscore",
    "ev_first_touch",
    # round 4, fifth wave
    "graph_modularity",
    "hashed_features",
    "lsh_containment_pairs",
    "supplier_lead_time",
    "ev_benford_deviation",
    "ev_autocorr_lag1",
    "ev_seasonality_dow_hour",
    # round 5
    "bpe_learn_merges",
    "bpe_subword_vocab",
    "bpe_tokenize",
    "bpe_pack_sequences",
    "trigram_index_probe",
    "graph_kcore_peel",
    "graph_jaccard_neighbors",
    "dedup_keep_best_quality",
    "zorder_layout",
    "zorder_probe",
    "dpp_partitioned_join",
    "ann_rp_topk",
    "jaccard_prefix_join",
    "sample_weighted_topk",
    # round 6: versioned-table tier + stateful twin
    "table_time_travel",
    "merge_into_versioned",
    "table_delete_versioned",
    "table_changes_feed",
    "stream_merge_versioned",
    "table_pruned_range",
    "pipeline_curate_versioned",
    "mv_incremental_refresh",
    "quality_lr_predict",
    "quality_lr_auc",
    "embedding_covariance",
    "epoch_shuffle_assignments",
    "table_bloom_point_lookup",
    # round 7: PCA deflation/whitening, hashed classifier, DSIR,
    # collect-free global rank
    "embedding_pca_top3",
    "embedding_pca_project",
    "embedding_pca_whiten",
    "quality_lr_train_hashed",
    "quality_lr_hashed_holdout_auc",
    "dsir_importance_weights",
    "dsir_topk_selection",
    "zipf_slope",
    # round 8: fraction-scale DSIR selection (distributed rank +
    # integer quantile threshold), the PCA model surface, the
    # stochastic Gumbel resamplers, and the lakehouse protocol
    # additions (column mapping + write-time CDC)
    "dsir_sample_fraction",
    "embedding_pca_explained_variance",
    "dsir_gumbel_sample",
    "dsir_gumbel_sample_fraction",
    "table_column_mapping",
    "table_changes_feed_log",
    "merge_delete_branch_versioned",
    # round 9: full MERGE clause matrix + schema evolution; the
    # index-less trigram scan under its new build-tier name
    "merge_full_matrix_versioned",
    "merge_full_cdc_versioned",
    "merge_schema_evolution_versioned",
    "index_staleness_catalog",
    "trigram_match_scan",
    # round 9 (late): table-format completion + bucketed SimHash
    "simhash_hamming_pairs",
    "table_partition_pruning",
    "table_partition_delete_versioned",
    "table_expectations_audit",
    "table_clone_divergence",
    "table_delete_mor_versioned",
    "stream_expectations_gated",
    "table_partition_overwrite",
    "table_dv_maintenance_decision",
    "stream_versioned_source",
    # round 10: hidden partition transforms + the CDF streaming source
    "table_partition_transform",
    "stream_changes_feed",
    "stream_cdf_incremental_mv",
    "table_history",
    "table_partitions_metadata",
    "table_scd2_from_cdf",
    "table_symlink_manifest",
    "table_partition_range_probe",
    # round 11: curation budget tier, two-column skipping, SQ8 ANN,
    # OPTIMIZE ZORDER probe
    "ccnet_perplexity_buckets",
    "token_budget_allocation",
    "table_multicol_skip_probe",
    "ann_ivf_sq8_topk",
    "table_optimize_zorder",
    "graph_cc_twophase",
    "table_quarantine_audit",
    "mv_join_incremental",
    "ev_bootstrap_ci_mean",
    "table_partition_evolution",
    "join_size_by_key_product",
    # round 12: the post-rewrite hour-granular pruned read, the spec
    # lineage metadata surface, and the outer attribution join (its
    # drain runs inside the query; the recorded plan is the drained
    # batch result — the NOTE below carries its fixed-vs-data split,
    # VERDICT r11 #4)
    "table_spec_rewrite_legacy",
    "table_spec_lineage",
    "table_wap_publish",
    "stream_click_attribution_outer",
    # round 12 wave 3: the truncated-dim prefilter + exact re-rank,
    # and the positional posting probe (index read, never a scan)
    "ann_matryoshka_topk",
    "search_phrase_positional",
    "table_restore_audit",
    "table_wap_merge_publish",
    "stream_wap_merge_versioned",
    "hilbert_layout",
    "hilbert_vs_zorder_spans",
    "hilbert_probe",
]

# Belt-and-braces: a duplicated SHOWCASE entry (it has happened) would
# silently double plan-dump work and produce two identical PLANS.md
# sections — dedupe preserving first-occurrence order.
SHOWCASE = list(dict.fromkeys(SHOWCASE))

# Fixed-cost vs data-cost annotations (VERDICT r11 #4): the serve-tier
# entries above ~2.5 s that are NOT declared baselines owe most of
# their wall to per-query fixed setup, not to data volume — written
# down here so a 2x-at-bigger-sf audit reads the split instead of
# extrapolating the total.
NOTES: dict[str, str] = {
    "hilbert_layout": (
        "build tier: the d-value is 8 chained integer CASE steps "
        "unrolled at plan time (per-row, codegen'd, no UDF) feeding "
        "the distributed exact-NTILE — measured exponent 0.20 at the "
        "x10 corpus vs zorder_layout's 0.33 (SCALE_CHECK r12); this "
        "is the nightly re-cluster job, amortized over every "
        "hilbert_probe slice after it (probe exponent 0.17)."
    ),
    "stream_wap_merge_versioned": (
        "fixed-vs-data: the staged micro-batch MERGE chain + publish "
        "runs once per (session, sf) in the fixture (the at-rest "
        "posture); the timed serve pass reads three snapshot states "
        "(~0.26 s at sf0.1). At scale the per-batch cost is "
        "stream_merge_versioned's file-pruned CoW rewrite; WAP adds "
        "one KB ref write per batch and one pointer move at publish."
    ),
    "stream_click_attribution_outer": (
        "fixed-vs-data: ~2.9 s wall at sf0.1 is dominated by streaming "
        "drain setup (two availableNow sources, checkpoint init, "
        "microbatch scheduling) — the x10 corpus probe measures "
        "exponent 0.09 (SCALE_CHECK), i.e. 10x the events moved the "
        "wall ~1.2x; the data-proportional part is the watermark-"
        "bounded join state, ∝ click/purchase rate x window."
    ),
    "ev_bootstrap_ci_mean": (
        "fixed-vs-data: the data cost is the honest constant x32 "
        "map-side replicate fan-out + one map-combined groupBy "
        "(linear in events, no per-replicate pass, no global count); "
        "everything after is fixed-size — a 32-row bounded window and "
        "a 1-row broadcast point estimate. Measured: exponent 0.46 at "
        "the x10 corpus (SCALE_CHECK r12) — the linear fan-out half "
        "amortizing the fixed half."
    ),
    "stream_cdf_incremental_mv": (
        "fixed-vs-data: wall is drain setup (microbatch scheduling + "
        "per-batch MERGE commit latency on the view table) plus a "
        "data cost ∝ CHANGE-FEED bytes, never the base table — the "
        "incremental-view contract; at 100 TB the per-batch cost "
        "tracks churn while the fixed setup is paid once per drain."
    ),
}

SF = "/root/testdata/sf0.01"


def main() -> None:
    spark = get_spark("plans")
    queries = all_queries()
    out = [
        "# PLANS — physical-plan evidence (auto-generated)\n",
        "Regenerate with `python tools/dump_plans.py`. Facts per headline",
        "query at sf0.01; the properties asserted in tests/test_plans.py",
        "are marked. Shuffle/broadcast counts are from the pre-AQE plan",
        "(AQE may further coalesce at runtime).\n",
    ]
    for name in SHOWCASE:
        spark.catalog.clearCache()
        f = plan_facts(queries[name](spark, SF))
        out.append(f"## {name}\n")
        out.append(
            f"- exchanges: {f.n_shuffle_exchanges} shuffle, "
            f"{f.n_broadcast_exchanges} broadcast; joins: "
            f"{f.broadcast_joins} broadcast-hash, {f.sortmerge_joins} sort-merge"
        )
        out.append(
            f"- aggregates: partial={f.has_partial_aggregate} "
            f"final={f.has_final_aggregate}; cartesian={f.has_cartesian}; "
            f"row-python={f.has_python_row_udf}"
        )
        for i, s in enumerate(f.scans):
            pushed = s["pushed"] or "[]"
            schema = s["read_schema"]
            if len(schema) > 100:
                schema = schema[:97] + "..."
            out.append(f"- scan[{i}]: PushedFilters={pushed} ReadSchema={schema}")
        if name in NOTES:
            out.append(f"- {NOTES[name]}")
        out.append("")
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(path, "w") as fh:
        fh.write("\n".join(out) + "\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
