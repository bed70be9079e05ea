"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in etl_bigquery_pipeline_spark/plans/catalog.py;
this module is a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_bigquery_pipeline_spark.plans import catalog

SF0001 = "/root/testdata/sf0.001"

# The driver samples the first N registered queries per round. Queries that
# do not yet have a green CORRECTNESS row in any prior round are listed here
# so they are sampled first; everything else follows in catalog order.
#
# ROUND-5 NOTE: after CORRECTNESS_r04 lands, rebuild this list from the
# still-uncovered set. Expected stragglers: the ~10 names past r04's
# 50-sample window (embedding_norm_outliers .. lsh_cosine_topk below)
# plus the late-round-4 additions (logreg_*, bloom_pruned_join_parity,
# truncated_dim_*, top_bpe_merge_pairs, bpe_vocab_merges,
# bpe_token_counts, ks_two_sample_acctbal, daily_revenue_autocorr,
# copurchase_triangles, copurchase_pagerank_top20,
# copurchase_components, mannwhitney_u_acctbal, and the wave 5-6
# additions: unigram_xent_scores, bigram_backoff_xent,
# source_quality_profile, logreg_auc, leakage_safe_split,
# prefix_jaccard_pairs, hard_negative_mining, corpus_datasheet,
# epoch_shuffle_order, length_bucket_batches, candidate_key_profile,
# logreg_calibration_bins, quarantine_counts,
# compression_quality_gate, mixture_waterfill_rates,
# mixed_language_docs, nation_trade_flows, market_share_by_year,
# promo_revenue_share, complex_predicate_revenue, idle_rich_customers,
# graph_negative_samples, deterministic_random_walks,
# weighted_reservoir_sample, session_transcripts,
# duplicate_ngram_spans, gopher_quality_flags,
# entity_resolution_clusters, rollup_cascade_parity,
# k_anonymity_check, incremental_join_view_parity,
# orderkey_gap_islands, activity_streaks, events_since_last_purchase,
# mad_anomalies, brand_price_ties_rank, variant_json_extraction,
# null_safe_join_counts, session_window_batch, imputed_acctbal_stats,
# target_encoded_segments, sentence_stats, price_qty_heatmap,
# geomean_price_by_brand, winsorized_price_stats,
# latest_order_by_customer, bitmap_distinct_parity,
# try_arithmetic_audit, acctbal_quartiles_by_segment,
# hll_incremental_distinct_gate, embedding_standardization_gate,
# curriculum_order_head, masked_customer_view,
# nation_share_within_region, readability_scores, revenue_trend_ols,
# full_star_join_summary, collapse_rare_categories,
# cep_purchase_without_view, phrase_search_postings,
# time_weighted_avg_value, event_type_correlations, churn_labels,
# click_exposure_conversion, dataset_content_fingerprints,
# sources_nucleus_p90, join_fanout_histogram, jl_projection_gate,
# top_session_paths, geo_grid_density, calendar_dimension_build,
# knn_distance_outliers, null_pattern_profile,
# inclusion_dependency_profile, yoy_revenue_growth, reactivated_users,
# embedding_drift_gate, key_skew_profile, weighted_median_price,
# revenue_changepoint_cusum, business_days_to_ship,
# order_fulfillment_status, covered_time_per_user,
# hll_intersection_estimate_gate, empirical_resample_stats,
# decayed_part_popularity, largest_remainder_allocation,
# clamped_running_inventory, event_type_runs,
# discount_qty_corr_by_brand, degree_distribution_slope,
# cohort_ltv_curves, seasonal_naive_backtest,
# cuped_variance_reduction, srm_assignment_check, linear_attribution,
# revenue_bridge_decomposition, salted_agg_parity,
# markup_density_stats, price_size_slope_by_brand,
# quantile_transform_uniformity_gate, ngram_novelty_scores,
# token_budget_coverage, ann_mrr_ndcg_eval, events_heatmap_dow_hour,
# orders_aging_buckets; compression_ratio_quality is rows-only by
# design, zlib is not SQL-expressible) — all sf0.01 oracle-verified
# green when written.
_SAMPLE_FIRST = [
    # red row in r03 (array-column canonicalizer err, now reshaped):
    "top3_customers_nested",
    # never driver-sampled (judge-verified green at sf0.01 in r03):
    "pq_recall_vs_exact",
    "pq_cosine_topk",
    "zorder_lineitem_keys",
    "scd2_customer_history",
    "minhash_cluster_canonicals",
    "sketch_gates",
    "funnel_click_to_purchase",
    "approx_percentile_error",
    "daily_revenue_gapfilled",
    "price_histogram",
    "events_rolling_1h",
    "salted_join_parity",
    "percentile_lineitem",
    "trimmed_mean_acctbal",
    "embedding_centroids",
    "decontamination",
    "curation_decisions",
    "repetition_stats",
    "pii_redaction",
    "document_chunks",
    "token_budget_packing",
    "train_val_test_split",
    "correlated_subqueries",
    "pipeline_summary",
    "simhash_near_dup_pairs",
    "posexplode_tokens",
    "multiset_set_ops",
    "regex_functions_part",
    "stats_aggregates",
    "theta_join_price_bands",
    "window_ntile_firstvalue",
    "conditional_expressions",
    "distinct_aggregates",
    "dq_catches_seeded_violations",
    "canonical_docs_by_fingerprint",
    "top_bigrams_by_lang",
    "tfidf_keywords",
    "approx_distinct_error",
    "lsh_index_probe_matches",
    "ivf_recall_vs_exact",
    "lsh_recall_vs_exact",
    "ivf_cosine_topk",
    # round-4 additions (judge-verified green at sf0.01 when written);
    # anything past the driver's per-round budget rolls to next round
    "lineitem_survivorship",
    "cross_source_contamination",
    "welch_ttest_acctbal",
    "stratified_kfold_counts",
    "rolling_7d_distinct_users",
    "repeat_purchase_rate_by_segment",
    "mom_revenue_growth",
    "embedding_norm_outliers",
    "minhash_estimate_error_gate",
    "lsh_false_positive_audit",
    "percent_rank_price_by_brand",
    "first_touch_attribution",
    "sources_gini_concentration",
    "dau_wau_stickiness",
    "session_duration_histogram",
]


def _ordered(mapping: dict) -> dict:
    first = {k: mapping[k] for k in _SAMPLE_FIRST if k in mapping}
    rest = {k: v for k, v in mapping.items() if k not in first}
    return {**first, **rest}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return catalog.QUERIES["flagship_sales_rollup"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _ordered(catalog.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-dialect equivalents for every oracle-checkable query."""
    return _ordered(catalog.ORACLE)
