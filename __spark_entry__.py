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

# The driver samples the first N registered queries per round (50 in
# recent rounds). _SAMPLE_FIRST is rebuilt each round from the set of
# oracled catalog queries that do NOT yet have a green CORRECTNESS row
# in any prior round (cumulative r01-r05: 194 green of 275 oracled).
# Rows-only queries (compression_ratio_quality, pq_cosine_topk,
# ivf_cosine_topk, approx_distinct_orders, lsh_cosine_topk) are
# EXCLUDED -- they have no oracle_sql entry and can never produce a
# green hash row; their oracled recall/error gates are covered.
#
# ROUND-7 NOTE: after CORRECTNESS_r06 lands, rebuild again from the
# still-uncovered set (expected: the ~31 names past r06's 50-sample
# window, minus any newly greened, plus any round-6 additions).
# clamped_running_inventory leads: its round-5 driver red was a pure
# type mismatch (Spark BIGINT vs oracle DOUBLE stockout_moves, values
# identical) fixed this round by aligning both sides to BIGINT.
_SAMPLE_FIRST = [
    "clamped_running_inventory",
    # round-6 wave 47-49 additions — newest, least-verified, sample first
    "semantic_decon_prefilter_gate",
    "dsir_importance_weights",
    "dsir_gumbel_resample",
    "bm25_top_docs",
    "heaps_law_vocab_growth",
    "temperature_mixture_rates",
    "semantic_decontamination",
    "revenue_trend_ols",
    "readability_scores",
    "nation_share_within_region",
    "masked_customer_view",
    "curriculum_order_head",
    "embedding_standardization_gate",
    "hll_incremental_distinct_gate",
    "acctbal_quartiles_by_segment",
    "try_arithmetic_audit",
    "bitmap_distinct_parity",
    "latest_order_by_customer",
    "winsorized_price_stats",
    "geomean_price_by_brand",
    "price_qty_heatmap",
    "sentence_stats",
    "target_encoded_segments",
    "imputed_acctbal_stats",
    "session_window_batch",
    "null_safe_join_counts",
    "variant_json_extraction",
    "brand_price_ties_rank",
    "mad_anomalies",
    "events_since_last_purchase",
    "activity_streaks",
    "orderkey_gap_islands",
    "incremental_join_view_parity",
    "k_anonymity_check",
    "rollup_cascade_parity",
    "entity_resolution_clusters",
    "gopher_quality_flags",
    "duplicate_ngram_spans",
    "session_transcripts",
    "weighted_reservoir_sample",
    "deterministic_random_walks",
    "graph_negative_samples",
    "idle_rich_customers",
    "complex_predicate_revenue",
    "promo_revenue_share",
    "market_share_by_year",
    "nation_trade_flows",
    "mixed_language_docs",
    "mixture_waterfill_rates",
    "compression_quality_gate",
    "quarantine_counts",
    "logreg_calibration_bins",
    "candidate_key_profile",
    "length_bucket_batches",
    "epoch_shuffle_order",
    "corpus_datasheet",
    "hard_negative_mining",
    "prefix_jaccard_pairs",
    "logreg_auc",
    "source_quality_profile",
    "bigram_backoff_xent",
    "leakage_safe_split",
    "unigram_xent_scores",
    "mannwhitney_u_acctbal",
    "copurchase_components",
    "copurchase_pagerank_top20",
    "copurchase_triangles",
    "daily_revenue_autocorr",
    "ks_two_sample_acctbal",
    "bpe_vocab_merges",
    "bpe_token_counts",
    "top_bpe_merge_pairs",
    "truncated_dim_recall_gate",
    "truncated_dim_topk",
    "bloom_pruned_join_parity",
    "logreg_training_gate",
    "logreg_quality_scores",
    "session_duration_histogram",
    "dau_wau_stickiness",
    "sources_gini_concentration",
    "first_touch_attribution",
    "percent_rank_price_by_brand",
    "lsh_false_positive_audit",
    "minhash_estimate_error_gate",
    "embedding_norm_outliers",
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
