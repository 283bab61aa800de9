"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All queries live in ``conte_to_fresco_etl_spark.plans.catalog`` /
``catalog_text`` / ``catalog_tpch`` / ``catalog_analytics`` — this
module is a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from conte_to_fresco_etl_spark.plans import catalog  # noqa: E402
from conte_to_fresco_etl_spark.plans import catalog_text  # noqa: E402,F401  (registers queries)
from conte_to_fresco_etl_spark.plans import catalog_tpch  # noqa: E402,F401  (registers queries)
from conte_to_fresco_etl_spark.plans import catalog_analytics  # noqa: E402,F401  (registers queries)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the conte set3 dataflow
    shape (broadcast interval join + pivot scatter) on the events table."""
    return catalog.QUERIES["conte_set3"](spark, "/root/testdata/sf0.001")


# The driver's correctness gate checks queries() in iteration order and may
# stop after the first 50.  Registration order in plans/catalog*.py is
# historical (stable queries first), so left alone it starves newly added or
# recently modified queries of a hard CORRECTNESS row.  PRIORITY pins the
# iteration order: queries that have never had a driver row (or changed since
# their last green row) come first; long-stable green queries go to the tail
# where a truncated window costs nothing.
PRIORITY: list[str] = [
    # --- round-5 window (the driver checks the first 50) ---
    # Every query below EITHER was modified this round or has NEVER had
    # a driver CORRECTNESS row in rounds 1-4 (the union of r1-r4 green
    # rows covers the other 108 registered queries, zero reds).
    #
    # modified in r5: struct-rank orientation (ADVICE r4) and null-safe
    # class join-back (ADVICE r4) — both green in r4, re-gated after
    # the fix
    "q_triangle_count",
    "q_k_anonymity",
    "q_jaccard_prefix",
    # never driver-checked, non-TPC-H (registered in r4 past the cap)
    "q_range_frame",
    "q_dataset_card",
    "q_normalize_text",
    "q_dup_token_frac",
    "q_compression_ratio",
    "q_assign_splits",
    "q_semantic_dedup",
    "q_doc_components_star",
    "q_mixture_weights",
    "q_media_features",
    "q_value_percentiles",
    "q_zorder_key",
    "q_json_extract",
    "q_editdist_pairs",
    "q_ivf_trained_topk",
    "q_session_window",
    "q_merge_upsert",
    "q_snapshot_diff",
    "q_boilerplate_frac",
    "q_soft_quality_sample",
    "q_pq_topk",
    "q_bpe_apply",
    "q_url_dedup",
    "q_retention",
    "q_event_gaps",
    "q_scd2_intervals",
    "q_event_transitions",
    "q_pagerank",
    "q_top_sequences",
    "q_interval_overlap",
    "q_time_weighted",
    # new in r5 (inserted here as they are added)
    "q_hll_rollup",
    "q_dp_counts",
    "q_lsh_calibration",
    "q_lsh_recall",
    "q_event_pattern",
    "q_dsir_weights",
    "q_embedding_outliers",
    "q_hard_negatives",
    "q_quality_propagation",
    "q_classifier_metrics",
    "q_group_reservoir",
    # modified in r5 (lang_id argmax rewrite feeds its prediction col)
    "q_lang_confusion",
    # modified in r5 (empty-input guards added to their driver-side
    # quantizer/sampling helpers — results at sf>0 provably unchanged,
    # but the green rows predate the edit, so they re-gate)
    "q_ivf_ann_topk",
    "q_ivf_exhaustive",
    "q_ivfpq_topk",
    "q_temperature_sample",
    # TPC-H shapes never driver-checked, ordered riskiest-first
    # (correlated subqueries, multi-join profit/market-share,
    # group-HAVING).  With the r5 additions and re-gates above, the
    # window cut lands after q2_min_cost_supplier — the remaining 18
    # TPC-H shapes rotate into the r6 window (family evidence: q1/q3/
    # q5 green since r2, tests/oracle_parity.py green locally for all)
    "q2_min_cost_supplier",
    "q8_market_share",
    "q9_product_profit",
    "q21_sole_returner",
    "q22_dormant_customers",
    "q17_small_qty_revenue",
    "q18_large_volume_customers",
    "q20_promotion_suppliers",
    "q11_important_parts",
    "q13_customer_distribution",
    # --- rotation tail (beyond the 50-query window this round) ---
    # registered late in r5 (window already full of never-checked +
    # re-gates) — FIRST in line for the r6 window, with q_hopping_window
    # (rotated out for the r5 re-gates; family evidence: r3-green
    # q_windowed_rates/q_time_rollup share the window machinery)
    "q_cusum_drift",
    "q_mannwhitney",
    "q_ks_test",
    "q_mixture_diversity",
    "q_acf",
    "q_heldout_nll",
    "q_split_leakage",
    "q_hopping_window",
    # TPC-H remainder -> r6 window
    "q4_priority_exists",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q10_returned_items",
    "q12_priority_class",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_variety",
    "q19_disjunctive_revenue",
    # r4-green queries (stable, unmodified)
    "q_dedup_canonical",
    "q_dedup_apply",
    "q_incremental_dedup",
    "q_kmeans_step",
    "q_bigram_nll",
    "q_doc_chunks",
    "q_shard_manifest",
    "q_curation_v2",
    "q_source_cap",
    "q_decontaminate_bloom",
    "q_repeated_spans",
    "q_url_normalize",
    "q_quality_classifier",
    "q_bpe_merges",
    "q_mad_outliers",
    "q_weighted_sample",
    "q_token_pmi",
    "q_token_entropy",
    "q_psi_drift",
    "q_rank_functions",
    "q_ewma",
    "q_series_corr",
    "q_chi_square",
    "q_oov_rate",
    "q_assoc_rules",
    "q_skew_report",
    "q_seasonal_decompose",
    "q_topk_per_group",
    "q_benford",
    "q_trend_slope",
    "q_winsorize",
    "q_centroid_similarity",
    "q_containment",
    "q_point_in_time",
    "q_daily_growth",
    "q_rolling_distinct",
    "q_cumulative_reach",
    "q_embedding_stats",
    "q_curation_v3",
    "q_ngram_novelty",
    "q_conversion_latency",
    "q_cross_correlation",
    "q_gapfill",
    "q_funnel",
    "q_bm25_topk",
    # r2/r3-green queries (stable, unmodified)
    "q_label_centroids",
    "q_decontaminate",
    "q_unigram_nll",
    "q_token_stats",
    "q_pack_sequences",
    "q_knn_classify",
    "q_top_bigrams",
    "q_distinct_counts",
    "q_doc_components",
    "q_media_decode",
    "q_embedding_neardup",
]


def _prioritized(mapping: dict) -> dict:
    head = {k: mapping[k] for k in PRIORITY if k in mapping}
    tail = {k: v for k, v in mapping.items() if k not in head}
    return {**head, **tail}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the
    training-data operators: dedup, similarity, text analysis)."""
    return _prioritized(dict(catalog.QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query.  Keys absent here
    (e.g. q_lsh_ann_topk) are intentionally approximate operators that
    get the driver's weaker rows-only check."""
    return _prioritized(dict(catalog.ORACLES))
