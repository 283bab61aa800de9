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
    # never driver-checked in any round (VERDICT r3 #1)
    "q_dedup_canonical",
    "q_dedup_apply",
    "q_incremental_dedup",
    "q_kmeans_step",
    "q_bigram_nll",
    "q_doc_chunks",
    "q_shard_manifest",
    # changed in r3 after its r2 green row
    "q_curation_v2",
    # r2-green-only (no r3 row); q_source_cap also changed in r4
    # (collect-free cap rewrite), so its slot is mandatory
    "q_source_cap",
    # new or modified in r4
    "q_decontaminate_bloom",
    "q_ivfpq_topk",
    "q_repeated_spans",
    "q_url_normalize",
    "q_quality_classifier",
    "q_bpe_merges",
    # new in this round's second half
    "q_mad_outliers",
    "q_triangle_count",
    "q_weighted_sample",
    "q_k_anonymity",
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
    "q_jaccard_prefix",
    "q_benford",
    "q_trend_slope",
    "q_winsorize",
    "q_centroid_similarity",
    "q_containment",
    "q_point_in_time",
    "q_daily_growth",
    "q_rolling_distinct",
    "q_cumulative_reach",
    "q_lang_confusion",
    "q_embedding_stats",
    "q_curation_v3",
    "q_ngram_novelty",
    "q_conversion_latency",
    "q_cross_correlation",
    # The driver's window may stop at 50 queries; the 46 entries above
    # are must-gate (never checked, or changed since their last row).
    # The remaining slots sample one query from each NEW r4 family
    # (time-series regularization, funnel analytics, retrieval, TPC-H
    # shapes); the rest of each family rotates into later windows.
    "q_gapfill",
    "q_funnel",
    "q_bm25_topk",
    # RANGE frames share family evidence with r3-green
    # q_trailing_window; rotate just past the boundary
    "q_range_frame",
    "q13_customer_distribution",
    # --- rotation tail (beyond a 50-query window this round) ---
    # r2-green unmodified queries and r3-green queries whose r4 edits
    # are pinned by local parity, plus second family members (their
    # siblings hold the window slot) — all rotate into later windows
    # q_dataset_card has family evidence via r3-green q_dq_report;
    # q_normalize_text via its idempotence property tests + the
    # still-windowed q_url_normalize — both rotate into r5
    "q_dataset_card",
    "q_normalize_text",
    # intra-doc repetition/quality + hash-split families keep windowed
    # siblings (q_repeated_spans, q_quality_classifier, r3-green
    # stratified_sample); these rotate into r5
    "q_dup_token_frac",
    "q_compression_ratio",
    "q_assign_splits",
    # embedding-dedup family keeps r3-green q_embedding_neardup_lsh
    "q_semantic_dedup",
    # CC family keeps q_dedup_canonical/apply in-window; mixture
    # weighting has r2-green evidence
    "q_doc_components_star",
    "q_mixture_weights",
    # media family: r3-green q_media_decode + codec round-trip tests
    "q_media_features",
    # exact-percentile family now has q_winsorize/q_mad_outliers in
    # window; layout family pinned by bucketed-join + z-order tests
    "q_value_percentiles",
    "q_zorder_key",
    # from_json extraction pinned by tests/test_formats.py typed reads
    "q_json_extract",
    # FastSS fuzzy join pinned by its randomized completeness test
    "q_editdist_pairs",
    # IVF family: q_ivfpq_topk windowed + r3-green q_ivf_ann/exhaustive;
    # session family: r3-green q_sessionize + the boundary unit test;
    # merge upsert pinned by its replace/insert/survive unit test
    "q_ivf_trained_topk",
    "q_session_window",
    "q_merge_upsert",
    "q_snapshot_diff",
    # boilerplate/soft-sample have windowed family siblings
    # (q_repeated_spans, q_quality_classifier)
    "q_boilerplate_frac",
    "q_soft_quality_sample",
    "q_temperature_sample",
    "q_label_centroids",
    "q_decontaminate",
    "q_unigram_nll",
    # q_ivfpq_topk re-derives BOTH quantizers in-oracle and holds the
    # PQ-family slot; q_pq_topk rotates just past the boundary
    "q_pq_topk",
    "q_token_stats",
    "q_pack_sequences",
    "q_knn_classify",
    "q_top_bigrams",
    "q_bpe_apply",
    "q_url_dedup",
    "q_distinct_counts",
    "q_doc_components",
    "q_media_decode",
    "q_embedding_neardup",
    "q_retention",
    "q_event_gaps",
    "q_scd2_intervals",
    "q_event_transitions",
    "q_pagerank",
    "q_top_sequences",
    "q_interval_overlap",
    "q_time_weighted",
    "q_hopping_window",
    "q21_sole_returner",
    "q17_small_qty_revenue",
    "q22_dormant_customers",
    "q11_important_parts",
    "q4_priority_exists",
    "q16_supplier_variety",
    "q2_min_cost_supplier",
    "q15_top_supplier",
    "q18_large_volume_customers",
    "q20_promotion_suppliers",
    "q8_market_share",
    "q9_product_profit",
    "q7_volume_shipping",
    "q19_disjunctive_revenue",
    "q12_priority_class",
    "q14_promo_revenue",
    "q10_returned_items",
    "q6_forecast_revenue",
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
