#!/usr/bin/env python
"""Benchmark: run the headline declared queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line:  {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is forced with a count() (full pipeline execution, no
collect-to-driver cost for wide results).  A warmup query absorbs JVM/
codegen startup, and each query's reported time is the MIN of two
consecutive runs: run-to-run noise on this box is ±20%, and min-of-2 is
the standard steady-state estimator (noise is strictly additive).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from conte_to_fresco_etl_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402

HEADLINE = [
    "conte_set3",
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_local_volume",
    "q_interval_join",
    "q_window_rate",
    "q_pivot_scatter",
    "q_semi_join",
    "q_anti_join",
    "q_union_distinct",
    "q_windowed_rates",
    "q_interval_violations",
    "q_minmax_summary",
    "q_distinct_counts",
    "q_walltime_parse",
    "q_exitcode_case",
    "q_hostlist_parse",
    "q_jobid_normalize",
    "q_doc_profile",
    "q_dedup_exact",
    "q_minhash_lsh",
    "q_simhash_pairs",
    "q_ngram_jaccard",
    "q_editdist_pairs",
    "q_embedding_neardup",
    "q_embedding_neardup_lsh",
    "q_ann_topk",
    "q_lsh_ann_topk",
    "q_ivf_ann_topk",
    "q_ivf_exhaustive",
    "q_ivf_trained_topk",
    "q_media_decode",
    "q_media_features",
    "q_corpus_curation",
    "q_doc_components",
    "q_doc_components_star",
    "q_quality_filters",
    "q_winnow_fingerprints",
    "q_stratified_sample",
    "q_top_tfidf_terms",
    "q_pii_scrub",
    "q_decontaminate",
    "q_source_cap",
    "q_unigram_nll",
    "q_token_stats",
    "q_pack_sequences",
    "q_knn_classify",
    "q_top_bigrams",
    "q_bpe_merges",
    "q_bpe_apply",
    "q_temperature_sample",
    "q_curation_v2",
    "q_sessionize",
    "q_value_histogram",
    "q_value_percentiles",
    "q_json_extract",
    "q_zorder_key",
    "q_label_centroids",
    "q_asof_join",
    "q_range_pairs",
    "q_time_rollup",
    "q_dedup_canonical",
    "q_shard_manifest",
    "q_incremental_dedup",
    "q_trailing_window",
    "q_doc_chunks",
    "q_kmeans_step",
    "q_above_mean",
    "q_bigram_nll",
    "q_skew_salted_join",
    "q_pivot_agg",
    "q_dedup_apply",
    "q_user_quartiles",
    "q_dq_report",
    "q_cube_daily",
    "q_except_customers",
    # round-4 additions
    "q_decontaminate_bloom",
    "q_mixture_weights",
    "q_boilerplate_frac",
    "q_pq_topk",
    "q_ivfpq_topk",
    "q_repeated_spans",
    "q_dup_token_frac",
    "q_compression_ratio",
    "q_dataset_card",
    "q_normalize_text",
    "q_url_normalize",
    "q_url_dedup",
    "q_assign_splits",
    "q_semantic_dedup",
    "q_quality_classifier",
    "q_soft_quality_sample",
    # event-analytics + retrieval family
    "q_gapfill",
    "q_event_gaps",
    "q_funnel",
    "q_retention",
    "q_bm25_topk",
    "q_scd2_intervals",
    "q_event_transitions",
    "q_pagerank",
    "q_top_sequences",
    # TPC-H-adapted decision-support suite
    "q2_min_cost_supplier",
    "q4_priority_exists",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q11_important_parts",
    "q12_priority_class",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_variety",
    "q17_small_qty_revenue",
    "q18_large_volume_customers",
    "q19_disjunctive_revenue",
    "q20_promotion_suppliers",
    "q21_sole_returner",
    "q22_dormant_customers",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    qs = entrymod.queries()

    # warmup: JVM + codegen + parquet footer caches, plus the Python
    # worker pool (Arrow-path operators reuse workers; the pool spin-up
    # is a fixed per-session cost, not per-query work)
    qs["q_minmax_summary"](spark, sf_dir).count()
    spark.range(256).repartition(int(cpus)).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        best = None
        for _ in range(2):
            # clearCache between runs: operators persist() intermediates,
            # and Spark's CacheManager matches identical plans — without
            # this, run 2 would measure a cache hit, not the query.
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            # noop sink, NOT count(): count() lets Catalyst prune every
            # computed column, so projection queries would bench as bare
            # scans — the noop write evaluates the full result exactly
            # once with no serialization or disk cost.
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
