#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "headline_total", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Execution is forced with the noop sink (full JVM-side compute, no
driver collect cost).  Each query is measured at steady state: one
untimed warmup execution (Catalyst + Janino whole-stage-codegen
compile + HotSpot JIT are one-time costs that would otherwise
dominate and add multi-second run-to-run noise at this data size),
then the best of two timed runs — standard JMH methodology.  The
cold (first-execution) total is reported alongside under
"cold_total_sec".
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Round-over-round continuity: every name benched in earlier rounds
# keeps its wall-time row even after rotating out of the driver's
# checked slots, so BENCH_r{N} stays comparable with BENCH_r{N-1}.
# The actual bench list is CONTINUITY ∪ the registry's first 50
# (derived at runtime — the driver's checked slots always have rows).
CONTINUITY = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "q13_customer_distribution",
    "q15_top_suppliers",
    "q16_parts_supplier_counts",
    "q18_large_volume_customers",
    "q2_min_cost_supplier",
    "q7_volume_shipping",
    "q9_product_profit",
    "q10_returned_items",
    "q21_sole_failing_supplier",
    "stats_user_sliding",
    "rollup_multires_stats",
    "iqr_outliers_events",
    "latest_order_enrich",
    "geofence_polygon_events",
    "dedup_exact_docs",
    "jaccard_near_dup_docs",
    "minhash_lsh_candidates",
    "simhash_near_dup_candidates",
    "embedding_near_dup",
    "tfidf_top_terms",
    "ann_cosine_topk",
    "ann_cosine_topk_blocked",
    "ann_ivf_topk",
    "kmeans_label_assign",
    "asof_click_before_error",
    "window_analytics_events",
    "session_windows_users",
    "token_budget_docs",
    "corpus_curation_pipeline",
    "contamination_bench_overlap",
    "pack_sequences_docs",
    "chunk_docs",
    "profile_orders",
    "dq_violations_orders",
    "weighted_sample_docs",
    "ngram_lm_score_docs",
    "fuzzy_join_part_names",
    "rolling_hour_user_stats",
    "entity_resolution_parts",
    "mad_outliers_events",
    "bigram_pmi_docs",
    # round-3 additions past the 50-slot check window (rotation
    # candidates for round 4) — benched here so they carry wall-time
    # evidence from day one
    "ks_value_drift",
    "embedding_centroid_cos",
    "funnel_bounded_conversions",
    "lpa_copart_communities",
    "masked_customer_segments",
    "streaming_idle_sessions",
    "streaming_type_counts",
    "streaming_lastk_features",
    "target_encode_events",
    "collapse_rare_users",
    "apply_changes_orders",
    "zorder_layout_events",
    "seasonal_anomaly_events",
    "rebalance_docs_target",
    # round-4 additions (rotation candidates for round 5)
    "semdedup_embeddings",
    "repeated_substring_docs",
    "dsir_select_docs",
    "source_cap_docs",
    "normalized_dedup_docs",
    "streaming_simhash_buckets",
    "jl_project_embeddings",
    "quantize_embeddings",
    "pattern_funnel_events",
    "pctile_chars_docs",
    "cross_corpus_overlap_docs",
    "kcore_purchase_graph",
    "hybrid_rrf_docs",
    "retrieval_pipeline_docs",
    "bm25_search_docs",
    "mmr_diverse_topk",
    "bootstrap_ci_events",
    "silhouette_embeddings",
    "attribution_events",
    "cusum_value_by_type",
    "transcripts_users",
    "dp_event_type_counts",
    "pretrain_mix_pipeline",
    "cuped_ab_events",
    "streaming_window_drift",
    "km_user_retention",
    "geohash_cells_events",
    # round-5 checked-slot entries (former never-checked + changed)
    "benford_orders",
    "conformal_value_events",
    "msprt_value_ab",
    "quantile_match_docs",
    "winsorize_events",
    # new in round 5
    "hamming_ann_topk",
    "matryoshka_prefix_norms",
    "vocab_coverage_docs",
    "gini_source_chars",
    "pq_codes_embeddings",
    "bpe_merges_docs",
    "kmv_distinct_users",
    "audio_features_events",
    "hamming_rerank_topk",
    "fs_linkage_parts",
    "bpe_token_counts_docs",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")

    from botkop_telcotraffic_spark_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    # Full-registry coverage (round-4 brief #5): EVERY registry entry
    # gets a wall-time row — no silent cap.  Checked slots + the
    # round-over-round CONTINUITY names run first so their timings
    # see the same JVM age as in earlier rounds; the remainder of the
    # registry follows.
    checked_50 = list(qs)[:50]  # the driver's oracle-checked slots
    headline = checked_50 + [n for n in CONTINUITY if n not in checked_50]
    headline += [n for n in qs if n not in set(headline)]

    def run(name: str) -> float:
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    run("q1_pricing_summary")  # session warmup (JVM + file listing)

    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name in headline:
        cold[name] = round(run(name), 3)  # untimed warmup (codegen+JIT)
        timings[name] = round(min(run(name), run(name)), 3)

    total = round(sum(timings.values()), 3)
    # The driver's BENCH capture keeps only the TAIL of bench output
    # (round-4 verdict: only 4 rows were round-over-round comparable
    # because the CONTINUITY rows printed first and were truncated
    # away).  EXECUTION order above is unchanged (checked slots +
    # CONTINUITY first, same JVM age as earlier rounds); the PRINTED
    # dict puts the CONTINUITY names last so they always survive tail
    # truncation.
    cont = set(CONTINUITY)
    printed = {n: timings[n] for n in timings if n not in cont}
    printed.update({n: timings[n] for n in CONTINUITY if n in timings})
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": printed,
                "sf": sf,
                "cold_total_sec": round(sum(cold.values()), 3),
                "runs_per_query": 3,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
