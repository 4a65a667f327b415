"""Empirical scaling probe: run the event/document/embedding-heavy
operators on sf0.1 and on a 10x scaled copy, and report the time
ratio per query.

The 100 TB arguments in SCALE.md are structural (shuffle shapes,
partial aggregation, bucketed candidates); this probe is the empirical
complement at the scale the sandbox can hold: a near-linear ratio
(<= ~10x for 10x data, usually far less while fixed job overhead
dominates) backs the argument, a superlinear one falsifies it.

Scaling model (keeps per-entity density constant, so operator work
scales with data, not with degenerate blowup):
  * events: 10 copies, user_id += 1500*i, event_id += N*i — 10x users,
    same events-per-user timeline each;
  * documents: 10 copies, doc_id += 5000*i, text unchanged — every doc
    gains 9 exact twins, so the dedup family faces a 10x corpus with
    real cross-copy duplicate structure;
  * embeddings: 10 copies, vec_id += 2000*i;
  * orders (since r5, for the MERGE/CDC probes): 10 copies,
    o_orderkey += 10M*i (clear of the +1M synthetic-insert range),
    o_custkey += 15000*i (key blocks stay disjoint, so per-key order
    density is constant);
  * remaining relational tables copied as-is (this probe targets the
    scaled families; the relational core is oracle- and plan-tested).

Usage: python scripts/scaling_probe.py [factor]   (default 10)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE = "/root/testdata/sf0.1"
PROBE_QUERIES = [
    "q_sessionize",
    "q_join_theta_range",
    "q_asof_join",
    "q_ewma_user",
    "q_resample_ffill",
    "q_dedup_exact",
    "q_dedup_fuzzy",
    "q_dedup_simhash",
    "q_decontaminate",
    "q_text_stats",
    "q_vocab_topk",
    "q_bm25",
    "q_sim_topk",
    "q_sim_ann_lsh",
    "q_graph_pagerank",
    "q_merge_upsert",
    "s_window_tumbling",
    "s_stream_join",
    "s_cdc_upsert",
    # round-5 batch-2 additions
    "q_lm_score",
    "q_global_shuffle",
    "q_interval_overlap",
    "q_islands",
    "q_zorder_cluster",
    "q_stats_moments",
    # round-5 batch-3/4 additions (customer now scales too: shifted
    # c_custkey + regenerated c_name, so the linkage graph grows 10x)
    "q_fuzzy_join",
    "q_graph_triangles",
    "q_profile_columns",
    "q_inverted_index",
    "q_rolling_multi",
    "q_sequence_ngrams",
    "q_table_diff",
    "q_dq_audit",
    "q_compress_ratio",
    "q_hll_sketch",
    "s_session_timeout",
    # round-5 batch-5 additions (lineitem now scales too — l_orderkey
    # shifts in lockstep with orders so each copy keeps FK integrity)
    "q_tpch_pricing",
    "q_tpch_market_share",
    "q_tpch_big_orders",
    "s_chained_windows",
    "q_frequent_pairs",
    "q_attribution",
    # round-6 additions: the two fact-heavy new TPC-H shapes (Q21's
    # double-correlation rides scaled lineitem x orders; Q4's semi-join
    # probes the scaled fact)
    "q_tpch_waiting",
    "q_tpch_priority",
    "q_tpch_custdist",
    "q_heavy_hitters",
    # round-6 batch-2 additions: remaining fact-heavy TPC-H shapes and
    # the decorrelated LATERAL top-1
    "q_tpch_profit",
    "q_tpch_nation_volume",
    "q_tpch_min_supplier",
    "q_tpch_dominant_supplier",
    "q_tpch_important_parts",
    "q_lateral_topn",
    # round-7 additions: the bounded-output variants of the two
    # output-growth-flagged linkage ops — the caps should hold their
    # ratios at/below the data growth where the uncapped ops exceed it
    "q_fuzzy_join_capped",
    "q_graph_triangles_capped",
    # round-7 storage/feature/streaming batches: layout-paid join,
    # runtime scan reduction, windowed feature stats, full-outer stream
    # join (all ride the scaled orders/lineitem/events facts; the
    # layout writes happen once per scaled dir — min-of-2 runs times
    # the steady-state read path)
    "x_bucketed_join",
    "x_partitioned_write",
    "x_dpp_join",
    "x_bloom_filter_join",
    "q_observed_metrics",
    "q_window_first_last",
    "q_feature_minmax",
    "q_target_encode",
    "q_feature_hash",
    "q_quantile_bins",
    "s_stream_full_join",
    # round-12: the LEFT SEMI cell of the streaming join matrix
    "s_stream_semi_join",
    # round-12 batch 76
    "q_event_debounce",
    "q_dedup_prefix_tokens",
    "q_span_corruption",
    "q_embed_dim_stats",
    "q_graph_bfs_kstep",
    "q_asof_join_nearest",
    "q_map_funcs",
    "q_image_channel_stats",
    "q_regex_funcs",
    "q_udtf_native",
    "q_udf_iterator",
    "q_udaf_window",
    "q_collated_group",
    "q_sql_scripting",
    "q_parameterized_sql",
    "s_window_sliding_rocksdb",
    # round-13 batch 83/84: physical-execution cells + distributed
    # kmeans (embeddings scale too) + the state-store reader (the
    # probe re-runs the state-building stream per scaled dir)
    "q_join_skew_aqe",
    "x_cbo_broadcast",
    "q_kmeans_kstep",
    "x_statestore_scan",
    # round-14 batch 85: operational-surface cells (session-var agg
    # rides the scaled orders fact; state-metadata re-runs the
    # state-building stream once per scaled dir then reads 1 metadata
    # row; corrupt-tolerant rebuilds its 4-member layout once per
    # scaled dir then scans the 3 intact members)
    "q_sql_session_vars",
    "x_state_metadata_scan",
    "q_read_corrupt_tolerant",
    # round-14 batch 86 (table function inlines to the same agg shape
    # as the session-var cell; defaults cell rebuilds its catalog
    # table once per scaled dir then scans it)
    "q_sql_table_function",
    "x_column_defaults",
    "q_execute_immediate",
    # round-7 later batches: DS shapes over the scaled facts, SQL
    # semantics corners, evolved/footer-stat layouts
    "q_ds_timeband_counts",
    "q_ds_cume_share",
    "q_ds_topk_rollup",
    "q_join_nullsafe",
    "q_not_in_null",
    "q_array_algebra",
    "x_schema_evolution",
    "x_agg_pushdown",
    "q_sketch_mergeability",
    "q_weighted_sample",
    "q_contamination_rate",
    # round-8 additions: the post-batch-7 entries the r7 verdict flagged
    # as probe-uncovered (graph trio rides the scaled customer linkage
    # graph, corpus pair the twinned documents, stats/mleval/tsdiag the
    # scaled orders/customer/events facts) plus batch 9
    "q_degree_distribution",
    "q_jaccard_neighbors",
    "q_kcore",
    "q_source_overlap",
    "q_phrase_density",
    "q_gini",
    "q_pareto_cutoff",
    "q_herfindahl",
    "q_ks_test",
    "q_auc",
    "q_decile_lift",
    "q_confusion_prf",
    "q_autocorr",
    "q_cusum",
    "q_hourly_seasonality",
    "x_sorted_layout",
    "x_nested_pruning",
    "s_stream_union",
    "q_decontaminate_bloom",
    "q_approx_topk",
    "q_percentile_disc",
    "q_median_exact",
    # round-8 batch 10
    "q_benford_law",
    "q_weighted_percentile",
    "q_assoc_rules",
    "q_skew_diagnostic",
    "q_ds_exists_matrix",
    "q_simjoin_prefix",
    # round-8 batch 11
    "q_sim_pq",
    "q_doc_keyterms",
    "q_trend_decompose",
    "q_outlier_iqr",
    # round-8 batch 12
    "q_cuped",
    "q_histogram_log_bins",
    "q_survival_curve",
    "q_cohort_ltv",
    # round-8 batch 13 (fk audit rides the scaled orders/lineitem
    # facts; LPA the regenerated-name linkage graph)
    "q_fk_orphans",
    "q_corr_matrix",
    "q_changepoint",
    "q_rfm_scores",
    "q_kfold_assign",
    "q_label_propagation",
    # round-8 batch 14 (bootstrap explodes the scaled orders fact x100;
    # markov rides the scaled per-user event timelines)
    "q_diff_in_diff",
    "q_bootstrap_ci",
    "q_percentile_cont",
    "q_incremental_agg_merge",
    "q_markov_stationary",
    # round-8 batch 15 (permutation explodes the scaled user rollup
    # x200; gap-fill rides the scaled per-user daily grids)
    "q_chi_square",
    "q_permutation_test",
    "q_calibration_bins",
    "q_gap_fill_interpolate",
    # round-8 batch 16 (vs q_decile_lift above: same oracle, no global sort)
    "q_decile_lift_scalable",
    # round-8 batch 17 (all ride the 10x twinned documents corpus)
    "q_filter_funnel",
    "q_dedup_survivorship",
    "q_token_fertility",
    # round-8 batch 18 (attribution rides the scaled user timelines;
    # aging the scaled orders/customer facts)
    "q_attribution_position",
    "q_ar_aging",
    # round-8 batch 19 (same union-merge timeline as q_asof_join)
    "q_asof_join_forward",
    "q_asof_join_tolerance",
    # round-8 batch 20 (windows over the scaled daily rollup)
    "q_rolling_median",
    "q_rolling_corr",
    # round-9 batches 21-23: the upgraded ANN dedup rides the 10x
    # twinned embeddings (every vector gains 9 exact twins — real
    # cross-copy duplicate structure for the LSH buckets); the
    # scalable sweeps/ranks ride the scaled events/orders facts; the
    # capped LPA and adaptive kcore ride the regenerated name graph
    "q_dedup_embedding",
    "q_interval_overlap_scalable",
    "q_label_propagation_capped",
    "q_kcore_peeled",
    "q_decile_transition",
    "q_containment_join",
    "q_interval_join",
    "q_kmv_sketch",
    "q_ann_recall",
    "q_melt",
    "q_mixture_weights",
    "q_length_buckets",
    "q_winsorize_scalable",
    "q_oov_rate",
    "q_line_dedup",
    "q_try_arithmetic",
    "q_arrow_token_stats",
    "q_multimodal_video",
    "q_sim_ivfpq",
    # round-9 batch 34: the oracle-hardened exact twins — same plan
    # shapes as their production originals (md5-MinHash LSH rides the
    # 10x twinned documents; fixed-point pagerank the md5 pair graph;
    # markov the scaled per-user event timelines)
    "q_dedup_fuzzy_exact",
    "q_dedup_clusters_exact",
    "q_dedup_simhash_exact",
    "q_graph_pagerank_exact",
    "q_markov_kstep",
    # round-9 batch 35 (rides the 10x twinned documents corpus)
    "q_bpe_merges",
    # round-9 batch 36 (rides the 10x twinned embeddings: every vector
    # gains 9 exact twins, so the closure has real cluster structure)
    "q_dedup_embedding_clusters",
    # round-9 batch 37 (exact-jaccard verify over the md5 candidates)
    "q_dedup_precision_audit",
    # round-9 batch 38 (cluster-unit split + straddle audit)
    "q_split_leakage_safe",
    "q_split_leakage_audit",
    # round-9 batch 39 (per-doc max over the md5 pairs)
    "q_dedup_threshold_curve",
    # round-10 batch 40 (rides the 10x twinned documents' media
    # payloads; frame grouping is linear-output by construction)
    "q_dedup_image_phash",
    "q_dedup_frame_phash",
    # round-10 batch 41: the bounded verify-fan-out containment twin —
    # the cap should hold the ratio at/below data growth where the
    # uncapped q_containment_join (above) exceeds it
    "q_containment_join_capped",
    # round-10 batch 43: pinned ANN twins (ride the 10x twinned
    # embeddings; same broadcast-table shapes as the fitted originals)
    "q_sim_ivf_pinned",
    "q_sim_pq_pinned",
    "q_sim_ivfpq_pinned",
    # round-10 batch 44 (identical-hash twins collapse into clusters;
    # CC rounds bounded by the shallow near-dup graph)
    "q_dedup_image_clusters",
    # round-11 batch 62 (audio clusters: gain-twin families are
    # Hamming-0 cliques by generator design — the signature collapse
    # absorbs them before banding)
    "q_dedup_audio_hash",
    # round-11 batch 63
    "q_sample_temperature",
    "q_audio_band_energies",
    # round-11 batch 64
    "q_keyword_textrank",
    "q_embed_quantize_int8",
    # round-11 batch 65
    "q_padding_waste",
    "q_chunk_fixed_overlap",
    # round-11 batch 66
    "q_tfidf_topk",
    "q_embed_centroid_exact",
    # round-11 batch 67
    "q_dedup_cross_corpus",
    # round-11 batch 68
    "q_kanonymity_audit",
    "q_freshness_lag",
    # round-11 batch 69
    "q_maxsim_late_interaction",
    "s_dedup_watermark_rocksdb",
    # round-11 batch 70
    "q_mrr_eval",
    "q_ndcg_eval",
    # round-11 batch 71
    "q_label_churn",
    "q_negative_sampling",
    # round-11 batch 72
    "q_quantile_normalize",
    "q_winsorize_clip",
    # round-11 batch 73
    "q_hard_negatives",
    # round-10 batch 45 (rides the 10x twinned documents: every gram
    # in a twinned doc becomes corpus-duplicated, so the span/mask
    # stages face maximal duplication density)
    "q_dedup_substring_spans",
    "q_dedup_substring_mask",
    # round-10 batch 46 (4 full vote sweeps over the md5 pair graph)
    "q_label_propagation_kstep",
    # round-10 batch 47 (map-only over the 10x twinned embeddings)
    "q_embed_randproj",
    # round-10 batch 48 (map-only over the 10x twinned documents)
    "q_bpe_encode",
    # round-10 batch 49: collocation lift + winnowing fingerprints
    "q_collocations_lift",
    "q_winnow_fingerprints",
    # round-10 batch 50: MOSS overlap, CDC chunking, rank fusion
    "q_winnow_overlap",
    "q_chunk_cdc",
    "q_rrf_fusion",
    # round-10 batch 51: CDC storage report + JSONL interop
    "q_cdc_dedup_ratio",
    "x_jsonl_roundtrip",
    # round-10 batch 52: PSI drift + native JSONL file stream
    "q_drift_psi",
    "s_jsonl_autoload",
    # round-10 batch 53: Zipf slope + embedding-norm QA
    "q_zipf_slope",
    "q_embedding_norm_hist",
    # round-10 batches 54-55: bigram LM + JSONL stream sink
    "q_bigram_lm_score",
    "s_jsonl_stream_sink",
    # round-10 batch 56: CSV write round-trip
    "x_csv_roundtrip",
    # round-10 batch 57: winnow clusters
    "q_winnow_clusters",
    # round-10 batch 58: tokenizer-design curves
    "q_vocab_coverage_curve",
    "q_distinct_ngrams",
    # round-10 batch 59: multi-probe LSH
    "q_sim_ann_multiprobe",
    # round-10 batch 60: RocksDB window state
    "s_window_tumbling_rocksdb",
    # round-10 batch 61: langid eval + partition-pruned JSONL
    "q_langid_confusion",
    "x_jsonl_partitioned",
]


def build_scaled_dir(spark, factor: int) -> str:
    from pyspark.sql import functions as F

    from kafka_s3_etl_spark.sources.tables import TESTDATA_TABLES, load_table

    # v2: lineitem now replicates too (key-shifted); the suffix keys the
    # cache so a layout change can never reuse a stale scaled corpus.
    out = f"/tmp/spark_graft_scaled_{factor}x_v2"
    if os.path.isdir(out) and os.path.exists(os.path.join(out, "_READY")):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    shifts = {
        "events": [("event_id", 100_000), ("user_id", 1_500)],
        "documents": [("doc_id", 5_000)],
        "embeddings": [("vec_id", 2_000)],
        "orders": [("o_orderkey", 10_000_000), ("o_custkey", 15_000)],
        "lineitem": [("l_orderkey", 10_000_000)],
        "customer": [("c_custkey", 15_000)],
    }
    for name in TESTDATA_TABLES:
        df = load_table(spark, BASE, name)
        if name in shifts:
            copies = []
            for i in range(factor):
                c = df
                for col, step in shifts[name]:
                    c = c.withColumn(col, (F.col(col) + i * step).cast("long"))
                if name == "customer":
                    # regenerate the name from the shifted key so the
                    # linkage/triangle graph genuinely grows (identical
                    # copied names would collapse in distinct())
                    c = c.withColumn(
                        "c_name",
                        F.format_string("Customer#%09d", F.col("c_custkey")),
                    )
                copies.append(c)
            scaled = copies[0]
            for c in copies[1:]:
                scaled = scaled.unionByName(c)
            scaled.write.mode("overwrite").parquet(
                os.path.join(out, f"{name}.parquet")
            )
        else:
            df.write.mode("overwrite").parquet(os.path.join(out, f"{name}.parquet"))
    open(os.path.join(out, "_READY"), "w").close()
    return out


def main() -> int:
    # Usage: scaling_probe.py [factor] [query ...] — extra args narrow
    # the probe to the named queries (re-measuring one changed operator
    # without paying the full 40-query sweep).
    argv = sys.argv[1:]
    factor = int(argv[0]) if argv and argv[0].isdigit() else 10
    names = argv[1:] if argv and argv[0].isdigit() else argv
    probe_queries = [q for q in PROBE_QUERIES if not names or q in names]
    from pyspark.sql import SparkSession

    from kafka_s3_etl_spark.plans.registry import all_queries

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "32")
        # default local-mode heap is 1g: the 30x pagerank/dedup graphs
        # (localCheckpoint blocks + 16 task threads) OOM it. 100x
        # iterative-graph probes need more still (the r14 100x LPA run
        # GC-thrashed at 16g on the ~45M-edge name graph) — override
        # via SPARK_GRAFT_PROBE_MEM.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_PROBE_MEM", "16g"),
        )
        .getOrCreate()
    )
    cat = all_queries()
    scaled = build_scaled_dir(spark, factor)
    cat["q_scan_project"].fn(spark, BASE).count()  # warm

    print(f"query, sf0.1_s, {factor}x_s, ratio")
    worst = 0.0
    for name in probe_queries:
        times = {}
        for label, sf_dir in (("base", BASE), ("scaled", scaled)):
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                cat[name].fn(spark, sf_dir).count()
                best = min(best, time.perf_counter() - t0)
            times[label] = best
        ratio = times["scaled"] / times["base"]
        worst = max(worst, ratio)
        print(
            f"{name}, {times['base']:.2f}, {times['scaled']:.2f}, {ratio:.1f}x"
        )
    print(f"worst ratio: {worst:.1f}x for {factor}x data")
    return 0


if __name__ == "__main__":
    sys.exit(main())
