#!/usr/bin/env python
"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion (count() action — full plan runs,
nothing is collected to the driver beyond the count).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from big_data_pr_spark.queries import REGISTRY  # noqa: E402
from big_data_pr_spark.session import get_spark  # noqa: E402

HEADLINE = [
    # round-7a
    "doremi_mixture_weights",
    "substring_dup_fraction",
    "kmeans_cosine_assign",
    "winnowing_fingerprints",
    "ivfpq_adc_topk_lit",
    "pipe_syntax_ship_stats",
    "bpe_fertility_by_lang",
    "dirichlet_ql_search_lit",
    "cox_ph_ship_priority",
    "bradley_terry_event_types",
    "page_hinkley_daily_value",
    "multimodal_phash_groups",
    "hbos_outlier_topk",
    "sax_motifs_hourly",
    "contrastive_triplets_hard",
    "rm3_expansion_terms_lit",
    "energy_distance_purchase_vs_view",
    "ktruss_suppliers",
    "ddsketch_error_certificate",
    "permutation_importance_gbt",
    "mahalanobis_ood_topk",
    "regression_discontinuity_acctbal",
    "compression_ratio_proxy",
    "vocab_overlap_langs",
    "asof_join_nearest_click",
    "dau_mau_stickiness",
    "qte_deciles_purchase_vs_view",
    "winnowing_minhash_agreement",
    "q1_pricing",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q8_market_share",
    "q13_order_count_dist",
    "q18_large_volume",
    "join_semi_discounted",
    "ohlcv_candles_sma",
    "sliding_window_stats",
    "sma_events",
    "asof_join_purchase_click",
    "latest_event_per_user",
    "topk_events_by_value",
    "dedup_minhash_lsh",
    "knn_cosine_bruteforce",
    "q21_waiting_supplier_v",
    "sessionize_events",
    "value_percentiles",
    "grouping_sets_pricing",
    "stats_moments",
    "range_frame_rolling_sum",
    "explode_top_terms",
    # dedup_cluster_assign switched edge sources in round 5 (exact
    # Jaccard, oracle-checked) — the _lsh twin is the at-scale path and
    # the comparable line for rounds <= 4
    "dedup_cluster_assign",
    "dedup_cluster_assign_lsh",
    "ann_ivf_topk_batch",
    "gap_fill_forward",
    "funnel_time_to_purchase",
    "cohort_retention",
    "snapshot_diff_orders",
    "contamination_ngram",
    "boilerplate_ngrams",
    "embedding_centroids",
    "profile_orders",
    "corpus_clean_pipeline",
    "stratified_sample_hash",
    "pack_context_windows",
    "pii_scrub",
    "chunk_documents",
    "subword_top_tokens",
    "embedding_quantize",
    "incremental_agg_merge",
    "validate_orders",
    "vwap_daily",
    "bollinger_bands",
    "rsi_cutler_14",
    "weighted_sample_quality",
    "corpus_profile",
    "perplexity_scores",
    "pack_bins_ffd",
    "interval_clicks_in_hot_windows",
    "knn_batch_topk",
    "cross_split_contamination",
    "mixture_weights",
    "doc_length_histogram",
    "rolling_median_value",
    "source_overlap",
    "mixture_sample",
    "dedup_spans",
    "candles_daily_rollup",
    "salted_join_segment_revenue",
    "funnel_strict_sequence",
    "bloom_prefilter_urgent_revenue",
    "dedup_minhash_md5",
    "dedup_simhash_md5",
    "gbt_score_events",
    "kmeans_assign",
    "logreg_score_events",
    "corpus_shuffle_shards",
    "token_budget_select",
    "pack_bins_ffd_global",
    "ann_lsh_topk_lit",
    "ann_ivf_topk_lit",
    "multimodal_ppm_decode",
    "multimodal_ppm_resize",
    "contamination_transitive",
    "pagerank_event_transitions",
    "mad_anomalies",
    "holt_linear_forecast",
    "seasonal_hourly_factors",
    "naive_bayes_confusion",
    "char_entropy_hist",
    "orc_roundtrip_stats",
    "multimodal_wav_decode",
    "multimodal_wav_decimate",
    "linreg_value_trend",
    "zipf_token_slope",
    "jsonl_corrupt_quarantine",
    "auc_value_predicts_purchase",
    "psi_value_drift",
    "bm25_search_lit",
    "pmi_collocations",
    "market_basket_pairs",
    "containment_pairs",
    "acf_value_lags",
    "embedding_covariance_probe",
    "embedding_pca_project_lit",
    "embedding_pca_topk",
    "schema_evolution_roundtrip",
    "decay_weighted_user_value",
    "event_trigrams_top",
    "approx_quantile_certificate",
    "approx_distinct_certificate",
    "cms_error_certificate",
    "scd2_build_customer_priority",
    "scd2_point_in_time_revenue",
    "merged_active_intervals",
    "chisq_type_weekday",
    "welch_ttest_purchase_vs_view",
    "rest_source_candles",
    "variant_props_stats",
    "lateral_latest_order",
    "recursive_reachability_signup",
    "udtf_top_tokens",
    "matview_incremental_refresh",
    "theil_sen_trend",
    "winsorized_stats",
    "stochastic_oscillator_14",
    "atr_14",
    "obv_running",
    "max_drawdown",
    "benford_first_digit",
    "multimodal_video_frames",
    "gini_user_value",
    "revenue_concentration",
    "herfindahl_by_type",
    "drawdown_duration",
    "survival_user_retention",
    "capm_beta_alpha",
    "fim_transform",
    "watermark_greenlist_zscore",
    "blocklist_hit_rate",
    "score_calibration_bins",
    "bm25_ndcg_eval",
    "rolling_7d_active_users",
    "new_vs_returning_daily",
    "arch_effect_lags",
    "wow_growth_by_type",
    "burstiness_fano_per_user",
    "user_event_entropy",
    "dn_retention",
    "ship_latency_percentiles",
    "discount_band_analysis",
    "abc_analysis_parts",
    "supplier_scorecard",
    "cross_region_trade_matrix",
    "returns_analysis",
    "price_realization_by_brand",
    "segment_nation_share",
    "customer_ltv_deciles",
    "acctbal_spend_corr",
    "supplier_skyline_2d",
    "priority_mix_over_time",
    # round-6 additions (queries/pipeline_ext.py)
    "zorder_layout_stats",
    "dp_noisy_counts",
    "dp_noisy_revenue",
    "k_anonymity_audit",
    "attribution_last_touch",
    "vocab_oov_rate",
    "skew_key_deciles",
    "target_encode_kfold",
    "woe_value_deciles",
    "late_arrival_profile",
    "sequence_gap_audit",
    "dedup_survivorship",
    "hll_set_op_certificate",
    "token_budget_waterfill",
    "pq_reconstruction_error",
    "pq_adc_topk_lit",
    "pq_adc_topk",
    "pseudonymize_users",
    # round-6b: nonparametric tests, changepoints, graph, CDC, STL
    "ks_test_purchase_vs_view",
    "mannwhitney_value_shift",
    "kruskal_wallis_value_by_type",
    "spearman_qty_price_corr",
    "kendall_tau_sampled",
    "benjamini_hochberg_types",
    "cusum_changepoint_daily",
    "pettitt_changepoint",
    "triangle_count_suppliers",
    "jaccard_supplier_pairs",
    "ewma_volatility",
    "cdc_merge_apply",
    "stl_decompose_daily",
    "mann_kendall_trend",
    "bootstrap_mean_ci",
    "hurst_rs_daily",
    "ljung_box_hourly",
    "runs_test_daily",
    "friedman_type_ranks",
    "pinball_loss_eval",
    "conformal_interval_coverage",
    "seasonal_naive_mase",
    "rfm_segmentation",
    "multi_touch_attribution",
    "cohort_ltv_matrix",
    "expectation_suite_audit",
    "order_total_reconciliation",
    "sharpe_sortino_calmar",
    "var_cvar_historical",
    "jarque_bera_returns",
    "effect_sizes_purchase_view",
    "sprt_purchase_rate",
    "l_diversity_audit",
    "robust_scale_value",
    "lift_gain_deciles",
    "pr_auc_value",
    "anova_weekday_revenue",
    "levene_brown_forsythe",
    "granger_lag1_purchases",
    "heaps_law_fit",
    "price_elasticity_by_brand",
    "kaplan_meier_ship_latency",
    "mutual_info_type_weekday",
    "did_value_estimate",
    "heavy_hitters_certificate",
    "periodogram_top_periods",
    "cv_rmse_linreg_daily",
    "bloom_fpr_certificate",
    "duplicate_order_pairs",
    "order_priority_transitions",
    "token_coverage_curve",
    "embedding_norm_profile",
    "weekend_purchase_contrast",
    "dunn_posthoc_pairwise",
    "ab_power_mde",
    "cuped_variance_reduction",
    "srm_check_hash_split",
    "degree_assortativity_suppliers",
    "pareto_share_curve",
    "spend_band_migration",
    "join_size_profile",
    "range_partition_boundaries",
    "fk_containment_profile",
    "regression_diagnostics_daily",
    "engle_granger_cointegration",
    "newey_west_trend_test",
    "breusch_pagan_daily",
    "lang_id_confusion",
    "process_capability_ship_latency",
    "xbar_control_chart_weekly",
    "youden_optimal_threshold",
    "price_index_fisher_yearly",
    "token_burstiness_top",
    "interarrival_profile",
    "weekday_hour_heatmap",
    "weighted_reservoir_docs",
    "lad_trend_profile",
    "lexical_semantic_agreement",
    "embedding_anisotropy_probe",
    # round-6d: series mining, graph, exact DP fits, projection, hybrid IR
    "yule_walker_ar2",
    "spectral_entropy_daily",
    "esd_anomalies_daily",
    "sax_daily_motifs",
    "top_motif_pair_daily",
    "adamic_adar_suppliers",
    "kcore_parts",
    "isotonic_calibration",
    "potts_regime_segmentation",
    "jl_projection_distortion",
    "rrf_hybrid_search",
    "holt_winters_additive",
    "permutation_test_value",
    "ridge_trend_path",
    "seq_pattern_support",
    "quantile_normalize_by_type",
    "boxcox_lambda_scan",
    "als_rank1_factors",
    "item_item_cosine",
    "textrank_keywords",
    "mrl_norm_fraction",
    "theta_forecast_daily",
    "croston_demand_rate",
    "label_propagation_communities",
    "kmeans_silhouette",
    "mmd_label_drift",
    # round-6f: data-selection family (queries/selection_queries.py)
    "dsir_importance_weights",
    "dsir_bucket_kl",
    "ccnet_perplexity_buckets",
    "gopher_quality_flags",
    "doc_novelty_fraction",
    "mixture_temperature_weights",
    # round-6h: attribution deepening (queries/marketing.py)
    "markov_attribution_removal",
    "shapley_attribution_sets",
    # round-6i: Kalman, HITS, Kneser-Ney LM, AMS sketch
    "kalman_local_level_daily",
    "hits_event_transitions",
    "kneser_ney_bigram_top",
    "ams_f2_certificate",
    # round-6j: distribution distance, survival test, media-mix
    "wasserstein_value_shift",
    "logrank_ship_priority",
    "adstock_mmm_fit",
    # round-6k: MMR diversity re-rank, content-defined chunking
    "mmr_rerank_lit",
    "cdc_chunk_stats",
    # round-6l: interval-overlap join, Simpson audit
    "session_overlap_pairs",
    "simpson_paradox_audit",
    # round-6m: source distribution distances
    "js_divergence_sources",
    "burrows_delta_sources",
    "unigram_lm_viterbi",
    # round-6n: robust fitting + dispersion
    "huber_trend_daily",
    "overdispersion_user_events",
    # round-6o: data valuation + coreset + release audit
    "t_closeness_audit",
    "knn_shapley_valuation",
    "good_turing_smoothing",
    "hill_tail_index",
    "kcenter_coreset_greedy",
    # round-6p: probabilistic record linkage
    "fs_linkage_patterns",
    "em_linkage_step",
    "sorted_neighborhood_stats",
    # --- round-8: full-registry coverage (r7 verdict #3 — every
    # registry query gets a recorded wall-time so the regression
    # net has no holes; guard: tests/test_plans.py pins
    # set(HEADLINE) == set(REGISTRY)) ---
    "ann_ivf_topk",
    "ann_lsh_topk",
    "approx_distinct_parts",
    "approx_value_percentiles",
    "bigram_lm_top",
    "bpe_encode_tokens",
    "bpe_merge_rules",
    "cms_event_type_counts",
    "conditional_distinct_users",
    "csv_roundtrip_stats",
    "cube_priority_status",
    "customers_both_periods",
    "customers_churned",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_semantic_clusters",
    "dedup_simhash",
    "distinct_event_types",
    "distinct_order_status",
    "distinct_type_day_pairs",
    "doc_fingerprint",
    "ema_events",
    "embedding_dup_pairs",
    "embedding_dup_pairs_lsh",
    "forecast_gbt",
    "forecast_linear",
    "fuzzy_supplier_pairs",
    "gap_fill_interpolate",
    "gbt_classifier_docs",
    "gbt_train_docs",
    "high_watermark",
    "incremental_new_rows",
    "join_anti_customers",
    "join_left_order_counts",
    "json_props_agg",
    "jsonl_roundtrip_stats",
    "lang_classifier_docs",
    "lang_id",
    "macd_12_26_9",
    "minhash_eval_metrics",
    "multimodal_decode",
    "multimodal_features",
    "multimodal_frames",
    "multimodal_meta",
    "multimodal_resize",
    "ntile_value_quartiles",
    "pct_change_events",
    "percent_rank_cume_dist",
    "pivot_status_qty",
    "pq_adc_topk_md5",
    "q10_returned_items",
    "q11_important_parts_v",
    "q12_late_priority_v",
    "q14_promo_effect",
    "q15_top_supplier",
    "q16_supplier_count_v",
    "q17_small_qty_revenue",
    "q19_bracket_revenue_v",
    "q20_excess_qty_suppliers_v",
    "q22_dormant_customers_v",
    "q2_min_cost_supplier_v",
    "q4_order_priority",
    "q6_revenue_delta",
    "q7_volume_shipping",
    "q9_product_profit_v",
    "quality_score",
    "range_scan_limit",
    "rank_parts_by_price",
    "realtime_stats_join",
    "repetition_ratio",
    "rolling_corr_pairs",
    "rollup_pricing",
    "scalar_datetime",
    "session_window_native",
    "simhash_eval_metrics",
    "split_by_cluster",
    "split_by_hash",
    "stratified_sample_exact",
    "string_agg_statuses",
    "text_stats",
    "tfidf_top_terms",
    "tumbling_hour_stats",
    "union_dedup",
    "unpivot_ohlc",
    "value_histogram",
    "window_first_last_nth",
    "zscore_anomalies",
    # round-9 (r8 verdict #5: HLL register path for the rolling distinct)
    "dau_mau_stickiness_hll",
]


REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))

STREAM_ROWS = int(os.environ.get("SPARK_GRAFT_BENCH_STREAM_ROWS", "200000"))


def _loadavg() -> list[float]:
    try:
        with open("/proc/loadavg") as f:
            return [float(x) for x in f.read().split()[:3]]
    except OSError:
        return []


def _cpu_ticks() -> tuple[int, int] | None:
    """(steal_ticks, total_ticks) from /proc/stat — hypervisor steal is
    invisible to loadavg and to in-process timers, but it is exactly
    the mechanism that makes a saturated local[32] run slow on a
    'quiet' guest. Recorded start→end so the payload carries the
    steal fraction the run actually experienced (round-12: three
    same-tree clean-start runs spread 303.8→387.2 s; the canary pins
    point-in-time host speed, this pins contention DURING the run)."""
    try:
        with open("/proc/stat") as f:
            fields = [int(x) for x in f.readline().split()[1:]]
        # total = user..steal (fields[:8]) ONLY — guest/guest_nice are
        # already folded into user/nice on Linux, so summing all ten
        # double-counts guest time and understates steal_pct (r12
        # ADVICE #1)
        return fields[7] if len(fields) > 7 else 0, sum(fields[:8])
    except (OSError, ValueError, IndexError):
        return None


def _steal_pct(start: tuple[int, int] | None, end: tuple[int, int] | None):
    if not start or not end or end[1] <= start[1]:
        return None
    return round(100.0 * (end[0] - start[0]) / (end[1] - start[1]), 3)


def _progress_breakdown(queries) -> dict:
    """Per-query totals from StreamingQuery.recentProgress so a
    throughput shift is attributable to source scan vs planning vs
    state/sink (addBatch) vs offset bookkeeping — added after the r6
    10.6k-vs-19k rows/s mystery, where the single aggregate number
    could not localize the cost."""
    out: dict[str, dict] = {}
    for q in queries:
        agg: dict[str, float] = {}
        batches = 0
        rows = 0.0
        for p in q.recentProgress:
            batches += 1
            rows += p.get("numInputRows", 0) or 0
            for k, v in (p.get("durationMs") or {}).items():
                agg[k] = agg.get(k, 0) + v
        out[q.name or q.id] = {
            "batches": batches,
            "input_rows": int(rows),
            **{f"{k}_ms": int(v) for k, v in sorted(agg.items())},
        }
    return out


def streaming_rows_per_sec(spark, sf_dir: str) -> tuple[float | None, dict]:
    """Micro-batch throughput of the three-query streaming topology
    (reference stream_processor.py cadences): events rows are mapped to
    the Kafka message contract, written as text-file batches, and
    streamed through start_three_queries with availableNow triggers.
    Returns (source rows ingested per wall-clock second, per-query
    stage-duration breakdown); each of the three queries consumes the
    full input."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from big_data_pr_spark.streaming import pipeline
    from big_data_pr_spark.timeutil import epoch_millis

    work = tempfile.mkdtemp(prefix="bench_stream_")
    try:
        in_dir = os.path.join(work, "in")
        ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        # Replicate the table up to STREAM_ROWS instead of letting
        # limit() silently cap below it: the r6 "throughput regression"
        # (10.6k vs r5's 19k rows/s, code byte-identical) was exactly
        # this — the driver's regenerated sf0.1 events table had 100k
        # rows where r5's had 200k, and at this scale the topology's
        # wall-clock is dominated by fixed per-query overhead (~7 s for
        # all three queries whether 100k or 400k rows), so rows/s moved
        # 1:1 with the input size. Pinning the input to STREAM_ROWS
        # makes the number comparable across rounds regardless of what
        # the fixtures contain.
        n_avail = ev.count()
        if 0 < n_avail < STREAM_ROWS:
            mult = -(-STREAM_ROWS // n_avail)
            ev = ev.crossJoin(
                spark.range(mult).withColumnRenamed("id", "__rep")
            ).drop("__rep")
        msgs = ev.limit(STREAM_ROWS).select(
            F.to_json(
                F.struct(
                    epoch_millis("ts").alias("timestamp"),
                    F.col("event_type").alias("symbol"),
                    F.lit("1m").alias("timeframe"),
                    (F.col("value") - 0.5).alias("open"),
                    (F.col("value") + 1.0).alias("high"),
                    (F.col("value") - 1.0).alias("low"),
                    F.col("value").alias("close"),
                    F.lit(1.0).alias("volume"),
                    F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias(
                        "datetime_str"
                    ),
                )
            ).alias("value")
        )
        msgs.repartition(8).write.mode("overwrite").text(in_dir)
        n_rows = spark.read.text(in_dir).count()
        # Warmup topology on a 1k-row slice: the session's FIRST
        # streaming run pays ~9 s of state-store/sink/codegen first-touch
        # (measured 16.1 s cold vs 7.2 s warm for the identical input) —
        # that cost belongs to session setup, not per-round throughput.
        warm_in = os.path.join(work, "warm_in")
        spark.read.text(in_dir).limit(1000).write.mode("overwrite").text(warm_in)
        for q in pipeline.start_three_queries(
            pipeline.file_source(spark, warm_in),
            os.path.join(work, "warm_out"), os.path.join(work, "warm_cp"),
        ):
            q.awaitTermination(300)
        raw = pipeline.file_source(spark, in_dir)
        # State-partition sizing (r7 verdict #6, curve in SCALE.md +
        # tools/stream_probe.py): the stateful queries' state-store
        # open/commit cost scales with the shuffle-partition count, not
        # the data — at this state size 8 partitions beat 32 by 1.4×.
        # The no-data watermark-advance batch costs a full trigger
        # cycle and emits nothing this topology needs (complete/update
        # modes + a stateless append). Both are runtime confs scoped to
        # this topology: set before the queries plan, restored after.
        saved = {
            k: spark.conf.get(k, None)
            for k in (
                "spark.sql.shuffle.partitions",
                "spark.sql.streaming.noDataMicroBatches.enabled",
            )
        }
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        spark.conf.set(
            "spark.sql.streaming.noDataMicroBatches.enabled", "false"
        )
        try:
            # min of REPEATS like the batch queries: streaming runs at
            # the END of the bench where host contention peaks (r8:
            # identical topology measured 3.2 s idle vs 6.3 s after the
            # 422-query grind), and the MIN is the closest to the
            # topology's true per-trigger floor. Fresh checkpoints per
            # rep — replaying the same availableNow input.
            elapsed = None
            queries = None
            for rep in range(max(1, REPEATS)):
                t0 = time.time()
                qs = pipeline.start_three_queries(
                    raw,
                    os.path.join(work, f"out{rep}"),
                    os.path.join(work, f"cp{rep}"),
                )
                for q in qs:
                    q.awaitTermination(600)
                run = time.time() - t0
                if elapsed is None or run < elapsed:
                    elapsed, queries = run, qs
        finally:
            for k, v in saved.items():
                if v is not None:
                    spark.conf.set(k, v)
                else:
                    # key was unset at session build: restore THAT, or
                    # the override leaks into everything after the
                    # streaming bench (training_fit, ann_recall, any
                    # later streaming use of the shared session)
                    spark.conf.unset(k)
        breakdown = _progress_breakdown(queries)
        breakdown["wall_clock_s"] = round(elapsed, 2)
        rps = round(n_rows / elapsed, 1) if elapsed > 0 else None
        return rps, breakdown
    except Exception as exc:  # never fail the whole bench on streaming
        print(f"streaming bench failed: {exc}", file=sys.stderr)
        return None, {}
    finally:
        shutil.rmtree(work, ignore_errors=True)


def training_fit_seconds(spark, sf_dir: str) -> dict[str, float | None]:
    """One-shot distributed-training throughput: wall seconds to fit
    the histogram GBDT (8 trees × depth 3) and the logistic classifier
    (30 GD iterations) on the documents corpus. Run once (not per-rep):
    training cost is dominated by fixed per-iteration job overhead at
    this SF, so the single number is the honest one."""
    out: dict[str, float | None] = {"gbt_fit_sec": None, "logreg_fit_sec": None}
    try:
        from big_data_pr_spark.operators.gbt import fit_gbt
        from big_data_pr_spark.operators.logreg import fit_logreg
        from big_data_pr_spark.queries.ml_queries import (
            doc_gbt_features,
            doc_lang_features,
        )
        from big_data_pr_spark.tables import load

        docs = load(spark, sf_dir, "documents")
        t0 = time.time()
        fit_gbt(
            doc_gbt_features(docs),
            ["n_tokens", "n_uniq", "first_len"],
            "n_chars",
            n_trees=8,
            max_depth=3,
            # this metric tracks the DISTRIBUTED histogram path (the
            # 100 TB shape) across rounds — force past the r9
            # small-input driver gate so the number stays comparable
            driver_fit_max_rows=0,
        )
        out["gbt_fit_sec"] = round(time.time() - t0, 3)
        t0 = time.time()
        fit_logreg(
            doc_lang_features(docs),
            ["n_tok", "avg_len", "stop_ratio"],
            "is_en",
            n_iters=30,
            # track the DISTRIBUTED per-iteration-aggregation path (the
            # 100 TB shape), as gbt_fit_sec does
            driver_fit_max_rows=0,
        )
        out["logreg_fit_sec"] = round(time.time() - t0, 3)
    except Exception as exc:  # never fail the whole bench on training
        print(f"training bench failed: {exc}", file=sys.stderr)
    # r9 verdict #5: the remaining gates-off distributed paths — BPE
    # merge training (per-round pair-count jobs) and pointer-jumping
    # connected components — were parity-tested but never TIMED (the
    # sf0.1 bench routes them through the driver gates). Track them
    # like gbt_fit_sec so a regression in the 100 TB shape is visible.
    out.update({"bpe_fit_sec": None, "cc_fit_sec": None})
    try:
        from big_data_pr_spark.operators import dedup
        from big_data_pr_spark.operators.bpe import train_bpe
        from big_data_pr_spark.tables import load

        docs = load(spark, sf_dir, "documents")
        t0 = time.time()
        train_bpe(docs, n_merges=10, driver_train_max_words=0)
        out["bpe_fit_sec"] = round(time.time() - t0, 3)

        # pairs materialized (and counted) BEFORE the clock so the
        # number excludes LSH pair generation. NOTE (r10 advice):
        # connected_components still does its own localCheckpoint() +
        # count() of the input inside the timed region, so cc_fit_sec
        # = one pair-set materialization + the propagation loop; it
        # reads slightly high and scales with pair-set size — compare
        # rounds at the same SF, and don't attribute a delta here to
        # the loop without first checking the pair count.
        pairs = dedup.minhash_lsh_pairs(docs, min_est_jaccard=0.5).persist()
        try:
            pairs.count()
            t0 = time.time()
            dedup.connected_components(pairs, driver_cc_max_edges=0).count()
            out["cc_fit_sec"] = round(time.time() - t0, 3)
        finally:
            pairs.unpersist()
    except Exception as exc:  # never fail the whole bench on training
        print(f"distributed-fit bench failed: {exc}", file=sys.stderr)
    return out


def ann_recall(spark, sf_dir: str) -> dict[str, float | None]:
    """Approximation quality alongside speed:

    - ``ivf_recall_at_10``: the literal-centroid IVF probe's top-10 vs
      the exact brute-force top-10 for the same query vector.
    - ``lsh_pair_recall``: fraction of the TRUE embedding near-dup
      pairs (exact cosine ≥ 0.4 self-join) that the banded-LSH
      candidate generator surfaces — the metric that matters for
      dedup; top-k-vs-global recall is ~0 by construction for a
      bucket-restricted search over mostly-random vectors.
    """
    out: dict[str, float | None] = {
        "lsh_pair_recall": None,
        "ivf_recall_at_10": None,
        "pq_recall_at_10": None,
    }
    try:
        exact10 = {
            r["vec_id"]
            for r in REGISTRY["knn_cosine_bruteforce"].fn(spark, sf_dir).collect()
        }
        ivf10 = {
            r["vec_id"] for r in REGISTRY["ann_ivf_topk_lit"].fn(spark, sf_dir).collect()
        }
        out["ivf_recall_at_10"] = round(len(exact10 & ivf10) / max(len(exact10), 1), 3)
        pairs = {
            (r["id_a"], r["id_b"])
            for r in REGISTRY["embedding_dup_pairs"].fn(spark, sf_dir).collect()
        }
        lsh_pairs = {
            (r["id_a"], r["id_b"])
            for r in REGISTRY["embedding_dup_pairs_lsh"].fn(spark, sf_dir).collect()
        }
        out["lsh_pair_recall"] = round(len(pairs & lsh_pairs) / max(len(pairs), 1), 3)
        # PQ ADC (trained codebooks) top-10 vs the exact L2 top-10 for
        # the same query — ADC ranks by squared L2, so the exact
        # baseline must too (cosine top-10 differs for unnormalized
        # vectors)
        from pyspark.sql import functions as F

        from big_data_pr_spark.operators import similarity as _sim
        from big_data_pr_spark.tables import load as _load

        emb = _load(spark, sf_dir, "embeddings")
        qvec = [
            float(x)
            for x in emb.filter(F.col("vec_id") == 0)
            .select("embedding")
            .collect()[0][0]
        ]
        exact_l2 = {
            r["vec_id"]
            for r in emb.filter(F.col("vec_id") != 0)
            .select(
                "vec_id",
                _sim._sq_dist_to_literal(F.col("embedding"), qvec).alias("d"),
            )
            .orderBy(F.asc("d"), F.asc("vec_id"))
            .limit(10)
            .collect()
        }
        pq10 = {
            r["vec_id"] for r in REGISTRY["pq_adc_topk"].fn(spark, sf_dir).collect()
        }
        out["pq_recall_at_10"] = round(len(exact_l2 & pq10) / max(len(exact_l2), 1), 3)
    except Exception as exc:  # never fail the bench on the quality probe
        print(f"ann recall probe failed: {exc}", file=sys.stderr)
    return out


def host_canary() -> dict:
    """Fixed pure-CPU micro-workloads, min of 3 reps — a HOST-SPEED
    reference recorded alongside the query timings.

    Round-12 lesson: two clean-start bench runs read 303.8/318.5 s
    against the prior round's 217.5 s with a median per-query ratio of
    1.35 ON TRIVIAL SINGLE-STAGE QUERIES — host drift, not plan drift,
    but proving that required diffing hundreds of per-query fields.
    These two scalars make the next such comparison one division:
    ``canary_python_sec`` is single-core interpreter speed (pure
    bytecode loop), ``canary_blas_sec`` is multi-core FP throughput
    (1200² matmul through whatever BLAS numpy carries). Identical
    inputs every round; no Spark, no I/O, no RNG in the timed path.
    """
    import numpy as np

    a = np.random.RandomState(0).rand(1200, 1200)
    py, blas = [], []
    for _ in range(3):
        # perf_counter, not time.time: NTP steps can skew or negate a
        # wall-clock canary, and cross-round comparisons DIVIDE by
        # these scalars (r12 ADVICE #4)
        t0 = time.perf_counter()
        s = 0
        for i in range(2_000_000):
            s += i
        py.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        (a @ a).sum()
        blas.append(time.perf_counter() - t0)
    return {
        "canary_python_sec": round(min(py), 4),
        "canary_blas_sec": round(min(blas), 4),
    }


# The r12 driver run's canary readings — the reference host speed the
# normalized headline is expressed against. Dividing a round's total by
# the geometric mean of its canary ratios (this host vs these pins)
# re-states the total "as if run on the r12 driver host", which is what
# cross-round grading actually wants (r12 verdict #3: four same-tree
# clean runs spread 245-387 s on host weather alone). RAW ``value``
# stays the driver contract and stays LAST.
CANARY_REF = {"canary_python_sec": 0.067, "canary_blas_sec": 0.019}


def canary_ratios(canary: dict | None) -> dict:
    """Per-canary (measured/reference) ratios, each clamped to
    [0.5, 3.0] — reported raw in the payload so a reader can SEE when
    the two canaries disagree (r13: BLAS read 2.7× faster than
    reference while python read 1.3× slower, and the geomean silently
    averaged the contradiction)."""
    out = {}
    if not canary:
        return out
    for k, ref in CANARY_REF.items():
        try:
            v = float(canary.get(k) or 0)
        except (TypeError, ValueError):
            continue
        if v > 0:
            out[k.replace("canary_", "canary_ratio_").replace("_sec", "")] = (
                round(min(max(v / ref, 0.5), 3.0), 3)
            )
    return out


def host_adjusted_total(total: float, canary: dict | None) -> float | None:
    """``total`` scaled to the CANARY_REF host: divide by the geometric
    mean of the PER-CANARY clamped ratios (r13 verdict #8: clamping
    only the geomean let one pathological canary drag the adjustment;
    each ratio is now bounded to [0.5, 3.0] before averaging, and the
    raw ratios ship in the payload via :func:`canary_ratios`)."""
    ratios = list(canary_ratios(canary).values())
    if not ratios:
        return None
    gm = math.exp(sum(math.log(r) for r in ratios) / len(ratios))
    return round(total / min(max(gm, 0.5), 3.0), 3)


def assemble_payload(
    timings: dict, medians: dict, stream_breakdown: dict, prev: dict,
    *, stream_rps, fit_secs: dict, recalls: dict, load_start, total, sf,
    canary: dict | None = None,
) -> dict:
    """Build the bench JSON payload with the TAIL-SAFE key order.

    Key order matters: the driver's log capture keeps only the TAIL of
    stdout (BENCH_r05 lost the headline total because the large
    per-query dicts pushed the leading scalars out of the window), so
    the big dicts go FIRST and every summary scalar LAST. The per-query
    dicts are emitted SORTED BY NAME (r6 verdict #6: HEADLINE-order
    tails never overlap across rounds, which made cross-round
    comparison impossible from the artifacts alone), and the full
    payload is also written to BENCH_LOCAL.json in the repo so no
    truncation can hide any number.

    The carried-forward sustained-streaming record from *prev* (the
    previous BENCH_LOCAL.json — produced by tools/stream_probe.py
    --sustained, not by this harness) is inserted with the big dicts,
    NOT appended after the scalars: appending it last defeated the r6
    fix and left BENCH_r10/r11 driver tails ending inside this static
    record, parsed as null (r11 verdict #2). Guard:
    tests/test_bench_payload.py pins ``list(payload)[-1] == "value"``.
    """
    payload = {
        "queries": dict(sorted(timings.items())),
        "queries_median": dict(sorted(medians.items())),
        "streaming_breakdown": stream_breakdown,
    }
    for key in ("streaming_sustained", "streaming_sustained_bootstrap"):
        if key in prev:
            payload[key] = prev[key]
    payload.update({
        "streaming_rows_per_sec": stream_rps,
        "streaming_input_rows": STREAM_ROWS,
        **fit_secs,
        **recalls,
        **(canary or {}),
        "loadavg_start": load_start,
        "loadavg_end": _loadavg(),
        "repeats": REPEATS,
        "n_queries": len(timings),
        "metric": "headline_queries_total",
        "unit": "sec",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # host-weather-normalized headline (r12 verdict #3): total
        # re-stated at CANARY_REF host speed so a cross-round compare
        # is one division, not a 423-field diff. Raw "value" remains
        # the driver contract and remains the LAST key. The per-canary
        # ratios ship raw (r13 verdict #8) so disagreement is visible.
        **canary_ratios(canary),
        "value_host_adj": host_adjusted_total(total, canary),
        "value": total,
    })
    return payload


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    load_start = _loadavg()
    ticks_start = _cpu_ticks()
    spark = get_spark("bench")
    names = [n for n in HEADLINE if n in REGISTRY]
    # warm the JVM + parquet footer caches once so per-query numbers
    # measure the plan, not session startup
    REGISTRY["q1_pricing"].fn(spark, sf_dir).count()
    # ... and the Python worker pool (first Arrow/Python-DataSource use
    # pays ~5 s of daemon fork + import cost; steady-state is what the
    # per-query numbers should measure, same rationale as the JVM warmup)
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).count()
    if "rest_source_candles" in REGISTRY:
        # the Python DataSource runner is a third worker path with its
        # own import cost — touch one partition of it
        REGISTRY["rest_source_candles"].fn(spark, sf_dir).limit(1).count()
    # min + median of REPEATS runs per query: single-JVM timings on a
    # shared host swing ~3x with contention (observed across rounds);
    # the MIN is the closest to the plan's true cost, the median shows
    # the noise floor, and loadavg stamps the host state for the reader
    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    for name in names:
        runs = []
        for _ in range(REPEATS):
            t0 = time.time()
            REGISTRY[name].fn(spark, sf_dir).count()
            runs.append(time.time() - t0)
        timings[name] = round(min(runs), 3)
        medians[name] = round(sorted(runs)[len(runs) // 2], 3)
    total = round(sum(timings.values()), 3)
    stream_rps, stream_breakdown = streaming_rows_per_sec(spark, sf_dir)
    fit_secs = training_fit_seconds(spark, sf_dir)
    recalls = ann_recall(spark, sf_dir)
    local_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"
    )
    try:
        with open(local_path) as f:
            prev = json.load(f)
    except (OSError, ValueError):
        prev = {}
    payload = assemble_payload(
        timings, medians, stream_breakdown, prev,
        stream_rps=stream_rps,
        fit_secs=fit_secs,
        recalls=recalls,
        load_start=load_start,
        total=total,
        sf=sf,
        canary={
            **host_canary(),
            "steal_pct": _steal_pct(ticks_start, _cpu_ticks()),
        },
    )
    try:
        with open(local_path, "w") as f:
            json.dump(payload, f, indent=1)
            f.write("\n")
    except OSError as exc:
        print(f"BENCH_LOCAL.json write failed: {exc}", file=sys.stderr)
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
