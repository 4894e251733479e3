"""Central query registry wiring operators to the driver contract.

Each named query is a ``(spark, sf_dir) -> DataFrame`` callable plus (when
SQL-expressible) the equivalent ANSI SQL the DuckDB oracle runs on the same
parquet tables.  ``__spark_entry__.queries()`` / ``oracle_sql()`` read from
here; keeping the Spark code and its oracle adjacent in each operator module
keeps the two in sync.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None  # ANSI SQL for DuckDB, or None → rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: add a query to the registry.

    Duplicate names are an ERROR, not an overwrite: a silent overwrite
    shadows the earlier operator everywhere downstream (driver contract,
    oracle checks, bench, DRIVER_VERIFIED bookkeeping) while its code and
    tests keep passing — exactly the failure mode this guard caught once
    (a round-5 re-implementation of ``rolling_7day_distinct_users``
    silently replaced the driver-verified round-4 operator)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(
                f"query {name!r} is already registered by "
                f"{REGISTRY[name].fn.__module__}.{REGISTRY[name].fn.__qualname__}"
            )
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags)
        return fn

    return deco


#: Queries with a driver CORRECTNESS row, keyed to the round that recorded
#: it (CORRECTNESS_r01.json: 48 full-pass + 2 rows-only; CORRECTNESS_r02.json:
#: 43 full-pass + 6 rows-only — ``inverted_index`` errored there and is NOT
#: listed).  External harnesses that verify the registry head-first should
#: spend fresh budget elsewhere, so ``load_all`` orders these LAST, oldest
#: verification first (stalest rows get re-confirmed with leftover window
#: slots).  Frozen copies of those files' keys — intentionally not read from
#: disk (the driver runs from an arbitrary cwd).
DRIVER_VERIFIED: dict[str, int] = {}
DRIVER_VERIFIED.update(dict.fromkeys((
    "enrich_trips", "unknown_zone_trip_count", "trip_count_by_business_month",
    "profit_by_business_month", "salted_earnings_by_business_month",
    "earnings_by_business_month", "pandas_api_event_counts",
    "top5_pickup_boroughs_by_month", "top5_dropoff_boroughs_by_month",
    "route_revenue_top30", "avg_fare_by_time_of_day",
    "avg_trip_length_by_time_of_day", "fare_per_unit_by_time_of_day",
    "daily_avg_wait_january", "anomalous_wait_days", "borough_timeofday_band",
    "urgent_trips_by_borough", "corridor_trip_count",
    "route_pivot_by_business_top10", "events_hourly_rollup",
    "events_sessionize", "events_json_extract", "click_purchase_funnel",
    "top_user_per_event_type", "day1_clickers_minus_purchasers",
    "day1_clickers_and_purchasers", "day1_engaged_users",
    "orders_with_high_qty_item", "orders_without_high_qty_item",
    "cube_trip_counts", "rollup_borough_zone_counts",
    "distinct_users_by_event_type", "approx_distinct_users_by_event_type",
    "median_value_by_event_type", "approx_percentiles_by_event_type",
    "unpivot_monthly_metrics", "value_extremes_by_event_type",
    "corr_value_hour_by_event_type", "quartiles_by_event_type",
    "iqr_outlier_events", "asof_last_click_before_error", "value_band_counts",
    "value_histogram", "daily_event_counts_gapfill",
    "rolling_7day_event_counts", "user_retention_cohorts",
    "rolling_avg_value_per_user", "monthly_revenue_running_total",
    "zone_share_of_borough_revenue", "user_value_quartiles",
), 1))
DRIVER_VERIFIED.update(dict.fromkeys((
    "dedup_exact", "neardup_jaccard_pairs", "neardup_minhash_lsh",
    "neardup_embedding_cosine", "neardup_embedding_lsh", "dedup_simhash",
    "ann_cosine_topk", "ann_lsh_topk", "ann_ivf_topk", "label_centroids",
    "token_counts", "doc_quality", "lang_id", "bigram_expansion_udtf",
    "tfidf_top_terms", "heavy_hitter_terms", "approx_heavy_hitter_terms",
    "stratified_hash_sample", "doc_fingerprint", "media_byte_features",
    "media_frame_manifest", "minmax_normalized_values",
    "curate_training_corpus", "curate_pack_corpus",
    "neardup_connected_components", "pii_scrub_docs", "doc_repetition_score",
    "contamination_overlap", "pack_training_sequences",
    "synthetic_source_scan", "revenue_by_nation",
    "top_building_orders_by_revenue", "event_grouping_sets",
    "orders_above_avg_price", "customer_merge_upsert",
    "orders_column_profile", "pricing_summary_by_flag_status",
    "discount_revenue_impact", "late_shipment_priority_counts",
    "promo_revenue_share", "customer_order_distribution",
    "top_revenue_supplier", "large_volume_customers",
    "returned_item_losses_top20", "nation_market_share_by_year",
    "dormant_rich_customers", "cheapest_supplier_per_brand",
    "event_gaps_per_user", "user_value_position_stats",
), 2))
DRIVER_VERIFIED.update(dict.fromkeys((
    # CORRECTNESS_r03.json: 45 hash-green + 3 rows-only (driver rows exist
    # for the rows-only trio; the two hash-fail rows are NOT listed — they
    # sit in CHANGED_SINCE_VERIFIED with their oracle-cast fix instead).
    "dedup_exact", "neardup_jaccard_pairs", "inverted_index",
    "minmax_normalized_values", "curate_training_corpus", "curate_pack_corpus",
    "neardup_connected_components", "contamination_overlap", "value_band_counts",
    "incremental_dedup_new_docs", "embedding_dim_stats", "embedding_standardized",
    "token_diversity", "quality_model_score", "quality_deciles_by_lang",
    "cdc_chunk_docs", "cms_heavy_hitter_estimates", "trigram_substring_search",
    "neardup_triangles", "dedup_keep_best_in_cluster", "source_quota_sample",
    "top_customers_per_nation_lateral", "snapshot_diff_orders", "dq_orders_suite",
    "small_quantity_order_revenue", "disjunctive_brand_revenue",
    "sole_late_supplier_waits", "volume_shipping_by_year",
    "product_profit_by_nation_year", "important_part_values",
    "supplier_diversity_by_part_class", "dominant_part_suppliers",
    "local_supplier_volume", "user_events_last_hour", "events_variant_extract",
    "signup_click_purchase_funnel", "modal_event_type_per_user",
    "session_window_rollup", "winsorized_values_by_event_type",
    "percentile_cont_by_event_type", "lineitem_zorder_extents",
    "join_key_skew_profile", "interpolated_user_series",
    "time_weighted_avg_per_user", "scd2_segment_at_order",
    "neardup_minhash_lsh", "dedup_simhash", "approx_heavy_hitter_terms",
), 3))
DRIVER_VERIFIED.update(dict.fromkeys((
    # CORRECTNESS_r04.json: 48 hash-green + 2 rows-only with driver rows
    # (neardup_minhash_lsh, ann_lsh_topk — no SQL form by design).
    "neardup_jaccard_pairs", "tfidf_top_terms", "curate_training_corpus",
    "curate_pack_corpus", "contamination_overlap", "sole_late_supplier_waits",
    "late_line_priority_mix", "peak_concurrent_sessions", "neardup_minhash_lsh",
    "ann_lsh_topk", "daily_event_growth", "rolling_7day_distinct_users",
    "neardup_prefix_filter", "per_lang_top_terms", "collocation_npmi_top",
    "tfidf_doc_similarity_pairs", "media_chunk_dedup", "source_mixture_weights",
    "mixture_resample_docs", "training_shard_manifest", "weighted_doc_sample",
    "boilerplate_segment_dedup", "boilerplate_hot_segments",
    "unigram_logppl_docs", "vocab_coverage_docs", "user_event_entropy",
    "event_transition_probs", "geo_mean_value_by_event_type",
    "ks_drift_click_vs_purchase", "zipf_slope_terms", "event_volume_trend",
    "daily_autocorrelation", "fuzzy_customer_pairs", "rollup_apply_cdc",
    "user_session_stats", "user_growth_accounting", "audience_overlap_matrix",
    "order_skyline_price_date", "customer_abc_classes", "daily_event_bursts",
    "daily_ewma_counts", "late_data_backfill", "doc_containment_pairs",
    "embedding_int8_export", "chunk_docs_overlap", "hybrid_search_rrf",
    "per_source_sample_topk", "kwic_concordance", "ndcg_tfidf_vs_overlap",
    "hashing_trick_doc_vectors",
), 4))
DRIVER_VERIFIED.update(dict.fromkeys((
    # CORRECTNESS_r05.json: 48 hash-green + the same 2 rows-only.  The r5
    # window re-sampled 40 r4-green queries because this bookkeeping wasn't
    # updated after round 4 — keep these dicts current every round or the
    # driver's 50-slot window burns slots re-confirming fresh rows.
    "neardup_jaccard_pairs", "tfidf_top_terms", "curate_training_corpus",
    "curate_pack_corpus", "contamination_overlap", "sole_late_supplier_waits",
    "late_line_priority_mix", "peak_concurrent_sessions", "neardup_minhash_lsh",
    "ann_lsh_topk", "dup_substring_spans", "dedup_cut_substrings",
    "bloom_contamination_screen", "label_outlier_vectors", "doc_readability",
    "media_image_stats", "media_audio_stats", "media_video_frame_stats",
    "corpus_datasheet_by_source", "forget_users_cascade", "top_session_paths",
    "hll_distinct_users_from_scratch", "bootstrap_mean_ci",
    "daily_event_growth", "rolling_7day_distinct_users",
    "neardup_prefix_filter", "per_lang_top_terms", "collocation_npmi_top",
    "tfidf_doc_similarity_pairs", "media_chunk_dedup", "source_mixture_weights",
    "mixture_resample_docs", "training_shard_manifest", "weighted_doc_sample",
    "boilerplate_segment_dedup", "boilerplate_hot_segments",
    "unigram_logppl_docs", "vocab_coverage_docs", "user_event_entropy",
    "event_transition_probs", "geo_mean_value_by_event_type",
    "ks_drift_click_vs_purchase", "zipf_slope_terms", "event_volume_trend",
    "daily_autocorrelation", "fuzzy_customer_pairs", "rollup_apply_cdc",
    "user_session_stats", "user_growth_accounting", "audience_overlap_matrix",
), 5))
DRIVER_VERIFIED.update(dict.fromkeys((
    # CORRECTNESS_r06.json: 48 hash-green + 2 rows-only with driver rows
    # (ann_recall_report, coreset_kcenter_sample — no SQL form by design).
    # Folding this in promptly (round-6 verdict item 1) keeps the r7 driver
    # window on the 48 never-sampled queries instead of re-confirming these.
    "asof_last_click_cogroup", "bootstrap_mean_ci", "ann_recall_report",
    "coreset_kcenter_sample", "fighting_words_src0_vs_src1",
    "neardup_hop_distance", "top_event_paths", "ab_test_purchase_conversion",
    "km_time_to_purchase", "event_daypart_contingency",
    "psi_click_vs_purchase", "customer_identity_clusters",
    "order_revenue_reconciliation", "k_anonymity_violations",
    "dp_noisy_event_counts", "benford_order_totals",
    "conversion_latency_quantiles", "linear_attribution_by_day",
    "equi_depth_histogram_by_event_type", "basket_part_pair_lift",
    "mad_outlier_events", "customer_rfm_segments", "repeat_rate_wilson_ci",
    "customer_revenue_gini", "longest_daily_streak_per_user",
    "events_15min_tumbling", "events_hourly_hopping",
    "cusum_daily_level_shift", "seasonal_naive_forecast_error",
    "m4_downsample_values", "winnowing_fingerprints", "winnow_candidate_pairs",
    "bigram_backoff_logprob", "bloom_prefilter_urgent_revenue",
    "events_throttle_dedup", "revenue_weighted_median_discount",
    "daily_dow_decomposition", "duplicate_ngram_spans",
    "neardup_source_matrix", "span_corruption_examples",
    "text_normalization_report", "neardup_ascending_paths",
    "big_order_mix_param_sql", "revenue_by_flag_sql_udf",
    "unshipped_orders_by_revenue", "discount_quantity_elasticity_by_brand",
    "session_overlap_histogram", "events_global_sequence",
    "theilsen_daily_trend", "record_high_days",
), 6))
DRIVER_VERIFIED.update(dict.fromkeys((
    # CORRECTNESS_r07.json: 48 hash-green + 2 rows-only
    # (bpe_learn_merges, train_quality_classifier — no SQL form by design;
    # they stay OUT of this dict so the r8 driver window re-samples them
    # alongside the 13 never-sampled rows-only queries).  The three
    # CHANGED_SINCE_VERIFIED re-verifications (pack_training_sequences,
    # curate_pack_corpus, tfidf_doc_similarity_pairs) went green and move
    # to round-7 freshness here.
    "ab_srm_check", "ab_test_cuped_value", "ann_filtered_topk",
    "blocklist_screen_docs", "bm25_topk_docs", "budget_select_by_quality",
    "cohort_ltv_curve", "curate_pack_corpus", "curate_pack_quality_gated",
    "daily_acf", "daily_changepoint", "daily_robust_band",
    "dedup_savings_by_source", "dsir_importance_weights",
    "embedding_hard_negatives", "embedding_prefix_energy",
    "event_type_dispersion", "fim_transform_examples",
    "kendall_tau_click_purchase", "langid_agreement_stats",
    "langid_classification_report", "langid_confusion_matrix",
    "length_bucketed_batches", "length_matched_resample", "ljung_box_daily",
    "mann_kendall_daily_trend", "matryoshka_recall_curve",
    "pack_training_sequences", "packing_efficiency_by_source",
    "preference_pairs_by_source", "proximity_phrase_search",
    "purchase_rate_jackknife_ci", "quality_calibration_bins",
    "quality_roc_points", "quality_score_auc", "quantile_normalized_scores",
    "rolling_corr_click_purchase", "sa_duplicate_length_profile",
    "sa_longest_duplicates", "source_distinct_ngrams",
    "source_score_calibration", "source_token_entropy", "source_unigram_kl",
    "tfidf_doc_similarity_pairs", "tokenizer_fertility_by_lang",
    "user_feature_vector", "waterfill_source_caps", "weekend_volume_ranksum",
), 7))
DRIVER_VERIFIED.update(dict.fromkeys((
    # CORRECTNESS_r08.json: 33 hash-green + 17 rows-only.  The driver
    # window landed exactly on the 17 still-unsampled rows-only queries,
    # so every registry entry now has a driver row.  Rows-only names ARE
    # recorded here (unlike the r7 convention) per the round-8 verdict:
    # a rows-present driver row is the strongest check the driver can
    # give a no-oracle query, and recording it keeps the
    # unverified-first ordering meaningful (each of the 17 additionally
    # carries an independent pytest replica/golden pin — COVERAGE.md).
    # Hash-green (33): the full round-8 window-sweep re-verification set
    # (all 18 CHANGED_SINCE_VERIFIED entries went green and move here)
    # plus 15 round-1 rideshare/events refreshes.
    "avg_fare_by_time_of_day", "avg_trip_length_by_time_of_day",
    "conversion_latency_quantiles", "customer_abc_classes",
    "customer_revenue_gini", "customer_rfm_segments",
    "earnings_by_business_month", "enrich_trips",
    "equi_depth_histogram_by_event_type", "hybrid_search_rrf",
    "iqr_outlier_events", "join_key_skew_profile", "m4_downsample_values",
    "mad_outlier_events", "median_value_by_event_type",
    "monthly_revenue_running_total", "ndcg_tfidf_vs_overlap",
    "pandas_api_event_counts", "profit_by_business_month",
    "psi_click_vs_purchase", "quality_deciles_by_lang",
    "quantile_normalized_scores", "quartiles_by_event_type",
    "rolling_avg_value_per_user", "route_revenue_top30",
    "salted_earnings_by_business_month", "top5_dropoff_boroughs_by_month",
    "top5_pickup_boroughs_by_month", "trip_count_by_business_month",
    "unknown_zone_trip_count", "user_value_quartiles",
    "winsorized_values_by_event_type", "zone_share_of_borough_revenue",
    # Rows-only with driver rows (17):
    "bpe_learn_merges", "train_quality_classifier",
    "daily_distinct_users_sketch_rollup", "bpe_encode_docs",
    "textrank_keywords", "embedding_top_component",
    "kmeans_embedding_clusters", "semantic_dedup_docs",
    "absorption_purchase_vs_error", "ann_pq_topk",
    "media_video_neardup_phash", "bpe_vocab_size_curve", "ann_ivfpq_topk",
    "doc_compression_ratio", "media_image_neardup_phash",
    "media_audio_neardup_fp", "pack_bestfit_efficiency",
), 8))
DRIVER_VERIFIED.update(dict.fromkeys((
    # CORRECTNESS_r09.json: 48 hash-green + 2 rows-only with driver rows
    # (``neardup_embedding_lsh``, ``ann_ivf_topk`` — ``no_oracle`` by
    # design in round 9; both are recorded below per the round-8
    # convention, each carrying an independent pytest truth-join pin).
    # Hash-green (48): all 7 CHANGED_SINCE_VERIFIED re-verifications went
    # green under their new bound-column/idiv plans and move here (the
    # set clears), the new ``doc_bigram_lm_bits`` was green first round
    # out, and the rest are rideshare/events/datapipe refreshes.
    "ann_cosine_topk", "anomalous_wait_days",
    "approx_distinct_users_by_event_type",
    "approx_percentiles_by_event_type", "asof_last_click_before_error",
    "bigram_expansion_udtf", "borough_timeofday_band",
    "click_purchase_funnel", "corr_value_hour_by_event_type",
    "corridor_trip_count", "cube_trip_counts", "customer_rfm_segments",
    "daily_avg_wait_january", "daily_distinct_users_sketch_rollup",
    "daily_event_counts_gapfill", "day1_clickers_and_purchasers",
    "day1_clickers_minus_purchasers", "day1_engaged_users",
    "distinct_users_by_event_type", "doc_bigram_lm_bits",
    "doc_fingerprint", "doc_quality", "equi_depth_histogram_by_event_type",
    "events_hourly_rollup", "events_json_extract", "events_sessionize",
    "fare_per_unit_by_time_of_day", "heavy_hitter_terms",
    "label_centroids", "lang_id", "media_byte_features",
    "media_frame_manifest", "neardup_embedding_cosine",
    "orders_with_high_qty_item", "orders_without_high_qty_item",
    "quality_deciles_by_lang", "rolling_7day_event_counts",
    "rollup_borough_zone_counts", "route_pivot_by_business_top10",
    "stratified_hash_sample", "token_counts", "top_user_per_event_type",
    "unpivot_monthly_metrics", "urgent_trips_by_borough",
    "user_retention_cohorts", "user_value_quartiles",
    "value_extremes_by_event_type", "value_histogram",
    # Rows-only with driver rows (2):
    "neardup_embedding_lsh", "ann_ivf_topk",
), 9))
DRIVER_VERIFIED.update(dict.fromkeys((
    # CORRECTNESS_r10.json: 50 hash-green, 0 rows-only, 0 failures — the
    # first all-green window.  All 22 CHANGED_SINCE_VERIFIED entries
    # (ANN quartet + recall report, LSH/simhash bound summaries, media
    # triad, and the 8 post-repin oracle-izations) re-verified green
    # under their new bound-column schemas and move here (the set
    # clears); the rest are tpch/events/datapipe refreshes.
    "absorption_purchase_vs_error", "ann_ivf_topk", "ann_ivfpq_topk",
    "ann_lsh_topk", "ann_pq_topk", "ann_recall_report",
    "approx_heavy_hitter_terms", "bpe_encode_docs", "bpe_learn_merges",
    "bpe_vocab_size_curve", "cheapest_supplier_per_brand",
    "coreset_kcenter_sample", "customer_merge_upsert",
    "customer_order_distribution", "dedup_exact", "dedup_simhash",
    "discount_revenue_impact", "doc_compression_ratio",
    "doc_repetition_score", "dormant_rich_customers",
    "embedding_dim_stats", "embedding_standardized",
    "embedding_top_component", "event_gaps_per_user",
    "event_grouping_sets", "incremental_dedup_new_docs", "inverted_index",
    "kmeans_embedding_clusters", "large_volume_customers",
    "late_shipment_priority_counts", "media_audio_neardup_fp",
    "media_image_neardup_phash", "media_video_neardup_phash",
    "nation_market_share_by_year", "neardup_embedding_lsh",
    "neardup_minhash_lsh", "orders_above_avg_price",
    "orders_column_profile", "pack_bestfit_efficiency", "pii_scrub_docs",
    "pricing_summary_by_flag_status", "promo_revenue_share",
    "returned_item_losses_top20", "revenue_by_nation",
    "synthetic_source_scan", "textrank_keywords", "token_diversity",
    "top_building_orders_by_revenue", "top_revenue_supplier",
    "user_value_position_stats",
), 10))

#: Round-2 verdict rule: a query whose IMPLEMENTATION changed after its
#: last green driver row is no longer verified — it rejoins the front of
#: the ordering so the next driver window re-runs it.  Maintained by hand
#: alongside the code change (the alternative — hashing source files at
#: import — would make ordering depend on install layout).
#:
#: Current entries (round 4):
#: - ``late_line_priority_mix`` / ``peak_concurrent_sessions``: the only
#:   red rows in CORRECTNESS_r03.json — their oracles' final integer
#:   SUM/MAX columns were uncast, so DuckDB typed them HUGEINT (int128)
#:   and the driver's Arrow-type-sensitive hash mismatched.  Fixed by
#:   ``CAST(... AS BIGINT)`` (tpch.py / events.py); re-verify first.
#:   (peak_concurrent_sessions additionally folded its peak + first-peak-ts
#:   readout into one struct-max aggregation later in round 4 — 24→12
#:   shuffles, same values — while already queued here.)
#:   (The r3 staged-dedup entries all went green in CORRECTNESS_r03 and
#:   moved to ``DRIVER_VERIFIED`` round 3.)
#: - ``tfidf_top_terms``: r2-verified with an eager ``docs.count()`` at
#:   plan-build time; round 4 replaced the corpus dimension with a lazy
#:   broadcast 1-row aggregate (same values, new plan) — re-verify.
#: - ``sole_late_supplier_waits``: r3-verified with a double countDistinct
#:   (Expand + two exchanges); round 4 rewrote it as two stacked
#:   aggregations clustered on orderkey (bucket-compatible, no Expand) —
#:   re-verify.
#: - cache-discipline sweep (round 4, second pass): the per-invocation
#:   ``persist()`` leaks flagged for boilerplate in round-3 advice existed
#:   at six more sites; all now re-read staged parquet (or recompute a
#:   cheap projection) instead.  Values are identical by construction —
#:   caching never changes results — but the implementation-change rule is
#:   mechanical, so every affected driver-verified query re-queues:
#:   ``neardup_jaccard_pairs``, ``contamination_overlap``,
#:   ``curate_training_corpus``, ``curate_pack_corpus``,
#:   ``neardup_minhash_lsh``, ``ann_lsh_topk``.
#: Round-7 entries (every round-6 entry — bootstrap_mean_ci,
#: asof_last_click_cogroup, ann_recall_report, coreset_kcenter_sample —
#: re-verified green in CORRECTNESS_r06 and moved to ``DRIVER_VERIFIED``):
#: - ``pack_training_sequences`` / ``curate_pack_corpus``: the per-source
#:   packing cumsum moved from ``Window.partitionBy("source")`` to the
#:   two-level ``keyed_running_sum`` (round-6 verdict item 2).  Values are
#:   bit-identical (order-free integer sum algebra; local oracle replica
#:   green at sf0.01) but the implementation-change rule is mechanical —
#:   re-verify.  (``source_quota_sample`` is NOT queued: its rank-limit
#:   window already compiles to a map-side partial WindowGroupLimit, so
#:   only its docstring changed; the other reworked queries —
#:   preference_pairs_by_source, length_bucketed_batches,
#:   curate_pack_quality_gated, packing_efficiency_by_source — have never
#:   had a driver row, so they already sort in the unverified tier.)
#: - ``tfidf_doc_similarity_pairs``: candidate generation + per-doc vector
#:   compaction moved to staged artifacts (round-6 verdict item 4 —
#:   judge-suggested fix for the pin-inflating sweep swing); values
#:   unchanged (lossless AllPairs filter, same verify math; local oracle
#:   replica green at sf0.01) — re-verify.
#: Round-8: the three round-7 entries (pack_training_sequences,
#: curate_pack_corpus, tfidf_doc_similarity_pairs) re-verified green in
#: CORRECTNESS_r07 and moved back to ``DRIVER_VERIFIED`` (round 7).
#: - Round-8 unpartitioned-window sweep (round-7 verdict item 4): every
#:   ``Window.orderBy`` / ``Window.partitionBy()`` whose frame grows with
#:   users/docs/customers/events was replaced by the range-partitioned
#:   two-phase pattern (``functions.skew.global_row_number`` /
#:   ``global_running_sum`` / ``ntile_from_rn``) plus broadcast 1-row
#:   totals.  Values are bit-identical (row numbers / exact decimal
#:   cumsums / ANSI ntile arithmetic over the same total order; local
#:   oracle replica green at sf0.01 for all eight) but the
#:   implementation-change rule is mechanical — re-verify:
#:   ``user_value_quartiles`` (ntile over per-user totals),
#:   ``conversion_latency_quantiles`` (rank selection over converted
#:   users), ``psi_click_vs_purchase`` (decile edges over the raw click
#:   slice — the one FACT-sized offender), ``join_key_skew_profile``
#:   (|keys|-sized rank selection), ``customer_abc_classes`` (cumulative
#:   revenue share), ``customer_rfm_segments`` (3× ntile),
#:   ``customer_revenue_gini`` (rank weighting), and
#:   ``quantile_normalized_scores`` (score-lattice cumulative window +
#:   source-keyed local ranks → keyed_row_number).
#:   Second pass of the same sweep — KEYED windows whose key has a handful
#:   of values while the frame is the raw fact table (|event_types| /
#:   |langs| / |pixel-buckets| bound parallelism exactly like the packing
#:   tier pre-r7): converted to ``keyed_row_number`` + broadcast counts
#:   (+ ``ntile_from_rn`` for the NTILE forms), and ``m4_downsample_values``
#:   lost its window entirely (struct-MIN/MAX argmin aggregate).  All
#:   oracle-hash-green at sf0.01; mechanically re-queued:
#:   ``median_value_by_event_type``, ``quartiles_by_event_type``,
#:   ``iqr_outlier_events``, ``winsorized_values_by_event_type``,
#:   ``equi_depth_histogram_by_event_type``, ``mad_outlier_events``,
#:   ``quality_deciles_by_lang``, ``m4_downsample_values``.
#: Round-9: all 18 round-8 window-sweep entries re-verified hash-green in
#: CORRECTNESS_r08 and moved to ``DRIVER_VERIFIED`` (round 8).
#: - ``ntile_from_rn`` callers (``user_value_quartiles``,
#:   ``customer_rfm_segments``, ``quality_deciles_by_lang``,
#:   ``equi_depth_histogram_by_event_type``):
#:   the tile arithmetic moved from double division to exact integer
#:   division (ADVICE r8 — unconditional >2^53 equivalence).  Values are
#:   bit-identical for every frame the engine can materialize (local
#:   oracle replica green at sf0.01) but the implementation-change rule
#:   is mechanical — re-verify.
#: - ``user_value_quartiles``: additionally dropped the redundant
#:   distinct-count scan of events (ADVICE r8) — the broadcast total now
#:   comes from the already-computed per-user totals frame.
#: - ``daily_distinct_users_sketch_rollup``: oracle-ized (round-8 verdict
#:   item 5) — the registered output now carries the HLL estimate as a
#:   Spark-computed ``est_within_tol`` bound column the DuckDB twin
#:   asserts TRUE (raw-estimate surface moved to
#:   ``analytics.sketch_rollup_detail`` with its pytest pins); new output
#:   schema, so the r8 rows-only driver row no longer describes it —
#:   re-verify under the now-available hash gate.
#: - ``approx_distinct_users_by_event_type`` /
#:   ``approx_percentiles_by_event_type``: oracle-ized round 9 with the
#:   same bound-column pattern (HLL++ estimate → 3·rsd tolerance boolean;
#:   sketch percentiles → exact-order-statistic brackets + containment
#:   booleans); new output schemas, so their r1 rows-only driver rows no
#:   longer describe them — re-verify under the now-available hash gate.
#: Round-10: all 7 round-9 entries re-verified hash-green in
#: CORRECTNESS_r09 and moved to ``DRIVER_VERIFIED`` (round 9).
#: - ANN family oracle-ization (round-9 verdict item 2): ``ann_lsh_topk``,
#:   ``ann_ivf_topk``, ``ann_pq_topk``, ``ann_ivfpq_topk`` now register the
#:   recall-bound summary (query_id, n_results, n_true,
#:   mean_recall_ge_floor — ``similarity.ann_bound_summary``) instead of
#:   the raw approximate panel (which moved to the ``*_topk_detail``
#:   functions the stage persists), and ``ann_recall_report`` registers
#:   per-method floor booleans (raw numbers moved to
#:   ``ann_recall_report_detail``).  New output schemas, each with a DuckDB
#:   twin — re-verify under the now-available hash gate (local replica
#:   green at sf0.001 and bare sf0.01).
#: - Same pattern for the near-dup LSH screens: ``neardup_minhash_lsh`` /
#:   ``neardup_embedding_lsh`` now register precision/recall bound
#:   summaries vs their staged exact truth tiers (pair outputs moved to
#:   ``minhash_lsh_detail`` / ``embedding_lsh_detail``); new 1-row output
#:   schemas with DuckDB twins — re-verify.
#: - And for the perceptual media triad: ``media_image_neardup_phash`` /
#:   ``media_audio_neardup_fp`` / ``media_video_neardup_phash`` now
#:   register the pair set with the hamming collapsed to its threshold
#:   boolean, hash-checked against the constructed-twin oracle
#:   (``multimodal._MEDIA_TWIN_ORACLE``); exact hamming values stay on the
#:   ``*_detail`` surfaces with their goldens.  New output schemas —
#:   re-verify.
DRIVER_VERIFIED.update(dict.fromkeys((
    # CORRECTNESS_r11.json: 50 hash-green, 0 failures.  All 47
    # CHANGED_SINCE_VERIFIED entries (the range-partition persist
    # family, the r11 per-operator rewrites, and the two r11
    # oracle-izations) re-verified green and move here; the set
    # clears for the round-12 queue below.
    "absorption_purchase_vs_error", "ann_ivf_topk",
    "ann_ivfpq_topk", "ann_lsh_topk",
    "ann_pq_topk", "approx_percentiles_by_event_type",
    "basket_part_pair_lift", "budget_select_by_quality",
    "cdc_chunk_docs", "cms_heavy_hitter_estimates",
    "conversion_latency_quantiles", "coreset_kcenter_sample",
    "corr_value_hour_by_event_type", "curate_pack_corpus",
    "curate_pack_quality_gated", "customer_abc_classes",
    "customer_revenue_gini", "customer_rfm_segments",
    "dedup_simhash", "embedding_top_component",
    "equi_depth_histogram_by_event_type", "events_global_sequence",
    "hybrid_search_rrf", "iqr_outlier_events",
    "join_key_skew_profile", "kmeans_embedding_clusters",
    "length_bucketed_batches", "mad_outlier_events",
    "median_value_by_event_type", "ndcg_tfidf_vs_overlap",
    "neardup_embedding_lsh", "neardup_minhash_lsh",
    "pack_bestfit_efficiency", "pack_training_sequences",
    "packing_efficiency_by_source", "peak_concurrent_sessions",
    "preference_pairs_by_source", "psi_click_vs_purchase",
    "quality_deciles_by_lang", "quality_model_score",
    "quantile_normalized_scores", "quartiles_by_event_type",
    "semantic_dedup_docs", "session_overlap_histogram",
    "session_window_rollup", "source_quota_sample",
    "textrank_keywords", "train_quality_classifier",
    "user_value_quartiles", "winsorized_values_by_event_type",
), 11))

CHANGED_SINCE_VERIFIED: frozenset[str] = frozenset({
    # Round-12 optimization round.
    # - Two-phase range-partition helper family (functions.skew +
    #   operators.events copies): the helpers now EMIT the per-key frame
    #   size / grand total (count_alias / total_alias) from the same tiny
    #   totals frame the offsets use, and their pin runs through
    #   functions.cachectl.query_scoped_persist (release-hook registry;
    #   same persist semantics).  Callers dropped their broadcast
    #   count/total legs — which re-executed the whole upstream subtree
    #   once more per query — and six r11 entity-aggregate persists became
    #   unnecessary (single consumer left).  Values identical by
    #   construction (int64 counts; the same order-free int/decimal total
    #   algebra as the offsets; customer_revenue_gini's n/tot fold into
    #   the final agg is the one double-sum reorder, same arbitrary-order
    #   reduction class as before).  17/17 re-passed the DuckDB oracle at
    #   sf0.01 AND sf0.1 this session; the implementation-change rule is
    #   mechanical, so the whole family re-queues:
    "median_value_by_event_type", "approx_percentiles_by_event_type",
    "corr_value_hour_by_event_type", "quartiles_by_event_type",
    "iqr_outlier_events", "winsorized_values_by_event_type",
    "customer_abc_classes", "join_key_skew_profile",
    "equi_depth_histogram_by_event_type", "mad_outlier_events",
    "customer_rfm_segments", "customer_revenue_gini",
    "session_window_rollup", "peak_concurrent_sessions",
    "conversion_latency_quantiles", "events_global_sequence",
    "user_value_quartiles", "quality_deciles_by_lang",
    "hybrid_search_rrf", "ndcg_tfidf_vs_overlap", "curate_pack_corpus",
    "curate_pack_quality_gated", "packing_efficiency_by_source",
    "length_bucketed_batches", "preference_pairs_by_source",
    "budget_select_by_quality", "source_quota_sample",
    "pack_training_sequences", "quantile_normalized_scores",
    "psi_click_vs_purchase",
    # - trainer: per-partition partials now accumulate across Arrow
    #   batches (one row per partition, the documented invariant); same
    #   arbitrary-order float reduction, rtol 1e-6 test bound, oracle
    #   green at sf0.01 + sf0.1:
    "train_quality_classifier",
    # - kmeans Arrow kernels: empty-batch guards only (no value change);
    #   mechanical re-queue:
    "kmeans_embedding_clusters", "semantic_dedup_docs",
    # - connected-components star rounds: large_star no longer dedups its
    #   output (small_star's min is multiset-invariant and its final
    #   distinct dedups the round) — one fewer shuffle per round, same
    #   fixpoint; CC replica tests + recursive-SQL oracles green:
    "neardup_connected_components", "dedup_keep_best_in_cluster",
    "customer_identity_clusters", "dedup_savings_by_source",
    # - query-scoped persist wrapper (cachectl) replaced bare persist()
    #   in these two (no plan change beyond the registry hook):
    "session_overlap_histogram", "basket_part_pair_lift",
})


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module (side effect: registration) and return
    the registry in verification-priority order.

    External harnesses that sample the registry head-first (e.g. a driver
    that verifies the first N entries per run) should reach queries without
    a current driver CORRECTNESS row before re-confirming verified ones, so
    the order is: (1) never-verified queries and queries changed since
    their green row (``CHANGED_SINCE_VERIFIED``), in module order; (2) the
    verified tier, oldest round first (stalest rows re-confirm first)."""
    from .datapipe import dedup, similarity, textstats, multimodal, normalize, curate, cluster, scrub, bpe, mixture, boilerplate, graphrank, pca, lm, kmeans, trainer, evalmetrics  # noqa: F401
    from .sources import pydatasource  # noqa: F401
    from .operators import (  # noqa: F401
        behavior,
        drift,
        linkage,
        olap,
        merge,
        dq,
        tpch,
        windows,
        enrich,
        rollup,
        topk,
        averages,
        anomaly,
        filters,
        pivot,
        events,
        setops,
        analytics,
        temporal,
    )

    def priority(name: str) -> tuple[int, ...]:
        if name in CHANGED_SINCE_VERIFIED or name not in DRIVER_VERIFIED:
            # Within the unverified tier:
            # 1. CHANGED_SINCE_VERIFIED first — these HAD a green driver row
            #    that the edit invalidated; restoring known-good status beats
            #    first-time coverage (round-2 verdict rule #3).
            # 2. Oracle-backed before rows-only — a driver hash-match row is
            #    the strongest evidence there is, while a rows-only row only
            #    proves execution (which pytest already covers).
            # 3. Older additions before newer ("r4" then "r5" tags), so a
            #    bounded verification window drains oldest-first.  EVERY
            #    post-r3 wave needs its term here, or its queries sort as
            #    age 0 — AHEAD of older unverified work.
            spec = REGISTRY[name]
            age = (
                ("r4" in spec.tags)
                + 2 * ("r5" in spec.tags)
                + 3 * ("r6" in spec.tags)
                + 4 * ("r7" in spec.tags)
                + 5 * ("r8" in spec.tags)
                + 6 * ("r9" in spec.tags)
                + 7 * ("r10" in spec.tags)
                + 8 * ("r11" in spec.tags)
                + 9 * ("r12" in spec.tags)
                + 10 * ("r13" in spec.tags)
            )
            return (0, name not in CHANGED_SINCE_VERIFIED, spec.oracle is None, age)
        return (1, 0, 0, DRIVER_VERIFIED[name])

    ordered = sorted(REGISTRY, key=priority)  # stable: keeps module order within tiers
    return {name: REGISTRY[name] for name in ordered}
