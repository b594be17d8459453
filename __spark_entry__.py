"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``data_ingestion_system_spark``; every operator
registers itself in ``registry.REGISTRY`` with both the Spark builder and
the DuckDB oracle SQL (SURVEY.md §5 differential-testing strategy).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from data_ingestion_system_spark.registry import load_all  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The A1 grouped multi-agg (`v_app_stats` shape, reference
    src/database/schema.sql:236-249) over orders ⋈ customer ⋈ nation.
    """
    registry = load_all()
    return registry["app_stats"].spark(spark, SMOKE_SF_DIR)


# The driver verifies the FIRST 50 catalog entries per round (registration
# order).  Rounds 1-4 accumulated 199 green driver rows (0 red ever).
# Round-5 window: the 9 staged backlog queries land first (after this
# round EVERY SQL-checkable catalog query has a driver row), then the
# round-5 hierarchical SemDeDup twin, then the re-verification rotation
# (oldest greens first: r03 → r02 → r04).  Queries new in a round are
# staged at position 51+ unless window capacity is spare.  The full
# catalog keeps its pytest oracle gate regardless
# (tests/test_oracle_parity.py parametrizes ALL registered queries).
_DRIVER_PRIORITY = (
    # ---- ROUND-5 DRIVER WINDOW (first 50) ----
    # 1-9: the staged backlog — the 7 r3-economics spill-overs plus the
    # two r4 streaming batch twins (VERDICT r4 ask #1: clear the
    # driver-verification backlog for good)
    "segment_priority_mix",
    "customer_spend_gini",
    "brand_basket_lift",
    "lorenz_spend_deciles",
    "abc_brand_classification",
    "order_size_distribution",
    "repeat_purchase_interval",
    "incremental_daily_view",
    "reservoir_sample",
    # 10: new in round 5 — the hierarchical SemDeDup scale twin, landed
    # inside this round's window (well within spare capacity)
    "semantic_dedup_hier",
    # 11-50: re-verification rotation — r03-green queries take the
    # remaining slots (oldest greens re-verify first)
    "range_join_events",
    "source_drift_metrics",
    "multires_rollup",
    "tfidf_top_terms",
    "vocab_zipf_stats",
    "label_centroid_confusion",
    "token_cooccurrence",
    "kmeans_cluster_profile",
    "equi_depth_buckets",
    "heavy_hitters",
    "equi_depth_buckets_approx",
    "orphan_labels",
    "orphan_check_matrix",
    "invalid_rows_profile",
    "validated_events",
    "schema_evolution_read",
    "bigram_lm_scores",
    "bpe_pair_counts",
    "mixture_weights",
    "pii_redaction",
    "pack_training_sequences",
    "boilerplate_chunks",
    "time_travel_snapshot",
    "semantic_dedup",
    "quality_classifier_scores",
    "token_kl_drift",
    "hybrid_rrf_search",
    "winsorized_stats",
    "grouped_percentiles_sketch_refine",
    "robust_outlier_profile",
    "ann_filtered_topk",
    "vocab_coverage",
    "contrastive_pairs",
    "psi_drift",
    "nb_weak_label_confusion",
    "cluster_aware_split_stats",
    "unpivot_metrics",
    "funnel_conversion",
    "cohort_retention",
    "mixture_epoch_sample",
    # ---- positions 51+ (r6 window: new-in-r5 first, then rotation) ----
    # new in round 5 (late): the BLAS escape-hatch twin of the
    # hierarchical SemDeDup pair term (applyInPandas dgemm per fine
    # cell) — shares semantic_dedup_hier's oracle, staged per
    # CONVENTIONS.md §1
    "semantic_dedup_blas",
    "cross_source_dup_matrix",
    "classifier_calibration",
    "gap_islands",
    "sliding_rate_limit",
    "substring_dup_profile",
    "duplicated_spans_topk",
    "kfold_balance",
    "krippendorff_alpha",
    "classifier_pr_thresholds",
    "corpus_data_card",
    "ref_v_app_stats",
    "ref_v_reviews_sentiment",
    "ref_v_daily_stats",
    "ref_v_labeled_reviews",
    "majority_vote",
    "cohens_kappa",
    "labeled_export_join",
    "dedup_exact_stats",
    "dedup_exact_keepers",
    "near_dup_minhash_lsh",
    "near_dup_ngram_jaccard",
    "near_dup_simhash",
    "near_dup_embedding_cosine",
    "ann_topk_bruteforce",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "inverted_index_search",
    "token_counts",
    "language_id_confusion",
    "quality_scores",
    "doc_fingerprints",
    "multimodal_payload_stats",
    "multimodal_features",
    "asof_join_events",
    "sessionization",
    "cube_counts",
    "pivot_matrix",
    "rollup_daily",
    "month_frequency",
    "dow_hour_profile",
    "json_props_extract",
    "json_report_roundtrip",
    "anomaly_flags",
    "backfill_missing_days",
    "approx_percentiles",
    "approx_distinct_users",
    "exact_percentiles_sketch_refine",
    "near_dup_simhash_multiblock",
    "weighted_sample",
    "clean_documents",
    "ann_pq_topk",
    "ann_pq_rerank_topk",
    "ann_ivfpq_topk",
    "dedup_clusters",
    "bm25_search",
    "repetition_quality",
    "contamination_overlap",
    "doc_chunks",
    "corpus_prep_pipeline",
    "examples_per_group",
    # r4-green queries rotate to the back (verified most recently)
    "dp_daily_counts",
    "mmr_diverse_topk",
    "bpe_merge_table",
    "funnel_within_window",
    "common_event_paths",
    "token_budget_selection",
    "confident_joint_matrix",
    "fold_leakage_audit",
    "daily_trend_slopes",
    "cusum_changepoint",
    "dedup_threshold_sweep",
    "join_key_skew_profile",
    "fuzzy_linkage_pairs",
    "linkage_block_profile",
    "scd2_user_segments",
    "scd2_churn_profile",
    "chi2_lang_source",
    "metric_correlation_matrix",
    "ewma_daily_volume",
    "cdc_apply_state",
    "cdc_apply_audit",
    "ks_test_click_purchase",
    "mann_whitney_u",
    "weighted_median_by_flag",
    "grouping_sets_profile",
    "lang_listagg_by_source",
    "seasonal_anomaly_flags",
    "rolling_wau",
    "rank_function_profile",
    "keep_rate_wilson",
    "join_cardinality_profile",
    "event_transition_matrix",
    "interarrival_burstiness",
    "histogram_2d",
    "user_entropy_profile",
    "neyman_allocation",
    "vocab_chao1_estimate",
    "source_vocab_jaccard",
    "minhash_estimation_error",
    "session_bounce_stats",
    "readability_by_source",
    "revenue_rollup_nation_year",
    "linkage_entities",
    "daily_growth_rates",
    "new_user_share",
    "funnel_time_to_convert",
    "brand_revenue_share",
    "supplier_concentration_hhi",
    "shipping_delay_profile",
    "customer_rfm_segments",
)


def _ordered_specs():
    registry = load_all()
    front = [registry[n] for n in _DRIVER_PRIORITY if n in registry]
    rest = [s for n, s in registry.items() if n not in _DRIVER_PRIORITY]
    return front + rest


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, driver-priority
    first (see _DRIVER_PRIORITY)."""
    return {spec.name: spec.spark for spec in _ordered_specs()}


def oracle_sql() -> dict[str, str]:
    """Equivalent DuckDB SQL per query; omitted for non-SQL-expressible ops
    (seeded-random sampling internals, streaming state) → rows-only check."""
    return {spec.name: spec.oracle for spec in _ordered_specs() if spec.oracle is not None}
