"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``query_skyline_qos_flink_spark``; the query
corpus (SURVEY.md §2.4 + LLM-pipeline extensions) is the registry in
``query_skyline_qos_flink_spark/plans/``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from query_skyline_qos_flink_spark.plans import corpus  # noqa: E402
from query_skyline_qos_flink_spark.plans import pipeline  # noqa: E402, F401  (registers)
from query_skyline_qos_flink_spark.plans import relational  # noqa: E402, F401  (registers)
from query_skyline_qos_flink_spark.plans import streaming_replay  # noqa: E402, F401  (registers)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: S1 2-D skyline of lineitem at sf0.001."""
    return corpus.REGISTRY["s1_skyline_2d"].fn(spark, "/root/testdata/sf0.001")


# The driver's correctness gate covers the first 50 entries of queries().
# ALL registered queries are equally real (pytest runs the DuckDB oracle
# for every one at sf0.001; QUERIES.md carries the generated count); this
# priority list rotates which 50 get a driver-side CORRECTNESS row.
#
# _ROTATED_FOR records which round this window was planned for; the
# rotation test validates the window against the CORRECTNESS artifacts
# that existed when the rotation was made (rounds < _ROTATED_FOR), so the
# suite stays green after the driver appends this round's artifact.
# Rotate (and bump the marker) as the FIRST commit of each round.
_ROTATED_FOR = 8
# Round-8 window: the 16 round-5-gated entries that sat out round 7 at
# the staleness bound take the front, then the 17 round-7 newborns
# (judge-verified at sf0.01 last session, driver row still owed), then
# 17 round-6-gated fills (2-stale at round 8; the remaining 33 last=6
# entries front-load round 9's window — see the worksheet below).
# New round-8 registrations swap into the fill slots as they land.
_DRIVER_PRIORITY = [
    # stale: last driver row round 5, skipped round 7 at the bound
    "x_fuzzy_match", "x_zorder_stats", "x_triangle_count", "x_clean_text",
    "x_domain_stats", "x_winnow_pairs", "r5_rollup_counts",
    "r15_grouping_sets", "r16_lag_delta", "r17_pivot_priority",
    "r18_ntile_deciles", "r19_range_frame", "s12_stream_replay_3d",
    "s16_stream_session", "s17_stream_static_dedup",
    "s19_stream_interval_join",
    # never driver-gated round-7 newborns
    "s30_prob_skyline", "s31_thick_skyline", "s32_stream_cdc_dedup",
    "s33_grouped_skyband", "m2_strategy_stats", "r22_topn_per_group",
    "r23_salted_skew_join", "r24_event_funnel", "r25_cohort_retention",
    "x_bpe_pair_counts", "x_pmi_pairs", "x_embed_centroids",
    "x_embed_gram", "x_cdc_dedup", "x_dup_cluster_sizes",
    "x_quantiles_interp", "x_char_entropy",
    # round-6-gated fills (2-stale at round 8)
    "r1_agg_pricing_summary", "r2_join_topk_revenue", "r6_orders_by_year",
    "r8_setops_nations", "s21_stream_scrub", "x_token_stats", "x_langid",
    "x_minhash_lsh_pairs", "x_simhash_pairs", "x_ann_ivf",
    "x_datapipe_prep", "x_tfidf_topterms", "x_pii_scrub", "x_seq_packing",
    # round-8 newborns (swapped into fill slots as they landed)
    "s34_skycube_4d", "s35_stream_cdc_watermark", "x_semantic_dedup",
]
# Round-9 rotation worksheet (write it BEFORE touching the list):
# * MUST take the front at round 9: the 33 round-6-gated entries NOT in
#   the round-8 window (they hit the hard staleness bound at round 9):
#   x_text_quality, x_fingerprint, x_dedup_normalized, x_jaccard_pairs,
#   x_cosine_neardup, x_ann_bucketed, x_ann_multiprobe, x_ann_blocked,
#   x_multimodal_meta, x_ngram_topk, x_embed_quantize8, x_knn_int8,
#   x_multimodal_frames, x_repetition, x_pattern_counts,
#   x_train_test_split, x_dedup_clusters, x_hll_distinct,
#   x_profile_columns, x_sample_stratified, x_bloom_prune_semi,
#   x_snapshot_diff, x_doc_chunks, x_contamination, x_heavy_hitters,
#   x_blocklist_filter, x_image_ahash_dedup, x_audio_features,
#   x_image_neardup_pairs, x_span_dedup, x_weighted_mix,
#   x_gif_frame_colors (+ any of the 33 retired/renamed since).
# * Plus any round-8 registrations that missed the round-8 window.
# * Fill remaining slots with round-7-gated entries (2-stale at round 9).
# tests/test_rotation_window.py arbitrates all of this mechanically.


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    ordered = {n: corpus.REGISTRY[n].fn for n in _DRIVER_PRIORITY}
    for name, spec in corpus.REGISTRY.items():
        ordered.setdefault(name, spec.fn)
    return ordered


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in corpus.REGISTRY.items() if spec.oracle is not None
    }
