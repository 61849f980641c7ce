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
# Round-7 window: the 16 never-driver-gated late round-6 additions
# (s22-s29 skyline family, s25 streaming skyband, the retrieval /
# dedup-tooling x_* five, r21) take the front, then 34 of the 50 queries
# last gated in round 5 — the full declared core corpus (s1-s10, m1,
# e1-e3), x_exact_quantiles (its prefix machinery is being re-profiled
# this round), ten relational and six streaming representatives.  The 16
# remaining round-5-gated queries (x_fuzzy_match .. s19, listed below)
# sit out exactly this round at the <=2-round staleness bound and MUST
# front-load round 8's window.
# tests/test_rotation_window.py enforces the staleness bound and that no
# window slot idles while a never-gated entry waits.
_DRIVER_PRIORITY = [
    # never driver-gated (registered late in round 6; judge-verified at
    # sf0.01 in the round-6 session, but a driver row is still owed)
    "s22_skyband", "s23_top_dominating", "s24_dynamic_skyline",
    "s25_stream_skyband", "s26_skycube", "s27_reverse_skyline",
    "s28_kdominant_skyline", "s29_skyline_layers",
    "x_bm25_topk", "x_bigram_lm_score", "x_corpus_shuffle",
    "x_url_dedup", "x_dedup_sweep", "x_knn_int8_rerank",
    "x_jpeg_ahash_dedup", "r21_unpivot_measures",
    # declared core corpus, last gated round 5 (at the staleness bound)
    "s1_skyline_2d", "s2_skyline_maxdir", "s3_skyline_3d",
    "s4_skyline_4d", "s5_skyline_part", "s6_skyline_events_ts",
    "s7_skyline_filtered", "s8_skyline_groupwise", "s9_twophase_dim",
    "s9_twophase_grid", "s9_twophase_angle", "s10_snapshot_1000",
    "s10_snapshot_10000", "m1_partition_stats", "e1_dedup_exact",
    "e2_knn_bruteforce", "e3_text_stats",
    # round-5-gated, touched or load-bearing this round
    "x_exact_quantiles",
    # round-5-gated relational representatives
    "r3_window_running", "r4_semi_anti_join", "r7_json_extract",
    "r9_sessionize", "r10_percentiles", "r11_asof_join", "r12_range_join",
    "r13_regional_revenue", "r14_subquery_avg", "r20_recursive_cte",
    # round-5-gated streaming representatives
    "s11_stream_replay", "s13_stream_window", "s14_stream_dedup",
    "s15_stream_join", "s18_stream_upsert", "s20_stream_dedup_watermark",
]
# Round-8 rotation worksheet (write it BEFORE touching the list):
# * STALE at round 8 (last driver row r5, skipped r7 at the bound) —
#   these 16 MUST take the front: x_fuzzy_match, x_zorder_stats,
#   x_triangle_count, x_clean_text, x_domain_stats, x_winnow_pairs,
#   r5_rollup_counts, r15_grouping_sets, r16_lag_delta,
#   r17_pivot_priority, r18_ntile_deciles, r19_range_frame,
#   s12_stream_replay_3d, s16_stream_session, s17_stream_static_dedup,
#   s19_stream_interval_join.
# * NEVER-GATED round-7 newborns (judge-verified via verify_oracle this
#   session, driver row still owed) — next 16: s30_prob_skyline,
#   s31_thick_skyline, s32_stream_cdc_dedup, s33_grouped_skyband,
#   m2_strategy_stats, r22_topn_per_group, r23_salted_skew_join,
#   x_bpe_pair_counts, x_pmi_pairs, x_embed_centroids, x_embed_gram,
#   x_cdc_dedup, x_dup_cluster_sizes, x_quantiles_interp,
#   x_char_entropy, x_bigram_lm_score... (x_bigram already gated r7 —
#   exclude; count the actual newborn set from CORRECTNESS_r07 at
#   rotation time).
# * Fill the remaining ~18 slots with round-6-gated entries (last=6,
#   2-stale at round 8) — they hit the hard bound at round 9 otherwise.
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
