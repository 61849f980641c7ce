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
_ROTATED_FOR = 17
# Round-17 window: the 40 live entries whose latest driver row is
# round 14 (computed MECHANICALLY from the union of
# CORRECTNESS_r01..r16.json; matches the round-16 worksheet's predicted
# "40 round-17 must-gates") hit the hard staleness bound and take the
# front.  The 10 fill slots go to round-15-cohort entries whose code
# paths this optimization round touches (VERDICT r16 "Next round" items):
# x_bloom_prune_semi re-gates the one-pass (word, bits) bitmap build
# (item 5); x_pagerank / x_labelprop / x_bfs_hops / x_coreness re-gate
# graph.py after the fold-convergence-into-the-iteration treatment
# (item 8); m1_partition_stats / m2_strategy_stats / x_seq_packing /
# x_profile_columns / x_hll_distinct re-gate the cross-cutting py4j
# expression-batching tranche (item 1) on its heaviest build paths.
# Taking all 10 fills from the round-15 cohort also keeps round 18
# satisfiable: 50 round-15 rows minus these 10 = 40 round-18 must-gates.
_DRIVER_PRIORITY = [
    # stale: last driver row round 14, at the bound for round 17
    "r15_grouping_sets", "r16_lag_delta", "r17_pivot_priority",
    "r18_ntile_deciles", "r19_range_frame", "r1_agg_pricing_summary",
    "r22_topn_per_group", "r23_salted_skew_join", "r24_event_funnel",
    "r25_cohort_retention", "r2_join_topk_revenue", "r5_rollup_counts",
    "r6_orders_by_year", "r8_setops_nations", "s12_stream_replay_3d",
    "s16_stream_session", "s17_stream_static_dedup",
    "s19_stream_interval_join", "s21_stream_scrub", "s22_skyband",
    "s23_top_dominating", "s25_stream_skyband", "s28_kdominant_skyline",
    "s32_stream_cdc_dedup", "s33_grouped_skyband", "x_char_entropy",
    "x_clean_text", "x_datapipe_prep", "x_domain_stats",
    "x_embed_centroids", "x_embed_gram", "x_fuzzy_match",
    "x_image_resize", "x_langid", "x_pii_scrub", "x_pmi_pairs",
    "x_tfidf_topterms", "x_token_stats", "x_winnow_pairs",
    "x_zorder_stats",
    # fills: round-15 cohort, code paths this round touches (see header)
    "x_bloom_prune_semi", "x_pagerank", "x_labelprop", "x_bfs_hops",
    "x_coreness", "m1_partition_stats", "m2_strategy_stats",
    "x_seq_packing", "x_profile_columns", "x_hll_distinct",
]
# Round-18 rotation worksheet (write it BEFORE touching the list):
# * MUST take the front at round 18: every entry whose latest driver
#   row is round 15 and which sits outside this round-17 window —
#   compute mechanically from CORRECTNESS_r0*.json once the round-17
#   artifact lands.  At round-17 start: 50 round-15 rows, minus the 10
#   round-15 fills above = 40 round-18 must-gates, leaving 10 fill
#   slots.  Plus any round-17 registration that misses this window.
# * Registry headroom: retire anchor twins (tests/test_exact_anchors.py
#   pattern) BEFORE registering; test_rotation_capacity_for_next_round
#   is the governor.
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
