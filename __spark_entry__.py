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
_ROTATED_FOR = 13
# Round-13 window: the 45 entries whose latest driver row is round 10
# (computed MECHANICALLY from the union of CORRECTNESS_r01..r12.json;
# matches the round-12 verdict's own mechanical count and the round-12
# worksheet below) hit the hard staleness bound and take the front.
# The 5 fill slots go to entries whose plans or results this round
# touches or re-adjudicates: x_warc_extract carries the new bounded
# .warc.gz inflate guard (ADVICE item 1) through its code path,
# x_multimodal_meta's mp3 class rides the ID3v1-trim retry fix
# (ADVICE item 2), x_ann_ivf re-gates after its fresh-session A/B
# probe (verdict item 4; x_minhash_lsh_pairs, the other mover, is
# already in the must-gate front), newborn x_archive_extract holds the
# slot originally planned for x_token_stats (see the fill-slot note in
# the list), and x_simhash_pairs is pulled forward from the round-11
# cohort — with x_quantiles_interp retired, the round-14 must-gate
# load flattens from 45 to 42 (the worksheet below is authoritative).
_DRIVER_PRIORITY = [
    # stale: last driver row round 10, at the bound for round 13
    "e1_dedup_exact", "e2_knn_bruteforce", "e3_text_stats",
    "m1_partition_stats", "r10_percentiles", "r11_asof_join",
    "r12_range_join", "r13_regional_revenue", "r14_subquery_avg",
    "r20_recursive_cte", "r21_unpivot_measures", "r3_window_running",
    "r4_semi_anti_join", "r7_json_extract", "r9_sessionize",
    "s10_snapshot_10000", "s14_stream_dedup", "s15_stream_join",
    "s18_stream_upsert", "s1_skyline_2d", "s20_stream_dedup_watermark",
    "s24_dynamic_skyline", "s26_skycube", "s27_reverse_skyline",
    "s2_skyline_maxdir", "s3_skyline_3d", "s4_skyline_4d",
    "s5_skyline_part", "s6_skyline_events_ts", "s7_skyline_filtered",
    "s8_skyline_groupwise", "s9_twophase_angle", "s9_twophase_dim",
    "s9_twophase_grid", "x_bigram_lm_score", "x_bm25_topk",
    "x_cdc_dedup", "x_corpus_shuffle", "x_dedup_clusters_lsh",
    "x_dedup_sweep", "x_knn_int8_rerank", "x_minhash_lsh_pairs",
    "x_semantic_dedup", "x_triangle_count", "x_url_dedup",
    # fills: plans/results this round touches (see header comment);
    # newborn x_archive_extract (gated zip64 + pax/GNU long-name fixture
    # rotation, verdict items 2-3) took x_token_stats's slot mid-round —
    # x_token_stats returns to its round-11 staleness cohort, offset by
    # x_quantiles_interp retiring to the anchor set in the same commit
    "x_warc_extract", "x_multimodal_meta", "x_ann_ivf",
    "x_archive_extract", "x_simhash_pairs",
]
# Round-14 rotation worksheet (write it BEFORE touching the list):
# * MUST take the front at round 14: every entry whose latest driver
#   row is round 11 and which sits outside this round-13 window —
#   compute mechanically from CORRECTNESS_r0*.json once the round-13
#   artifact lands (at round-13 session end: 45 round-11 rows minus
#   the 2 round-11 fills above, x_ann_ivf and x_simhash_pairs, minus
#   x_quantiles_interp which retired to the anchor set = 42), plus any
#   round-13 registration that missed the round-13 window (none as of
#   session end: the only newborn, x_archive_extract, sits in the
#   window via the swap below).
# * Round-13 mid-round changes a round-14 rotation must know about:
#   newborn x_archive_extract took x_token_stats's fill slot (so
#   x_token_stats is back in the round-11 staleness cohort counted
#   above); x_quantiles_interp is RETIRED (anchor-gated, no staleness
#   obligation).
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
