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
_ROTATED_FOR = 16
# Round-16 window: the 41 live entries whose latest driver row is
# round 13 (computed MECHANICALLY from the union of
# CORRECTNESS_r01..r15.json; matches the round-15 verdict's mechanical
# recount AND the round-15 worksheet, both said 41) hit the hard
# staleness bound and take the front.  The 9 fill slots go to r14-cohort
# entries whose code paths this round touches: s30_prob_skyline gets the
# verdict-item-3 solo stage-forensics pass (and a scratch-plane audit of
# its probability kernel), and s34_skycube_4d / s31_thick_skyline /
# x_jpeg_ahash_dedup were the other official-artifact movers in r15's
# elevated bench window — all four re-gate correctness alongside the
# forensics; x_warc_extract / x_archive_extract gate the reader stack
# the ADVICE fixes touch (lz4 finalizer guard in native_codecs.py, the
# below-watermark warning in warc_datasource.py); s29_skyline_layers is
# the remaining iterative entry from the verdict's expensive-plan audit
# (shares the broadcast anti-join peel with the skyline family);
# s35_stream_cdc_watermark re-gates the late-r15 watermark-seeded-from-
# recovered-batch-END review fix; and x_audio_features re-gates the
# audio container path adjudicated by the round-16 shared-library
# rescan (verdict item 5).
_DRIVER_PRIORITY = [
    # stale: last driver row round 13, at the bound for round 16
    "e1_dedup_exact", "e2_knn_bruteforce", "e3_text_stats",
    "r10_percentiles", "r11_asof_join", "r12_range_join",
    "r13_regional_revenue", "r14_subquery_avg", "r20_recursive_cte",
    "r21_unpivot_measures", "r3_window_running", "r4_semi_anti_join",
    "r7_json_extract", "r9_sessionize", "s10_snapshot_10000",
    "s14_stream_dedup", "s15_stream_join", "s18_stream_upsert",
    "s1_skyline_2d", "s20_stream_dedup_watermark", "s24_dynamic_skyline",
    "s27_reverse_skyline", "s2_skyline_maxdir", "s3_skyline_3d",
    "s4_skyline_4d", "s5_skyline_part", "s6_skyline_events_ts",
    "s7_skyline_filtered", "s8_skyline_groupwise", "x_ann_ivf",
    "x_bigram_lm_score", "x_bm25_topk", "x_cdc_dedup",
    "x_corpus_shuffle", "x_dedup_sweep", "x_knn_int8_rerank",
    "x_minhash_lsh_pairs", "x_semantic_dedup", "x_simhash_pairs",
    "x_triangle_count", "x_url_dedup",
    # fills: code paths this round touches (see header comment)
    "s30_prob_skyline", "s34_skycube_4d", "s31_thick_skyline",
    "x_jpeg_ahash_dedup", "x_warc_extract", "x_archive_extract",
    "s29_skyline_layers", "s35_stream_cdc_watermark", "x_audio_features",
]
# Round-17 rotation worksheet (write it BEFORE touching the list):
# * MUST take the front at round 17: every entry whose latest driver
#   row is round 14 and which sits outside this round-16 window —
#   compute mechanically from CORRECTNESS_r0*.json once the round-16
#   artifact lands.  At round-16 start: 49 round-14 rows, minus the 9
#   round-14 fills above (s30_prob_skyline / s34_skycube_4d /
#   s31_thick_skyline / x_jpeg_ahash_dedup / x_warc_extract /
#   x_archive_extract / s29_skyline_layers / s35_stream_cdc_watermark /
#   x_audio_features) = 40 round-17 must-gates, leaving 10 fill slots.
#   Plus any round-16 registration that misses the round-16 window.
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
