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
_ROTATED_FOR = 14
# Round-14 window: the 42 live entries whose latest driver row is
# round 11 (computed MECHANICALLY from the union of
# CORRECTNESS_r01..r13.json; matches both the round-13 verdict's
# mechanical recount and the round-13 worksheet) hit the hard
# staleness bound and take the front.  The 8 fill slots go to entries
# whose code paths this round touches: x_archive_extract gates the
# new .tar.zst envelope class (libzstd ctypes bridge, verdict item 2)
# plus the ADVICE tar-prefix/zip64 fixes, x_warc_extract gates the new
# brotli content-encoding class (%3 → %4 framing rotation, verdict
# item 3) plus the per-file-yield memory fix (item 4),
# x_multimodal_meta's mp3 class and x_audio_features ride the ID3v1
# trim-retry reorder (ADVICE item 4), and four round-12-cohort skyline
# queries (s22/s23/s28/s29) re-gate any skyline-path mitigation from
# the anti_3d bimodality root-cause (item 5) while flattening the
# round-15 must-gate load from 48 to 43 (48 round-12 rows minus the
# 5 round-12 fills below — matches the worksheet).
_DRIVER_PRIORITY = [
    # stale: last driver row round 11, at the bound for round 14
    "r15_grouping_sets", "r16_lag_delta", "r17_pivot_priority",
    "r18_ntile_deciles", "r19_range_frame", "r1_agg_pricing_summary",
    "r22_topn_per_group", "r23_salted_skew_join", "r24_event_funnel",
    "r25_cohort_retention", "r2_join_topk_revenue", "r5_rollup_counts",
    "r6_orders_by_year", "r8_setops_nations", "s12_stream_replay_3d",
    "s16_stream_session", "s17_stream_static_dedup",
    "s19_stream_interval_join", "s21_stream_scrub", "s25_stream_skyband",
    "s30_prob_skyline", "s31_thick_skyline", "s32_stream_cdc_dedup",
    "s33_grouped_skyband", "s34_skycube_4d", "s35_stream_cdc_watermark",
    "x_char_entropy", "x_clean_text", "x_datapipe_prep",
    "x_domain_stats", "x_embed_centroids", "x_embed_gram",
    "x_fuzzy_match", "x_image_resize", "x_jpeg_ahash_dedup",
    "x_langid", "x_pii_scrub", "x_pmi_pairs",
    "x_tfidf_topterms", "x_token_stats", "x_winnow_pairs",
    "x_zorder_stats",
    # fills: code paths this round touches (see header comment)
    "x_archive_extract", "x_warc_extract", "x_multimodal_meta",
    "x_audio_features", "s22_skyband", "s23_top_dominating",
    "s28_kdominant_skyline", "s29_skyline_layers",
]
# Round-15 rotation worksheet (write it BEFORE touching the list):
# * MUST take the front at round 15: every entry whose latest driver
#   row is round 12 and which sits outside this round-14 window —
#   compute mechanically from CORRECTNESS_r0*.json once the round-14
#   artifact lands (at round-14 rotation time: 48 round-12 rows minus
#   the 5 round-12 fills above, x_audio_features / s22_skyband /
#   s23_top_dominating / s28_kdominant_skyline / s29_skyline_layers,
#   = 43), plus any round-14 registration that misses the round-14
#   window.
# * Round-14 mid-round changes a round-15 rotation must know about:
#   NONE — no registrations, no retires, no fill-slot swaps (registry
#   stays at exactly 140).  The round's new codec/packaging classes
#   (tar.zst/tar.lz4/zip-method-93 in x_archive_extract; br-CE,
#   combined TE+CE, and .warc.zst files in x_warc_extract) ride
#   EXISTING gated queries, so the staleness math is unchanged.
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
