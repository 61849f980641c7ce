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
_ROTATED_FOR = 15
# Round-15 window: the 43 live entries whose latest driver row is
# round 12 (computed MECHANICALLY from the union of
# CORRECTNESS_r01..r14.json; matches the round-14 verdict's mechanical
# recount AND the round-14 worksheet, both said 43) hit the hard
# staleness bound and take the front.  The 7 fill slots go to entries
# whose code paths this round touches: x_multimodal_meta gates the new
# HEIF/AVIF still-image fixture class (verdict item 5); the three
# s9_twophase_* variants plus m1_partition_stats re-gate the
# persist-lifecycle A/B of the s9_twophase_dim mover (item 3 — they
# share the phase-1 persist double-use the round-14 MRU refresh
# changed); x_dedup_clusters_lsh re-gates the checkpoint_rotate
# storage-release path (caching.py:108, same file as item 3); and
# s37_stream_warc_tail (registered mid-round per item 4, displacing the
# x_cdc_dedup placeholder back to its r13 cohort — the round-13
# pattern) gates the round-14 streaming-DataSource tail path end to
# end.  Five of the seven fills are r13-cohort, flattening the
# round-16 must-gate load (see worksheet below).
_DRIVER_PRIORITY = [
    # stale: last driver row round 12, at the bound for round 15
    "m2_strategy_stats", "r26_integrity_checks", "s11_stream_replay",
    "s13_stream_window", "s36_stream_metrics", "x_ann_blocked",
    "x_ann_multiprobe", "x_ann_recall", "x_bfs_hops",
    "x_blocklist_filter", "x_bloom_prune_semi", "x_bpe_apply",
    "x_bpe_train_k", "x_contamination", "x_coreness",
    "x_cosine_neardup", "x_dedup_normalized", "x_doc_chunks",
    "x_embed_quantize8", "x_exact_quantiles", "x_gif_frame_colors",
    "x_heavy_hitters", "x_histogram", "x_hll_distinct",
    "x_image_ahash_dedup", "x_image_neardup_pairs", "x_kmeans_iter",
    "x_kmv_distinct", "x_labelprop", "x_lsh_recall",
    "x_ngram_topk", "x_pagerank", "x_pattern_counts",
    "x_profile_columns", "x_quality_filter", "x_repetition",
    "x_sample_stratified", "x_seq_packing", "x_snapshot_diff",
    "x_span_dedup", "x_text_quality", "x_train_test_split",
    "x_weighted_mix",
    # fills: code paths this round touches (see header comment)
    "x_multimodal_meta", "s9_twophase_dim", "s9_twophase_grid",
    "s9_twophase_angle", "m1_partition_stats", "x_dedup_clusters_lsh",
    "s37_stream_warc_tail",
]
# Round-16 rotation worksheet (write it BEFORE touching the list):
# * MUST take the front at round 16: every entry whose latest driver
#   row is round 13 and which sits outside this round-15 window —
#   compute mechanically from CORRECTNESS_r0*.json once the round-15
#   artifact lands.  At round-15 end: 47 round-13 rows, minus the 5
#   round-13 fills above (s9_twophase_dim / s9_twophase_grid /
#   s9_twophase_angle / m1_partition_stats / x_dedup_clusters_lsh),
#   minus s26_skycube (r13-cohort, retired this round) = 41 round-16
#   must-gates — x_cdc_dedup (displaced placeholder) is among them.
#   Plus any round-15 registration that misses the round-15 window
#   (none: s37_stream_warc_tail is in the window above).
# * Round-15 mid-round changes already applied to the list above:
#   s37_stream_warc_tail registered (displacing the x_cdc_dedup
#   placeholder back to its r13 cohort) and s26_skycube retired to an
#   exact anchor (subsumed by s34_skycube_4d).  Registry stays at
#   exactly 140.
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
