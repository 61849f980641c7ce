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
_ROTATED_FOR = 12
# Round-12 window: the 41 entries whose latest driver row is round 9
# (computed MECHANICALLY from the union of CORRECTNESS_r01..r11.json;
# matches the round-11 verdict's own mechanical count) hit the hard
# staleness bound and take the front.  The 9 fill slots split two ways:
# 4 go to entries whose plans or results this round touches —
# x_image_ahash_dedup / x_image_neardup_pairs carry the new lossy-WebP
# fixtures through the shared decode plumbing, m2_strategy_stats gets
# the persist-lifetime fix (verdict item 4), and x_seq_packing re-gates
# after its regression A/B (verdict item 3) — and 5 go to the round-10
# skyline-family entries that ride the chunked-merge code path whose
# chunk-id derivation is being made recompute-deterministic this round
# (ADVICE item 1): s22/s23/s28/s29 (s24_dynamic_skyline was swapped out
# mid-round for x_audio_features when the FLAC fixture class changed its
# results).  Pulling those 4 forward flattens round 13's must-gate load
# from 49 (every round-10 row would hit the bound at once) to 45,
# leaving 5 fill slots next round.
_DRIVER_PRIORITY = [
    # stale: last driver row round 9, skipped rounds 10-11 at the bound
    "r26_integrity_checks", "s11_stream_replay", "s13_stream_window",
    "x_ann_blocked", "x_ann_multiprobe", "x_ann_recall", "x_bfs_hops",
    "x_blocklist_filter", "x_bloom_prune_semi", "x_bpe_apply",
    "x_bpe_train_k", "x_contamination", "x_coreness", "x_cosine_neardup",
    "x_dedup_normalized", "x_doc_chunks",
    "x_embed_quantize8", "x_exact_quantiles", "x_gif_frame_colors",
    "x_heavy_hitters", "x_histogram", "x_hll_distinct", "x_kmeans_iter",
    "x_kmv_distinct", "x_labelprop", "x_lsh_recall",
    "x_multimodal_meta", "x_ngram_topk",
    "x_pagerank", "x_pattern_counts", "x_profile_columns",
    "x_quality_filter", "x_repetition", "x_sample_stratified",
    "x_snapshot_diff", "x_span_dedup", "x_text_quality",
    "x_train_test_split", "x_weighted_mix",
    # fills: plans/results this round touches (see worksheet above);
    # x_audio_features swapped in mid-round for s24_dynamic_skyline when
    # the FLAC fixture class changed its payload rotation (% 3 -> % 4);
    # s36_stream_metrics (newborn, verdict item 6: oracle-gated O15-O19
    # metrics record) took x_dedup_clusters's slot when that exact-Jaccard
    # stage twin was retired to tests/test_exact_anchors.py mid-round
    "x_image_ahash_dedup", "x_image_neardup_pairs", "m2_strategy_stats",
    "x_seq_packing", "x_audio_features", "s36_stream_metrics",
    # newborn x_warc_extract took x_multimodal_frames's slot when that
    # plumbing twin was retired (see the retire() call in plans/pipeline)
    "x_warc_extract",
    # fills: round-10 skyline family on the chunk-id code path, pulled
    # forward to flatten round 13's must-gate load
    "s22_skyband", "s23_top_dominating",
    "s28_kdominant_skyline", "s29_skyline_layers",
]
# Round-13 rotation worksheet (write it BEFORE touching the list):
# * MUST take the front at round 13: every entry whose latest driver
#   row is round 10 and which sits outside this round-12 window —
#   compute mechanically from CORRECTNESS_r0*.json once the round-12
#   artifact lands (at round-12 planning time: 49 round-10 rows minus
#   the 4 round-10 fills above = 45, incl. s24_dynamic_skyline, which
#   was displaced mid-round by x_audio_features), plus any round-12
#   registration that missed the round-12 window (none as of the
#   round-12 session end: the only newborn, s36_stream_metrics, sits in
#   this window via the slot freed by retiring x_dedup_clusters).
# * Round-12 mid-round changes a round-13 rotation must know about:
#   x_dedup_clusters is RETIRED (anchor-gated, no staleness obligation);
#   x_multimodal_meta's fixture is now the 5-class container rotation
#   (mp3/ogg/wav/mp4/webm, key_mod 2100) — any future payload-class
#   change re-rotates its results, so pull it into the window in the
#   same round as any such change.
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
