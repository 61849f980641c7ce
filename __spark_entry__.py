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
# Round-6 window: the 37 queries with no round-5 driver row (the x_*
# LLM-pipeline family plus r1/r2/r6/r8) are front-loaded so every registry
# entry is driver-verified at current code within two rounds, then the 7
# round-6 additions, then 6 always-on core skyline queries (37 + 7 + 6 =
# 50).
# Thirteen core variants (s9_dim/grid/angle, s10_1000, s10_10000, e1,
# e2, e3, s2, s4, s5, s7, s8) sit out exactly one round — each was
# hash-green in round 5 and close siblings stay in-window (s1, s3,
# x_token_stats, the x_dedup family for e1; m1 exercises the s9
# partitioners; x_exact_quantiles the s10 prefix machinery); their slots
# go to the nine round-6 additions (x_pii_scrub, x_blocklist_filter,
# x_image_ahash_dedup, x_image_neardup_pairs, x_audio_features,
# x_span_dedup, x_weighted_mix, s21_stream_scrub, x_gif_frame_colors),
# which have never had a driver row.
# tests/test_rotation_window.py enforces the <=2-round staleness bound.
_DRIVER_PRIORITY = [
    # no driver row in round 5 — x_* pipeline family, gated r1-r3 last
    "x_token_stats", "x_text_quality", "x_langid", "x_fingerprint",
    "x_dedup_normalized", "x_jaccard_pairs", "x_minhash_lsh_pairs",
    "x_simhash_pairs", "x_cosine_neardup", "x_cosine_neardup_exact",
    "x_ann_bucketed", "x_ann_multiprobe", "x_ann_blocked",
    "x_multimodal_meta", "x_datapipe_prep", "x_ngram_topk", "x_ann_ivf",
    "x_multimodal_frames", "x_repetition", "x_pattern_counts",
    "x_train_test_split", "x_dedup_clusters", "x_kmv_distinct",
    "x_profile_columns", "x_sample_stratified", "x_bloom_prune_semi",
    "x_snapshot_diff", "x_seq_packing", "x_histogram", "x_doc_chunks",
    "x_contamination", "x_tfidf_topterms", "x_heavy_hitters",
    # relational base queries last gated in rounds 1-3
    "r1_agg_pricing_summary", "r2_join_topk_revenue", "r6_orders_by_year",
    "r8_setops_nations",
    # round-6 additions, no driver row yet
    "x_pii_scrub", "x_blocklist_filter", "x_image_ahash_dedup",
    "x_image_neardup_pairs", "x_audio_features", "x_span_dedup",
    "x_weighted_mix", "s21_stream_scrub", "x_gif_frame_colors",
    # late round-6 additions, no driver row yet — these take the four
    # core-corpus slots (s1/s3/s6/m1 were all hash-green in round 5, so
    # under the <=2-round staleness bound they sit out exactly this round
    # and rotate back in round 7; entry() still smoke-runs s1 every round)
    "x_quality_filter", "x_embed_quantize8", "x_knn_int8", "x_hll_distinct",
]
# Queries registered after the window filled (50 must-gate entries: 37
# stale rotations + 13 never-gated) wait exactly one round for their
# first driver row — front-load them in round 7: x_jpeg_ahash_dedup,
# x_url_dedup, x_dedup_sweep, x_knn_int8_rerank, x_corpus_shuffle,
# x_bm25_topk, r21_unpivot_measures, s22-s29 (skyband, top-dominating,
# dynamic/reverse/k-dominant skyline, streaming skyband, skycube,
# skyline layers).
# tests/test_rotation_window.py enforces both the staleness bound and
# that no window slot idles while a never-gated entry waits.


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    ordered = {n: corpus.REGISTRY[n].fn for n in _DRIVER_PRIORITY}
    for name, spec in corpus.REGISTRY.items():
        ordered.setdefault(name, spec.fn)
    return ordered


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in corpus.REGISTRY.items() if spec.oracle is not None
    }
