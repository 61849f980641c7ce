"""Pytest-only oracle gates for correctness-anchor twins retired from the
query registry.

The driver-gate rotation bounds the registry at WINDOW x (staleness + 1)
= 150 entries (tests/test_rotation_window.py), so entries whose oracle
shape is subsumed by another gated query — stage twins, N-twins, coarse
stages a gated end-to-end query replays, all-pairs reference twins —
yield their registry slots and keep their oracle gate HERE instead.
Every ``corpus.RETIRED_ANCHORS`` entry gets the SAME compare the driver
ran while it was registered: row count, schema, and the
order-insensitive value hash over the Arrow-fetched oracle result
(mirroring tools/verify_oracle.py, including the HUGEINT/decimal export
artifact the driver's hash sees).

Retired in round 8: x_cosine_neardup_exact (all-pairs cosine twin,
registered rounds 5-7).  Retired in round 10: s10_snapshot_1000,
x_fingerprint, x_jaccard_pairs, x_ann_bucketed, x_knn_int8,
x_bpe_pair_counts, x_dup_cluster_sizes.  Retired in round 12:
x_dedup_clusters (exact-Jaccard stage twin of x_dedup_clusters_lsh;
slot freed for s36_stream_metrics) and x_multimodal_frames (fake-digest
plumbing twin of x_gif_frame_colors' real frame fan-out; slot freed for
x_warc_extract) — each retire() call in
plans/ records which gated query subsumes it.  Retired in round 13:
x_quantiles_interp (method twin of x_exact_quantiles over the same
rows_at_global_ranks assembly; slot freed for x_archive_extract).
Retired in round 15: s26_skycube (dimensional twin of s34_skycube_4d —
same skycube lattice-reuse operator and labeled-subspace oracle at d=3
of s34's d=4 dim set; slot freed for s37_stream_warc_tail).
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
)

from verify_oracle import TABLES, table_hash  # noqa: E402

from query_skyline_qos_flink_spark.operators import similarity  # noqa: E402
from query_skyline_qos_flink_spark.plans import corpus, pipeline  # noqa: E402
from query_skyline_qos_flink_spark.session import load  # noqa: E402

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF, f"{t}.parquet")
        if os.path.exists(path):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return c


def test_retired_anchor_population():
    """The retired set is exactly the adjudicated list — a retire() call
    on a fresh name must be a conscious decision recorded here, and a
    registration that shadows a retired name must fail loudly."""
    assert sorted(corpus.RETIRED_ANCHORS) == [
        "s10_snapshot_1000",
        "s26_skycube",
        "x_ann_bucketed",
        "x_bpe_pair_counts",
        "x_dedup_clusters",
        "x_dup_cluster_sizes",
        "x_fingerprint",
        "x_jaccard_pairs",
        "x_knn_int8",
        "x_multimodal_frames",
        "x_quantiles_interp",
    ]
    overlap = set(corpus.RETIRED_ANCHORS) & set(corpus.REGISTRY)
    assert not overlap, f"names both retired and registered: {overlap}"


@pytest.mark.parametrize("name", sorted(corpus.RETIRED_ANCHORS))
def test_retired_anchor_matches_oracle(spark, con, name):
    spec = corpus.RETIRED_ANCHORS[name]
    sdf = spec.fn(spark, SF)
    srows = [tuple(r) for r in sdf.collect()]
    otbl = con.execute(spec.oracle).arrow()
    ocols = list(otbl.column_names)
    orows = [tuple(r) for r in otbl.to_pandas().itertuples(index=False, name=None)]
    assert len(srows) == len(orows)
    assert sorted(sdf.columns) == sorted(ocols)
    assert table_hash(sdf.columns, srows) == table_hash(ocols, orows)


def test_cosine_pairs_exact_matches_allpairs_oracle(spark, con):
    """similarity.cosine_pairs (the cross-join reference twin of the
    registered x_cosine_neardup scale path) == the all-pairs SQL oracle:
    row count, schema, order-insensitive value hash — the same compare
    the driver gate ran while this was a registered query."""
    sdf = similarity.cosine_pairs(load(spark, SF, "embeddings"), threshold=0.4)
    srows = [tuple(r) for r in sdf.collect()]
    cur = con.execute(pipeline.COSINE_EXACT_ANCHOR_ORACLE)
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    assert len(srows) == len(orows)
    assert sorted(sdf.columns) == sorted(ocols)
    assert table_hash(sdf.columns, srows) == table_hash(ocols, orows)
