"""Pytest-only oracle gates for correctness-anchor twins retired from the
query registry.

The driver-gate rotation bounds the registry at WINDOW x (staleness + 1)
= 150 entries (tests/test_rotation_window.py), so all-pairs reference
twins — correctness anchors a user of the engine would never run — yield
their registry slots to real queries and keep their oracle gate HERE
instead.  Retired in round 8: x_cosine_neardup_exact (registered rounds
5-7, driver-green r6).
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

from verify_oracle import table_hash  # noqa: E402

from query_skyline_qos_flink_spark.operators import similarity  # noqa: E402
from query_skyline_qos_flink_spark.plans import pipeline  # noqa: E402
from query_skyline_qos_flink_spark.session import load  # noqa: E402

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'"
    )
    return c


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
