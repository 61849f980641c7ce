"""t1 smoke + t2-style oracle parity for the declared corpus at sf0.001.

Mirrors the driver's compare (row count, schema, order-insensitive value
hash) via tools/verify_oracle helpers.  The heavier sf0.01 pass is run by
the driver; `python tools/verify_oracle.py` reproduces it locally.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from verify_oracle import TABLES, table_hash  # noqa: E402

from query_skyline_qos_flink_spark.plans import corpus  # noqa: E402
from query_skyline_qos_flink_spark.plans import (  # noqa: E402, F401
    pipeline,
    relational,
    streaming_replay,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF, f"{t}.parquet")
        if os.path.exists(path):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return c


@pytest.mark.parametrize("name", sorted(corpus.REGISTRY))
def test_query_matches_oracle(spark, con, name):
    spec = corpus.REGISTRY[name]
    sdf = spec.fn(spark, SF)
    # Universal anti-pattern sweep, piggybacked where every registered
    # query is already built: a shuffled cartesian over data is never the
    # intended shape anywhere in the corpus (1-row scalar assemblies
    # compile to BroadcastNestedLoopJoin, which specific plan tests pin
    # per query).  tests/test_plans.py's completeness ratchet records
    # which queries additionally carry a query-specific shape pin.
    assert "CartesianProduct" not in sdf._jdf.queryExecution().executedPlan().toString()
    srows = [tuple(r) for r in sdf.collect()]
    if spec.oracle is None:
        assert srows is not None  # rows-only smoke
        return
    cur = con.execute(spec.oracle)
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    assert len(srows) == len(orows), f"row count {len(srows)} != {len(orows)}"
    assert sorted(sdf.columns) == sorted(ocols)
    assert table_hash(sdf.columns, srows) == table_hash(ocols, orows)
