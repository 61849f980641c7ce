"""Bloom-filter join pruning: exactness, no-false-negative property, and
the plan shape (broadcast bitmap joins; no probe-side exchange before the
pruning filter)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from query_skyline_qos_flink_spark.operators import bloom


def _frames(spark):
    probe = spark.createDataFrame(
        pd.DataFrame({"k": list(range(1000)), "v": list(range(1000))})
    )
    build = spark.createDataFrame(pd.DataFrame({"bk": [3, 14, 159, 265, 358, 979]}))
    return probe, build


def test_bloom_semi_equals_plain_semi(spark):
    probe, build = _frames(spark)
    got = bloom.bloom_semi_join(probe, build, "k", "bk").toPandas()
    want = probe.join(
        build.select(F.col("bk").alias("k")), "k", "left_semi"
    ).toPandas()
    assert sorted(got.k) == sorted(want.k)
    assert list(got.columns) == ["k", "v"]


def test_bloom_prune_superset_never_drops_matches(spark):
    """False positives allowed, false negatives impossible — even with a
    deliberately tiny, collision-heavy bitmap."""
    probe, build = _frames(spark)
    tables = bloom.bloom_build(build, "bk", n_hashes=2, m_bits=64)
    pruned = set(bloom.bloom_prune(probe, "k", tables, m_bits=64).toPandas().k)
    true_keys = {3, 14, 159, 265, 358, 979}
    assert true_keys <= pruned  # every real match survives
    assert len(pruned) < 1000  # and the filter still prunes something


def test_bloom_prune_plan_broadcasts_and_prunes(spark):
    probe, build = _frames(spark)
    tables = bloom.bloom_build(build, "bk", n_hashes=3)
    pruned = bloom.bloom_prune(probe, "k", tables)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 3
    # the probe side reaches the filter without any exchange of its own:
    # the only exchanges in the plan feed the broadcast bitmap builds
    assert "Exchange hashpartitioning" not in plan.split("BroadcastHashJoin")[0]
    # bitmap really is bounded: <= m_bits/64 rows per table
    assert tables[0].count() <= (1 << 20) // 64
