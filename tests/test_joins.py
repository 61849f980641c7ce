"""asof_join / range_join_binned operator semantics + plan shape.

The reference has no as-of or range join (its joins are the Flink keyed
connect in FlinkSkyline.java:84-185); these are §"beyond the reference"
pipeline operators, so the contracts under test are the docstring ones:
backward-inclusive as-of semantics with a deterministic tie rule, and
exact BETWEEN range semantics with no cartesian in the plan.
"""

from __future__ import annotations

from query_skyline_qos_flink_spark.operators.joins import asof_join, range_join_binned


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_asof_join_backward_inclusive(spark):
    left = spark.createDataFrame(
        [("a", 5, "l1"), ("a", 10, "l2"), ("a", 20, "l3"), ("b", 7, "l4")],
        "k string, t long, lbl string",
    )
    right = spark.createDataFrame(
        [("a", 5, 50), ("a", 15, 150), ("b", 9, 900)],
        "k string, rt long, v long",
    )
    out = asof_join(left, right, on=["k"], left_time="t", right_time="rt",
                    value_cols=["rt", "v"])
    # t=5 matches rt=5 (inclusive <=); t=10 still rt=5; t=20 -> rt=15;
    # b@7 precedes b's first right row -> NULLs
    assert _rows(out, "k", "lbl", "rt", "v") == [
        ("a", "l1", 5, 50),
        ("a", "l2", 5, 50),
        ("a", "l3", 15, 150),
        ("b", "l4", None, None),
    ]
    inner = asof_join(left, right, on=["k"], left_time="t", right_time="rt",
                      value_cols=["v"], how="inner")
    assert inner.count() == 3


def test_asof_join_right_tiebreak(spark):
    left = spark.createDataFrame([("a", 10)], "k string, t long")
    right = spark.createDataFrame(
        [("a", 10, 1, 100), ("a", 10, 3, 300), ("a", 10, 2, 200)],
        "k string, rt long, seq long, v long",
    )
    out = asof_join(left, right, on=["k"], left_time="t", right_time="rt",
                    value_cols=["seq", "v"], right_tiebreak=["seq"])
    # largest tiebreak tuple wins among same-(key, time) right rows
    assert _rows(out, "seq", "v") == [(3, 300)]


def test_asof_join_plan_has_no_join_operator(spark):
    left = spark.range(100).selectExpr("id % 7 AS k", "id AS t")
    right = spark.range(50).selectExpr("id % 7 AS k", "id * 2 AS rt", "id AS v")
    plan = _plan(asof_join(left, right, on=["k"], left_time="t",
                           right_time="rt", value_cols=["v"]))
    # the whole point: carry-forward window, not a join — no join node of
    # any kind and in particular nothing cartesian
    for node in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                 "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert node not in plan, node


def test_asof_join_rejects_colliding_value_cols(spark):
    df = spark.range(3).selectExpr("id AS k", "id AS t", "id AS v")
    try:
        asof_join(df, df.selectExpr("k", "t AS rt", "v"), on=["k"],
                  left_time="t", right_time="rt", value_cols=["v"])
    except ValueError as e:
        assert "collide" in str(e)
    else:
        raise AssertionError("expected ValueError")


def test_range_join_binned_exact_boundaries(spark):
    left = spark.createDataFrame([(1, 100)], "lid long, lt long")
    right = spark.createDataFrame(
        [(89, 1), (90, 2), (100, 3), (110, 4), (111, 5)], "rt long, rv long"
    )
    out = range_join_binned(left, right, "lt", "rt", lo=-10, hi=10)
    # [90, 110] inclusive on both ends; 89 and 111 excluded
    assert _rows(out, "rv") == [(2,), (3,), (4,)]


def test_range_join_binned_matches_each_pair_once_across_bins(spark):
    # right rows straddling a bin boundary must surface exactly once even
    # though the left row probes two bins
    left = spark.range(200).selectExpr("id AS lid", "id * 3 AS lt")
    right = spark.range(300).selectExpr("id AS rid", "id * 2 AS rt")
    out = range_join_binned(left, right, "lt", "rt", lo=-7, hi=5)
    got = _rows(out, "lid", "rid")
    want = sorted(
        (lid, rid)
        for lid in range(200)
        for rid in range(300)
        if lid * 3 - 7 <= rid * 2 <= lid * 3 + 5
    )
    assert got == want
    assert len(got) == len(set(got))  # no duplicate pairs from multi-probe


def test_range_join_binned_plan_is_cartesian_free(spark):
    left = spark.range(100).selectExpr("id AS lid", "id * 5 AS lt")
    right = spark.range(100).selectExpr("id AS rid", "id * 4 AS rt")
    plan = _plan(range_join_binned(left, right, "lt", "rt", lo=-20, hi=20))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
