"""exact_prefix: rank-free ORDER BY ... LIMIT N equivalence."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from query_skyline_qos_flink_spark.operators.prefix import exact_prefix
from query_skyline_qos_flink_spark.session import load

from conftest import SF_SMOKE


def _naive_prefix(df, sort_cols, n):
    w = Window.orderBy(*sort_cols)
    return df.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= n).drop("rn")


def test_exact_prefix_matches_global_window(spark):
    # sort over the full projection: (l_orderkey, l_linenumber) is NOT
    # unique in the fixtures, so a shorter sort would be tie-ambiguous
    cols = ["l_orderkey", "l_linenumber", "l_extendedprice"]
    li = load(spark, SF_SMOKE, "lineitem").select(*cols)
    for n in (1, 17, 1000):
        got = sorted(exact_prefix(li, cols, n).collect(), key=lambda r: tuple(r))
        want = sorted(_naive_prefix(li, cols, n).collect(), key=lambda r: tuple(r))
        assert got == want, f"n={n}: {len(got)} vs {len(want)} rows"


def test_exact_prefix_n_exceeds_table(spark):
    li = load(spark, SF_SMOKE, "region")
    total = li.count()
    assert exact_prefix(li, ["r_regionkey"], total + 100).count() == total


def test_exact_prefix_rank_window_is_bucket_partitioned(spark):
    """The row_number window over the DATA must partition by the range
    bucket (parallel), never run with an empty partition spec (single
    task).  The only empty-spec window allowed is the per-bucket offset
    cumsum, which computes sum("count") over ~#buckets rows."""
    li = load(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_linenumber")
    plan = (
        exact_prefix(li, ["l_orderkey", "l_linenumber"], 100)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for line in plan.splitlines():
        if "row_number()" in line:
            assert "__b" in line, f"data rank window not bucket-partitioned: {line}"
        if "windowspecdefinition()" in line.replace(" ", ""):
            assert "sum(count" in line, f"empty-spec window over data: {line}"
