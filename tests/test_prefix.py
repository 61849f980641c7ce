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
    # the only single-partition exchanges allowed are the tiny offsets
    # aggregate (feeds the sum(count) cumsum window) — never the data
    import re

    singles = [
        seg
        for seg in plan.split("Exchange SinglePartition")[1:]
        if not re.search(r"HashAggregate|sum\(count", seg[:800])
    ]
    assert not singles, f"SinglePartition exchange over data:\n{singles[0][:400]}"


def test_exact_prefix_constant_leading_column(spark):
    """A globally-constant leading sort column must fall through to the
    next column for bucketing — and the rank window must still partition
    by bucket, not collapse to a single task."""
    df = spark.range(0, 5000).select(
        F.lit(7).alias("const"), F.col("id"), (F.col("id") % 100).alias("v")
    )
    got = exact_prefix(df, ["const", "id"], 250)
    assert sorted(r.id for r in got.collect()) == list(range(250))
    plan = (
        exact_prefix(df, ["const", "id"], 250)
        ._jdf.queryExecution().executedPlan().toString()
    )
    for line in plan.splitlines():
        if "row_number()" in line:
            assert "__b" in line, f"rank window not bucket-partitioned: {line}"


def test_exact_prefix_nullable_leading_column_not_constant(spark):
    """A leading column with NULLs plus exactly ONE distinct non-null value
    must NOT be treated as globally constant (count_distinct ignores NULLs,
    but NULLs sort first): the prefix must still return the NULL-keyed rows
    first, in id order."""
    df = spark.range(0, 2000).select(
        F.when(F.col("id") % 7 == 0, F.lit(None)).otherwise(F.lit(3)).alias("lead"),
        F.col("id"),
    )
    got = [r.id for r in exact_prefix(df, ["lead", "id"], 300).collect()]
    # NULLS FIRST: the 286 multiples of 7 (interleaved through the id
    # range, so id-bucketing would misorder them), then ids 1, 2, ...
    nulls_first = [i for i in range(2000) if i % 7 == 0]
    rest = [i for i in range(2000) if i % 7 != 0]
    assert sorted(got) == sorted((nulls_first + rest)[:300])


def test_with_global_rank_matches_window(spark):
    from query_skyline_qos_flink_spark.operators.prefix import with_global_rank

    li = load(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    cols = ["l_extendedprice", "l_orderkey", "l_linenumber"]
    got = {
        tuple(r)[:3]: r.rn
        for r in with_global_rank(li, cols, "rn").collect()
    }
    w = Window.orderBy(*cols)
    want = {
        tuple(r)[:3]: r.rn
        for r in li.withColumn("rn", F.row_number().over(w)).collect()
    }
    # ties on all three sort cols make ranks within a tie-group arbitrary;
    # compare the key set and the rank multiset, not per-row assignments
    assert len(got) == len(want)
    assert sorted(got.values()) == sorted(want.values())


def test_ntile_fewer_rows_than_tiles(spark):
    from query_skyline_qos_flink_spark.operators.prefix import ntile_by_rank

    df = spark.range(1, 4).select(F.col("id"))  # 3 rows, 10 tiles
    got = sorted(
        (r.id, r.tile) for r in ntile_by_rank(df, ["id"], 10, "tile").collect()
    )
    # ntile degenerates to rank when N < n_tiles (matches SQL ntile)
    assert got == [(1, 1), (2, 2), (3, 3)]


def test_rows_at_global_ranks_matches_window(spark):
    from query_skyline_qos_flink_spark.operators.prefix import rows_at_global_ranks

    li = load(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    cols = ["l_extendedprice", "l_orderkey", "l_linenumber"]
    w = Window.orderBy(*cols)
    full = li.withColumn("rn", F.row_number().over(w))
    n = li.count()
    ranks = [1, 2, n // 2, n - 1, n]
    picked, total = rows_at_global_ranks(li, cols, lambda t: ranks)
    assert total == n
    got = {r.rn: r.l_extendedprice for r in picked.collect()}
    want = {
        r.rn: r.l_extendedprice
        for r in full.where(F.col("rn").isin(ranks)).collect()
    }
    # ties on the full sort key make WHICH row holds a rank arbitrary, but
    # l_extendedprice (the leading sort col) at each rank is deterministic
    assert got == want


def test_rows_at_global_ranks_out_of_range_and_dupes(spark):
    from query_skyline_qos_flink_spark.operators.prefix import rows_at_global_ranks

    df = spark.range(1, 101).select(F.col("id"))
    picked, total = rows_at_global_ranks(df, ["id"], lambda t: [0, 5, 5, t, t + 7])
    assert total == 100
    assert sorted((r.id, r.rn) for r in picked.collect()) == [(5, 5), (100, 100)]
    # no valid rank at all -> empty frame, total still exact
    none, total2 = rows_at_global_ranks(df, ["id"], lambda t: [0, t + 1])
    assert total2 == 100 and none.count() == 0


def test_rows_at_global_ranks_prunes_buckets(spark):
    """The point of rank SELECTION: non-target buckets are filtered out
    map-side (a literal __b IN (...) predicate BELOW the exchange), so the
    window shuffles ~k/B of the rows, not all of them."""
    from query_skyline_qos_flink_spark.operators.prefix import rows_at_global_ranks

    df = spark.range(0, 50000).select(F.col("id"))
    picked, total = rows_at_global_ranks(df, ["id"], lambda t: [1, (t + 1) // 2])
    plan = picked._jdf.queryExecution().executedPlan().toString()
    below_exchange = plan.split("Exchange hashpartitioning")[-1]
    # two target ranks in two distinct buckets -> a literal RANGE predicate
    # on the raw bucket column, evaluated before the shuffle (codegen-able
    # comparisons that can also push into parquet row-group stats — NOT a
    # filter on the derived B-term bucket id, which is too large for
    # whole-stage codegen and would evaluate interpreted on every row)
    assert "Filter" in below_exchange and ">=" in below_exchange and (
        "<" in below_exchange
    ), "no range bucket-prune filter below the exchange:\n" + below_exchange[:600]
    # the bucket id itself is rebuilt from the same ranges on the filtered
    # rows only: a CASE over the few targets, never the full B-term sum
    assert below_exchange.count("CASE WHEN") <= 2, below_exchange[:600]
    rows = picked.collect()
    assert sorted(r.id for r in rows) == [0, (total + 1) // 2 - 1]
