"""Bucketed-table write/read: exchange-free co-located joins and
aggregations, with row parity against the plain shuffled plan.
"""

from __future__ import annotations

import pytest

from query_skyline_qos_flink_spark.sources.bucketed import read_bucketed, write_bucketed

SF = "/root/testdata/sf0.001"


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    o = spark.read.parquet(f"{SF}/orders.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    write_bucketed(o, "b_orders", ["o_orderkey"], 8,
                   path=str(base / "orders"), sort_by=["o_orderkey"])
    write_bucketed(li, "b_lineitem", ["l_orderkey"], 8,
                   path=str(base / "lineitem"), sort_by=["l_orderkey"])
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    to, tl = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = read_bucketed(spark, to)
        li = read_bucketed(spark, tl)
        joined = li.join(o, li.l_orderkey == o.o_orderkey).select(
            "l_orderkey", "l_extendedprice", "o_orderstatus"
        )
        plan = _plan(joined)
        # both sides expose the bucket spec as a satisfied hash
        # distribution: the whole point of paying the shuffle at write time
        assert "Exchange" not in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    to, tl = bucketed_tables
    o_plain = spark.read.parquet(f"{SF}/orders.parquet")
    li_plain = spark.read.parquet(f"{SF}/lineitem.parquet")
    want = (
        li_plain.join(o_plain, li_plain.l_orderkey == o_plain.o_orderkey)
        .groupBy("o_orderstatus")
        .count()
    )
    got = (
        read_bucketed(spark, tl)
        .join(read_bucketed(spark, to),
              read_bucketed(spark, tl).l_orderkey == read_bucketed(spark, to).o_orderkey)
        .groupBy("o_orderstatus")
        .count()
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_bucketed_groupby_on_key_has_no_exchange(spark, bucketed_tables):
    _, tl = bucketed_tables
    agg = read_bucketed(spark, tl).groupBy("l_orderkey").count()
    assert "Exchange" not in _plan(agg)


def test_write_bucketed_rejects_bad_bucket_count(spark):
    df = spark.range(10)
    with pytest.raises(ValueError):
        write_bucketed(df, "b_bad", ["id"], 0)
