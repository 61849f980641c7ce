"""KMV distinct sketch: accuracy envelope, exact small-group path,
partition-layout determinism, and merge associativity.
"""

from __future__ import annotations

import pytest

from pyspark.sql import Window, functions as F

from query_skyline_qos_flink_spark.operators.sketches import kmv_distinct

SF = "/root/testdata/sf0.001"


def test_kmv_estimate_within_error_envelope(spark):
    # k=64 -> relative error ~ 1/sqrt(62) ~ 13%; assert a 3-sigma-ish bound
    df = spark.range(20_000).selectExpr("'g' AS g", "id % 5000 AS v")
    row = kmv_distinct(df, ["g"], "v", k=64).collect()[0]
    assert row["n_sketch"] == 64
    assert abs(row["est_distinct"] - 5000) / 5000 < 0.4


def test_kmv_small_group_is_exact(spark):
    df = spark.range(1000).selectExpr("id % 3 AS g", "id % 10 AS v")
    rows = {r["g"]: r for r in kmv_distinct(df, ["g"], "v", k=64).collect()}
    # gcd(3, 10) = 1, so every group cycles through all 10 v values
    for g in range(3):
        assert rows[g]["n_sketch"] == 10
        assert rows[g]["est_distinct"] == 10


def test_kmv_is_partition_layout_independent(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    a = kmv_distinct(li, ["l_returnflag"], "l_partkey").collect()
    b = kmv_distinct(li.repartition(7), ["l_returnflag"], "l_partkey").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_kmv_merge_associativity(spark):
    # "union the kept hashes, re-take the k smallest" must equal the sketch
    # of the union — the property that makes per-segment sketches
    # rollup-able without touching raw data
    k = 16
    df = spark.range(8_000).selectExpr("'g' AS g", "id % 900 AS v")
    half1 = df.where("id % 2 = 0")
    half2 = df.where("id % 2 = 1")
    direct = kmv_distinct(df, ["g"], "v", k=k).collect()[0]

    def kept_hashes(part):
        h = (
            F.conv(F.substring(F.md5(F.col("v").cast("string")), 1, 14), 16, 10)
            .cast("bigint")
            .alias("h")
        )
        dh = part.select("g", h).distinct()
        w = Window.partitionBy("g").orderBy("h")
        return dh.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)

    merged = (
        kept_hashes(half1)
        .select("g", "h")
        .union(kept_hashes(half2).select("g", "h"))
        .distinct()
        .orderBy("h")
        .limit(k)
        .agg(F.count(F.lit(1)).alias("n"), F.max("h").alias("kth"))
        .collect()[0]
    )
    assert merged["n"] == direct["n_sketch"]
    assert merged["kth"] == direct["kth_hash"]


def test_kmv_rejects_bad_k(spark):
    df = spark.range(10).selectExpr("'g' AS g", "id AS v")
    with pytest.raises(ValueError):
        kmv_distinct(df, ["g"], "v", k=1)
    with pytest.raises(ValueError):
        kmv_distinct(df, ["g"], "v", k=500)
