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


def test_heavy_hitters_exact_matches_groupby_under_tiny_cap(spark):
    """Adversarial for the MG guarantee: k=5 counters, 12 distinct values,
    skewed frequencies, data spread over many partitions. The output must
    equal the exact groupBy-count HAVING filter regardless of how the
    sketch pass compressed candidates."""
    import pandas as pd
    from pyspark.sql import functions as F

    from query_skyline_qos_flink_spark.operators import sketches

    vals = (
        ["alpha"] * 400 + ["beta"] * 150 + ["gamma"] * 90
        + [f"tail{i % 9}" for i in range(360)]  # 9 tail values x 40
    )
    df = spark.createDataFrame(
        pd.DataFrame({"v": vals})
    ).repartition(16)  # force many partial sketches
    out = sketches.heavy_hitters_exact(df, "v", k=5)
    got = {(r.v, r.cnt) for r in out.collect()}
    n = len(vals)
    exact = (
        df.groupBy("v").agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") * 5 > n)
    )
    want = {(r.v, r.cnt) for r in exact.collect()}
    assert got == want and ("alpha", 400) in got


def test_fuzzy_match_blocks_and_bounds(spark):
    """'red widget'~'red wodget' (dist 1, same block) matches; 'red bolt'
    is a different block even though close to nothing; identical names
    collapse in the dictionary so no self-pairs appear."""
    import pandas as pd

    from query_skyline_qos_flink_spark.operators import dedup

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "p_name": [
                    "red widget",
                    "red widget",   # duplicate row -> one dictionary entry
                    "rad widget",   # typo in the modifier: same block, dist 1
                    "blue widget",
                    "red wodget",   # typo in the BLOCK token: documented miss
                    "red bolt",
                ]
            }
        )
    )
    out = dedup.fuzzy_match_names(df, "p_name", max_dist=3)
    pairs = {(r.name_a, r.name_b, r.dist) for r in out.collect()}
    assert ("rad widget", "red widget", 1) in pairs
    # 'blue'->'red' is 4 edits: same block but over the distance bound
    assert not any("blue" in a for a, b, _ in pairs)
    assert all(a != b for a, b, _ in pairs)
    # cross-block typo and different-noun names never pair: recall tradeoff
    assert not any("wodget" in a or "wodget" in b for a, b, _ in pairs)
    assert not any("bolt" in a or "bolt" in b for a, b, _ in pairs)


def test_hll_union_matches_direct_sketch(spark):
    """Merging per-group sketches must estimate like one direct global
    sketch (same lgK): the roll-up contract that makes persisted
    per-segment sketches trustworthy."""
    from pyspark.sql import functions as F

    df = spark.range(0, 5000).select(
        (F.col("id") % 4).alias("g"), (F.col("id") % 1777).alias("v")
    )
    merged = (
        df.groupBy("g")
        .agg(F.hll_sketch_agg("v", F.lit(12)).alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk", F.lit(True))).alias("est"))
        .collect()[0]["est"]
    )
    direct = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("v", F.lit(12))).alias("est")
    ).collect()[0]["est"]
    assert merged == direct
