"""Distinct-count sketches — KMV (k minimum values).

The reference engine has no sketches (its only aggregates are the O18
partition metrics, FlinkSkyline.java:590-608); at 100 TB, exact
``count(DISTINCT x)`` per group is often the single most expensive
aggregate in a stats pass (full shuffle of every distinct value).  KMV
is the classic mergeable estimator: hash every value uniformly, keep the
k smallest DISTINCT hashes per group, and estimate

    n_distinct  ≈  (k - 1) / normalized_kth_smallest_hash

(Bar-Yossef et al. 2002; relative error ~ 1/sqrt(k-2)).

Determinism is the design constraint here: the hash is a 56-bit md5
prefix (portable — duckdb computes the identical integer from the same
hex), the estimate is a single integer floor-division, and groups with
fewer than k distinct hashes return their exact count — so the whole
estimator is bit-reproducible across engines and partition layouts,
unlike HLL implementations whose register layouts differ per engine.

Scale shape: DISTINCT (group, hash) is one shuffle with map-side partial
dedup; the per-group k-smallest filter is a rank window whose sort Spark
starts map-side.  The state that crosses the wire is distinct hashes —
same as exact countDistinct — but the OUTPUT per group is k numbers, so
sketches for billions of groups stay tiny and two sketches merge by
"union hashes, re-take k smallest" (associative), which is what makes
this the right building block for rollups over precomputed per-segment
sketches.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F

# 2^56: the hash domain. 56 bits keep (k-1) * DOMAIN inside int64 for
# k <= 128 and survive duckdb's BIGINT hex cast without HUGEINT.
_HASH_DOMAIN = 1 << 56


def kmv_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group KMV distinct-count estimate for ``value_col``.

    Returns one row per group: ``n_sketch`` (hashes kept, = min(k,
    distinct)), ``kth_hash`` (largest kept hash), and ``est_distinct``
    (exact count when the group has < k distinct hashes, else
    ``(k-1) * 2^56 div kth_hash``).
    """
    if not 2 <= k <= 128:
        raise ValueError(f"k must be in [2, 128], got {k}")
    group_cols = list(group_cols)
    h = (
        F.conv(F.substring(F.md5(F.col(value_col).cast("string")), 1, 14), 16, 10)
        .cast("bigint")
        .alias("__h")
    )
    dh = df.select(*group_cols, h).distinct()
    w = Window.partitionBy(*group_cols).orderBy("__h")
    kept = dh.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") <= k)
    return (
        kept.groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias("n_sketch"), F.max("__h").alias("kth_hash"))
        .withColumn(
            "est_distinct",
            F.when(F.col("n_sketch") < k, F.col("n_sketch")).otherwise(
                F.expr(f"{(k - 1) * _HASH_DOMAIN}L div kth_hash")
            ),
        )
    )


def kmv_oracle_sql(
    table_sql: str,
    group_col: str,
    value_col: str,
    k: int = 64,
) -> str:
    """The duckdb twin of :func:`kmv_distinct` (same md5 prefix, same
    integer estimate), for oracle-gated registrations."""
    return f"""
WITH h AS (SELECT DISTINCT {group_col} AS g,
                  CAST(('0x' || substr(md5(CAST({value_col} AS VARCHAR)), 1, 14)) AS BIGINT) AS h
           FROM ({table_sql})),
r AS (SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn FROM h)
SELECT g AS {group_col},
       CAST(count(*) AS BIGINT) AS n_sketch,
       max(h) AS kth_hash,
       CAST(CASE WHEN count(*) < {k} THEN count(*)
                 ELSE {(k - 1) * _HASH_DOMAIN} // max(h) END AS BIGINT) AS est_distinct
FROM r WHERE rn <= {k} GROUP BY g
""".strip()


def heavy_hitters_exact(
    df: DataFrame,
    value_col: str,
    k: int = 200,
) -> DataFrame:
    """EXACT heavy hitters (items with frequency strictly > n/k) via a
    Misra-Gries candidate pass + exact recount.

    Why not a plain groupBy-count?  At 100 TB the value column may have
    billions of distinct keys; a full count shuffles every one of them.
    Misra-Gries bounds the shuffled candidate set to k counters per input
    partition regardless of cardinality, and the classic pigeonhole
    guarantee (an item with global count > n/k must exceed n_p/(k+1) in
    at least one partition, so it survives that partition's summary)
    makes the candidate union a SUPERSET of the true heavy hitters.  The
    second pass recounts ONLY candidates (broadcast semi-join against the
    scan — tiny) and filters ``cnt * k > n`` exactly, so the final output
    is deterministic and engine-independent even though the intermediate
    candidate sets depend on partition layout.

    Output: ``(value_col, cnt)`` — exact counts, only true heavy hitters.
    """
    import pandas as pd  # local: executors import lazily

    cap = k

    def mg_partition(batches):
        from collections import Counter

        cnt: Counter = Counter()
        for pdf in batches:
            cnt.update(pdf[value_col].value_counts().to_dict())
            if len(cnt) > cap:
                # mergeable-MG shrink: subtract the (cap+1)-th largest
                # weight from everything, keep strictly positive
                m = sorted(cnt.values(), reverse=True)[cap]
                cnt = Counter({t: c - m for t, c in cnt.items() if c > m})
        yield pd.DataFrame({value_col: list(cnt.keys())})

    vals = df.select(value_col)
    cands = vals.mapInPandas(
        mg_partition, schema=f"{value_col} string"
    ).distinct()
    total = vals.groupBy().agg(F.count(F.lit(1)).alias("__n"))
    return (
        vals.join(F.broadcast(cands), value_col)
        .groupBy(value_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(total))
        .where(F.col("cnt") * k > F.col("__n"))
        .select(value_col, F.col("cnt").cast("bigint").alias("cnt"))
    )


def hll_distinct_check(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lgk: int = 14,
    tol: float = 0.05,
) -> DataFrame:
    """Native DataSketches-HLL distinct counts with a built-in exactness
    audit — the Spark-JVM scale path next to the portable KMV estimator
    above (KMV stays the oracle-exact sketch; HLL register layouts are
    engine-specific, so this operator carries its own ground truth).

    Per group: an HLL sketch (``hll_sketch_agg``, lgK=``lgk`` -> standard
    error ~1.04/sqrt(2^lgk), 0.8%% at 14) AND the exact distinct count in
    the same aggregate.  The per-group sketches are then MERGED with
    ``hll_union_agg`` into a corpus-total row ('_all') — the mergeability
    demo that matters at 100 TB: per-segment sketches persisted once,
    rolled up without re-scanning, which exact countDistinct cannot do.

    Output: (grp, n_exact, hll_ok) where ``hll_ok`` is |est - exact| <=
    tol * exact.  The DuckDB oracle pins n_exact and asserts hll_ok TRUE,
    so the tolerance is hash-gated, not advisory; at lgk=14 the 5%% bound
    is ~6 standard errors — deterministic on any fixed input."""
    sk = df.groupBy(group_col).agg(
        F.hll_sketch_agg(value_col, F.lit(lgk)).alias("__sk"),
        F.count_distinct(value_col).alias("n_exact"),
    )
    per = sk.select(
        F.col(group_col).cast("string").alias("grp"),
        F.col("n_exact").cast("bigint").alias("n_exact"),
        F.hll_sketch_estimate("__sk").alias("__est"),
    )
    # '_all' is a RESERVED group label (the rollup sentinel below would be
    # indistinguishable from a real group stringifying to '_all'); enforce
    # in-plan via assert_true inside a filter — always-true predicate, zero
    # extra jobs, raises at execution if the reserved name ever appears
    per = per.where(
        F.assert_true(
            ~F.col("grp").eqNullSafe("_all"),
            F.lit("hll_distinct_check: group value '_all' collides with the rollup sentinel"),
        ).isNull()
    )
    total = (
        sk.agg(
            F.hll_sketch_estimate(F.hll_union_agg("__sk", F.lit(True))).alias("__est")
        )
        .crossJoin(
            F.broadcast(
                df.agg(F.count_distinct(value_col).cast("bigint").alias("n_exact"))
            )
        )
        .select(F.lit("_all").alias("grp"), "n_exact", "__est")
    )
    ok = (
        F.abs(F.col("__est") - F.col("n_exact"))
        <= F.lit(tol) * F.col("n_exact").cast("double")
    )
    return per.unionByName(total).select("grp", "n_exact", ok.alias("hll_ok"))
