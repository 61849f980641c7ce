"""Column profiling — the stats pass every ingestion pipeline runs first.

The reference engine's only aggregate pass is the O18 partition metrics
(FlinkSkyline.java:590-608); a training-data pipeline additionally needs a
per-column profile (row/null/distinct counts, min/max/sum) before any
dedup or filtering decisions.  This operator computes one profile row per
column in a single job.

100 TB shape: the wide->long unpivot is a map-side projection (rows x C,
no shuffle); the groupBy has C groups, so the regular aggregates
partial-combine map-side down to C rows per task.  ``count(DISTINCT
val)`` is the only term that ships real volume — Spark rewrites it as a
two-phase aggregate whose first phase dedups (col_name, val) map-side,
exactly the state an exact distinct count must move.  For billion-row
profiles where an estimate suffices, compose with
:func:`..operators.sketches.kmv_distinct` instead.

Determinism: every statistic here is integer arithmetic over BIGINT
inputs — bit-exact regardless of partitioning or summation order.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def profile_bigint(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Profile BIGINT-castable columns: one output row per column with
    ``n_rows, n_nonnull, n_distinct, min_val, max_val, sum_val``.

    ``min/max/sum`` are coalesced to -1 for an all-NULL column so the
    output schema is non-null BIGINT end to end.
    """
    cols = list(cols)
    casted = df.select([F.col(c).cast("bigint").alias(c) for c in cols])
    long = casted.unpivot([], cols, "col_name", "val")
    return long.groupBy("col_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("val").alias("n_nonnull"),
        F.countDistinct("val").alias("n_distinct"),
        F.coalesce(F.min("val"), F.lit(-1)).cast("bigint").alias("min_val"),
        F.coalesce(F.max("val"), F.lit(-1)).cast("bigint").alias("max_val"),
        F.coalesce(F.sum("val"), F.lit(-1)).cast("bigint").alias("sum_val"),
    )


def profile_oracle_sql(src_sql: str, cols: Sequence[str]) -> str:
    """DuckDB twin of :func:`profile_bigint`: ``src_sql`` must yield the
    already-BIGINT columns named in ``cols``."""
    long = " UNION ALL ".join(
        f"SELECT '{c}' AS col_name, {c} AS val FROM src" for c in cols
    )
    return f"""
WITH src AS ({src_sql}), long AS ({long})
SELECT col_name,
  CAST(count(*) AS BIGINT) AS n_rows,
  CAST(count(val) AS BIGINT) AS n_nonnull,
  CAST(count(DISTINCT val) AS BIGINT) AS n_distinct,
  CAST(COALESCE(min(val), -1) AS BIGINT) AS min_val,
  CAST(COALESCE(max(val), -1) AS BIGINT) AS max_val,
  CAST(COALESCE(sum(val), -1) AS BIGINT) AS sum_val
FROM long GROUP BY col_name
""".strip()


def histogram_fixed(
    df: DataFrame, col: str, lo: int, width: int, n_bins: int
) -> DataFrame:
    """Fixed-width histogram over an integral column: one row per occupied
    bin with its count and exact min/max.  Out-of-range values land in
    sentinel bins -1 (underflow) and ``n_bins`` (overflow) rather than
    being silently dropped.

    100 TB shape: a single codegen'd projection + one groupBy with at most
    ``n_bins + 2`` groups — partial aggregation collapses each task's
    output to the bin count before the (tiny) shuffle.
    """
    if width <= 0 or n_bins <= 0:
        raise ValueError(f"width and n_bins must be positive, got {width}, {n_bins}")
    v = F.col(col)
    bin_ = (
        F.when(v < lo, F.lit(-1))
        .when(v >= lo + n_bins * width, F.lit(n_bins))
        .otherwise(F.expr(f"({col} - {lo}) div {width}"))
        .cast("bigint")
    )
    return (
        df.select(v.alias(col), bin_.alias("bin"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(col).cast("bigint").alias("min_val"),
            F.max(col).cast("bigint").alias("max_val"),
        )
    )


def histogram_oracle_sql(
    src_sql: str, col: str, lo: int, width: int, n_bins: int
) -> str:
    """DuckDB twin of :func:`histogram_fixed` over ``src_sql``."""
    b = (
        f"CASE WHEN {col} < {lo} THEN -1 "
        f"WHEN {col} >= {lo + n_bins * width} THEN {n_bins} "
        f"ELSE ({col} - {lo}) // {width} END"
    )
    return f"""
WITH src AS ({src_sql})
SELECT CAST({b} AS BIGINT) AS bin,
  CAST(count(*) AS BIGINT) AS n,
  CAST(min({col}) AS BIGINT) AS min_val,
  CAST(max({col}) AS BIGINT) AS max_val
FROM src GROUP BY 1
""".strip()
