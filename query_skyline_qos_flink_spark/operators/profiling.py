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
