"""Rank-free exact N-row prefix (scale-safe ORDER BY ... LIMIT N).

A naive exact prefix is ``row_number() OVER (ORDER BY key) <= n`` — an
empty-partition window that funnels every row through ONE task, the plan
that dies first at 100x scale.  Instead, global rank is assembled from
bounded pieces, the same two-pass trick as the ungrouped 2-D skyline path
(``skyline.py::_skyline_2d_relational``):

1. range-bucket the rows on literal boundaries (driver-side
   ``approxQuantile`` on the leading sort column — ANY boundary choice is
   correct, it only balances work);
2. per-bucket local ``row_number`` (window partitioned by bucket — runs in
   parallel, no task ever holds more than one bucket);
3. per-bucket row counts -> cumulative offsets (a window over ~#buckets
   rows, broadcast back);
4. global rank = local rank + bucket offset; keep rank <= n.  Buckets whose
   offset already exceeds n are pruned BEFORE their local sort runs.

Reference shape: the record-ID snapshot barrier (O13) —
/root/reference/java/org.main/FlinkSkyline.java:120-174 gates the skyline
on "first N records seen"; this operator is the batch-exact equivalent.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F

from .caching import persist_bounded as _persist


def exact_prefix(df: DataFrame, sort_cols: Sequence[str], n: int) -> DataFrame:
    """Exactly the first ``n`` rows of ``df`` ordered by ``sort_cols``
    (which must be a deterministic total order — e.g. end with a unique
    key), without a single-task global sort."""
    d0 = sort_cols[0]
    n_ranges = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    # the quantile action + the count action + the main plan all reread the
    # input; pin the (column-pruned) projection once
    df = _persist(df)
    bounds = sorted(
        set(df.stat.approxQuantile(d0, [i / n_ranges for i in range(1, n_ranges)], 0.001))
    )
    pid = F.lit(0)
    for b in bounds:  # ascending buckets: __b order == d0 range order
        pid = pid + F.when(F.col(d0) > F.lit(b), 1).otherwise(0)
    ranged = df.withColumn("__b", pid)
    offs = (
        ranged.groupBy("__b")
        .count()
        .withColumn(
            "__off",
            F.coalesce(
                F.sum("count").over(
                    Window.partitionBy()
                    .orderBy("__b")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("__b", "__off")
    )
    w_local = Window.partitionBy("__b").orderBy(*sort_cols)
    return (
        ranged.join(F.broadcast(offs), "__b")
        .where(F.col("__off") < n)  # whole-bucket prune past the prefix
        .withColumn("__rn", F.row_number().over(w_local) + F.col("__off"))
        .where(F.col("__rn") <= n)
        .drop("__b", "__off", "__rn")
    )
