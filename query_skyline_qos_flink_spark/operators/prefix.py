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


def _range_bucketed(df: DataFrame, sort_cols: Sequence[str]) -> tuple[DataFrame, DataFrame]:
    """Shared passes 1-3: (ranged rows with ``__b``, broadcastable
    per-bucket cumulative offsets ``(__b, __off)``).

    Buckets on the FIRST sort column that yields at least one quantile
    boundary: a (near-)constant leading column gives no split points, and
    when a prefix of the sort key is globally constant, bucketing by the
    next column still respects the total order — without the fallback
    every row would land in one bucket and the "local" window would
    degenerate back to a single task."""
    n_ranges = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    _NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double"}
    dtypes = dict(df.dtypes)
    numeric = [c for c in sort_cols if dtypes.get(c, "").split("(")[0] in _NUMERIC]
    if not numeric or numeric[0] != sort_cols[0]:
        # approxQuantile (the boundary source) is numeric-only; a leading
        # string/date sort column has no range-bucketing path here
        raise ValueError(
            f"range-bucketed rank needs a numeric leading sort column; got "
            f"{[(c, dtypes.get(c)) for c in sort_cols]} — cast dates to "
            f"epoch or put a numeric column first"
        )

    def quantile_bounds(c: str) -> list[float]:
        return sorted(
            set(df.stat.approxQuantile(c, [j / n_ranges for j in range(1, n_ranges)], 0.001))
        )

    bucket_col, bounds = sort_cols[0], quantile_bounds(sort_cols[0])
    # a (near-)constant column collapses to <2 distinct boundaries and would
    # put every row in one bucket; fall through to the next sort column —
    # sound only while every preceding column is globally constant (then the
    # order within the data is decided by the later columns anyway)
    for c in list(sort_cols)[1:]:
        if len(bounds) >= 2 or c not in numeric:
            break  # non-numeric fallback column: no quantile path, keep
            # the current bucketing (correct, possibly skewed)
        n_prior, n_null = df.select(
            F.count_distinct(F.col(bucket_col)),
            F.count(F.when(F.col(bucket_col).isNull(), F.lit(1))),
        ).first()
        if n_prior > 1 or n_null > 0:
            break  # genuinely low-cardinality-but-not-constant prefix:
            # keep the leading col (correct, possibly skewed — documented).
            # NULLs count as a distinct value here: count_distinct ignores
            # them, but NULLs sort FIRST, so "one non-null value + NULLs"
            # is NOT globally constant and must not shift bucketing to the
            # next column.
        bucket_col, bounds = c, quantile_bounds(c)
    # bucket id = number of boundaries strictly below the value, as ONE
    # size(filter(<literal array>)) expression — a chained when().otherwise()
    # sum nests ~32 conditionals deep and measurably stalls the optimizer/
    # codegen on every plan that embeds this subtree (see skyline.py's 2-D
    # path, where the chain cost ~4x the query runtime).  NULL values yield
    # NULL > any bound -> filter drops them -> NULL maps via coalesce to
    # bucket 0, which sorts first — matching NULLS FIRST rank order.
    if bounds:
        pid = F.coalesce(
            F.size(
                F.filter(
                    F.array(*[F.lit(float(b)) for b in bounds]),
                    lambda b: b < F.col(bucket_col).cast("double"),
                )
            ),
            F.lit(0),
        )
    else:
        pid = F.lit(0)
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
    return ranged, offs


def exact_prefix(df: DataFrame, sort_cols: Sequence[str], n: int) -> DataFrame:
    """Exactly the first ``n`` rows of ``df`` ordered by ``sort_cols``
    (which must be a deterministic total order — e.g. end with a unique
    key), without a single-task global sort."""
    # the quantile action + the count action + the main plan all reread the
    # input; pin the (column-pruned) projection once
    df = _persist(df)
    ranged, offs = _range_bucketed(df, sort_cols)
    w_local = Window.partitionBy("__b").orderBy(*sort_cols)
    return (
        ranged.join(F.broadcast(offs), "__b")
        .where(F.col("__off") < n)  # whole-bucket prune past the prefix
        .withColumn("__rn", F.row_number().over(w_local) + F.col("__off"))
        .where(F.col("__rn") <= n)
        .drop("__b", "__off", "__rn")
    )


def with_global_rank(
    df: DataFrame, sort_cols: Sequence[str], out_col: str = "rn"
) -> DataFrame:
    """Append the exact global 1-based ``row_number() OVER (ORDER BY
    sort_cols)`` as ``out_col`` — same bounded-pieces assembly as
    :func:`exact_prefix`, no single-task window, every row kept.

    ``sort_cols`` must be a total order for the rank to be deterministic.
    Feeds rank-arithmetic operators (ntile, exact percentile positions,
    pagination) at 100x the scale an empty-partition window survives."""
    df = _persist(df)
    ranged, offs = _range_bucketed(df, sort_cols)
    w_local = Window.partitionBy("__b").orderBy(*sort_cols)
    return (
        ranged.join(F.broadcast(offs), "__b")
        .withColumn(out_col, F.row_number().over(w_local) + F.col("__off"))
        .drop("__b", "__off")
    )


def ntile_by_rank(
    df: DataFrame, sort_cols: Sequence[str], n_tiles: int, out_col: str = "tile"
) -> DataFrame:
    """Exact ``ntile(n_tiles) OVER (ORDER BY sort_cols)`` without the
    global single-task window: global rank via :func:`with_global_rank`,
    then closed-form SQL ntile arithmetic — with ``N`` total rows,
    ``q = N div n``, ``r = N mod n``, the first ``r`` tiles hold ``q+1``
    rows: rank <= r*(q+1) -> tile = ceil(rank/(q+1)), else
    tile = r + ceil((rank - r*(q+1)) / q)."""
    # count the (persisted) INPUT — ranked has exactly as many rows, but
    # counting it would execute the bucket join + rank window twice
    df = _persist(df)
    total = df.count()
    ranked = with_global_rank(df, sort_cols, "__gr")
    q, r = divmod(total, n_tiles)
    if q == 0:  # fewer rows than tiles: ntile degenerates to rank
        return ranked.withColumn(out_col, F.col("__gr").cast("int")).drop("__gr")
    cut = r * (q + 1)
    tile = F.when(
        F.col("__gr") <= cut, F.ceil(F.col("__gr") / F.lit(q + 1))
    ).otherwise(F.lit(r) + F.ceil((F.col("__gr") - F.lit(cut)) / F.lit(q)))
    return ranked.withColumn(out_col, tile.cast("int")).drop("__gr")
