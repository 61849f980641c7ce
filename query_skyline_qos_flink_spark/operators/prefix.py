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
3. per-bucket row counts -> cumulative offsets (collected driver-side —
   at most #buckets rows — and inlined as plan literals, which also yields
   the total row count for free);
4. global rank = local rank + bucket offset; keep rank <= n.  Buckets whose
   offset already exceeds n are pruned at plan time, BEFORE they shuffle.

Reference shape: the record-ID snapshot barrier (O13) —
/root/reference/java/org.main/FlinkSkyline.java:120-174 gates the skyline
on "first N records seen"; this operator is the batch-exact equivalent.
"""

from __future__ import annotations

from bisect import bisect_right
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, Window, functions as F

from .caching import persist_bounded as _persist


def _range_bucketed(
    df: DataFrame, sort_cols: Sequence[str], sample_boundaries: float | None = None
) -> tuple[DataFrame, list[int], int, str, list[float]]:
    """Shared passes 1-3: (ranged rows with ``__b``, literal cumulative
    offset per bucket id, total row count, bucket column name, literal
    boundaries).

    The cumulative offsets come from ONE shuffle-free global aggregate —
    a conditional ``sum(value >= bound)`` per boundary plus ``count(*)``
    (offset of bucket b = total - rows at-or-above bound b-1), partial
    map-side like any global agg.  This replaces a ``groupBy`` on the
    derived bucket id: grouping keyed every row on the B-term bucket
    expression (too large for whole-stage codegen, so it evaluated
    interpreted — profiled ~5x the scan cost) and paid a shuffle for at
    most B output rows.  The total row count comes out of the same
    action, sparing callers that need N (ntile, quantile positions) a
    separate ``count()`` pass.

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
        # boundaries only balance work — ANY split is correct — so a
        # caller may trade boundary quality for probe cost: a sampled
        # single-column probe with a loose sketch is a fraction of a
        # full-scan approxQuantile and Catalyst prunes the parquet read
        # to just this column
        src, acc = df, 0.001
        if sample_boundaries is not None:
            src = df.select(c).sample(sample_boundaries, seed=7)
            acc = max(0.01, 0.5 / n_ranges)
        return sorted(
            set(src.stat.approxQuantile(c, [j / n_ranges for j in range(1, n_ranges)], acc))
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
    # bucket id = number of boundaries at or below the value, as a FLAT
    # sum of indicator whens — every term whole-stage-codegens to one
    # branchless comparison.  (Two rejected shapes: a NESTED
    # when().otherwise(when()...) chain stalls the optimizer ~32 plan
    # levels deep — see skyline.py's 2-D path, where it cost ~4x the
    # query runtime — and the previous size(filter(<literal array>))
    # builds a 32-element array per row through the INTERPRETED
    # higher-order-function path, which profiled at ~7x the cost of this
    # sum on the same scan.)  NULL values: NULL >= bound is NULL -> every
    # indicator's otherwise(0) -> bucket 0, which sorts first — matching
    # NULLS FIRST rank order.
    # single parsed expressions (the per-boundary when-chains cost ~4 py4j
    # round trips per term; at 31 boundaries x two expressions that was
    # ~250 round trips per call — see similarity.py's module-top note)
    vsql = f"CAST(`{bucket_col}` AS DOUBLE)"
    terms = " + ".join(
        f"(CASE WHEN {vsql} >= CAST('{float(bnd)!r}' AS DOUBLE) THEN 1 ELSE 0 END)" for bnd in bounds
    )
    ranged = df.withColumn("__b", F.expr(f"0 + {terms}" if bounds else "0"))
    ge_terms = ", ".join(
        f"SUM(CASE WHEN {vsql} >= CAST('{float(b)!r}' AS DOUBLE) THEN 1 ELSE 0 END) AS __ge{i}"
        for i, b in enumerate(bounds)
    )
    struct_sql = f"struct(count(1) AS __n{', ' + ge_terms if ge_terms else ''})"
    stats = df.agg(F.expr(struct_sql).alias("__s")).first()["__s"]
    total = int(stats["__n"])
    # offset of bucket b = rows strictly before it = rows below bound b-1
    # (NULL values fail every >= and land in bucket 0, NULLS FIRST)
    offs = [0] + [total - int(stats[f"__ge{i}"]) for i in range(len(bounds))]
    return ranged, offs, total, bucket_col, bounds


def _off_expr(offs: list[int]):
    """Literal cumulative-offset lookup for a ``__b`` bucket column (one
    parsed expression; a lit-by-lit array build costs 2 py4j round trips
    per element)."""
    arr = ",".join(str(int(o)) for o in (offs or [0]))
    return F.expr(f"element_at(array({arr}), __b + 1)")


def exact_prefix(df: DataFrame, sort_cols: Sequence[str], n: int) -> DataFrame:
    """Exactly the first ``n`` rows of ``df`` ordered by ``sort_cols``
    (which must be a deterministic total order — e.g. end with a unique
    key), without a single-task global sort."""
    # the quantile action + the offsets action + the main plan all reread
    # the input; pin the (column-pruned) projection once
    df = _persist(df)
    ranged, offs, _, _, _ = _range_bucketed(df, sort_cols)
    # whole-bucket prune past the prefix happens AT PLAN TIME: the offsets
    # are literals, so buckets beyond the prefix never even shuffle
    keep = [b for b, off in enumerate(offs) if off < n] or [0]
    w_local = Window.partitionBy("__b").orderBy(*sort_cols)
    return (
        ranged.where(F.col("__b") <= max(keep))
        .withColumn("__rn", F.row_number().over(w_local) + _off_expr(offs))
        .where(F.col("__rn") <= n)
        .drop("__b", "__rn")
    )


def with_global_rank_and_total(
    df: DataFrame, sort_cols: Sequence[str], out_col: str = "rn"
) -> tuple[DataFrame, int]:
    """:func:`with_global_rank` plus the total row count — which the
    bucket-offsets action already produced, so callers that need N
    (ntile arithmetic, exact quantile positions) skip their own
    ``count()`` pass over the input."""
    df = _persist(df)
    ranged, offs, total, _, _ = _range_bucketed(df, sort_cols)
    w_local = Window.partitionBy("__b").orderBy(*sort_cols)
    ranked = ranged.withColumn(
        out_col, F.row_number().over(w_local) + _off_expr(offs)
    ).drop("__b")
    return ranked, total


def rows_at_global_ranks(
    df: DataFrame,
    sort_cols: Sequence[str],
    ranks_fn: Callable[[int], Sequence[int]],
    out_col: str = "rn",
) -> tuple[DataFrame, int]:
    """Rows whose exact global rank (``row_number() OVER (ORDER BY
    sort_cols)``) is in ``ranks_fn(total)``, plus the total row count —
    order-statistic SELECTION (exact quantiles, percentile brackets)
    without ranking the whole table.

    ``ranks_fn`` receives the exact total (known from the bucket-offsets
    action) and returns the 1-based ranks wanted.  Because the cumulative
    bucket offsets are driver-side literals, the buckets that contain a
    requested rank are known at PLAN time: every other bucket is filtered
    out map-side, before the exchange, so the local-sort window shuffles
    ~``len(ranks)/n_buckets`` of the rows instead of all of them.  With k
    requested ranks and B balanced buckets the shuffled fraction is
    <= k/B regardless of N.  Three deliberate shapes keep every pass at
    scan speed: the boundary probe runs on a SAMPLE of the bucket column
    alone (any boundary choice is correct); the offsets come from the
    shuffle-free conditional-sum aggregate (see ``_range_bucketed``); and
    the target buckets are selected by RANGE PREDICATES on the raw
    bucket column — literal comparisons that whole-stage-codegen and
    push into the parquet scan's row-group stats — never by filtering on
    the derived B-term bucket id, which is too large for codegen and
    would evaluate interpreted on every row (profiled ~10x this plan).
    The input is deliberately NOT persisted: no later pass reads the
    whole rows, so Catalyst's column pruning beats a cache fill."""
    _, offs, total, bucket_col, bounds = _range_bucketed(
        df, sort_cols, sample_boundaries=0.05
    )
    ranks = sorted({int(r) for r in ranks_fn(total) if 1 <= int(r) <= total})
    if not ranks:
        empty = df.where(F.lit(False)).withColumn(
            out_col, F.lit(None).cast("int")
        )
        return empty, total
    # rank r lives in the last bucket whose cumulative offset is < r
    targets = sorted({bisect_right(offs, r - 1) - 1 for r in ranks})
    v = F.col(bucket_col).cast("double")

    def bucket_range(b: int):
        conds = []
        if b > 0:
            conds.append(v >= F.lit(float(bounds[b - 1])))
        if b < len(bounds):
            conds.append(v < F.lit(float(bounds[b])))
        if not conds:
            return F.lit(True)
        cond = conds[0]
        for c in conds[1:]:
            cond = cond & c
        if b == 0:  # NULLs sort first: they belong to bucket 0
            cond = cond | F.col(bucket_col).isNull()
        return cond

    keep = bucket_range(targets[0])
    for b in targets[1:]:
        keep = keep | bucket_range(b)
    # bucket id re-derived ONLY on the filtered rows, via a when-chain
    # over the (few) target buckets — the filtered set partitions across
    # them, so the last target is the otherwise arm
    bid = F.lit(int(targets[-1]))
    for b in reversed(targets[:-1]):
        bid = F.when(bucket_range(b), F.lit(int(b))).otherwise(bid)
    w_local = Window.partitionBy("__b").orderBy(*sort_cols)
    picked = (
        df.where(keep)
        .withColumn("__b", bid)
        .withColumn(out_col, F.row_number().over(w_local) + _off_expr(offs))
        .where(F.col(out_col).isin(ranks))
        .drop("__b")
    )
    return picked, total


def with_global_rank(
    df: DataFrame, sort_cols: Sequence[str], out_col: str = "rn"
) -> DataFrame:
    """Append the exact global 1-based ``row_number() OVER (ORDER BY
    sort_cols)`` as ``out_col`` — same bounded-pieces assembly as
    :func:`exact_prefix`, no single-task window, every row kept.

    ``sort_cols`` must be a total order for the rank to be deterministic.
    Feeds rank-arithmetic operators (ntile, exact percentile positions,
    pagination) at 100x the scale an empty-partition window survives."""
    return with_global_rank_and_total(df, sort_cols, out_col)[0]


def ntile_by_rank(
    df: DataFrame, sort_cols: Sequence[str], n_tiles: int, out_col: str = "tile"
) -> DataFrame:
    """Exact ``ntile(n_tiles) OVER (ORDER BY sort_cols)`` without the
    global single-task window: global rank via :func:`with_global_rank`,
    then closed-form SQL ntile arithmetic — with ``N`` total rows,
    ``q = N div n``, ``r = N mod n``, the first ``r`` tiles hold ``q+1``
    rows: rank <= r*(q+1) -> tile = ceil(rank/(q+1)), else
    tile = r + ceil((rank - r*(q+1)) / q)."""
    ranked, total = with_global_rank_and_total(df, sort_cols, "__gr")
    q, r = divmod(total, n_tiles)
    if q == 0:  # fewer rows than tiles: ntile degenerates to rank
        return ranked.withColumn(out_col, F.col("__gr").cast("int")).drop("__gr")
    cut = r * (q + 1)
    tile = F.when(
        F.col("__gr") <= cut, F.ceil(F.col("__gr") / F.lit(q + 1))
    ).otherwise(F.lit(r) + F.ceil((F.col("__gr") - F.lit(cut)) / F.lit(q)))
    return ranked.withColumn(out_col, tile.cast("int")).drop("__gr")
