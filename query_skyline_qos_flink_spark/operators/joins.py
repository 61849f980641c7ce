"""Small join helpers shared across operators."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def null_safe_semi_join(
    left: DataFrame,
    right: DataFrame,
    eq_cols: Sequence[str] = (),
    null_safe_cols: Sequence[str] = (),
) -> DataFrame:
    """left_semi join equating ``eq_cols`` with ``=`` and ``null_safe_cols``
    with ``<=>`` (NULL matches NULL — NULL keys form a normal group, where a
    plain equi-join would silently drop every NULL-keyed row)."""
    la, ra = left.alias("__nsl"), right.alias("__nsr")
    cond = None
    for c in eq_cols:
        e = F.col(f"__nsl.{c}") == F.col(f"__nsr.{c}")
        cond = e if cond is None else (cond & e)
    for c in null_safe_cols:
        e = F.col(f"__nsl.{c}").eqNullSafe(F.col(f"__nsr.{c}"))
        cond = e if cond is None else (cond & e)
    if cond is None:
        raise ValueError("at least one join column required")
    return la.join(ra, on=cond, how="left_semi")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    value_cols: Sequence[str],
    how: str = "left",
    right_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Backward as-of join: attach to each ``left`` row the ``value_cols``
    of the LAST ``right`` row with the same ``on`` key and
    ``right_time <= left_time`` (inclusive).

    Spark has no ASOF JOIN; the scalable formulation is NOT a range join
    (which explodes candidates) but a union + carry-forward window — the
    same shape as Flink's temporal/event-time join: tag both sides, sort
    each key partition by (time, side), and carry the latest right-side
    payload forward with ``last(ignorenulls)``.  ONE shuffle on ``on``
    total, no join operator in the plan at all, and state per key is a
    single struct — this survives a 100 TB fact side because cost is a
    sort within each key partition, never |left|x|right| candidates.

    Times must be integer-typed (day numbers, epoch micros, ...) — both
    are cast to bigint for the union.  Right rows that tie on
    (key, time) need ``right_tiebreak`` columns to make "last" total
    (the LARGEST tiebreak tuple wins); left-row ties are harmless (each
    left row reads the same carried state).  ``how="left"`` keeps
    unmatched left rows with NULL values; ``"inner"`` drops them.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"asof_join supports how='left'|'inner', got {how!r}")
    on, value_cols = list(on), list(value_cols)
    left_payload = [c for c in left.columns if c not in on]
    clash = set(value_cols) & set(left.columns)
    if clash:
        raise ValueError(f"value_cols collide with left columns: {sorted(clash)}")
    ltypes = dict(left.dtypes)
    tbs = [f"__tb{i}" for i in range(len(right_tiebreak))]
    r2 = right.select(
        *on,
        F.col(right_time).cast("bigint").alias("__t"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in value_cols]).alias("__carry"),
        *[F.col(c).alias(a) for c, a in zip(right_tiebreak, tbs)],
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in left_payload],
    )
    rtypes = dict(r2.dtypes)
    l2 = left.select(
        *on,
        F.col(left_time).cast("bigint").alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r2.schema["__carry"].dataType).alias("__carry"),
        *[F.lit(None).cast(rtypes[a]).alias(a) for a in tbs],
        *left_payload,
    )
    # right (__side=0) sorts before left (__side=1) at equal time -> inclusive <=
    w = (
        Window.partitionBy(*on)
        .orderBy("__t", "__side", *tbs)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = (
        r2.unionByName(l2)
        .withColumn("__ff", F.last("__carry", ignorenulls=True).over(w))
        .where(F.col("__side") == 1)
    )
    if how == "inner":
        out = out.where(F.col("__ff").isNotNull())
    return out.select(
        *on,
        *left_payload,
        *[F.col(f"__ff.{c}").alias(c) for c in value_cols],
    )


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    left_time: str,
    right_time: str,
    lo: int,
    hi: int,
    on: Sequence[str] = (),
    bin_width: int | None = None,
) -> DataFrame:
    """Inner join on ``right_time BETWEEN left_time+lo AND left_time+hi``
    (plus optional ``on`` equi-keys), bin-bucketed so it never degrades to
    the cartesian product Spark plans for a bare inequality join.

    Both sides are bucketed into time bins of width ``bin_width``
    (default ``hi-lo+1``, the smallest width that bounds probes at 2);
    each left row probes every bin its window overlaps (``explode`` of a
    ``sequence`` — pure JVM), the right side gets its one home bin, and
    the range predicate becomes an equi-join on the bin followed by an
    exact BETWEEN filter.  A right row's home bin matches at most one
    probe, so no dedup pass is needed.  Cost scales with true selectivity
    (rows per bin), not |left|x|right| — the standard big-data range-join
    strategy (e.g. Databricks' range-join hint does the same binning).

    Times must be integer and non-negative (``div`` truncates toward
    zero, so negative times would misbin); column names of the two sides
    must be disjoint apart from ``on``.
    """
    if lo > hi:
        raise ValueError(f"empty range: lo={lo} > hi={hi}")
    w = bin_width if bin_width is not None else (hi - lo + 1)
    if w <= 0:
        raise ValueError(f"bin_width must be positive, got {w}")
    clash = (set(left.columns) & set(right.columns)) - set(on)
    if clash:
        raise ValueError(f"overlapping non-key columns: {sorted(clash)}")
    l2 = left.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.expr(f"({left_time} + {lo}) div {w}"),
                F.expr(f"({left_time} + {hi}) div {w}"),
            )
        ),
    )
    r2 = right.withColumn("__bin", F.expr(f"{right_time} div {w}"))
    return (
        l2.join(r2, [*on, "__bin"])
        .where(
            (F.col(right_time) >= F.col(left_time) + lo)
            & (F.col(right_time) <= F.col(left_time) + hi)
        )
        .drop("__bin")
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-tolerant equi-join: spread each hot key of ``left`` over
    ``n_salts`` shuffle partitions.

    ``left`` (the large, skewed side) gets a deterministic per-row salt
    (``pmod(hash(whole row), n_salts)``); ``right`` is exploded ×``n_salts``
    so every (key, salt) combination exists exactly once.  The join keys
    become ``on + [__salt]``, so one hot key's rows land on ``n_salts``
    reducers instead of one.  Result rows are identical to the plain join
    (each left row matches exactly the one right replica carrying its
    salt); cost is ``n_salts`` × the RIGHT side's shuffle volume — use when
    right is much smaller than the hot side, and prefer plain broadcast
    when right fits in memory.  AQE's skew-join split handles sort-merge
    skew adaptively; this helper is for when the skew is known ahead of
    time or AQE is unavailable (e.g. streaming micro-batches).

    Only left-preserving join types are supported: replicating the right
    side ×``n_salts`` would emit each UNMATCHED right row once per replica
    under right/full outer semantics."""
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "left_anti", "leftanti", "cross"):
        raise ValueError(
            f"salted_join does not support how={how!r}: unmatched right rows "
            f"would be duplicated n_salts times; use a plain join"
        )
    salt = F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    lsalted = left.withColumn("__salt", salt)
    rsalted = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return lsalted.join(rsalted, [*on, "__salt"], how).drop("__salt")
