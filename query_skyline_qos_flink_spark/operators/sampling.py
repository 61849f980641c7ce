"""Deterministic sampling / dataset-split operators for training pipelines.

Splits must be reproducible across runs, engines and repartitions — so the
assignment is a pure function of the row's id, never of partition layout
or RNG state (``df.randomSplit`` is seed-and-partition dependent; this is
not).  The bucket is derived from the first 8 hex chars of ``md5(id)``
(md5 is the portable hash — identical hex in duckdb), giving a uniform
integer in [0, 10000) so fractions are expressible in basis points.

100 TB shape: a single codegen'd projection — no shuffle, no RNG, no
sort; the split column rides the scan and prunes like any predicate.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

_BUCKETS = 10_000  # basis points


def split_bucket(id_col: Column) -> Column:
    """Uniform deterministic bucket in [0, 10000): first 8 md5 hex chars of
    the stringified id, parsed as an integer, mod 10000."""
    hex8 = F.substring(F.md5(id_col.cast("string")), 1, 8)
    return F.conv(hex8, 16, 10).cast("long") % _BUCKETS


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train_frac: float = 0.8,
    out_col: str = "split",
) -> DataFrame:
    """Label every row 'train' or 'test' by deterministic id-hash bucket:
    ``bucket < train_frac * 10000`` -> train.  Reproducible across runs,
    engines, partitionings and row order; disjoint and exhaustive."""
    threshold = int(round(train_frac * _BUCKETS))
    b = split_bucket(F.col(id_col))
    return df.select(
        *df.columns,
        F.when(b < threshold, F.lit("train")).otherwise(F.lit("test")).alias(out_col),
    )


def split_bucket_sql(id_expr: str) -> str:
    """DuckDB twin of :func:`split_bucket` (nibble-parse of the first 8 md5
    hex chars — duckdb cannot cast hex strings directly)."""
    h = f"md5(CAST({id_expr} AS VARCHAR))"
    nibs = " + ".join(
        f"(strpos('0123456789abcdef', substr({h}, {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
        for i in range(8)
    )
    return f"(({nibs}) % {_BUCKETS})"


def stratified_sample(
    df: DataFrame,
    group_cols: Sequence[str],
    id_col: str,
    k: int,
    rank_col: str = "sample_rank",
) -> DataFrame:
    """Exactly-k-per-group deterministic sample: rank rows inside each
    group by ``md5(id)`` (hex compares identically everywhere) with the id
    itself as tie-break, keep rank <= k.

    Unlike ``df.sampleBy`` (fraction-based, RNG- and partition-dependent)
    this yields the SAME rows for the same ids on any engine, any
    partitioning — the property a reproducible eval-set draw needs.

    100 TB shape: one hash-partitioned window per group key — the sort is
    started map-side, state per group is the group's rows, and no global
    order exists anywhere.  Keep k small relative to group size; for
    rate-based sampling use :func:`hash_split`'s bucket filter instead.
    """
    h = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(*group_cols).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn(rank_col, F.row_number().over(w).cast("bigint"))
        .where(F.col(rank_col) <= k)
    )


def weighted_mix(
    df: DataFrame,
    rates: dict[str, float],
    group_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 1.0,
    copy_col: str = "copy_idx",
) -> DataFrame:
    """Deterministic dataset mixing: resample each group at its configured
    rate — the training-mix construction step ("2.5 epochs of wiki, 0.25
    of crawl, drop source X").  A rate's whole part emits that many copies
    of every row; the fractional part keeps a row iff its md5-id bucket
    falls under ``frac * 10000`` — so rate 2.5 emits 2 copies of every row
    plus a third copy of a deterministic half, rate 0 drops the group.
    Pure function of (id, group): reproducible across engines, runs and
    partition layouts, and each kept row carries ``copy_col`` (1-based) so
    downstream shuffles can decorrelate copies.

    Use exactly-representable rates (binary fractions / quarter steps) so
    the basis-point threshold is float-exact on every engine.

    100 TB shape: one codegen'd projection + explode — no shuffle, no RNG;
    output size is Σ group_rows × rate by construction."""
    rate = F.lit(float(default_rate))
    for g, r in sorted(rates.items()):
        rate = F.when(F.col(group_col) == g, F.lit(float(r))).otherwise(rate)
    whole = F.floor(rate).cast("int")
    frac_thresh = ((rate - F.floor(rate)) * _BUCKETS).cast("int")
    n = whole + F.when(split_bucket(F.col(id_col)) < frac_thresh, 1).otherwise(0)
    return (
        df.withColumn("__n_copies", n)
        .where(F.col("__n_copies") > 0)
        .withColumn(copy_col, F.explode(F.sequence(F.lit(1), F.col("__n_copies"))))
        .drop("__n_copies")
    )
