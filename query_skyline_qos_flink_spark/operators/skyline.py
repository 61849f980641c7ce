"""DataFrame skyline operator — Spark-first two-phase execution.

The reference implements skyline as a two-phase Flink topology: spatial
``keyBy`` -> per-partition BNL -> single global BNL merge
(``/root/reference/java/org.main/FlinkSkyline.java:110-174,407-444,514-569``).
The structural insight (SURVEY.md §2.3) is that skyline-merge is an
associative, commutative, idempotent monoid: ``SKY(A ∪ B) = SKY(SKY(A) ∪
SKY(B))``.  On Spark this means:

* **Phase 1 needs no shuffle at all.**  ``mapInPandas`` computes a local
  skyline per *input partition* (Arrow-batched, incremental), so the only
  rows that ever hit the wire are local-skyline survivors.  The reference's
  spatial partitioners exist to make local pruning effective despite the
  keyBy shuffle it pays up front; reading partitioned Parquet we get the
  pruning for free from data locality and pay zero shuffle.
* **Phase 2 shuffles only survivors.**  A final merge on one task is fine
  when locals prune well; for adversarial (anti-correlated, high-d) inputs
  where local skylines are huge, an intermediate tree-merge round keeps any
  single task's input bounded: local -> repartition(fanout) -> local ->
  repartition(1) -> final.  This is the "logarithmic halving" upgrade over
  the reference's single-threaded global BNL (SURVEY.md §4).

At 100 TB: phase 1 parallelism = input splits; the shuffle volume is
``O(sum of local skyline sizes)``, not ``O(input)``; the tree merge bounds
the final task.  No driver-side collect anywhere.

MAX dimensions are handled by negation; duplicates/ties are retained
(§1.1 of SURVEY.md); rows with NULL/NaN in any skyline dimension are
excluded (documented engine policy).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

from .skyline_kernel import skyline_mask

_PREP = "__sk_"

# Insert an intermediate tree-merge round when phase 1 has more partitions
# than this (heuristic: more partitions -> more survivor volume into the
# final merge task).
_TREE_MERGE_PARTITIONS = 64
_TREE_FANOUT = 16

Direction = str  # 'min' | 'max'


def _norm_dims(dims: Sequence) -> list[tuple[str, Direction]]:
    out: list[tuple[str, Direction]] = []
    for d in dims:
        if isinstance(d, str):
            out.append((d, "min"))
        else:
            col, direction = d
            direction = direction.lower()
            if direction not in ("min", "max"):
                raise ValueError(f"direction must be min|max, got {direction}")
            out.append((col, direction))
    if not out:
        raise ValueError("at least one skyline dimension required")
    return out


def _prep(df: DataFrame, dims: Sequence) -> tuple[DataFrame, list[str]]:
    """Add minimized double columns __sk_i and drop NULL/NaN rows."""
    nd = _norm_dims(dims)
    prep_cols = []
    for i, (col, direction) in enumerate(nd):
        name = f"{_PREP}{i}"
        expr = F.col(col).cast("double")
        if direction == "max":
            expr = -expr
        df = df.withColumn(name, expr)
        prep_cols.append(name)
    cond = None
    for name in prep_cols:
        c = F.col(name).isNotNull() & ~F.isnan(F.col(name))
        cond = c if cond is None else (cond & c)
    return df.where(cond), prep_cols


def _local_skyline_iter(prep_cols: list[str]):
    """mapInPandas function: incremental per-partition skyline.

    Keeps only the partition's current skyline in memory (the reference
    buffers 5,000 rows then runs BNL, ``FlinkSkyline.java:232,286-289``;
    Arrow batches play that role here, with the running skyline carried
    across batches)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cur: pd.DataFrame | None = None
        for pdf in batches:
            if pdf.empty:
                continue
            allrows = pdf if cur is None else pd.concat([cur, pdf], ignore_index=True)
            pts = allrows[prep_cols].to_numpy(dtype=np.float64)
            mask = skyline_mask(pts)
            cur = allrows.loc[mask]
            if len(cur) == len(allrows):
                cur = allrows  # avoid needless copy
        if cur is not None and not cur.empty:
            yield cur

    return fn


def _grouped_skyline(prep_cols: list[str]):
    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pts = pdf[prep_cols].to_numpy(dtype=np.float64)
        return pdf.loc[skyline_mask(pts)]

    return fn


def skyline(
    df: DataFrame,
    dims: Sequence,
    group_by: Sequence[str] | None = None,
    tree_merge: bool | None = None,
) -> DataFrame:
    """Skyline (Pareto frontier) of ``df`` over ``dims``.

    ``dims``: list of column names (minimized) or ``(name, 'min'|'max')``
    pairs.  ``group_by``: optional grouping keys — skyline computed per
    group (one shuffle on the keys).  Returns the original columns of
    ``df`` (all of them), with non-skyline rows removed.
    """
    out_cols = df.columns
    prepped, prep_cols = _prep(df, dims)
    if group_by:
        res = (
            prepped.groupBy(*[F.col(k) for k in group_by])
            .applyInPandas(_grouped_skyline(prep_cols), schema=prepped.schema)
        )
        return res.select(*out_cols)

    local = _local_skyline_iter(prep_cols)
    phase1 = prepped.mapInPandas(local, schema=prepped.schema)

    if tree_merge is None:
        try:
            tree_merge = prepped.rdd.getNumPartitions() > _TREE_MERGE_PARTITIONS
        except Exception:  # pragma: no cover - plan conversion edge cases
            tree_merge = False
    merged = phase1
    if tree_merge:
        merged = merged.repartition(_TREE_FANOUT).mapInPandas(local, schema=prepped.schema)
    final = merged.repartition(1).mapInPandas(local, schema=prepped.schema)
    return final.select(*out_cols)


def skyline_with_pid(
    df: DataFrame,
    dims: Sequence,
    pid_col: Column,
    num_partitions: int,
    origin_col: str = "origin_partition",
) -> DataFrame:
    """Reference-parity two-phase skyline with an explicit spatial
    partitioner (MR-Dim / MR-Grid / MR-Angle column expression as
    ``pid_col``; see ``operators/partitioners.py``).

    Phase 1 shuffles on the partition id (the reference's ``keyBy``,
    ``FlinkSkyline.java:136-138``) and tags every local survivor with its
    origin partition (``FlinkSkyline.java:390``) so the Optimality metric
    (``FlinkSkyline.java:590-608``) can be computed from the merged result.
    Returns the global skyline INCLUDING the ``origin_col`` provenance tag;
    callers that don't need provenance should use :func:`skyline`.
    """
    out_cols = df.columns + [origin_col]
    tagged = df.withColumn(origin_col, pid_col.cast("int"))
    prepped, prep_cols = _prep(tagged, dims)
    # groupBy(pid) is the reference's keyBy shuffle (one exchange on the
    # spatial cell id); num_partitions only shapes the pid VALUES, the
    # physical task count is spark.sql.shuffle.partitions / AQE.
    local = prepped.groupBy(origin_col).applyInPandas(
        _grouped_skyline(prep_cols), schema=prepped.schema
    )
    merge = _local_skyline_iter(prep_cols)
    final = local.repartition(1).mapInPandas(merge, schema=prepped.schema)
    return final.select(*out_cols)
