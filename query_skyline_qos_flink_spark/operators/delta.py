"""Snapshot diff — CDC-style change detection between two table versions.

A training-data pipeline is rarely one-shot: each crawl/ingest produces a
new snapshot, and downstream work (re-dedup, re-embedding, re-packing)
should touch only what CHANGED.  This operator computes that change set:
given two versions of a keyed table, emit one row per difference,
classified ``insert`` / ``delete`` / ``update``, carrying both the old
and new images of the compared columns.

100 TB shape: ONE full-outer sort-merge join on the key — both sides
shuffle once on the same key, unchanged rows are filtered before any
further stage, and the output is proportional to the churn, not the
table.  For repeated diffs over the same key, write both snapshots with
:mod:`..sources.bucketed` and the exchange disappears entirely.

Determinism: classification is pure null-safe column comparison — no
hashing, no floats — so the diff is bit-exact and oracle-portable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
    keep_unchanged: bool = False,
) -> DataFrame:
    """Diff ``new`` against ``old`` by ``key_cols``.

    Output: the key columns, ``op`` in {'insert','delete','update'} (plus
    'unchanged' when ``keep_unchanged``), and ``old_<c>`` / ``new_<c>``
    images of every compare column (NULL on the absent side).  Keys are
    assumed non-null (join keys); compare columns may be NULL — equality
    is null-safe, so NULL -> NULL is 'unchanged' and NULL -> value is an
    'update'.
    """
    keys = list(key_cols)
    cmps = list(compare_cols)
    o = old.select(
        *keys,
        F.lit(True).alias("__in_old"),
        *[F.col(c).alias(f"old_{c}") for c in cmps],
    )
    n = new.select(
        *keys,
        F.lit(True).alias("__in_new"),
        *[F.col(c).alias(f"new_{c}") for c in cmps],
    )
    j = o.join(n, on=keys, how="full")
    changed = F.lit(False)
    for c in cmps:
        changed = changed | ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    op = (
        F.when(F.col("__in_old").isNull(), F.lit("insert"))
        .when(F.col("__in_new").isNull(), F.lit("delete"))
        .when(changed, F.lit("update"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.withColumn("op", op).drop("__in_old", "__in_new")
    if not keep_unchanged:
        out = out.where(F.col("op") != "unchanged")
    return out.select(*keys, "op", *[f"old_{c}" for c in cmps], *[f"new_{c}" for c in cmps])
