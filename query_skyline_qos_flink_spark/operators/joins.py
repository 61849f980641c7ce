"""Small join helpers shared across operators."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


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
