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
