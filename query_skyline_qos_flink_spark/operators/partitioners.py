"""Spatial partitioning strategies for two-phase skyline — pure Column exprs.

Parity targets (``/root/reference/java/org.main/FlinkSkyline.java``):

* MR-Dim   (:686-713): equal-width range buckets on dimension 0:
  ``clamp(floor(v0 / (domain / P)), 0, P-1)``.
* MR-Grid  (:746-790): hypercube bitmask — bit i set iff ``v[i] >= domain/2``.
  The reference uses the raw mask as the key, which SILENTLY DROPS cells
  ``>= P`` from query results when ``2^dims > P`` (bug documented in
  SURVEY.md §2.1); we key by ``mask % P`` instead, which the reference's own
  PDF §3.12.2 claims to do.
* MR-Angle (:803-876): hyperspherical — ``phi_i = atan2(||v[i+1:]||_2, v_i)``
  for i in [0, d-1), each normalized by pi/2, averaged, scaled by P, clamped.

All three are deterministic column expressions: Catalyst evaluates them
JVM-side in whole-stage codegen, and the only shuffle is the subsequent
exchange on the pid (the reference's ``keyBy``).  Because skyline-merge is
associative, ANY partitioning yields a correct two-phase result — these
strategies only shape pruning effectiveness and balance, which is what the
Optimality metric measures.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, functions as F

STRATEGIES = ("dim", "grid", "angle")


def _cols(dims: Sequence) -> list[Column]:
    return [F.col(c).cast("double") if isinstance(c, str) else c.cast("double") for c in dims]


def _clamp_int(expr: Column, lo: int, hi: int) -> Column:
    return F.least(F.greatest(expr.cast("int"), F.lit(lo)), F.lit(hi))


def mr_dim(dims: Sequence, num_partitions: int, domain: float | Column) -> Column:
    """Equal-width range bucket of dimension 0 (FlinkSkyline.java:686-713).

    ``domain`` may be a literal or a Column (e.g. a scalar-subquery max so
    the width adapts to the data — the reference's fixed ``--domain 1000``
    default silently collapses everything into one bucket when data lives in
    [0, 10000], SURVEY.md §2.1 footnote)."""
    v0 = _cols(dims)[0]
    dom = domain if isinstance(domain, Column) else F.lit(float(domain))
    width = dom / F.lit(float(num_partitions))
    return _clamp_int(F.floor(v0 / width), 0, num_partitions - 1)


def mr_grid(dims: Sequence, num_partitions: int, domain: float | Column) -> Column:
    """Hypercube bitmask mod P (FlinkSkyline.java:746-790, fixed per SURVEY)."""
    cols = _cols(dims)
    dom = domain if isinstance(domain, Column) else F.lit(float(domain))
    half = dom / F.lit(2.0)
    mask: Column = F.lit(0)
    for i, c in enumerate(cols):
        mask = mask + F.when(c >= half, F.lit(1 << i)).otherwise(F.lit(0))
    return (mask % F.lit(num_partitions)).cast("int")


def mr_angle(dims: Sequence, num_partitions: int, domain: float | Column | None = None) -> Column:
    """Hyperspherical angular sectors (FlinkSkyline.java:803-876).

    ``domain`` is unused (kept for a uniform signature).  For d==1 the
    reference returns partition 0."""
    cols = _cols(dims)
    d = len(cols)
    if d < 2:
        return F.lit(0).cast("int")
    max_angle = math.pi / 2.0
    norm_sum: Column = F.lit(0.0)
    for i in range(d - 1):
        sum_sq_rest: Column = F.lit(0.0)
        for j in range(i + 1, d):
            sum_sq_rest = sum_sq_rest + cols[j] * cols[j]
        angle = F.atan2(F.sqrt(sum_sq_rest), cols[i])
        norm_sum = norm_sum + angle / F.lit(max_angle)
    avg_pos = norm_sum / F.lit(float(d - 1))
    return _clamp_int(F.floor(avg_pos * F.lit(float(num_partitions))), 0, num_partitions - 1)


def partition_id(
    strategy: str, dims: Sequence, num_partitions: int, domain: float | Column
) -> Column:
    if strategy == "dim":
        return mr_dim(dims, num_partitions, domain)
    if strategy == "grid":
        return mr_grid(dims, num_partitions, domain)
    if strategy == "angle":
        return mr_angle(dims, num_partitions, domain)
    raise ValueError(f"unknown strategy {strategy!r}; expected one of {STRATEGIES}")


def grid_dominance_prefilter(dims: Sequence, domain: float | Column) -> Column:
    """Predicate keeping rows with at least one dim strictly below domain/2.

    The reference ships this commented out for deadlock fears
    (FlinkSkyline.java:717-733); in Spark it is a plain ``where`` pushed to
    the scan.  ONLY safe when the all->=mid corner cell is known to be
    populated by a dominating point (it can alter results on adversarial
    inputs — SURVEY.md §2.1 O23), hence opt-in."""
    cols = _cols(dims)
    dom = domain if isinstance(domain, Column) else F.lit(float(domain))
    half = dom / F.lit(2.0)
    pred: Column = F.lit(False)
    for c in cols:
        pred = pred | (c < half)
    return pred
