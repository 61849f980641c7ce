"""Vectorized numpy skyline (Pareto-frontier) kernels.

Semantics (parity with the reference's dominance relation,
``/root/reference/java/org.main/ServiceTuple.java:67-77``):

    p dominates q  <=>  forall i: p[i] <= q[i]  AND  exists i: p[i] < q[i]

All dimensions are MINIMIZED (the caller negates MAX dimensions before
invoking the kernel).  Duplicate / tied points do NOT dominate each other,
so every copy of a non-dominated point is retained — this matches the
reference's BNL (``FlinkSkyline.java:407-444``) and the duckdb NOT-EXISTS
oracle form.

Algorithm: sort-by-sum BNL.  If p dominates q then sum(p) < sum(q)
(at least one strictly smaller coordinate, none larger), so after sorting
ascending by coordinate sum a point can only be dominated by a point that
appears strictly earlier.  One forward pass with a growing skyline set and
no deletions replaces the reference's insert-and-evict BNL loop
(``FlinkSkyline.java:417-444``) and is fully vectorizable: candidates are
processed in blocks, each block is first screened against the accumulated
skyline with one broadcasted comparison, then intra-block dominance is
resolved with a pairwise matrix.  Dominance is transitive, so testing
against *all* earlier points (not only survivors) is sound for the
intra-block step.

Rows containing NaN are excluded (engine policy: a null/NaN dimension
excludes the row — the reference only ever drops fully-malformed CSV rows,
see SURVEY.md §7 semantic landmines).
"""

from __future__ import annotations

import numpy as np

# Candidate block size for the forward pass.  Big enough to amortize numpy
# dispatch, small enough that the (block x block x dims) intra-block tensor
# stays cache/memory friendly.
_BLOCK = 1024

# Cap on elements of the (block x |skyline| x dims) screening tensor; the
# skyline axis is chunked to stay below it (anti-correlated 4-D skylines can
# hold 100k+ points).
_SCREEN_ELEMS = 8_000_000


def _dominated_by(sky: np.ndarray, sky_sum: np.ndarray, cand: np.ndarray,
                  cand_sum: np.ndarray) -> np.ndarray:
    """Bool mask over ``cand``: dominated by some row of ``sky``.

    Requires every sky row to have sum <= every cand row's sum is NOT
    assumed; the strict-sum test encodes the 'exists strictly smaller'
    condition (all(<=) and sum< implies at least one <; all(<=) with equal
    sums means equality, which does not dominate).
    """
    m, d = cand.shape
    if sky.shape[0] == 0 or m == 0:
        return np.zeros(m, dtype=bool)
    out = np.zeros(m, dtype=bool)
    step = max(1, _SCREEN_ELEMS // max(1, m * d))
    for s in range(0, sky.shape[0], step):
        S = sky[s:s + step]
        ss = sky_sum[s:s + step]
        # (m, k, d) broadcast; all dims <= and strictly smaller sum
        dom = (S[None, :, :] <= cand[:, None, :]).all(axis=2)
        dom &= ss[None, :] < cand_sum[:, None]
        out |= dom.any(axis=1)
        if out.all():
            break
    return out


def skyline_mask(points: np.ndarray) -> np.ndarray:
    """Return a boolean mask selecting the skyline rows of ``points``.

    ``points``: (n, d) float array, all dims minimized.  NaN rows -> False.
    """
    pts = np.asarray(points, dtype=np.float64)
    if pts.ndim != 2:
        raise ValueError(f"points must be 2-D, got shape {pts.shape}")
    n, d = pts.shape
    if n == 0:
        return np.zeros(0, dtype=bool)
    valid = ~np.isnan(pts).any(axis=1)
    keep = np.zeros(n, dtype=bool)
    if not valid.any():
        return keep
    vidx = np.flatnonzero(valid)
    vp = pts[vidx]
    sums = vp.sum(axis=1)
    order = np.argsort(sums, kind="stable")
    sp = vp[order]
    ssum = sums[order]

    nv = sp.shape[0]
    keep_sorted = np.zeros(nv, dtype=bool)
    sky_blocks: list[np.ndarray] = []
    sky = np.empty((0, d), dtype=np.float64)
    sky_sum = np.empty((0,), dtype=np.float64)
    for i in range(0, nv, _BLOCK):
        cand = sp[i:i + _BLOCK]
        csum = ssum[i:i + _BLOCK]
        m = cand.shape[0]
        dominated = _dominated_by(sky, sky_sum, cand, csum)
        alive = np.flatnonzero(~dominated)
        if alive.size:
            A = cand[alive]
            As = csum[alive]
            # intra-block pairwise: dom[l, k] True iff A[l] <= A[k]
            # componentwise with strictly smaller sum (the strictness test)
            dom = (A[:, None, :] <= A[None, :, :]).all(axis=2)
            dom &= As[:, None] < As[None, :]
            intra_dominated = dom.any(axis=0)
            surv = alive[~intra_dominated]
            if surv.size:
                keep_sorted[i + surv] = True
                new = cand[surv]
                sky_blocks.append(new)
                sky = np.concatenate(sky_blocks, axis=0) if len(sky_blocks) > 1 else sky_blocks[0]
                sky_sum = sky.sum(axis=1)
    keep[vidx[order[keep_sorted.nonzero()[0]]]] = True
    return keep


def skyline_update(sky: np.ndarray | None, batch: np.ndarray) -> np.ndarray:
    """Merge ``batch`` into an existing skyline ``sky`` (or None) and return
    the new skyline array.  Used by the streaming/incremental path and by
    the per-partition mapInPandas accumulator: skyline-merge is associative
    and commutative (skyline(A ∪ B) = skyline(skyline(A) ∪ skyline(B))), the
    structural fact the reference's two-phase topology relies on
    (``FlinkSkyline.java:162-174``)."""
    if sky is None or sky.shape[0] == 0:
        allpts = np.asarray(batch, dtype=np.float64)
    else:
        allpts = np.concatenate([np.asarray(sky, dtype=np.float64),
                                 np.asarray(batch, dtype=np.float64)], axis=0)
    return allpts[skyline_mask(allpts)]


def skyline_mask_brute(points: np.ndarray) -> np.ndarray:
    """O(n^2) reference oracle for tests (<= a few thousand rows)."""
    pts = np.asarray(points, dtype=np.float64)
    n = pts.shape[0]
    keep = np.zeros(n, dtype=bool)
    valid = ~np.isnan(pts).any(axis=1)
    for i in range(n):
        if not valid[i]:
            continue
        p = pts[i]
        le = (pts[valid] <= p).all(axis=1)
        lt = (pts[valid] < p).any(axis=1)
        keep[i] = not (le & lt).any()
    return keep
