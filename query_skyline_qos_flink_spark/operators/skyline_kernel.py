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
(``FlinkSkyline.java:417-444``).  Dominance is transitive, so testing
against *all* earlier points (not only survivors) is sound for the
intra-block step.

All dominance tests are built from :func:`dominated_mask`, which works
column-at-a-time over (cand x sky) chunk matrices — it never materializes a
(m, k, d) tensor, and the strict-sum comparison goes first because it is
the most selective predicate (encodes 'exists strictly smaller': all(<=)
plus sum< implies some <; all(<=) with equal sums means equality, which
does not dominate).
"""

from __future__ import annotations

import numpy as np

# Candidate block size for the forward pass.
_BLOCK = 2048
# Sky-side chunk for dominated_mask (bounds temp bool matrices to
# cand_chunk x _K_CHUNK elements).
_K_CHUNK = 32768
# Cand-side chunk when screening large candidate sets (verify path).
_M_CHUNK = 4096


def dominated_mask(cand: np.ndarray, cand_sum: np.ndarray, sky: np.ndarray,
                   sky_sum: np.ndarray) -> np.ndarray:
    """Bool mask over ``cand``: dominated by some row of ``sky``.

    Safe when ``sky`` contains the candidate rows themselves (self-pairs
    and duplicates fail the strict-sum test), which is what the
    broadcast-verify merge phase relies on."""
    m = cand.shape[0]
    out = np.zeros(m, dtype=bool)
    if sky.shape[0] == 0 or m == 0:
        return out
    d = cand.shape[1]
    for ms in range(0, m, _M_CHUNK):
        me = min(m, ms + _M_CHUNK)
        sub = np.zeros(me - ms, dtype=bool)
        C = cand[ms:me]
        cs = cand_sum[ms:me]
        for ks in range(0, sky.shape[0], _K_CHUNK):
            alive = np.flatnonzero(~sub)
            if alive.size == 0:
                break
            S = sky[ks:ks + _K_CHUNK]
            ss = sky_sum[ks:ks + _K_CHUNK]
            A = C[alive]
            dom = ss[None, :] < cs[alive][:, None]
            for j in range(d):
                np.logical_and(dom, S[:, j][None, :] <= A[:, j][:, None], out=dom)
            sub[alive] |= dom.any(axis=1)
        out[ms:me] = sub
    return out


def _intra_dominated(A: np.ndarray, As: np.ndarray) -> np.ndarray:
    """Pairwise within one block: mask of rows dominated by another row."""
    dom = As[:, None] < As[None, :]  # (l, k): sum_l < sum_k
    for j in range(A.shape[1]):
        np.logical_and(dom, A[:, j][:, None] <= A[:, j][None, :], out=dom)
    return dom.any(axis=0)


def skyline_mask(points: np.ndarray) -> np.ndarray:
    """Return a boolean mask selecting the skyline rows of ``points``.

    ``points``: (n, d) float array, all dims minimized.  Rows containing
    NaN are excluded (engine policy: a null/NaN dimension excludes the
    row — SURVEY.md §7 semantic landmines)."""
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
        dominated = dominated_mask(cand, csum, sky, sky_sum)
        alive = np.flatnonzero(~dominated)
        if alive.size:
            A = cand[alive]
            surv = alive[~_intra_dominated(A, csum[alive])]
            if surv.size:
                keep_sorted[i + surv] = True
                sky_blocks.append(cand[surv])
                sky = np.concatenate(sky_blocks, axis=0) if len(sky_blocks) > 1 else sky_blocks[0]
                sky_sum = sky.sum(axis=1)
    keep[vidx[order[keep_sorted.nonzero()[0]]]] = True
    return keep


def skyline_update(sky: np.ndarray | None, batch: np.ndarray) -> np.ndarray:
    """Merge ``batch`` into an existing skyline ``sky`` (or None) and return
    the new skyline array.  Used by the streaming/incremental path:
    skyline-merge is associative and commutative (skyline(A ∪ B) =
    skyline(skyline(A) ∪ skyline(B))), the structural fact the reference's
    two-phase topology relies on (``FlinkSkyline.java:162-174``)."""
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
