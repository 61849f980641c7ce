"""Kernel unit/property tests (SURVEY.md §5.3: brute-force oracle,
idempotence, containment, duplicate retention, NaN policy)."""

from __future__ import annotations

import numpy as np
import pytest

from query_skyline_qos_flink_spark.operators.skyline_kernel import (
    skyline_mask,
    skyline_mask_brute,
    skyline_update,
)


@pytest.mark.parametrize("n,d,seed", [(0, 2, 0), (1, 3, 1), (17, 2, 2), (500, 2, 3),
                                      (2000, 3, 4), (1500, 4, 5), (3000, 2, 6)])
def test_matches_bruteforce(n, d, seed):
    rng = np.random.default_rng(seed)
    pts = rng.integers(0, 40, size=(n, d)).astype(float)  # small domain -> many ties
    assert (skyline_mask(pts) == skyline_mask_brute(pts)).all()


def test_duplicates_retained():
    pts = np.array([[1.0, 1.0], [1.0, 1.0], [0.0, 2.0], [2.0, 0.0], [2.0, 2.0]])
    assert skyline_mask(pts).tolist() == [True, True, True, True, False]


def test_all_identical_points_survive():
    pts = np.ones((100, 3))
    assert skyline_mask(pts).all()


def test_nan_rows_excluded():
    pts = np.array([[np.nan, 1.0], [1.0, 1.0], [np.nan, np.nan]])
    assert skyline_mask(pts).tolist() == [False, True, False]


def test_idempotence_and_containment():
    rng = np.random.default_rng(9)
    pts = rng.random((4000, 3))
    m = skyline_mask(pts)
    sky = pts[m]
    assert skyline_mask(sky).all()  # skyline(skyline(T)) == skyline(T)
    assert sky.shape[0] <= pts.shape[0]


def test_incremental_update_equals_batch():
    rng = np.random.default_rng(11)
    pts = rng.random((5000, 3))
    sky = None
    for i in range(0, 5000, 700):
        sky = skyline_update(sky, pts[i:i + 700])
    ref = pts[skyline_mask(pts)]
    assert sorted(map(tuple, sky)) == sorted(map(tuple, ref))


def test_partition_invariance_random_splits():
    """skyline(T) == skyline(union of per-part skylines) for random splits —
    the associativity fact the two-phase operator relies on."""
    rng = np.random.default_rng(13)
    pts = rng.integers(0, 60, size=(3000, 3)).astype(float)
    ref = sorted(map(tuple, pts[skyline_mask(pts)]))
    for parts in (2, 5, 16):
        assign = rng.integers(0, parts, size=3000)
        partials = [pts[(assign == p)] for p in range(parts)]
        locals_ = [q[skyline_mask(q)] for q in partials if q.size]
        merged = np.concatenate(locals_, axis=0)
        got = sorted(map(tuple, merged[skyline_mask(merged)]))
        assert got == ref
