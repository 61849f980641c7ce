"""Hypothesis property tests for the skyline kernel (SURVEY.md §5.3)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from query_skyline_qos_flink_spark.operators.skyline_kernel import (
    skyline_mask,
    skyline_mask_brute,
    skyline_update,
)


points_strategy = st.integers(min_value=1, max_value=400).flatmap(
    lambda n: st.integers(min_value=1, max_value=4).flatmap(
        lambda d: st.lists(
            st.lists(
                st.one_of(
                    st.integers(min_value=0, max_value=12).map(float),
                    st.floats(min_value=0, max_value=100, allow_nan=False, width=32),
                ),
                min_size=d, max_size=d,
            ),
            min_size=n, max_size=n,
        )
    )
)


@settings(max_examples=60, deadline=None)
@given(points_strategy)
def test_kernel_equals_bruteforce(rows):
    pts = np.asarray(rows, dtype=np.float64)
    assert (skyline_mask(pts) == skyline_mask_brute(pts)).all()


@settings(max_examples=40, deadline=None)
@given(points_strategy, st.integers(min_value=1, max_value=7))
def test_partition_invariance(rows, parts):
    pts = np.asarray(rows, dtype=np.float64)
    ref = sorted(map(tuple, pts[skyline_mask(pts)]))
    assign = np.arange(len(pts)) % parts
    sky = None
    for p in range(parts):
        sub = pts[assign == p]
        if len(sub):
            sky = skyline_update(sky, sub)
    assert sorted(map(tuple, sky)) == ref


@settings(max_examples=40, deadline=None)
@given(points_strategy)
def test_idempotence_containment_duplicates(rows):
    pts = np.asarray(rows, dtype=np.float64)
    mask = skyline_mask(pts)
    sky = pts[mask]
    assert skyline_mask(sky).all()  # idempotent
    # duplicate retention: every copy of a surviving value-tuple survives
    surviving = {tuple(r) for r in sky}
    for i, row in enumerate(pts):
        if tuple(row) in surviving:
            assert mask[i]
