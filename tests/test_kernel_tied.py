"""loop_scores_tied == loop_scores(exact_tiebreak=True), bit for bit.

The round-6 optimization collapses identical feature rows before the
(dist, id)-contract kNN (O(distinct^2) instead of O(rows^2) on
tie-heavy features — kernel.py docstring remedy, VERDICT r05 item 3).
These tests pin exact equality of every LoopResult stage against the
row-level reference path on the structures that exercise each branch:
duplicate-heavy data, exact cross-vector distance ties (grid / integer
line), boundary classes wider than the candidate window, giant tie
classes larger than k, and the all-equal guard.
"""

import numpy as np
import pytest

from pynomaly_spark.kernel import loop_scores, loop_scores_tied

# bit-identical always: the selected distance MULTISET per row is
# exact, and these stages consume only that
BIT_FIELDS = ("ssd", "standard_distance", "prob_distance")
# EV-downstream: when an exact distance tie spans several DISTINCT
# vectors, the neighborhood mean sums the same pdist values in a
# different order (vector-grouped vs id-interleaved) — equal-value
# reordering only, bounded at ulp scale and absorbed by the 6-dp
# rounding every caller applies
EV_FIELDS = ("prob_distance_ev", "plof", "eplof2", "nplof", "scores")


def _assert_identical(pts, k=10):
    a = loop_scores(pts, k, extent=3, exact_tiebreak=True)
    b = loop_scores_tied(pts, k, extent=3)
    for f in BIT_FIELDS:
        va, vb = np.asarray(getattr(a, f)), np.asarray(getattr(b, f))
        assert np.array_equal(va, vb, equal_nan=True), (
            f"{f}: max abs diff {np.nanmax(np.abs(va - vb))}"
        )
    for f in EV_FIELDS:
        va, vb = np.asarray(getattr(a, f)), np.asarray(getattr(b, f))
        assert np.allclose(va, vb, rtol=1e-9, atol=1e-12, equal_nan=True), (
            f"{f}: max abs diff {np.nanmax(np.abs(va - vb))}"
        )
        assert np.array_equal(
            np.round(va, 6), np.round(vb, 6), equal_nan=True
        ), f"{f}: 6-dp rounding flipped"
    assert abs(a.nplof_max - b.nplof_max) <= 1e-12
    assert abs(a.mean_prob_distance_ev - b.mean_prob_distance_ev) <= 1e-12


def test_duplicate_heavy():
    rng = np.random.default_rng(0)
    base = rng.integers(0, 8, size=(40, 2)).astype(float)
    reps = rng.integers(1, 30, size=40)
    _assert_identical(np.repeat(base, reps, axis=0))


def test_grid_cross_vector_ties():
    # integer grid: many pairs of DISTINCT vectors at exactly equal
    # float distances (symmetric placements) — exercises the
    # multi-vector boundary-class id merge
    rng = np.random.default_rng(1)
    g = np.array(
        [[float(i), float(j)] for i in range(6) for j in range(6)]
    )
    _assert_identical(np.repeat(g, rng.integers(1, 5, size=len(g)), axis=0))


def test_integer_line_ties():
    # 1-D integers: left/right neighbors tie exactly at every radius
    rng = np.random.default_rng(2)
    v = np.repeat(np.arange(20.0), rng.integers(1, 6, size=20))
    _assert_identical(v.reshape(-1, 1))


def test_giant_tie_class_exceeds_k():
    # one vector with multiplicity >> k: every member's whole
    # neighborhood is its own zero-distance class
    rng = np.random.default_rng(3)
    pts = np.vstack(
        [np.full((200, 2), 0.5), rng.normal(size=(30, 2))]
    )
    _assert_identical(pts)


def test_all_equal_guard():
    _assert_identical(np.full((25, 3), 1.23))


def test_boundary_class_wider_than_candidate_window():
    # >4k+8 distinct vectors all at the same distance from a center
    # (points on a circle): the vectorized candidate window cannot
    # contain the boundary class -> per-row full-width fallback
    n = 70  # > L = 4*10+8 = 48 tied vectors
    ang = 2 * np.pi * np.arange(n) / n
    circle = np.stack([np.cos(ang), np.sin(ang)], axis=1)
    pts = np.vstack([[[0.0, 0.0]], circle, circle * 3.0])
    _assert_identical(pts)


def test_unique_rows_delegate_to_row_path():
    rng = np.random.default_rng(4)
    pts = rng.normal(size=(300, 3))
    _assert_identical(pts)


def test_nan_features_fall_back():
    rng = np.random.default_rng(5)
    pts = rng.normal(size=(50, 3))
    pts[7, 1] = np.nan
    _assert_identical(pts)


def test_group_too_small_raises():
    with pytest.raises(ValueError):
        loop_scores_tied(np.zeros((5, 2)), 10)


def test_doc_feature_shaped():
    # ln(1+...) features from synthetic integer (chars, tokens) pairs —
    # the doc_drift_loop shape with realistic duplicate mass
    rng = np.random.default_rng(6)
    nt = rng.integers(1, 40, size=2000).astype(float)
    nc = nt * rng.integers(3, 9, size=2000)
    pts = np.stack(
        [np.log1p(nc), np.log1p(nt), np.log1p(nc / np.maximum(nt, 1.0))],
        axis=1,
    )
    _assert_identical(pts)
