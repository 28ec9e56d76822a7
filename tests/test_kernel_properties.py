"""Property-based kernel invariants (hypothesis).

Complements the golden fixtures with randomized structural guarantees:
scores bounded, permutation equivariance, kNN exactness vs brute force,
and scale behavior of the pipeline stages.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from pynomaly_spark import kernel

settings.register_profile("kernel", max_examples=25, deadline=None)
settings.load_profile("kernel")


def _points(draw, n_min=12, n_max=60, d_max=4):
    n = draw(st.integers(n_min, n_max))
    d = draw(st.integers(1, d_max))
    seed = draw(st.integers(0, 2**31 - 1))
    return np.random.RandomState(seed).randn(n, d), n, d


@st.composite
def point_sets(draw):
    return _points(draw)


@given(point_sets(), st.integers(2, 8), st.sampled_from([1, 2, 3]))
def test_scores_bounded_and_finite(ps, k, extent):
    pts, n, _ = ps
    k = min(k, n - 1)
    res = kernel.loop_scores(pts, n_neighbors=k, extent=extent)
    assert np.all(res.scores >= 0.0) and np.all(res.scores <= 1.0)
    assert np.all(np.isfinite(res.scores))
    assert res.nplof_max >= 0.0


@given(point_sets(), st.integers(2, 8))
def test_permutation_equivariance(ps, k):
    """Scores follow rows under any permutation (the reference's flip
    invariance, generalized)."""
    pts, n, _ = ps
    k = min(k, n - 1)
    rng = np.random.RandomState(0)
    perm = rng.permutation(n)
    a = kernel.loop_scores(pts, n_neighbors=k).scores
    b = kernel.loop_scores(pts[perm], n_neighbors=k).scores
    np.testing.assert_allclose(a[perm], b, atol=1e-9)


@given(point_sets(), st.integers(2, 8))
def test_knn_matches_bruteforce(ps, k):
    """The two-stage f32/f64 selection returns the exact k smallest
    distances (as a multiset) of the brute-force matrix."""
    pts, n, _ = ps
    k = min(k, n - 1)
    d, ids = kernel.knn(pts, k)
    full = np.sqrt(
        np.maximum(
            ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1), 0.0
        )
    )
    np.fill_diagonal(full, np.inf)
    brute = np.sort(full, axis=1)[:, :k]
    np.testing.assert_allclose(np.sort(d, axis=1), brute, atol=1e-9)
    # ids index real rows and never self
    assert np.all(ids >= 0) and np.all(ids < n)
    assert np.all(ids != np.arange(n)[:, None])


@given(point_sets())
def test_translation_invariance(ps):
    """Euclidean kNN and LoOP are translation-invariant."""
    pts, n, d = ps
    k = min(5, n - 1)
    a = kernel.loop_scores(pts, n_neighbors=k).scores
    b = kernel.loop_scores(pts + 1000.0, n_neighbors=k).scores
    np.testing.assert_allclose(a, b, atol=1e-5)


@given(point_sets(), st.integers(2, 6))
def test_stream_scorer_bounded(ps, k):
    pts, n, _ = ps
    k = min(k, n - 1)
    res = kernel.loop_scores(pts, n_neighbors=k)
    rng = np.random.RandomState(1)
    new = rng.randn(7, pts.shape[1]) * 3
    scores = kernel.score_new_points(
        new, pts, k, 3, res.mean_prob_distance_ev, res.nplof_max
    )
    assert np.all(scores >= 0.0) and np.all(scores <= 1.0)


def test_narrow_tail_block_regression():
    """Regression (round-2 ADVICE): a column block narrower than n_cand
    crashed argpartition with 'kth out of bounds'.  Exercise tail widths
    below, at, and above n_cand via the col_block override and check
    exact parity with the one-shot path."""
    rng = np.random.RandomState(42)
    pts = rng.randn(1000, 3)
    k = 10  # n_cand = 20
    d_ref, i_ref = kernel.knn(pts, k)
    for blk in (997, 990, 980, 256, 64):  # tails w = 3, 10, 20, 232, 40
        d, ids = kernel.knn(pts, k, col_block=blk)
        np.testing.assert_allclose(
            np.sort(d, axis=1), np.sort(d_ref, axis=1), atol=1e-9
        )
        for a, b in zip(ids, i_ref):
            assert set(a) == set(b)


def test_blocked_path_over_65536_shape():
    """The production blocked path (m > 65536) must not crash on the tail
    block; cover the exact >65536 trigger with a tiny col_block stand-in
    plus a direct small-scale replica of the 65546-row geometry."""
    rng = np.random.RandomState(7)
    # replica of the crash geometry: m = 15 * blk + tail, tail < n_cand
    pts = rng.randn(15 * 40 + 6, 2)  # tail 6 < n_cand 20
    d, ids = kernel.knn(pts, 10, col_block=40)
    assert d.shape == (606, 10)
    assert np.all(np.isfinite(d)) and np.all(ids >= 0)
