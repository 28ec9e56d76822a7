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


def test_exact_tiebreak_matches_lexicographic_bruteforce():
    """exact_tiebreak=True must select neighbors by (squared distance,
    row position) lexicographic order — the cross-engine ORDER BY
    (dist, id) contract — including on tie-HEAVY inputs where the
    default argpartition subset is arbitrary."""
    rng = np.random.default_rng(42)
    # heavy ties: only 6 distinct rows replicated across 60 positions
    base = rng.integers(0, 4, size=(6, 3)).astype(np.float64)
    pts = base[rng.integers(0, 6, size=60)]
    k = 5
    d, ids = kernel.knn(pts, k, exact_tiebreak=True)
    for i in range(len(pts)):
        sq = np.sum((pts - pts[i]) ** 2, axis=1)
        sq[i] = np.inf
        order = sorted(range(len(pts)), key=lambda j: (sq[j], j))
        expect = order[:k]
        # stable argsort returns the selection IN (sq, position) order
        assert ids[i].tolist() == expect, i
        # multiset of distances must be the true k-smallest either way
        np.testing.assert_allclose(
            np.sort(d[i] ** 2), np.sort(sq[expect]), rtol=0, atol=1e-12
        )


def test_exact_tiebreak_equals_default_on_tie_free_data():
    """On tie-free data both selection strategies return the same
    k-smallest multiset, so every LoOP stage is identical."""
    rng = np.random.default_rng(7)
    pts = rng.normal(size=(80, 4))
    a = kernel.loop_scores(pts, n_neighbors=10)
    b = kernel.loop_scores(pts, n_neighbors=10, exact_tiebreak=True)
    np.testing.assert_allclose(a.scores, b.scores, atol=1e-12)
    np.testing.assert_allclose(a.prob_distance_ev, b.prob_distance_ev, atol=1e-12)


def test_exact_tiebreak_grouped_labels():
    """Tie-break selection never crosses group boundaries."""
    rng = np.random.default_rng(3)
    pts = np.repeat(rng.normal(size=(8, 2)), 6, axis=0)  # 48 rows, ties
    labels = np.array([0] * 24 + [1] * 24)
    _, ids = kernel.knn(pts, 4, labels=labels, exact_tiebreak=True)
    assert (ids[:24] < 24).all() and (ids[24:] >= 24).all()
