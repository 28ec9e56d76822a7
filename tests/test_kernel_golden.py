"""Golden-parity tests for the LoOP kernel (no Spark).

Fixtures and tolerances reproduce the reference suite
(/root/reference/tests/test_loop.py); literals copied verbatim where the
reference hard-codes them (X_n8 :46-57, X_n20 + expected scores :60-116).
sklearn is not available in this environment, so `check_random_state(s)`
is `np.random.RandomState(s)` (same generator sklearn wraps) and ROC-AUC
is computed with a rank-based formula.
"""

import numpy as np
import pytest
from numpy.testing import assert_array_almost_equal, assert_array_equal

from pynomaly_spark import kernel
from pynomaly_spark.api import LocalOutlierProbability


def rank_auc(labels: np.ndarray, scores: np.ndarray) -> float:
    """ROC-AUC via the Mann-Whitney U statistic (ties get average rank)."""
    order = np.argsort(scores)
    ranks = np.empty(len(scores), dtype=float)
    ranks[order] = np.arange(1, len(scores) + 1)
    # average ranks for ties
    sorted_scores = scores[order]
    i = 0
    while i < len(sorted_scores):
        j = i
        while j + 1 < len(sorted_scores) and sorted_scores[j + 1] == sorted_scores[i]:
            j += 1
        if j > i:
            ranks[order[i : j + 1]] = ranks[order[i : j + 1]].mean()
        i = j + 1
    pos = labels == 1
    n_pos, n_neg = pos.sum(), (~pos).sum()
    return (ranks[pos].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)


@pytest.fixture()
def X_n8():
    return np.array(
        [[-2, -1], [-1, -1], [-1, -2], [1, 2], [1, 2], [2, 1], [5, 3], [-4, 2]]
    )


@pytest.fixture()
def X_n20_scores():
    input_data = np.array(
        [
            0.02059752, 0.32629926, 0.63036653, 0.94409321, 0.63251097,
            0.47598494, 0.80204026, 0.34845067, 0.81556468, 0.89183,
            0.25210317, 0.11460502, 0.19953434, 0.36955067, 0.06038041,
            0.34527368, 0.56621582, 0.90533649, 0.33773613, 0.71573306,
        ]
    )
    expected_scores = np.array(
        [
            0.6356276742921594, 0.0, 0.0, 0.48490790006974044, 0.0,
            0.0, 0.0, 0.0, 0.021728288376168012, 0.28285086151683225,
            0.0, 0.18881886507113213, 0.0, 0.0, 0.45350246469681843,
            0.0, 0.07886635748113013, 0.3349068501560546, 0.0, 0.0,
        ]
    )
    return input_data, expected_scores


@pytest.fixture()
def X_n120():
    rng = np.random.RandomState(2)
    return 0.3 * rng.randn(120, 2)


@pytest.fixture()
def X_n140_outliers(X_n120):
    # reference module-level rng has consumed a 150-element permutation
    # (the iris shuffle) before drawing the outliers — reproduce that.
    rng = np.random.RandomState(0)
    rng.permutation(150)
    X_outliers = rng.uniform(low=-4, high=4, size=(20, 2))
    return np.r_[X_n120, X_outliers]


def test_loop_toy_outliers(X_n8):
    clf = LocalOutlierProbability(X_n8, n_neighbors=5)
    score = clf.fit().local_outlier_probabilities
    share_outlier = 2.0 / 8.0
    predictions = [-1 if s > share_outlier else 1 for s in score]
    assert_array_equal(predictions, 6 * [1] + 2 * [-1])
    assert np.min(score[-2:]) > np.max(score[:-2])


def test_golden_regression(X_n20_scores):
    input_data, expected_scores = X_n20_scores
    clf = LocalOutlierProbability(input_data).fit()
    assert_array_almost_equal(
        clf.local_outlier_probabilities, expected_scores, 6
    )


def test_golden_regression_kernel_direct(X_n20_scores):
    """The raw kernel (what the Spark UDF runs) must hit the same goldens."""
    input_data, expected_scores = X_n20_scores
    res = kernel.loop_scores(input_data, n_neighbors=10, extent=3)
    assert_array_almost_equal(res.scores, expected_scores, 6)


def test_loop_performance_auc(X_n140_outliers):
    X_test = X_n140_outliers
    labels = np.r_[np.repeat(-1, 120), np.repeat(1, 20)]  # 1 = outlier
    res = kernel.loop_scores(X_test, n_neighbors=X_test.shape[0] - 1, extent=3)
    assert rank_auc(labels == 1, res.scores) >= 0.98


def test_lambda_monotonicity(X_n140_outliers):
    means = [
        np.mean(kernel.loop_scores(X_n140_outliers, 10, extent=e).scores)
        for e in (1, 2, 3)
    ]
    assert means[0] > means[1] > means[2]


def test_data_flipping():
    np.random.seed(1)
    n = 9
    data = np.append(
        np.random.normal(2, 1, [n, 2]), np.random.normal(8, 1, [n, 2]), axis=0
    )
    clus = np.append(np.ones(n), 2 * np.ones(n)).tolist()
    fit = LocalOutlierProbability(data, n_neighbors=5, cluster_labels=clus).fit()
    res = fit.local_outlier_probabilities

    data_flipped = np.flipud(data)
    clus_flipped = np.flipud(clus).tolist()
    fit2 = LocalOutlierProbability(
        data_flipped, n_neighbors=5, cluster_labels=clus_flipped
    ).fit()
    res2 = np.flipud(fit2.local_outlier_probabilities)

    assert_array_almost_equal(res, res2, decimal=6)
    assert_array_almost_equal(
        fit.norm_prob_local_outlier_factor,
        fit2.norm_prob_local_outlier_factor,
        decimal=6,
    )


def test_matrix_mode_consistency(X_n120):
    """Precomputed-kNN entry point matches data mode to 10 decimals
    (reference contract at tests/test_loop.py:788-829, self-stripped)."""
    d, ids = kernel.knn(X_n120, 10)
    scores_data = LocalOutlierProbability(X_n120).fit().local_outlier_probabilities
    scores_mat = (
        LocalOutlierProbability(distance_matrix=d, neighbor_matrix=ids)
        .fit()
        .local_outlier_probabilities
    )
    assert_array_almost_equal(scores_data, scores_mat, decimal=10)


def test_1d_path():
    X = np.array([1.0, 2.0, 3.0, 10.0, 11.0, 12.0, 50.0])
    scores = LocalOutlierProbability(X, n_neighbors=3).fit().local_outlier_probabilities
    assert scores[-1] > 0


def test_stream_performance(X_n140_outliers):
    X_train = X_n140_outliers[0:100]
    X_test = X_n140_outliers[100:140]

    scores_full = (
        LocalOutlierProbability(X_n140_outliers).fit().local_outlier_probabilities
    )
    m_train = LocalOutlierProbability(X_train).fit()
    X_train_scores = m_train.local_outlier_probabilities
    X_test_scores = np.array([m_train.stream(X_test[i]) for i in range(40)])
    stream_scores = np.hstack((X_train_scores, X_test_scores))
    rmse = np.sqrt(((scores_full - stream_scores) ** 2).mean(axis=None))
    assert 0.35 > rmse


def test_stream_batch_scorer_matches_pointwise(X_n140_outliers):
    """The vectorized batch scorer (Spark streaming path) must equal the
    point-at-a-time stream() exactly."""
    X_train = X_n140_outliers[0:100]
    X_test = X_n140_outliers[100:140]
    m = LocalOutlierProbability(X_train).fit()
    pointwise = np.array([float(m.stream(X_test[i])) for i in range(40)])
    batch = kernel.score_new_points(
        X_test,
        X_train,
        n_neighbors=m.n_neighbors,
        extent=m.extent,
        mean_prob_distance_ev=float(m.prob_distances_ev.mean()),
        nplof_max=m.norm_prob_local_outlier_factor,
    )
    assert_array_almost_equal(pointwise, batch, decimal=12)
