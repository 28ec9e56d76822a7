"""Exception/warning message-contract tests (reference parity).

Each exact message mirrors /root/reference/tests/test_loop.py (cited per
test); a user porting from the reference library sees identical behavior.
"""

import numpy as np
import pytest

from pynomaly_spark.api import (
    ClusterSizeError,
    LocalOutlierProbability,
    MissingValuesError,
)


@pytest.fixture()
def X_n140_outliers():
    rng2 = np.random.RandomState(2)
    X_n120 = 0.3 * rng2.randn(120, 2)
    rng = np.random.RandomState(0)
    rng.permutation(150)
    return np.r_[X_n120, rng.uniform(low=-4, high=4, size=(20, 2))]


def test_missing_values():  # ref :570-586
    X = np.array([1.3, 1.1, 0.9, 1.4, 1.5, np.nan, 3.2])
    clf = LocalOutlierProbability(X, n_neighbors=3)
    with pytest.raises(MissingValuesError) as record:
        clf.fit()
    assert (
        str(record.value)
        == "Method does not support missing values in input data."
    )


def test_small_cluster_size(X_n140_outliers):  # ref :589-615
    cluster_labels = [0] * 120 + [1] * 18
    clf = LocalOutlierProbability(
        X_n140_outliers, n_neighbors=50, cluster_labels=cluster_labels
    )
    with pytest.raises(ClusterSizeError) as record:
        clf.fit()
    assert (
        str(record.value)
        == "Number of neighbors specified larger than smallest "
        "cluster. Specify a number of neighbors smaller than "
        "the smallest cluster size (observations in smallest "
        "cluster minus one)."
    )


def test_neighbors_zero():  # ref :277-296
    X = np.random.RandomState(7).rand(20, 2)
    clf = LocalOutlierProbability(X, n_neighbors=0)
    with pytest.warns(UserWarning, match="n_neighbors must be greater than 0"):
        clf.fit()
    assert clf.n_neighbors == 10


def test_neighbors_clamped_to_n_minus_1():  # ref :515-534
    X = np.random.RandomState(7).rand(25, 4)
    clf = LocalOutlierProbability(X, n_neighbors=500)
    with pytest.warns(UserWarning) as record:
        clf.fit()
    assert len(record) == 1
    assert clf.n_neighbors == X.shape[0] - 1


def test_bad_extent():  # ref :537-550
    X = np.array([[1, 1], [1, 0]])
    with pytest.warns(UserWarning) as record:
        LocalOutlierProbability(X, n_neighbors=2, extent=4)
    assert len(record) == 1
    assert "extent parameter (lambda) must be 1, 2, or 3." in str(
        record[0].message
    )


def test_list_input_warns():  # ref :553-567
    X = [1.3, 1.1, 0.9, 1.4, 1.5, 3.2]
    with pytest.warns(UserWarning) as record:
        clf = LocalOutlierProbability(X, n_neighbors=3)
        clf.fit()
    assert len(record) >= 1
    scores = clf.local_outlier_probabilities
    assert scores is not None and len(scores) == 6


def test_no_input_warns():  # ref :233-246
    with pytest.warns(UserWarning, match="Data or a distance matrix must be provided."):
        LocalOutlierProbability()


def test_both_inputs_warn():
    X = np.random.RandomState(3).rand(12, 2)
    d = np.random.RandomState(4).rand(12, 10)
    with pytest.warns(
        UserWarning, match="Only one of the following may be provided"
    ):
        LocalOutlierProbability(X, distance_matrix=d, neighbor_matrix=d)


def test_matrix_shape_mismatch_warns():
    d = np.random.RandomState(4).rand(12, 10)
    idx = np.random.RandomState(5).randint(0, 12, (12, 9))
    with pytest.warns(
        UserWarning, match="shape of the distance and neighbor"
    ):
        LocalOutlierProbability(distance_matrix=d, neighbor_matrix=idx)


def test_matrix_k_mismatch_warns():
    d = np.random.RandomState(4).rand(12, 9)
    idx = np.random.RandomState(5).randint(0, 12, (12, 9))
    with pytest.warns(
        UserWarning,
        match="does not match the number of neighbors",
    ):
        LocalOutlierProbability(
            distance_matrix=d, neighbor_matrix=idx, n_neighbors=10
        )


def test_bad_njobs_warns():
    X = np.random.RandomState(3).rand(12, 2)
    with pytest.warns(UserWarning, match="n_jobs must be -1 or a positive integer"):
        clf = LocalOutlierProbability(X, n_jobs=-3)
    assert clf.n_jobs == 1


def test_stream_before_fit_warns(X_n140_outliers):  # ref :618-638
    X_train = X_n140_outliers[0:138]
    X_test = X_n140_outliers[139]
    clf = LocalOutlierProbability(X_train)
    with pytest.warns(UserWarning) as record:
        clf.stream(X_test)
    messages = [i.message.args[0] for i in record]
    assert (
        "Must fit on historical data by calling fit() prior to "
        "calling stream(x)." in messages
    )


def test_stream_cluster_warns(X_n140_outliers):  # ref :680-709
    cluster_labels = [0] * 120 + [1] * 18
    X_train = X_n140_outliers[0:138]
    X_test = X_n140_outliers[139]
    clf = LocalOutlierProbability(
        X_train, cluster_labels=cluster_labels
    ).fit()
    with pytest.warns(UserWarning) as record:
        clf.stream(X_test)
    assert len(record) == 1
    assert (
        record[0].message.args[0]
        == "Stream approach does not support clustered data. "
        "Automatically refit using single cluster of points."
    )


def test_fitted_attributes(X_n140_outliers):  # ref :488-512
    clf = LocalOutlierProbability(X_n140_outliers[:120]).fit()
    assert clf.n_neighbors is not None
    assert clf.extent is not None
    assert clf.prob_distances is not None
    assert clf.prob_distances_ev is not None
    assert clf.norm_prob_local_outlier_factor is not None
    assert clf.local_outlier_probabilities is not None
    assert clf.is_fit


def test_dataframe_input(X_n140_outliers):
    pd = pytest.importorskip("pandas")
    X = X_n140_outliers[:20]
    scores_np = LocalOutlierProbability(X, n_neighbors=5).fit().local_outlier_probabilities
    scores_df = (
        LocalOutlierProbability(pd.DataFrame(X), n_neighbors=5)
        .fit()
        .local_outlier_probabilities
    )
    np.testing.assert_array_almost_equal(scores_np, scores_df, decimal=12)
