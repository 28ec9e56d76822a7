"""Library-compatible LoOP API.

A drop-in equivalent of the reference library's public surface
(PyNomaly 0.4.0): ``LocalOutlierProbability`` with ``fit()`` / ``stream()``,
the exception hierarchy, and the exact warning/exception message contract
exercised by the reference test suite (``/root/reference/tests/test_loop.py``).

The math lives in :mod:`pynomaly_spark.kernel`; this module is the
validation shell.  It exists so that a user of the reference library can
switch imports and keep their code running; the Spark engine
(:mod:`pynomaly_spark.drift`, :mod:`pynomaly_spark.checks`) shares the same
kernel and therefore the same numerics.

Message/behavior contract citations into ``/root/reference/PyNomaly/loop.py``:
ctor type warnings :359-423; input XOR + matrix conformance :202-255; cluster
size gate :257-273; n_neighbors clamps :275-298; extent domain :300-311;
missing values :313-322; stream guards :324-353; n_jobs domain :459-464;
numba fallback :453-457.
"""

from __future__ import annotations

import sys
import warnings
from typing import Optional

import numpy as np

from .kernel import (
    _SENTINEL,
    _local_outlier_probability,
    _prob_outlier_factor,
    knn,
    loop_from_knn,
)

__all__ = [
    "LocalOutlierProbability",
    "PyNomalyError",
    "ValidationError",
    "ClusterSizeError",
    "MissingValuesError",
    "Utils",
]


class PyNomalyError(Exception):
    """Base exception for the LoOP API."""


class ValidationError(PyNomalyError):
    """Raised when input validation fails."""


class ClusterSizeError(ValidationError):
    """Raised when cluster size is smaller than n_neighbors."""


class MissingValuesError(ValidationError):
    """Raised when data contains missing values."""


class Utils:
    @staticmethod
    def emit_progress_bar(progress: str, index: int, total: int) -> str:
        """Text progress bar on stdout (API parity; the Spark engine reports
        progress through per-partition metrics rows instead)."""
        import shutil

        w = shutil.get_terminal_size((80, 24)).columns
        sys.stdout.write("\r")
        block_size = int(w / total) if total < w else int(total / w)
        if block_size and index % block_size == 0:
            progress += "="
        sys.stdout.write("[ %s ] %.2f%%" % (progress, (index / total) * 100))
        sys.stdout.flush()
        return progress


_CTOR_TYPES = {
    "data": np.ndarray,
    "distance_matrix": np.ndarray,
    "neighbor_matrix": np.ndarray,
    "extent": (int, np.integer),
    "n_neighbors": (int, np.integer),
    "cluster_labels": list,
    "use_numba": bool,
    "n_jobs": (int, np.integer),
    "progress_bar": bool,
}


def _to_array(obj):
    """Coerce DataFrame/ndarray/list input to ndarray with the reference's
    warning for unsupported containers (loop.py:176-200)."""
    if obj.__class__.__name__ == "DataFrame":
        return obj.values
    if obj.__class__.__name__ == "ndarray":
        return obj
    warnings.warn(
        "Provided data or distance matrix must be in ndarray or DataFrame.",
        UserWarning,
    )
    if isinstance(obj, list):
        return np.array(obj)
    return np.array([obj])


class LocalOutlierProbability:
    """LoOP scorer over a float feature matrix, or over precomputed
    distance/neighbor matrices (the custom-metric entry point).

    Parameters and defaults mirror the reference (extent=3, n_neighbors=10,
    single cluster when ``cluster_labels`` is None).  ``use_numba``/``n_jobs``
    are accepted for API compatibility; parallelism in this engine comes from
    Spark executors, so they only trigger the reference's fallback warnings.
    """

    def __init__(
        self,
        data=None,
        distance_matrix=None,
        neighbor_matrix=None,
        extent=3,
        n_neighbors=10,
        cluster_labels=None,
        use_numba=False,
        n_jobs=1,
        progress_bar=False,
    ) -> None:
        for name, val in (
            ("data", data),
            ("distance_matrix", distance_matrix),
            ("neighbor_matrix", neighbor_matrix),
            ("extent", extent),
            ("n_neighbors", n_neighbors),
            ("cluster_labels", cluster_labels),
            ("use_numba", use_numba),
            ("n_jobs", n_jobs),
            ("progress_bar", progress_bar),
        ):
            t = _CTOR_TYPES[name]
            if val is None:
                continue
            v = np.array(val) if type(val).__name__ == "DataFrame" else val
            if not isinstance(v, t):
                warnings.warn(
                    "Argument %r is not of type %s." % (name, t), UserWarning
                )

        self.data = data
        self.distance_matrix = distance_matrix
        self.neighbor_matrix = neighbor_matrix
        self.extent = extent
        self.n_neighbors = n_neighbors
        self.cluster_labels = cluster_labels
        self.use_numba = use_numba
        self.n_jobs = n_jobs
        self.progress_bar = progress_bar
        self.points_vector = None
        self.prob_distances = None
        self.prob_distances_ev = None
        self.norm_prob_local_outlier_factor = None
        self.local_outlier_probabilities = None
        self.is_fit = False

        if self.use_numba is True and "numba" not in sys.modules:
            self.use_numba = False
            warnings.warn(
                "Numba is not available, falling back to pure python mode.",
                UserWarning,
            )

        if self.n_jobs < -1 or self.n_jobs == 0:
            warnings.warn(
                "n_jobs must be -1 or a positive integer. Defaulting to 1.",
                UserWarning,
            )
            self.n_jobs = 1

        self._validate_inputs()
        self._check_extent()

    # ---------------- validation (exact message contract) ----------------

    def _validate_inputs(self):
        if all(v is None for v in [self.data, self.distance_matrix]):
            warnings.warn(
                "Data or a distance matrix must be provided.", UserWarning
            )
            return False
        if all(v is not None for v in [self.data, self.distance_matrix]):
            warnings.warn(
                "Only one of the following may be provided: data or a "
                "distance matrix (not both).",
                UserWarning,
            )
            return False
        if self.data is not None:
            self.points_vector = _to_array(self.data)
            return True
        if any(m is None for m in [self.neighbor_matrix, self.distance_matrix]):
            warnings.warn(
                "A neighbor index matrix and distance matrix must both be "
                "provided when not using raw input data.",
                UserWarning,
            )
            return False
        if self.distance_matrix.shape != self.neighbor_matrix.shape:
            warnings.warn(
                "The shape of the distance and neighbor "
                "index matrices must match.",
                UserWarning,
            )
            return False
        if (self.distance_matrix.shape[1] != self.n_neighbors) or (
            self.neighbor_matrix.shape[1] != self.n_neighbors
        ):
            warnings.warn(
                "The shape of the distance or "
                "neighbor index matrix does not "
                "match the number of neighbors "
                "specified.",
                UserWarning,
            )
            return False
        return True

    def _n_observations(self) -> int:
        if self.data is not None:
            return len(self.data)
        return len(self.distance_matrix)

    def _cluster_labels(self) -> np.ndarray:
        if self.cluster_labels is None:
            return np.zeros(self._n_observations(), dtype=np.int64)
        return np.array(self.cluster_labels)

    def _check_cluster_size(self) -> None:
        labels = self._cluster_labels()
        for cluster_id in set(labels.tolist()):
            if int((labels == cluster_id).sum()) <= self.n_neighbors:
                raise ClusterSizeError(
                    "Number of neighbors specified larger than smallest "
                    "cluster. Specify a number of neighbors smaller than "
                    "the smallest cluster size (observations in smallest "
                    "cluster minus one)."
                )

    def _check_n_neighbors(self) -> None:
        if not self.n_neighbors > 0:
            self.n_neighbors = 10
            warnings.warn(
                "n_neighbors must be greater than 0."
                " Fit with " + str(self.n_neighbors) + " instead.",
                UserWarning,
            )
        elif self.n_neighbors >= self._n_observations():
            self.n_neighbors = self._n_observations() - 1
            warnings.warn(
                "n_neighbors must be less than the number of observations."
                " Fit with " + str(self.n_neighbors) + " instead.",
                UserWarning,
            )

    def _check_extent(self) -> bool:
        if self.extent not in [1, 2, 3]:
            warnings.warn(
                "extent parameter (lambda) must be 1, 2, or 3.", UserWarning
            )
            return False
        return True

    def _check_missing_values(self) -> None:
        if np.any(np.isnan(np.asarray(self.data, dtype=np.float64))):
            raise MissingValuesError(
                "Method does not support missing values in input data."
            )

    def _check_is_fit(self) -> bool:
        if self.is_fit is False:
            warnings.warn(
                "Must fit on historical data by calling fit() prior to "
                "calling stream(x).",
                UserWarning,
            )
            return False
        return True

    def _check_no_cluster_labels(self) -> bool:
        if len(set(self._cluster_labels().tolist())) > 1:
            warnings.warn(
                "Stream approach does not support clustered data. "
                "Automatically refit using single cluster of points.",
                UserWarning,
            )
            return False
        return True

    # ---------------- public methods ----------------

    def fit(self) -> "LocalOutlierProbability":
        self._check_n_neighbors()
        self._check_cluster_size()
        if self.data is not None:
            self._check_missing_values()

        labels = self._cluster_labels()

        if self.data is not None:
            if self.n_jobs > 1 and not self.use_numba:
                warnings.warn(
                    "n_jobs > 1 requires use_numba=True for parallel "
                    "processing. Install Numba and set use_numba=True "
                    "to enable parallelism. Falling back to sequential.",
                    UserWarning,
                )
            self.points_vector = _to_array(self.data)
            progress_cb = None
            if self.progress_bar:
                # chunked progress during the distance loop, matching the
                # reference's emission points (loop.py:692, 715)
                state = {"progress": "="}

                def progress_cb(completed, total):
                    state["progress"] = Utils.emit_progress_bar(
                        state["progress"], completed, total
                    )

            d, ids = knn(
                self.points_vector,
                self.n_neighbors,
                labels=labels,
                progress_cb=progress_cb,
            )
            self.distance_matrix = d
            self.neighbor_matrix = ids.astype(float)  # ref stores float ids
        res = loop_from_knn(
            self.distance_matrix,
            np.asarray(self.neighbor_matrix).astype(np.int64),
            self.n_neighbors,
            extent=self.extent,
            labels=labels,
        )
        self.prob_distances = res.prob_distance
        self.prob_distances_ev = res.prob_distance_ev
        self.norm_prob_local_outlier_factor = res.nplof_max
        self.local_outlier_probabilities = res.scores
        self._result = res
        self.is_fit = True
        return self

    def stream(self, x) -> np.ndarray:
        orig_cluster_labels = None
        if self._check_no_cluster_labels() is False:
            orig_cluster_labels = self.cluster_labels
            self.cluster_labels = None

        if self._check_is_fit() is False:
            self.fit()

        point_vector = _to_array(x)
        k = self.n_neighbors
        distances = np.full(k, _SENTINEL, dtype=np.float64)
        if self.data is not None:
            q = np.asarray(point_vector, dtype=np.float64).reshape(1, -1)
            f = np.asarray(self.points_vector, dtype=np.float64)
            if f.ndim == 1:
                f = f.reshape(-1, 1)
            all_d = np.sqrt(((f - q) ** 2).sum(axis=1))
            m = min(k, all_d.shape[0])
            distances[:m] = np.partition(all_d, m - 1)[:m]
        else:
            # matrix mode: x is a scalar distance used for every slot
            # (reference loop.py:1018-1031).
            d = float(np.asarray(point_vector).flat[0])
            m = min(k, self.distance_matrix.shape[0])
            if d < _SENTINEL:
                distances[:m] = d

        ssd = float(np.power(distances, 2).sum())
        std_dist = np.sqrt(ssd / self.n_neighbors)
        prob_dist = self.extent * std_dist
        plof = _prob_outlier_factor(
            np.array(prob_dist), np.array(self.prob_distances_ev.mean())
        )
        score = _local_outlier_probability(
            plof, self.norm_prob_local_outlier_factor
        )

        if orig_cluster_labels is not None:
            self.cluster_labels = orig_cluster_labels
        return score
