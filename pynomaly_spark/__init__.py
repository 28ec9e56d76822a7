"""pynomaly_spark — a PySpark-native schema + constraint validation engine
with a LoOP (Local Outlier Probabilities) distribution-drift kernel.

Layers:

* :mod:`pynomaly_spark.kernel` — pure-numpy LoOP math (no Spark).
* :mod:`pynomaly_spark.api` — drop-in ``LocalOutlierProbability`` matching
  the reference library's public API and message contract.
* :mod:`pynomaly_spark.checks` — declarative constraint suite compiled to
  single-pass Catalyst aggregation plans (column stats, uniqueness,
  referential integrity, row invariants) + verdict/violation outputs.
* :mod:`pynomaly_spark.drift` — the LoOP kernel as a Spark operator
  (grouped Arrow UDF exact path; distributed Catalyst approximate path).
* :mod:`pynomaly_spark.dedup` / :mod:`similarity` / :mod:`textops` /
  :mod:`multimodal` — training-data pipeline operators.
* :mod:`pynomaly_spark.streaming` — frozen-model incremental scoring.
* :mod:`pynomaly_spark.checkpoint` — per-partition resumable verdicts.
"""

from .api import (
    ClusterSizeError,
    LocalOutlierProbability,
    MissingValuesError,
    PyNomalyError,
    Utils,
    ValidationError,
)

__version__ = "0.1.0"

__all__ = [
    "LocalOutlierProbability",
    "PyNomalyError",
    "ValidationError",
    "ClusterSizeError",
    "MissingValuesError",
    "Utils",
    "__version__",
]
