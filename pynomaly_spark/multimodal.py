"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride Spark as ``binary`` columns with a metadata
struct; decode/feature-extraction runs as Arrow-batched ``mapInPandas``.
The image/audio codec libraries are NOT in this container, so the decode
step is STUBBED — ``decode_fn=None`` uses a deterministic fake
(sha-seeded feature vector) and a real codec plugs in by passing
``decode_fn``.  Everything Spark-side — schema, batch iteration,
partition sizing, UDF signature — is real and tested.

Scale notes: binary payloads dominate row width, so the operators
aggressively project metadata-only before shuffles and repartition by
payload size budget (``repartition_by_bytes``) so one Arrow batch of
decoded frames fits executor memory.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "MEDIA_SCHEMA",
    "attach_media_metadata",
    "repartition_by_bytes",
    "extract_features",
    "deterministic_fake_features",
]

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("features", ArrayType(DoubleType()), True),
    ]
)


def attach_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap metadata from the payload without decoding: byte length and a
    64-bit digest (dedup key for exact-duplicate media)."""
    return df.withColumn(
        "n_bytes", F.octet_length(F.col(payload_col))
    ).withColumn("payload_hash", F.xxhash64(F.col(payload_col)))


def repartition_by_bytes(
    df: DataFrame,
    target_bytes_per_partition: int = 256 * 1024 * 1024,
    payload_col: str = "payload",
) -> DataFrame:
    """Size partitions by PAYLOAD bytes, not row counts — 1000 4K frames
    and 1000 thumbnails are wildly different memory footprints."""
    total = df.agg(
        F.sum(F.octet_length(F.col(payload_col))).alias("b")
    ).head()["b"]
    if not total:
        return df
    n = max(1, int(total // target_bytes_per_partition) + 1)
    return df.repartition(n)


def deterministic_fake_features(payload: bytes, dim: int = 16) -> np.ndarray:
    """STUB decode: a reproducible pseudo-feature vector seeded by the
    payload digest.  Stands in for image-embedding/audio-fingerprint
    models absent from this container; replace via ``decode_fn``."""
    seed = int.from_bytes(
        hashlib.sha256(payload or b"").digest()[:4], "big"
    )
    rng = np.random.RandomState(seed)
    return rng.rand(dim)


def extract_features(
    df: DataFrame,
    decode_fn: Optional[Callable[[bytes, str], np.ndarray]] = None,
    dim: int = 16,
    id_col: str = "media_id",
    payload_col: str = "payload",
    kind_col: str = "kind",
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``decode_fn(payload_bytes, kind) -> np.ndarray`` is the real-codec
    hook (PIL/librosa/ffmpeg in production images).  Without one, the
    deterministic stub keeps the plumbing testable here.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fn = decode_fn or (
            lambda payload, kind: deterministic_fake_features(payload, dim)
        )
        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats, nbytes = [], []
            for payload, kind in zip(pdf[payload_col], pdf[kind_col]):
                if payload is None:
                    feats.append(None)
                    nbytes.append(None)
                else:
                    feats.append([float(v) for v in fn(bytes(payload), kind)])
                    nbytes.append(len(payload))
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].to_numpy(),
                    "kind": pdf[kind_col].to_numpy(),
                    "n_bytes": nbytes,
                    "features": feats,
                }
            )

    slim = df.select(
        F.col(id_col), F.col(kind_col), F.col(payload_col)
    )
    return slim.mapInPandas(run, FEATURE_SCHEMA)
