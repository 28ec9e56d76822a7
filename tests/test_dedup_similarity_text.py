"""Tests for dedup, similarity, text analysis, and multimodal operators."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pynomaly_spark import dedup, multimodal, similarity, textops


@pytest.fixture(scope="module")
def docs(spark):
    base = [
        "the quick brown fox jumps over the lazy dog again and again",
        "pack my box with five dozen liquor jugs for the long trip home",
        "sphinx of black quartz judge my vow said the old wise man",
        "the completely different document that is about spark query planning for today",
    ]
    rows = []
    rid = 0
    for i, b in enumerate(base):
        rows.append((rid, b)); rid += 1
        rows.append((rid, b), ); rid += 1  # exact duplicate
        # near duplicate: one word changed
        rows.append((rid, b.replace("the", "that", 1))); rid += 1
    rows.append((rid, None)); rid += 1
    rows.append((rid, None)); rid += 1
    pdf = pd.DataFrame(rows, columns=["row_id", "content"])
    return spark.createDataFrame(pdf)


def test_exact_dedup(docs):
    out = dedup.exact_dedup(docs).toPandas()
    # 4 distinct texts survive from 8 exact rows; near-dups (4) + nulls (2) kept
    assert len(out) == 4 + 4 + 2
    non_null = out[out.content.notna()]
    assert non_null.content.nunique() == len(non_null)
    # survivor is the smallest row_id of each digest group
    assert 0 in set(out.row_id) and 1 not in set(out.row_id)


def test_minhash_lsh_finds_near_dups(docs):
    near = dedup.verified_near_dups(
        docs, threshold=0.3, num_perm=32, bands=16, shingle_n=2
    ).toPandas()
    pairs = set(map(tuple, near[["id_a", "id_b"]].to_numpy()))
    # exact dup pairs must surface (jaccard 1.0)
    for base in (0, 3, 6, 9):
        assert (base, base + 1) in pairs
        j = near[(near.id_a == base) & (near.id_b == base + 1)].jaccard.iloc[0]
        assert j == 1.0
    # near-dup (one-word change) pairs present with 0.3 <= j < 1
    near_pairs = [p for p in pairs if p[1] - p[0] == 2 and p[0] % 3 == 0]
    assert near_pairs, pairs


def test_lsh_bucket_size_guard(docs):
    sigs = dedup.minhash_signatures(docs, num_perm=16, shingle_n=1)
    none = dedup.lsh_candidate_pairs(sigs, bands=8, max_bucket_size=1)
    assert none.count() == 0  # every bucket pruned


def test_simhash_similar_texts_close(docs):
    sh = dedup.simhash64(docs).toPandas().set_index("row_id").simhash
    def hamming(a, b):
        return bin((int(a) ^ int(b)) & ((1 << 64) - 1)).count("1")
    assert hamming(sh[0], sh[2]) <= 12      # near-dup: few bits differ
    assert hamming(sh[0], sh[9]) >= 20      # unrelated: many bits differ


def test_cosine_topk_exact_vs_numpy(spark):
    rng = np.random.RandomState(4)
    M = rng.randn(50, 8)
    pdf = pd.DataFrame(
        {"vec_id": range(50), "embedding": [list(map(float, r)) for r in M]}
    )
    items = spark.createDataFrame(pdf)
    queries = items.where("vec_id < 3").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = similarity.cosine_topk(items, queries, k=5).toPandas()
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    sims = Mn @ Mn.T
    for q in range(3):
        s = sims[q].copy()
        s[q] = -np.inf
        expect = set(np.argsort(-s)[:5])
        have = set(got[got.query_id == q].neighbor_id)
        assert have == expect, (q, have, expect)


def test_rp_lsh_finds_planted_near_dups(spark):
    """RP-LSH recall on the actual use case: planted high-cosine twins.

    (On pure random gaussians, top-5 'neighbors' are barely closer than
    random and RP-LSH recall is theoretically ~0.4 at 6 planes — that is
    a property of the data, not a bug, so the test plants real twins.)"""
    rng = np.random.RandomState(9)
    M = rng.randn(300, 16)
    # twins: rows 300..309 are rows 0..9 + small noise (cos ~ 0.99)
    twins = M[:10] + 0.05 * rng.randn(10, 16)
    A = np.vstack([M, twins])
    pdf = pd.DataFrame(
        {"vec_id": range(310), "embedding": [list(map(float, r)) for r in A]}
    )
    items = spark.createDataFrame(pdf)
    queries = items.where("vec_id < 10").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    approx = similarity.rp_lsh_topk(
        items, queries, k=5, n_planes=6, multiprobe=True
    ).toPandas()
    found = sum(
        1
        for q in range(10)
        if (q + 300) in set(approx[approx.query_id == q].neighbor_id)
    )
    assert found >= 8, found  # twin recall floor


def test_text_analysis_columns(docs):
    out = textops.add_text_analysis(docs.where("content is not null")).toPandas()
    assert (out.n_tokens_ws >= 9).all()
    assert (out.n_tokens_bpe >= out.n_tokens_ws).all()
    assert out.quality_score.between(0, 1).all()
    assert (out.lang_guess == "en").all()  # english stopwords present
    # fingerprint invariant to whitespace/case reformatting
    assert out.fingerprint64.notna().all()


def test_fingerprint_normalization(spark):
    pdf = pd.DataFrame(
        {
            "row_id": [1, 2],
            "content": ["Hello  World\tfoo", "hello world foo"],
        }
    )
    df = spark.createDataFrame(pdf)
    fps = df.select(textops.fingerprint().alias("fp")).toPandas().fp
    assert fps[0] == fps[1]


def test_multimodal_feature_plumbing(spark):
    payloads = [bytes([i]) * (100 + i) for i in range(6)]
    pdf = pd.DataFrame(
        {
            "media_id": range(6),
            "kind": ["image", "image", "audio", "audio", "video", "image"],
            "payload": payloads,
        }
    )
    df = spark.createDataFrame(pdf)
    df = multimodal.attach_media_metadata(df)
    meta = df.toPandas()
    assert list(meta.n_bytes) == [100 + i for i in range(6)]

    feats = multimodal.extract_features(df, dim=8).orderBy("media_id").toPandas()
    assert len(feats) == 6
    assert all(len(f) == 8 for f in feats.features)
    # deterministic: same payload -> same features on rerun
    feats2 = multimodal.extract_features(df, dim=8).orderBy("media_id").toPandas()
    assert all(
        np.allclose(a, b) for a, b in zip(feats.features, feats2.features)
    )
    # pluggable decoder hook
    got = multimodal.extract_features(
        df, decode_fn=lambda b, k: np.array([float(len(b))]), dim=1
    ).orderBy("media_id").toPandas()
    assert [f[0] for f in got.features] == [100.0 + i for i in range(6)]


def _make_ppm(w, h, seed, comment=False, gray=False):
    rng = np.random.RandomState(seed)
    channels = 1 if gray else 3
    raster = rng.randint(0, 256, size=(h, w, channels), dtype=np.uint8)
    magic = b"P5" if gray else b"P6"
    header = magic + b"\n"
    if comment:
        header += b"# synthetic test image\n"
    header += f"{w} {h}\n255\n".encode()
    return header + raster.tobytes(), raster


def test_multimodal_real_ppm_decode(spark):
    """REAL bytes -> pixels -> features through the full Spark plumbing:
    the built-in pure-numpy PPM codec must reproduce the local decode,
    corrupt payloads must surface as decoder='error' (not kill the job),
    and null payloads pass through as nulls."""
    images = [
        _make_ppm(8, 6, seed=1),
        _make_ppm(16, 16, seed=2, comment=True),
        _make_ppm(5, 9, seed=3, gray=True),
    ]
    rows = [
        {"media_id": i, "kind": "image", "payload": p}
        for i, (p, _) in enumerate(images)
    ]
    truncated = images[0][0][:-7]  # chop raster bytes -> malformed
    rows.append({"media_id": 90, "kind": "image", "payload": truncated})
    rows.append({"media_id": 91, "kind": "image", "payload": None})
    rows.append({"media_id": 92, "kind": "image", "payload": b"\x89PNG junk"})
    df = spark.createDataFrame(pd.DataFrame(rows))

    out = (
        multimodal.extract_features(multimodal.repartition_by_bytes(df))
        .orderBy("media_id")
        .toPandas()
        .set_index("media_id")
    )
    for i, (payload, raster) in enumerate(images):
        assert out.loc[i, "decoder"] == "ppm"
        assert out.loc[i, "n_bytes"] == len(payload)
        expected = multimodal.image_features(
            multimodal.decode_ppm(payload)
        )
        np.testing.assert_allclose(out.loc[i, "features"], expected, atol=1e-12)
    # decoded pixels themselves round-trip exactly
    np.testing.assert_array_equal(
        multimodal.decode_ppm(images[0][0]), images[0][1]
    )
    assert out.loc[90, "decoder"] == "error"
    assert out.loc[90, "features"] is None
    assert out.loc[91, "decoder"] is None
    assert out.loc[92, "decoder"] == "fake"  # compressed format stand-in
    # distinguishable images -> distinguishable features
    f0, f1 = out.loc[0, "features"], out.loc[1, "features"]
    assert not np.allclose(f0, f1)


def test_ivf_topk_finds_planted_neighbors(spark):
    """IVF cells must recover the exact top-k for clustered embeddings
    (planted twin sits in the query's own cell); recall vs the exact
    baseline stays high at nprobe=4/16 cells."""
    rng = np.random.RandomState(5)
    centers = rng.randn(8, 12) * 5
    rows = []
    vid = 0
    for ci, c in enumerate(centers):
        for _ in range(40):
            rows.append((vid, list(map(float, c + rng.randn(12) * 0.3))))
            vid += 1
    emb = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding"])
    ).persist()
    q = emb.where(F.col("vec_id").isin([0, 40, 80])).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = similarity.cosine_topk(emb, q, k=5).toPandas()
    approx = similarity.ivf_topk(
        emb, q, k=5, n_centroids=16, nprobe=4, sample_rows=320
    ).toPandas()
    assert set(approx.query_id) == {0, 40, 80}
    hits = 0
    for qid in (0, 40, 80):
        e = set(exact[exact.query_id == qid].neighbor_id)
        a = set(approx[approx.query_id == qid].neighbor_id)
        assert len(a) == 5
        hits += len(e & a)
    assert hits >= 12  # >=80% recall on well-separated clusters
    emb.unpersist()
