"""Distributed integer-exact k-means over embeddings."""

import numpy as np
import pandas as pd
import ray.data as rd

from rdf_extraction_ray.stages.cluster import (init_centroids, kmeans,
                                               semantic_dedup, _assign,
                                               _quantize)


def _toy(n_per: int = 20, seed: int = 3) -> pd.DataFrame:
    """Two well-separated blobs in 4-D."""
    rng = np.random.RandomState(seed)
    a = rng.normal(0.0, 0.01, size=(n_per, 4)) + [0.4, 0.4, 0.0, 0.0]
    b = rng.normal(0.0, 0.01, size=(n_per, 4)) + [-0.4, -0.4, 0.0, 0.0]
    vecs = np.vstack([a, b])
    return pd.DataFrame({"vec_id": np.arange(len(vecs), dtype="int64"),
                         "embedding": [v.tolist() for v in vecs]})


def test_kmeans_separates_blobs():
    df = _toy()
    out = kmeans(rd.from_pandas(df), k=2, n_iter=3).to_pandas() \
        .sort_values("vec_id", ignore_index=True)
    first_half = set(out["cluster"][:20])
    second_half = set(out["cluster"][20:])
    assert len(first_half) == 1 and len(second_half) == 1
    assert first_half != second_half


def test_kmeans_deterministic():
    df = _toy()
    a = kmeans(rd.from_pandas(df), k=2, n_iter=2).to_pandas() \
        .sort_values("vec_id", ignore_index=True)
    b = kmeans(rd.from_pandas(df), k=2, n_iter=2).to_pandas() \
        .sort_values("vec_id", ignore_index=True)
    pd.testing.assert_frame_equal(a, b)


def test_quantize_half_rounding_matches_sql_floor():
    # floor(x*1000 + 0.5): ties round UP (away from banker's rounding)
    q = _quantize(pd.Series([[0.0005, -0.0005, 0.001]]))
    assert q.tolist() == [[1, 0, 1]]


def test_assign_tie_breaks_to_smallest_cluster():
    x = np.array([[0, 0]], dtype=np.int64)
    cents = np.array([[1, 0], [-1, 0]], dtype=np.int64)  # equidistant
    assert _assign(x, cents).tolist() == [0]


def test_semantic_dedup_drops_planted_near_dup():
    df = _toy()
    # plant an exact copy of vec 0 and a near-copy (cos ≈ 0.9997)
    v0 = np.array(df["embedding"][0])
    near = v0 + 0.01 * np.array([0.0, 0.0, 1.0, 0.0])
    extra = pd.DataFrame({"vec_id": [100, 101],
                          "embedding": [v0.tolist(), near.tolist()]})
    ds = rd.from_pandas(pd.concat([df, extra], ignore_index=True))
    out = semantic_dedup(ds, k=2, n_iter=2, tau_x100=95).to_pandas() \
        .set_index("vec_id")
    assert not out.loc[100, "kept"]      # exact copy of smaller id 0
    assert not out.loc[101, "kept"]      # near-copy, cos ≥ 0.95
    assert out.loc[0, "kept"]            # smallest id survives
    # tight blobs are mutual near-dups: each collapses to its min id
    assert out.loc[20, "kept"]
    assert not out.loc[25, "kept"]


def test_semantic_dedup_keeps_distinct_vectors():
    rng = np.random.RandomState(7)
    vecs = rng.normal(size=(30, 8))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    df = pd.DataFrame({"vec_id": np.arange(30, dtype="int64"),
                       "embedding": [v.tolist() for v in vecs]})
    out = semantic_dedup(rd.from_pandas(df), k=3, n_iter=1,
                         tau_x100=99).to_pandas()
    # random unit vectors in 8-D almost never reach cos 0.99
    assert out["kept"].all()
    assert len(out) == 30


def test_init_centroids_hash_order():
    df = _toy(n_per=5)
    c = init_centroids(rd.from_pandas(df), k=3)
    assert c.shape == (3, 4)
    # deterministic across calls
    c2 = init_centroids(rd.from_pandas(df), k=3)
    assert (c == c2).all()
