"""Distributed integer-exact k-means over embeddings."""

import numpy as np
import pandas as pd
import ray.data as rd

from rdf_extraction_ray.stages.cluster import (init_centroids, kmeans,
                                               _assign, _quantize)


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


def test_init_centroids_hash_order():
    df = _toy(n_per=5)
    c = init_centroids(rd.from_pandas(df), k=3)
    assert c.shape == (3, 4)
    # deterministic across calls
    c2 = init_centroids(rd.from_pandas(df), k=3)
    assert (c == c2).all()
