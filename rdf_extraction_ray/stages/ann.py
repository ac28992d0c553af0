"""Approximate nearest-neighbor search over an embedding column.

- :func:`brute_force_topk` — the exact baseline: numpy matmul per
  batch against a broadcast query matrix (``ray.put`` once). Fully
  streaming over the corpus side; cost O(corpus × queries).
- :func:`lsh_topk` — the scale path: random-hyperplane LSH buckets
  both sides, candidates searched per bucket (multi-probe via
  several independent hash tables). Recall < 1, cost ~O(corpus/2^bits
  × queries) per table.

Embeddings are ``list<float>`` Arrow columns; kernels run on float64
for cross-engine reproducibility (DuckDB computes in double).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd


def _matrix(col) -> np.ndarray:
    return np.asarray([np.asarray(v, dtype=np.float64) for v in col])


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def brute_force_topk(corpus: rd.Dataset, queries_df: pd.DataFrame, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding"
                     ) -> pd.DataFrame:
    """Exact cosine top-k: per-batch partial top-k (numpy matmul) →
    small driver-side merge of |queries|×(batches·k) partials.

    Returns (query_id, neighbor_id, rank) with rank 0..k-1 by
    descending cosine; ties broken by neighbor_id for determinism.
    """
    q = _normalize(_matrix(queries_df[vec_col]))
    q_ids = queries_df[id_col].to_numpy()
    ref = ray.put((q, q_ids))

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        qm, qi = ray.get(ref)
        c = _normalize(_matrix(batch[vec_col]))
        ids = batch[id_col].to_numpy()
        sims = qm @ c.T                      # (nq, nb)
        kk = min(k, sims.shape[1])
        idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        rows = {
            "query_id": np.repeat(qi, kk),
            "neighbor_id": ids[idx].ravel(),
            "cosine": np.take_along_axis(sims, idx, axis=1).ravel(),
        }
        return pd.DataFrame(rows)

    partials = corpus.map_batches(_partial, batch_format="pandas").to_pandas()
    # deterministic final top-k: sort by (-cosine, neighbor_id)
    partials = partials.sort_values(["query_id", "cosine", "neighbor_id"],
                                    ascending=[True, False, True],
                                    kind="stable")
    out = partials.groupby("query_id", sort=True).head(k).copy()
    out["rank"] = out.groupby("query_id").cumcount().astype("int64")
    return out[["query_id", "neighbor_id", "rank"]].reset_index(drop=True)


def cosine_threshold_pairs(corpus: rd.Dataset, threshold: float = 0.4,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           round_to: int = 4) -> pd.DataFrame:
    """EXACT all-pairs cosine similarity pairs (a < b, cosine ≥
    ``threshold``) — the oracle-checkable exact baseline of the
    embedding near-dup family.

    Scale shape: one side of the O(N²) comparison must be resident; it
    is collected once (ids + float64 matrix), broadcast via
    ``ray.put``, and every corpus batch does a single dense matmul
    against it — the corpus side streams. This is the exact-baseline
    tool for corpora whose matrix fits a worker's heap;
    :func:`rdf_extraction_ray.stages.dedup_docs.embedding_neardup_pairs`
    (hyperplane LSH, never all-pairs) is the 100-TB path.
    """
    # the corpus is consumed twice (resident-side collect + streaming
    # matmul pass); pin it so an expensive upstream runs exactly once
    corpus = corpus.materialize()
    side = corpus.map_batches(
        lambda df: pd.DataFrame({id_col: df[id_col],
                                 vec_col: df[vec_col]}),
        batch_format="pandas").to_pandas()
    ids_full = side[id_col].to_numpy()
    m_full = _normalize(_matrix(side[vec_col]))
    ref = ray.put((ids_full, m_full))

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        fids, fm = ray.get(ref)
        c = _normalize(_matrix(batch[vec_col]))
        ids = batch[id_col].to_numpy()
        sims = c @ fm.T                         # (nb, N)
        # keep only pairs where the resident id is strictly larger —
        # every unordered pair surfaces exactly once
        mask = (sims >= threshold) & (ids[:, None] < fids[None, :])
        bi, fj = np.nonzero(mask)
        return pd.DataFrame({"a": ids[bi], "b": fids[fj],
                             "cosine": sims[bi, fj]})

    out = corpus.map_batches(_partial, batch_format="pandas").to_pandas()
    if not len(out):
        return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="int64"),
                             "cosine": pd.Series([], dtype="float64")})
    out["cosine"] = out["cosine"].round(round_to)
    out["a"] = out["a"].astype("int64")
    out["b"] = out["b"].astype("int64")
    return out.sort_values(["a", "b"], ignore_index=True)


def train_centroids(corpus: rd.Dataset, n_centroids: int = 16,
                    n_iters: int = 8, sample_size: int = 4096,
                    seed: int = 7, vec_col: str = "embedding",
                    id_col: str = "vec_id") -> np.ndarray:
    """Deterministic mini-kmeans for the IVF coarse quantizer.

    Training rows are a deterministic id-hash spread sample over the
    WHOLE corpus (a head sample biases the cells when the input is
    sorted/clustered by write order), capped at ``sample_size``. Lloyd
    iterations run in numpy on the driver; the sample is small by
    design and the full corpus never leaves the cluster."""
    import pandas as pd
    n_rows = corpus.count()
    keep_per_10k = min(10_000, int(10_000 * 4 * sample_size
                                   / max(1, n_rows)) + 1)

    def _spread(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df[id_col], index=False) % 10_000
        return df[h < keep_per_10k]

    sampled = (corpus.map_batches(_spread, batch_format="pandas")
               .limit(sample_size).to_pandas())
    sample = _normalize(_matrix(sampled[vec_col]))
    rng = np.random.RandomState(seed)
    idx = rng.choice(len(sample), size=min(n_centroids, len(sample)),
                     replace=False)
    cent = sample[idx].copy()
    for _ in range(n_iters):
        assign = (sample @ cent.T).argmax(axis=1)
        for c in range(len(cent)):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


def ivf_topk(corpus: rd.Dataset, queries_df: pd.DataFrame, k: int = 10,
             n_centroids: int = 16, nprobe: int = 4, seed: int = 7,
             id_col: str = "vec_id", vec_col: str = "embedding"
             ) -> pd.DataFrame:
    """IVF top-k: a coarse quantizer (mini-kmeans) buckets the corpus
    into cells; each query only scores vectors in its ``nprobe``
    nearest cells. The scale path vs brute force: per-batch cost drops
    by ~``nprobe/n_centroids``; recall < 1 near cell boundaries.

    Partitioning assumption: cells are roughly balanced — skewed
    embedding distributions need more centroids (same caveat as the
    reference's fuzzy-match hot spots, SURVEY §7.5.4)."""
    cent = train_centroids(corpus, n_centroids=n_centroids, seed=seed,
                           vec_col=vec_col)
    q = _normalize(_matrix(queries_df[vec_col]))
    q_ids = queries_df[id_col].to_numpy()
    # each query probes its nprobe nearest cells
    probe = np.argsort(-(q @ cent.T), axis=1)[:, :nprobe]      # (nq, nprobe)
    ref = ray.put((q, q_ids, probe, cent))

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        qm, qi, pr, ce = ray.get(ref)
        c = _normalize(_matrix(batch[vec_col]))
        ids = batch[id_col].to_numpy()
        cell = (c @ ce.T).argmax(axis=1)                       # (nc,)
        mask = (pr[:, :, None] == cell[None, None, :]).any(axis=1)  # (nq, nc)
        sims = qm @ c.T
        sims[~mask] = -2.0
        kk = min(k, sims.shape[1])
        idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        return pd.DataFrame({
            "query_id": np.repeat(qi, kk),
            "neighbor_id": ids[idx].ravel(),
            "cosine": np.take_along_axis(sims, idx, axis=1).ravel(),
        })

    partials = corpus.map_batches(_partial, batch_format="pandas").to_pandas()
    partials = partials[partials["cosine"] > -1.5]
    partials = partials.sort_values(["query_id", "cosine", "neighbor_id"],
                                    ascending=[True, False, True],
                                    kind="stable")
    out = partials.groupby("query_id", sort=True).head(k).copy()
    out["rank"] = out.groupby("query_id").cumcount().astype("int64")
    return out[["query_id", "neighbor_id", "rank"]].reset_index(drop=True)


def lsh_topk(corpus: rd.Dataset, queries_df: pd.DataFrame, k: int = 10,
             n_bits: int = 8, n_tables: int = 4, seed: int = 99,
             id_col: str = "vec_id", vec_col: str = "embedding",
             dim: int | None = None) -> pd.DataFrame:
    """Random-hyperplane LSH top-k (approximate).

    Corpus vectors land in ``n_tables`` hash buckets; each query only
    scores candidates sharing a bucket in ANY table. Partitioning
    assumption: bucket population ~ corpus/2^n_bits per table — skewed
    data needs more bits."""
    if dim is None:
        dim = len(queries_df[vec_col].iloc[0])
    rng = np.random.RandomState(seed)
    planes = rng.randn(n_tables, n_bits, dim)
    q = _normalize(_matrix(queries_df[vec_col]))
    q_ids = queries_df[id_col].to_numpy()
    pw = (1 << np.arange(n_bits)).astype(np.int64)
    q_buckets = np.stack([( (q @ planes[t].T) > 0) @ pw
                          for t in range(n_tables)], axis=1)  # (nq, nt)
    ref = ray.put((q, q_ids, q_buckets, planes, pw))

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        qm, qi, qb, pl, powv = ray.get(ref)
        c = _normalize(_matrix(batch[vec_col]))
        ids = batch[id_col].to_numpy()
        cb = np.stack([((c @ pl[t].T) > 0) @ powv
                       for t in range(len(pl))], axis=1)      # (nc, nt)
        # candidate mask: share a bucket in any table
        mask = (qb[:, None, :] == cb[None, :, :]).any(axis=2)  # (nq, nc)
        sims = (qm @ c.T)
        sims[~mask] = -2.0
        kk = min(k, sims.shape[1])
        idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        return pd.DataFrame({
            "query_id": np.repeat(qi, kk),
            "neighbor_id": ids[idx].ravel(),
            "cosine": np.take_along_axis(sims, idx, axis=1).ravel(),
        })

    partials = corpus.map_batches(_partial, batch_format="pandas").to_pandas()
    partials = partials[partials["cosine"] > -1.5]
    partials = partials.sort_values(["query_id", "cosine", "neighbor_id"],
                                    ascending=[True, False, True],
                                    kind="stable")
    out = partials.groupby("query_id", sort=True).head(k).copy()
    out["rank"] = out.groupby("query_id").cumcount().astype("int64")
    return out[["query_id", "neighbor_id", "rank"]].reset_index(drop=True)
