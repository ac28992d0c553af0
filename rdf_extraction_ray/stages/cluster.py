"""Distributed k-means over an embedding column — semantic clustering
for corpus curation — plus SemDedup-style within-cluster near-dup
pruning (Abbas et al. 2023).

Integer-exact by construction so a DuckDB oracle can replay every
step bit-for-bit:

- embeddings quantize to int64 via ``floor(x*1000 + 0.5)`` (computed
  in float64 on both engines — no banker's-rounding mismatch),
- distances are integer squared-L2, ties break to the smallest
  cluster id,
- centroid updates use pure-integer floor division
  (``(s - ((s % n) + n) % n) / n`` in SQL, ``//`` in numpy),
- init picks the ``k`` vectors with the smallest
  ``md5(vec_id)``-derived hash (deterministic pseudo-random spread,
  no RNG state), cluster ids assigned in (hash, vec_id) order.

Scale shape: centroids are tiny (k × dim ints) and ride the object
store via ``ray.put``; each Lloyd round is one ``map_batches`` pass
emitting k partial (sum-vector, count) rows per batch — the driver
reduces only O(batches × k) partials, never touches vectors. The
multi-pass consumers (``kmeans``, ``semantic_dedup``, IVF) pin the
vector table with ``materialize()`` once up front so an expensive
upstream runs exactly once across init + Lloyd rounds + final
assignment (the object store spills it if large).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd


def _id_hash(vid: int) -> int:
    return int(hashlib.md5(str(vid).encode()).hexdigest()[:15], 16)


def _quantize(col) -> np.ndarray:
    """(n, dim) int64 from a list<float> column, float64-exact."""
    e = np.asarray([np.asarray(v, dtype=np.float64) for v in col])
    return np.floor(e * 1000.0 + 0.5).astype(np.int64)


def _sqdist(x: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """(n, k) EXACT integer squared-L2 distances via the expansion
    |x|² + |c|² − 2·x@cᵀ — one int64 matmul instead of the rank-3
    (n, k, dim) difference tensor, which at the k-in-the-thousands
    scale the module recommends would allocate terabytes per task.
    All terms stay far inside int64 on the ×1000 grid (|coord| ≤
    ~5.4e3 → |x|² ≤ dim·2.9e7), so the integers are identical to the
    tensor form's."""
    nx = (x * x).sum(axis=1)
    nc = (cents * cents).sum(axis=1)
    return nx[:, None] + nc[None, :] - 2 * (x @ cents.T)


def _assign(x: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Integer squared-L2 argmin; np.argmin's first-hit rule = the
    smallest cluster id on ties (the oracle orders by (dist, c))."""
    return _sqdist(x, cents).argmin(axis=1)


def init_centroids(vecs: rd.Dataset, k: int, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> np.ndarray:
    """The k vectors with the smallest (md5-hash, id) — per-batch
    local top-k combiner, then a driver merge of the ≤ k-per-batch
    partials. No global sort barrier: an all-to-all over the whole
    corpus to pick k rows would be the wrong exchange at scale."""

    def _local_topk(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[[id_col, vec_col]].copy()
        out["h"] = [_id_hash(int(v)) for v in batch[id_col]]
        return out.sort_values(["h", id_col], kind="stable").head(k)

    top = (vecs.map_batches(_local_topk, batch_format="pandas")
           .to_pandas())
    if top.empty:
        raise ValueError("init_centroids: empty input — k-means "
                         "needs at least one vector (callers return "
                         "typed empty results before fitting)")
    top = top.sort_values(["h", id_col], kind="stable").head(k)
    return _quantize(top[vec_col])


def _fit_centroids(vecs: rd.Dataset, k: int, n_iter: int,
                   id_col: str, vec_col: str) -> np.ndarray:
    """``n_iter`` Lloyd rounds from the deterministic init. Empty
    clusters keep their previous centroid."""
    cents = init_centroids(vecs, k, id_col, vec_col)
    dim = cents.shape[1]
    # a corpus smaller than k inits fewer centroids; every array
    # below sizes off the ACTUAL count or the k-mask misaligns
    # (IndexError deep in a Lloyd round) — the SQL oracle's
    # LIMIT k init has the same effective count
    k = cents.shape[0]

    for _ in range(n_iter):
        ref = ray.put(cents)

        def _partials(batch: pd.DataFrame) -> pd.DataFrame:
            if not len(batch):  # (0,) matrix would crash _assign
                return pd.DataFrame({
                    "c": pd.Series([], dtype="int64"),
                    "n": pd.Series([], dtype="int64"),
                    "s": pd.Series([], dtype=object)})
            c = ray.get(ref)
            x = _quantize(batch[vec_col])
            a = _assign(x, c)
            sums = np.zeros((k, dim), dtype=np.int64)
            np.add.at(sums, a, x)
            cnt = np.bincount(a, minlength=k).astype(np.int64)
            return pd.DataFrame({
                "c": np.arange(k, dtype=np.int64),
                "n": cnt,
                "s": [sums[j].tolist() for j in range(k)]})

        parts = (vecs.map_batches(_partials, batch_format="pandas")
                 .to_pandas())  # O(batches × k) rows — bounded
        # one vectorized reduce over the partials (a per-cluster
        # filter loop would rescan the frame k times — O(k²·batches))
        cs = np.zeros((k, dim), dtype=np.int64)
        np.add.at(cs, parts["c"].to_numpy(),
                  np.asarray(parts["s"].tolist(), dtype=np.int64))
        cnt = np.zeros(k, dtype=np.int64)
        np.add.at(cnt, parts["c"].to_numpy(), parts["n"].to_numpy())
        nxt = cents.copy()
        nz = cnt > 0  # empty clusters keep their previous centroid
        nxt[nz] = cs[nz] // cnt[nz, None]  # floor div, the SQL form
        cents = nxt
    return cents


def kmeans(vecs: rd.Dataset, k: int = 8, n_iter: int = 2,
           id_col: str = "vec_id",
           vec_col: str = "embedding") -> rd.Dataset:
    """``n_iter`` Lloyd rounds, then the final assignment as
    (id, cluster, dist_sq)."""
    # pinned once: init + n_iter rounds + final assignment all rescan
    vecs = vecs.materialize()
    if not vecs.count():  # empty input: typed empty assignment
        return rd.from_pandas(pd.DataFrame({
            id_col: pd.Series([], dtype="int64"),
            "cluster": pd.Series([], dtype="int64"),
            "dist_sq": pd.Series([], dtype="int64")}))
    cents = _fit_centroids(vecs, k, n_iter, id_col, vec_col)
    ref = ray.put(cents)

    def _final(batch: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(ref)
        x = _quantize(batch[vec_col])
        d = _sqdist(x, c)
        a = d.argmin(axis=1)
        return pd.DataFrame({
            id_col: batch[id_col].astype("int64").to_numpy(),
            "cluster": a.astype("int64"),
            "dist_sq": d[np.arange(len(a)), a].astype("int64")})

    return vecs.map_batches(_final, batch_format="pandas")


def semantic_dedup(vecs: rd.Dataset, k: int = 8, n_iter: int = 2,
                   tau_x100: int = 95, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> rd.Dataset:
    """SemDedup: k-means partitions the space, then near-duplicates
    are pruned WITHIN each cluster — the pairwise term is
    O(Σ cluster²), never corpus².

    Drop rule (declared semantics, SQL-replayable): a vector is
    dropped iff a SMALLER-id vector in the same cluster has cosine
    similarity ≥ tau_x100/100. The cosine test is integer-exact on
    the quantized vectors: ``dot > 0 AND dot²·10⁴ ≥ tau²·|a|²·|b|²``
    (all int64; by Cauchy-Schwarz both sides are ≤ 10⁴·|a|²·|b|², so
    int64 is exact for vectors of L2 norm ≤ ~5.4 under the ×1000
    quantization — any normalized embedding qualifies).

    Scale: clusters ride one groupby(cluster) exchange; ``k`` is the
    parallelism bound, so at corpus scale use k in the thousands —
    cluster size, not corpus size, bounds the quadratic term.
    Output: (id, cluster, kept).
    """
    vecs = vecs.materialize()  # fit passes + the assignment pass
    if not vecs.count():  # empty input: typed empty result
        return rd.from_pandas(pd.DataFrame({
            id_col: pd.Series([], dtype="int64"),
            "cluster": pd.Series([], dtype="int64"),
            "kept": pd.Series([], dtype=bool)}))
    cents = _fit_centroids(vecs, k, n_iter, id_col, vec_col)
    ref = ray.put(cents)
    dim = cents.shape[1]
    qv_type = pa.list_(pa.int32(), dim)

    def _assign_with_vec(t: pa.Table) -> pa.Table:
        c = ray.get(ref)
        flat = t.column(vec_col).combine_chunks().flatten() \
            .to_numpy(zero_copy_only=False)
        m = np.asarray(flat, dtype=np.float64).reshape(len(t), dim)
        x = np.floor(m * 1000.0 + 0.5).astype(np.int64)
        a = _assign(x, c)
        # quantized vectors ride the exchange as fixed_size_list<int32>
        # — compact and schema-stable, never object dtype
        qv = pa.FixedSizeListArray.from_arrays(
            pa.array(x.astype(np.int32).reshape(-1)), dim)
        return pa.table({
            id_col: t.column(id_col).cast(pa.int64()),
            "cluster": pa.array(a.astype("int64")),
            "qv": qv.cast(qv_type)})

    def _dedup_cluster(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy()
        order = np.argsort(ids, kind="stable")
        flat = t.column("qv").combine_chunks().flatten() \
            .to_numpy(zero_copy_only=False)
        x = flat.astype(np.int64).reshape(len(t), dim)[order]
        ids = ids[order]
        dot = x @ x.T
        n2 = (x * x).sum(axis=1)
        tau2 = np.int64(tau_x100) * np.int64(tau_x100)
        dup = (dot > 0) & (dot ** 2 * 10000 >= tau2 * np.outer(n2, n2))
        # column j is dropped iff any row i < j (smaller id) is a dup
        dropped = np.triu(dup, k=1).any(axis=0)
        return pa.table({
            id_col: pa.array(ids, type=pa.int64()),
            "cluster": t.column("cluster").combine_chunks().take(
                pa.array(order)),
            "kept": pa.array(~dropped)})

    return (vecs.map_batches(_assign_with_vec, batch_format="pyarrow")
            .groupby("cluster")
            .map_groups(_dedup_cluster, batch_format="pyarrow"))
