"""Approximate nearest-neighbor search over an embedding column.

- :func:`brute_force_topk` — the exact baseline: integer-dot matmul
  per batch against a broadcast query matrix (``ray.put`` once).
  Fully streaming over the corpus side; cost O(corpus × queries).
- :func:`lsh_topk` — the scale path: random-hyperplane LSH buckets
  both sides, candidates searched per bucket (multi-probe via
  several independent hash tables). Recall < 1, cost ~O(corpus/2^bits
  × queries) per table.
- :func:`ivf_topk` — coarse-quantizer path: the integer-exact
  distributed k-means (:mod:`.cluster`) cells the corpus; queries
  probe their ``nprobe`` nearest cells.

The WHOLE family shares one deterministic similarity metric so every
operator is bit-replayable by a DuckDB oracle:

- vectors quantize to int64 at ×10,000 (``floor(x·10⁴ + 0.5)``,
  matching SQL's ``floor``; exact for |coordinate| ≤ ~1000, where the
  squared norm stays below 2⁵³);
- similarity = ``dot / (sqrt(na)·sqrt(nb))`` computed from those
  integers — int→double conversion is exact below 2⁵³ and IEEE
  sqrt/multiply/divide are correctly rounded, so numpy and DuckDB
  produce the SAME double bit for bit;
- hyperplanes quantize to int64 at ×1,000 from their seeded
  derivation and are inlined into the oracle as constants, so bucket
  membership (sign of an integer dot) is exact on both sides;
- ties in the top-k rank are broken by ``neighbor_id``.

"Exact" for :func:`brute_force_topk` means exact w.r.t. this declared
metric; it differs from the real-valued cosine by O(10⁻⁴)
quantization noise, which recall tests show is immaterial.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from .cluster import (_assign, _fit_centroids, _quantize,
                      init_centroids)

#: Vector quantization scale for the ANN similarity metric.
Q_SCALE = 10_000
#: Hyperplane quantization scale (LSH bucketing).
PLANE_SCALE = 1_000


def _matrix(col) -> np.ndarray:
    """(n, dim) float64 matrix from a list<float> column — built ONCE
    per batch; both quantization grids derive from it."""
    return np.asarray([np.asarray(v, dtype=np.float64) for v in col])


def _qscale(m: np.ndarray, scale: int) -> np.ndarray:
    """``floor(x·scale + 0.5)`` int64 per coordinate."""
    return np.floor(m * scale + 0.5).astype(np.int64)


def _q10k(col) -> np.ndarray:
    """(n, dim) int64 matrix: ``floor(x·10⁴ + 0.5)`` per coordinate."""
    return _qscale(_matrix(col), Q_SCALE)


def _empty_cos_partial() -> pd.DataFrame:
    return pd.DataFrame({
        "query_id": pd.Series([], dtype="int64"),
        "neighbor_id": pd.Series([], dtype="int64"),
        "cosine": pd.Series([], dtype="float64")})


def _empty_dist_partial() -> pd.DataFrame:
    return pd.DataFrame({
        "query_id": pd.Series([], dtype="int64"),
        "neighbor_id": pd.Series([], dtype="int64"),
        "adist": pd.Series([], dtype="int64")})


def _emit_topk_partials(sims: np.ndarray, ids: np.ndarray,
                        q_ids: np.ndarray, k: int) -> pd.DataFrame:
    """Per-batch partial top-k that is DETERMINISTIC under ties: emit
    every candidate whose similarity reaches the row's k-th largest
    value (all of a tied cohort survive to the driver merge, where
    the (cosine desc, neighbor_id asc) order picks the final k — an
    id-blind argpartition could discard the tied candidate the global
    order would have kept). Sentinel-masked entries (< -1.5) never
    emit, so sparse candidate rows don't blow up the partial."""
    nc = sims.shape[1]
    kk = min(k, nc)
    if kk == 0:
        return pd.DataFrame({
            "query_id": pd.Series([], dtype=q_ids.dtype),
            "neighbor_id": pd.Series([], dtype="int64"),
            "cosine": pd.Series([], dtype="float64")})
    kth = np.partition(sims, nc - kk, axis=1)[:, nc - kk]
    keep = (sims >= kth[:, None]) & (sims > -1.5)
    qrow, cidx = np.nonzero(keep)
    out = pd.DataFrame({
        "query_id": q_ids[qrow],
        "neighbor_id": ids[cidx],
        "cosine": sims[qrow, cidx],
    })
    # BOUND the emission at k rows per query under the TOTAL merge
    # order (cosine desc, neighbor_id asc): candidates past a batch's
    # local k-th under that order can never enter the global top-k,
    # so truncating here is lossless — and without it a degenerate
    # low-cardinality corpus (mass ties at the k-th value) would
    # flood the driver merge with up to |queries|·|batch| rows
    out = out.sort_values(["query_id", "cosine", "neighbor_id"],
                          ascending=[True, False, True],
                          kind="stable")
    return out.groupby("query_id", sort=False).head(kk) \
        .reset_index(drop=True)


def _norm2(m: np.ndarray) -> np.ndarray:
    """Squared norms with the zero-vector guard (0 → 1, mirroring the
    classic normalize-with-norm-1 convention; SQL uses the same
    CASE)."""
    n2 = (m * m).sum(axis=1)
    n2[n2 == 0] = 1
    return n2


def int_planes(n_tables: int, n_bits: int, dim: int,
               seed: int) -> np.ndarray:
    """(n_tables, n_bits, dim) int64 hyperplanes:
    ``round(randn·1000)`` from ``RandomState(seed)`` — the documented
    derivation an oracle inlines as constants."""
    rng = np.random.RandomState(seed)
    return np.round(rng.randn(n_tables, n_bits, dim)
                    * PLANE_SCALE).astype(np.int64)


def _topk_from_partials(partials: pd.DataFrame, k: int) -> pd.DataFrame:
    if partials.empty:  # empty corpus or queries: typed empty result
        return pd.DataFrame({
            "query_id": pd.Series([], dtype="int64"),
            "neighbor_id": pd.Series([], dtype="int64"),
            "rank": pd.Series([], dtype="int64")})
    partials = partials.sort_values(["query_id", "cosine", "neighbor_id"],
                                    ascending=[True, False, True],
                                    kind="stable")
    out = partials.groupby("query_id", sort=True).head(k).copy()
    out["rank"] = out.groupby("query_id").cumcount().astype("int64")
    return out[["query_id", "neighbor_id", "rank"]].reset_index(drop=True)


def brute_force_topk(corpus: rd.Dataset, queries_df: pd.DataFrame, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding"
                     ) -> pd.DataFrame:
    """Exact top-k under the declared quantized-cosine metric:
    per-batch partial top-k (integer matmul) → small driver-side merge
    of |queries|×(batches·k) partials.

    Returns (query_id, neighbor_id, rank) with rank 0..k-1 by
    descending similarity; ties broken by neighbor_id.
    """
    if not len(queries_df):
        return _topk_from_partials(pd.DataFrame(), k)
    q = _q10k(queries_df[vec_col])
    qn = np.sqrt(_norm2(q).astype(np.float64))
    q_ids = queries_df[id_col].to_numpy()
    ref = ray.put((q, qn, q_ids))

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):  # (0,)-shaped matrix would crash _norm2
            return _empty_cos_partial()
        qm, qnrm, qi = ray.get(ref)
        c = _q10k(batch[vec_col])
        cn = np.sqrt(_norm2(c).astype(np.float64))
        ids = batch[id_col].to_numpy()
        sims = (qm @ c.T).astype(np.float64) / (qnrm[:, None] * cn[None, :])
        return _emit_topk_partials(sims, ids, qi, k)

    partials = corpus.map_batches(_partial, batch_format="pandas").to_pandas()
    return _topk_from_partials(partials, k)


def cosine_threshold_pairs(corpus: rd.Dataset, threshold: float = 0.4,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           round_to: int = 4) -> pd.DataFrame:
    """EXACT all-pairs cosine similarity pairs (a < b, cosine ≥
    ``threshold``) — the oracle-checkable exact baseline of the
    embedding near-dup family (float64 path; its oracle uses DuckDB's
    ``list_cosine_similarity`` directly).

    Scale shape: one side of the O(N²) comparison must be resident; it
    is collected once (ids + float64 matrix), broadcast via
    ``ray.put``, and every corpus batch does a single dense matmul
    against it — the corpus side streams. This is the exact-baseline
    tool for corpora whose matrix fits a worker's heap;
    :func:`rdf_extraction_ray.stages.dedup_docs.embedding_neardup_pairs`
    (hyperplane LSH, never all-pairs) is the 100-TB path.
    """

    def _normalize(m: np.ndarray) -> np.ndarray:
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1.0
        return m / n

    # the corpus is consumed twice (resident-side collect + streaming
    # matmul pass); pin it so an expensive upstream runs exactly once
    corpus = corpus.materialize()
    side = corpus.map_batches(
        lambda df: pd.DataFrame({id_col: df[id_col],
                                 vec_col: df[vec_col]}),
        batch_format="pandas").to_pandas()
    if side.empty:
        return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="int64"),
                             "cosine": pd.Series([], dtype="float64")})
    ids_full = side[id_col].to_numpy()
    m_full = _normalize(_matrix(side[vec_col]))
    ref = ray.put((ids_full, m_full))

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame({
                "a": pd.Series([], dtype="int64"),
                "b": pd.Series([], dtype="int64"),
                "cosine": pd.Series([], dtype="float64")})
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


def ivf_topk(corpus: rd.Dataset, queries_df: pd.DataFrame, k: int = 10,
             n_centroids: int = 16, nprobe: int = 4, n_iter: int = 2,
             id_col: str = "vec_id", vec_col: str = "embedding"
             ) -> pd.DataFrame:
    """IVF top-k: the integer-exact distributed k-means
    (:func:`.cluster._fit_centroids` — hash-ordered init, Lloyd rounds
    with floor-division updates, all SQL-replayable) cells the corpus;
    each query only scores vectors in its ``nprobe`` nearest cells
    (integer L2, ties to the smaller cell id). Scoring uses the shared
    quantized-cosine metric, so ``nprobe == n_centroids`` reproduces
    :func:`brute_force_topk` exactly.

    Partitioning assumption: cells are roughly balanced — skewed
    embedding distributions need more centroids (same caveat as the
    reference's fuzzy-match hot spots, SURVEY §7.5.4)."""
    corpus = corpus.materialize()  # fit passes + the scoring pass
    if not len(queries_df) or not corpus.count():
        return _topk_from_partials(pd.DataFrame(), k)
    cents = _fit_centroids(corpus, k=n_centroids, n_iter=n_iter,
                           id_col=id_col, vec_col=vec_col)
    q10 = _q10k(queries_df[vec_col])
    qn = np.sqrt(_norm2(q10).astype(np.float64))
    q_ids = queries_df[id_col].to_numpy()
    # probe the nprobe nearest cells by integer L2 on the ×1000 grid
    # (the cells' own quantization), ties to the smaller cell id
    qk = _quantize(queries_df[vec_col])
    d = ((qk[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    order = np.argsort(d, axis=1, kind="stable")      # tie → smaller c
    probe = order[:, :nprobe]                         # (nq, nprobe)
    ref = ray.put((q10, qn, q_ids, probe, cents))

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return _empty_cos_partial()
        qm, qnrm, qi, pr, ce = ray.get(ref)
        m = _matrix(batch[vec_col])  # one conversion, two grids
        c10 = _qscale(m, Q_SCALE)
        cn = np.sqrt(_norm2(c10).astype(np.float64))
        ids = batch[id_col].to_numpy()
        cell = _assign(_qscale(m, PLANE_SCALE), ce)
        mask = (pr[:, :, None] == cell[None, None, :]).any(axis=1)  # (nq, nc)
        sims = (qm @ c10.T).astype(np.float64) / (qnrm[:, None] * cn[None, :])
        sims[~mask] = -2.0
        return _emit_topk_partials(sims, ids, qi, k)

    partials = corpus.map_batches(_partial, batch_format="pandas").to_pandas()
    return _topk_from_partials(partials, k)


#: masked-out candidates (outside the probed cells) carry this
#: distance and never emit — mirrors the -2.0 cosine sentinel
_DIST_SENTINEL = np.int64(2**62)


def _emit_mink_partials(dists: np.ndarray, ids: np.ndarray,
                        q_ids: np.ndarray, k: int) -> pd.DataFrame:
    """Distance-ranked twin of :func:`_emit_topk_partials`: emit every
    candidate at or below the row's k-th SMALLEST distance (tied
    cohorts survive to the driver merge, which orders by
    (dist asc, neighbor_id asc))."""
    nc = dists.shape[1]
    kk = min(k, nc)
    if kk == 0:
        return pd.DataFrame({
            "query_id": pd.Series([], dtype=q_ids.dtype),
            "neighbor_id": pd.Series([], dtype="int64"),
            "adist": pd.Series([], dtype="int64")})
    kth = np.partition(dists, kk - 1, axis=1)[:, kk - 1]
    keep = (dists <= kth[:, None]) & (dists < _DIST_SENTINEL)
    qrow, cidx = np.nonzero(keep)
    out = pd.DataFrame({
        "query_id": q_ids[qrow],
        "neighbor_id": ids[cidx],
        "adist": dists[qrow, cidx].astype("int64")})
    # lossless per-batch truncation under the total merge order —
    # see _emit_topk_partials
    out = out.sort_values(["query_id", "adist", "neighbor_id"],
                          kind="stable")
    return out.groupby("query_id", sort=False).head(kk) \
        .reset_index(drop=True)


def _mink_from_partials(partials: pd.DataFrame, k: int) -> pd.DataFrame:
    if partials.empty:
        return pd.DataFrame({
            "query_id": pd.Series([], dtype="int64"),
            "neighbor_id": pd.Series([], dtype="int64"),
            "rank": pd.Series([], dtype="int64")})
    partials = partials.sort_values(
        ["query_id", "adist", "neighbor_id"], kind="stable")
    out = partials.groupby("query_id", sort=True).head(k).copy()
    out["rank"] = out.groupby("query_id").cumcount().astype("int64")
    return out[["query_id", "neighbor_id", "rank"]]         .reset_index(drop=True)


def _fit_pq_codebooks(corpus: rd.Dataset, m_sub: int, k: int,
                      n_iter: int, id_col: str,
                      vec_col: str) -> np.ndarray:
    """(m_sub, k, d) int64 PRODUCT-QUANTIZATION codebooks: the same
    integer-exact Lloyd recurrence as :func:`.cluster._fit_centroids`
    run over every subspace AT ONCE — init rows shared across
    subspaces (the k smallest-(md5, id) vectors, sliced), one
    ``map_batches`` pass per round emitting (m, c, count, sum) partial
    rows for ALL subspaces, driver reduce of O(batches·m·k) rows."""
    init_full = init_centroids(corpus, k, id_col, vec_col)
    dim = init_full.shape[1]
    if dim % m_sub:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    d = dim // m_sub
    kk = init_full.shape[0]  # may be < k on tiny inputs
    cents = np.ascontiguousarray(
        init_full.reshape(kk, m_sub, d).transpose(1, 0, 2))

    for _ in range(n_iter):
        ref = ray.put(cents)

        def _partials(batch: pd.DataFrame) -> pd.DataFrame:
            ce = ray.get(ref)
            x = _quantize(batch[vec_col]).reshape(-1, m_sub, d)
            ms, cs, ns, ss = [], [], [], []
            for m in range(m_sub):
                a = _assign(x[:, m, :], ce[m])
                sums = np.zeros((kk, d), dtype=np.int64)
                np.add.at(sums, a, x[:, m, :])
                cnt = np.bincount(a, minlength=kk).astype(np.int64)
                ms.append(np.full(kk, m, dtype=np.int64))
                cs.append(np.arange(kk, dtype=np.int64))
                ns.append(cnt)
                ss.extend(sums[j].tolist() for j in range(kk))
            return pd.DataFrame({"m": np.concatenate(ms),
                                 "c": np.concatenate(cs),
                                 "n": np.concatenate(ns),
                                 "s": ss})

        parts = (corpus.map_batches(_partials, batch_format="pandas")
                 .to_pandas())  # O(batches · m · k) rows — bounded
        cs_sum = np.zeros((m_sub, kk, d), dtype=np.int64)
        np.add.at(cs_sum, (parts["m"].to_numpy(), parts["c"].to_numpy()),
                  np.asarray(parts["s"].tolist(), dtype=np.int64))
        cnt = np.zeros((m_sub, kk), dtype=np.int64)
        np.add.at(cnt, (parts["m"].to_numpy(), parts["c"].to_numpy()),
                  parts["n"].to_numpy())
        nxt = cents.copy()
        nz = cnt > 0  # empty codewords keep their previous centroid
        nxt[nz] = cs_sum[nz] // cnt[nz][:, None]
        cents = nxt
    return cents


def pq_topk(corpus: rd.Dataset, queries_df: pd.DataFrame, k: int = 10,
            m_sub: int = 4, n_codes: int = 16, n_iter: int = 2,
            id_col: str = "vec_id", vec_col: str = "embedding"
            ) -> pd.DataFrame:
    """PRODUCT-QUANTIZATION top-k (the PQ half of IVF-PQ, Jégou et
    al. 2011) with asymmetric distance computation: per-subspace
    integer-exact codebooks (:func:`_fit_pq_codebooks`, the shared
    Lloyd recurrence on the ×1000 grid), corpus vectors encode to
    ``m_sub`` one-byte codes, and each query ranks candidates by the
    table-lookup distance Σ_m ||q_m − codeword(code_m)||² — exact
    integer arithmetic end to end, so the DuckDB oracle replays every
    codebook, code and distance bit for bit. Ties break to the
    smaller neighbor id.

    Scale shape: codebooks are tiny (m·k·d ints) and ride the object
    store; the scoring pass streams the corpus ONCE — encode (m
    argmins over k codewords) + one gather-sum per batch — emitting
    bounded per-batch partial top-k rows. The memory win PQ exists
    for (codes instead of vectors) shows up at re-ranking/serving
    time; here the codes are derived in the same pass that scores
    them, so nothing vector-shaped ever lands on the driver."""
    corpus = corpus.materialize()  # init + Lloyd + scoring passes
    if not len(queries_df) or not corpus.count():
        return _mink_from_partials(pd.DataFrame(), k)
    cents = _fit_pq_codebooks(corpus, m_sub, n_codes, n_iter,
                              id_col, vec_col)
    d = cents.shape[2]
    q = _quantize(queries_df[vec_col])
    nq = q.shape[0]
    qs = q.reshape(nq, m_sub, d)
    # (nq, m, k) integer distance tables — the ADC lookup tables
    dt = ((qs[:, :, None, :].astype(np.int64)
           - cents[None, :, :, :]) ** 2).sum(axis=3)
    q_ids = queries_df[id_col].to_numpy()
    ref = ray.put((dt, q_ids, cents))

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return _empty_dist_partial()
        dtb, qi, ce = ray.get(ref)
        x = _quantize(batch[vec_col]).reshape(-1, m_sub, d)
        ids = batch[id_col].to_numpy()
        ad = np.zeros((dtb.shape[0], x.shape[0]), dtype=np.int64)
        for m in range(m_sub):
            codes_m = _assign(x[:, m, :], ce[m])
            ad += dtb[:, m, codes_m]
        return _emit_mink_partials(ad, ids, qi, k)

    partials = corpus.map_batches(_partial,
                                  batch_format="pandas").to_pandas()
    return _mink_from_partials(partials, k)


def ivfpq_topk(corpus: rd.Dataset, queries_df: pd.DataFrame,
               k: int = 10, n_centroids: int = 16, nprobe: int = 4,
               m_sub: int = 4, n_codes: int = 16, n_iter: int = 2,
               id_col: str = "vec_id", vec_col: str = "embedding"
               ) -> pd.DataFrame:
    """IVF-PQ top-k — the canonical billion-scale ANN recipe (Jégou
    et al. 2011): the coarse quantizer (:func:`.cluster`'s
    integer-exact k-means) prunes the corpus to each query's
    ``nprobe`` nearest cells, and candidates rank by the PQ
    asymmetric table-lookup distance (:func:`pq_topk`'s metric; no
    residual encoding — both halves stay independently oracle-exact).
    ``nprobe == n_centroids`` reproduces :func:`pq_topk` exactly.

    Scale shape: coarse centroids + codebooks are tiny broadcast
    state; one streaming scoring pass encodes, masks and gathers per
    batch; queries with fewer than k in-cell candidates return fewer
    rows (mask sentinel never emits)."""
    corpus = corpus.materialize()
    if not len(queries_df) or not corpus.count():
        return _mink_from_partials(pd.DataFrame(), k)
    coarse = _fit_centroids(corpus, k=n_centroids, n_iter=n_iter,
                            id_col=id_col, vec_col=vec_col)
    cents = _fit_pq_codebooks(corpus, m_sub, n_codes, n_iter,
                              id_col, vec_col)
    d = cents.shape[2]
    q = _quantize(queries_df[vec_col])
    nq = q.shape[0]
    qs = q.reshape(nq, m_sub, d)
    dt = ((qs[:, :, None, :].astype(np.int64)
           - cents[None, :, :, :]) ** 2).sum(axis=3)
    # probe the nprobe nearest coarse cells (integer L2 on the same
    # ×1000 grid, ties to the smaller cell id — the IVF rule)
    dq = ((q[:, None, :] - coarse[None, :, :]) ** 2).sum(axis=2)
    probe = np.argsort(dq, axis=1, kind="stable")[:, :nprobe]
    q_ids = queries_df[id_col].to_numpy()
    ref = ray.put((dt, q_ids, cents, coarse, probe))

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return _empty_dist_partial()
        dtb, qi, ce, co, pr = ray.get(ref)
        x = _quantize(batch[vec_col])
        xs = x.reshape(-1, m_sub, d)
        ids = batch[id_col].to_numpy()
        cell = _assign(x, co)
        mask = (pr[:, :, None] == cell[None, None, :]).any(axis=1)
        ad = np.zeros((dtb.shape[0], x.shape[0]), dtype=np.int64)
        for m in range(m_sub):
            codes_m = _assign(xs[:, m, :], ce[m])
            ad += dtb[:, m, codes_m]
        ad[~mask] = _DIST_SENTINEL
        return _emit_mink_partials(ad, ids, qi, k)

    partials = corpus.map_batches(_partial,
                                  batch_format="pandas").to_pandas()
    return _mink_from_partials(partials, k)


def lsh_topk(corpus: rd.Dataset, queries_df: pd.DataFrame, k: int = 10,
             n_bits: int = 8, n_tables: int = 4, seed: int = 99,
             id_col: str = "vec_id", vec_col: str = "embedding",
             dim: int | None = None) -> pd.DataFrame:
    """Random-hyperplane LSH top-k (approximate).

    Corpus vectors land in ``n_tables`` hash buckets (bit = sign of an
    integer plane·vector dot — exact); each query only scores
    candidates sharing a bucket in ANY table. Partitioning assumption:
    bucket population ~ corpus/2^n_bits per table — skewed data needs
    more bits."""
    if not len(queries_df):
        return _topk_from_partials(pd.DataFrame(), k)
    if dim is None:
        dim = len(queries_df[vec_col].iloc[0])
    planes = int_planes(n_tables, n_bits, dim, seed)
    q = _q10k(queries_df[vec_col])
    qn = np.sqrt(_norm2(q).astype(np.float64))
    q_ids = queries_df[id_col].to_numpy()
    pw = (1 << np.arange(n_bits)).astype(np.int64)
    q_buckets = np.stack([((q @ planes[t].T) > 0) @ pw
                          for t in range(n_tables)], axis=1)  # (nq, nt)
    ref = ray.put((q, qn, q_ids, q_buckets, planes, pw))

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return _empty_cos_partial()
        qm, qnrm, qi, qb, pl, powv = ray.get(ref)
        c = _q10k(batch[vec_col])
        cn = np.sqrt(_norm2(c).astype(np.float64))
        ids = batch[id_col].to_numpy()
        cb = np.stack([((c @ pl[t].T) > 0) @ powv
                       for t in range(len(pl))], axis=1)      # (nc, nt)
        # candidate mask: share a bucket in any table
        mask = (qb[:, None, :] == cb[None, :, :]).any(axis=2)  # (nq, nc)
        sims = (qm @ c.T).astype(np.float64) / (qnrm[:, None] * cn[None, :])
        sims[~mask] = -2.0
        return _emit_topk_partials(sims, ids, qi, k)

    partials = corpus.map_batches(_partial, batch_format="pandas").to_pandas()
    return _topk_from_partials(partials, k)
