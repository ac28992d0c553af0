"""IVF ANN + embedding-cosine near-dup tests."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from rdf_extraction_ray.stages.ann import brute_force_topk, ivf_topk
from rdf_extraction_ray.stages.cluster import _fit_centroids
from rdf_extraction_ray.stages.dedup_docs import embedding_neardup_pairs


def _vec_table(mat: np.ndarray) -> rd.Dataset:
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(range(len(mat)), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              pa.list_(pa.float32())),
    }))


def _random_corpus(n=400, dim=16, seed=3):
    rng = np.random.RandomState(seed)
    m = rng.randn(n, dim)
    return m / np.linalg.norm(m, axis=1, keepdims=True)


class TestIVF:
    def test_centroids_deterministic_and_integer(self):
        ds = _vec_table(_random_corpus())
        c1 = _fit_centroids(ds, k=8, n_iter=2, id_col="vec_id",
                            vec_col="embedding")
        c2 = _fit_centroids(ds, k=8, n_iter=2, id_col="vec_id",
                            vec_col="embedding")
        assert (c1 == c2).all()
        assert c1.dtype == np.int64

    def test_recall_vs_bruteforce(self):
        m = _random_corpus(600, 16)
        ds = _vec_table(m)
        qdf = pd.DataFrame({"vec_id": range(5),
                            "embedding": [list(map(float, m[i]))
                                          for i in range(5)]})
        exact = brute_force_topk(ds, qdf, k=10)
        approx = ivf_topk(ds, qdf, k=10, n_centroids=8, nprobe=4)
        recalls = []
        for q in range(5):
            e = set(exact[exact["query_id"] == q]["neighbor_id"])
            a = set(approx[approx["query_id"] == q]["neighbor_id"])
            recalls.append(len(e & a) / len(e))
        assert np.mean(recalls) >= 0.6  # nprobe=4/8 cells probed

    def test_full_probe_equals_bruteforce(self):
        m = _random_corpus(200, 8, seed=9)
        ds = _vec_table(m)
        qdf = pd.DataFrame({"vec_id": [0, 1],
                            "embedding": [list(map(float, m[i]))
                                          for i in range(2)]})
        exact = brute_force_topk(ds, qdf, k=5)
        full = ivf_topk(ds, qdf, k=5, n_centroids=4, nprobe=4)
        assert exact.equals(full)


class TestEmbeddingNearDup:
    def test_planted_duplicates_found(self):
        m = _random_corpus(300, 16, seed=5)
        # plant near-dups: 301≈0, 302≈7 (tiny perturbation)
        dup0 = m[0] + 1e-4
        dup7 = m[7] + 1e-4
        mat = np.vstack([m, dup0[None, :], dup7[None, :]])
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        out = embedding_neardup_pairs(_vec_table(mat), threshold=0.999)
        # scale contract: the operator returns a DATASET — the pair
        # set is deduped distributively, never collected on the driver
        assert isinstance(out, rd.Dataset)
        pairs = out.to_pandas()
        got = set(map(tuple, pairs[["a", "b"]].itertuples(index=False)))
        assert (0, 300) in got
        assert (7, 301) in got
        assert (pairs["cosine"] >= 0.999).all()

    def test_no_false_pairs_on_random(self):
        m = _random_corpus(100, 32, seed=11)
        out = embedding_neardup_pairs(_vec_table(m), threshold=0.99)
        assert out.count() == 0
        # the DATASET keeps the typed (a, b, cosine) schema even with
        # zero pairs (Ray's to_pandas drops columns on empty datasets,
        # so the schema — not the collected frame — is the contract)
        assert out.schema().names == ["a", "b", "cosine"]


class TestAnnRecall:
    """Recall bars for the approximate paths vs the exact baseline, on
    a clustered corpus (the regime ANN parameters are tuned for; on
    isotropic gaussian noise no sublinear method clears 0.9)."""

    def _clustered(self, n=400, dim=24, k=8, seed=5):
        rng = np.random.RandomState(seed)
        centers = rng.randn(k, dim) * 3
        vecs = (centers[np.arange(n) % k]
                + 0.15 * rng.randn(n, dim)).astype(np.float32)
        return pd.DataFrame({"vec_id": np.arange(n),
                             "embedding": [v.tolist() for v in vecs]})

    @staticmethod
    def _recall(approx: pd.DataFrame, exact: pd.DataFrame) -> float:
        hits = 0
        total = 0
        for q, g in exact.groupby("query_id"):
            truth = set(g["neighbor_id"])
            got = set(approx[approx["query_id"] == q]["neighbor_id"])
            hits += len(truth & got)
            total += len(truth)
        return hits / total

    def test_lsh_recall_vs_bruteforce(self):
        from rdf_extraction_ray.stages.ann import brute_force_topk, lsh_topk
        df = self._clustered()
        corpus = rd.from_pandas(df)
        q = df.head(8)
        exact = brute_force_topk(corpus, q, k=10)
        approx = lsh_topk(corpus, q, k=10, n_bits=6, n_tables=8)
        r = self._recall(approx, exact)
        print(f"lsh recall@10 = {r:.3f}")
        assert r >= 0.9

    def test_ivf_recall_vs_bruteforce(self):
        from rdf_extraction_ray.stages.ann import brute_force_topk, ivf_topk
        df = self._clustered()
        corpus = rd.from_pandas(df)
        q = df.head(8)
        exact = brute_force_topk(corpus, q, k=10)
        approx = ivf_topk(corpus, q, k=10, n_centroids=16, nprobe=4)
        r = self._recall(approx, exact)
        print(f"ivf recall@10 = {r:.3f}")
        assert r >= 0.9


def test_bruteforce_tied_cohort_survives_batch_cutoff():
    """Deterministic under ties: with more identical vectors than k in
    ONE batch, the kept neighbors must be the smallest ids — an
    id-blind per-batch argpartition could discard them before the
    driver merge."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rdf_extraction_ray.stages.ann import brute_force_topk
    base = np.ones(8, dtype=np.float64)
    df = pd.DataFrame({
        "vec_id": np.arange(30),
        "embedding": [(base * (1 if i < 20 else -1)).tolist()
                      for i in range(30)]})
    # 20 exact duplicates of the query direction, k=5 → the five
    # smallest ids of the tied cohort must win
    out = brute_force_topk(rd.from_pandas(df), df.head(1), k=5)
    assert sorted(out["neighbor_id"]) == [0, 1, 2, 3, 4]


class TestPQTopk:
    """Product-quantization ADC ranking: exact vs a single-process
    reference of the same recurrence, plus self-retrieval recall."""

    @staticmethod
    def _naive(corpus_df, queries_df, k, m_sub, n_codes, n_iter):
        import hashlib

        import numpy as np

        def quant(col):
            e = np.asarray([np.asarray(v, dtype=np.float64)
                            for v in col])
            return np.floor(e * 1000.0 + 0.5).astype(np.int64)

        x = quant(corpus_df["embedding"])
        ids = corpus_df["vec_id"].to_numpy()
        h = np.array([int(hashlib.md5(str(int(v)).encode())
                          .hexdigest()[:15], 16) for v in ids])
        order = np.lexsort((ids, h))[:n_codes]
        dim = x.shape[1]
        d = dim // m_sub
        cents = x[order].reshape(-1, m_sub, d) \
            .transpose(1, 0, 2).copy()
        kk = cents.shape[1]
        xs = x.reshape(-1, m_sub, d)
        for _ in range(n_iter):
            nxt = cents.copy()
            for m in range(m_sub):
                dmat = ((xs[:, None, m, :] - cents[None, m]) ** 2) \
                    .sum(-1)
                a = dmat.argmin(1)
                for c in range(kk):
                    sel = xs[a == c, m, :]
                    if len(sel):
                        nxt[m, c] = sel.sum(0) // len(sel)
            cents = nxt
        q = quant(queries_df["embedding"]).reshape(-1, m_sub, d)
        qi = queries_df["vec_id"].to_numpy()
        out = []
        for i in range(len(qi)):
            ad = np.zeros(len(ids), dtype=np.int64)
            for m in range(m_sub):
                dmat = ((xs[:, m, :][:, None, :]
                         - cents[None, m]) ** 2).sum(-1)
                codes = dmat.argmin(1)
                dt = ((q[i, m] - cents[m]) ** 2).sum(-1)
                ad += dt[codes]
            rank = np.lexsort((ids, ad))[:k]
            for r, j in enumerate(rank):
                out.append((qi[i], ids[j], r))
        return sorted(out)

    def test_matches_reference(self):
        rng = np.random.RandomState(17)
        emb = rng.randn(40, 8).round(3)
        df = pd.DataFrame({"vec_id": np.arange(40),
                           "embedding": [list(r) for r in emb]})
        qdf = df.head(5)
        from rdf_extraction_ray.stages.ann import pq_topk
        got = pq_topk(rd.from_pandas(df), qdf, k=6, m_sub=2,
                      n_codes=8, n_iter=2)
        got_t = sorted(map(tuple, got.to_numpy()))
        want = self._naive(df, qdf, 6, 2, 8, 2)
        assert got_t == want

    def test_self_retrieval_recall(self):
        rng = np.random.RandomState(4)
        emb = rng.randn(120, 16).round(3)
        df = pd.DataFrame({"vec_id": np.arange(120),
                           "embedding": [list(r) for r in emb]})
        qdf = df.head(8)
        from rdf_extraction_ray.stages.ann import pq_topk
        got = pq_topk(rd.from_pandas(df), qdf, k=10, m_sub=4,
                      n_codes=16, n_iter=2)
        hits = sum(
            int(q) in set(got.loc[got["query_id"] == q,
                                  "neighbor_id"])
            for q in qdf["vec_id"])
        assert hits >= 6  # ADC is approximate; most selves survive


class TestIVFPQ:
    def test_full_probe_reproduces_pq(self):
        rng = np.random.RandomState(23)
        emb = rng.randn(60, 8).round(3)
        df = pd.DataFrame({"vec_id": np.arange(60),
                           "embedding": [list(r) for r in emb]})
        qdf = df.head(5)
        from rdf_extraction_ray.stages.ann import ivfpq_topk, pq_topk
        a = pq_topk(rd.from_pandas(df), qdf, k=7, m_sub=2,
                    n_codes=8, n_iter=2)
        b = ivfpq_topk(rd.from_pandas(df), qdf, k=7,
                       n_centroids=8, nprobe=8, m_sub=2,
                       n_codes=8, n_iter=2)
        pd.testing.assert_frame_equal(
            a.reset_index(drop=True), b.reset_index(drop=True))

    def test_narrow_probe_prunes_and_may_shorten(self):
        rng = np.random.RandomState(29)
        emb = rng.randn(40, 8).round(3)
        df = pd.DataFrame({"vec_id": np.arange(40),
                           "embedding": [list(r) for r in emb]})
        qdf = df.head(4)
        from rdf_extraction_ray.stages.ann import ivfpq_topk
        out = ivfpq_topk(rd.from_pandas(df), qdf, k=30,
                         n_centroids=8, nprobe=1, m_sub=2,
                         n_codes=8, n_iter=2)
        # with one probed cell of 8, no query can see all 40 vectors
        per_q = out.groupby("query_id").size()
        assert (per_q < 40).all() and len(out) > 0
        # ranks are dense from 0 per query
        for q, g in out.groupby("query_id"):
            assert g["rank"].tolist() == list(range(len(g)))
