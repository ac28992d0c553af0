"""Document deduplication operators (training-data pipeline suite):

- :func:`exact_dedup` — hash-partition on content hash + per-group
  first (same two-level shape as the triple dedup).
- :class:`MinHasher` + :func:`minhash_lsh_candidates` — shingle →
  minhash → band → bucket-groupby candidate generation.
- :func:`verify_jaccard` — exact n-gram Jaccard verification of
  candidate pairs, fully DISTRIBUTED: gram-hash arrays are computed as
  a Dataset over only the docs that appear in candidate pairs, then
  attached to the pairs with two partitioned hash joins. On the JOIN
  path the driver holds only the candidate id list; candidate sets
  under ``BROADCAST_VERIFY_CAP`` take a faster broadcast path that
  does collect those candidates' texts onto the driver once.
- :class:`SimHasher` — 64-bit simhash per doc (vectorized over the
  batch's unique words; per-word md5 so the hash is reproducible in
  SQL for the DuckDB oracle).
- :func:`connected_components` (pandas reference implementation) and
  :func:`connected_components_ds` — min-label propagation + pointer
  jumping over candidate pairs as Dataset hash-join/groupby rounds;
  converges in O(log diameter) rounds with a raising (never silent)
  round guard.
- :func:`embedding_neardup_pairs` — hyperplane-LSH bucketed cosine
  near-dup pairs, integer-exact (quantized vectors + integer planes,
  big-int threshold test) so a DuckDB oracle replays it bit for bit;
  vectors transit the shuffle as Arrow ``fixed_size_list<int32>``
  columns (compact and schema-stable, no object dtype).

All hashes are seeded/deterministic (no PYTHONHASHSEED dependence).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

_PAIR_SCHEMA = pa.schema([("a", pa.int64()), ("b", pa.int64())])

_MINHASH_CACHE: dict = {}   # per worker process: params → MinHasher
_SIMHASH_CACHE: list = []   # per worker process: [SimHasher]
_GRAM_MEMO: dict = {}       # per worker process: ngram → {TEXT: grams}
# (keyed by the text itself, NOT doc_id: doc ids are reused across
# corpora within one worker process, and a doc-keyed memo would serve
# stale grams — python string hashing makes the text key O(len) once)
_BCAST_CACHE: dict = {}     # per worker process: object-ref hex → value


def _cached_get(ref):
    """``ray.get`` with a per-process cache: a pickled dict broadcast
    deserializes ONCE per worker, not once per batch. Holds a few
    live broadcasts (FIFO past 4) — stages that alternate TWO refs
    per batch (e.g. a key set + a weight table) would otherwise
    evict each other every call and re-fetch for the whole scan."""
    import ray as _ray
    key = ref.hex()
    if key not in _BCAST_CACHE:
        while len(_BCAST_CACHE) >= 4:
            _BCAST_CACHE.pop(next(iter(_BCAST_CACHE)))
        _BCAST_CACHE[key] = _ray.get(ref)
    return _BCAST_CACHE[key]


def _memoized_grams(text: str, ngram: int) -> np.ndarray:
    """Per-process text→gram-array memo shared by both verify paths."""
    memo = _GRAM_MEMO.setdefault(ngram, {})
    g = memo.get(text)
    if g is None:
        if len(memo) > 200_000:  # bound worker memory
            memo.clear()
        g = _rolling_gram_hashes(text, ngram)
        memo[text] = g
    return g


def _jaccard_scores(texts_a, texts_b, ngram: int) -> np.ndarray:
    """Exact n-gram Jaccard per (text_a, text_b) pair."""
    jac = np.empty(len(texts_a))
    for i, (ta, tb) in enumerate(zip(texts_a, texts_b)):
        ga = _memoized_grams(ta, ngram)
        gb = _memoized_grams(tb, ngram)
        inter = len(np.intersect1d(ga, gb, assume_unique=True))
        jac[i] = inter / max(1, len(ga) + len(gb) - inter)
    return jac


def simhash_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Task-pool body: per-process cached :class:`SimHasher` (keeps
    the word→votes memo across batches without actor startup)."""
    if not _SIMHASH_CACHE:
        _SIMHASH_CACHE.append(SimHasher())
    return _SIMHASH_CACHE[0](batch)


# ------------------------------------------------------------- exact

def exact_dedup(ds: rd.Dataset, text_col: str = "text",
                id_col: str = "doc_id", n_buckets: int = 64) -> rd.Dataset:
    """Keep the smallest ``id_col`` per distinct ``text_col`` value.

    Returns (text_key=md5hex, doc_id=min id, n_dups=count)."""

    def _local(batch: pd.DataFrame) -> pd.DataFrame:
        key = batch[text_col].map(
            lambda t: hashlib.md5(str(t).encode()).hexdigest())
        g = (pd.DataFrame({"text_key": key, id_col: batch[id_col]})
             .groupby("text_key", as_index=False)
             .agg(**{id_col: (id_col, "min"), "n_dups": (id_col, "size")}))
        g["bucket"] = (pd.util.hash_pandas_object(g["text_key"], index=False)
                       % n_buckets).astype("int64")
        return g

    def _merge(group: pd.DataFrame) -> pd.DataFrame:
        return (group.groupby("text_key", as_index=False)
                .agg(**{id_col: (id_col, "min"), "n_dups": ("n_dups", "sum")}))

    return (ds.map_batches(_local, batch_format="pandas")
            .groupby("bucket").map_groups(_merge, batch_format="pandas"))


def normalize_text(s: pd.Series) -> pd.Series:
    """CCNet-style dedup normalization: lowercase, every non-alnum run
    collapsed to one space, ends trimmed — so case/punctuation/
    whitespace variants of a document hash identically. Vectorized
    pandas string kernels (no Python row loop)."""
    return (s.fillna("").str.lower()
            .str.replace(r"[^a-z0-9]+", " ", regex=True)
            .str.strip())


def normalized_dedup(ds: rd.Dataset, text_col: str = "text",
                     id_col: str = "doc_id",
                     n_buckets: int = 64) -> rd.Dataset:
    """Exact dedup AFTER normalization (keep the smallest id per
    normalized text) — catches the trivial-variant duplicates
    (case/punct/whitespace) exact dedup misses, at the same cost: the
    md5 of the normalized text is the combiner key, so only (key, id,
    count) rows reach the hash-bucket exchange, never document bodies.

    Returns (norm_key=md5hex, doc_id=min id, n_dups=count).
    """

    def _local(batch: pd.DataFrame) -> pd.DataFrame:
        key = normalize_text(batch[text_col]).map(
            lambda t: hashlib.md5(t.encode()).hexdigest())
        g = (pd.DataFrame({"norm_key": key, id_col: batch[id_col]})
             .groupby("norm_key", as_index=False)
             .agg(**{id_col: (id_col, "min"), "n_dups": (id_col, "size")}))
        g["bucket"] = (pd.util.hash_pandas_object(g["norm_key"], index=False)
                       % n_buckets).astype("int64")
        return g

    def _merge(group: pd.DataFrame) -> pd.DataFrame:
        return (group.groupby("norm_key", as_index=False)
                .agg(**{id_col: (id_col, "min"), "n_dups": ("n_dups", "sum")}))

    return (ds.map_batches(_local, batch_format="pandas")
            .groupby("bucket").map_groups(_merge, batch_format="pandas"))


# ----------------------------------------------------------- minhash

def _rolling_gram_hashes(text: str, k: int) -> np.ndarray:
    """Sorted unique polynomial hashes of the character ``k``-grams of
    the whitespace-normalized text (vectorized over positions)."""
    t = " ".join(str(text).lower().split())
    if len(t) < k:
        t = t.ljust(k, "_")
    # pad the ENCODED bytes too: 'ignore' drops unencodable chars
    # (lone surrogates from surrogateescape-decoded crawl bytes), so
    # a char-length-padded string can still encode to < k bytes —
    # n would go non-positive and crash np.zeros / corrupt reduceat
    raw = t.encode("utf-8", "ignore")
    if len(raw) < k:
        raw = raw.ljust(k, b"_")
    data = np.frombuffer(raw, dtype=np.uint8)
    n = len(data) - k + 1
    acc = np.zeros(n, dtype=np.uint64)
    for j in range(k):
        acc = acc * np.uint64(1000003) + data[j:j + n].astype(np.uint64)
    return np.unique(acc)


class MinHasher:
    """Actor-pool stage: text → k minhash values over character
    shingles, emitted as ``n_bands`` band keys (LSH).

    Permutation parameters are derived from a fixed seed in
    ``__init__`` — once per actor, identical on every actor. The
    signature computation is batched: all docs' shingle hashes are
    concatenated and one ``(num_perm × shingles)`` universal-hash
    matrix per chunk is min-reduced at the doc offsets
    (``np.minimum.reduceat``) — no per-doc Python in the hot path
    beyond string normalization.
    """

    def __init__(self, num_perm: int = 64, n_bands: int = 16,
                 shingle: int = 5, seed: int = 1337,
                 chunk_shingles: int = 262_144):
        if num_perm % n_bands:
            raise ValueError(
                f"n_bands ({n_bands}) must divide num_perm "
                f"({num_perm}) evenly — an indivisible split would "
                "silently truncate signature rows")
        rng = np.random.RandomState(seed)
        # 32-bit universal-hash arithmetic throughout: numpy's 64-bit
        # integer multiply has no SIMD path (measured ~100x slower on
        # the big signature matrices); equal shingle sets still map to
        # equal signatures, which is all LSH band equality needs
        self.a = (rng.randint(0, 1 << 31, size=num_perm).astype(np.uint32)
                  * np.uint32(2) + np.uint32(1))  # odd multipliers
        self.b = rng.randint(0, 1 << 31, size=num_perm).astype(np.uint32)
        self.num_perm = num_perm
        self.n_bands = n_bands
        self.rows = num_perm // n_bands
        self.shingle = shingle
        self.chunk_shingles = chunk_shingles
        # Reused hash workspace: allocating the (num_perm × chunk)
        # ~64MB temp fresh per chunk stalls on first-touch page
        # faulting (measured 10.5s → 0.45s once the pages are warm);
        # one buffer per worker, touched at init, keeps the hot path
        # free of large allocations.
        self._buf = np.zeros((num_perm, chunk_shingles), dtype=np.uint32)

    def _shingle_hashes(self, text: str) -> np.ndarray:
        t = " ".join(str(text).lower().split())
        if len(t) < self.shingle:
            t = t.ljust(self.shingle, "_")
        # byte-pad as well — see _rolling_gram_hashes: encoding can
        # drop chars, and an empty shingle set would crash here and
        # corrupt the reduceat offsets downstream
        raw = t.encode("utf-8", "ignore")
        if len(raw) < self.shingle:
            raw = raw.ljust(self.shingle, b"_")
        data = np.frombuffer(raw, dtype=np.uint8)
        n = len(data) - self.shingle + 1
        acc = np.zeros(n, dtype=np.uint32)
        for j in range(self.shingle):
            acc = acc * np.uint32(1000003) + data[j:j + n]
        return np.unique(acc)

    def signature(self, text: str) -> np.ndarray:
        sh = self._shingle_hashes(text)
        v = self.a[:, None] * sh[None, :] + self.b[:, None]
        return v.min(axis=1)

    def _signatures(self, texts) -> np.ndarray:
        """(num_perm, n_docs) signature matrix for a batch."""
        shs = [self._shingle_hashes(t) for t in texts]
        sig_parts = []
        i = 0
        while i < len(shs):
            # bound the (num_perm × shingles) hash matrix per chunk
            j, total = i, 0
            while j < len(shs) and (total == 0
                                    or total + len(shs[j])
                                    <= self.chunk_shingles):
                total += len(shs[j])
                j += 1
            chunk = shs[i:j]
            flat = np.concatenate(chunk)
            offsets = np.cumsum([0] + [len(s) for s in chunk[:-1]])
            if flat.shape[0] <= self._buf.shape[1]:
                v = self._buf[:, :flat.shape[0]]
            else:  # single doc longer than the chunk bound
                v = np.empty((self.num_perm, flat.shape[0]),
                             dtype=np.uint32)
            np.multiply(self.a[:, None], flat[None, :], out=v)
            np.add(v, self.b[:, None], out=v)
            sig_parts.append(np.minimum.reduceat(v, offsets, axis=1))
            i = j
        return np.concatenate(sig_parts, axis=1)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        """Emit one row per (doc, band): (doc_id, band_id, band_hash)."""
        n = len(batch)
        if not n:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "band_id": pd.Series([], dtype="int64"),
                                 "band_hash": pd.Series([], dtype="int64")})
        sig = self._signatures(batch["text"])          # (num_perm, n)
        sig = sig.reshape(self.n_bands, self.rows, n)
        h = np.zeros((self.n_bands, n), dtype=np.uint64)
        P = np.uint64(1099511628211)
        for r in range(self.rows):                     # fold band rows
            h = h * P + sig[:, r, :]
        h = h * P + np.arange(self.n_bands,
                              dtype=np.uint64)[:, None]  # band salt
        ids = batch["doc_id"].to_numpy()
        return pd.DataFrame({
            "doc_id": np.tile(ids, self.n_bands),
            "band_id": np.repeat(np.arange(self.n_bands, dtype=np.int64),
                                 n),
            "band_hash": h.reshape(-1).view(np.int64),
        })


def minhash_lsh_candidates(docs: rd.Dataset, num_perm: int = 64,
                           n_bands: int = 16, shingle: int = 5,
                           concurrency: int | None = None) -> rd.Dataset:
    """docs(doc_id, text) → candidate near-dup pairs (a, b), a < b.

    shingle→minhash→band (task pool, hasher cached per worker
    process — actor spin-up was pure latency for stateless-ish init)
    → groupby(band) → pairs within the band bucket, deduped."""
    params = (num_perm, n_bands, shingle)

    def _mh(batch: pd.DataFrame) -> pd.DataFrame:
        mh = _MINHASH_CACHE.get(params)
        if mh is None:
            mh = MinHasher(num_perm=params[0], n_bands=params[1],
                           shingle=params[2])
            _MINHASH_CACHE[params] = mh
        return mh(batch)

    # small batches: signature work is the pipeline's densest compute,
    # so favor task fan-out over per-batch amortization
    kwargs = dict(batch_format="pandas", batch_size=512)
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    bands = docs.map_batches(_mh, **kwargs)

    def _pairs(group: pd.DataFrame, dense_cap: int = 50) -> pd.DataFrame:
        parts = []
        for _, g in group.groupby(["band_id", "band_hash"], sort=False):
            if len(g) < 2:
                continue
            ids = np.sort(pd.unique(g["doc_id"].to_numpy()))
            if len(ids) <= dense_cap:
                iu, ju = np.triu_indices(len(ids), k=1)
                parts.append(pd.DataFrame({"a": ids[iu], "b": ids[ju]}))
            else:
                # dense bucket: STAR edges to the bucket minimum instead
                # of truncating — O(n) pairs, every member stays
                # connected, so dup components never split on a dense
                # cluster
                parts.append(pd.DataFrame({"a": ids[0], "b": ids[1:]}))
        if not parts:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64")})
        return pd.concat(parts, ignore_index=True).drop_duplicates()

    # group by a band_hash bucket to bound group count
    def _bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch.copy()
        b["bucket"] = (b["band_hash"].to_numpy() % 256).astype("int64")
        return b

    cands = (bands.map_batches(_bucketize, batch_format="pandas")
             .groupby("bucket").map_groups(_pairs, batch_format="pandas"))

    # a pair found in k bands surfaces k times (different band_hash →
    # different groups above); global pair-level dedup keyed on
    # hash(a) so identical pairs always co-locate
    def _pair_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df.assign(pbucket=pd.Series([], dtype="int64"))
        return df.assign(pbucket=(
            pd.util.hash_pandas_object(df["a"], index=False) % 64
        ).astype("int64"))

    def _dedup_pairs(group: pd.DataFrame) -> pd.DataFrame:
        return (group.drop_duplicates(["a", "b"])
                .drop(columns=["pbucket"]))

    return (cands.map_batches(_pair_bucket, batch_format="pandas")
            .groupby("pbucket").map_groups(_dedup_pairs,
                                           batch_format="pandas"))


#: Candidate count below which :func:`verify_jaccard` broadcasts the
#: candidate TEXTS (one ``ray.put``, read by every verify task)
#: instead of running two partitioned hash joins. Candidate doc sets
#: at this size are a few hundred MB at worst — object-store-sized,
#: never driver-heap-resident beyond the put. Larger candidate sets
#: take the join path automatically.
BROADCAST_VERIFY_CAP = 200_000


def verify_jaccard(pairs: rd.Dataset, docs: rd.Dataset,
                   ngram: int = 5, threshold: float = 0.8,
                   id_col: str = "doc_id", text_col: str = "text",
                   broadcast_cap: int | None = None) -> rd.Dataset:
    """Exact character-n-gram Jaccard check of candidate pairs —
    distributed end to end.

    1. the candidate id set (distributed distinct over the pair
       columns — ints only, bounded by 2·|pairs|) filters ``docs``;
    2. candidate TEXTS attach to pairs — via ONE broadcast when the
       candidate set is small (``BROADCAST_VERIFY_CAP``; near-dup
       candidates are normally a sliver of the corpus, and a
       broadcast replaces two sort exchanges), else via two
       partitioned hash joins (texts are ~8x smaller than
       materialized gram-hash arrays);
    3. the verify task shingles each doc once per worker process
       (bounded memo) and scores pairs with a vectorized sorted-array
       intersection.

    The driver holds only the candidate id list — never a gram set
    (the round-1 version built every doc's gram set driver-side,
    which dies at corpus scale)."""
    from .joins import distinct_values, hash_join, semi_join_filter

    # the pair set is consumed twice (melted distinct + the join);
    # pin it in the object store so the candidate pipeline runs once
    pairs = pairs.materialize()
    # ONE melted pass stacks both id columns before the distinct —
    # two separate distinct_values calls paid two full scans and two
    # exchanges for the same id set
    melted = pairs.map_batches(
        lambda df: pd.DataFrame({"v": pd.concat(
            [df["a"], df["b"]], ignore_index=True)}),
        batch_format="pandas")
    cand_ids = set(distinct_values(melted, "v"))
    if not cand_ids:  # no candidates (e.g. empty corpus): typed empty
        return rd.from_pandas(pd.DataFrame({
            "a": pd.Series([], dtype="int64"),
            "b": pd.Series([], dtype="int64"),
            "jaccard": pd.Series([], dtype="float64")}))
    cand_docs = semi_join_filter(docs, cand_ids, id_col)

    cap = BROADCAST_VERIFY_CAP if broadcast_cap is None else broadcast_cap
    if len(cand_ids) <= cap:
        import ray as _ray
        tdf = cand_docs.map_batches(
            lambda t: pa.table({id_col: t.column(id_col).cast(pa.int64()),
                                text_col: t.column(text_col)}),
            batch_format="pyarrow").to_pandas()
        text_ref = _ray.put(dict(zip(tdf[id_col], tdf[text_col])))

        def _verify_bcast(batch: pd.DataFrame) -> pd.DataFrame:
            texts = _cached_get(text_ref)
            # a pair whose doc is absent from `docs` is DROPPED — the
            # same outcome the join path's inner join produces
            present = np.array([a in texts and b in texts
                                for a, b in zip(batch["a"], batch["b"])],
                               dtype=bool)
            batch = batch[present]
            out = batch[["a", "b"]].copy()
            out["jaccard"] = _jaccard_scores(
                [texts[a] for a in batch["a"]],
                [texts[b] for b in batch["b"]], ngram)
            return out[out["jaccard"] >= threshold]

        return pairs.map_batches(_verify_bcast, batch_format="pandas")

    def _as(side: str):
        def inner(t: pa.Table) -> pa.Table:
            return pa.table({side: t.column(id_col).cast(pa.int64()),
                             f"text_{side}": t.column(text_col)})
        return inner

    texts = cand_docs
    j1 = hash_join(
        pairs, texts.map_batches(_as("a"), batch_format="pyarrow"), on="a",
        left_schema=_PAIR_SCHEMA,
        right_schema=pa.schema([("a", pa.int64()),
                                ("text_a", pa.string())]))
    j2 = hash_join(
        j1, texts.map_batches(_as("b"), batch_format="pyarrow"), on="b",
        left_schema=pa.schema([("a", pa.int64()), ("b", pa.int64()),
                               ("text_a", pa.string())]),
        right_schema=pa.schema([("b", pa.int64()),
                                ("text_b", pa.string())]))

    def _verify(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[["a", "b"]].copy()
        out["jaccard"] = _jaccard_scores(batch["text_a"].tolist(),
                                         batch["text_b"].tolist(), ngram)
        return out[out["jaccard"] >= threshold]

    return j2.map_batches(_verify, batch_format="pandas")


# ------------------------------------------------ exact n-gram Jaccard

_NGRAM_MEMO: dict = {}  # per worker process: gram string → int64 hash
_WORD_RE = __import__("re").compile(r"[a-z0-9]+")


def _gram_hash(g: str) -> int:
    """First 15 hex digits of md5 as a positive int64 — chosen so the
    DuckDB oracle can recompute it in SQL
    (``('0x' || substr(md5(g), 1, 15))::BIGINT``)."""
    h = _NGRAM_MEMO.get(g)
    if h is None:
        h = int(hashlib.md5(g.encode()).hexdigest()[:15], 16)
        if len(_NGRAM_MEMO) > 2_000_000:  # bound worker memory
            _NGRAM_MEMO.clear()
        _NGRAM_MEMO[g] = h
    return h


def ngram_jaccard_pairs(docs: rd.Dataset, n_words: int = 5,
                        df_cap: int = 64, threshold: float = 0.5,
                        n_gram_buckets: int = 256,
                        n_pair_buckets: int = 64,
                        id_col: str = "doc_id", text_col: str = "text",
                        round_to: int = 4,
                        metric: str = "jaccard") -> rd.Dataset:
    """EXACT word-n-gram Jaccard similarity pairs (a < b, jaccard ≥
    ``threshold``) via a distributed inverted gram index — no LSH, no
    approximation, fully DuckDB-oracle-checkable.

    Scale shape: docs explode to (gram, doc) rows, grouped by gram
    hash; within each gram group, co-occurring docs emit pair partial
    counts. Gram SELECTIVITY is the scale lever: word 5-grams (the
    default) are ~100x more selective than 3-grams on this corpus
    (measured 13.5k vs 1.27M pair emissions at sf0.1 for the same
    final pair set). Grams with document frequency > ``df_cap`` are
    excluded
    from BOTH the intersection and the union (the standard
    frequent-feature pruning of prefix-filter joins — an O(df²) pair
    blowup on stop-grams would dominate otherwise; the cap is part of
    the operator's declared semantics, and the SQL oracle applies the
    same cap). Everything that shuffles after the gram stage is
    int64-only; texts never leave the map stage.

    ``metric='containment'`` switches the final score to max
    containment ``i / min(na, nb)`` — the asymmetric-overlap measure
    that catches a short document embedded verbatim in a long one,
    which Jaccard's union denominator dilutes below threshold. The
    threshold test is then the EXACT integer comparison
    ``10000·i ≥ round(10000·threshold)·min(na, nb)`` and the reported
    score the raw IEEE quotient — both replay bit-identically in SQL
    (no float-rounding boundary anywhere).
    """
    if metric not in ("jaccard", "containment"):
        raise ValueError(f"unknown metric {metric!r}")
    thr10k = int(round(threshold * 10000))

    def _gram_rows(batch: pd.DataFrame) -> pd.DataFrame:
        ids, grams = [], []
        for d, t in zip(batch[id_col], batch[text_col]):
            ws = _WORD_RE.findall(str(t).lower())
            gs = {" ".join(ws[i:i + n_words])
                  for i in range(len(ws) - n_words + 1)}
            ids.extend([d] * len(gs))
            grams.extend(_gram_hash(g) for g in gs)
        out = pd.DataFrame({id_col: pd.array(ids, dtype="int64"),
                            "gram": pd.array(grams, dtype="int64")})
        out["gbucket"] = (out["gram"] % n_gram_buckets).astype("int64")
        return out

    # one gram lives in exactly one bucket, so per-bucket df IS global
    # df; the reduce emits (kind=0 per-doc count partials, kind=1 pair
    # intersection partials) in one union-schema int table
    def _gram_reduce(group: pd.DataFrame) -> pd.DataFrame:
        df_ = group.groupby("gram")[id_col].transform("size")
        g = group[df_ <= df_cap]
        parts = []
        cnt = g.groupby(id_col, as_index=False).size()
        if len(cnt):
            parts.append(pd.DataFrame({
                "kind": 0, "a": cnt[id_col].to_numpy(),
                "b": -1, "v": cnt["size"].to_numpy()}))
        m = g.merge(g, on="gram")
        m = m[m[f"{id_col}_x"] < m[f"{id_col}_y"]]
        if len(m):
            p = (m.groupby([f"{id_col}_x", f"{id_col}_y"], as_index=False)
                 .size())
            parts.append(pd.DataFrame({
                "kind": 1, "a": p[f"{id_col}_x"].to_numpy(),
                "b": p[f"{id_col}_y"].to_numpy(),
                "v": p["size"].to_numpy()}))
        if not parts:
            return pd.DataFrame({"kind": pd.Series([], dtype="int64"),
                                 "a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64"),
                                 "v": pd.Series([], dtype="int64")})
        out = pd.concat(parts, ignore_index=True)
        out["pbucket"] = (pd.util.hash_pandas_object(
            out["a"], index=False) % n_pair_buckets).astype("int64")
        return out

    def _bucket_of(s: pd.Series) -> np.ndarray:
        return (pd.util.hash_pandas_object(s, index=False)
                % n_pair_buckets).to_numpy().astype("int64")

    def _sum_reduce(group: pd.DataFrame) -> pd.DataFrame:
        """Sum partials AND attach the a-side per-doc gram count
        WITHOUT a join shuffle: kind-0 rows were bucketed by
        hash(doc) and kind-1 rows by hash(a), so every pair's ``na``
        already sits in its own group. Pairs re-key by hash(b) —
        where the b-side counts live — for one final groupby; count
        rows re-emit unchanged. (This replaced two hash_join
        exchanges + a materialize with a single extra groupby.)"""
        g = group.groupby(["kind", "a", "b"], as_index=False)["v"].sum()
        cnt = g[g["kind"] == 0]
        pairs = g[g["kind"] == 1].merge(
            cnt[["a", "v"]].rename(columns={"v": "na"}), on="a")
        parts = []
        if len(cnt):
            parts.append(pd.DataFrame({
                "kind": 0, "a": cnt["a"].to_numpy(),
                "b": np.int64(-1), "i": np.int64(-1),
                "na": cnt["v"].to_numpy(),
                "pbucket2": _bucket_of(cnt["a"])}))
        if len(pairs):
            parts.append(pd.DataFrame({
                "kind": 1, "a": pairs["a"].to_numpy(),
                "b": pairs["b"].to_numpy(),
                "i": pairs["v"].to_numpy(),
                "na": pairs["na"].to_numpy(),
                "pbucket2": _bucket_of(pairs["b"])}))
        if not parts:
            return pd.DataFrame({c: pd.Series([], dtype="int64")
                                 for c in ("kind", "a", "b", "i", "na",
                                           "pbucket2")})
        return pd.concat(parts, ignore_index=True)

    score_col = "jaccard" if metric == "jaccard" else "containment"

    def _finish(group: pd.DataFrame) -> pd.DataFrame:
        cnt = group[group["kind"] == 0]
        pairs = group[group["kind"] == 1]
        if not len(pairs):
            return pd.DataFrame({
                "a": pd.Series([], dtype="int64"),
                "b": pd.Series([], dtype="int64"),
                score_col: pd.Series([], dtype="float64")})
        m = pairs.merge(cnt[["a", "na"]].rename(
            columns={"a": "b", "na": "nb"}), on="b")
        if metric == "containment":
            ii = m["i"].to_numpy(dtype="int64")
            mn = np.minimum(m["na"].to_numpy(dtype="int64"),
                            m["nb"].to_numpy(dtype="int64"))
            keep = 10000 * ii >= thr10k * mn
            return pd.DataFrame({
                "a": m["a"].to_numpy()[keep],
                "b": m["b"].to_numpy()[keep],
                score_col: ii[keep].astype(np.float64)
                / mn[keep].astype(np.float64)})
        i = m["i"].to_numpy().astype(np.float64)
        jac = i / (m["na"].to_numpy() + m["nb"].to_numpy() - i)
        keep = jac >= threshold
        return pd.DataFrame({
            "a": m["a"].to_numpy()[keep],
            "b": m["b"].to_numpy()[keep],
            score_col: np.round(jac[keep], round_to)})

    return (docs.map_batches(_gram_rows, batch_format="pandas")
            .groupby("gbucket").map_groups(_gram_reduce,
                                           batch_format="pandas")
            .groupby("pbucket").map_groups(_sum_reduce,
                                           batch_format="pandas")
            .groupby("pbucket2").map_groups(_finish,
                                            batch_format="pandas"))


# ----------------------------------------------------------- simhash

class SimHasher:
    """64-bit simhash per doc over word features (actor pool).

    Word hash = first 8 bytes of md5 (big-endian) so the DuckDB oracle
    can recompute it in SQL; the per-batch path hashes each UNIQUE
    word once (memoized per actor) and accumulates the ±1 bit votes
    with one vectorized ``np.add.at`` over the exploded
    (doc, distinct word) table."""

    _WORD_RE = r"[a-z0-9]+"

    def __init__(self, cache_cap: int = 1_000_000):
        # NOTE: no seed parameter — the word hash is pure md5 (the
        # SQL-replayable contract), so a seed could not change the
        # signatures; the old parameter was stored and silently
        # ignored, which a multi-probe caller would misread as an
        # independent hash family
        import re
        self.word = re.compile(self._WORD_RE)
        self._bits: dict[str, np.ndarray] = {}  # word → ±1 votes (64,)
        self._cache_cap = cache_cap

    def _word_votes(self, w: str) -> np.ndarray:
        v = self._bits.get(w)
        if v is None:
            h = hashlib.md5(w.encode()).digest()[:8]
            bits = np.unpackbits(np.frombuffer(h, dtype=np.uint8))
            v = np.where(bits > 0, 1, -1).astype(np.int32)
            if len(self._bits) < self._cache_cap:
                self._bits[w] = v
        return v

    def _one(self, text: str) -> np.int64:
        """Scalar spec (kept for tests / SQL-parity documentation)."""
        acc = np.zeros(64, dtype=np.int64)
        for w in set(self.word.findall(str(text).lower())):
            acc += self._word_votes(w)
        val = 0
        for bit in (acc > 0).astype(int):
            val = (val << 1) | int(bit)
        return np.int64(val - (1 << 63))

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        out = batch[["doc_id"]].copy()
        if not n:
            out["simhash"] = pd.Series([], dtype="int64")
            return out
        words = batch["text"].fillna("").str.lower().str.findall(self.word)
        pairs = (pd.DataFrame({
            "pos": np.repeat(np.arange(n), words.str.len()),
            "word": np.concatenate([np.asarray(w, dtype=object)
                                    for w in words])
            if words.str.len().sum() else np.empty(0, dtype=object)})
            .drop_duplicates())
        acc = np.zeros((n, 64), dtype=np.int64)
        if len(pairs):
            uniq, inv = np.unique(pairs["word"].to_numpy(),
                                  return_inverse=True)
            votes = np.stack([self._word_votes(w) for w in uniq])
            np.add.at(acc, pairs["pos"].to_numpy(), votes[inv])
        packed = np.packbits(acc > 0, axis=1).view(">u8").reshape(-1)
        out["simhash"] = (packed.astype(np.uint64)
                          ^ np.uint64(1 << 63)).view(np.int64)
        return out


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR; numpy has no popcount until
    2.x)."""
    x = x.astype(np.uint64)
    m1 = np.uint64(0x5555555555555555)
    m2 = np.uint64(0x3333333333333333)
    m4 = np.uint64(0x0F0F0F0F0F0F0F0F)
    x = x - ((x >> np.uint64(1)) & m1)
    x = (x & m2) + ((x >> np.uint64(2)) & m2)
    x = (x + (x >> np.uint64(4))) & m4
    return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)) \
        .astype(np.int64)


def simhash_pairs(docs: rd.Dataset, max_hamming: int = 3,
                  n_pair_buckets: int = 64) -> rd.Dataset:
    """EXACT simhash near-dup pairs: (a < b, hamming ≤ ``max_hamming``)
    over the 64-bit :class:`SimHasher` signatures.

    Banding is exact here, not approximate: the signature splits into
    ``max_hamming + 1`` bands (4 × 16 bits by default), and by
    pigeonhole any pair within the hamming budget agrees on at least
    one full band — recall is 1 by construction, and the vectorized
    xor-popcount verify removes band false positives. The shuffle
    carries (doc_id, simhash) ints only; band width is the scale
    lever (wider bands → fewer candidates on signature-clustered
    corpora). Fully DuckDB-oracle-checkable (all-pairs
    ``bit_count(xor(...))`` at driver scale).
    """
    n_bands = max_hamming + 1
    assert 64 % n_bands == 0, "band width must divide 64"
    width = 64 // n_bands
    mask = np.uint64((1 << width) - 1)

    def _bands(batch: pd.DataFrame) -> pd.DataFrame:
        sh = simhash_batch(batch)
        h = sh["simhash"].to_numpy().astype(np.int64).astype(np.uint64)
        ids = sh["doc_id"].to_numpy()
        parts = []
        for b in range(n_bands):
            val = (h >> np.uint64(width * b)) & mask
            # band id and value as SEPARATE columns: packing them into
            # one int64 needs a shift that is undefined at width=64
            # (n_bands=1) and a lossy uint64→int64 cast; .view keeps
            # the full 64-bit band value bit-exact
            parts.append(pd.DataFrame({
                "doc_id": ids,
                "simhash": h.view(np.int64),
                "band_id": np.int64(b),
                "band_val": val.view(np.int64)}))
        return pd.concat(parts, ignore_index=True)

    def _pairs(group: pd.DataFrame) -> pd.DataFrame:
        parts = []
        for _, g in group.groupby(["band_id", "band_val"], sort=False):
            if len(g) < 2:
                continue
            g = g.drop_duplicates("doc_id")
            ids = g["doc_id"].to_numpy()
            hs = g["simhash"].to_numpy().astype(np.int64) \
                .astype(np.uint64)
            order = np.argsort(ids, kind="stable")
            ids, hs = ids[order], hs[order]
            # ROW-BLOCKED enumeration: a popular band value (e.g.
            # 100k boilerplate docs sharing one simhash) would
            # materialize O(n²) triu indices at once; blocking keeps
            # live pair cells bounded while the emitted rows stay
            # exactly the ≤ max_hamming pairs
            nb = len(ids)
            blk = max(1, 4_000_000 // max(1, nb))
            jj = np.arange(nb)[None, :]
            for i0 in range(0, nb, blk):
                i1 = min(i0 + blk, nb)
                d = _popcount64(hs[i0:i1, None] ^ hs[None, :])
                keep = (jj > np.arange(i0, i1)[:, None]) \
                    & (d <= max_hamming)
                r, c = np.nonzero(keep)
                if len(r):
                    parts.append(pd.DataFrame({
                        "a": ids[r + i0], "b": ids[c],
                        "hamming": d[r, c]}))
        if not parts:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64"),
                                 "hamming": pd.Series([],
                                                      dtype="int64")})
        out = pd.concat(parts, ignore_index=True)
        out["pbucket"] = (pd.util.hash_pandas_object(
            out["a"], index=False) % n_pair_buckets).astype("int64")
        return out

    def _bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch.copy()
        b["gbucket"] = ((b["band_val"] % 251) * (b["band_id"] + 1)
                        % 256).astype("int64")
        return b

    def _dedup(group: pd.DataFrame) -> pd.DataFrame:
        return (group.drop_duplicates(["a", "b"])
                [["a", "b", "hamming"]])

    return (docs.map_batches(_bands, batch_format="pandas")
            .map_batches(_bucketize, batch_format="pandas")
            .groupby("gbucket").map_groups(_pairs,
                                           batch_format="pandas")
            .groupby("pbucket").map_groups(_dedup,
                                           batch_format="pandas"))


# ------------------------------------------- embedding-cosine near-dup

def embedding_neardup_pairs(embeddings: rd.Dataset, threshold: float = 0.9,
                            n_bits: int = 6, n_tables: int = 4,
                            seed: int = 31, id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            dim: int | None = None) -> rd.Dataset:
    """Embedding-cosine near-duplicate pairs (a < b, cosine ≥ threshold).

    Scale shape: random-hyperplane LSH buckets each vector into
    ``n_tables`` (table, bucket) keys — only vectors sharing a bucket
    are compared, so the all-pairs matmul never happens. The shuffle
    carries ×10,000-quantized vectors as ``fixed_size_list<int32>``
    Arrow columns — compact, schema-stable, no object dtype.

    INTEGER-EXACT and SQL-replayable end to end (declared semantics):

    - hyperplanes quantize to int64 (``round(randn·1000)`` from
      ``RandomState(seed)`` — :func:`..ann.int_planes`); a bucket bit
      is the sign of an integer dot, exact on both engines;
    - the threshold test is exact rational arithmetic on the
      quantized vectors: with τ = round(threshold·1000),
      ``dot > 0 AND dot²·10⁶ ≥ τ²·na·nb`` — evaluated in Python
      big-ints here and HUGEINT in the oracle (it exceeds int64);
    - the reported cosine is ``dot / (sqrt(na)·sqrt(nb))`` from the
      same integers — correctly-rounded IEEE ops, so numpy and
      DuckDB agree bit for bit.
    """
    from .ann import Q_SCALE, int_planes

    pair_schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                             ("cosine", pa.float64())])
    if dim is None:
        first = embeddings.limit(1).to_pandas()
        if first.empty:  # empty corpus: typed empty pair set
            return rd.from_arrow(pair_schema.empty_table())
        dim = len(first[vec_col].iloc[0])
    planes = int_planes(n_tables, n_bits, dim, seed)
    pw = (1 << np.arange(n_bits)).astype(np.int64)
    tau = int(round(threshold * 1000))
    out_type = pa.list_(pa.int32(), dim)

    def _vecs_of(t: pa.Table, col: str, d: int,
                 dtype=np.float64) -> np.ndarray:
        lst = t.column(col).combine_chunks()
        if isinstance(lst, pa.ChunkedArray):
            lst = lst.combine_chunks()
        flat = lst.flatten().to_numpy(zero_copy_only=False)
        return np.asarray(flat, dtype=dtype).reshape(len(t), d)

    def _bucketize(t: pa.Table) -> pa.Table:
        m = np.floor(_vecs_of(t, vec_col, dim) * Q_SCALE + 0.5) \
            .astype(np.int64)
        ids = t.column(id_col).cast(pa.int64())
        vec_arr = pa.FixedSizeListArray.from_arrays(
            pa.array(m.astype(np.int32).reshape(-1)), dim)
        parts = []
        for tab in range(n_tables):
            bk = ((m @ planes[tab].T) > 0) @ pw
            parts.append(pa.table({
                id_col: ids,
                "bucket": pa.array(bk + (tab << n_bits), type=pa.int64()),
                "vec": vec_arr.cast(out_type)}))
        return pa.concat_tables(parts)

    def _pairs(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy()
        order = np.argsort(ids, kind="stable")
        keep = order[np.concatenate(([True], np.diff(ids[order]) != 0))] \
            if len(ids) else order
        if len(keep) < 2:
            return pair_schema.empty_table()
        m = _vecs_of(t, "vec", dim, dtype=np.int64)[keep]
        ids = ids[keep]
        n2 = (m * m).sum(axis=1)
        n2[n2 == 0] = 1
        nb_rows = len(ids)
        # ROW-BLOCKED pair scan: a dense bucket's full n×n matmul +
        # triu materializes O(n²) cells at once (a 78k-row bucket is
        # ~48 GB) — block rows so live cells stay ≤ _PAIR_CELLS, and
        # run a conservative FLOAT prefilter per block so the exact
        # big-int threshold check (Python ints) only touches real
        # candidates instead of every pair
        _PAIR_CELLS = 4_000_000
        blk = max(1, _PAIR_CELLS // max(1, nb_rows))
        n2f = n2.astype(np.float64)
        ci, cj, cd = [], [], []
        jj = np.arange(nb_rows)[None, :]
        for i0 in range(0, nb_rows, blk):
            i1 = min(i0 + blk, nb_rows)
            dots_b = m[i0:i1] @ m.T                      # (blk, n)
            ii = np.arange(i0, i1)[:, None]
            lhs = dots_b.astype(np.float64)
            lhs = lhs * lhs * 1.0e6
            rhs = (float(tau) * float(tau)
                   * n2f[i0:i1][:, None] * n2f[None, :])
            candm = (jj > ii) & (dots_b > 0)                 & (lhs >= rhs * (1.0 - 1e-9))
            r, c = np.nonzero(candm)
            if len(r):
                ci.append(r + i0)
                cj.append(c)
                cd.append(dots_b[r, c])
        if not ci:
            return pair_schema.empty_table()
        iu = np.concatenate(ci)
        ju = np.concatenate(cj)
        d = np.concatenate(cd)
        # exact rational threshold on the CANDIDATES only: dot²·10⁶ ≥
        # τ²·na·nb (big-ints — the products overflow int64 for
        # large-norm vectors; the 1e-9-margin float prefilter above
        # can only over-admit, never drop a qualifying pair)
        do = d.astype(object)
        na = n2[iu].astype(object)
        nb = n2[ju].astype(object)
        mask = np.asarray(
            do * do * 1_000_000 >= tau * tau * na * nb, dtype=bool)
        # CANONICAL-TABLE dedup, map-side: a pair sharing a bucket in
        # k tables would surface k times (identical cosine — same
        # integers every time). Each group knows its own table index
        # (bucket >> n_bits) and holds the quantized vectors, so it
        # can recompute both vectors' signatures under every EARLIER
        # table's hyperplanes and emit the pair only if this is the
        # FIRST table where they collide — exact global dedup with
        # ZERO extra exchange (replacing the pbucket pair shuffle the
        # round-2 version needed). The signature recompute is
        # tab × (group_n × n_bits) integer matmuls, paid only by
        # groups that found candidate pairs.
        idx = np.flatnonzero(mask)
        tab = int(t.column("bucket")[0].as_py()) >> n_bits
        if tab > 0 and len(idx):
            sig = np.stack([((m @ planes[t2].T) > 0) @ pw
                            for t2 in range(tab)])
            earlier = (sig[:, iu[idx]] == sig[:, ju[idx]]).any(axis=0)
            idx = idx[~earlier]
        rn = np.sqrt(n2.astype(np.float64))
        cos = d.astype(np.float64) / (rn[iu] * rn[ju])
        return pa.table({"a": pa.array(ids[iu[idx]], type=pa.int64()),
                         "b": pa.array(ids[ju[idx]], type=pa.int64()),
                         "cosine": pa.array(cos[idx],
                                            type=pa.float64())})

    deduped = (embeddings.map_batches(_bucketize, batch_format="pyarrow")
               .groupby("bucket").map_groups(_pairs,
                                             batch_format="pyarrow"))
    # a groupby over zero rows yields zero blocks (schema lost); a
    # typed empty seed block keeps the (a, b, cosine) schema on the
    # no-pairs path without materializing anything
    return rd.from_arrow(pair_schema.empty_table()).union(deduped)


# ------------------------------------------------ connected components

def connected_components(pairs_df: pd.DataFrame) -> pd.DataFrame:
    """Min-label propagation over (a, b) edges → (doc_id, component),
    iterated to a FIXPOINT with pointer-jumping (label ← label[label])
    between propagation rounds, so convergence is O(log diameter).

    Driver fast-path kernel (engaged under
    :data:`SMALL_EDGE_FASTPATH`); :func:`connected_components_ds` runs
    the same fixpoint as distributed rounds for edge sets that outgrow
    one node. Index-encoded numpy throughout: nodes dense-encode via
    ``np.unique`` (sorted, so the min INDEX in a component is the min
    node id), each round is two unbuffered ``np.minimum.at`` passes
    over the edge arrays plus pointer jumping — ~100x the pandas
    groupby formulation this replaces (the KG-graph query spent ~40 s
    here at sf0.1)."""
    a = pairs_df["a"].to_numpy()
    b = pairs_df["b"].to_numpy()
    # np.unique sorts, so a component's min dense INDEX is its min
    # node id — holds for ints and (lexicographically) strings alike
    nodes, idx = np.unique(np.concatenate([a, b]), return_inverse=True)
    ai, bi = idx[:len(a)], idx[len(a):]
    # symmetric edges sorted by source ONCE; each round is then a
    # C-speed segmented min (reduceat), not an unbuffered scatter
    src = np.concatenate([ai, bi])
    dst = np.concatenate([bi, ai])
    order = np.argsort(src, kind="stable")
    src, dst = src[order], dst[order]
    uniq_src, starts = np.unique(src, return_index=True)
    label = np.arange(len(nodes), dtype=np.int64)
    while True:
        old = label
        seg = np.minimum.reduceat(label[dst], starts)
        label = label.copy()
        label[uniq_src] = np.minimum(label[uniq_src], seg)
        while True:  # pointer jumping: chase labels to their roots
            jumped = label[label]
            if np.array_equal(jumped, label):
                break
            label = jumped
        if np.array_equal(label, old):
            break
    return pd.DataFrame({"doc_id": nodes, "component": nodes[label]})


def _edge_bucket(u: pd.Series, n: int) -> pd.Series:
    return (pd.util.hash_pandas_object(u, index=False) % n).astype("int64")


#: Edge-count threshold below which :func:`connected_components_ds`
#: solves on the driver with the pandas kernel instead of running
#: distributed star-contraction rounds. Verified near-dup EDGES are a
#: tiny fraction of corpus bytes (ints only, no text) — at 100 TB a
#: pair set under this bound is ~100 MB, trivially driver-sized, while
#: each distributed round costs two full shuffles of the same edges.
#: Larger edge sets take the distributed path automatically.
SMALL_EDGE_FASTPATH = 4_000_000


def connected_components_ds(pairs: rd.Dataset, n_buckets: int = 32,
                            max_rounds: int = 64,
                            small_edge_fastpath: int | None = None
                            ) -> rd.Dataset:
    """Distributed connected components over (a, b) candidate pairs →
    (doc_id, component), int64 ids.

    Edge sets smaller than ``small_edge_fastpath`` (default
    :data:`SMALL_EDGE_FASTPATH`) are solved on the driver with the
    pandas kernel — same output, none of the per-round shuffle
    overhead; the distributed star-contraction rounds below engage
    only when the edge set is genuinely cluster-sized.

    Alternating **large-star / small-star** contraction (Kiveris et
    al., "Connected Components in MapReduce and Beyond") — the
    edge set itself is the only state, and each half-round is ONE
    hash-bucket groupby over the edges:

    - large-star (per node u over its full neighborhood N(u)):
      m = min(N(u) ∪ {u}); re-point every larger neighbor at m —
      emit (v, m) for v ∈ N(u), v > u;
    - small-star (per node u over its SMALLER neighbors N⁻(u), edges
      oriented hi→lo): m = min(N⁻(u) ∪ {u}); emit (v, m) for
      v ∈ N⁻(u) ∪ {u}, v ≠ m.

    Converges to per-component stars (every node → component min) in
    O(log²) rounds worst case, a handful in practice. Convergence is
    detected by an exact edge-multiset signature (count + two
    independent 64-bit hash sums — a tiny aggregate, not a driver
    materialization). No joins, no label table, nothing driver-side:
    the design avoids the per-round block/ref blowup a join-based
    label-propagation loop exhibits on Ray's sort shuffle.

    Raises after ``max_rounds`` (hitting the guard means a bug, never
    a silent cap).
    """

    def _tag(t: pa.Table) -> pa.Table:
        a = t.column("a").cast(pa.int64()).to_numpy(zero_copy_only=False)
        b = t.column("b").cast(pa.int64()).to_numpy(zero_copy_only=False)
        hi, lo = np.maximum(a, b), np.minimum(a, b)
        return pa.table({"a": pa.array(hi), "b": pa.array(lo),
                         "s": pa.array(hi == lo)})

    # one scan tags canonical edges; self-loops split off so their
    # nodes can rejoin as SINGLETON components at the end (the pandas
    # reference kernel keeps them; contraction must drop them or the
    # rounds never converge)
    tagged = pairs.map_batches(_tag, batch_format="pyarrow") \
        .materialize()
    edges = (tagged.filter(expr="s == False")
             .map_batches(lambda t: t.select(["a", "b"]),
                          batch_format="pyarrow")).materialize()
    selfs_raw = tagged.filter(expr="s == True")
    n_selfs = selfs_raw.count()

    def _with_self_singletons(memb: rd.Dataset) -> rd.Dataset:
        """Union in (n, n) rows for nodes whose ONLY edges are
        self-loops — an anti-join of the distinct self nodes against
        the membership keys (int rows only)."""
        if not n_selfs:
            return memb
        from .joins import hash_join

        def _nodes(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame(
                {"doc_id": df["a"].astype("int64")})
            out["__b"] = _edge_bucket(out["doc_id"], n_buckets)
            return out

        sd = (selfs_raw.map_batches(_nodes, batch_format="pandas")
              .groupby("__b").map_groups(
                  lambda g: g[["doc_id"]].drop_duplicates(),
                  batch_format="pandas"))
        missing = hash_join(
            sd, memb.map_batches(lambda df: df[["doc_id"]],
                                 batch_format="pandas"),
            on="doc_id", how="anti", n_buckets=n_buckets,
            left_schema=pa.schema([("doc_id", pa.int64())]),
            right_schema=pa.schema([("doc_id", pa.int64())]))
        return memb.union(missing.map_batches(
            lambda df: pd.DataFrame({
                "doc_id": df["doc_id"].astype("int64"),
                "component": df["doc_id"].astype("int64")}),
            batch_format="pandas"))

    cap = (SMALL_EDGE_FASTPATH if small_edge_fastpath is None
           else small_edge_fastpath)
    if edges.count() <= cap:
        df = edges.to_pandas()
        if not len(df):
            return _with_self_singletons(rd.from_arrow(pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "component": pa.array([], pa.int64())})))
        out = connected_components(df)
        out["doc_id"] = out["doc_id"].astype("int64")
        out["component"] = out["component"].astype("int64")
        return _with_self_singletons(rd.from_pandas(
            out.sort_values("doc_id", ignore_index=True)))

    def _large_map(df: pd.DataFrame) -> pd.DataFrame:
        # symmetrize so each group key sees its full neighborhood
        out = pd.DataFrame({
            "u": pd.concat([df["a"], df["b"]], ignore_index=True),
            "v": pd.concat([df["b"], df["a"]], ignore_index=True)})
        out["__b"] = _edge_bucket(out["u"], n_buckets)
        return out

    def _large_reduce(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("u")["v"].min()
        m = np.minimum(m, m.index)          # min(N(u) ∪ {u})
        big = g[g["v"] > g["u"]]
        out = pd.DataFrame({"a": big["v"].to_numpy(),
                            "b": big["u"].map(m).to_numpy()})
        return out.drop_duplicates()

    def _small_map(df: pd.DataFrame) -> pd.DataFrame:
        hi = np.maximum(df["a"], df["b"])
        lo = np.minimum(df["a"], df["b"])
        out = pd.DataFrame({"u": hi, "v": lo})
        out["__b"] = _edge_bucket(out["u"], n_buckets)
        return out

    def _small_reduce(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("u")["v"].min()       # ≤ u already (v < u)
        parts = [
            pd.DataFrame({"a": g["v"].to_numpy(),
                          "b": g["u"].map(m).to_numpy()}),
            pd.DataFrame({"a": m.index.to_numpy(), "b": m.to_numpy()}),
        ]
        out = pd.concat(parts, ignore_index=True)
        out = out[out["a"] != out["b"]]
        return out.drop_duplicates()

    def _signature(ds: rd.Dataset) -> tuple:
        def _partial(df: pd.DataFrame) -> pd.DataFrame:
            k1 = np.uint64(0x9E3779B97F4A7C15)
            k2 = np.uint64(0xC2B2AE3D27D4EB4F)
            a = df["a"].to_numpy().astype(np.uint64)
            b = df["b"].to_numpy().astype(np.uint64)
            m1 = (a * k1 + b) * k2
            m2 = (b * k2 + a) * k1
            m1 ^= m1 >> np.uint64(29)
            m2 ^= m2 >> np.uint64(31)
            return pd.DataFrame({"n": [len(df)],
                                 "h1": [int(m1.sum(dtype=np.uint64))],
                                 "h2": [int(m2.sum(dtype=np.uint64))]})

        p = ds.map_batches(_partial, batch_format="pandas").to_pandas()
        if not len(p):
            return (0, 0, 0)
        return (int(p["n"].sum()),
                int(p["h1"].to_numpy().astype("uint64")
                    .sum(dtype="uint64")),
                int(p["h2"].to_numpy().astype("uint64")
                    .sum(dtype="uint64")))

    sig = None  # computed lazily: count (free on materialized data)
    # gates the hash-signature execution
    prev_count = edges.count()
    for _ in range(max_rounds):
        edges = (edges
                 .map_batches(_large_map, batch_format="pandas")
                 .groupby("__b").map_groups(_large_reduce,
                                            batch_format="pandas")
                 .map_batches(_small_map, batch_format="pandas")
                 .groupby("__b").map_groups(_small_reduce,
                                            batch_format="pandas")
                 ).materialize()
        count = edges.count()
        if count != prev_count:     # definitely changed — keep going
            prev_count = count
            sig = None
            continue
        new_sig = _signature(edges)
        if new_sig == sig:
            break
        sig = new_sig
    else:
        raise RuntimeError(
            f"connected_components_ds did not converge in {max_rounds} "
            "rounds — investigate, do not raise the cap blindly")

    # converged star edges: (node, component-min); roots appear only on
    # the b side — add their self-assignments
    def _emit(df: pd.DataFrame) -> pd.DataFrame:
        nodes = pd.DataFrame({"doc_id": df["a"].to_numpy(),
                              "component": df["b"].to_numpy()})
        roots = pd.DataFrame({"doc_id": df["b"].unique()})
        roots["component"] = roots["doc_id"]
        out = pd.concat([nodes, roots], ignore_index=True)
        out["__b"] = _edge_bucket(out["doc_id"], n_buckets)
        return out

    def _dedup(g: pd.DataFrame) -> pd.DataFrame:
        # a root may also appear under several star groups — one row
        # per node, preferring the smallest component label
        return (g.sort_values(["doc_id", "component"])
                .drop_duplicates("doc_id")[["doc_id", "component"]])

    return _with_self_singletons(
        edges.map_batches(_emit, batch_format="pandas")
        .groupby("__b").map_groups(_dedup, batch_format="pandas"))


# ------------------------------------------- exact duplicated spans


def dup_span_stats(docs: rd.Dataset, n_words: int = 10,
                   n_gram_buckets: int = 256, n_doc_buckets: int = 64,
                   id_col: str = "doc_id",
                   text_col: str = "text") -> rd.Dataset:
    """EXACT duplicated-span detection: per doc, the count of word
    ``n_words``-gram windows (stride 1) whose gram occurs at ≥ 2
    locations corpus-wide (any document, including repeats within the
    same one) — the fixed-width, hash-grouped equivalent of
    suffix-array substring dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"). Output one row per
    doc: ``(doc_id, n_spans, n_dup_spans)``.

    Scale shape: one map pass tokenizes each doc once and emits one
    int64 gram row PER POSITION (the unavoidable exchange of exact
    substring dedup at fixed width — texts never shuffle) plus a
    single per-doc total row; a gram-hash-bucket groupby counts
    occurrences and turns dup grams into per-doc partial counts; a
    second, doc-bucket groupby sums partials and joins the totals.
    Gram hashing is the shared md5-15-hex scheme (:func:`_gram_hash`)
    so a DuckDB oracle recomputes the whole operator bit-exactly.
    """

    def _span_rows(batch: pd.DataFrame) -> pd.DataFrame:
        ids: list[int] = []
        keys: list[int] = []
        vs: list[int] = []
        kinds: list[int] = []
        for d, t in zip(batch[id_col], batch[text_col]):
            d = int(d)
            ws = _WORD_RE.findall(str(t).lower())
            n = max(len(ws) - n_words + 1, 0)
            ids.append(d), keys.append(d), vs.append(n), kinds.append(0)
            for i in range(n):
                ids.append(d)
                keys.append(_gram_hash(" ".join(ws[i:i + n_words])))
                vs.append(1)
                kinds.append(1)
        out = pd.DataFrame({id_col: pd.array(ids, dtype="int64"),
                            "key": pd.array(keys, dtype="int64"),
                            "v": pd.array(vs, dtype="int64"),
                            "kind": pd.array(kinds, dtype="int64")})
        out["bucket"] = (out["key"] % n_gram_buckets).astype("int64")
        return out

    def _gram_reduce(group: pd.DataFrame) -> pd.DataFrame:
        # kind-0 per-doc totals ride through untouched; kind-1 gram
        # rows collapse to per-doc dup-location partial counts
        parts = [group.loc[group["kind"] == 0, [id_col, "v", "kind"]]]
        g = group[group["kind"] == 1]
        if len(g):
            occ = g.groupby("key")["key"].transform("size")
            dup = g[occ >= 2]
            if len(dup):
                cnt = dup.groupby(id_col, as_index=False).size()
                parts.append(pd.DataFrame({
                    id_col: cnt[id_col].astype("int64"),
                    "v": cnt["size"].astype("int64"),
                    "kind": np.int64(1)}))
        out = pd.concat(parts, ignore_index=True)
        out["dbucket"] = (out[id_col] % n_doc_buckets).astype("int64")
        return out

    def _doc_reduce(group: pd.DataFrame) -> pd.DataFrame:
        tot = group[group["kind"] == 0].groupby(id_col)["v"].sum()
        dup = group[group["kind"] == 1].groupby(id_col)["v"].sum()
        return pd.DataFrame({
            id_col: tot.index.to_numpy(dtype="int64"),
            "n_spans": tot.to_numpy(dtype="int64"),
            "n_dup_spans": dup.reindex(tot.index).fillna(0)
            .to_numpy(dtype="int64")})

    rows = docs.map_batches(_span_rows, batch_format="pandas")
    partials = rows.groupby("bucket").map_groups(
        _gram_reduce, batch_format="pandas")
    return partials.groupby("dbucket").map_groups(
        _doc_reduce, batch_format="pandas")
