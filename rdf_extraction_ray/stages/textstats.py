"""Text-analysis operators for large-scale training-data pipelines:
language-ID (stopword/n-gram heuristic), quality scoring, token
counting, and document fingerprinting (rolling hash).

All are stateless vectorized ``map_batches`` bodies over a ``text``
column (pandas string kernels / numpy); none shuffles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# tiny per-language stopword lists for the heuristic language ID
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "was"},
    "fr": {"le", "la", "les", "et", "de", "un", "une", "est", "que", "pour"},
    "es": {"el", "la", "los", "las", "y", "de", "un", "una", "es", "que"},
    "de": {"der", "die", "das", "und", "ist", "ein", "eine", "nicht", "mit",
           "von"},
    "zh": set(),  # no-space script: detected by CJK codepoint ratio
}

_TOKEN_RE = r"[A-Za-z0-9_]+"
# crude BPE-ish sub-token splitter: word pieces of up to 4 chars
_BPE_RE = r"[A-Za-z]{1,4}|[0-9]{1,3}|[^\sA-Za-z0-9]"


def token_count(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Whitespace/word tokens + a BPE-ish sub-token count per doc.
    Null text counts as empty (str.count yields NaN on nulls, which
    would poison the int cast and kill the task)."""
    out = batch.copy()
    s = batch[text_col].fillna("")
    out["n_tokens"] = s.str.count(_TOKEN_RE).astype("int64")
    out["n_subtokens"] = s.str.count(_BPE_RE).astype("int64")
    return out


def quality_score(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Integer quality features + a boolean gate (integer comparisons
    only, so results are exactly reproducible in SQL)."""
    out = batch.copy()
    s = batch[text_col].fillna("")
    out["n_chars_q"] = s.str.len().astype("int64")
    out["n_words_q"] = s.str.count(_TOKEN_RE).astype("int64")
    out["n_punct_q"] = s.str.count(r"[.!?,;:]").astype("int64")
    out["n_upper_q"] = s.str.count(r"[A-Z]").astype("int64")
    # gate: 20..10000 chars and at least 5 words
    out["quality_ok"] = ((out["n_chars_q"] >= 20)
                         & (out["n_chars_q"] <= 10000)
                         & (out["n_words_q"] >= 5))
    return out


class LangId:
    """Actor-pool language identifier: stopword-hit ratios + CJK
    codepoint ratio. Tables built once per actor in ``__init__``."""

    def __init__(self):
        import re
        self.word = re.compile(r"[a-zA-Z']+")
        self.langs = [l for l in _STOPWORDS if _STOPWORDS[l]]
        self.tables = {l: frozenset(w) for l, w in _STOPWORDS.items() if w}

    def _one(self, text: str) -> str:
        if not isinstance(text, str) or not text:
            return "und"  # null/NaN text must not kill the task
        cjk = sum(1 for ch in text[:400] if "一" <= ch <= "鿿")
        if cjk / max(1, min(len(text), 400)) > 0.2:
            return "zh"
        words = [w.lower() for w in self.word.findall(text[:2000])]
        if not words:
            return "und"
        best, best_hits = "und", 0
        for lang in self.langs:
            hits = sum(1 for w in words if w in self.tables[lang])
            if hits > best_hits:
                best, best_hits = lang, hits
        return best

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out["lang_pred"] = [self._one(t) for t in batch["text"]]
        return out


_LANGID_CACHE: list = []


def langid_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Task-pool body: per-process cached :class:`LangId` tables."""
    if not _LANGID_CACHE:
        _LANGID_CACHE.append(LangId())
    return _LANGID_CACHE[0](batch)


def fingerprint(batch: pd.DataFrame, text_col: str = "text",
                window: int = 8) -> pd.DataFrame:
    """Winnowing-style document fingerprint: min rolling hash over
    ``window``-grams of the normalized text (one int64 per doc).

    The polynomial runs over CODEPOINTS REDUCED MOD 256 (base 131,
    window 8) so character positions — not UTF-8 byte positions —
    define the windows, matching the SQL oracle's per-character
    ``ord(substr(...)) % 256`` terms exactly for ALL unicode input
    (the earlier byte-windowed variant silently diverged from the
    oracle on any non-ASCII text). Reduced terms keep the value under
    2^58: exact non-negative int64 on both engines. Null text is
    treated as the empty string (the oracle COALESCEs identically);
    short texts are '_'-padded to one full window."""
    out = batch.copy()
    fps = np.empty(len(batch), dtype="int64")
    for i, t in enumerate(batch[text_col]):
        t = "" if pd.isna(t) else str(t)
        t = " ".join(t.lower().split())
        if len(t) < window:
            t = t.ljust(window, "_")
        data = (np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
                .astype(np.uint64) % np.uint64(256))
        n = len(data) - window + 1
        # vectorized polynomial rolling hash over codepoint windows
        acc = np.zeros(n, dtype=np.uint64)
        for k in range(window):
            acc = acc * np.uint64(131) + data[k:k + n]
        fps[i] = np.int64(acc.min())
    out["fingerprint"] = fps
    return out


def stratified_sample(batch: pd.DataFrame, rates: dict[str, float],
                      default_rate: float = 0.1,
                      strata_col: str = "lang",
                      id_col: str = "doc_id") -> pd.DataFrame:
    """Deterministic per-stratum sampling (map_batches body — embarrassingly
    parallel, no shuffle, no RNG state).

    A row survives iff ``md5(str(id)) % 1000 < rate*1000`` for its
    stratum's rate — the hash-based coin makes the sample reproducible
    across runs, block orders and cluster sizes, and lets a DuckDB
    oracle recompute the exact row set in SQL (the reference's
    ``random``-mode file selection, ``Utils/utilities.py:653-734``, is
    seeded-random; hash sampling is the distributed-safe equivalent).
    """
    import hashlib
    coin = np.array(
        [int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 1000
         for i in batch[id_col]], dtype="int64")
    # round, don't truncate: int(0.29*1000) is 289 (float undershoot)
    # and sub-0.001 rates would silently drop the whole stratum
    thresh = np.round(batch[strata_col].map(rates).fillna(default_rate)
                      .to_numpy() * 1000).astype("int64")
    return batch[coin < thresh]


def weighted_sample(batch: pd.DataFrame, weight_col: str,
                    id_col: str = "doc_id",
                    scale: int = 2000) -> pd.DataFrame:
    """Deterministic WEIGHTED Bernoulli sampling (map_batches body —
    embarrassingly parallel, no shuffle, no RNG state): a row survives
    with probability ``min(weight, scale) / scale`` — the
    mixture-reweighting primitive (upsample long/high-quality docs,
    downsample short ones) of a training-data pipeline.

    Integer-exact coin: keep iff ``w >= scale`` (certain keep) or
    ``md5_15(id) < w * C`` with ``C = 2^60 // scale`` (the explicit
    w >= scale short-circuit is needed because 2^60 is not divisible
    by ``scale``, so ``scale * C < 2^60`` and the threshold test alone
    would drop ~1e-15 of the certain-keep rows). ``w < scale`` keeps
    the product under 2^60 (no int64 overflow). SQL replays the row
    set exactly with ``w >= scale OR
    ('0x'||substr(md5(CAST(id AS VARCHAR)),1,15))::BIGINT < w * C``.
    """
    from .graph import _h15

    c = (1 << 60) // int(scale)
    h = _h15(batch[id_col])
    w = batch[weight_col].to_numpy(dtype="int64")
    certain = w >= np.int64(scale)
    wc = np.minimum(w, np.int64(scale))  # bound the product
    return batch[certain | (h < wc * np.int64(c))]


def pack_windows(batch: pd.DataFrame, n_buckets: int = 32,
                 id_col: str = "doc_id") -> pd.DataFrame:
    """Stage 1 of concat-and-split sequence packing: per-doc token
    counts + the pack bucket (hash of id % n_buckets).

    Packing semantics (stage 2, :func:`assign_windows`): within a
    bucket, documents are concatenated in ``id_col`` order and split
    into fixed-``capacity`` token windows — the standard pretraining
    pack, where a document may span a window boundary. Window id =
    ``floor(start_offset / capacity)`` of the document's first token;
    ``spans_boundary`` marks documents crossing into the next window.
    Both stages are deterministic (no RNG, no order dependence beyond
    the declared ``id_col`` sort), so a DuckDB oracle recomputes the
    exact assignment with a window cumsum.
    """
    out = token_count(batch, text_col="text")[[id_col, "n_tokens"]].copy()
    out["bucket"] = (out[id_col].astype("int64") % n_buckets)
    return out


def assign_windows(group: pd.DataFrame, capacity: int = 1024,
                   id_col: str = "doc_id") -> pd.DataFrame:
    """Stage 2 (map_groups per bucket): offsets → window assignment."""
    g = group.sort_values(id_col, kind="stable").reset_index(drop=True)
    start = g["n_tokens"].cumsum().shift(fill_value=0)
    end = start + g["n_tokens"]
    g["start_tok"] = start.astype("int64")
    g["window_id"] = (start // capacity).astype("int64")
    g["spans_boundary"] = ((end - 1) // capacity
                           > g["window_id"]).astype("int64")
    return g[[id_col, "bucket", "n_tokens", "start_tok", "window_id",
              "spans_boundary"]]


def tfidf_top_terms(docs, k: int = 3, n_buckets: int = 64,
                    id_col: str = "doc_id", text_col: str = "text"):
    """Per-document top-``k`` terms by tf-idf — term weighting for
    corpus curation, distributed end to end.

    Scale shape: docs explode to (doc, term, tf) rows grouped by term
    hash. A term lives in exactly ONE bucket and doc-term rows are
    unique, so the bucket group holds every row of each of its terms —
    document frequency is a ``transform('size')`` INSIDE the group (no
    separate df table, no join shuffle, no driver-side vocabulary);
    top-k then runs under a doc-hash groupby. Two exchanges total.
    The idf is FIXED-POINT integer (``(N * 1000) // df``) so the score
    is exactly reproducible in the DuckDB oracle — float ``ln``
    implementations differ across engines in the last ulp, integer
    arithmetic never does. Ties break by term text.
    """
    import re

    word = re.compile(r"[a-z0-9]+")
    # consumed twice (count + term scan): pin so an expensive
    # upstream runs once — the ann-family multi-pass convention
    docs = docs.materialize()
    n_docs = docs.count()

    def _doc_terms(batch: pd.DataFrame) -> pd.DataFrame:
        ids, terms, tfs = [], [], []
        for d, t in zip(batch[id_col], batch[text_col]):
            ws = word.findall(str(t).lower())
            if not ws:
                continue
            vc = pd.Series(ws).value_counts()
            ids.extend([d] * len(vc))
            terms.extend(vc.index)
            tfs.extend(vc.to_numpy())
        out = pd.DataFrame({id_col: pd.array(ids, dtype="int64"),
                            "term": terms,
                            "tf": pd.array(tfs, dtype="int64")})
        out["tbucket"] = (pd.util.hash_pandas_object(
            out["term"], index=False) % n_buckets).astype("int64")
        return out

    def _score_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.copy()
        df_n = g.groupby("term")["term"].transform("size") \
            .astype("int64")
        g["score"] = (g["tf"] * ((n_docs * 1000) // df_n)) \
            .astype("int64")
        g["dbucket"] = (g[id_col] % n_buckets).astype("int64")
        return g[[id_col, "term", "tf", "score", "dbucket"]]

    def _topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["score", "term"],
                              ascending=[False, True], kind="stable")
        g = g.groupby(id_col, sort=False).head(k)
        return g[[id_col, "term", "tf", "score"]]

    return (docs.map_batches(_doc_terms, batch_format="pandas",
                             batch_size=None)
            .groupby("tbucket").map_groups(_score_bucket,
                                           batch_format="pandas")
            .groupby("dbucket").map_groups(_topk, batch_format="pandas"))


def top_tokens(docs, k: int = 100, n_buckets: int = 64,
               id_col: str = "doc_id", text_col: str = "text"):
    """EXACT global heavy hitters: the ``k`` most frequent word
    tokens (``[a-z0-9]+`` over lowercased text) across the corpus,
    ordered by (count desc, token asc).

    Scale shape: per-batch local ``value_counts`` (a combiner — the
    exchange carries one row per DISTINCT (batch, token), not one per
    occurrence), hash-bucket groupby sums full per-token counts (a
    token lives in exactly ONE bucket, so bucket-local top-k is
    globally sound), and only ``n_buckets × k`` candidate rows reach
    the driver for the final merge. No sketch needed: exactness comes
    from the one-bucket-per-token invariant, not approximation.

    Returns a pandas DataFrame (token, n) of ≤ k rows.
    """
    import re as _re

    word = _re.compile(r"[a-z0-9]+")

    def _local(batch: pd.DataFrame) -> pd.DataFrame:
        toks: list = []
        for t in batch[text_col]:
            toks.extend(word.findall(str(t).lower()))
        if not toks:
            return pd.DataFrame({"token": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype="int64"),
                                 "tbucket": pd.Series([], dtype="int64")})
        vc = pd.Series(toks).value_counts()
        out = pd.DataFrame({"token": vc.index.to_numpy(),
                            "n": vc.to_numpy().astype("int64")})
        out["tbucket"] = (pd.util.hash_pandas_object(
            out["token"], index=False) % n_buckets).astype("int64")
        return out

    def _bucket_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.groupby("token", as_index=False)["n"].sum()
        g = g.sort_values(["n", "token"], ascending=[False, True],
                          kind="stable").head(k)
        return g[["token", "n"]]

    cands = (docs.map_batches(_local, batch_format="pandas")
             .groupby("tbucket").map_groups(_bucket_topk,
                                            batch_format="pandas")
             .to_pandas())
    if cands.empty:  # empty corpus: typed empty result, not KeyError
        return pd.DataFrame({"token": pd.Series([], dtype=object),
                             "n": pd.Series([], dtype="int64")})
    return (cands.sort_values(["n", "token"], ascending=[False, True],
                              kind="stable").head(k)
            .reset_index(drop=True))


def exact_quantiles(ds, col: str, qs=(0.25, 0.5, 0.75, 0.9, 0.99),
                    n_buckets: int = 64):
    """EXACT discrete quantiles of an integer-valued column
    (``quantile_disc`` semantics: the element at sorted index
    ``max(0, ceil(q*n) - 1)``).

    Scale shape: per-batch ``value_counts`` is a combiner (the
    exchange carries one row per distinct (batch, value), never one
    per row), a hash-bucket groupby sums full per-value counts, and
    the driver merges the GLOBAL HISTOGRAM — one row per distinct
    value, not per input row. Exact for length-like columns whose
    distinct-value cardinality is bounded (chars / tokens / scores);
    for unbounded continuous columns use a sketch instead — this
    operator is deliberately the exact path.

    Returns a pandas DataFrame (q, value) with one row per requested
    quantile, ordered by q.
    """
    import math

    def _local(batch: pd.DataFrame) -> pd.DataFrame:
        vc = batch[col].value_counts()
        out = pd.DataFrame({"v": vc.index.to_numpy().astype("int64"),
                            "n": vc.to_numpy().astype("int64")})
        out["vbucket"] = (out["v"] % n_buckets).astype("int64")
        return out

    def _merge(group: pd.DataFrame) -> pd.DataFrame:
        return group.groupby("v", as_index=False)["n"].sum()

    hist = (ds.map_batches(_local, batch_format="pandas")
            .groupby("vbucket").map_groups(_merge, batch_format="pandas")
            .to_pandas())
    if not len(hist):
        # SQL parity: quantile_disc over an empty input unnests to
        # zero rows — return the empty frame, don't index into it
        return pd.DataFrame({"q": pd.Series([], dtype="float64"),
                             "value": pd.Series([], dtype="int64")})
    hist = hist.sort_values("v", ignore_index=True)
    total = int(hist["n"].sum())
    cum = hist["n"].cumsum().to_numpy()
    vals = hist["v"].to_numpy()
    out_q, out_v = [], []
    for q in qs:
        idx = max(0, math.ceil(q * total) - 1)
        pos = int(np.searchsorted(cum, idx, side="right"))
        out_q.append(float(q))
        out_v.append(int(vals[pos]))
    return pd.DataFrame({"q": pd.array(out_q, dtype="float64"),
                         "value": pd.array(out_v, dtype="int64")})


def quantile_bucket_stats(ds, col: str, n_bins: int = 3,
                          n_buckets: int = 64):
    """Global ORDER-STATISTIC bucket assignment (CCNet's head/middle/
    tail split, generalized): thresholds are the values at sorted
    1-indexed positions ``ceil(j*n/n_bins)``; doc bucket = number of
    thresholds strictly below its score. Returns per-bucket
    (bucket, n_docs, min_score, max_score).

    Scale shape: ONE pass — the same exact global histogram combiner
    as :func:`exact_quantiles` (one exchanged row per distinct (batch,
    value); the driver merges one row per distinct value, bounded by
    the integer score domain, never by corpus size). Both the
    thresholds AND the per-bucket stats come straight from the merged
    histogram, so no second scan and no full-corpus shuffle. For
    per-doc tagging, broadcast the thresholds and apply
    :func:`assign_quantile_bucket` — a stateless map_batches body.
    """

    def _local(batch: pd.DataFrame) -> pd.DataFrame:
        vc = batch[col].value_counts()
        out = pd.DataFrame({"v": vc.index.to_numpy().astype("int64"),
                            "n": vc.to_numpy().astype("int64")})
        out["vbucket"] = (out["v"] % n_buckets).astype("int64")
        return out

    def _merge(group: pd.DataFrame) -> pd.DataFrame:
        return group.groupby("v", as_index=False)["n"].sum()

    hist = (ds.map_batches(_local, batch_format="pandas")
            .groupby("vbucket").map_groups(_merge, batch_format="pandas")
            .to_pandas())
    empty = pd.DataFrame({"bucket": pd.Series([], dtype="int64"),
                          "n_docs": pd.Series([], dtype="int64"),
                          "min_score": pd.Series([], dtype="int64"),
                          "max_score": pd.Series([], dtype="int64")})
    if not len(hist):
        return empty
    hist = hist.sort_values("v", ignore_index=True)
    total = int(hist["n"].sum())
    cum = hist["n"].cumsum().to_numpy()
    vals = hist["v"].to_numpy()
    thresholds = quantile_thresholds_from_histogram(vals, cum, total,
                                                    n_bins)
    # bucket of each distinct value = #thresholds strictly below it
    vbucket = np.searchsorted(thresholds, vals, side="left")
    # ties: a value EQUAL to a threshold belongs to that threshold's
    # bin (score <= t_j → bucket j-1), which searchsorted-left gives
    g = (pd.DataFrame({"bucket": vbucket, "v": vals, "n": hist["n"]})
         .groupby("bucket", as_index=False)
         .agg(n_docs=("n", "sum"), min_score=("v", "min"),
              max_score=("v", "max")))
    return g.astype({"bucket": "int64", "n_docs": "int64",
                     "min_score": "int64", "max_score": "int64"})


def quantile_thresholds_from_histogram(vals: np.ndarray, cum: np.ndarray,
                                       total: int,
                                       n_bins: int) -> np.ndarray:
    """Values at sorted 1-indexed positions ``ceil(j*total/n_bins)``
    for j in 1..n_bins-1, from a merged (value, cumulative-count)
    histogram."""
    import math
    ks = [max(1, math.ceil(j * total / n_bins))
          for j in range(1, n_bins)]
    idx = np.searchsorted(cum, np.asarray(ks), side="left")
    return vals[idx]


def assign_quantile_bucket(batch: pd.DataFrame, col: str,
                           thresholds: np.ndarray) -> pd.DataFrame:
    """Stateless tagging body: bucket = #broadcast thresholds strictly
    below the row's score (ties fall in the lower bin — identical to
    :func:`quantile_bucket_stats`)."""
    out = batch.copy()
    out["bucket"] = np.searchsorted(
        np.asarray(thresholds), batch[col].to_numpy(),
        side="left").astype("int64")
    return out


def unigram_logprob(docs, vocab_k: int = 2000, n_buckets: int = 64,
                    id_col: str = "doc_id", text_col: str = "text"):
    """CCNet-style unigram-LM quality score: mean negative log
    probability of a document's tokens under a corpus-level unigram
    model (lower = more "typical" text; high values flag gibberish,
    boilerplate and OOV-dense junk — the classic perplexity filter
    with a unigram LM standing in for the 5-gram KenLM).

    Scale shape — two streaming scans, no full-vocab shuffle:
      1. model fit: EXACT heavy-hitter vocabulary (top ``vocab_k``
         tokens via :func:`top_tokens` — only buckets×k candidate
         rows reach the driver) plus the exact corpus token total
         (per-batch count combiner → scalar sum). Capping the model
         at ``vocab_k`` is what keeps the broadcast O(k), not
         O(corpus vocabulary).
      2. scoring: the ~``vocab_k``-row model is broadcast once via
         ``ray.put`` and each batch is scored vectorized (one
         ``Series.map`` over the flattened token run + a cumsum
         segment-mean); OOV tokens get Laplace count 0, i.e.
         p(t) = (count(t)+1) / (N + vocab_k + 1).

    Tokenization is the ``[a-z0-9]+``-over-lowercase convention the
    DuckDB oracle replays with ``regexp_extract_all``. Returns a
    Dataset of (doc_id, n_toks, logprob); empty docs score 0.0.
    """
    import re as _re

    import ray

    word = _re.compile(r"[a-z0-9]+")
    # three passes consume docs (vocab fit, token total, scoring):
    # pin so an expensive upstream runs once
    docs = docs.materialize()
    vocab = top_tokens(docs, k=vocab_k, n_buckets=n_buckets,
                       id_col=id_col, text_col=text_col)

    def _ntok(batch: pd.DataFrame) -> pd.DataFrame:
        n = batch[text_col].str.lower().str.count(r"[a-z0-9]+")
        return pd.DataFrame({"n": pd.array([int(n.sum())],
                                           dtype="int64")})

    n_total = docs.map_batches(_ntok, batch_format="pandas").sum("n")
    denom = float(n_total or 0) + float(vocab_k) + 1.0
    model_ref = ray.put(dict(zip(vocab["token"].tolist(),
                                 vocab["n"].astype("int64").tolist())))

    def _score(batch: pd.DataFrame) -> pd.DataFrame:
        from .dedup_docs import _cached_get
        model = _cached_get(model_ref)  # unpickle once per worker
        # null text scores as EMPTY (n_toks 0, logprob 0.0) — str()
        # would invent a literal 'nan' token the fitted N never saw
        toks = [word.findall(t.lower()) if isinstance(t, str) else []
                for t in batch[text_col]]
        lens = np.fromiter((len(t) for t in toks), dtype=np.int64,
                           count=len(toks))
        flat = pd.Series([w for ts in toks for w in ts], dtype=object)
        cnts = flat.map(model).fillna(0).to_numpy(dtype="float64")
        nl = -np.log((cnts + 1.0) / denom)
        c = np.concatenate([[0.0], np.cumsum(nl)])
        ends = np.cumsum(lens)
        sums = c[ends] - c[ends - lens]
        mean = np.where(lens > 0, sums / np.maximum(lens, 1), 0.0)
        return pd.DataFrame({id_col: batch[id_col].to_numpy(),
                             "n_toks": lens,
                             "logprob": mean})

    return docs.map_batches(_score, batch_format="pandas")


def distinct_tokens(docs, n_buckets: int = 64,
                    text_col: str = "text") -> pd.DataFrame:
    """EXACT corpus vocabulary size (count of distinct word tokens).

    Scale shape: per-batch set-dedup is the combiner (the exchange
    carries one row per DISTINCT (batch, token), never one per
    occurrence), a hash-bucket groupby counts distinct tokens
    bucket-locally (a token lives in exactly one bucket, so the
    bucket counts are disjoint), and only ``n_buckets`` scalar rows
    are summed — exactness from the one-bucket-per-token invariant,
    no sketch, no full-vocab driver merge.
    """
    import re as _re

    word = _re.compile(r"[a-z0-9]+")

    def _local(batch: pd.DataFrame) -> pd.DataFrame:
        s: set = set()
        for t in batch[text_col]:
            s.update(word.findall(str(t).lower()))
        out = pd.DataFrame({"token": pd.Series(list(s), dtype=object)})
        out["tbucket"] = (pd.util.hash_pandas_object(
            out["token"], index=False) % n_buckets).astype("int64")
        return out

    def _count(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"n": pd.array([group["token"].nunique()], dtype="int64")})

    total = (docs.map_batches(_local, batch_format="pandas")
             .groupby("tbucket").map_groups(_count,
                                            batch_format="pandas")
             .sum("n"))
    return pd.DataFrame({"n_distinct_tokens":
                         pd.array([int(total or 0)], dtype="int64")})


def group_quantiles(ds, key: str, col: str,
                    qs=(0.25, 0.5, 0.75, 0.9, 0.99),
                    n_buckets: int = 64):
    """EXACT discrete quantiles of an integer column PER GROUP
    (``quantile_disc`` semantics, as :func:`exact_quantiles`).

    Scale shape: per-batch ``value_counts`` over (key, value) is the
    combiner; the exchange is bucketed on the GROUP KEY hash, so every
    (key, value) histogram row for one group lands in exactly one
    bucket and the quantile walk is group-local inside ``map_groups``.
    Nothing proportional to row count ever moves — only the per-group
    histograms — and the driver sees one row per (group, q).

    Skew note: a single mega-group costs its distinct-VALUE count,
    not its row count; fine for bounded-cardinality columns
    (lengths / scores), which is this operator's declared domain.
    """

    def _local(batch: pd.DataFrame) -> pd.DataFrame:
        vc = (batch[[key, col]]
              .groupby([key, col], as_index=False).size())
        out = pd.DataFrame({key: vc[key],
                            "v": vc[col].astype("int64"),
                            "n": vc["size"].astype("int64")})
        out["kbucket"] = (pd.util.hash_pandas_object(
            out[key], index=False) % n_buckets).astype("int64")
        return out

    def _bucket(group: pd.DataFrame) -> pd.DataFrame:
        import math

        outs = []
        for k, g in group.groupby(key):
            hist = (g.groupby("v", as_index=False)["n"].sum()
                    .sort_values("v", ignore_index=True))
            total = int(hist["n"].sum())
            cum = hist["n"].cumsum().to_numpy()
            vals = hist["v"].to_numpy()
            for q in qs:
                idx = max(0, math.ceil(q * total) - 1)
                pos = int(np.searchsorted(cum, idx, side="right"))
                outs.append((k, float(q), int(vals[pos])))
        if not outs:
            return pd.DataFrame({key: pd.Series([], dtype=object),
                                 "q": pd.Series([], dtype="float64"),
                                 "value": pd.Series([], dtype="int64")})
        out = pd.DataFrame(outs, columns=[key, "q", "value"])
        return out.astype({"q": "float64", "value": "int64"})

    out = (ds.map_batches(_local, batch_format="pandas")
           .groupby("kbucket").map_groups(_bucket,
                                          batch_format="pandas")
           .to_pandas())
    if out.empty:  # empty input: typed empty result
        return pd.DataFrame({key: pd.Series([], dtype=object),
                             "q": pd.Series([], dtype="float64"),
                             "value": pd.Series([], dtype="int64")})
    return out.sort_values([key, "q"], ignore_index=True)


_GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(batch: pd.DataFrame,
                 text_col: str = "text") -> pd.DataFrame:
    """Gopher/MassiveText-style quality rule bundle (Rae et al. 2021,
    "Scaling Language Models", Appendix A1.1), as one vectorized
    pandas-string pass per batch. Every rule is an INTEGER comparison
    (ratios as cross-multiplications), so a SQL oracle replays the
    gate bit-for-bit:

      r_nwords   50 <= word count <= 100000
      r_meanlen  3 <= mean word length <= 10  (3n <= chars <= 10n)
      r_symbols  hash/ellipsis symbols <= 0.1 per word
      r_bullets  <= 90% of lines start with a bullet (- * •)
      r_ellipsis <= 30% of lines end with ...
      r_alpha    >= 80% of words contain an alphabetic char
      r_stops    >= 2 distinct common-English stopwords present
    """
    s = batch[text_col].fillna("")
    low = s.str.lower()
    n_words = s.str.count(_TOKEN_RE).astype("int64")
    # sum of token lengths == count of token-class chars (tokens are
    # maximal [A-Za-z0-9_] runs), so this stays a C-level count
    word_chars = s.str.count(r"[A-Za-z0-9_]").astype("int64")
    n_sym = (s.str.count("#") + s.str.count(r"\.\.\.")).astype("int64")
    n_lines = (s.str.count("\n") + 1).astype("int64")
    n_bullet = s.str.count(r"(?m)^[-*•]").astype("int64")
    n_ell_end = s.str.count(r"(?m)\.\.\.$").astype("int64")
    n_alpha = s.str.count(
        r"[A-Za-z0-9_]*[A-Za-z][A-Za-z0-9_]*").astype("int64")
    n_stops = sum(low.str.contains(rf"\b{w}\b").astype("int64")
                  for w in _GOPHER_STOPS)

    out = batch.copy()
    out["g_n_words"] = n_words
    out["g_word_chars"] = word_chars
    out["r_nwords"] = (n_words >= 50) & (n_words <= 100_000)
    out["r_meanlen"] = ((3 * n_words <= word_chars)
                        & (word_chars <= 10 * n_words))
    out["r_symbols"] = 10 * n_sym <= n_words
    out["r_bullets"] = 10 * n_bullet <= 9 * n_lines
    out["r_ellipsis"] = 10 * n_ell_end <= 3 * n_lines
    out["r_alpha"] = 5 * n_alpha >= 4 * n_words
    out["r_stops"] = n_stops >= 2
    out["gopher_ok"] = (out["r_nwords"] & out["r_meanlen"]
                        & out["r_symbols"] & out["r_bullets"]
                        & out["r_ellipsis"] & out["r_alpha"]
                        & out["r_stops"])
    return out


def source_overlap(docs, n_words: int = 5, n_buckets: int = 64,
                   text_col: str = "text",
                   source_col: str = "source") -> pd.DataFrame:
    """Cross-SOURCE n-gram overlap matrix — contamination analytics
    between corpus slices: for every source pair (a < b) that shares
    at least one distinct word-``n_words``-gram, the intersection size
    and both set sizes (Jaccard = n_inter / (n_a + n_b - n_inter) is
    derivable; integer columns keep the oracle exact).

    Scale shape: the only wide exchange is distinct (gram-hash,
    source) rows — per-batch local dedup is the combiner, the
    gram-hash bucket groupby makes the dedup global (a gram lives in
    exactly one bucket). In-bucket work emits BOUNDED partials: one
    (source, n) row per source per bucket and one (a, b, n) row per
    co-occurring source pair per bucket, so the driver merge is
    O(buckets × S²) for S sources — never gram-shaped. Gram
    convention shared with the ngram-Jaccard family (space-joined
    ``[a-z0-9]+`` tokens, md5-15 hash) so the DuckDB oracle replays
    the matrix bit-for-bit.
    """
    from .dedup_docs import _gram_hash

    def _local(batch: pd.DataFrame) -> pd.DataFrame:
        import re as _re
        word = _re.compile(r"[a-z0-9]+")
        rows: set = set()
        for src, t in zip(batch[source_col], batch[text_col]):
            ws = word.findall(str(t).lower())
            s = str(src)
            for i in range(len(ws) - n_words + 1):
                rows.add((s, _gram_hash(" ".join(ws[i:i + n_words]))))
        if not rows:
            return pd.DataFrame({
                "source": pd.Series(dtype=object),
                "gram": pd.Series(dtype="int64"),
                "gb": pd.Series(dtype="int64")})
        out = pd.DataFrame(rows, columns=["source", "gram"])
        out["gram"] = out["gram"].astype("int64")
        out["gb"] = out["gram"] % np.int64(n_buckets)
        return out

    def _bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group[["source", "gram"]].drop_duplicates()
        cnt = g.groupby("source", as_index=False).size()
        j = g.merge(g, on="gram")
        j = j[j["source_x"] < j["source_y"]]
        pair = (j.groupby(["source_x", "source_y"], as_index=False)
                .size())
        return pd.concat([
            pd.DataFrame({"kind": np.int64(0), "a": cnt["source"],
                          "b": "", "n": cnt["size"].astype("int64")}),
            pd.DataFrame({"kind": np.int64(1), "a": pair["source_x"],
                          "b": pair["source_y"],
                          "n": pair["size"].astype("int64")})],
            ignore_index=True)

    parts = (docs.map_batches(_local, batch_format="pandas")
             .groupby("gb").map_groups(_bucket, batch_format="pandas")
             .to_pandas())
    if not len(parts):
        return pd.DataFrame({"source_a": pd.Series(dtype=object),
                             "source_b": pd.Series(dtype=object),
                             "n_inter": pd.Series(dtype="int64"),
                             "n_a": pd.Series(dtype="int64"),
                             "n_b": pd.Series(dtype="int64")})
    cnt = (parts[parts["kind"] == 0].groupby("a")["n"].sum())
    pairs = (parts[parts["kind"] == 1]
             .groupby(["a", "b"], as_index=False)["n"].sum())
    out = pd.DataFrame({
        "source_a": pairs["a"].astype(object),
        "source_b": pairs["b"].astype(object),
        "n_inter": pairs["n"].astype("int64"),
        "n_a": pairs["a"].map(cnt).astype("int64"),
        "n_b": pairs["b"].map(cnt).astype("int64")})
    return out.sort_values(["source_a", "source_b"],
                           ignore_index=True)


def chunk_windows(batch: pd.DataFrame, size: int = 128,
                  stride: int = 96, text_col: str = "text",
                  id_col: str = "doc_id") -> pd.DataFrame:
    """Sliding context-window chunker: split each document into
    token windows of ``size`` advancing by ``stride`` (overlap =
    size - stride) — the long-document complement of the
    concat-and-split pack (:func:`pack_windows`), used when documents
    must not cross sequence boundaries. Emits (doc_id, chunk_id,
    tok_start, tok_end, n_tokens) boundary rows; a doc with n <= size
    tokens yields one chunk, an empty doc none, and the last window
    clamps to the document end. Chunk count = ceil((n - size) /
    stride) + 1.

    Scale shape: EMBARRASSINGLY PARALLEL — one vectorized pass per
    batch (token count via the shared C-speed regex count, window
    expansion via repeat + cumsum-offset arange), zero exchanges,
    zero driver state. The SQL oracle replays it with a lateral
    generate_series.
    """
    n = (batch[text_col].str.count(_TOKEN_RE)
         .fillna(0).astype("int64").to_numpy())
    ids = batch[id_col].to_numpy()
    keep = n > 0
    n, ids = n[keep], ids[keep]
    if not len(n):  # an all-empty batch: typed empty, not a crash
        return pd.DataFrame({
            id_col: pd.Series([], dtype=ids.dtype),
            "chunk_id": pd.Series([], dtype="int64"),
            "tok_start": pd.Series([], dtype="int64"),
            "tok_end": pd.Series([], dtype="int64"),
            "n_tokens": pd.Series([], dtype="int64")})
    k = np.where(n <= size, 1,
                 -(-(n - size) // stride) + 1).astype("int64")
    total = int(k.sum())
    # chunk_id = global arange minus each doc's exclusive-cumsum base
    base = np.repeat(np.concatenate(([0], np.cumsum(k)[:-1])), k)
    chunk_id = np.arange(total, dtype="int64") - base
    tok_start = chunk_id * stride
    n_rep = np.repeat(n, k)
    tok_end = np.minimum(tok_start + size, n_rep)
    return pd.DataFrame({
        id_col: np.repeat(ids, k),
        "chunk_id": chunk_id,
        "tok_start": tok_start,
        "tok_end": tok_end,
        "n_tokens": n_rep})


CDC_WINDOW = 16
CDC_BASE = 1_000_003
CDC_MOD = 2**31 - 1
CDC_MASK = 64


def cdc_chunks(batch: pd.DataFrame, window: int = CDC_WINDOW,
               base: int = CDC_BASE, mod: int = CDC_MOD,
               mask: int = CDC_MASK, text_col: str = "text",
               id_col: str = "doc_id") -> pd.DataFrame:
    """CONTENT-DEFINED CHUNKING (basic CDC, the LBFS/Venti rolling-
    hash chunker): a chunk boundary falls after every position whose
    trailing ``window``-codepoint polynomial hash is 0 mod ``mask``,
    so an insertion early in a document shifts only the chunk it
    lands in — downstream chunk-level dedup stays aligned, which is
    exactly what byte-offset chunking (:func:`chunk_windows`) cannot
    give a 100-TB near-dup pass. No min/max chunk clamp: the
    boundary rule is STATELESS PER POSITION (clamps would make each
    boundary depend on the previous one), which keeps the operator
    embarrassingly parallel AND exactly SQL-replayable.

    Hash: H(p) = Σ_{i=0..w-1} codepoint(text[p-i]) · base^i mod
    ``mod`` (int64-safe: codepoint < 2^21, weight < 2^31, 16-term sum
    < 2^56), computed for all positions of a document at once as one
    int64 sliding-window matmul over the UTF-32 view of the string —
    no Python loop over characters. Emits (doc_id, chunk_id, start,
    end_excl, n_chars, chunk_md5) rows; empty docs emit none, docs
    shorter than ``window`` are one chunk.

    Scale shape: EMBARRASSINGLY PARALLEL — stateless map_batches,
    zero exchanges; the md5 is per CHUNK (≈ len/mask rows), not per
    position. The SQL oracle replays the identical 16-term rolling
    hash with unicode()/substr arithmetic and rebuilds the spans
    with one LAG window.
    """
    import hashlib as _hashlib
    weights = np.array(
        [pow(base, window - 1 - j, mod) for j in range(window)],
        dtype=np.int64)
    out_ids, out_cid, out_s, out_e, out_md5 = [], [], [], [], []
    for doc_id, text in zip(batch[id_col], batch[text_col]):
        # None AND float-NaN nulls both mean "no text" (a NaN would
        # otherwise stringify to 'nan' and emit a bogus shared chunk
        # that pollutes the dedup census)
        s = "" if text is None or (isinstance(text, float)
                                   and np.isnan(text)) else str(text)
        n = len(s)
        if n == 0:
            continue
        if n < window:
            ends = [n]
        else:
            cp = np.frombuffer(s.encode("utf-32-le"),
                               dtype=np.uint32).astype(np.int64)
            win = np.lib.stride_tricks.sliding_window_view(cp, window)
            hv = (win @ weights) % mod
            # hv[j] is the hash ENDING at position j + window - 1
            bpos = np.flatnonzero(hv % mask == 0) + (window - 1)
            ends = (bpos + 1).tolist()
            if not ends or ends[-1] != n:
                ends.append(n)
        start = 0
        for cid, e in enumerate(ends):
            chunk = s[start:e]
            out_ids.append(doc_id)
            out_cid.append(cid)
            out_s.append(start)
            out_e.append(e)
            out_md5.append(_hashlib.md5(
                chunk.encode("utf-8")).hexdigest())
            start = e
    return pd.DataFrame({
        id_col: pd.Series(out_ids),
        "chunk_id": pd.Series(out_cid, dtype="int64"),
        "start": pd.Series(out_s, dtype="int64"),
        "end_excl": pd.Series(out_e, dtype="int64"),
        "n_chars": (pd.Series(out_e, dtype="int64")
                    - pd.Series(out_s, dtype="int64")),
        "chunk_md5": pd.Series(out_md5, dtype=object)})


def cdc_dup_chunks(docs, n_buckets: int = 64,
                   text_col: str = "text",
                   id_col: str = "doc_id"):
    """Chunk-level dedup census over the CDC chunking: every
    chunk_md5 occurring more than once corpus-wide, with its
    occurrence and distinct-document counts — the candidate set a
    chunk-level dedup/delta-encoding pass consumes.

    Scale shape: the chunker is stateless per batch; the census ships
    ONE (chunk_md5, doc_id, count partial) row per distinct
    (md5, doc) per batch (combiner), then a md5-bucket groupby sums
    occurrences and counts distinct docs INSIDE the bucket — exact
    even when the same doc_id occupies multiple input rows split
    across batches (a per-batch nunique partial would over-count
    vs the oracle's global COUNT(DISTINCT doc_id)). Chunk text
    never shuffles."""
    import ray.data as rd

    def _partials(df: pd.DataFrame) -> pd.DataFrame:
        ch = cdc_chunks(df, text_col=text_col, id_col=id_col)
        if not len(ch):
            return pd.DataFrame({
                "chunk_md5": pd.Series(dtype=object),
                id_col: pd.Series(dtype="int64"),
                "n_occ": pd.Series(dtype="int64"),
                "hb": pd.Series(dtype="int64")})
        g = (ch.groupby(["chunk_md5", id_col]).size()
             .rename("n_occ").reset_index())
        g["n_occ"] = g["n_occ"].astype("int64")
        g["hb"] = [int(m[:8], 16) % n_buckets for m in g["chunk_md5"]]
        return g

    def _sum(group: pd.DataFrame) -> pd.DataFrame:
        s = (group.groupby("chunk_md5", as_index=False)
             .agg(n_occ=("n_occ", "sum"), n_docs=(id_col, "nunique")))
        s["n_docs"] = s["n_docs"].astype("int64")
        return s[s["n_occ"] >= 2]

    return (docs.map_batches(_partials, batch_format="pandas")
            .groupby("hb").map_groups(_sum, batch_format="pandas"))


def bigram_lift(docs, k: int = 100, min_count: int = 20,
                text_col: str = "text",
                n_buckets: int = 64) -> pd.DataFrame:
    """Collocation mining: the top-``k`` adjacent-token bigrams by
    LIFT — score = (n_ab · N) / (n_a · n_b), the PMI exponential —
    over the corpus token stream ([a-z0-9]+ on lowercased text),
    bigrams with fewer than ``min_count`` occurrences dropped.
    Returns (tok_a, tok_b, n_ab, n_a, n_b, lift) ordered by
    (lift DESC, tok_a, tok_b). The score is a float64 expression over
    EXACT integer counts with a pinned operation order
    ``(n_ab * N) / (n_a * n_b)`` (each operand cast to float64
    first, so nothing overflows at any corpus size), which the SQL
    oracle replays bit-for-bit.

    Scale shape: ONE pass over the corpus emits per-batch
    Counter-combined (gram, count) rows — bigrams, unigrams and the
    token total share the exchange as tagged rows — one gram-hash
    bucket exchange finishes the counts (materialized once:
    vocabulary-sized, the post-combiner minimum), unigram counts
    attach to the min_count-surviving bigrams via two hash joins,
    and the final order is a per-block top-k combiner with a
    ≤ k·blocks driver merge. Document bodies never shuffle."""
    import re as _re

    import pyarrow as pa
    import ray.data as rd

    from .joins import hash_join

    word = _re.compile(r"[a-z0-9]+")
    cnt_schema = pa.schema([("a", pa.string()), ("b", pa.string()),
                            ("n", pa.int64()), ("kind", pa.int8()),
                            ("gb", pa.int64())])

    def _local(batch: pd.DataFrame) -> pa.Table:
        from collections import Counter
        bi: Counter = Counter()
        uni: Counter = Counter()
        total = 0
        for t in batch[text_col]:
            ws = word.findall(str(t).lower())
            total += len(ws)
            uni.update(ws)
            bi.update(zip(ws, ws[1:]))
        rows = [pd.DataFrame({
            "a": [p[0] for p in bi], "b": [p[1] for p in bi],
            "n": pd.Series(list(bi.values()), dtype="int64"),
            "kind": np.int8(0)}), pd.DataFrame({
                "a": list(uni.keys()), "b": "",
                "n": pd.Series(list(uni.values()), dtype="int64"),
                "kind": np.int8(1)}), pd.DataFrame({
                    "a": [""], "b": [""],
                    "n": pd.Series([total], dtype="int64"),
                    "kind": np.int8(2)})]
        out = pd.concat(rows, ignore_index=True)
        out["gb"] = (pd.util.hash_pandas_object(
            out[["a", "b", "kind"]], index=False)
            % n_buckets).astype("int64")
        return pa.Table.from_pandas(
            out, schema=cnt_schema,
            preserve_index=False).replace_schema_metadata(None)

    def _sum_keys(t: pa.Table) -> pa.Table:
        g = (t.to_pandas().groupby(["a", "b", "kind"], as_index=False)
             ["n"].sum())
        g["gb"] = np.int64(0)  # consumed; keep schema stable
        return pa.Table.from_pandas(
            g[["a", "b", "n", "kind", "gb"]], schema=cnt_schema,
            preserve_index=False).replace_schema_metadata(None)

    counts = (docs.map_batches(_local, batch_format="pandas")
              .groupby("gb").map_groups(_sum_keys,
                                        batch_format="pyarrow")
              ).materialize()

    total = 0
    for b in (counts.filter(expr="kind == 2")
              .iter_batches(batch_format="numpy", batch_size=None)):
        total += int(b["n"].sum())

    uni = counts.filter(expr="kind == 1").map_batches(
        lambda df: df[["a", "n"]], batch_format="pandas")
    bi = counts.filter(expr="kind == 0").map_batches(
        lambda df: df.loc[df["n"] >= min_count,
                          ["a", "b", "n"]]
        .rename(columns={"n": "n_ab"}), batch_format="pandas")

    i64, s = pa.int64(), pa.string()
    j = hash_join(
        bi, uni.map_batches(
            lambda df: df.rename(columns={"n": "n_a"}),
            batch_format="pandas"),
        on="a", n_buckets=n_buckets,
        left_schema=pa.schema([("a", s), ("b", s), ("n_ab", i64)]),
        right_schema=pa.schema([("a", s), ("n_a", i64)]))
    j = hash_join(
        j, uni.map_batches(
            lambda df: df.rename(columns={"a": "b", "n": "n_b"}),
            batch_format="pandas"),
        on="b", n_buckets=n_buckets,
        left_schema=pa.schema([("a", s), ("b", s), ("n_ab", i64),
                               ("n_a", i64)]),
        right_schema=pa.schema([("b", s), ("n_b", i64)]))

    def _topk_block(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        # pinned float64 op order — the SQL oracle replays exactly
        df["lift"] = ((df["n_ab"].to_numpy(dtype="float64")
                       * np.float64(total))
                      / (df["n_a"].to_numpy(dtype="float64")
                         * df["n_b"].to_numpy(dtype="float64")))
        return (df.sort_values(["lift", "a", "b"],
                               ascending=[False, True, True])
                .head(k))

    parts = j.map_batches(_topk_block, batch_format="pandas") \
        .to_pandas()
    out = (parts.sort_values(["lift", "a", "b"],
                             ascending=[False, True, True])
           .head(k).reset_index(drop=True)
           .rename(columns={"a": "tok_a", "b": "tok_b"}))
    return out[["tok_a", "tok_b", "n_ab", "n_a", "n_b", "lift"]]


def bpe_pair_counts(docs, k: int = 50, n_buckets: int = 64,
                    text_col: str = "text"):
    """First BPE merge step of tokenizer training: adjacent
    character-pair frequencies over the corpus VOCABULARY, weighted by
    word frequency — the statistic byte-pair encoding (Sennrich et
    al. 2016) maximizes when choosing each merge. The reference's
    stemmed-retry linking ladder is the same build-a-lexical-
    statistic-then-apply shape (Biography/culturalForm.py:524-539);
    here the statistic is the BPE merge table a data-engine
    tokenizer-training pipeline needs.

    Scale shape: the corpus pass is the same ``value_counts`` combiner
    as :func:`top_tokens` (one row per DISTINCT (batch, word), never
    one per occurrence); a word-hash bucket exchange finishes EXACT
    word counts; pair expansion runs INSIDE the bucket body over the
    distinct vocabulary only (per-position vectorized ``str.slice`` —
    ≤ max-word-length passes over the bucket's vocab; corpus text is
    touched exactly once and raw documents never reach the pair
    stage). Per-bucket pair partials pre-combine, so the driver merge
    is bounded by |char-pair universe| × buckets (≤ 26² × 64 rows for
    the ``[a-z]+`` token alphabet).

    Returns ≤ ``k`` rows (a, b, n) ordered by (n desc, a, b).
    """
    import re as _re

    word = _re.compile(r"[a-z]+")
    _EMPTY = {"a": pd.Series([], dtype=object),
              "b": pd.Series([], dtype=object),
              "n": pd.Series([], dtype="int64")}

    def _local(batch: pd.DataFrame) -> pd.DataFrame:
        toks: list = []
        for t in batch[text_col]:
            toks.extend(word.findall(str(t).lower()))
        if not toks:
            return pd.DataFrame({
                "w": pd.Series([], dtype=object),
                "n": pd.Series([], dtype="int64"),
                "wbucket": pd.Series([], dtype="int64")})
        vc = pd.Series(toks).value_counts()
        out = pd.DataFrame({"w": vc.index.to_numpy(),
                            "n": vc.to_numpy().astype("int64")})
        out["wbucket"] = (pd.util.hash_pandas_object(
            out["w"], index=False) % n_buckets).astype("int64")
        return out[["w", "n", "wbucket"]]

    def _bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.groupby("w", as_index=False)["n"].sum()
        words = g["w"].astype(str)
        lens = words.str.len().to_numpy()
        cnts = g["n"].to_numpy()
        parts = []
        for i in range(max(int(lens.max()) - 1, 0) if len(g) else 0):
            m = lens > i + 1
            if not m.any():
                break
            sub = words[m]
            parts.append(pd.DataFrame({
                "a": sub.str.slice(i, i + 1).to_numpy(),
                "b": sub.str.slice(i + 1, i + 2).to_numpy(),
                "n": cnts[m]}))
        if not parts:
            return pd.DataFrame(_EMPTY)
        out = (pd.concat(parts, ignore_index=True)
               .groupby(["a", "b"], as_index=False)["n"].sum())
        out["n"] = out["n"].astype("int64")
        return out[["a", "b", "n"]]

    cands = (docs.map_batches(_local, batch_format="pandas")
             .groupby("wbucket").map_groups(_bucket_pairs,
                                            batch_format="pandas")
             .to_pandas())
    if cands.empty:
        return pd.DataFrame(_EMPTY)
    out = cands.groupby(["a", "b"], as_index=False)["n"].sum()
    out["n"] = out["n"].astype("int64")
    return (out.sort_values(["n", "a", "b"],
                            ascending=[False, True, True],
                            kind="stable")
            .head(k).reset_index(drop=True))


def bpe_merge_pass(wid: np.ndarray, sym: np.ndarray, a: str,
                   b: str) -> tuple:
    """One greedy LEFT-TO-RIGHT NON-OVERLAPPING merge pass over
    word-sorted exploded symbol rows: rows with the same ``wid`` are
    one word's consecutive symbols. Returns ``(take, new_sym)`` —
    the surviving-row mask and the symbol array with kept merge
    starts rewritten to ``a+b`` (apply the mask to every parallel
    column). Overlap runs resolve by run parity: among CONSECUTIVE
    matched start positions in one word, alternate starts win
    ("aaaa" + (a,a) → (aa)(aa))."""
    m = len(wid)
    if not m:
        return np.zeros(0, dtype=bool), sym
    nxt_same = np.concatenate([wid[1:] == wid[:-1], [False]])
    nxt_sym = np.concatenate([sym[1:], [None]])
    match = nxt_same & (sym == a) & (nxt_sym == b)
    prev_match = np.concatenate([[False], match[:-1]])
    same_prev = np.concatenate([[False], wid[1:] == wid[:-1]])
    run_start = match & ~(prev_match & same_prev)
    idx = np.arange(m)
    start_idx = np.zeros(m, dtype=np.int64)
    np.maximum.accumulate(np.where(run_start, idx, 0), out=start_idx)
    keep = match & ((idx - start_idx) % 2 == 0)
    consumed = np.concatenate([[False], keep[:-1]])
    new_sym = np.where(keep, a + b, sym)
    return ~consumed, new_sym


def bpe_train(docs, n_merges: int = 3, n_buckets: int = 64,
              text_col: str = "text") -> pd.DataFrame:
    """BPE TRAINING (Sennrich et al. 2016), ``n_merges`` greedy merge
    rounds over the corpus vocabulary: each round picks the adjacent
    symbol pair with the highest word-frequency-weighted count (ties:
    count desc, then lexicographic (a, b)) and applies it
    LEFT-TO-RIGHT NON-OVERLAPPING to every word's symbol sequence
    ("aaaa" + rule (a,a) → (aa, aa)). Returns the merge table:
    (merge_idx, sym_a, sym_b, pair_count).

    Scale shape: word counts reduce through the ``value_counts``
    combiner + ONE word-hash exchange (same as
    :func:`bpe_pair_counts`); the vocabulary then explodes to
    (word-id, pos, sym, cnt) rows INSIDE the bucket bodies and stays
    bucket-aligned for every round — per round, one map emits
    per-block pair-count partials (driver argmax over the bounded
    distinct-pair universe), the chosen rule broadcasts, and one map
    applies the merge block-locally (a word lives whole in one
    block; the same run-parity trick implements greedy left-to-right
    on runs of overlapping matches vectorized). ZERO exchanges after
    the initial one. The DuckDB oracle unrolls the identical rounds
    with window functions.
    """
    import ray

    from .dedup_docs import _cached_get, _gram_hash
    import re as _re

    word = _re.compile(r"[a-z]+")
    out_empty = pd.DataFrame({
        "merge_idx": pd.Series([], dtype="int64"),
        "sym_a": pd.Series([], dtype=object),
        "sym_b": pd.Series([], dtype=object),
        "pair_count": pd.Series([], dtype="int64")})

    def _local(batch: pd.DataFrame) -> pd.DataFrame:
        toks: list = []
        for t in batch[text_col]:
            toks.extend(word.findall(str(t).lower()))
        if not toks:
            return pd.DataFrame({
                "w": pd.Series([], dtype=object),
                "n": pd.Series([], dtype="int64"),
                "wb": pd.Series([], dtype="int64")})
        vc = pd.Series(toks).value_counts()
        out = pd.DataFrame({"w": vc.index.to_numpy(),
                            "n": vc.to_numpy().astype("int64")})
        out["wb"] = (pd.util.hash_pandas_object(
            out["w"], index=False) % n_buckets).astype("int64")
        return out[["w", "n", "wb"]]

    def _explode(group: pd.DataFrame) -> pd.DataFrame:
        g = group.groupby("w", as_index=False)["n"].sum()
        if not len(g):
            return pd.DataFrame({
                "wid": pd.Series([], dtype="int64"),
                "pos": pd.Series([], dtype="int64"),
                "sym": pd.Series([], dtype=object),
                "cnt": pd.Series([], dtype="int64")})
        words = g["w"].astype(str).to_numpy(dtype=object)
        cnts = g["n"].to_numpy(dtype="int64")
        wid = np.fromiter((_gram_hash(w) for w in words),
                          dtype=np.int64, count=len(words))
        lens = np.fromiter((len(w) for w in words),
                           dtype=np.int64, count=len(words))
        rw = np.repeat(np.arange(len(words)), lens)
        pos = np.concatenate([np.arange(n) for n in lens]) \
            if len(words) else np.empty(0, dtype=np.int64)
        syms = np.array([c for w in words for c in w], dtype=object)
        out = pd.DataFrame({"wid": wid[rw], "pos": pos, "sym": syms,
                            "cnt": cnts[rw]})
        return out.sort_values(["wid", "pos"], kind="stable")

    vocab = (docs.map_batches(_local, batch_format="pandas")
             .groupby("wb").map_groups(_explode,
                                       batch_format="pandas")
             ).materialize()

    # the per-round maps assume every word's symbol rows live WHOLE
    # in one block (the graph family's block-local-rounds invariant):
    # Ray splits a block only when one group's output exceeds the
    # target block size, so when the exploded vocabulary outgrows
    # the per-group bound, re-bucket once with enough buckets that
    # groups stay comfortably under it
    n_rows = vocab.count()
    if n_rows > n_buckets * 4_000_000:
        B2 = np.int64(n_rows // 4_000_000 + 1)
        vocab = (vocab.map_batches(
            lambda df: df.assign(wb2=(df["wid"].astype("int64")
                                      % B2).astype("int64")),
            batch_format="pandas")
            .groupby("wb2").map_groups(
                lambda g: g[["wid", "pos", "sym", "cnt"]]
                .sort_values(["wid", "pos"], kind="stable"),
                batch_format="pandas")).materialize()

    def _pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "a": pd.Series([], dtype=object),
                "b": pd.Series([], dtype=object),
                "n": pd.Series([], dtype="int64")})
        g = df.sort_values(["wid", "pos"], kind="stable")
        wid = g["wid"].to_numpy(dtype="int64")
        sym = g["sym"].to_numpy(dtype=object)
        cnt = g["cnt"].to_numpy(dtype="int64")
        nxt = np.concatenate([wid[1:] == wid[:-1], [False]])
        a = sym[:-1][nxt[:-1]]
        b = sym[1:][nxt[:-1]]
        c = cnt[:-1][nxt[:-1]]
        out = (pd.DataFrame({"a": a, "b": b, "n": c})
               .groupby(["a", "b"], as_index=False)["n"].sum())
        out["n"] = out["n"].astype("int64")
        return out

    rules = []
    for r in range(1, n_merges + 1):
        parts = vocab.map_batches(_pair_partial,
                                  batch_format="pandas",
                                  batch_size=None).to_pandas()
        if not len(parts) or "a" not in parts.columns:
            break
        agg = parts.groupby(["a", "b"], as_index=False)["n"].sum()
        if not len(agg):
            break
        best = agg.sort_values(["n", "a", "b"],
                               ascending=[False, True, True],
                               kind="stable").iloc[0]
        ra, rb, rn = str(best["a"]), str(best["b"]), int(best["n"])
        rules.append({"merge_idx": r, "sym_a": ra, "sym_b": rb,
                      "pair_count": rn})
        rule_ref = ray.put((ra, rb))

        def _apply(df: pd.DataFrame, _ref=rule_ref) -> pd.DataFrame:
            if not len(df):
                return df
            a, b = _cached_get(_ref)
            g = df.sort_values(["wid", "pos"], kind="stable")
            wid = g["wid"].to_numpy(dtype="int64")
            cnt = g["cnt"].to_numpy(dtype="int64")
            take, new_sym = bpe_merge_pass(
                wid, g["sym"].to_numpy(dtype=object), a, b)
            out = pd.DataFrame({"wid": wid[take],
                                "sym": new_sym[take],
                                "cnt": cnt[take]})
            out["pos"] = out.groupby("wid").cumcount() \
                .to_numpy(dtype="int64")
            return out[["wid", "pos", "sym", "cnt"]]

        vocab = vocab.map_batches(_apply, batch_format="pandas",
                                  batch_size=None).materialize()

    if not rules:
        return out_empty
    out = pd.DataFrame(rules, columns=["merge_idx", "sym_a", "sym_b",
                                       "pair_count"])
    return out.astype({"merge_idx": "int64", "pair_count": "int64"})


def bpe_tokenize_counts(docs, rules: list[tuple[str, str]],
                        n_buckets: int = 64,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> pd.DataFrame:
    """Apply a trained BPE merge table and count tokens per document:
    for every doc, the word count and the total symbol count after
    the merges are applied in rule order (each rule one greedy
    left-to-right pass). Documents with no ``[a-z]+`` words emit
    nothing (same domain as the SQL join replay).

    Scale shape: per-batch (doc, word, k) occurrence combiners enter
    ONE word-hash exchange; each bucket applies the (broadcast,
    3-row) rule list to its DISTINCT words only — corpus text is
    touched once, merges run over the vocabulary — and emits per-doc
    partials; a doc-hash exchange sums them. Output is one row per
    document."""
    import ray

    from .dedup_docs import _cached_get
    import re as _re

    word = _re.compile(r"[a-z]+")
    rref = ray.put(tuple(rules))
    out_empty = pd.DataFrame({
        "doc_id": pd.Series([], dtype="int64"),
        "n_words": pd.Series([], dtype="int64"),
        "n_bpe_tokens": pd.Series([], dtype="int64")})

    def _local(batch: pd.DataFrame) -> pd.DataFrame:
        dids, ws = [], []
        for d, t in zip(batch[id_col], batch[text_col]):
            toks = word.findall(str(t).lower())
            dids.extend([d] * len(toks))
            ws.extend(toks)
        if not ws:
            return pd.DataFrame({
                "doc_id": pd.Series([], dtype="int64"),
                "w": pd.Series([], dtype=object),
                "k": pd.Series([], dtype="int64"),
                "wb": pd.Series([], dtype="int64")})
        out = (pd.DataFrame({"doc_id": np.asarray(dids,
                                                  dtype="int64"),
                             "w": np.asarray(ws, dtype=object)})
               .groupby(["doc_id", "w"], as_index=False)
               .agg(k=("w", "size")))
        out["k"] = out["k"].astype("int64")
        out["wb"] = (pd.util.hash_pandas_object(
            out["w"], index=False) % n_buckets).astype("int64")
        return out[["doc_id", "w", "k", "wb"]]

    def _bucket(group: pd.DataFrame) -> pd.DataFrame:
        if not len(group):
            return out_empty.assign(
                db=pd.Series([], dtype="int64"))
        rl = _cached_get(rref)
        words = pd.unique(group["w"].astype(str))
        # explode the bucket's DISTINCT words and run the merge
        # passes locally (whole words by construction)
        lens = np.fromiter((len(w) for w in words), dtype=np.int64,
                           count=len(words))
        wid = np.repeat(np.arange(len(words)), lens)
        sym = np.array([c for w in words for c in w], dtype=object)
        for a, b in rl:
            take, sym = bpe_merge_pass(wid, sym, a, b)
            wid, sym = wid[take], sym[take]
        ns = np.bincount(wid, minlength=len(words)).astype("int64")
        nmap = pd.Series(ns, index=words)
        g = group.copy()
        g["ns"] = g["w"].map(nmap).astype("int64") * g["k"]
        out = (g.groupby("doc_id", as_index=False)
               .agg(n_words=("k", "sum"), n_bpe_tokens=("ns", "sum")))
        out["db"] = (out["doc_id"].astype("int64")
                     % n_buckets).astype("int64")
        return out

    def _doc_sum(group: pd.DataFrame) -> pd.DataFrame:
        out = (group.groupby("doc_id", as_index=False)
               [["n_words", "n_bpe_tokens"]].sum())
        return out.astype({"n_words": "int64",
                           "n_bpe_tokens": "int64"})

    res = (docs.map_batches(_local, batch_format="pandas")
           .groupby("wb").map_groups(_bucket, batch_format="pandas")
           .groupby("db").map_groups(_doc_sum, batch_format="pandas")
           .to_pandas())
    if not len(res) or "doc_id" not in res.columns:
        return out_empty
    res = res[["doc_id", "n_words", "n_bpe_tokens"]].astype(
        {"doc_id": "int64", "n_words": "int64",
         "n_bpe_tokens": "int64"})
    return res.sort_values("doc_id", ignore_index=True)


def mixture_weights(docs, alpha: float = 0.5, round_to: int = 4,
                    source_col: str = "source"):
    """Temperature-scaled source-mixture weights for training-data
    sampling: weight(s) ∝ n_s^alpha, normalized — alpha < 1 upweights
    small sources relative to proportional sampling (the standard
    multilingual/multi-source rebalancing rule, e.g. the temperature
    sampling of public multilingual-pretraining recipes).

    Scale shape: a per-batch ``value_counts`` combiner reduces the
    scan to one (source, count) row per distinct (batch, source);
    driver traffic is bounded by |sources| × blocks, and the weight
    arithmetic runs on the final |sources|-row frame. No shuffle.

    Returns (source, n_docs, weight, epochs_at_uniform) ordered by
    source — ``epochs_at_uniform`` is the relative over/under-sampling
    factor weight/(n_s/N), > 1 for upweighted (small) sources.
    """
    def _local(batch: pd.DataFrame) -> pd.DataFrame:
        vc = batch[source_col].astype(str).value_counts()
        return pd.DataFrame({"source": vc.index.to_numpy(),
                             "n_docs": vc.to_numpy().astype("int64")})

    parts = (docs.map_batches(_local, batch_format="pandas")
             .to_pandas())
    if parts.empty:
        return pd.DataFrame({
            "source": pd.Series([], dtype=object),
            "n_docs": pd.Series([], dtype="int64"),
            "weight": pd.Series([], dtype="float64"),
            "epochs_at_uniform": pd.Series([], dtype="float64")})
    out = (parts.groupby("source", as_index=False)["n_docs"].sum()
           .sort_values("source", ignore_index=True))
    out["n_docs"] = out["n_docs"].astype("int64")
    pw = np.power(out["n_docs"].to_numpy(dtype="float64"), alpha)
    w = pw / pw.sum()
    total = float(out["n_docs"].sum())
    out["weight"] = np.round(w, round_to)
    out["epochs_at_uniform"] = np.round(
        w / (out["n_docs"].to_numpy(dtype="float64") / total), round_to)
    return out


def bigram_logprob(docs, n_buckets: int = 64,
                   id_col: str = "doc_id", text_col: str = "text"):
    """Bigram-LM quality score: mean log probability of a document's
    token transitions under the corpus bigram model with add-0.5
    smoothing — ``P(w2|w1) = (c(w1w2)+0.5) / (c(w1·)+0.5·V)`` where
    ``c(w1·)`` counts w1 as a bigram context and V is the exact
    corpus vocabulary. The conditional-probability upgrade of
    :func:`unigram_logprob` (catches locally-plausible but
    incoherently-ordered text a unigram model scores as fine).

    EXACT/replayable contract: counts are keyed by the md5 gram hash
    (the same 60-bit key the n-gram dedup family uses, recomputable
    in SQL); per-bigram log-ratios are QUANTIZED to 1e-6 int64, so
    every per-document aggregate is an exact integer sum and the
    reported score is ``(s/1e6)/n`` — two IEEE divisions identical on
    both engines. The only floats the oracle replays are the
    per-distinct-bigram ln() calls (1 ulp shifts the rounded
    1e6-grain integer with probability ~1e-10).

    Scale shape: one text scan emits per-batch-combined (doc, h2,
    h1, cnt) rows — int64-only from there. Three bounded exchanges:
    bigram-hash bucket (attach c2; a hash lives in one bucket so
    group-local = global), context-hash bucket (attach c1, quantize
    the log-ratio), doc bucket (integer sum). V comes from
    :func:`distinct_tokens` (bucketed exact distinct). No model
    broadcast at all — unseen-bigram backoff never arises because
    every scored position is by construction in the model, and the
    count join shuffles ints, not a vocabulary."""
    import re as _re

    from .dedup_docs import _gram_hash

    word = _re.compile(r"[a-z0-9]+")
    B = np.int64(n_buckets)
    # two passes (distinct-token fit + position scan): pin so an
    # expensive upstream runs once
    docs = docs.materialize()
    V = int(distinct_tokens(docs, n_buckets=n_buckets,
                            text_col=text_col)
            ["n_distinct_tokens"].iloc[0])

    def _pos_rows(batch: pd.DataFrame) -> pd.DataFrame:
        toks = [word.findall(t.lower()) if isinstance(t, str) else []
                for t in batch[text_col]]
        ids = batch[id_col].to_numpy()
        flat, docs_of = [], []
        for r, ts in enumerate(toks):
            flat.extend(ts)
            docs_of.extend([r] * len(ts))
        empty = pd.DataFrame({
            id_col: pd.Series([], dtype="int64"),
            "h2": pd.Series([], dtype="int64"),
            "h1": pd.Series([], dtype="int64"),
            "cnt": pd.Series([], dtype="int64"),
            "b2": pd.Series([], dtype="int64")})
        if len(flat) < 2:
            return empty
        fa = pd.Series(flat, dtype=object)
        da = np.asarray(docs_of, dtype=np.int64)
        same = da[1:] == da[:-1]
        if not same.any():
            return empty
        w1 = fa.iloc[:-1].reset_index(drop=True)[same]
        w2 = fa.iloc[1:].reset_index(drop=True)[same]
        bg = w1.str.cat(w2, sep=" ")
        c2_codes, c2_uniq = pd.factorize(bg)
        h2u = np.fromiter((_gram_hash(g) for g in c2_uniq),
                          dtype=np.int64, count=len(c2_uniq))
        c1_codes, c1_uniq = pd.factorize(w1)
        h1u = np.fromiter((_gram_hash(w) for w in c1_uniq),
                          dtype=np.int64, count=len(c1_uniq))
        df = pd.DataFrame({
            id_col: ids[da[:-1][same]].astype("int64"),
            "h2": h2u[c2_codes], "h1": h1u[c1_codes]})
        out = df.groupby([id_col, "h2", "h1"], as_index=False).size() \
            .rename(columns={"size": "cnt"})
        out["cnt"] = out["cnt"].astype("int64")
        out["b2"] = (out["h2"] % B).astype("int64")
        return out

    def _attach_c2(group: pd.DataFrame) -> pd.DataFrame:
        c2 = group.groupby("h2")["cnt"].transform("sum") \
            .astype("int64")
        out = group[[id_col, "h1", "cnt"]].copy()
        out["c2"] = c2
        out["b1"] = (group["h1"] % B).astype("int64")
        return out

    def _attach_c1(group: pd.DataFrame) -> pd.DataFrame:
        c1 = group.groupby("h1")["cnt"].transform("sum") \
            .to_numpy(dtype="float64")
        c2 = group["c2"].to_numpy(dtype="float64")
        lq = np.round(1e6 * np.log((c2 + 0.5)
                                   / (c1 + 0.5 * V))).astype(np.int64)
        cnt = group["cnt"].to_numpy(dtype="int64")
        out = pd.DataFrame({
            id_col: group[id_col].to_numpy(),
            "v": cnt * lq, "cnt": cnt})
        out["db"] = (out[id_col] % B).astype("int64")
        return out

    def _doc_sum(group: pd.DataFrame) -> pd.DataFrame:
        g = group.groupby(id_col, as_index=False) \
            .agg(s=("v", "sum"), n=("cnt", "sum"))
        return pd.DataFrame({
            id_col: g[id_col].astype("int64"),
            "n_bigrams": g["n"].astype("int64"),
            "bigram_logprob":
                (g["s"].to_numpy(dtype=np.float64) / 1e6)
                / g["n"].to_numpy(dtype=np.float64)})

    return (docs.map_batches(_pos_rows, batch_format="pandas")
            .groupby("b2").map_groups(_attach_c2,
                                      batch_format="pandas")
            .groupby("b1").map_groups(_attach_c1,
                                      batch_format="pandas")
            .groupby("db").map_groups(_doc_sum,
                                      batch_format="pandas"))


def token_entropy(docs, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document Shannon entropy of the token distribution (nats):
    ``H = Σ_w (c_w/n)·ln(n/c_w)`` — low entropy flags repetitive /
    template text, high entropy flags token soup; the single-doc
    companion to the corpus-level repetition filters.

    Exactness contract: the log factor is quantized per DISTINCT
    (n, c) pair — ``lq = round(1e6·ln(n/c))`` (1 ulp of ln() shifts
    the rounded integer with probability ~1e-10) — and the document
    sum ``Σ c·lq`` is exact int64 arithmetic, so the reported
    ``H = (s/1e6)/n`` is two IEEE divisions identical on both
    engines. Purely per-document: one vectorized ``map_batches``
    scan, no shuffle, nothing at the driver."""
    import re as _re

    word = _re.compile(r"[a-z0-9]+")

    def _ent(batch: pd.DataFrame) -> pd.DataFrame:
        toks = [word.findall(t.lower()) if isinstance(t, str) else []
                for t in batch[text_col]]
        lens = np.fromiter((len(t) for t in toks), dtype=np.int64,
                           count=len(toks))
        keep = lens > 0
        if not keep.any():
            return pd.DataFrame({
                id_col: pd.Series([], dtype="int64"),
                "n_toks": pd.Series([], dtype="int64"),
                "token_entropy": pd.Series([], dtype="float64")})
        flat, didx = [], []
        for r, ts in enumerate(toks):
            flat.extend(ts)
            didx.extend([r] * len(ts))
        df = pd.DataFrame({"r": np.asarray(didx, dtype=np.int64),
                           "w": pd.Series(flat, dtype=object)})
        c = df.groupby(["r", "w"], sort=False).size() \
            .reset_index(name="c")
        n_of = lens[c["r"].to_numpy()]
        cc = c["c"].to_numpy(dtype=np.int64)
        lq = np.round(1e6 * np.log(n_of.astype(np.float64) / cc)) \
            .astype(np.int64)
        s = np.zeros(len(batch), dtype=np.int64)
        np.add.at(s, c["r"].to_numpy(), cc * lq)
        ids = batch[id_col].to_numpy()
        return pd.DataFrame({
            id_col: ids[keep].astype("int64"),
            "n_toks": lens[keep],
            "token_entropy": (s[keep].astype(np.float64) / 1e6)
            / lens[keep].astype(np.float64)})

    return docs.map_batches(_ent, batch_format="pandas")
