"""Corpus-curation operators for training-data pipelines: benchmark
decontamination, PII redaction, and Gopher-style repetition filters.

All three are integer-exact so a DuckDB oracle can recompute them:
no floats, no RNG, no order dependence. The reference has no
corpus-curation layer (it processes a fixed 1,406-entry corpus,
`data/writers_sex.csv`); these operators are the 100-TB-scale
additions a training-data pipeline needs on top of the reference's
extraction semantics.

Scale shapes:

- :func:`repetition_stats` — stateless vectorized ``map_batches``
  (explode → groupby within the batch); never shuffles.
- :func:`pii_redact` — stateless vectorized ``map_batches`` with
  module-compiled regexes; never shuffles.
- :func:`decontaminate` — the benchmark side (a test/eval set, small
  by definition: millions of grams at most) is collapsed to a distinct
  gram-hash set, broadcast once via ``ray.put``, and probed per batch;
  the corpus side streams. If the benchmark outgrows a broadcast
  (≳10^8 grams), switch to the inverted-index semi-join shape of
  ``dedup_docs.ngram_jaccard_pairs`` — same gram hashing, shuffle
  instead of broadcast.
"""

from __future__ import annotations

import hashlib
import os
import re

import numpy as np
import pandas as pd

import ray
import ray.data as rd

from .dedup_docs import _cached_get, _gram_hash

_WORD = re.compile(r"[a-z0-9]+")

# PII patterns, applied (and counted) in THIS order — SSN first so the
# phone pattern can't eat an SSN tail. RE2-compatible (no backrefs, no
# lookarounds) so the DuckDB oracle runs the identical expressions.
PII_PATTERNS = [
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    # 10-digit form first in the alternation so '555-123-4567' redacts
    # whole instead of leaking the area code around '[PHONE]'
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b|\b\d{3}-\d{4}\b", "[PHONE]"),
]
_PII_COMPILED = [(name, re.compile(pat), repl)
                 for name, pat, repl in PII_PATTERNS]


def pii_redact(batch: pd.DataFrame, text_col: str = "text",
               out_col: str = "text_redacted") -> pd.DataFrame:
    """Redact SSN / email / phone patterns and count hits per doc.

    Counts are sequential (each pattern counted on the text AFTER the
    previous pattern's redaction) so overlapping matches resolve
    deterministically; the oracle applies the same order.
    Vectorized: pandas ``str.count`` / ``str.replace`` per pattern —
    no per-row loop.
    """
    out = batch.copy()
    s = batch[text_col].fillna("")
    for name, pat, repl in _PII_COMPILED:
        out[f"n_{name}"] = s.str.count(pat).astype("int64")
        s = s.str.replace(pat, repl, regex=True)
    out[out_col] = s
    return out


def repetition_stats(batch: pd.DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> pd.DataFrame:
    """Gopher-style within-document repetition features, integer-exact.

    Per doc: word count, distinct-word count, the count of the most
    frequent word, and the count of the most frequent word 2-gram
    (Rae et al. 2021 §A1.1 use the char-fraction analogues as quality
    gates). The gate keeps docs where the top word is < 1/5 of all
    words and the top 2-gram is < 1/10 of all 2-grams — integer
    cross-multiplied so SQL reproduces it bit-for-bit.

    Vectorized via explode + groupby over the whole batch; no per-doc
    Python loop.
    """
    s = batch[text_col].fillna("").str.lower()
    words = s.str.findall(_WORD)
    n_words = words.str.len().astype("int64")

    ex = words.explode().dropna()
    if len(ex):
        grp = ex.groupby(level=0)
        n_distinct = grp.nunique()
        wc = ex.groupby([ex.index, ex]).size()
        max_word = wc.groupby(level=0).max()
        # bigrams: word + next word within the same row
        nxt = grp.shift(-1)
        big = (ex + " " + nxt).dropna()
        if len(big):
            bc = big.groupby([big.index, big]).size()
            max_big = bc.groupby(level=0).max()
        else:
            max_big = pd.Series(dtype="int64")
    else:
        n_distinct = pd.Series(dtype="int64")
        max_word = pd.Series(dtype="int64")
        max_big = pd.Series(dtype="int64")

    idx = batch.index
    out = pd.DataFrame({
        id_col: batch[id_col],
        "n_words_r": n_words,
        "n_distinct_words": n_distinct.reindex(idx).fillna(0)
        .astype("int64"),
        "max_word_n": max_word.reindex(idx).fillna(0).astype("int64"),
        "max_bigram_n": max_big.reindex(idx).fillna(0).astype("int64"),
    })
    n_bigrams = (out["n_words_r"] - 1).clip(lower=0)
    # a value occurring ONCE is not repetition: without the <=1 exempt
    # the bigram gate condemns every doc under 11 words (1*10 < 9 is
    # False) even with zero repeated content
    out["repetition_ok"] = (
        ((out["max_word_n"] <= 1)
         | (out["max_word_n"] * 5 < out["n_words_r"]))
        & ((out["max_bigram_n"] <= 1)
           | (out["max_bigram_n"] * 10 < n_bigrams)))
    return out


def benchmark_gram_set(bench: rd.Dataset, n_words: int = 5,
                       text_col: str = "text") -> "ray.ObjectRef":
    """Distinct word-``n_words``-gram hashes of the benchmark set,
    computed distributed, collapsed to a frozenset on the driver
    (benchmarks are small — the corpus is what's big), and
    ``ray.put`` once for broadcast into every probe task."""

    def _grams(batch: pd.DataFrame) -> pd.DataFrame:
        hs: set[int] = set()
        for t in batch[text_col]:
            ws = _WORD.findall(str(t).lower())
            hs.update(_gram_hash(" ".join(ws[i:i + n_words]))
                      for i in range(len(ws) - n_words + 1))
        return pd.DataFrame({"gram": pd.array(sorted(hs), dtype="int64")})

    parts = bench.map_batches(_grams, batch_format="pandas")
    # distinct-collapse per batch happened above; final union is the
    # small benchmark gram table
    grams: set[int] = set()
    for b in parts.iter_batches(batch_format="pandas"):
        grams.update(int(g) for g in b["gram"])
    return ray.put(frozenset(grams))


def decontaminate(corpus: rd.Dataset, bench_grams_ref: "ray.ObjectRef",
                  n_words: int = 5, id_col: str = "doc_id",
                  text_col: str = "text") -> rd.Dataset:
    """Mark corpus docs sharing any word-``n_words``-gram with the
    benchmark set (GPT-3 §C / The Pile-style n-gram decontamination).

    Output: one row per corpus doc — ``n_hit_grams`` (count of the
    doc's DISTINCT grams that appear in the benchmark) and the
    ``contaminated`` flag. The benchmark set rides the object store
    (one copy per node), never per-batch.
    """

    def _probe(batch: pd.DataFrame) -> pd.DataFrame:
        bench = _cached_get(bench_grams_ref)  # unpickle once/worker
        hits = np.empty(len(batch), dtype="int64")
        for j, t in enumerate(batch[text_col]):
            ws = _WORD.findall(str(t).lower())
            gs = {_gram_hash(" ".join(ws[i:i + n_words]))
                  for i in range(len(ws) - n_words + 1)}
            hits[j] = sum(1 for g in gs if g in bench)
        out = pd.DataFrame({id_col: batch[id_col].astype("int64"),
                            "n_hit_grams": hits})
        out["contaminated"] = out["n_hit_grams"] > 0
        return out

    return corpus.map_batches(_probe, batch_format="pandas")


# ------------------------------------- incremental (snapshot) dedup

_BLOOM_MULT = np.uint64(0x9E3779B97F4A7C15)  # splitmix64 increment


def _text_keys(texts) -> np.ndarray:
    """md5-15-hex int64 of the raw text — the shared hashing scheme a
    DuckDB oracle recomputes as ``('0x' || substr(md5(text), 1,
    15))::BIGINT``."""
    return np.fromiter(
        (int(hashlib.md5(str(t).encode()).hexdigest()[:15], 16)
         for t in texts), dtype=np.int64, count=len(texts))


def _bloom_positions(h: np.ndarray, m_log2: int, k: int) -> np.ndarray:
    """(k, n) bit positions via double hashing: idx_j = h1 + j·h2
    (mod m). m is a power of two so the mod is a mask."""
    mask = np.uint64((1 << m_log2) - 1)
    h1 = h.view(np.uint64)
    h2 = (h1 * _BLOOM_MULT) | np.uint64(1)
    return np.stack([(h1 + np.uint64(j) * h2) & mask for j in range(k)])


def _bloom_from_hashes(hashes: rd.Dataset, m_log2: int,
                       k: int) -> "ray.ObjectRef":
    """Bloom filter over a Dataset of precomputed int64 hashes (column
    ``h``). Built distributed: each ``map_batches`` task sets bits into
    its own fixed-size bitmap (2^``m_log2`` bits — 1 MiB at the
    default, INDEPENDENT of corpus size); the driver ORs the
    constant-size partials as they stream and ``ray.put``s the result
    once for broadcast. The driver never sees a hash, only bitmaps."""
    m = 1 << m_log2

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(m >> 6, dtype=np.uint64)
        if len(batch):
            pos = _bloom_positions(batch["h"].to_numpy(np.int64),
                                   m_log2, k).reshape(-1)
            np.bitwise_or.at(bits, pos >> np.uint64(6),
                             np.uint64(1) << (pos & np.uint64(63)))
        return pd.DataFrame({"bitmap": [bits.tobytes()]})

    acc = np.zeros(m >> 6, dtype=np.uint64)
    parts = hashes.map_batches(_partial, batch_format="pandas",
                               batch_size=8192)
    for b in parts.iter_batches(batch_format="pandas"):
        for raw in b["bitmap"]:
            acc |= np.frombuffer(raw, dtype=np.uint64)
    return ray.put(acc)


def snapshot_bloom(snapshot: rd.Dataset, m_log2: int = 23, k: int = 4,
                   text_col: str = "text") -> "ray.ObjectRef":
    """Bloom filter over the snapshot corpus' exact text hashes (see
    :func:`_bloom_from_hashes` for the distributed build shape)."""
    def _hash(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"h": _text_keys(batch[text_col])})

    return _bloom_from_hashes(
        snapshot.map_batches(_hash, batch_format="pandas"),
        m_log2, k)


def incremental_dedup(new_docs: rd.Dataset, snapshot: rd.Dataset,
                      m_log2: int = 23, k: int = 4, n_buckets: int = 64,
                      id_col: str = "doc_id",
                      text_col: str = "text") -> rd.Dataset:
    """EXACT incremental dedup of a new shard against a prior corpus
    snapshot: keep new docs whose exact text does not appear in the
    snapshot — without ever shuffling a document body.

    The scale pattern for recurring crawls: a broadcast Bloom filter
    over the snapshot prunes the (typical-case dominant) definitely-new
    docs from the exchange entirely; only Bloom POSITIVES enter an
    exact hash-bucket anti-join against the snapshot's int64 text
    hashes, so the result is exact (false positives are confirmed
    away, and a Bloom filter has no false negatives). Output:
    ``(doc_id,)`` of kept new docs. A production run would persist the
    snapshot hash column and bitmap between crawls instead of
    recomputing them.
    """
    # hash the snapshot texts ONCE: the materialized (h,) projection
    # (8 bytes a doc) feeds BOTH the Bloom build and the anti-join —
    # round-2 profiling showed the double md5 pass dominated this
    # operator's wall time
    def _snap_hash(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"h": _text_keys(batch[text_col])})

    snap_h = snapshot.map_batches(
        _snap_hash, batch_format="pandas").materialize()
    bloom_ref = _bloom_from_hashes(snap_h, m_log2, k)

    def _probe(batch: pd.DataFrame) -> pd.DataFrame:
        bits = _cached_get(bloom_ref)
        h = _text_keys(batch[text_col])
        pos = _bloom_positions(h, m_log2, k)
        maybe = np.ones(len(batch), dtype=bool)
        for row in pos:
            maybe &= ((bits[row >> np.uint64(6)]
                       >> (row & np.uint64(63))) & np.uint64(1)) == 1
        return pd.DataFrame({id_col: batch[id_col].astype("int64"),
                             "h": h, "maybe": maybe})

    # materialize the PRUNED (id, hash, flag) projection — 17 bytes a
    # doc, not the texts — so the two branches below don't re-hash
    probed = new_docs.map_batches(
        _probe, batch_format="pandas").materialize()
    definite = probed.map_batches(
        lambda b: b.loc[~b["maybe"], [id_col]], batch_format="pandas")

    def _maybe_rows(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch[batch["maybe"]]
        out = pd.DataFrame({id_col: g[id_col].astype("int64"),
                            "h": g["h"].astype("int64"),
                            "kind": np.int64(1)})
        out["hbucket"] = (out["h"] % n_buckets).astype("int64")
        return out

    def _snap_rows(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({id_col: np.int64(-1),
                            "h": batch["h"].astype("int64"),
                            "kind": np.int64(0)})
        out["hbucket"] = (out["h"] % n_buckets).astype("int64")
        return out

    def _anti(group: pd.DataFrame) -> pd.DataFrame:
        seen = group.loc[group["kind"] == 0, "h"]
        keep = group[(group["kind"] == 1) & ~group["h"].isin(seen)]
        return keep[[id_col]].astype("int64")

    maybes = probed.map_batches(_maybe_rows, batch_format="pandas")
    snap = snap_h.map_batches(_snap_rows, batch_format="pandas")
    confirmed = (maybes.union(snap).groupby("hbucket")
                 .map_groups(_anti, batch_format="pandas"))
    return definite.union(confirmed)


# --------------------------------------------- per-source quota cap


def _id_rank(ids) -> np.ndarray:
    """md5-8-hex int64 rank key of the id — the deterministic 'random'
    order the DuckDB oracle recomputes as ``('0x' ||
    substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT``."""
    return np.fromiter(
        (int(hashlib.md5(str(int(i)).encode()).hexdigest()[:8], 16)
         for i in ids), dtype=np.int64, count=len(ids))


def source_cap(docs: rd.Dataset, cap: int = 16, n_buckets: int = 32,
               id_col: str = "doc_id",
               key_col: str = "source") -> rd.Dataset:
    """Keep at most ``cap`` docs per source, chosen by a deterministic
    hash order (RefinedWeb/C4-style per-domain quota: stops any one
    domain from dominating the training mix). Output: the kept
    ``(doc_id, source)`` rows.

    Two-level top-k-per-key: each batch locally prunes to its own
    ``cap`` smallest rank keys per source (bounding the exchange to
    cap × blocks per source regardless of skew), then a source-bucket
    groupby takes the global ``cap`` smallest. Ties on the rank key
    break by doc id, so the pick is total-order deterministic.
    """

    def _local(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({id_col: batch[id_col].astype("int64"),
                            key_col: batch[key_col].astype(str),
                            "rk": _id_rank(batch[id_col])})
        out = (out.sort_values(["rk", id_col])
               .groupby(key_col, as_index=False).head(cap))
        out["sbucket"] = pd.array(
            [int(hashlib.md5(s.encode()).hexdigest()[:8], 16)
             % n_buckets for s in out[key_col]], dtype="int64")
        return out

    def _global(group: pd.DataFrame) -> pd.DataFrame:
        g = (group.sort_values(["rk", id_col])
             .groupby(key_col, as_index=False).head(cap))
        return g[[id_col, key_col]]

    return (docs.map_batches(_local, batch_format="pandas")
            .groupby("sbucket").map_groups(_global,
                                           batch_format="pandas"))


def balanced_sample(docs: rd.Dataset, id_col: str = "doc_id",
                    key_col: str = "source",
                    n_buckets: int = 32) -> rd.Dataset:
    """Balanced source mixture: downsample every source to the size of
    the SMALLEST one (the deterministic analogue of mixture-weight
    rebalancing — per-domain uniform target, the Pile/Dolma data-mix
    step). Picks per source are the md5-rank smallest (doc-id
    tie-break), so the sample is reproducible across runs, block
    orders and cluster sizes.

    Scale shape: the per-source counts are a tiny combiner aggregate
    (one row per (batch, source) to the driver, bounded by the source
    domain); the cap is then a plain :func:`source_cap` run — two-level
    top-k-per-key, exchange bounded at cap × blocks per source.
    Output: kept (doc_id, source).
    """

    def _counts(batch: pd.DataFrame) -> pd.DataFrame:
        vc = batch[key_col].astype(str).value_counts()
        return pd.DataFrame({key_col: vc.index.to_numpy(),
                             "n": vc.to_numpy().astype("int64")})

    counts = (docs.map_batches(_counts, batch_format="pandas")
              .to_pandas())
    if not len(counts):
        return docs.map_batches(
            lambda b: b[[id_col, key_col]], batch_format="pandas")
    cap = int(counts.groupby(key_col)["n"].sum().min())
    return source_cap(docs, cap=cap, n_buckets=n_buckets,
                      id_col=id_col, key_col=key_col)


# line_idx packs into the winner key below doc_id — documents with
# more lines than this would collide across docs (none exist: a 2^20
# -line document is not a document)
_LINE_IDX_BITS = 20


def line_dedup(docs: rd.Dataset, n_buckets: int = 64,
               id_col: str = "doc_id", text_col: str = "text",
               doc_buckets: int = 32) -> rd.Dataset:
    """GLOBAL first-occurrence line dedup with document reassembly
    (RefinedWeb's exact line dedup, distinct from the df-threshold
    boilerplate strip): every line survives only at its first corpus
    occurrence — the smallest ``(doc_id, line_idx)`` — and each
    document is rebuilt from its surviving lines in order.

    Scale shape: the dedup exchange carries ONLY int64 rows (md5-15-hex
    line hash, packed ``doc_id·2^20 + line_idx`` occurrence key) into a
    line-hash-bucket groupby that emits the winning occurrences; the
    reassembly exchange co-locates each doc's body with its surviving
    line indexes by doc-id bucket — bodies move exactly once, and no
    line text ever shuffles. Output: (doc_id, n_lines, n_kept,
    text_kept).
    """

    def _explode(batch: pd.DataFrame) -> pd.DataFrame:
        lines = batch[text_col].fillna("").str.split("\n")
        ex = lines.explode()
        doc = batch.loc[ex.index, id_col].to_numpy(dtype="int64")
        idx = np.concatenate([np.arange(k, dtype="int64")
                              for k in lines.str.len()]) \
            if len(batch) else np.array([], dtype="int64")
        h = np.fromiter((_gram_hash(str(l)) for l in ex.to_numpy()),
                        dtype=np.int64, count=len(ex))
        out = pd.DataFrame({"h": h, "w": doc * (1 << _LINE_IDX_BITS)
                            + idx})
        out["lbucket"] = (out["h"] % n_buckets).astype("int64")
        return out

    def _winners(group: pd.DataFrame) -> pd.DataFrame:
        wmin = group.groupby("h")["w"].min().to_numpy()
        return pd.DataFrame({
            id_col: (wmin >> _LINE_IDX_BITS).astype("int64"),
            "line_idx": (wmin & ((1 << _LINE_IDX_BITS) - 1))
            .astype("int64")})

    kept = (docs.map_batches(_explode, batch_format="pandas")
            .groupby("lbucket").map_groups(_winners,
                                           batch_format="pandas"))

    def _tag_kept(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out["kind"] = np.int64(1)
        out[text_col] = ""
        out["dbucket"] = (out[id_col] % doc_buckets).astype("int64")
        return out

    def _tag_docs(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({id_col: batch[id_col].astype("int64"),
                            "line_idx": np.int64(-1),
                            "kind": np.int64(0),
                            text_col: batch[text_col].fillna("")})
        out["dbucket"] = (out[id_col] % doc_buckets).astype("int64")
        return out

    def _reassemble(group: pd.DataFrame) -> pd.DataFrame:
        d = group[group["kind"] == 0]
        k = group[group["kind"] == 1]
        kept_idx = {doc: set(g["line_idx"])
                    for doc, g in k.groupby(id_col)}
        rows = []
        for doc, text in zip(d[id_col], d[text_col]):
            lines = text.split("\n")
            keep = kept_idx.get(doc, set())
            surv = [l for i, l in enumerate(lines) if i in keep]
            rows.append((doc, len(lines), len(surv), "\n".join(surv)))
        return pd.DataFrame(rows, columns=[id_col, "n_lines", "n_kept",
                                           "text_kept"]) \
            .astype({id_col: "int64", "n_lines": "int64",
                     "n_kept": "int64"})

    tagged_kept = kept.map_batches(_tag_kept, batch_format="pandas")
    tagged_docs = docs.map_batches(_tag_docs, batch_format="pandas")
    return (tagged_docs.union(tagged_kept)
            .groupby("dbucket").map_groups(_reassemble,
                                           batch_format="pandas"))


def train_shard_assignment(docs: rd.Dataset, n_shards: int = 8,
                           id_col: str = "doc_id") -> rd.Dataset:
    """Deterministic pseudo-shuffle into training shards: each doc's
    md5-rank picks its shard (rank % n_shards) and its position
    within the shard (rank order, id tie-break) — a reproducible
    global shuffle with NO random_shuffle all-to-all: only (id, rank)
    pairs ride the shard-keyed exchange, never document bodies.

    Scale note: position assignment sorts ONE SHARD per map_groups
    call, so size ``n_shards`` to the corpus — thousands at corpus
    scale (the usual training-shard count), keeping each shard's
    (id, rank) slice in one worker's heap. The tiny default suits
    test data only.
    """

    def _assign(batch: pd.DataFrame) -> pd.DataFrame:
        rk = _id_rank(batch[id_col])
        return pd.DataFrame({id_col: batch[id_col].to_numpy(),
                             "rk": rk,
                             "shard": (rk % n_shards)})

    def _position(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["rk", id_col], kind="stable",
                              ignore_index=True)
        return pd.DataFrame({id_col: g[id_col],
                             "shard": g["shard"],
                             "pos": np.arange(len(g), dtype="int64")})

    return (docs.map_batches(_assign, batch_format="pandas")
            .groupby("shard").map_groups(_position,
                                         batch_format="pandas"))


_SHARD_MARKER = "_SHARD.json"


def write_train_shards(docs: rd.Dataset, out_dir: str,
                       n_shards: int = 8,
                       id_col: str = "doc_id",
                       fingerprint: str | None = None,
                       shards: list[int] | None = None) -> dict:
    """Materialize shard-partitioned training parquet with RESUMABLE
    per-shard atomic publish (mirrors ``pipelines/manifest.py``; the
    reference's per-person overwrite, ``Utils/utilities.py:536-543``,
    has no such recovery — a crash reruns everything).

    One Dataset job writes every PENDING shard into a tmp dir
    (``partition_cols=["shard"]`` — bodies flow straight to the sink,
    no shuffle), then each shard dir is published atomically
    (``os.replace``) together with a ``_SHARD.json`` marker carrying
    the optional input ``fingerprint``. A re-run skips shards whose
    marker matches — published files are never rewritten, so finished
    shards stay byte-identical across resumes. Readers get the
    deterministic order by sorting each shard on the stored rank.

    ``shards`` restricts which pending shards get written this call
    (tests use it to simulate a run killed mid-way). Returns
    ``{"written": [...], "skipped": [...]}``.
    """
    import json
    import shutil

    os.makedirs(out_dir, exist_ok=True)
    done: set[int] = set()
    for d in os.listdir(out_dir):
        if not d.startswith("shard=") or ".tmp" in d:
            continue
        tail = d.split("=", 1)[1]
        if not tail.isdigit():
            continue  # foreign/malformed dir (e.g. shard=old): ignore
        idx = int(tail)
        if idx >= n_shards:
            # a shrunk n_shards leaves higher-indexed dirs from the
            # previous layout: readers globbing shard=* would see
            # every row twice — remove them
            shutil.rmtree(os.path.join(out_dir, d),
                          ignore_errors=True)
            continue
        mpath = os.path.join(out_dir, d, _SHARD_MARKER)
        if os.path.exists(mpath):
            with open(mpath) as f:
                m = json.load(f)
            # fingerprint None means fingerprinting is DISABLED:
            # never skip on a null match (two different inputs would
            # both write null markers)
            if (fingerprint is not None
                    and m.get("fingerprint") == fingerprint
                    and m.get("n_shards") == n_shards):
                done.add(idx)
    pending = [s for s in range(n_shards)
               if s not in done and (shards is None or s in shards)]
    if not pending:
        return {"written": [], "skipped": sorted(done)}

    want = set(pending)
    tmp = os.path.join(out_dir, f"_pending.tmp.{os.getpid()}")
    shutil.rmtree(tmp, ignore_errors=True)

    def _tag(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        rk = _id_rank(batch[id_col])
        out["rk"] = rk
        out["shard"] = rk % n_shards
        # resume: rows of already-published (or excluded) shards never
        # reach the sink — the skip is a filter, not a rewrite
        return out[out["shard"].isin(want)]

    (docs.map_batches(_tag, batch_format="pandas")
     .write_parquet(tmp, partition_cols=["shard"]))
    for s in pending:
        src = os.path.join(tmp, f"shard={s}")
        os.makedirs(src, exist_ok=True)  # empty shard: marker-only dir
        with open(os.path.join(src, _SHARD_MARKER), "w") as f:
            json.dump({"shard": s, "n_shards": n_shards,
                       "fingerprint": fingerprint}, f, sort_keys=True)
        final = os.path.join(out_dir, f"shard={s}")
        shutil.rmtree(final, ignore_errors=True)  # unmarked partial
        os.replace(src, final)
    shutil.rmtree(tmp, ignore_errors=True)
    return {"written": pending, "skipped": sorted(done)}


_CKPT_MARKER = "_SURVIVORS.json"


def _input_fingerprint(path: str) -> str | None:
    """(file name, size, mtime) digest of a parquet file/dir —
    delegates to the ONE canonical RECURSIVE fingerprint in
    ``pipelines.manifest._fingerprint`` (a top-level-only listing
    would let an edit to a nested/partitioned file leave the survivor
    checkpoint 'valid' and serve a stale resume — the same
    non-recursive staleness bug the KG probe cache had). None when
    the path can't be stat'd or holds no parquet at all
    (checkpointing is then disabled rather than wrong)."""
    from ..pipelines.manifest import _fingerprint
    try:
        if os.path.isdir(path):
            has_parquet = any(
                f.endswith(".parquet")
                for _, _, fs in os.walk(path) for f in fs)
            if not has_parquet:
                # nothing to fingerprint: every such input would hash
                # identically — disable checkpointing rather than
                # risk cross-corpus checkpoint reuse
                return None
        return _fingerprint(path)
    except OSError:
        return None


def _load_survivor_checkpoint(ck_dir: str,
                              fingerprint: str | None
                              ) -> rd.Dataset | None:
    """The checkpointed survivor-id Dataset, or None when absent /
    written against a different input."""
    import json
    mpath = os.path.join(ck_dir, _CKPT_MARKER)
    if fingerprint is None or not os.path.exists(mpath):
        return None
    try:
        with open(mpath) as f:
            m = json.load(f)
    except (OSError, ValueError):
        return None
    if m.get("fingerprint") != fingerprint:
        return None
    return rd.read_parquet(ck_dir)


def run_curation(input_path: str, out_dir: str, n_shards: int = 8,
                 fresh: bool = False, neardup: bool = False,
                 jaccard_threshold: float = 0.5) -> dict:
    """The composed curation DAG — quality gate → exact dedup →
    shard-partitioned training parquet — with END-TO-END RESUME: a
    run killed mid-dedup or mid-sink restarts from its last completed
    stage instead of from scratch.

    Two checkpoints, both keyed to the INPUT fingerprint (file
    names/sizes/mtimes), both atomically published (tmp +
    ``os.replace``):

    1. the dedup SURVIVOR-ID SET (``<out>/_survivors/`` — one int64
       id per surviving doc, written distributed, never through the
       driver). Gate + dedup are deterministic, so the id set alone
       reproduces the survivor rows: a resumed run semi-joins the
       input against it (one partitioned hash join) and skips the
       gate scan and the dedup exchange entirely.
    2. (``neardup=True``) the FINAL survivor-id set after near-dup
       resolution (``<out>/_survivors_neardup/`` — word-5-gram
       Jaccard components over the exact-dedup survivors, longest
       text per cluster wins): a run killed mid-sink resumes with one
       semi-join and skips gate, dedup AND the near-dup exchanges; a
       run killed mid-near-dup resumes from checkpoint 1 and redoes
       only the near-dup stage.
    3. the per-shard ``_SHARD.json`` markers
       (:func:`write_train_shards`) — finished shards are never
       rewritten.

    ``fresh=True`` discards all and recomputes. Returns
    ``{"docs_in", "docs_out", "resumed", "resumed_stage",
    "shards": {...}}``.
    """
    import json
    import shutil

    import pyarrow.compute as pc

    from .joins import hash_join
    from .textstats import quality_score

    fp = _input_fingerprint(input_path)
    # Stage-1 checkpoint keys on the INPUT alone (gate + exact dedup
    # don't depend on the near-dup config); the FINAL survivor set
    # and the shard markers key on input + pipeline config, so
    # toggling neardup or changing the threshold invalidates the
    # shards and the final checkpoint instead of silently reusing
    # output produced under a different configuration.
    fp_cfg = None if fp is None else hashlib.md5(
        f"{fp}|neardup={bool(neardup)}|tau={jaccard_threshold}"
        .encode()).hexdigest()
    ck_dir = os.path.join(out_dir, "_survivors")
    if fresh:
        shutil.rmtree(ck_dir, ignore_errors=True)
        for d in list(os.listdir(out_dir))                 if os.path.isdir(out_dir) else []:
            if d.startswith("shard="):
                shutil.rmtree(os.path.join(out_dir, d),
                              ignore_errors=True)

    ck_final = os.path.join(out_dir, "_survivors_neardup")
    if fresh:
        shutil.rmtree(ck_final, ignore_errors=True)

    def _publish_ids(ds: rd.Dataset, dest: str,
                     marker_fp: str | None = None) -> None:
        """Distributed write of a compact id set, marker written
        INSIDE the tmp dir, then one atomic rename."""
        os.makedirs(out_dir, exist_ok=True)
        tmp = dest + f".tmp.{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        ds.map_batches(lambda df: df[["doc_id"]],
                       batch_format="pandas").write_parquet(tmp)
        with open(os.path.join(tmp, _CKPT_MARKER), "w") as f:
            json.dump({"fingerprint": marker_fp or fp}, f,
                      sort_keys=True)
        shutil.rmtree(dest, ignore_errors=True)
        os.replace(tmp, dest)

    docs = rd.read_parquet(input_path, columns=["doc_id", "text"])
    n_in = docs.count()

    if neardup and not fresh:
        final_ids = _load_survivor_checkpoint(ck_final, fp_cfg)
        if final_ids is not None:
            # deepest checkpoint hit: every compute stage skipped
            surv = hash_join(docs, final_ids, on="doc_id")
            n_out = surv.count()
            res = write_train_shards(surv, out_dir,
                                     n_shards=n_shards,
                                     fingerprint=fp_cfg)
            return {"docs_in": int(n_in), "docs_out": int(n_out),
                    "resumed": True, "resumed_stage": "neardup",
                    "shards": res}

    ids = None if fresh else _load_survivor_checkpoint(ck_dir, fp)
    resumed = ids is not None

    if ids is None:
        gated = (docs.map_batches(quality_score,
                                  batch_format="pandas")
                 .map_batches(
                     lambda t: t.filter(
                         pc.equal(t.column("quality_ok"), True))
                     .select(["doc_id", "text"]),
                     batch_format="pyarrow"))

        def _with_tbucket(df: pd.DataFrame) -> pd.DataFrame:
            b = df.copy()
            b["tbucket"] = [int(hashlib.md5(str(x).encode())
                                .hexdigest()[:8], 16) % 64
                            for x in b["text"]]
            return b

        def _survivors(group: pd.DataFrame) -> pd.DataFrame:
            g = group.sort_values("doc_id", kind="stable")
            return g.drop_duplicates("text", keep="first")[
                ["doc_id", "text"]]

        surv = (gated.map_batches(_with_tbucket,
                                  batch_format="pandas")
                .groupby("tbucket").map_groups(
                    _survivors, batch_format="pandas")
                .materialize())
        if fp is not None:
            _publish_ids(surv, ck_dir)  # checkpoint 1 (gate + exact)
    else:
        # resume: rebuild the survivor rows with ONE partitioned hash
        # semi-join of the input against the checkpointed id set —
        # no gate scan, no dedup exchange, nothing id-shaped on the
        # driver
        surv = hash_join(docs, ids, on="doc_id")

    if neardup:
        # stage 2: near-dup resolution over the exact-dedup survivors
        # (the composed flagship's shape — word-5-gram Jaccard
        # components, longest text per cluster wins, min id breaks
        # ties). Everything stays distributed: component membership is
        # joined to per-doc sizes with a partitioned hash join, the
        # per-component winner is resolved inside a bucketed
        # groupby/map_groups, and the losers are removed with a
        # partitioned hash ANTI join — in a heavily duplicated corpus
        # (near-dup dedup's target case) the clustered set is NOT a
        # sliver, so none of it may land on the driver.
        from .dedup_docs import (connected_components_ds,
                                 ngram_jaccard_pairs)
        from .joins import hash_join as _hj
        comp = connected_components_ds(
            ngram_jaccard_pairs(surv, threshold=jaccard_threshold))
        comp_schema = comp.schema(fetch_if_missing=True)
        if comp_schema is not None and "doc_id" in comp_schema.names:

            def _sizes(df: pd.DataFrame) -> pd.DataFrame:
                return pd.DataFrame({
                    "doc_id": df["doc_id"].astype("int64"),
                    "n_chars": df["text"].str.len().astype("int64")})

            def _cast_comp(df: pd.DataFrame) -> pd.DataFrame:
                return pd.DataFrame({
                    "doc_id": df["doc_id"].astype("int64"),
                    "component": df["component"].astype("int64")})

            clustered = _hj(
                comp.map_batches(_cast_comp, batch_format="pandas"),
                surv.map_batches(_sizes, batch_format="pandas"),
                on="doc_id")

            def _with_cbucket(df: pd.DataFrame) -> pd.DataFrame:
                b = df.copy()
                b["cbucket"] = (pd.util.hash_pandas_object(
                    b["component"], index=False) % 64).astype("int32")
                return b

            def _losers(group: pd.DataFrame) -> pd.DataFrame:
                g = group.sort_values(["component", "n_chars",
                                       "doc_id"],
                                      ascending=[True, False, True])
                return g.loc[g.duplicated("component"), ["doc_id"]]

            losers = (clustered.map_batches(_with_cbucket,
                                            batch_format="pandas")
                      .groupby("cbucket")
                      .map_groups(_losers, batch_format="pandas"))
            surv = _hj(surv, losers, on="doc_id",
                       how="anti").materialize()
        if fp is not None:
            _publish_ids(surv, ck_final,
                         fp_cfg)  # checkpoint 2 (final set)

    n_out = surv.count()
    res = write_train_shards(surv, out_dir, n_shards=n_shards,
                             fingerprint=fp_cfg)
    return {"docs_in": int(n_in), "docs_out": int(n_out),
            "resumed": resumed,
            "resumed_stage": "exact" if resumed else None,
            "shards": res}


def frequent_lines(docs: rd.Dataset, min_df: int = 5,
                   n_buckets: int = 64, text_col: str = "text"
                   ) -> "frozenset[str]":
    """Lines appearing in at least ``min_df`` DISTINCT documents —
    the boilerplate set of CCNet/RefinedWeb-style line filtering.

    Scale shape: per-batch the (doc, line) pairs dedup locally and
    collapse to per-line partial doc-counts (the combiner — the
    exchange carries one row per distinct (batch, line)); a
    line-hash-bucket groupby sums true document frequencies; only
    lines CLEARING the threshold reach the driver, which is what
    bounds the broadcast (web boilerplate is heavy-hitter-shaped).
    """

    def _local(batch: pd.DataFrame) -> pd.DataFrame:
        lines = batch[text_col].fillna("").str.split("\n")
        ex = lines.explode()
        pairs = pd.DataFrame({"d": ex.index.to_numpy(),
                              "ln": ex.to_numpy()}).drop_duplicates()
        vc = pairs.groupby("ln").size()
        out = pd.DataFrame({"ln": vc.index.to_numpy(),
                            "n": vc.to_numpy().astype("int64")})
        out["lbucket"] = (pd.util.hash_pandas_object(
            out["ln"], index=False) % n_buckets).astype("int64")
        return out

    def _freq(group: pd.DataFrame) -> pd.DataFrame:
        g = group.groupby("ln", as_index=False)["n"].sum()
        return g.loc[g["n"] >= min_df, ["ln"]]

    got = (docs.map_batches(_local, batch_format="pandas")
           .groupby("lbucket").map_groups(_freq, batch_format="pandas")
           .to_pandas())
    if "ln" not in got.columns:  # empty corpus: nothing is frequent
        return frozenset()
    return frozenset(got["ln"])


def strip_boilerplate(docs: rd.Dataset, min_df: int = 5,
                      id_col: str = "doc_id", text_col: str = "text"
                      ) -> rd.Dataset:
    """Remove boilerplate lines (document frequency >= ``min_df``)
    from every document — two streaming passes: the frequent-line set
    is computed distributed, broadcast once via ``ray.put``, and each
    batch filters + reassembles its docs vectorized-with-set-lookups.
    Output: (id, n_lines, n_removed, text_clean).
    """
    freq_ref = ray.put(frequent_lines(docs, min_df=min_df,
                                      text_col=text_col))

    def _strip(batch: pd.DataFrame) -> pd.DataFrame:
        freq = _cached_get(freq_ref)
        lines = batch[text_col].fillna("").str.split("\n")
        n_lines = lines.str.len().astype("int64")
        kept = [[l for l in ls if l not in freq] for ls in lines]
        return pd.DataFrame({
            id_col: batch[id_col].to_numpy(),
            "n_lines": n_lines,
            "n_removed": n_lines - np.fromiter(
                (len(k) for k in kept), dtype="int64", count=len(kept)),
            "text_clean": ["\n".join(k) for k in kept],
        })

    return docs.map_batches(_strip, batch_format="pandas")


def dsir_weights(docs: rd.Dataset, target_col: str = "lang",
                 target_val: str = "en", n_buckets: int = 1024,
                 id_col: str = "doc_id", text_col: str = "text"
                 ) -> rd.Dataset:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every
    document by how much its hashed-unigram bag looks like the TARGET
    slice (rows with ``target_col == target_val``) versus the whole
    corpus.

    Per-bucket log-ratios with add-0.5 smoothing are QUANTIZED to
    1e-6 (``lrq[b] = round(1e6·(ln((tgt_b+.5)/(T+.5B)) −
    ln((all_b+.5)/(A+.5B))))`` as int64), so the per-document score is
    an EXACT integer sum — the only float ops the oracle must replay
    are the ``n_buckets`` bucket constants (1 ulp of ln() shifts a
    rounded 1e6-grain integer with probability ~1e-10), never the
    per-document sums. Reported weight = ``sum/1e6`` (one exact IEEE
    division).

    Scale shape: pass 1 reduces each batch to ≤ ``n_buckets`` count
    partial rows (target occurrences, total occurrences per bucket) —
    a classic combiner; the driver merge is O(n_buckets × blocks).
    The quantized log-ratio vector broadcasts once via ``ray.put``;
    pass 2 streams the text again and emits one int-sum row per doc.
    No shuffle anywhere; texts never leave the map stages.
    """
    B = n_buckets

    def _hash_words(texts) -> tuple[np.ndarray, np.ndarray]:
        """Explode texts to (row_index, bucket) — md5 bucket per
        occurrence, hashed once per unique word in the batch."""
        words, rows = [], []
        for r, t in enumerate(texts):
            ws = _WORD.findall(str(t).lower())
            words.extend(ws)
            rows.extend([r] * len(ws))
        if not words:
            return (np.array([], dtype=np.int64),
                    np.array([], dtype=np.int64))
        codes, uniq = pd.factorize(pd.Index(words))
        ub = np.fromiter((_gram_hash(w) % B for w in uniq),
                         dtype=np.int64, count=len(uniq))
        return np.asarray(rows, dtype=np.int64), ub[codes]

    def _count_partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows, bs = _hash_words(batch[text_col])
        is_tgt = (batch[target_col].astype(str).to_numpy()
                  == target_val)
        tot = np.bincount(bs, minlength=B).astype(np.int64)
        tgt = np.bincount(bs[is_tgt[rows]] if len(bs) else bs,
                          minlength=B).astype(np.int64)
        return pd.DataFrame({"b": np.arange(B, dtype=np.int64),
                             "tgt": tgt, "tot": tot})

    parts = docs.select_columns([target_col, text_col]) \
        .map_batches(_count_partial, batch_format="pandas").to_pandas()
    if not len(parts):
        tgt_c = np.zeros(B, dtype=np.int64)
        tot_c = np.zeros(B, dtype=np.int64)
    else:
        agg = parts.groupby("b")[["tgt", "tot"]].sum()
        tgt_c = agg["tgt"].reindex(range(B), fill_value=0) \
            .to_numpy(dtype=np.int64)
        tot_c = agg["tot"].reindex(range(B), fill_value=0) \
            .to_numpy(dtype=np.int64)
    T, A = float(tgt_c.sum()), float(tot_c.sum())
    lrq = np.round(1e6 * (np.log((tgt_c + 0.5) / (T + 0.5 * B))
                          - np.log((tot_c + 0.5) / (A + 0.5 * B)))
                   ).astype(np.int64)
    lr_ref = ray.put(lrq)

    def _score(batch: pd.DataFrame) -> pd.DataFrame:
        lr = _cached_get(lr_ref)
        rows, bs = _hash_words(batch[text_col])
        s = np.zeros(len(batch), dtype=np.int64)
        if len(bs):
            np.add.at(s, rows, lr[bs])
        return pd.DataFrame({
            id_col: batch[id_col].astype("int64"),
            "dsir_logweight": s.astype(np.float64) / 1e6})

    return docs.select_columns([id_col, text_col]) \
        .map_batches(_score, batch_format="pandas")
