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

import re

import numpy as np
import pandas as pd

import ray
import ray.data as rd

from .dedup_docs import _gram_hash

_WORD = re.compile(r"[a-z0-9]+")

# PII patterns, applied (and counted) in THIS order — SSN first so the
# phone pattern can't eat an SSN tail. RE2-compatible (no backrefs, no
# lookarounds) so the DuckDB oracle runs the identical expressions.
PII_PATTERNS = [
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("phone", r"\b\d{3}-\d{4}\b", "[PHONE]"),
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
    out["repetition_ok"] = ((out["max_word_n"] * 5 < out["n_words_r"])
                            & (out["max_bigram_n"] * 10 < n_bigrams))
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
        bench = ray.get(bench_grams_ref)
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
