"""Full-text retrieval over the document corpus: BM25 top-k.

The reference engine has no retrieval (it queries its output graph via
SPARQL); a training-data pipeline needs corpus search for targeted
inspection ("show me the docs most about X") and for building
retrieval eval sets. BM25 (Robertson & Zaragoza 2009; the Lucene
variant: ``idf = ln((N - df + 0.5)/(df + 0.5) + 1)``) is implemented
as two bounded passes — never an inverted index materialization:

Scale shape:
- pass 1 (combiner aggregate): per-block partials of (n_docs,
  total_tokens, df per query term). The driver merge is Q+2 numbers
  per block for a Q-term query;
- pass 2: broadcast the tiny stats; per-block vectorized scoring of
  the query terms only + a per-block top-k partial; driver merges
  blocks × k rows.

Determinism / oracle parity: scores are float64 computed with the
IDENTICAL expression DuckDB evaluates (same literals, ≤Q-term sums),
output is rounded to 4 decimals and ordered by (rounded score DESC,
doc_id) on BOTH sides, so a 1-ulp libm divergence cannot reorder the
result except at a ~1e-15-wide rounding boundary.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

_WORD = re.compile(r"[a-z0-9]+")


def bm25_topk(docs, query: str, k: int = 10,
              text_col: str = "text",
              id_col: str = "doc_id") -> pd.DataFrame:
    """Top-``k`` documents for ``query`` under BM25 (k1=1.2, b=0.75).

    Returns (doc_id, score) with score rounded to 4 decimals, ordered
    by (score DESC, doc_id) — bit-matched by the DuckDB oracle.
    """
    terms = sorted(set(_WORD.findall(query.lower())))
    if not terms:
        return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                             "score": pd.Series(dtype="float64")})
    t_ix = {t: i for i, t in enumerate(terms)}
    nq = len(terms)

    def _stats_partial(batch: pd.DataFrame) -> pd.DataFrame:
        n_docs, n_tok = 0, 0
        df_c = np.zeros(nq, dtype=np.int64)
        for t in batch[text_col]:
            ws = _WORD.findall(str(t).lower())
            n_docs += 1
            n_tok += len(ws)
            seen = set(ws)
            for q, i in t_ix.items():
                if q in seen:
                    df_c[i] += 1
        return pd.DataFrame({"n_docs": np.int64(n_docs),
                             "n_tok": np.int64(n_tok),
                             "term": terms, "df": df_c})

    parts = (docs.map_batches(_stats_partial, batch_format="pandas",
                              batch_size=None).to_pandas())
    if not len(parts):
        return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                             "score": pd.Series(dtype="float64")})
    # every block partial carries its (n_docs, n_tok) once per term
    # row — sum them from one representative term's rows
    head = parts[parts["term"] == terms[0]]
    n = float(head["n_docs"].sum())
    avgdl = (float(head["n_tok"].sum()) / n) if n else 0.0
    df_tot = parts.groupby("term")["df"].sum()
    idf = {t: float(np.log((n - float(df_tot[t]) + 0.5)
                           / (float(df_tot[t]) + 0.5) + 1.0))
           for t in terms}

    def _score_topk(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].to_numpy(dtype="int64")
        score = np.zeros(len(batch), dtype=np.float64)
        tfm = np.zeros((len(batch), nq), dtype=np.float64)
        dl = np.zeros(len(batch), dtype=np.float64)
        for r, t in enumerate(batch[text_col]):
            ws = _WORD.findall(str(t).lower())
            dl[r] = len(ws)
            for w in ws:
                i = t_ix.get(w)
                if i is not None:
                    tfm[r, i] += 1.0
        denom_norm = 1.2 * (0.25 + 0.75 * dl / avgdl) if avgdl \
            else np.full(len(batch), np.inf)
        for t, i in t_ix.items():
            tf = tfm[:, i]
            with np.errstate(invalid="ignore"):
                s = idf[t] * (tf * 2.2) / (tf + denom_norm)
            score += np.where(tf > 0, s, 0.0)
        out = pd.DataFrame({id_col: ids, "score": score})
        out = out[out["score"] > 0]
        out["score"] = out["score"].round(4)
        return (out.sort_values(["score", id_col],
                                ascending=[False, True], kind="stable")
                .head(k))

    merged = (docs.map_batches(_score_topk, batch_format="pandas",
                               batch_size=None).to_pandas())
    return (merged.sort_values(["score", id_col],
                               ascending=[False, True], kind="stable")
            .head(k).reset_index(drop=True)
            .astype({id_col: "int64", "score": "float64"}))
