"""Embedding-index entity linking — the scalable fallback behind the
alias dictionary.

The reference resolves near-miss vocabulary surfaces with
``difflib.get_close_matches`` (Biography/culturalForm.py:589-591,
and the same call shape in Biography/education.py,
Biography/occupation.py, Biography/birthDeath.py) — an O(|dict|)
Python scan per miss that
cannot leave one process. This stage replaces it with the
north-star's "shared alias-dictionary + embedding index" design: every
vocabulary label is embedded ONCE into a small dense index that
broadcasts to all workers, and miss surfaces are scored against it
with one integer matrix multiply per batch.

The embedding is a hashed character-trigram profile (the classic
feature-hashing string kernel): 64 int64 dims, bucket =
``md5(trigram) % 64`` — deterministic, model-free, and exactly
replayable in SQL, which keeps the operator inside the project's
oracle gate. Cosines are computed from the integer vectors with
correctly-rounded IEEE ops (``dot / (sqrt(na)·sqrt(nb))``), so numpy
and DuckDB agree bit for bit; the match decision is exact integer
arithmetic (``dot > 0 AND dot²·10⁴ ≥ τ₁₀₀²·na·nb``).

Scale shape: the index side is a vocabulary — dimension-table sized
by nature — broadcast once via ``ray.put``. The mention side streams:
per-batch DISTINCT miss surfaces ride one hash-bucket exchange (a
surface lives in exactly one bucket, so bucket-local dedup is global),
each bucket scores its surfaces against the broadcast index
vectorized, and only RESULT rows (one per distinct miss surface)
leave the exchange. Nothing corpus-sized reaches the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data as rd

from .dedup_docs import _cached_get, _gram_hash

DIM = 64


def trigram_matrix(surfaces) -> np.ndarray:
    """(n, DIM) int64 hashed char-trigram count matrix — overlapping
    3-char windows of the lowercased surface (spaces and punctuation
    included, exactly ``substr(lower(s), i, 3)`` in the SQL replay)."""
    M = np.zeros((len(surfaces), DIM), dtype=np.int64)
    for r, s in enumerate(surfaces):
        t = str(s).lower()
        for i in range(len(t) - 2):
            M[r, _gram_hash(t[i:i + 3]) % DIM] += 1
    return M


def build_label_index(labels: dict[str, str]
                      ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Index over ``{uri: label}``: URIs sorted for deterministic
    tie-breaks, trigram matrix, squared norms (0 → 1 so empty labels
    never divide by zero)."""
    uris = np.array(sorted(labels), dtype=object)
    M = trigram_matrix([labels[u] for u in uris])
    n2 = (M * M).sum(axis=1)
    n2[n2 == 0] = 1
    return uris, M, n2


def embed_link_misses(linked: rd.Dataset, labels: dict[str, str],
                      status_re: str = r"(cf|cod|occ)=(miss|fuzzy)",
                      surface_col: str = "term",
                      threshold: float = 0.7,
                      n_buckets: int = 32) -> rd.Dataset:
    """Score every DISTINCT vocabulary-miss surface against the
    broadcast label index; emit its best match.

    Returns (surface, best_uri, cosine, matched) — ``best_uri`` the
    argmax-cosine label (ties → lexicographically smaller URI),
    ``matched`` 1 iff the exact integer threshold test passes at
    ``threshold``. Surfaces shorter than 3 characters have no
    trigrams and are excluded (declared semantics, mirrored in SQL).
    """
    tau100 = int(round(threshold * 100))
    idx_ref = ray.put(build_label_index(labels))
    out_empty = pd.DataFrame({
        "surface": pd.Series([], dtype=object),
        "best_uri": pd.Series([], dtype=object),
        "cosine": pd.Series([], dtype="float64"),
        "matched": pd.Series([], dtype="int64")})

    def _miss_rows(batch: pd.DataFrame) -> pd.DataFrame:
        m = batch["link_status"].astype(str).str.contains(
            status_re, regex=True)
        s = batch.loc[m, surface_col].dropna()
        s = s[s.astype(str).str.len() >= 3].drop_duplicates()
        out = pd.DataFrame({"surface": s.astype(object)})
        out["sbucket"] = (pd.util.hash_pandas_object(
            out["surface"], index=False) % n_buckets).astype("int64")
        return out

    def _score_bucket(group: pd.DataFrame) -> pd.DataFrame:
        uris, VM, vn2 = _cached_get(idx_ref)
        surf = group["surface"].drop_duplicates().to_numpy()
        if not len(surf) or not len(uris):
            return out_empty
        M = trigram_matrix(surf)
        n2 = (M * M).sum(axis=1)
        n2[n2 == 0] = 1
        dots = M @ VM.T                              # int64 exact
        cos = dots.astype(np.float64) / (
            np.sqrt(n2.astype(np.float64))[:, None]
            * np.sqrt(vn2.astype(np.float64))[None, :])
        best = cos.argmax(axis=1)  # first (lexic. smallest uri) wins
        d = dots[np.arange(len(surf)), best]
        ok = (d > 0) & (d.astype(object) ** 2 * 10000
                        >= tau100 * tau100 * n2.astype(object)
                        * vn2[best].astype(object))
        return pd.DataFrame({
            "surface": surf,
            "best_uri": uris[best],
            "cosine": cos[np.arange(len(surf)), best],
            "matched": np.asarray(ok, dtype="int64")})

    return (linked.map_batches(_miss_rows, batch_format="pandas")
            .groupby("sbucket")
            .map_groups(_score_bucket, batch_format="pandas"))


def surface_clusters(linked: rd.Dataset, threshold: float = 0.7,
                     max_word_df: int = 64, n_buckets: int = 32
                     ) -> pd.DataFrame:
    """Union-find over candidate surface merges — the
    candidate-generation + merge stage of entity resolution the
    north star calls for, run on the mention SURFACES the linker saw
    (person + other slots): word-blocked candidate pairs, verified by
    hashed-trigram cosine, merged by connected components, each
    cluster canonicalized to its lexicographically smallest surface.

    Name-only evidence merges at SURNAME-FAMILY granularity
    ('D. Hargreaves' ~ 'W. Hargreaves') — exactly the grouping an
    alias-dictionary curation pass wants in front of a human; add
    context features (shared predicates, co-mentions) to split
    families. Returns (surface, canonical) for every surface in a
    non-trivial cluster, sorted.

    Scale shape: distinct surfaces ride one hash-bucket exchange
    (alias-vocabulary-bounded); word-blocking keys with document
    frequency > ``max_word_df`` are dropped (stop-key guard), the
    rest emit pairs inside their word bucket; pair dedup + the
    trigram-cosine verify run in a pair-bucket exchange (the match
    test is the exact integer ``dot²·10⁴ ≥ τ₁₀₀²·na·nb``); the
    merge itself is the distributed star-contraction components over
    md5-15 surface hashes, and only matched-pair/cluster rows —
    result-sized — reach the driver."""
    import re as _re

    from .dedup_docs import connected_components_ds

    tau100 = int(round(threshold * 100))
    word_re = _re.compile(r"[a-z0-9]{3,}")
    B = np.int64(n_buckets)

    def _surface_rows(batch: pd.DataFrame) -> pd.DataFrame:
        s = pd.concat([batch["person"].dropna(),
                       batch["other"].dropna()]).astype(str) \
            .drop_duplicates()
        out = pd.DataFrame({"s": s.astype(object)})
        out["sb"] = (pd.util.hash_pandas_object(
            out["s"], index=False) % B).astype("int64")
        return out

    surfaces = (linked.map_batches(_surface_rows,
                                   batch_format="pandas")
                .groupby("sb").map_groups(
                    lambda g: g[["s"]].drop_duplicates(),
                    batch_format="pandas"))

    def _word_rows(batch: pd.DataFrame) -> pd.DataFrame:
        ss, ws = [], []
        for s in batch["s"]:
            for w in set(word_re.findall(str(s).lower())):
                ss.append(s)
                ws.append(w)
        out = pd.DataFrame({"s": pd.Series(ss, dtype=object),
                            "w": pd.Series(ws, dtype=object)})
        out["wb"] = (pd.util.hash_pandas_object(
            out["w"], index=False) % B).astype("int64")
        return out

    def _block_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(["s", "w"])
        df_ = g.groupby("w")["s"].transform("size")
        g = g[df_ <= max_word_df].sort_values(["w", "s"],
                                              kind="stable")
        w = g["w"].to_numpy()
        s = g["s"].to_numpy()
        empty = pd.DataFrame({"a": pd.Series([], dtype=object),
                              "b": pd.Series([], dtype=object),
                              "pb": pd.Series([], dtype="int64")})
        if len(w) < 2:
            return empty
        starts = np.concatenate(
            [[0], np.flatnonzero(w[1:] != w[:-1]) + 1])
        cnt = np.diff(np.concatenate([starts, [len(w)]]))
        aa, bb = [], []
        for c in np.unique(cnt):
            if c < 2:
                continue
            runs = starts[cnt == c]
            ti, tj = np.triu_indices(int(c), k=1)
            aa.append(s[(runs[:, None] + ti[None, :]).ravel()])
            bb.append(s[(runs[:, None] + tj[None, :]).ravel()])
        if not aa:
            return empty
        a = np.concatenate(aa)
        b = np.concatenate(bb)
        out = pd.DataFrame({"a": a, "b": b})
        out["pb"] = (pd.util.hash_pandas_object(
            out["a"].astype(str) + "|" + out["b"].astype(str),
            index=False) % B).astype("int64")
        return out

    def _verify(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(["a", "b"])
        if not len(g):
            return pd.DataFrame({"a": pd.Series([], dtype=object),
                                 "b": pd.Series([], dtype=object)})
        A = trigram_matrix(g["a"].to_numpy())
        Bm = trigram_matrix(g["b"].to_numpy())
        na = (A * A).sum(axis=1)
        nb = (Bm * Bm).sum(axis=1)
        na[na == 0] = 1
        nb[nb == 0] = 1
        d = (A * Bm).sum(axis=1)
        ok = (d > 0) & (d.astype(object) ** 2 * 10000
                        >= tau100 * tau100
                        * na.astype(object) * nb.astype(object))
        keep = np.asarray(ok, dtype=bool)
        return g.loc[keep, ["a", "b"]]

    matched = (surfaces.map_batches(_word_rows,
                                    batch_format="pandas")
               .groupby("wb").map_groups(_block_pairs,
                                         batch_format="pandas")
               .groupby("pb").map_groups(_verify,
                                         batch_format="pandas")
               ).to_pandas()
    if not len(matched) or "a" not in matched.columns:
        return pd.DataFrame({"surface": pd.Series([], dtype=object),
                             "canonical": pd.Series([], dtype=object)})

    def _h15s(s: pd.Series) -> pd.Series:
        return s.map(lambda x: _gram_hash(str(x))).astype("int64")

    hmap = pd.concat([matched["a"], matched["b"]]) \
        .drop_duplicates().rename("s").to_frame()
    hmap["h"] = _h15s(hmap["s"])
    pairs_i = pd.DataFrame({"a": _h15s(matched["a"]),
                            "b": _h15s(matched["b"])})
    comp = connected_components_ds(
        rd.from_pandas(pairs_i)).to_pandas() \
        .rename(columns={"doc_id": "h", "component": "comp"})
    j = hmap.merge(comp, on="h")
    canon = j.groupby("comp")["s"].min().rename("canonical")
    out = j.merge(canon, left_on="comp", right_index=True)
    return (out[["s", "canonical"]]
            .rename(columns={"s": "surface"})
            .sort_values("surface", ignore_index=True))
