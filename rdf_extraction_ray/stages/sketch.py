"""Mergeable distinct-count sketches (KMV / k-minimum-values).

The reference engine has no sketches (it counts small vocabularies in
RAM, e.g. the title census in ``Utils/utilities.py``); at 100 TB the
cardinality questions it answers exactly become sketch territory.
KMV (Bar-Yossef et al. 2002, "Counting distinct elements in a data
stream") is the primary sketch because it is INTEGER-EXACT and fully
SQL-replayable: the sketch state is literally "the k smallest
distinct md5-15 hashes", an ``ORDER BY h LIMIT k`` in DuckDB, and the
estimator is one integer floor division, so the oracle reproduces the
Ray result bit-for-bit. :func:`hll_distinct` adds HyperLogLog with
the SAME property: its leading-zero registers and power sum are
carried as exact int64s (``rho`` via bit length, the sum as
``Σ 2^(R-M_j)``), so the register table and estimator input are also
SQL-replayable; only the final one-line float estimate is derived —
identically on both sides — from that exact integer.

Scale shape:
- per-BLOCK combiner: local distinct tokens → md5-15 int64 hashes →
  ``np.unique`` → k smallest. The exchange/driver never sees more
  than k rows per block regardless of block size;
- bounded driver merge: blocks × k int64 rows (1024 × 8 B per block),
  the same bounded-partial pattern as the engine's top-k and ANN
  merges — no full-vocabulary structure anywhere;
- estimator (all Python ints, no float, no int64 overflow):
  ``est = ((k-1) << 60) // h_k`` where ``h_k`` is the k-th smallest
  distinct hash over the 2^60 md5-15 space; when fewer than k
  distinct hashes exist the sketch has seen everything and the count
  is exact. Standard error ~ 1/sqrt(k-2) ≈ 3.1% at k=1024.

Tokenization is the engine-wide ``[a-z0-9]+``-over-lowercase
convention (SQL: ``regexp_extract_all(lower(text), '[a-z0-9]+')``);
distinctness is over the HASH (a ~1e-9 md5-15 collision merges two
tokens in Ray and in SQL identically).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .graph import _h15

HASH_SPACE_BITS = 60  # md5-15-hex → [0, 2^60)


def _kmv_estimate(ds, local_kmin, k: int) -> pd.DataFrame:
    """Shared KMV finish: bounded driver merge of per-block k-min
    partials (≤ k int64 rows per block) + the integer estimator."""
    parts = [b["h"] for b in ds.map_batches(
        local_kmin, batch_format="pandas", batch_size=None)
        .iter_batches(batch_format="numpy", batch_size=None)]
    merged = (np.unique(np.concatenate(parts))
              if parts else np.empty(0, dtype=np.int64))
    sketch = merged[:k]

    n_sketch = int(len(sketch))
    if n_sketch == 0:
        est, kth = 0, 0
    elif n_sketch < k:
        est, kth = n_sketch, 0   # unsaturated: count is exact
    else:
        kth = int(sketch[-1])
        est = ((k - 1) << HASH_SPACE_BITS) // kth
    return pd.DataFrame({
        "est_distinct": pd.array([est], dtype="int64"),
        "kth_min_hash": pd.array([kth], dtype="int64"),
        "n_sketch": pd.array([n_sketch], dtype="int64")})


def kmv_distinct(ds, col: str, k: int = 1024) -> pd.DataFrame:
    """KMV distinct-count sketch of one column (any dtype; values are
    hashed via md5 of their string form, SQL
    ``md5(CAST(col AS VARCHAR))``).

    Returns ONE row: ``est_distinct`` (the KMV estimate — exact when
    the column has fewer than ``k`` distinct hashes),
    ``kth_min_hash`` (the sketch's threshold hash; 0 while the sketch
    is unsaturated) and ``n_sketch`` (hashes retained, ≤ k) — all
    int64, deterministic, and replayed bit-for-bit by the DuckDB
    oracle.
    """
    kk = int(k)

    def _local_kmin(batch: pd.DataFrame) -> pd.DataFrame:
        vals = batch[col].dropna().astype(str).drop_duplicates()
        if not len(vals):
            return pd.DataFrame({"h": pd.array([], dtype="int64")})
        h = np.unique(_h15(vals))
        return pd.DataFrame({"h": h[:kk]})

    return _kmv_estimate(ds, _local_kmin, kk)


def kmv_distinct_tokens(docs, k: int = 1024,
                        text_col: str = "text") -> pd.DataFrame:
    """KMV distinct-TOKEN-count sketch over a document Dataset — the
    approximate twin of ``textstats.distinct_tokens``. Same contract
    as :func:`kmv_distinct`.
    """
    import re as _re

    word = _re.compile(r"[a-z0-9]+")
    kk = int(k)

    def _local_kmin(batch: pd.DataFrame) -> pd.DataFrame:
        s: set = set()
        for t in batch[text_col]:
            s.update(word.findall(str(t).lower()))
        if not s:
            return pd.DataFrame({"h": pd.array([], dtype="int64")})
        h = np.unique(_h15(pd.Series(sorted(s))))
        return pd.DataFrame({"h": h[:kk]})

    return _kmv_estimate(docs, _local_kmin, kk)


def cms_token_counts(docs, probes: list[str], d: int = 4,
                     w: int = 1024,
                     text_col: str = "text") -> pd.DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005, "An improved
    data stream summary: the count-min sketch and its applications")
    over the corpus TOKEN FREQUENCY distribution — the frequency
    sibling of the KMV/HLL cardinality sketches, and like them
    INTEGER-EXACT and fully SQL-replayable: every counter is the
    exact int64 occurrence count of the tokens hashing into its cell
    (``('0x' || substr(md5(r || '|' || token), 1, 15))::BIGINT % w``
    in DuckDB), and the estimate for a probe token is the exact
    integer MIN over its ``d`` cells — a one-sided overestimate
    (``n_cms >= n_exact`` always; equality when no collision lands in
    the probe's lightest cell).

    Scale shape (the same bounded-partial pattern as HLL): the
    per-batch combiner tokenizes (engine-wide ``[a-z0-9]+`` over
    lowercase), counts locally, hashes only the batch's DISTINCT
    tokens ``d`` times with a row-salted md5-15, and accumulates into
    a local sparse (row, cell, count) partial of ≤ d×w rows
    regardless of batch size; the driver merge is bounded by
    d × w × blocks int64 rows and the finished sketch is one d×w
    int64 matrix. Probing is a driver-side array lookup.

    Returns one row per probe token (input order): ``token``,
    ``n_cms`` (int64 min-over-rows estimate).
    """
    import re as _re

    word = _re.compile(r"[a-z0-9]+")
    dd, ww = int(d), int(w)

    def _cells(tokens: pd.Series) -> np.ndarray:
        """(len(tokens), d) int64 cell indices, row-salted md5-15."""
        return np.stack(
            [_h15(pd.Series([f"{r}|{t}" for t in tokens])) % ww
             for r in range(dd)], axis=1)

    def _local(batch: pd.DataFrame) -> pd.DataFrame:
        toks: list = []
        for t in batch[text_col]:
            toks.extend(word.findall(str(t).lower()))
        if not toks:
            return pd.DataFrame({
                "r": pd.array([], dtype="int64"),
                "c": pd.array([], dtype="int64"),
                "cnt": pd.array([], dtype="int64")})
        vc = pd.Series(toks).value_counts()
        cells = _cells(vc.index)              # (n_distinct, d)
        cnt = vc.to_numpy()
        m = np.zeros((dd, ww), dtype=np.int64)
        for r in range(dd):
            np.add.at(m[r], cells[:, r], cnt)
        r_idx, c_idx = np.nonzero(m)
        return pd.DataFrame({"r": r_idx.astype(np.int64),
                             "c": c_idx.astype(np.int64),
                             "cnt": m[r_idx, c_idx]})

    sketch = np.zeros((dd, ww), dtype=np.int64)
    for b in docs.map_batches(_local, batch_format="pandas",
                              batch_size=None).iter_batches(
                                  batch_format="numpy",
                                  batch_size=None):
        if len(b["r"]):
            np.add.at(sketch, (b["r"], b["c"]), b["cnt"])

    probe_list = [str(t) for t in probes]
    if probe_list:
        pc = _cells(pd.Series(probe_list))    # (n_probes, d)
        est = np.min(
            np.stack([sketch[r, pc[:, r]] for r in range(dd)],
                     axis=1), axis=1)
    else:
        est = np.empty(0, dtype=np.int64)
    return pd.DataFrame({
        "token": pd.Series(probe_list, dtype=object),
        "n_cms": pd.array(est, dtype="int64")})


def hll_distinct(ds, col: str, b: int = 10) -> pd.DataFrame:
    """See the full docstring below ``_HLL_B_BOUNDS``."""
    if not 7 <= b <= 16:
        # b <= 6: rem has > 53 bits, so the float64 frexp bit-length
        # trick rounds near powers of two AND the alpha constant
        # 0.7213/(1+1.079/m) only holds for m >= 128 (b >= 7);
        # b > 16 wastes registers beyond any md5-15 use here
        raise ValueError(
            f"hll_distinct needs 7 <= b <= 16 (got {b}): smaller b "
            "leaves a remainder wider than float64's exact-integer "
            "range and invalidates the alpha_m constant")
    return _hll_distinct_impl(ds, col, b)


def _hll_distinct_impl(ds, col: str, b: int) -> pd.DataFrame:
    """HyperLogLog distinct-count sketch (Flajolet et al. 2007,
    "HyperLogLog: the analysis of a near-optimal cardinality
    estimation algorithm") with INTEGER-EXACT registers, the KMV
    sketch's register-based sibling.

    The md5-15 hash splits into a top-``b``-bit bucket and a
    ``60-b``-bit remainder; the register is the leading-zero rank
    ``rho = R - bit_length(rem)`` with ``R = 60-b+1`` (``rem == 0``
    → ``R``). Every piece of sketch state is an int64, and the
    estimator input is the EXACT integer power sum
    ``s_int = Σ_j 2^(R - M_j)`` over all ``m = 2^b`` buckets
    (``M_j = 0`` for empty buckets; max ``m·2^R = 2^61`` at b=10,
    no overflow) — so a DuckDB oracle replays bucket, register and
    ``s_int`` bit-for-bit (``rho`` via ``length(bin(rem))``, the
    binary-string bit length). The float estimate derives from that
    exact integer with one textual formula on both sides: raw HLL
    ``alpha_m · m² · 2^R / s_int``, with the standard small-range
    linear-counting correction ``m · ln(m / V)`` (V = empty buckets)
    when the raw estimate ≤ 2.5·m, rounded half-up.

    Scale shape (same bounded-partial pattern as KMV): per-block
    combiner reduces a block to ≤ m (bucket, max rho) int64 rows;
    the driver merge is bounded by m × blocks. Returns ONE row:
    ``m``, ``n_buckets`` (non-empty), ``s_int``, ``est_distinct``.
    Standard error ≈ 1.04/sqrt(m) ≈ 3.3% at b=10.
    """
    import math

    bb = int(b)
    m = 1 << bb
    rem_bits = HASH_SPACE_BITS - bb
    R = rem_bits + 1

    def _local_regs(batch: pd.DataFrame) -> pd.DataFrame:
        vals = batch[col].dropna().astype(str).drop_duplicates()
        if not len(vals):
            return pd.DataFrame({
                "bucket": pd.array([], dtype="int64"),
                "rho": pd.array([], dtype="int64")})
        h = _h15(vals)
        bucket = h >> rem_bits
        rem = h & ((np.int64(1) << rem_bits) - 1)
        # exact bit_length: frexp's exponent (rem < 2^53 converts to
        # float64 losslessly)
        bl = np.frexp(rem.astype("float64"))[1]
        rho = np.where(rem > 0, R - bl, R).astype("int64")
        return (pd.DataFrame({"bucket": bucket, "rho": rho})
                .groupby("bucket", as_index=False)["rho"].max())

    parts = [pd.DataFrame(p) for p in ds.map_batches(
        _local_regs, batch_format="pandas", batch_size=None)
        .iter_batches(batch_format="pandas", batch_size=None)]
    merged = (pd.concat(parts, ignore_index=True) if parts
              else pd.DataFrame({"bucket": pd.array([], dtype="int64"),
                                 "rho": pd.array([], dtype="int64")}))
    regs = (merged.groupby("bucket")["rho"].max().to_numpy()
            if len(merged) else np.empty(0, dtype="int64"))
    present = int(len(regs))
    s_used = sum(1 << (R - int(r)) for r in regs)  # python ints, exact
    s_int = int(s_used + (m - present) * (1 << R))
    alpha = 0.7213 / (1 + 1.079 / m)
    raw = alpha * m * m * float(1 << R) / float(s_int)
    v_empty = m - present
    if raw <= 2.5 * m and v_empty > 0:
        est = int(math.floor(m * math.log(m / v_empty) + 0.5))
    else:
        est = int(math.floor(raw + 0.5))
    return pd.DataFrame({
        "m": pd.array([m], dtype="int64"),
        "n_buckets": pd.array([present], dtype="int64"),
        "s_int": pd.array([s_int], dtype="int64"),
        "est_distinct": pd.array([est], dtype="int64")})
