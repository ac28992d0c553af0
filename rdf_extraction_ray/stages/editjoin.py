"""Edit-distance-1 similarity self-join over the corpus vocabulary.

Typo/variant mining — the string-similarity complement of the token
dedup family: find every pair of vocabulary tokens whose Levenshtein
distance is EXACTLY 1 (one substitution, insertion or deletion),
without an all-pairs comparison and without any verification pass.

Deletion-neighborhood blocking (the FastSS scheme of Bocek et al.,
"Fast Similarity Search in Large Dictionaries", 2007), specialised to
distance 1 where it becomes EXACT rather than candidate-generating:

* substitution: two same-length tokens are at distance 1 iff they
  agree everywhere except one position i — i.e. iff they share the
  wildcard key ``tok[:i] + '\\x01' + tok[i+1:]`` for exactly one i.
* insertion/deletion: tokens at distance 1 with length L and L+1 are
  exactly the pairs where the short token equals some one-character
  deletion of the long one — i.e. the short token's IDENTITY key
  equals a deletion key of the long token.

Both match conditions are exact-string-equality on a derived key, so
the whole join is one hash-bucket exchange over (key, token) rows.
Per-key group sizes are alphabet-bounded (a wildcard key matches at
most |alphabet| tokens; a deletion key at most |alphabet|x(L+1)), so
pair emission inside a bucket can never blow up and needs no stop-key
guard. A pair is discoverable through exactly ONE key string (the
unique differing position for substitutions; the short token itself
for indels — repeated-character deletions that coincide produce the
SAME key string and are deduped group-locally), so buckets emit
globally distinct pairs and no second pair-dedup exchange exists.

The reference's fuzzy vocabulary matching motivates the operator
(cwrc/RDF-extraction Utils/utilities.py:618-636 falls back to
difflib get_close_matches against CSV vocabularies); this is the
scalable corpus-side analogue over the engine's own token vocabulary.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

# tokenization convention shared with the textstats family
# ([a-z0-9]+ over lowercased text) so the SQL oracle replays it
_WORD = r"[a-z0-9]+"
_WILD = "\x01"


def _pair_schema():
    import pyarrow as pa
    return pa.schema([("tok_a", pa.string()), ("tok_b", pa.string())])


_PAIR_SCHEMA = _pair_schema()


def token_vocab(docs: rd.Dataset, text_col: str = "text",
                min_count: int = 3, min_len: int = 4,
                max_len: int = 24, n_buckets: int = 64) -> rd.Dataset:
    """Corpus vocabulary as a Dataset of distinct ``token`` strings
    with total occurrence count >= ``min_count`` and length within
    [min_len, max_len]. Per-batch ``value_counts`` is the combiner
    (the exchange carries one (token, n) row per distinct token per
    batch, never one per occurrence); counts finish in a token-hash
    bucket groupby, where the frequency filter also applies — only
    vocabulary-sized data ever leaves a bucket."""
    import re as _re

    word = _re.compile(_WORD)

    def _local(batch: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter
        c: Counter = Counter()
        for t in batch[text_col]:
            c.update(w for w in word.findall(str(t).lower())
                     if min_len <= len(w) <= max_len)
        out = pd.DataFrame({"token": pd.Series(list(c.keys()),
                                               dtype=object),
                            "n": pd.Series(list(c.values()),
                                           dtype="int64")})
        out["tbucket"] = (pd.util.hash_pandas_object(
            out["token"], index=False) % n_buckets).astype("int64")
        return out

    def _finish(group: pd.DataFrame) -> pd.DataFrame:
        agg = group.groupby("token", sort=False)["n"].sum()
        keep = agg[agg >= min_count]
        return pd.DataFrame({"token": keep.index.to_numpy(dtype=object)})

    return (docs.map_batches(_local, batch_format="pandas")
            .groupby("tbucket")
            .map_groups(_finish, batch_format="pandas"))


def _emit_keys(batch: pd.DataFrame, max_len: int,
               n_buckets: int) -> pd.DataFrame:
    """(key, token, side) rows for one vocab batch: side 0 =
    substitution wildcard key, side 1 = identity key (short side of
    an indel pair), side 2 = deletion key (long side). Vectorized
    across tokens per position — the only Python loop is over the
    <= max_len character positions."""
    tok = batch["token"].astype(str)
    length = tok.str.len().to_numpy()
    keys, toks, sides = [], [], []

    def _add(k: pd.Series, t: pd.Series, side: int) -> None:
        keys.append(k.to_numpy(dtype=object))
        toks.append(t.to_numpy(dtype=object))
        sides.append(np.full(len(k), side, dtype=np.int8))

    _add(tok, tok, 1)  # identity key: short side of indel pairs
    for i in range(max_len):
        sub = tok[length > i]
        if not len(sub):
            break
        pre, post = sub.str[:i], sub.str[i + 1:]
        _add(pre + _WILD + post, sub, 0)   # substitution wildcard
        _add(pre + post, sub, 2)           # deletion key (long side)
    out = pd.DataFrame({
        "key": np.concatenate(keys),
        "token": np.concatenate(toks),
        "side": np.concatenate(sides)})
    out["kbucket"] = (pd.util.hash_pandas_object(
        out["key"], index=False) % n_buckets).astype("int64")
    return out


def _pairs_in_bucket(t) -> "pa.Table":
    """Emit (tok_a, tok_b) pairs bucket-locally: same-wildcard-key
    substitution pairs and identity-x-deletion indel pairs, both via
    vectorized self-merges on the exact key (group sizes are
    alphabet-bounded, see module docstring). drop_duplicates covers
    coinciding repeated-character deletion keys; cross-bucket
    duplicates cannot exist (one discovery key per pair). Typed
    Arrow out, so pairless buckets keep the schema."""
    import pyarrow as pa

    group = t.to_pandas()
    outs = []
    sub = group[group["side"] == 0]
    if len(sub):
        m = sub.merge(sub, on="key")
        m = m[m["token_x"] < m["token_y"]]
        outs.append(m[["token_x", "token_y"]])
    short = group[group["side"] == 1]
    long_ = group[group["side"] == 2]
    if len(short) and len(long_):
        m = short.merge(long_, on="key")
        outs.append(pd.DataFrame({
            "token_x": np.minimum(m["token_x"], m["token_y"]),
            "token_y": np.maximum(m["token_x"], m["token_y"])}))
    out = (pd.concat(outs, ignore_index=True)
           .drop_duplicates(ignore_index=True)
           .rename(columns={"token_x": "tok_a", "token_y": "tok_b"})
           if outs else pd.DataFrame({"tok_a": [], "tok_b": []}))
    return pa.Table.from_pandas(
        out, schema=_PAIR_SCHEMA,
        preserve_index=False).replace_schema_metadata(None)


def edit1_token_pairs(docs: rd.Dataset, text_col: str = "text",
                      min_count: int = 3, min_len: int = 4,
                      max_len: int = 24,
                      n_buckets: int = 64) -> rd.Dataset:
    """All vocabulary token pairs at Levenshtein distance EXACTLY 1
    (tok_a < tok_b lexicographically), via exact deletion-neighborhood
    blocking: vocab build (one token-hash exchange) -> per-token key
    emission (~2xlen+1 rows each, streamed) -> ONE key-hash bucket
    exchange -> alphabet-bounded in-bucket merges. No all-pairs stage,
    no verification pass, no pair-dedup exchange."""
    vocab = token_vocab(docs, text_col, min_count=min_count,
                        min_len=min_len, max_len=max_len,
                        n_buckets=n_buckets)
    keyed = vocab.map_batches(
        lambda b: _emit_keys(b, max_len, n_buckets),
        batch_format="pandas")
    # typed empty seed: a pairless corpus keeps the (tok_a, tok_b)
    # schema instead of collapsing to a column-less dataset
    return rd.from_arrow(_PAIR_SCHEMA.empty_table()).union(
        keyed.groupby("kbucket")
        .map_groups(_pairs_in_bucket, batch_format="pyarrow"))
