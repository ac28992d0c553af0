"""URL canonicalization + URL-level dedup (C4/RefinedWeb-style: one
document kept per canonical URL, so re-crawls and tracking-parameter
variants of one page never enter the training mix twice).

Scale shapes:
- canonicalization is a per-row pure function applied inside
  ``map_batches`` (urllib parse — cheap, no state, no shuffle);
- dedup reuses the exact-dedup combiner shape: per-batch (canonical,
  min id, count) partials into a hash-bucket groupby — URL strings are
  the only exchanged payload, never document bodies.
"""

from __future__ import annotations

from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

import pandas as pd
import ray.data as rd

#: query parameters stripped during canonicalization (tracking only —
#: never content-addressing parameters)
TRACKING_PARAMS = frozenset({
    "utm_source", "utm_medium", "utm_campaign", "utm_term",
    "utm_content", "gclid", "fbclid", "ref",
})

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def canonical_url(url: str) -> str:
    """One URL → its canonical form: lowercase scheme + host, default
    port dropped, fragment dropped, tracking params dropped (surviving
    params keep their order), trailing slash trimmed (except root)."""
    parts = urlsplit(str(url).strip())
    scheme = parts.scheme.lower()
    host = parts.hostname.lower() if parts.hostname else ""
    port = parts.port
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme):
        netloc = f"{host}:{port}"
    path = parts.path or "/"
    if len(path) > 1 and path.endswith("/"):
        path = path.rstrip("/")
    kept = [(k, v) for k, v in parse_qsl(parts.query, keep_blank_values=True)
            if k.lower() not in TRACKING_PARAMS]
    return urlunsplit((scheme, netloc, path, urlencode(kept), ""))


def canonicalize_batch(batch: pd.DataFrame,
                       url_col: str = "url") -> pd.DataFrame:
    """map_batches body: adds ``canonical_url``."""
    out = batch.copy()
    out["canonical_url"] = [canonical_url(u) for u in batch[url_col]]
    return out


def url_dedup(ds: rd.Dataset, url_col: str = "url",
              id_col: str = "doc_id", n_buckets: int = 64) -> rd.Dataset:
    """Keep the smallest ``id_col`` per canonical URL.

    Returns (canonical_url, doc_id=min id, n_dups=count)."""

    def _local(batch: pd.DataFrame) -> pd.DataFrame:
        canon = pd.Series([canonical_url(u) for u in batch[url_col]],
                          index=batch.index)
        g = (pd.DataFrame({"canonical_url": canon,
                           id_col: batch[id_col]})
             .groupby("canonical_url", as_index=False)
             .agg(**{id_col: (id_col, "min"),
                     "n_dups": (id_col, "size")}))
        g["bucket"] = (pd.util.hash_pandas_object(
            g["canonical_url"], index=False) % n_buckets).astype("int64")
        return g

    def _merge(group: pd.DataFrame) -> pd.DataFrame:
        return (group.groupby("canonical_url", as_index=False)
                .agg(**{id_col: (id_col, "min"),
                        "n_dups": ("n_dups", "sum")}))

    return (ds.map_batches(_local, batch_format="pandas")
            .groupby("bucket").map_groups(_merge, batch_format="pandas"))
