"""Corpus-level aggregate side-channels (SURVEY §2.6 A2-A8).

Each reference report (global mutable counters, sorted dict dumps)
becomes a partial-aggregate + small groupby:

- A2 triples per conversation min/max/avg
- A3 mapping hit/miss histogram (also embedded in shard manifests)
- A4 org mention counts
- A6 title census (normalized title → count + doc list)
"""

from __future__ import annotations

import pandas as pd
import ray.data as rd


def triples_per_conv_stats(triples: rd.Dataset) -> pd.DataFrame:
    """min/max/avg triples per conversation
    (reference bio_extraction.py:84-90).

    Two-level: per-batch value_counts (tiny) → hash-bucket groupby
    with a pandas sum per bucket — the exchange moves per-batch
    partials keyed on a small int, never a string-keyed shuffle of
    the triple table."""

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["conv_id"].value_counts()
        out = pd.DataFrame({"conv_id": vc.index, "n": vc.to_numpy()})
        out["bucket"] = (pd.util.hash_pandas_object(out["conv_id"],
                                                    index=False)
                         % 32).astype("int32")
        return out

    def _merge(group: pd.DataFrame) -> pd.DataFrame:
        g = group.groupby("conv_id", as_index=False)["n"].sum()
        return pd.DataFrame([{
            "min_n": int(g["n"].min()), "max_n": int(g["n"].max()),
            "sum_n": int(g["n"].sum()), "cnt": int(len(g)),
        }])

    parts = (triples.map_batches(_partial, batch_format="pandas")
             .groupby("bucket").map_groups(_merge, batch_format="pandas")
             .to_pandas())
    return pd.DataFrame([{
        "min_triples": int(parts["min_n"].min()),
        "max_triples": int(parts["max_n"].max()),
        "avg_triples": float(parts["sum_n"].sum() / parts["cnt"].sum()),
    }])


def link_status_histogram(linked_facts: rd.Dataset) -> pd.DataFrame:
    """Mapping hit/miss counts (reference fail_dict reports,
    culturalForm.py:607-638) — partial per batch, then a tiny sum."""

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        st = df["link_status"].str.split(";").explode()
        st = st[st.notna() & (st != "")]
        vc = st.value_counts()
        return pd.DataFrame({"status": vc.index, "n": vc.to_numpy()})

    partials = linked_facts.map_batches(_partial,
                                        batch_format="pandas").to_pandas()
    if not len(partials):
        return pd.DataFrame(columns=["status", "n"])
    out = (partials.groupby("status", as_index=False)["n"].sum()
           .sort_values("n", ascending=False, ignore_index=True))
    return out


def org_mention_counts(linked_facts: rd.Dataset) -> pd.DataFrame:
    """Org occurrence counts, sorted desc (reference ORG_MAP report,
    organizations.py:78-96)."""

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        sub = df[df["org_uri"].notna()]
        vc = sub["org_uri"].value_counts()
        return pd.DataFrame({"org_uri": vc.index, "n": vc.to_numpy()})

    partials = linked_facts.map_batches(_partial,
                                        batch_format="pandas").to_pandas()
    if not len(partials):
        return pd.DataFrame(columns=["org_uri", "n"])
    return (partials.groupby("org_uri", as_index=False)["n"].sum()
            .sort_values(["n", "org_uri"], ascending=[False, True],
                         ignore_index=True))


def unmatched_places(linked_facts: rd.Dataset) -> pd.DataFrame:
    """Gazetteer-miss place surfaces with counts, sorted desc — the
    reference's unmapped-place side output (place.py:100-113,
    modsBib.py:1405-1408)."""

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        miss = df[df["place"].notna() & df["place_uri"].isna()]
        if not len(miss):
            return pd.DataFrame(columns=["place", "n"])
        vc = miss["place"].value_counts()
        return pd.DataFrame({"place": vc.index, "n": vc.to_numpy()})

    partials = linked_facts.map_batches(_partial,
                                        batch_format="pandas").to_pandas()
    if not len(partials):
        return pd.DataFrame(columns=["place", "n"])
    return (partials.groupby("place", as_index=False)["n"].sum()
            .sort_values(["n", "place"], ascending=[False, True],
                         ignore_index=True))


def vocab_terms_used(linked_facts: rd.Dataset) -> pd.DataFrame:
    """Distinct vocabulary URIs actually used, joined to their English
    labels — the reference's used-genre label lookup + review-terms
    join (modsBib.py:1392-1403, reviewTerms.py:35-63). Broadcast map
    join: the label table ships once, the distinct set is tiny."""
    from ..state.fixtures import vocab_labels

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        used = df.loc[df["term_uri"].notna(), "term_uri"].unique()
        return pd.DataFrame({"term_uri": used})

    partials = linked_facts.map_batches(_partial,
                                        batch_format="pandas").to_pandas()
    if not len(partials):
        return pd.DataFrame(columns=["term_uri", "label"])
    labels = vocab_labels()
    out = (partials.drop_duplicates("term_uri")
           .sort_values("term_uri", ignore_index=True))
    out["label"] = out["term_uri"].map(labels)
    return out


def title_census(facts: rd.Dataset) -> pd.DataFrame:
    """Normalized-title census: count + sorted distinct conv list
    (reference titles/readFiles.py:151-201)."""

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        sub = df[df["fact_type"] == "title"]
        if not len(sub):
            return pd.DataFrame(columns=["title_norm", "n", "convs"])
        t = sub["title"].str.lower().str.strip()
        g = (pd.DataFrame({"title_norm": t, "conv_id": sub["conv_id"]})
             .groupby("title_norm")
             .agg(n=("conv_id", "size"),
                  convs=("conv_id", lambda s: sorted(set(s)))))
        return g.reset_index()

    partials = facts.map_batches(_partial, batch_format="pandas").to_pandas()
    if not len(partials):
        return pd.DataFrame(columns=["title_norm", "n", "convs"])
    out = (partials.groupby("title_norm")
           .agg(n=("n", "sum"),
                convs=("convs", lambda lists: sorted(
                    {c for l in lists for c in l})))
           .reset_index()
           .sort_values(["n", "title_norm"], ascending=[False, True],
                        ignore_index=True))
    return out
