"""Entity linking & canonicalization — the stateful actor-pool stage.

Rebuilds the reference's broadcast-dictionary joins (SURVEY §2.5
J1-J7): person alias → canonical URI (``Utils/utilities.py:289-360``),
place gazetteer (``Utils/place.py:116-157``), org authority
(``Utils/organizations.py:56-83``), and the vocab term maps with the
exact → cleaned/stemmed → miss ladder.

Fuzzy matching parity: in the reference the vocab mappers'
``difflib.get_close_matches`` calls are DIAGNOSTIC-ONLY — a near-miss
is logged but the raw value is still emitted as a literal
(``culturalForm.py:589-591``); only modsBib's place mapper substitutes
fuzzily (``fuzz.ratio >= 95``, ``Mods/modsBib.py:89``). The linker
mirrors that: a close match yields status ``<kind>=fuzzy`` (feeding the
hit/miss histograms) but NO vocab URI, so templating emits the raw
literal. ``fuzzy_substitute=True`` opts into substitution for
modsBib-style pipelines.

Used as ``facts.map_batches(EntityLinker, concurrency=N,
batch_format="pandas")`` — dictionaries are built ONCE per actor in
``__init__`` (the reference loads them once per process at import
time); the fuzzy matcher memoizes per actor. URI minting is
deterministic (same surface → same URI on every actor), which replaces
the reference's in-RAM dedup caches (J11).

``__call__`` is fully vectorized: every slot is a ``Series.map``
against the broadcast dict, with Python only on the UNIQUE surfaces of
a batch (cleaning, minting, fuzzy diagnostics) — never per row.

Adds columns: ``person_uri, other_uri, place_uri, place2_uri,
term_uri, org_uri, person_sex, link_status`` (a compact
``slot=outcome`` summary feeding the hit/miss histograms, §2.6 A3).
"""

from __future__ import annotations

from difflib import get_close_matches

import numpy as np
import pandas as pd

from ..functions.text import clean_term, clean_term_stemmed, make_standard_uri
from ..state.fixtures import WRITERS, build_linker_maps

LINKED_COLUMNS = ["person_uri", "other_uri", "place_uri", "place2_uri",
                  "term_uri", "org_uri", "person_sex", "link_status"]

_FUZZY_CUTOFF = 0.8  # difflib default-ish; reference logs at this band


def _map_unique(series: pd.Series, fn) -> pd.Series:
    """Apply ``fn`` once per UNIQUE non-null value of ``series`` —
    batch-level memoization for the scalar cleanup/minting functions."""
    uniq = pd.unique(series.dropna())
    return series.map({u: fn(u) for u in uniq})


class EntityLinker:
    """Callable class for an actor-pool ``map_batches`` stage."""

    def __init__(self, maps: dict | None = None,
                 fuzzy_substitute: bool = False):
        m = maps or build_linker_maps()
        self.people: dict[str, str] = m["people"]
        self.places: dict[str, str] = m["places"]
        self.orgs: dict[str, str] = m["orgs"]
        self.occupations: dict[str, str] = m["occupations"]
        self.causes: dict[str, str] = m["causes"]
        self.cultural_forms: dict[str, dict[str, str]] = m["cultural_forms"]
        self.degrees: dict[str, str] = m["degrees"]
        # honor an injected writers table: build_linker_maps ships a
        # 'writers' key for exactly this, and reading the module
        # global here silently gave every custom corpus person_sex
        # NaN (which the sex-conditional family templating resolves
        # to the wrong inverse predicate)
        self.writers = m.get("writers", WRITERS)
        self._sex_by_uri = {u: t[1] for u, t in self.writers.items()}
        self.fuzzy_substitute = fuzzy_substitute
        # per-actor memo for the fuzzy diagnostic (SURVEY §7.5.4)
        self._fuzzy_memo: dict[tuple[str, str], str | None] = {}

    # ------------------------------------------------------------ lookups

    def link_person(self, surface: str | None) -> tuple[str | None, str]:
        """Alias dict hit → canonical URI; miss → deterministic
        standard-name URI (reference ``get_name_uri`` fallback)."""
        if surface is None:
            return None, ""
        hit = self.people.get(surface)
        if hit is not None:
            return hit, "person=linked"
        return make_standard_uri(surface), "person=minted"

    def link_place(self, surface: str | None) -> tuple[str | None, str]:
        """``"Settlement, Region"`` → gazetteer URI; miss → None (the
        reference drops unmapped Places and counts the miss)."""
        if surface is None:
            return None, ""
        hit = self.places.get(clean_term(surface))
        if hit is not None:
            return hit, "place=linked"
        return None, "place=miss"

    def link_org(self, surface: str | None) -> tuple[str | None, str]:
        if surface is None:
            return None, ""
        hit = self.orgs.get(clean_term(surface))
        if hit is not None:
            return hit, "org=linked"
        return make_standard_uri(surface + " ORG"), "org=minted"

    def _fuzzy_lookup(self, table: dict[str, str], kind: str,
                      key: str) -> str | None:
        """Memoized ``get_close_matches`` probe; returns the close
        match's URI or None. ``kind`` must identify the TABLE, not
        just the fact family — the cultural-form categories each have
        their own vocabulary, and a shared 'cf' memo would let one
        category's miss (or worse, with substitution on, one
        category's URI) poison another's lookups order-dependently."""
        memo_key = (kind, key)
        if memo_key not in self._fuzzy_memo:
            if len(self._fuzzy_memo) > 100_000:
                # free-text miss surfaces are unbounded on a
                # long-lived actor; cap the memo like the gram memo
                self._fuzzy_memo.clear()
            close = get_close_matches(key, table.keys(), n=1,
                                      cutoff=_FUZZY_CUTOFF)
            self._fuzzy_memo[memo_key] = table[close[0]] if close else None
        return self._fuzzy_memo[memo_key]

    def _vocab(self, table: dict[str, str], key: str,
               kind: str, memo_kind: str | None = None
               ) -> tuple[str | None, str]:
        """exact (cleaned) → fuzzy-diagnostic → miss ladder.
        ``memo_kind`` qualifies the fuzzy memo when several tables
        share one status ``kind`` (the cultural-form categories)."""
        hit = table.get(key)
        if hit is not None:
            return hit, f"{kind}=linked"
        close_hit = self._fuzzy_lookup(table, memo_kind or kind, key)
        if close_hit is None:
            return None, f"{kind}=miss"
        if self.fuzzy_substitute:
            return close_hit, f"{kind}=fuzzy"
        return None, f"{kind}=fuzzy"  # diagnostic only: literal downstream

    def link_term(self, fact_type: str, category: str | None,
                  surface: str | None) -> tuple[str | None, str]:
        """Route a term surface to its vocabulary."""
        if surface is None:
            return None, ""
        if fact_type == "occupation":
            return self._vocab(self.occupations, clean_term(surface), "occ")
        if fact_type == "death":
            return self._vocab(self.causes, clean_term(surface), "cod")
        if fact_type == "culturalform":
            table = self.cultural_forms.get(category or "", {})
            return self._vocab(table, clean_term_stemmed(surface), "cf",
                               memo_kind=f"cf:{category or ''}")
        if fact_type == "education" and category == "degree":
            return self._vocab(self.degrees, clean_term(surface), "edu")
        return None, ""

    # ------------------------------------------------------ vector ladder

    def _vocab_series(self, table: dict[str, str], keys: pd.Series,
                      kind: str, memo_kind: str | None = None
                      ) -> tuple[pd.Series, pd.Series]:
        """Vectorized ``_vocab``: dict map for the exact rung, Python
        only on unique misses (fuzzy diagnostic, memoized per actor)."""
        hit = keys.map(table)
        status = pd.Series(
            np.where(hit.notna(), f"{kind}=linked", ""), index=keys.index)
        miss = hit.isna()
        if miss.any():
            mk = keys[miss]
            mkind = memo_kind or kind
            close = mk.map({k: self._fuzzy_lookup(table, mkind, k)
                            for k in pd.unique(mk)})
            status[miss] = np.where(close.notna(), f"{kind}=fuzzy",
                                    f"{kind}=miss")
            if self.fuzzy_substitute:
                hit[miss] = close
        return hit, status

    def _mint_series(self, surfaces: pd.Series, slot: str,
                     table: dict, mint, keyfn=None
                     ) -> tuple[pd.Series, pd.Series]:
        """Shared dict-hit-else-mint slot linker: lookup (optionally
        through a cleaned key), mint deterministically on miss, and
        report linked/minted status."""
        keys = (_map_unique(surfaces, keyfn) if keyfn is not None
                else surfaces)
        hit = keys.map(table)
        mint_mask = surfaces.notna() & hit.isna()
        uri = hit.copy()
        if mint_mask.any():
            uri[mint_mask] = _map_unique(surfaces[mint_mask], mint)
        status = pd.Series(np.where(
            surfaces.isna(), "",
            np.where(hit.notna(), f"{slot}=linked", f"{slot}=minted")),
            index=surfaces.index)
        return uri, status

    def _person_series(self, surfaces: pd.Series,
                       slot: str) -> tuple[pd.Series, pd.Series]:
        return self._mint_series(surfaces, slot, self.people,
                                 make_standard_uri)

    def _place_series(self, surfaces: pd.Series,
                      slot: str) -> tuple[pd.Series, pd.Series]:
        uri = _map_unique(surfaces, clean_term).map(self.places)
        status = pd.Series(np.where(
            surfaces.isna(), "",
            np.where(uri.notna(), f"{slot}=linked", f"{slot}=miss")),
            index=surfaces.index)
        return uri, status

    # ------------------------------------------------------------- batch

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        idx = batch.index
        ft = batch["fact_type"]

        p_uri, p_status = self._person_series(batch["person"], "person")
        o_uri, o_status = self._person_series(batch["other"], "other")
        pl_uri, pl_status = self._place_series(batch["place"], "place")
        # place2 gazetteer slot: part of the declared linker API for
        # location rows (pinned by the scalar-ladder differential
        # test) even though the current extractor only populates
        # place2 on education "degree" rows, where template.py reads
        # it as a raw literal — so on extractor output this lookup
        # sees only nulls
        p2 = batch["place2"].where(ft == "location")
        p2_uri, p2_status = self._place_series(p2, "place2")

        # term → vocabulary, routed by fact type
        term = batch["term"]
        t_uri = pd.Series(np.full(len(batch), None, dtype=object), index=idx)
        t_status = pd.Series("", index=idx)
        for mask, table, keyfn, kind in (
                ((ft == "occupation") & term.notna(),
                 self.occupations, clean_term, "occ"),
                ((ft == "death") & term.notna(),
                 self.causes, clean_term, "cod"),
                ((ft == "education") & (batch["category"] == "degree")
                 & term.notna(), self.degrees, clean_term, "edu")):
            if mask.any():
                u, s = self._vocab_series(table,
                                          _map_unique(term[mask], keyfn),
                                          kind)
                t_uri[mask] = u
                t_status[mask] = s
        cfm = (ft == "culturalform") & term.notna()
        if cfm.any():
            for cat, g in batch.loc[cfm].groupby("category", dropna=False):
                cat_key = cat if isinstance(cat, str) else ""
                table = self.cultural_forms.get(cat_key, {})
                u, s = self._vocab_series(
                    table, _map_unique(g["term"], clean_term_stemmed),
                    "cf", memo_kind=f"cf:{cat_key}")
                t_uri[g.index] = u
                t_status[g.index] = s

        org_uri, org_status = self._mint_series(
            batch["org"], "org", self.orgs,
            lambda s: make_standard_uri(s + " ORG"), keyfn=clean_term)

        # link_status: non-empty slot statuses joined with ";" in the
        # fixed slot order person, other, place, place2, term, org
        combined = np.full(len(batch), "", dtype=object)
        for part in (p_status, o_status, pl_status, p2_status, t_status,
                     org_status):
            pv = part.to_numpy()
            combined = np.where(
                pv == "", combined,
                np.where(combined == "", pv, combined + ";" + pv))

        out["person_uri"] = p_uri
        out["other_uri"] = o_uri
        out["place_uri"] = pl_uri
        out["place2_uri"] = p2_uri
        out["term_uri"] = t_uri
        out["org_uri"] = org_uri
        out["person_sex"] = p_uri.map(self._sex_by_uri)
        out["link_status"] = combined

        # location facts whose place failed the gazetteer are marked
        # dropped — the reference filters Location(value=None)
        # (location.py:120) — but the row is KEPT so the miss counters
        # (§2.6 A3) can still aggregate link_status; templating skips
        # dropped rows.
        out["dropped"] = ((out["fact_type"] == "location")
                          & out["place_uri"].isna())
        return out
