"""Entity linking & canonicalization — the stateful actor-pool stage.

Rebuilds the reference's broadcast-dictionary joins (SURVEY §2.5
J1-J7): person alias → canonical URI (``Utils/utilities.py:289-360``),
place gazetteer (``Utils/place.py:116-157``), org authority
(``Utils/organizations.py:56-83``), and the vocab term maps with the
exact → cleaned/stemmed → fuzzy (``difflib.get_close_matches``,
``culturalForm.py:589-591``) fallback ladder.

Used as ``facts.map_batches(EntityLinker, concurrency=N,
batch_format="pandas")`` — dictionaries are built ONCE per actor in
``__init__`` (the reference loads them once per process at import
time); the fuzzy matcher memoizes per actor. URI minting is
deterministic (same surface → same URI on every actor), which replaces
the reference's in-RAM dedup caches (J11).

Adds columns: ``person_uri, other_uri, place_uri, place2_uri,
term_uri, org_uri, person_sex, link_status`` (a compact
``slot=outcome`` summary feeding the hit/miss histograms, §2.6 A3).
"""

from __future__ import annotations

from difflib import get_close_matches

import pandas as pd

from ..functions.text import clean_term, clean_term_stemmed, make_standard_uri
from ..state.fixtures import WRITERS, build_linker_maps

LINKED_COLUMNS = ["person_uri", "other_uri", "place_uri", "place2_uri",
                  "term_uri", "org_uri", "person_sex", "link_status"]

_FUZZY_CUTOFF = 0.8  # reference uses difflib default / ratio>=95 variants


class EntityLinker:
    """Callable class for an actor-pool ``map_batches`` stage."""

    def __init__(self, maps: dict | None = None):
        m = maps or build_linker_maps()
        self.people: dict[str, str] = m["people"]
        self.places: dict[str, str] = m["places"]
        self.orgs: dict[str, str] = m["orgs"]
        self.occupations: dict[str, str] = m["occupations"]
        self.causes: dict[str, str] = m["causes"]
        self.cultural_forms: dict[str, dict[str, str]] = m["cultural_forms"]
        self.degrees: dict[str, str] = m["degrees"]
        self.writers = WRITERS
        # per-actor memo for the fuzzy fallback (SURVEY §7.5.4)
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

    def _vocab(self, table: dict[str, str], key: str,
               kind: str) -> tuple[str | None, str]:
        """exact (cleaned) → fuzzy → miss ladder with per-actor memo."""
        hit = table.get(key)
        if hit is not None:
            return hit, f"{kind}=linked"
        memo_key = (kind, key)
        if memo_key in self._fuzzy_memo:
            hit = self._fuzzy_memo[memo_key]
        else:
            close = get_close_matches(key, table.keys(), n=1,
                                      cutoff=_FUZZY_CUTOFF)
            hit = table[close[0]] if close else None
            self._fuzzy_memo[memo_key] = hit
        if hit is not None:
            return hit, f"{kind}=fuzzy"
        return None, f"{kind}=miss"

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
            return self._vocab(table, clean_term_stemmed(surface), "cf")
        if fact_type == "education" and category == "degree":
            return self._vocab(self.degrees, clean_term(surface), "edu")
        return None, ""

    # ------------------------------------------------------------- batch

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        cols = {c: [None] * n for c in LINKED_COLUMNS}
        def _col(name: str):
            s = batch[name]
            return s.where(s.notna(), None).to_numpy()

        ft = _col("fact_type")
        cat = _col("category")
        person = _col("person")
        other = _col("other")
        place = _col("place")
        place2 = _col("place2")
        term = _col("term")
        org = _col("org")
        for i in range(n):
            status: list[str] = []
            u, s = self.link_person(person[i])
            cols["person_uri"][i] = u
            if s:
                status.append(s)
            if u is not None:
                sex = self.writers.get(u)
                cols["person_sex"][i] = sex[1] if sex else None
            if other[i] is not None:
                u, s = self.link_person(other[i])
                cols["other_uri"][i] = u
                status.append("other=" + s.split("=")[1])
            if place[i] is not None:
                u, s = self.link_place(place[i])
                cols["place_uri"][i] = u
                status.append(s)
            # place2 is only a place for migration-style rows; education
            # "degree" reuses it for the subject literal
            if place2[i] is not None and ft[i] == "location":
                u, s = self.link_place(place2[i])
                cols["place2_uri"][i] = u
                status.append("place2=" + s.split("=")[1])
            if term[i] is not None:
                u, s = self.link_term(ft[i], cat[i], term[i])
                cols["term_uri"][i] = u
                if s:
                    status.append(s)
            if org[i] is not None:
                u, s = self.link_org(org[i])
                cols["org_uri"][i] = u
                status.append(s)
            cols["link_status"][i] = ";".join(status)
        out = batch.copy()
        for c in LINKED_COLUMNS:
            out[c] = cols[c]

        # location facts whose place failed the gazetteer are marked
        # dropped — the reference filters Location(value=None)
        # (location.py:120) — but the row is KEPT so the miss counters
        # (§2.6 A3) can still aggregate link_status; templating skips
        # dropped rows.
        out["dropped"] = ((out["fact_type"] == "location")
                          & out["place_uri"].isna())
        return out
