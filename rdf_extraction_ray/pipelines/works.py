"""Bibliography migration pipeline (SURVEY §2.2 M18, §2.1 S10, §2.5 J8).

Re-expresses the reference's MODS → BIBFRAME/CIDOC two-pass migration
(``Mods/modsBib.py``) over a Parquet *works* table:

- **Pass 1** (reference ``WritingParse``, ``modsBib.py:288-347,
  1358-1366``): the writing table maps ``record_id → genre list``.
  Here it is a small side aggregated once and **broadcast via
  ``ray.put``** — the reference holds it in a module-global dict; a
  shuffle join would move the whole works table for a <1 MB side.
- **Pass 2** (reference ``BibliographyParse.build_graph``,
  ``modsBib.py:817-1236``): one vectorized ``map_batches`` pass emits
  Work / Creation-activity / TimeSpan / agent-role triples per record.
  The reference's ``relatedItem`` recursion (``modsBib.py:1109-1134``)
  becomes a flat ``related_id`` column: related records are rows
  themselves, and the link is one ``kg:relatedWork`` triple
  (``related_item_map`` role, ``modsBib.py:394-407``).

Deterministic URI minting replaces the reference's AGENTS/ADMIN_AGENTS
memo caches (J11): the same label always mints the same URI, so no
cross-record shared state is needed.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..functions.dates import date_parse, xsd_datatype_for
from ..functions.text import make_standard_uri
from ..namespaces import NS, TRIPLE_COLUMNS, uri
from ..stages.dedup import dedup_triples
from ..state.fixtures import PLACES
from ..functions.text import clean_term

# creator-role → predicate (reference ROLES dict, modsBib.py:68-83)
ROLE_PRED = {
    "author": "hasAuthor", "editor": "hasEditor",
    "translator": "hasTranslator", "illustrator": "hasIllustrator",
    "compiler": "hasCompiler",
}

# related-item relation → predicate (related_item_map, modsBib.py:394-407)
RELATED_PRED = {
    "host": "partOf", "series": "inSeries", "preceding": "precededBy",
    "succeeding": "succeededBy",
}

_R = NS["rdf"] + "type"
_LABEL = NS["rdfs"] + "label"


def read_works(path: str) -> rd.Dataset:
    return rd.read_parquet(path)


def build_genre_map(writing: rd.Dataset) -> dict[str, list[str]]:
    """Pass 1: record_id → sorted distinct genre names. Streaming
    partial aggregation; the result is the broadcast side of J8."""
    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        return df[["record_id", "genre"]].drop_duplicates()

    small = writing.map_batches(_partial, batch_format="pandas").to_pandas()
    if "record_id" not in small.columns:  # empty input loses its schema
        return {}
    out: dict[str, list[str]] = {}
    for rec, g in zip(small["record_id"], small["genre"]):
        out.setdefault(rec, [])
        if g not in out[rec]:
            out[rec].append(g)
    return {k: sorted(v) for k, v in out.items()}


class WorkTemplater:
    """Actor-pool stage: works rows → triple rows, with the genre map
    and gazetteer loaded once per actor (reference loads both at
    import, modsBib.py:1337-1356)."""

    def __init__(self, genre_map_ref=None, fuzzy_places: bool = False):
        self.genre_map: dict[str, list[str]] = (
            ray.get(genre_map_ref) if genre_map_ref is not None else {})
        self.places = PLACES
        # opt-in modsBib parity: the reference SUBSTITUTES fuzzily
        # matched places (fuzz.ratio >= 95, modsBib.py place mapper);
        # off by default so gazetteer misses stay literals (matching
        # the exact-join oracle). max_dist=2 on the cleaned key ≈
        # ratio 95 at typical "town,county" key lengths (~15 chars).
        self._fuzzy = None
        if fuzzy_places:
            from ..stages.fuzzy import VocabMatcher
            self._fuzzy = VocabMatcher(list(PLACES), max_dist=2,
                                       col="pub_place")

    def _place_of(self, p):
        if not isinstance(p, str):
            return None
        key = clean_term(p)
        hit = self.places.get(key)
        if hit is None and self._fuzzy is not None:
            near, d = self._fuzzy._best(key)
            if d >= 0:
                hit = self.places[near]
        return hit

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        parts: list[pd.DataFrame] = []

        def emit(subj, pred, obj, kind="uri", lang="", dtype="", mask=None):
            df = pd.DataFrame({"subj": subj, "pred": pred, "obj": obj,
                               "obj_kind": kind, "obj_lang": lang,
                               "obj_datatype": dtype})
            if mask is not None:
                df = df[mask.to_numpy() if hasattr(mask, "to_numpy") else mask]
            df = df[df["obj"].notna() & df["subj"].notna()]
            if len(df):
                parts.append(df)

        W = NS["data"] + "work_" + batch["record_id"].astype(str)
        emit(W, _R, uri("kg", "Work"))
        emit(W, uri("kg", "hasTitle"), batch["title"], kind="literal",
             lang="en")
        sub_ok = batch["subtitle"].notna() & (batch["subtitle"] != "")
        emit(W, uri("kg", "hasSubtitle"), batch["subtitle"], kind="literal",
             lang="en", mask=sub_ok)
        emit(W, uri("kg", "language"), batch["lang"], kind="literal")

        # creation activity + agent role (modsBib.py:930-1009 pattern)
        A = W + "_creation"
        emit(A, _R, NS["crm"] + "E65_Creation")
        emit(A, NS["crm"] + "P94_has_created", W)
        agent = batch["creator"].map(
            lambda n: make_standard_uri(n) if isinstance(n, str) else None)
        emit(agent, _R, NS["crm"] + "E21_Person")
        role_pred = batch["creator_role"].map(
            lambda r: uri("kg", ROLE_PRED.get(r, "hasContributor")))
        emit(W, role_pred, agent)

        # origin info: publisher org + place + typed date (modsBib.py
        # originInfo handling); place goes through the gazetteer
        pub = batch["publisher"].map(
            lambda p: make_standard_uri(p + " ORG") if isinstance(p, str)
            else None)
        emit(W, uri("kg", "hasPublisher"), pub)
        emit(pub, _R, uri("kg", "Organization"))
        place_uri = batch["pub_place"].map(self._place_of)
        linked = place_uri.notna()
        emit(W, uri("kg", "publishedIn"), place_uri, mask=linked)
        emit(W, uri("kg", "publishedIn"), batch["pub_place"],
             kind="literal", mask=~linked)

        # timespan: lexical literal typed by length + parsed ISO start
        TS = W + "_timespan"
        dates = batch["pub_date"]
        has_date = dates.notna() & (dates != "")
        if has_date.any():
            lex, dtyp, starts = [], [], []
            for d in dates.where(has_date, None):
                if d is None:
                    lex.append(None); dtyp.append(""); starts.append(None)
                    continue
                l, t = xsd_datatype_for(d)
                s, ok, _ = date_parse(d)
                lex.append(l); dtyp.append(t); starts.append(s if ok else None)
            emit(A, NS["crm"] + "P4_has_time-span", TS, mask=has_date)
            emit(TS, uri("kg", "dateLabel"),
                 pd.Series(lex, index=batch.index), kind="literal",
                 dtype=pd.Series(dtyp, index=batch.index))
            emit(TS, NS["sem"] + "hasBeginTimeStamp",
                 pd.Series(starts, index=batch.index), kind="literal",
                 dtype="xsd:dateTime")

        # genre join (J8): broadcast map lookup, one triple per genre
        recs, genres = [], []
        for rec in batch["record_id"]:
            for g in self.genre_map.get(rec, []):
                recs.append(rec)
                genres.append(g)
        if recs:
            GW = pd.Series([NS["data"] + "work_" + r for r in recs])
            emit(GW, uri("kg", "hasGenre"),
                 pd.Series([uri("kg", "genre_" + g.replace(" ", "_"))
                            for g in genres]))

        # related items: one link triple per related record
        rel_ok = batch["related_id"].notna() & (batch["related_id"] != "")
        rel_pred = batch["related_type"].map(
            lambda r: uri("kg", RELATED_PRED.get(r, "relatedWork")))
        rel_obj = batch["related_id"].map(
            lambda r: NS["data"] + "work_" + str(r) if isinstance(r, str)
            and r else None)
        emit(W, rel_pred, rel_obj, mask=rel_ok)

        out = (pd.concat(parts, ignore_index=True) if parts
               else pd.DataFrame(columns=TRIPLE_COLUMNS[:6]))
        out["conv_id"] = ""
        out["turn_idx"] = -1
        return pa.table({
            c: pa.array(out[c].tolist(),
                        pa.int32() if c == "turn_idx" else pa.string())
            for c in TRIPLE_COLUMNS})


_TEMPLATER_CACHE: list = []  # [(ref_hex, WorkTemplater)] — one slot per
# worker process, replaced when the broadcast ref changes (an unbounded
# dict would leak one genre map per pipeline invocation per worker)


def works_pipeline(works_path: str, writing_path: str,
                   concurrency: int | tuple | None = None,
                   fuzzy_places: bool = False) -> rd.Dataset:
    """Two-pass MODS-style migration: writing pass builds the genre
    map (broadcast via ``ray.put``), works pass templates triples,
    shared dedup. Default: task pool with a per-process cached
    templater (same rationale as the entity linker — the state is a
    small dict, actor spawn would be pure latency); pass
    ``concurrency`` for a bounded actor pool."""
    genre_map = build_genre_map(rd.read_parquet(writing_path))
    ref = ray.put(genre_map)
    works = read_works(works_path)
    if concurrency is not None:
        triples = works.map_batches(WorkTemplater, batch_format="pandas",
                                    batch_size=None,
                                    concurrency=concurrency,
                                    fn_constructor_args=(ref,
                                                         fuzzy_places))
        return dedup_triples(triples)

    def _template(batch):
        tag = (ref.hex(), fuzzy_places)
        if not _TEMPLATER_CACHE or _TEMPLATER_CACHE[0][0] != tag:
            _TEMPLATER_CACHE[:] = [(tag,
                                    WorkTemplater(ref, fuzzy_places))]
        return _TEMPLATER_CACHE[0][1](batch)

    triples = works.map_batches(_template, batch_format="pandas",
                                batch_size=None)
    return dedup_triples(triples)


def genres_used(writing: rd.Dataset) -> pd.DataFrame:
    """Distinct genres used (reference USED_GENRES set + label lookup,
    modsBib.py:94,1392-1403)."""

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"genre": df["genre"].unique()})

    out = (writing.map_batches(_partial, batch_format="pandas")
           .to_pandas().drop_duplicates("genre")
           .sort_values("genre", ignore_index=True))
    out["genre_uri"] = out["genre"].map(
        lambda g: uri("kg", "genre_" + g.replace(" ", "_")))
    return out
