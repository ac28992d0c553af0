"""Predicate templating: linked facts → triple rows.

Re-expresses the reference's Context/Activity/Event ``to_triple``
builders (``Utils/context.py:284-461``, ``Utils/activity.py:370-527``,
``Utils/event.py:193-251``) as a pure, vectorized ``map_batches``
stage: one pandas pass per fact type, string-concat building the
(subj, pred, obj, obj_kind, obj_lang, obj_datatype) columns.

Deterministic ID scheme (replaces blank nodes + order-dependent
counters, SURVEY §7.5.1/7.5.6):
- context URI   = ``data:{conv_id}_context_{seq}``
- activity URI  = ``data:{conv_id}_activity_{seq}``
- turn target   = ``data:{conv_id}_turn_{turn_idx}`` (provenance —
  replaces the XPath/TextQuote selectors, §2.2 M24)

``seq`` is the per-conversation document-order counter minted by
``finalize_conversation``, so IDs are stable across runs and block
orders. Literal typing follows the length rule (``xsd_datatype_for``)
and timestamps use the SEM certainty-predicate choice (§2.4 F6-F9).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.dates import date_parse, timestamp_predicate, xsd_datatype_for
from ..functions.text import limit_words, make_standard_uri
from ..namespaces import NS, TRIPLE_COLUMNS, uri
from ..state.fixtures import FAMILY_RELATIONS

_MAX_PROFILE_WORDS = 35  # reference MAX_WORD_COUNT (utilities.py:30)

CONTEXT_CLASS = {
    "birth": "BirthContext", "death": "DeathContext",
    "burial": "DeathContext", "occupation": "OccupationContext",
    "income": "OccupationContext", "location": "LocationContext",
    "culturalform": "CulturalFormContext", "family": "FamilyContext",
    "childlessness": "FamilyContext",
    "friend": "FriendsAndAssociatesContext",
    "education": "EducationContext", "title": "WritingContext",
    "org": "OrganizationContext", "biographer": "BiographyContext",
    "personname": "PersonNameContext", "profile": "WritingContext",
    "event": "EventContext", "citation": "CitationContext",
}

# other-contexts (other_contexts.py:14-109): category → context class
OTHER_CONTEXT_CLASS = {
    "health": "HealthContext", "violence": "ViolenceContext",
    "wealth": "WealthContext", "leisure": "LeisureContext",
}

LOCATION_PRED = {"habitation": "habitation", "travel": "travel",
                 "visit": "visit", "relocation": "relocation",
                 "spatialRelationship": "spatialRelationship",
                 "migration": "migration", "emigration": "emigration"}

CF_PRED = {"religion": "hasReligion", "nationality": "hasNationality",
           "gender": "hasGender", "class": "hasSocialClass"}
# language competence → predicate (culturalForm.py competence rule)
LANG_PRED = {"NATIVE": "hasNativeLinguisticAbility",
             "ACQUIRED": "hasLinguisticAbility"}

_R = NS["rdf"] + "type"
_LABEL = NS["rdfs"] + "label"


class _Emitter:
    """Accumulates homogeneous triple column-arrays cheaply."""

    def __init__(self):
        self.parts: list[pd.DataFrame] = []

    def emit(self, subj, pred, obj, kind="uri", lang="", dtype="",
             conv=None, tidx=None, mask=None):
        """Each arg is a Series/array (aligned) or scalar; mask selects."""
        df = pd.DataFrame({
            "subj": subj, "pred": pred, "obj": obj, "obj_kind": kind,
            "obj_lang": lang, "obj_datatype": dtype,
            "conv_id": conv, "turn_idx": tidx,
        })
        if mask is not None:
            df = df[np.asarray(mask)]
        df = df[df["obj"].notna() & df["subj"].notna()]
        if len(df):
            self.parts.append(df)

    def frame(self) -> pd.DataFrame:
        if not self.parts:
            return pd.DataFrame(columns=TRIPLE_COLUMNS)
        return pd.concat(self.parts, ignore_index=True)[TRIPLE_COLUMNS]

    def table(self) -> pa.Table:
        if not self.parts:
            return pa.table({c: pa.array([], pa.int32() if c == "turn_idx"
                                         else pa.string())
                             for c in TRIPLE_COLUMNS})
        out = pd.concat(self.parts, ignore_index=True)
        return pa.table({
            c: pa.array(out[c], from_pandas=True,
                        type=pa.int32() if c == "turn_idx" else pa.string())
            for c in TRIPLE_COLUMNS
        })


def _date_columns(dates: pd.Series) -> tuple[list, list, list, list]:
    """Row-wise date scalar pass (strptime waterfall stays row-wise):
    returns (lexical, datatype, start_iso-or-None, ok)."""
    lex, dtyp, start, ok = [], [], [], []
    for d in dates:
        if d is None or d != d:
            lex.append(None); dtyp.append(""); start.append(None); ok.append(False)
            continue
        l, t = xsd_datatype_for(d)
        lex.append(l); dtyp.append("" if t == "" else t)
        s, good, _ = date_parse(d)
        start.append(s if good else None)
        ok.append(good)
    return lex, dtyp, start, ok


def _emit_triples(batch: pd.DataFrame) -> _Emitter:
    """Shared body: linked fact rows → triple emitter."""
    b = batch[~batch["dropped"].astype(bool)].reset_index(drop=True)
    if not len(b):
        return _Emitter()
    em = _Emitter()
    conv = b["conv_id"]
    tidx = b["turn_idx"]
    data_ns = NS["data"]
    C = data_ns + conv + "_context_" + b["seq"].astype(str)
    A = data_ns + conv + "_activity_" + b["seq"].astype(str)
    TURN = data_ns + conv + "_turn_" + tidx.astype(str)
    P = b["person_uri"]
    ctx_class = b["fact_type"].map(CONTEXT_CLASS)
    oc = (b["fact_type"] == "othercontext")
    if oc.any():  # per-category class (HealthContext etc.)
        ctx_class = ctx_class.where(
            ~oc, b["category"].map(OTHER_CONTEXT_CLASS))
    ctx_class = ctx_class.map(
        lambda c: uri("kg", c) if isinstance(c, str) else None)

    # ---- context frame (every fact): type, subject, target, snippet
    em.emit(C, _R, ctx_class, conv=conv, tidx=tidx)
    em.emit(C, uri("kg", "hasSubject"), P, conv=conv, tidx=tidx)
    em.emit(C, NS["oa"] + "hasTarget", TURN, conv=conv, tidx=tidx)
    em.emit(C, uri("kg", "snippet"), b["snippet"], kind="literal", lang="en",
            conv=conv, tidx=tidx)
    # ---- person node (collapses in dedup)
    em.emit(P, _R, NS["crm"] + "E21_Person", conv=conv, tidx=tidx)

    ft = b["fact_type"]

    # ---------------------------------------------------------- birth/death
    for kind, ev_class, ev_pred, date_pred, place_pred in (
            ("birth", "E67_Birth", "P98_brought_into_life",
             "hasBirthDate", "hasBirthPlace"),
            ("death", "E69_Death", "P100_was_death_of",
             "hasDeathDate", "hasDeathPlace")):
        m = (ft == kind).to_numpy()
        if not m.any():
            continue
        sub = b[m]
        lex, dtyp, start, ok = _date_columns(sub["date"])
        sA, sP = A[m], P[m]
        em.emit(sA, _R, NS["crm"] + ev_class, conv=sub["conv_id"], tidx=sub["turn_idx"])
        em.emit(sA, NS["crm"] + ev_pred, sP, conv=sub["conv_id"], tidx=sub["turn_idx"])
        em.emit(sP, uri("kg", date_pred), pd.Series(lex, index=sub.index),
                kind="literal", dtype=pd.Series(dtyp, index=sub.index),
                conv=sub["conv_id"], tidx=sub["turn_idx"])
        # place: gazetteer URI when linked, else the raw surface literal
        linked = sub["place_uri"].notna()
        em.emit(sP, uri("kg", place_pred), sub["place_uri"],
                conv=sub["conv_id"], tidx=sub["turn_idx"], mask=linked)
        em.emit(sP, uri("kg", place_pred), sub["place"], kind="literal",
                conv=sub["conv_id"], tidx=sub["turn_idx"], mask=~linked)
        # SEM timestamp (certainty → predicate choice, event.py:176-191)
        ts_pred = sub["certainty"].fillna("").map(
            lambda c: NS["sem"] + timestamp_predicate(c))
        em.emit(sA, ts_pred, pd.Series(start, index=sub.index), kind="literal",
                dtype="xsd:dateTime", conv=sub["conv_id"], tidx=sub["turn_idx"])
        if kind == "death":
            cod_linked = sub["term_uri"].notna()
            em.emit(sP, uri("kg", "hasCauseOfDeath"), sub["term_uri"],
                    conv=sub["conv_id"], tidx=sub["turn_idx"], mask=cod_linked)
            em.emit(sP, uri("kg", "hasCauseOfDeath"), sub["term"],
                    kind="literal", conv=sub["conv_id"],
                    tidx=sub["turn_idx"], mask=~cod_linked)

    # -------------------------------------------------------------- burial
    m = (ft == "burial").to_numpy()
    if m.any():
        sub = b[m]
        linked = sub["place_uri"].notna()
        em.emit(P[m], uri("kg", "hasBurialPlace"), sub["place_uri"],
                conv=sub["conv_id"], tidx=sub["turn_idx"], mask=linked)
        em.emit(P[m], uri("kg", "hasBurialPlace"), sub["place"],
                kind="literal", conv=sub["conv_id"], tidx=sub["turn_idx"],
                mask=~linked)

    # ---------------------------------------------------------- occupation
    m = (ft == "occupation").to_numpy()
    if m.any():
        sub = b[m]
        em.emit(A[m], _R, NS["crm"] + "E7_Activity",
                conv=sub["conv_id"], tidx=sub["turn_idx"])
        em.emit(A[m], NS["crm"] + "P14_carried_out_by", P[m],
                conv=sub["conv_id"], tidx=sub["turn_idx"])
        pred = sub["category"].map({
            "paid": uri("kg", "hasPaidOccupation"),
            "volunteer": uri("kg", "hasVolunteerOccupation")})
        linked = sub["term_uri"].notna()
        em.emit(P[m], pred, sub["term_uri"], conv=sub["conv_id"],
                tidx=sub["turn_idx"], mask=linked)
        em.emit(P[m], pred, sub["term"], kind="literal",
                conv=sub["conv_id"], tidx=sub["turn_idx"], mask=~linked)

    m = (ft == "income").to_numpy()
    if m.any():
        sub = b[m]
        em.emit(P[m], uri("kg", "hasIncome"), sub["amount"], kind="literal",
                dtype="xsd:int", conv=sub["conv_id"], tidx=sub["turn_idx"])

    # ------------------------------------------------------------ location
    m = (ft == "location").to_numpy()
    if m.any():
        sub = b[m]
        pred = sub["category"].map(LOCATION_PRED).map(lambda p: uri("kg", p))
        em.emit(P[m], pred, sub["place_uri"], conv=sub["conv_id"],
                tidx=sub["turn_idx"])

    # ------------------------------------------------------- cultural form
    m = (ft == "culturalform").to_numpy()
    if m.any():
        sub = b[m]
        is_lang = (sub["category"] == "language").to_numpy()
        pred = pd.Series(np.where(
            is_lang,
            sub["certainty"].map(lambda c: uri(
                "kg", LANG_PRED.get(c or "", "hasLinguisticAbility"))),
            sub["category"].map(
                lambda c: uri("kg", CF_PRED[c]) if c in CF_PRED else None)),
            index=sub.index)
        linked = sub["term_uri"].notna()
        em.emit(P[m], pred, sub["term_uri"], conv=sub["conv_id"],
                tidx=sub["turn_idx"], mask=linked)
        em.emit(P[m], pred, sub["term"], kind="literal",
                conv=sub["conv_id"], tidx=sub["turn_idx"], mask=~linked)

    # -------------------------------------------------------------- family
    m = (ft == "family").to_numpy()
    if m.any():
        sub = b[m]
        fwd = sub["term"].map(lambda r: uri("kg", FAMILY_RELATIONS[r][0]))
        # sex-conditional inverse (lifeInfo.py:294-467): the inverse
        # predicate names the SUBJECT as seen from the other person
        inv = [uri("kg", FAMILY_RELATIONS[r][1] if sx == "MALE"
                   else FAMILY_RELATIONS[r][2])
               for r, sx in zip(sub["term"], sub["person_sex"])]
        em.emit(P[m], fwd, sub["other_uri"], conv=sub["conv_id"],
                tidx=sub["turn_idx"])
        em.emit(sub["other_uri"], pd.Series(inv, index=sub.index), P[m],
                conv=sub["conv_id"], tidx=sub["turn_idx"])

    # -------------------------------------------------------------- friend
    m = (ft == "friend").to_numpy()
    if m.any():
        sub = b[m]
        pred = sub["category"].map({
            "friend": uri("kg", "interpersonalRelationshipWith"),
            "cohabitant": uri("kg", "cohabitant")})
        em.emit(P[m], pred, sub["other_uri"], conv=sub["conv_id"],
                tidx=sub["turn_idx"])

    # ------------------------------------------------------- childlessness
    m = (ft == "childlessness").to_numpy()
    if m.any():
        sub = b[m]
        em.emit(P[m], uri("kg", "reproductiveHistory"),
                sub["category"].map(lambda c: uri("kg", c)),
                conv=sub["conv_id"], tidx=sub["turn_idx"])

    # ----------------------------------------------------------- education
    m = ((ft == "education") & (b["category"] == "study")).to_numpy()
    if m.any():
        sub = b[m]
        em.emit(P[m], uri("kg", "studiedSubject"), sub["term"],
                kind="literal", conv=sub["conv_id"], tidx=sub["turn_idx"])
        em.emit(P[m], uri("kg", "attendedSchool"), sub["org_uri"],
                conv=sub["conv_id"], tidx=sub["turn_idx"])
    m = ((ft == "education") & (b["category"] == "degree")).to_numpy()
    if m.any():
        sub = b[m]
        linked = sub["term_uri"].notna()
        em.emit(P[m], uri("kg", "holdsDegree"), sub["term_uri"],
                conv=sub["conv_id"], tidx=sub["turn_idx"], mask=linked)
        em.emit(P[m], uri("kg", "holdsDegree"), sub["term"], kind="literal",
                conv=sub["conv_id"], tidx=sub["turn_idx"], mask=~linked)
        em.emit(P[m], uri("kg", "studiedSubject"), sub["place2"],
                kind="literal", conv=sub["conv_id"], tidx=sub["turn_idx"])

    # ---------------------------------------------------------------- title
    m = (ft == "title").to_numpy()
    if m.any():
        sub = b[m]
        W = sub["title"].map(lambda t: make_standard_uri(t + " TITLE"))
        em.emit(P[m], uri("kg", "authorOf"), W, conv=sub["conv_id"],
                tidx=sub["turn_idx"])
        em.emit(W, _R, uri("kg", "Title"), conv=sub["conv_id"],
                tidx=sub["turn_idx"])
        em.emit(W, _LABEL, sub["title"], kind="literal", lang="en",
                conv=sub["conv_id"], tidx=sub["turn_idx"])

    # ------------------------------------------------------------------ org
    m = (ft == "org").to_numpy()
    if m.any():
        sub = b[m]
        em.emit(P[m], uri("kg", "memberOf"), sub["org_uri"],
                conv=sub["conv_id"], tidx=sub["turn_idx"])

    # ----------------------------------------------------------- biographer
    m = (ft == "biographer").to_numpy()
    if m.any():
        sub = b[m]
        em.emit(P[m], uri("kg", "hasBiographer"), sub["other_uri"],
                conv=sub["conv_id"], tidx=sub["turn_idx"])

    # ---------------------------------------------------------- person name
    # typed name entities (reference personname.py:131-269): nickname →
    # a Nickname node with label; birth name → a BirthName node with
    # given/surname parts (personname.py:241-269)
    m = ((ft == "personname") & (b["category"] == "nickname")).to_numpy()
    if m.any():
        sub = b[m]
        N = sub["term"].map(lambda t: make_standard_uri(t + " NAME"))
        em.emit(P[m], uri("kg", "hasNickname"), N,
                conv=sub["conv_id"], tidx=sub["turn_idx"])
        em.emit(N, _R, uri("kg", "Nickname"),
                conv=sub["conv_id"], tidx=sub["turn_idx"])
        em.emit(N, _LABEL, sub["term"], kind="literal", lang="en",
                conv=sub["conv_id"], tidx=sub["turn_idx"])
    m = ((ft == "personname") & (b["category"] == "birthname")).to_numpy()
    if m.any():
        sub = b[m]
        N = sub["other"].map(lambda t: make_standard_uri(t + " BIRTHNAME"))
        given = sub["other"].map(lambda t: t.rsplit(" ", 1)[0])
        surname = sub["other"].map(lambda t: t.rsplit(" ", 1)[-1])
        em.emit(P[m], uri("kg", "hasBirthName"), N,
                conv=sub["conv_id"], tidx=sub["turn_idx"])
        em.emit(N, _R, uri("kg", "BirthName"),
                conv=sub["conv_id"], tidx=sub["turn_idx"])
        em.emit(N, uri("kg", "givenName"), given, kind="literal",
                conv=sub["conv_id"], tidx=sub["turn_idx"])
        em.emit(N, uri("kg", "surname"), surname, kind="literal",
                conv=sub["conv_id"], tidx=sub["turn_idx"])

    # ------------------------------------------------------ profile summary
    # author-summary profile literal, hard 35-word limit (reference
    # writing_extraction.py:29-70 + utilities.py:30 MAX_WORD_COUNT)
    m = (ft == "profile").to_numpy()
    if m.any():
        sub = b[m]
        prof = sub["term"].map(
            lambda t: limit_words(t, _MAX_PROFILE_WORDS))
        em.emit(P[m], uri("kg", "hasProfileDescription"), prof,
                kind="literal", lang="en",
                conv=sub["conv_id"], tidx=sub["turn_idx"])

    # ------------------------------------------------------- other contexts
    # VIOLENCE/WEALTH/LEISURE/HEALTH → identifying context + generic
    # E7 activity (reference other_contexts.py:14-109)
    m = (ft == "othercontext").to_numpy()
    if m.any():
        sub = b[m]
        em.emit(A[m], _R, NS["crm"] + "E7_Activity",
                conv=sub["conv_id"], tidx=sub["turn_idx"])
        em.emit(A[m], NS["crm"] + "P14_carried_out_by", P[m],
                conv=sub["conv_id"], tidx=sub["turn_idx"])
        cat = sub["category"]
        em.emit(P[m], uri("kg", "hasHealthCondition"), sub["term"],
                kind="literal", conv=sub["conv_id"], tidx=sub["turn_idx"],
                mask=(cat == "health"))
        em.emit(P[m], uri("kg", "hasLeisureActivity"), sub["term"],
                kind="literal", conv=sub["conv_id"], tidx=sub["turn_idx"],
                mask=(cat == "leisure"))
        em.emit(P[m], uri("kg", "inheritedWealth"), sub["amount"],
                kind="literal", dtype="xsd:int", conv=sub["conv_id"],
                tidx=sub["turn_idx"], mask=(cat == "wealth"))
        viol = (cat == "violence")
        if viol.any():
            linked = sub["place_uri"].notna()
            em.emit(P[m], uri("kg", "experiencedViolenceAt"),
                    sub["place_uri"], conv=sub["conv_id"],
                    tidx=sub["turn_idx"], mask=(viol & linked))
            em.emit(P[m], uri("kg", "experiencedViolenceAt"), sub["place"],
                    kind="literal", conv=sub["conv_id"],
                    tidx=sub["turn_idx"], mask=(viol & ~linked))

    # ------------------------------------------------------------- citation
    # BIBCIT → cito:Citation + refers-to wiring (Utils/citation.py:27-72)
    m = (ft == "citation").to_numpy()
    if m.any():
        sub = b[m]
        N = data_ns + sub["conv_id"] + "_citation_" + sub["seq"].astype(str)
        W = sub["title"].map(lambda t: make_standard_uri(t + " TITLE"))
        em.emit(N, _R, NS["cito"] + "Citation",
                conv=sub["conv_id"], tidx=sub["turn_idx"])
        em.emit(N, NS["cito"] + "hasCitedEntity", W,
                conv=sub["conv_id"], tidx=sub["turn_idx"])
        em.emit(N, uri("kg", "pageNumber"), sub["amount"], kind="literal",
                dtype="xsd:int", conv=sub["conv_id"], tidx=sub["turn_idx"])
        em.emit(C[m], uri("kg", "hasCitation"), N,
                conv=sub["conv_id"], tidx=sub["turn_idx"])

    # --------------------------------------------------- freestanding event
    # person-less SEM event (reference freestanding_events.py:50-103;
    # blank-node place skolemized per SURVEY §7.5.6)
    m = (ft == "event").to_numpy()
    if m.any():
        sub = b[m]
        E = data_ns + sub["conv_id"] + "_event_" + sub["seq"].astype(str)
        lex, dtyp, start, ok = _date_columns(sub["date"])
        em.emit(E, _R, NS["sem"] + "Event",
                conv=sub["conv_id"], tidx=sub["turn_idx"])
        em.emit(E, _LABEL, sub["term"], kind="literal", lang="en",
                conv=sub["conv_id"], tidx=sub["turn_idx"])
        linked = sub["place_uri"].notna()
        em.emit(E, NS["sem"] + "hasPlace", sub["place_uri"],
                conv=sub["conv_id"], tidx=sub["turn_idx"], mask=linked)
        em.emit(E, NS["sem"] + "hasPlace", sub["place"], kind="literal",
                conv=sub["conv_id"], tidx=sub["turn_idx"], mask=~linked)
        em.emit(E, NS["sem"] + "hasTimeStamp",
                pd.Series(start, index=sub.index), kind="literal",
                dtype="xsd:dateTime", conv=sub["conv_id"],
                tidx=sub["turn_idx"])
        # unparseable dates stay lexical (event.py:90-110 quirk)
        lex_only = pd.Series(lex, index=sub.index).where(
            ~pd.Series(ok, index=sub.index), None)
        em.emit(E, NS["sem"] + "hasTime", lex_only, kind="literal",
                conv=sub["conv_id"], tidx=sub["turn_idx"])

    return em


def build_triples(batch: pd.DataFrame) -> pa.Table:
    """map_batches body: linked fact rows → triple rows (Arrow)."""
    return _emit_triples(batch).table()


def build_triples_frame(batch: pd.DataFrame) -> pd.DataFrame:
    """Fused-pipeline variant: same rows as a pandas frame, skipping
    one Arrow round-trip when the caller keeps processing in pandas."""
    return _emit_triples(batch).frame()
