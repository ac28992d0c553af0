"""End-to-end pipeline tests: hand-derived golden triples, corpus P/R
vs planted facts, per-turn text invariant, determinism, dedup."""

import pandas as pd
import pyarrow as pa
import ray.data as rd

from rdf_extraction_ray import synth
from rdf_extraction_ray.functions.text import (
    limit_to_full_sentences)
from rdf_extraction_ray.namespaces import NS
from rdf_extraction_ray.pipelines.kg import extract_facts, triples_from_turns

DATA = NS["data"]
KG = NS["kg"]
CRM = NS["crm"]
SEM = NS["sem"]
OA = NS["oa"]
RDF_TYPE = NS["rdf"] + "type"
GEO = NS["geo"]
COD = NS["cod"]

TKEY = ["subj", "pred", "obj", "obj_kind", "obj_lang", "obj_datatype"]


def _turns_table(rows):
    return pa.table({
        "conv_id": pa.array([r[0] for r in rows], pa.string()),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "role": pa.array([r[2] for r in rows], pa.string()),
        "text": pa.array([r[3] for r in rows], pa.string()),
        "tool": pa.array([""] * len(rows), pa.string()),
        "ts": pa.array(list(range(len(rows))), pa.timestamp("us")),
    })


class TestGoldenTriples:
    """Hand-derived golden triple set for one fixed conversation
    (FIXTURES.md T3): birth + death(+cause) + burial, applying the
    templating rules of SURVEY §2.2 M19-M21 by hand."""

    def test_golden_conversation(self):
        t2 = "Margaret Blake was born on 1851-03-02 in Bath, Somerset."
        t3 = "M. Blake died of consumption on 1899-12 in Norwich, Norfolk."
        t4 = "Margaret Blake was buried in Bath, Somerset."
        turns = _turns_table([
            ("g1", 0, "system", "You are a biographical research assistant."),
            ("g1", 1, "user", "Tell me about Margaret Blake."),
            ("g1", 2, "assistant", t2),
            ("g1", 3, "assistant", t3),
            ("g1", 4, "assistant", t4),
        ])
        P = DATA + "Margaret_Blake"
        C0, A0 = DATA + "g1_context_0", DATA + "g1_activity_0"
        C1, A1 = DATA + "g1_context_1", DATA + "g1_activity_1"
        C2 = DATA + "g1_context_2"
        BATH = GEO + "3000000/"      # fixtures: Bath index 0 → 3000000
        NORWICH = GEO + "3000017/"   # Norwich index 1 → 3000017
        expected = {
            # birth context (seq 0, turn 2)
            (C0, RDF_TYPE, KG + "BirthContext", "uri", "", ""),
            (C0, KG + "hasSubject", P, "uri", "", ""),
            (C0, OA + "hasTarget", DATA + "g1_turn_2", "uri", "", ""),
            (C0, KG + "snippet", limit_to_full_sentences(t2, 35), "literal", "en", ""),
            (P, RDF_TYPE, CRM + "E21_Person", "uri", "", ""),
            (A0, RDF_TYPE, CRM + "E67_Birth", "uri", "", ""),
            (A0, CRM + "P98_brought_into_life", P, "uri", "", ""),
            (P, KG + "hasBirthDate", "1851-03-02", "literal", "", "xsd:date"),
            (P, KG + "hasBirthPlace", BATH, "uri", "", ""),
            (A0, SEM + "hasTimeStamp", "1851-03-02T00:00:00", "literal", "",
             "xsd:dateTime"),
            # death context (seq 1, turn 3)
            (C1, RDF_TYPE, KG + "DeathContext", "uri", "", ""),
            (C1, KG + "hasSubject", P, "uri", "", ""),
            (C1, OA + "hasTarget", DATA + "g1_turn_3", "uri", "", ""),
            (C1, KG + "snippet", limit_to_full_sentences(t3, 35), "literal", "en", ""),
            (A1, RDF_TYPE, CRM + "E69_Death", "uri", "", ""),
            (A1, CRM + "P100_was_death_of", P, "uri", "", ""),
            (P, KG + "hasDeathDate", "1899-12", "literal", "", "xsd:gYearMonth"),
            (P, KG + "hasDeathPlace", NORWICH, "uri", "", ""),
            (P, KG + "hasCauseOfDeath", COD + "consumption", "uri", "", ""),
            (A1, SEM + "hasTimeStamp", "1899-12-01T00:00:00", "literal", "",
             "xsd:dateTime"),
            # burial (seq 2, turn 4) — DeathContext class
            (C2, RDF_TYPE, KG + "DeathContext", "uri", "", ""),
            (C2, KG + "hasSubject", P, "uri", "", ""),
            (C2, OA + "hasTarget", DATA + "g1_turn_4", "uri", "", ""),
            (C2, KG + "snippet", limit_to_full_sentences(t4, 35), "literal", "en", ""),
            (P, KG + "hasBurialPlace", BATH, "uri", "", ""),
        }
        out = triples_from_turns(rd.from_arrow(turns)).to_pandas()
        got = set(map(tuple, out[TKEY].fillna("").itertuples(index=False)))
        assert got == expected

    def test_unparseable_date_stays_lexical(self):
        turns = _turns_table([
            ("g2", 0, "user", "Tell me about Margaret Blake."),
            ("g2", 1, "assistant",
             "Margaret Blake was born on the spring equinox of that year "
             "in Bath, Somerset."),
        ])
        out = triples_from_turns(rd.from_arrow(turns)).to_pandas()
        bd = out[out["pred"] == KG + "hasBirthDate"]
        assert bd.iloc[0]["obj"] == "the spring equinox of that year"
        assert bd.iloc[0]["obj_datatype"] is None or \
            bd.iloc[0]["obj_datatype"] in ("", None)
        # no SEM timestamp was emitted for the unparseable date
        assert not (out["pred"].str.startswith(SEM)).any()


class TestCorpusPR:
    """Extraction P/R vs planted ground truth must be ≥0.95
    (BASELINE.json; it is exactly 1.0 by construction)."""

    def test_extraction_pr(self):
        turns, planted = synth.generate(120, seed=7, mega_every=60)
        ext = extract_facts(rd.from_arrow(turns)).to_pandas()
        pf = planted.to_pandas()
        cols = synth.FACT_COLUMNS
        key = lambda df: set(map(tuple, df[cols].fillna("")
                                 .itertuples(index=False)))
        E, P = key(ext), key(pf)
        tp = len(E & P)
        assert tp / len(E) >= 0.95, "precision"
        assert tp / len(P) >= 0.95, "recall"


class TestInvariants:
    def test_per_turn_text_equality(self):
        """input_hint invariant: (conv_id, turn_idx) → text is preserved
        under stable ordering through every stage that references turns.
        Snippet triples must reproduce the source turn text."""
        turns, _ = synth.generate(20, seed=3, mega_every=0)
        src = {(c, t): x for c, t, x in zip(
            turns.column("conv_id").to_pylist(),
            turns.column("turn_idx").to_pylist(),
            turns.column("text").to_pylist())}
        out = triples_from_turns(rd.from_arrow(turns)).to_pandas()
        snips = out[out["pred"] == KG + "snippet"]
        assert len(snips) > 0
        for _, r in snips.iterrows():
            assert r["obj"] == limit_to_full_sentences(
                src[(r["conv_id"], r["turn_idx"])], 35)

    def test_determinism_and_dedup(self):
        turns, _ = synth.generate(30, seed=5, mega_every=0)
        ds = rd.from_arrow(turns)
        a = triples_from_turns(ds).to_pandas()
        b = triples_from_turns(ds).to_pandas()
        ka = a.sort_values(TKEY + ["conv_id"]).reset_index(drop=True)
        kb = b.sort_values(TKEY + ["conv_id"]).reset_index(drop=True)
        assert ka[TKEY].equals(kb[TKEY])
        # exact dedup: no duplicate triple keys survive
        assert not ka.duplicated(TKEY).any()

    def test_no_fact_conversation_yields_nothing(self):
        turns = _turns_table([
            ("e1", 0, "system", "You are a researcher."),
            ("e1", 1, "user", "What happened next?"),
            ("e1", 2, "assistant", "The records are unclear on this point."),
        ])
        out = triples_from_turns(rd.from_arrow(turns))
        assert out.count() == 0


class TestVocabularyConformance:
    """Engine analogue of extraction_validation/verify_terms.py: every
    emitted URI must live in a closed namespace."""

    def test_closed_namespaces(self):
        turns, _ = synth.generate(40, seed=11, mega_every=0)
        out = triples_from_turns(rd.from_arrow(turns)).to_pandas()
        bases = tuple(NS.values())
        for col in ("subj", "pred"):
            assert out[col].str.startswith(bases).all()
        uris = out[out["obj_kind"] == "uri"]["obj"]
        assert uris.str.startswith(bases).all()
