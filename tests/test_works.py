"""Bibliography-migration pipeline tests (M18/S10/J8): golden triples
for one record, the broadcast genre join, related-item links."""

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from rdf_extraction_ray import synth
from rdf_extraction_ray.namespaces import NS
from rdf_extraction_ray.pipelines.works import (build_genre_map, genres_used,
                                                works_pipeline)

DATA = NS["data"]
KG = NS["kg"]
CRM = NS["crm"]
SEM = NS["sem"]
RDF_TYPE = NS["rdf"] + "type"
GEO = NS["geo"]

TKEY = ["subj", "pred", "obj", "obj_kind", "obj_lang", "obj_datatype"]


def _write(tmp_path, works_rows, writing_rows):
    works = pa.table({f.name: pa.array([r.get(f.name, "") for r in works_rows],
                                       f.type)
                      for f in synth.WORKS_SCHEMA})
    writing = pa.table({
        "record_id": pa.array([r[0] for r in writing_rows], pa.string()),
        "genre": pa.array([r[1] for r in writing_rows], pa.string()),
    })
    wp = str(tmp_path / "works.parquet")
    gp = str(tmp_path / "writing.parquet")
    pq.write_table(works, wp)
    pq.write_table(writing, gp)
    return wp, gp


class TestGoldenWork:
    def test_single_record(self, tmp_path):
        wp, gp = _write(tmp_path, [{
            "record_id": "r1", "title": "The Glass Orchard",
            "subtitle": "", "creator": "Margaret Blake",
            "creator_role": "author", "publisher": "Albion House",
            "pub_place": "Bath, Somerset", "pub_date": "1851-03-02",
            "lang": "en", "related_id": "", "related_type": "",
        }], [("r1", "poetry"), ("r1", "poetry"), ("r1", "memoir")])
        out = works_pipeline(wp, gp).to_pandas()
        W = DATA + "work_r1"
        A = W + "_creation"
        TS = W + "_timespan"
        P = DATA + "Margaret_Blake"
        PUB = DATA + "Albion_House_ORG"
        got = set(map(tuple, out[TKEY].fillna("").itertuples(index=False)))
        expected = {
            (W, RDF_TYPE, KG + "Work", "uri", "", ""),
            (W, KG + "hasTitle", "The Glass Orchard", "literal", "en", ""),
            (W, KG + "language", "en", "literal", "", ""),
            (A, RDF_TYPE, CRM + "E65_Creation", "uri", "", ""),
            (A, CRM + "P94_has_created", W, "uri", "", ""),
            (P, RDF_TYPE, CRM + "E21_Person", "uri", "", ""),
            (W, KG + "hasAuthor", P, "uri", "", ""),
            (W, KG + "hasPublisher", PUB, "uri", "", ""),
            (PUB, RDF_TYPE, KG + "Organization", "uri", "", ""),
            (W, KG + "publishedIn", GEO + "3000000/", "uri", "", ""),
            (A, CRM + "P4_has_time-span", TS, "uri", "", ""),
            (TS, KG + "dateLabel", "1851-03-02", "literal", "", "xsd:date"),
            (TS, SEM + "hasBeginTimeStamp", "1851-03-02T00:00:00",
             "literal", "", "xsd:dateTime"),
            (W, KG + "hasGenre", KG + "genre_poetry", "uri", "", ""),
            (W, KG + "hasGenre", KG + "genre_memoir", "uri", "", ""),
        }
        assert got == expected

    def test_related_item_link(self, tmp_path):
        wp, gp = _write(tmp_path, [
            {"record_id": "r1", "title": "A", "creator": "Margaret Blake",
             "creator_role": "author", "publisher": "Albion House",
             "pub_place": "Bath, Somerset", "pub_date": "1851", "lang": "en"},
            {"record_id": "r2", "title": "B", "creator": "Margaret Blake",
             "creator_role": "editor", "publisher": "Albion House",
             "pub_place": "Bath, Somerset", "pub_date": "1852", "lang": "en",
             "related_id": "r1", "related_type": "host"},
        ], [])
        out = works_pipeline(wp, gp).to_pandas()
        rel = out[out["pred"] == KG + "partOf"]
        assert len(rel) == 1
        assert rel.iloc[0]["subj"] == DATA + "work_r2"
        assert rel.iloc[0]["obj"] == DATA + "work_r1"
        assert (out["pred"] == KG + "hasEditor").sum() == 1

    def test_unparseable_and_gyear_dates(self, tmp_path):
        wp, gp = _write(tmp_path, [
            {"record_id": "r1", "title": "A", "creator": "Margaret Blake",
             "creator_role": "author", "publisher": "Albion House",
             "pub_place": "Nowhere, Atlantis", "pub_date": "1851",
             "lang": "en"},
        ], [])
        out = works_pipeline(wp, gp).to_pandas()
        dl = out[out["pred"] == KG + "dateLabel"]
        assert dl.iloc[0]["obj"] == "1851"
        assert dl.iloc[0]["obj_datatype"] == "xsd:gYear"
        # unmapped place stays a literal
        pl = out[out["pred"] == KG + "publishedIn"]
        assert pl.iloc[0]["obj_kind"] == "literal"
        assert pl.iloc[0]["obj"] == "Nowhere, Atlantis"


class TestGenreJoin:
    def test_build_genre_map_dedupes_and_sorts(self, tmp_path):
        _wp, gp = _write(tmp_path, [], [("r1", "b"), ("r1", "a"),
                                        ("r1", "b"), ("r2", "c")])
        m = build_genre_map(rd.read_parquet(gp))
        assert m == {"r1": ["a", "b"], "r2": ["c"]}

    def test_genres_used(self, tmp_path):
        _wp, gp = _write(tmp_path, [], [("r1", "b"), ("r2", "a"),
                                        ("r3", "b")])
        out = genres_used(rd.read_parquet(gp))
        assert list(out["genre"]) == ["a", "b"]


class TestSynthWorks:
    def test_deterministic_and_consistent(self, tmp_path):
        w1, g1 = synth.generate_works(100, seed=5)
        w2, g2 = synth.generate_works(100, seed=5)
        assert w1.equals(w2) and g1.equals(g2)
        # every related_id points at an existing earlier record
        recs = set(w1.column("record_id").to_pylist())
        for rid in w1.column("related_id").to_pylist():
            assert rid == "" or rid in recs
        out = works_pipeline(*synth.write_works(str(tmp_path), 100, seed=5))
        assert out.count() > 400


def test_fuzzy_places_opt_in_substitutes_typo():
    """modsBib parity knob: with fuzzy_places=True a close-typo place
    gets the gazetteer URI; default keeps the literal (exact-only)."""
    import pandas as pd

    from rdf_extraction_ray.pipelines.works import WorkTemplater
    from rdf_extraction_ray.state.fixtures import PLACES

    batch = pd.DataFrame({
        "record_id": ["r1"], "title": ["T"], "subtitle": [None],
        "lang": ["en"], "creator": ["Ann Example"],
        "creator_role": ["author"], "publisher": ["Pub"],
        "pub_place": ["Bathh, Somerset"],   # one-char typo
        "pub_date": [None], "related_id": [""], "related_type": [""],
    })
    strict = WorkTemplater()(batch.copy()).to_pandas()
    fuzzy = WorkTemplater(fuzzy_places=True)(batch.copy()).to_pandas()
    pub_s = strict[strict["pred"].str.endswith("publishedIn")]
    pub_f = fuzzy[fuzzy["pred"].str.endswith("publishedIn")]
    assert pub_s["obj"].iloc[0] == "Bathh, Somerset"   # literal kept
    assert pub_f["obj"].iloc[0] == PLACES["bath,somerset"]
