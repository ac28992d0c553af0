"""Unit tests for the EntityLinker ladder (exact → stemmed → fuzzy →
miss) and canonicalization."""

import pandas as pd

from rdf_extraction_ray.functions.text import make_standard_uri
from rdf_extraction_ray.stages.extract import CAND_COLUMNS
from rdf_extraction_ray.stages.link import EntityLinker


def _facts(rows):
    base = {c: None for c in CAND_COLUMNS}
    out = []
    for r in rows:
        d = dict(base)
        d.update(conv_id="c1", turn_idx=1, seq=0, cand_idx=0,
                 snippet="s", bucket=0)
        d.update(r)
        out.append(d)
    return pd.DataFrame(out)


class TestLinker:
    def setup_method(self):
        self.lk = EntityLinker()

    def test_person_alias_canonicalization(self):
        canonical = make_standard_uri("Margaret Blake")
        for surface in ("Margaret Blake", "M. Blake", "Margaret B."):
            uri, status = self.lk.link_person(surface)
            assert uri == canonical
            assert status == "person=linked"

    def test_person_unknown_minted_deterministically(self):
        u1, s = self.lk.link_person("Zebulon Quince")
        u2, _ = self.lk.link_person("Zebulon Quince")
        assert u1 == u2 == make_standard_uri("Zebulon Quince")
        assert s == "person=minted"

    def test_place_gazetteer_hit_and_miss(self):
        uri, s = self.lk.link_place("Bath, Somerset")
        assert uri is not None and s == "place=linked"
        uri, s = self.lk.link_place("Atlantis, Nowhere")
        assert uri is None and s == "place=miss"

    def test_org_authority_vs_minted(self):
        uri, s = self.lk.link_org("Bath Athenaeum Society")
        assert s == "org=linked"
        uri, s = self.lk.link_org("Provincial Ballooning Guild")
        assert s == "org=minted" and uri.endswith("Provincial_Ballooning_Guild_ORG")

    def test_vocab_exact_stemmed_fuzzy_miss(self):
        # exact (cleaned)
        uri, s = self.lk.link_term("occupation", "paid", "Governess")
        assert s == "occ=linked"
        # stemmed cultural form: plural hits
        uri, s = self.lk.link_term("culturalform", "religion", "Methodists")
        assert s == "cf=linked" and uri.endswith("methodist")
        # fuzzy: typo within cutoff
        uri, s = self.lk.link_term("culturalform", "religion", "Quakker")
        assert s == "cf=fuzzy" and uri.endswith("quaker")
        # miss: falls through → literal handled by templating
        uri, s = self.lk.link_term("culturalform", "religion", "Muggletonian")
        assert uri is None and s == "cf=miss"
        # cause of death
        uri, s = self.lk.link_term("death", None, "typhoid fever")
        assert s == "cod=linked"
        uri, s = self.lk.link_term("death", None, "a surfeit of lampreys")
        assert s == "cod=miss"

    def test_batch_marks_unmapped_location_dropped(self):
        df = _facts([
            {"fact_type": "location", "person": "M. Blake",
             "place": "Atlantis, Nowhere", "category": "habitation"},
            {"fact_type": "location", "person": "M. Blake",
             "place": "Bath, Somerset", "category": "habitation"},
            {"fact_type": "birth", "person": "M. Blake",
             "place": "Atlantis, Nowhere", "date": "1851"},
        ])
        out = self.lk(df)
        assert out["dropped"].tolist() == [True, False, False]
        assert "place=miss" in out.iloc[0]["link_status"]

    def test_sex_lookup_for_inverse_relations(self):
        df = _facts([{"fact_type": "family", "person": "Margaret Blake",
                      "other": "Hugh Drummond", "term": "brother"}])
        out = self.lk(df)
        assert out.iloc[0]["person_sex"] in ("FEMALE", "MALE")
        assert out.iloc[0]["other_uri"] is not None
