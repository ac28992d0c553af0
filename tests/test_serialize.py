"""Round-trip tests for the RDF text sinks: every format's shard files
must be well-formed self-contained documents carrying exactly the
input triples (Turtle is parsed back with a mini reader and compared
term-for-term against the N-Triples output)."""

import glob
import json
import os
import xml.etree.ElementTree as ET

import pandas as pd
import pyarrow as pa
import ray.data as rd

from rdf_extraction_ray.namespaces import NS
from rdf_extraction_ray.stages.serialize import (
    format_ntriples,
    format_turtle,
    write_jsonld,
    write_n3,
    write_ntriples,
    write_rdfxml,
    write_trix,
    write_turtle,
)

_ROWS = [
    # uri object
    dict(subj=NS["data"] + "c1_context_0", pred=NS["rdf"] + "type",
         obj=NS["kg"] + "BirthContext", obj_kind="uri", obj_lang=None,
         obj_datatype=None, conv_id="c1", turn_idx=1),
    # plain literal with every escape
    dict(subj=NS["data"] + "Margaret_Blake", pred=NS["kg"] + "snippet",
         obj='say "hi"\\\n\tdone', obj_kind="literal", obj_lang="en",
         obj_datatype=None, conv_id="c1", turn_idx=1),
    # typed literal
    dict(subj=NS["data"] + "Margaret_Blake", pred=NS["kg"] + "hasBirthDate",
         obj="1851-03-02", obj_kind="literal", obj_lang=None,
         obj_datatype="xsd:date", conv_id="c1", turn_idx=2),
    # xml-hostile literal
    dict(subj=NS["data"] + "Margaret_Blake", pred=NS["kg"] + "snippet",
         obj="a <b> & \"c\"", obj_kind="literal", obj_lang=None,
         obj_datatype=None, conv_id="c2", turn_idx=0),
    # uri outside the closed namespaces (no CURIE possible)
    dict(subj="http://other.example.net/x", pred=NS["rdfs"] + "label",
         obj="ext", obj_kind="literal", obj_lang="en",
         obj_datatype=None, conv_id="c2", turn_idx=1),
]


def _triples_df():
    return pd.DataFrame(_ROWS)


def _triples_ds():
    return rd.from_arrow(pa.Table.from_pandas(_triples_df()))


def _read_shards(d, ext):
    files = sorted(glob.glob(os.path.join(d, f"*.{ext}")))
    assert files, f"no .{ext} shards in {d}"
    return [open(f, encoding="utf-8").read() for f in files]


def _nt_terms():
    """Canonical (subj-term, pred-term, obj-term) set from the NT
    formatter — ground truth for the Turtle round trip."""
    lines = format_ntriples(_triples_df())["line"]
    out = set()
    for ln in lines:
        s, p, rest = ln.split(" ", 2)
        assert rest.endswith(" .")
        out.add((s, p, rest[:-2]))
    return out


def _expand(term: str) -> str:
    """CURIE/keyword → NT term (mini Turtle semantics)."""
    if term == "a":
        return "<" + NS["rdf"] + "type>"
    if term.startswith("<") or term.startswith('"'):
        if "^^" in term and not term.endswith(">"):
            lit, dt = term.rsplit("^^", 1)
            p, local = dt.split(":", 1)
            return f"{lit}^^<{NS[p]}{local}>"
        return term
    p, local = term.split(":", 1)
    return "<" + NS[p] + local + ">"


def _parse_turtle(text: str):
    triples = set()
    subj = None
    for ln in text.splitlines():
        if not ln.strip() or ln.startswith("@prefix"):
            continue
        assert ln.endswith(" .") or ln.endswith(" ;")
        body = ln[:-2]
        if ln.startswith("    "):  # continuation of the current subject
            pred, obj = body.strip().split(" ", 1)
        else:
            subj_t, pred, obj = body.split(" ", 2)
            subj = _expand(subj_t)
        triples.add((subj, _expand(pred), _expand(obj)))
    return triples


class TestTurtle:
    def test_grouped_sink_round_trip(self, tmp_path):
        d = str(tmp_path / "ttl")
        write_turtle(_triples_ds(), d)
        got = set()
        for shard in _read_shards(d, "ttl"):
            assert shard.startswith("@prefix")
            got |= _parse_turtle(shard)
        assert got == _nt_terms()

    def test_ungrouped_lines_round_trip(self):
        lines = format_turtle(_triples_df())["line"]
        got = set()
        for ln in lines:
            s, p, o = ln[:-2].split(" ", 2)
            got.add((_expand(s), _expand(p), _expand(o)))
        assert got == _nt_terms()

    def test_n3_alias(self, tmp_path):
        d = str(tmp_path / "n3")
        write_n3(_triples_ds(), d)
        got = set()
        for shard in _read_shards(d, "n3"):
            got |= _parse_turtle(shard)
        assert got == _nt_terms()


class TestXmlFormats:
    def test_rdfxml_well_formed_and_complete(self, tmp_path):
        d = str(tmp_path / "xml")
        write_rdfxml(_triples_ds(), d)
        n_desc = 0
        for shard in _read_shards(d, "rdf"):
            root = ET.fromstring(shard)
            assert root.tag.endswith("RDF")
            descs = list(root)
            n_desc += len(descs)
            for desc in descs:
                assert len(list(desc)) == 1  # one predicate element per row
        assert n_desc == len(_ROWS)

    def test_rdfxml_resource_and_datatype(self, tmp_path):
        d = str(tmp_path / "xml2")
        write_rdfxml(_triples_ds(), d)
        text = "".join(_read_shards(d, "rdf"))
        assert f'rdf:resource="{NS["kg"]}BirthContext"' in text
        assert f'rdf:datatype="{NS["xsd"]}date"' in text
        assert "a &lt;b&gt; &amp; &quot;c&quot;" in text

    def test_trix_well_formed_and_complete(self, tmp_path):
        d = str(tmp_path / "trix")
        write_trix(_triples_ds(), d)
        n = 0
        for shard in _read_shards(d, "trix"):
            root = ET.fromstring(shard)
            ns = "{http://www.w3.org/2004/03/trix/trix-1/}"
            trips = root.findall(f"{ns}graph/{ns}triple")
            n += len(trips)
            for t in trips:
                kids = list(t)
                assert len(kids) == 3
                assert kids[0].tag == f"{ns}uri"
        assert n == len(_ROWS)


class TestJsonLd:
    def test_shards_are_json_and_complete(self, tmp_path):
        d = str(tmp_path / "jsonld")
        write_jsonld(_triples_ds(), d)
        n_vals = 0
        for shard in _read_shards(d, "jsonld"):
            doc = json.loads(shard)
            assert doc["@context"] == NS
            for node in doc["@graph"]:
                for k, vals in node.items():
                    if k == "@id":
                        continue
                    n_vals += len(vals)
        assert n_vals == len(_ROWS)

    def test_typed_and_lang_values(self, tmp_path):
        d = str(tmp_path / "jsonld2")
        write_jsonld(_triples_ds(), d)
        nodes = {}
        for shard in _read_shards(d, "jsonld"):
            for node in json.loads(shard)["@graph"]:
                nodes.setdefault(node["@id"], {}).update(
                    {k: v for k, v in node.items() if k != "@id"})
        mb = nodes[NS["data"] + "Margaret_Blake"]
        date_vals = mb[NS["kg"] + "hasBirthDate"]
        assert date_vals == [{"@value": "1851-03-02",
                              "@type": NS["xsd"] + "date"}]


class TestNt:
    def test_nt_sink_counts(self, tmp_path):
        d = str(tmp_path / "nt")
        write_ntriples(_triples_ds(), d)
        lines = [ln for shard in _read_shards(d, "nt")
                 for ln in shard.splitlines() if ln]
        assert len(lines) == len(_ROWS)
        assert {tuple([*ln.split(" ", 2)]) and ln for ln in lines}


class TestJsonldVectorized:
    def test_matches_rowwise_reference_encoder(self):
        """format_jsonld's group-concat assembly must be
        byte-identical to the row-at-a-time dict builder it replaced
        (values per pred in encounter order, keys sorted, exact
        json.dumps escaping)."""
        from rdf_extraction_ray.namespaces import NS
        from rdf_extraction_ray.stages.serialize import format_jsonld

        def rowwise(batch):
            rows = []
            for subj, g in batch.groupby("subj", sort=True):
                node = {"@id": subj}
                for _, r in g.iterrows():
                    if r["obj_kind"] == "uri":
                        val = {"@id": r["obj"]}
                    else:
                        val = {"@value": r["obj"]}
                        if r["obj_lang"]:
                            val["@language"] = r["obj_lang"]
                        elif r["obj_datatype"]:
                            d = r["obj_datatype"]
                            val["@type"] = (NS[d.split(":")[0]]
                                            + d.split(":")[1])
                    node.setdefault(r["pred"], []).append(val)
                rows.append(" " + json.dumps(node, sort_keys=True))
            return pd.DataFrame({"line": rows})

        batch = pd.DataFrame({
            "subj": ["s2", "s1", "s1", "s1", "s2", "s1"],
            "pred": ["rdf:type", "foaf:name", "foaf:name",
                     "cwrc:x", "oa:motiv", "rdf:type"],
            "obj": ["http://x/T", 'Ann "Quo\\te"\nß', "Bob",
                    "42", "http://y/m", "http://x/T2"],
            "obj_kind": ["uri", "literal", "literal", "literal",
                         "uri", "uri"],
            "obj_lang": [None, "en", None, None, None, None],
            "obj_datatype": [None, None, None, "xsd:integer",
                             None, None]})
        want = rowwise(batch)["line"].tolist()
        got = format_jsonld(batch)["line"].tolist()
        assert got == want
        for ln in got:  # every line is a valid JSON node object
            json.loads(ln)
        assert len(format_jsonld(batch.iloc[0:0])) == 0


def test_jsonld_unknown_datatype_prefix_is_loud():
    """A datatype CURIE whose prefix is missing from NS must raise
    (the rowwise encoder's KeyError contract) — a silent NaN would
    serialize as an unquoted invalid-JSON token."""
    import pytest

    from rdf_extraction_ray.stages.serialize import format_jsonld
    batch = pd.DataFrame({
        "subj": ["s"], "pred": ["p:x"], "obj": ["42"],
        "obj_kind": ["literal"], "obj_lang": [None],
        "obj_datatype": ["nosuchprefix:int"]})
    with pytest.raises(KeyError):
        format_jsonld(batch)
