"""RDF text serialization sinks (S6/S9): N-Triples, N-Quads, Turtle,
N3, RDF/XML, JSON-LD and TriX — the six ``-fmt`` formats of the
reference CLI plus quads.

The reference serializes its uber graph through rdflib's format
plugins (``Utils/utilities.py:546-562``, formats listed at
``utilities.py:807-808``) and emits context-provenance quads via
``ConjunctiveGraph.serialize`` (``Huviz/huvizQuads.py:129-144``).
Here serialization is a vectorized ``map_batches`` formatter over the
triple table plus a distributed file sink — each block becomes one
``.nt``/``.nq`` shard, so a 100 TB graph serializes without ever
concentrating on the driver.

N-Quads derive the named graph from provenance: the graph IRI is the
conversation node (``data:{conv_id}``), mirroring huvizQuads' use of
the source context as the fourth term.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from ..namespaces import NS

_ESCAPES = str.maketrans({
    "\\": "\\\\", '"': '\\"', "\n": "\\n", "\r": "\\r", "\t": "\\t",
})


def _term_columns(batch: pd.DataFrame) -> pd.Series:
    """Vectorized object-term rendering: URI, plain/lang/typed literal."""
    obj = batch["obj"].astype(str)
    kind = batch["obj_kind"]
    lang = batch["obj_lang"].fillna("")
    dtype = batch["obj_datatype"].fillna("")

    lit = '"' + obj.str.translate(_ESCAPES) + '"'
    lit = np.where(lang != "", lit + "@" + lang, lit)
    # datatype column stores CURIEs (e.g. "xsd:date") — expand to IRIs
    dt_iri = dtype.map(lambda d: NS[d.split(":", 1)[0]] + d.split(":", 1)[1]
                       if ":" in d else "")
    lit = np.where((lang == "") & (dtype != ""),
                   lit + "^^<" + dt_iri + ">", lit)
    return pd.Series(np.where(kind == "uri", "<" + obj + ">", lit),
                     index=batch.index)


def format_ntriples(batch: pd.DataFrame) -> pd.DataFrame:
    """Triple rows → one ``line`` column of N-Triples text."""
    term = _term_columns(batch)
    line = ("<" + batch["subj"].astype(str) + "> <"
            + batch["pred"].astype(str) + "> " + term + " .")
    return pd.DataFrame({"line": line})


def quad_graph_term(conv_ids: pd.Series) -> pd.Series:
    """THE graph-term rule of the quad layout: the conversation node
    in the data namespace, ``corpus`` for a NULL conv_id. One shared
    definition — the N-Quads sink and the SPARQL quads view
    (``__ray_entry__._quads_view``) must never drift (reference
    analogue: named-graph quads, Huviz/huvizQuads.py:15,129-140)."""
    return NS["data"] + conv_ids.fillna("corpus").astype(str)


def format_nquads(batch: pd.DataFrame) -> pd.DataFrame:
    """Triple rows → N-Quads lines; graph = the conversation node."""
    term = _term_columns(batch)
    graph = quad_graph_term(batch["conv_id"])
    line = ("<" + batch["subj"].astype(str) + "> <"
            + batch["pred"].astype(str) + "> " + term + " <" + graph + "> .")
    return pd.DataFrame({"line": line})


def _line_sink(file_format: str, header: str = "", footer: str = "",
               sep: str = "\n"):
    from ray.data.datasource import BlockBasedFileDatasink
    from ray.data.block import BlockAccessor

    class LineFileDatasink(BlockBasedFileDatasink):
        def __init__(self, path: str):
            super().__init__(path, file_format=file_format)

        def write_block_to_file(self, block: BlockAccessor, file) -> None:
            lines = block.to_arrow().column("line").to_pylist()
            file.write((header + sep.join(lines) + footer
                        + "\n").encode("utf-8"))

    return LineFileDatasink


def write_ntriples(triples: rd.Dataset, path: str) -> None:
    """Distributed ``.nt`` sink: one shard file per block."""
    lines = triples.map_batches(format_ntriples, batch_format="pandas")
    lines.write_datasink(_line_sink("nt")(path))


def write_nquads(triples: rd.Dataset, path: str) -> None:
    """Distributed ``.nq`` sink with conversation-derived named graphs."""
    lines = triples.map_batches(format_nquads, batch_format="pandas")
    lines.write_datasink(_line_sink("nq")(path))


# ------------------------------------------------- prefixed formats
#
# Turtle / N3 / RDF-XML / JSON-LD / TriX — the remaining reference
# ``-fmt`` formats (utilities.py:807-808). Every shard file is a
# complete, self-contained document (prefix header / XML envelope), so
# a 100 TB graph serializes as N independent valid documents without
# driver concentration — the uber-file semantics of the reference are
# recovered by concatenating shard graphs (RDF graphs are sets).

def _curie_series(col: pd.Series) -> pd.Series:
    """Vectorized URI → CURIE compression against the closed NS table;
    URIs that do not fit a prefix (or whose local name is not a safe
    PN_LOCAL) stay as ``<full-iri>``."""
    import re as _re
    local_ok = _re.compile(r"^[A-Za-z0-9_][A-Za-z0-9_\-]*$")
    out = pd.Series("<" + col.astype(str) + ">", index=col.index)
    done = pd.Series(False, index=col.index)
    for prefix, base in NS.items():
        m = ~done & col.str.startswith(base)
        if not m.any():
            continue
        local = col[m].str.slice(len(base))
        ok = local.map(lambda x: bool(local_ok.match(x)))
        idx = local.index[ok]
        out.loc[idx] = prefix + ":" + local[ok]
        done.loc[idx] = True
    return out


def _turtle_object(batch: pd.DataFrame) -> pd.Series:
    """Object term in Turtle: CURIE/IRI for uris, escaped literal with
    @lang / ^^curie-datatype otherwise."""
    obj = batch["obj"].astype(str)
    kind = batch["obj_kind"]
    lang = batch["obj_lang"].fillna("")
    dtype = batch["obj_datatype"].fillna("")
    lit = '"' + obj.str.translate(_ESCAPES) + '"'
    lit = np.where(lang != "", lit + "@" + lang, lit)
    lit = np.where((lang == "") & (dtype != ""), lit + "^^" + dtype, lit)
    uri_term = _curie_series(obj)
    return pd.Series(np.where(kind == "uri", uri_term, lit),
                     index=batch.index)


def turtle_header() -> str:
    return "".join(f"@prefix {p}: <{b}> .\n" for p, b in NS.items()) + "\n"


def format_turtle(batch: pd.DataFrame, group: bool = False) -> pd.DataFrame:
    """Triple rows → Turtle statement lines (no header).

    ``group=False``: one self-contained statement per triple —
    deterministic row-per-triple output (the ``kg_turtle`` query).
    ``group=True``: sort by subject and join same-subject runs with
    ``;`` — the compact form the file sink writes.
    """
    b = batch.sort_values(["subj", "pred"], kind="stable") if group \
        else batch
    subj = _curie_series(b["subj"].astype(str))
    pred = _curie_series(b["pred"].astype(str))
    pred = pred.where(pred != "rdf:type", "a")
    obj = _turtle_object(b)
    if not group:
        return pd.DataFrame({"line": subj + " " + pred + " " + obj + " ."})
    first = b["subj"].ne(b["subj"].shift())
    last = b["subj"].ne(b["subj"].shift(-1))
    head = np.where(first, subj + " ", "    ")
    tail = np.where(last, " .", " ;")
    return pd.DataFrame({"line": head + pred + " " + obj + tail})


_XML_ESC = str.maketrans({"&": "&amp;", "<": "&lt;", ">": "&gt;",
                          '"': "&quot;"})


def _xml_datatype(dtype: pd.Series) -> pd.Series:
    return dtype.map(lambda d: NS[d.split(":", 1)[0]] + d.split(":", 1)[1]
                     if ":" in d else "")


def rdfxml_header() -> str:
    decls = "".join(f'\n    xmlns:{p}="{b}"' for p, b in NS.items())
    return f'<?xml version="1.0" encoding="utf-8"?>\n<rdf:RDF{decls}>\n'


def format_rdfxml(batch: pd.DataFrame) -> pd.DataFrame:
    """Triple rows → one ``<rdf:Description>`` element per row (an
    about-grouped form is a concatenation concern; per-row elements
    keep the output deterministic and block-independent)."""
    subj = batch["subj"].astype(str).str.translate(_XML_ESC)
    pred_curie = _curie_series(batch["pred"].astype(str))
    # a predicate outside the closed NS table cannot use the CURIE
    # fallback ("<iri>" is not a legal XML element name): split the
    # IRI at its last '#'/'/' and declare the namespace inline
    pred_open = pred_curie.copy()
    pred_close = pred_curie.copy()
    oob = pred_curie.str.startswith("<")
    if oob.any():
        parts = batch.loc[oob, "pred"].astype(str).str.extract(
            r"^(?P<base>.*[#/])(?P<local>[A-Za-z_][A-Za-z0-9_.\-]*)$")
        bad = parts["local"].isna()
        if bad.any():
            raise ValueError(
                "predicate IRI not serializable as RDF/XML (no legal "
                f"local name): {batch.loc[oob, 'pred'][bad].iloc[0]!r}")
        pred_open[oob] = ("ns1:" + parts["local"]
                          + ' xmlns:ns1="'
                          + parts["base"].str.translate(_XML_ESC) + '"')
        pred_close[oob] = "ns1:" + parts["local"]
    obj = batch["obj"].astype(str)
    kind = batch["obj_kind"]
    lang = batch["obj_lang"].fillna("")
    dtype = batch["obj_datatype"].fillna("")
    dt_iri = _xml_datatype(dtype)
    lit = obj.str.translate(_XML_ESC)
    attr = np.where(lang != "", ' xml:lang="' + lang + '"',
                    np.where(dtype != "",
                             ' rdf:datatype="' + dt_iri + '"', ""))
    el_lit = ("<" + pred_open + attr + ">" + lit + "</" + pred_close + ">")
    el_uri = ("<" + pred_open + ' rdf:resource="'
              + obj.str.translate(_XML_ESC) + '"/>')
    inner = np.where(kind == "uri", el_uri, el_lit)
    line = ('  <rdf:Description rdf:about="' + subj + '">'
            + inner + "</rdf:Description>")
    return pd.DataFrame({"line": line})


def write_rdfxml(triples: rd.Dataset, path: str) -> None:
    lines = triples.map_batches(format_rdfxml, batch_format="pandas")
    lines.write_datasink(_line_sink("rdf", header=rdfxml_header(),
                                    footer="\n</rdf:RDF>")(path))


def jsonld_header() -> str:
    import json
    ctx = json.dumps(dict(NS), sort_keys=True)
    return '{"@context": ' + ctx + ',\n "@graph": [\n'


def format_jsonld(batch: pd.DataFrame) -> pd.DataFrame:
    """Triple rows → one JSON-LD node object per SUBJECT found in the
    batch (subjects split across blocks merge by JSON-LD set
    semantics when the shards are combined).

    Vectorized: per-value JSON encoding is one C ``json.dumps`` call
    per scalar (byte-identical escaping to the reference encoder),
    and the node assembly is two string group-concats — values per
    (subj, pred) in row encounter order, then sorted predicate keys
    per subject — instead of per-row dict building. Key order
    replicates ``json.dumps(sort_keys=True)``: CURIE predicates all
    start with a letter (> '@'), so ``"@id"`` always leads."""
    import json
    if not len(batch):
        return pd.DataFrame({"line": pd.Series([], dtype=object)})
    enc = json.dumps  # '"escaped"' — exact json string escaping
    g = batch.reset_index(drop=True)
    obj_e = g["obj"].map(enc)
    lang = g["obj_lang"].fillna("").astype(str)
    dtype = g["obj_datatype"].fillna("").astype(str)
    kind = g["obj_kind"].astype(str)
    # literal datatype CURIE -> IRI (NS is a small in-process dict)
    has_dt = dtype != ""
    iri = pd.Series("", index=g.index, dtype=object)
    if has_dt.any():
        parts = dtype[has_dt].str.split(":", n=1)
        base = parts.str[0].map(NS)
        if base.isna().any():
            # fail loudly like the rowwise encoder's NS[...] lookup
            # did — a silent NaN here would serialize as a bare
            # (unquoted, invalid-JSON) NaN token in the shard
            bad = dtype[has_dt][base.isna()].iloc[0]
            raise KeyError(
                f"unknown datatype prefix in {bad!r}: not in NS")
        iri[has_dt] = (base + parts.str[1]).map(enc)
    has_lang = lang != ""
    val = '{"@value": ' + obj_e + "}"
    val = val.where(~(has_dt & ~has_lang),
                    '{"@type": ' + iri + ', "@value": ' + obj_e + "}")
    val = val.where(~has_lang,
                    '{"@language": ' + lang.map(enc)
                    + ', "@value": ' + obj_e + "}")
    val = val.where(kind != "uri", '{"@id": ' + obj_e + "}")
    g = pd.DataFrame({"subj": g["subj"].astype(str),
                      "pred": g["pred"].astype(str), "val": val})
    # values per (subj, pred) keep row encounter order (stable sort);
    # groupby(sort=True) yields predicate keys in sorted order
    per_pred = (g.groupby(["subj", "pred"], sort=True)["val"]
                .agg(", ".join))
    kv = (pd.Series(per_pred.index.get_level_values("pred"),
                    index=per_pred.index).map(enc)
          + ": [" + per_pred + "]")
    per_subj = kv.groupby(level="subj", sort=True).agg(", ".join)
    lines = (' {"@id": '
             + pd.Series(per_subj.index, index=per_subj.index).map(enc)
             + ", " + per_subj + "}")
    return pd.DataFrame({"line": lines.to_numpy(dtype=object)})


def write_jsonld(triples: rd.Dataset, path: str) -> None:
    lines = triples.map_batches(format_jsonld, batch_format="pandas")
    lines.write_datasink(_line_sink("jsonld", header=jsonld_header(),
                                    footer="\n]}", sep=",\n")(path))


def trix_header() -> str:
    return ('<?xml version="1.0" encoding="utf-8"?>\n'
            '<TriX xmlns="http://www.w3.org/2004/03/trix/trix-1/">\n'
            "<graph>\n")


def format_trix(batch: pd.DataFrame) -> pd.DataFrame:
    """Triple rows → TriX ``<triple>`` elements (provenance quads get
    their graph from the conversation node, as in :func:`format_nquads`;
    TriX carries it as the enclosing graph URI element per row)."""
    subj = batch["subj"].astype(str).str.translate(_XML_ESC)
    pred = batch["pred"].astype(str).str.translate(_XML_ESC)
    obj = batch["obj"].astype(str)
    kind = batch["obj_kind"]
    lang = batch["obj_lang"].fillna("")
    dtype = batch["obj_datatype"].fillna("")
    dt_iri = _xml_datatype(dtype)
    lit = obj.str.translate(_XML_ESC)
    o_uri = "<uri>" + obj.str.translate(_XML_ESC) + "</uri>"
    o_plain = np.where(lang != "",
                       '<plainLiteral xml:lang="' + lang
                       + '">' + lit + "</plainLiteral>",
                       "<plainLiteral>" + lit + "</plainLiteral>")
    o_typed = ('<typedLiteral datatype="' + dt_iri + '">' + lit
               + "</typedLiteral>")
    o = np.where(kind == "uri", o_uri,
                 np.where((lang == "") & (dtype != ""), o_typed, o_plain))
    line = ("  <triple><uri>" + subj + "</uri><uri>" + pred
            + "</uri>" + o + "</triple>")
    return pd.DataFrame({"line": line})


def write_trix(triples: rd.Dataset, path: str) -> None:
    lines = triples.map_batches(format_trix, batch_format="pandas")
    lines.write_datasink(_line_sink("trix", header=trix_header(),
                                    footer="\n</graph>\n</TriX>")(path))


def write_turtle(triples: rd.Dataset, path: str, group: bool = True) -> None:
    """Distributed ``.ttl`` sink: each shard is a complete Turtle
    document with the namespace header."""
    lines = triples.map_batches(lambda b: format_turtle(b, group=group),
                                batch_format="pandas")
    lines.write_datasink(_line_sink("ttl", header=turtle_header())(path))


def write_n3(triples: rd.Dataset, path: str) -> None:
    """``.n3`` sink — the engine emits the Turtle subset of N3 (every
    Turtle document is valid N3), matching the reference's rdflib
    'n3' plugin usage."""
    lines = triples.map_batches(lambda b: format_turtle(b, group=True),
                                batch_format="pandas")
    lines.write_datasink(_line_sink("n3", header=turtle_header())(path))


WRITERS_BY_FORMAT = {
    "nt": write_ntriples, "nquads": write_nquads, "ttl": write_turtle,
    "n3": write_n3, "xml": write_rdfxml, "json-ld": write_jsonld,
    "trix": write_trix,
}
