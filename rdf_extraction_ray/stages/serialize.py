"""RDF text serialization sinks: N-Triples (S6) and N-Quads (S9).

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


def format_nquads(batch: pd.DataFrame) -> pd.DataFrame:
    """Triple rows → N-Quads lines; graph = the conversation node."""
    term = _term_columns(batch)
    graph = NS["data"] + batch["conv_id"].fillna("corpus").astype(str)
    line = ("<" + batch["subj"].astype(str) + "> <"
            + batch["pred"].astype(str) + "> " + term + " <" + graph + "> .")
    return pd.DataFrame({"line": line})


def _line_sink(file_format: str):
    from ray.data.datasource import BlockBasedFileDatasink
    from ray.data.block import BlockAccessor

    class LineFileDatasink(BlockBasedFileDatasink):
        def __init__(self, path: str):
            super().__init__(path, file_format=file_format)

        def write_block_to_file(self, block: BlockAccessor, file) -> None:
            lines = block.to_arrow().column("line").to_pylist()
            file.write(("\n".join(lines) + "\n").encode("utf-8"))

    return LineFileDatasink


def write_ntriples(triples: rd.Dataset, path: str) -> None:
    """Distributed ``.nt`` sink: one shard file per block."""
    lines = triples.map_batches(format_ntriples, batch_format="pandas")
    lines.write_datasink(_line_sink("nt")(path))


def write_nquads(triples: rd.Dataset, path: str) -> None:
    """Distributed ``.nq`` sink with conversation-derived named graphs."""
    lines = triples.map_batches(format_nquads, batch_format="pandas")
    lines.write_datasink(_line_sink("nq")(path))
