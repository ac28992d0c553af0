"""Standalone title-RDF-from-CSV operator (SURVEY §2.2 M26).

Re-expresses the reference's ``titles/title_extraction.py:26-104``:
a curated CSV of normalized titles where ``ct_islink`` points one row
at another; linked rows collapse into ONE title entity carrying both
labels and both (mapped) title types, unlinked rows become standalone
entities. Unknown title types are skipped (the reference's
``KeyError → continue``), and entity typing is ``bf:Title``-style —
here ``kg:Title`` plus the mapped work-type class.

Adaptation: the reference resolves links by CSV ROW POSITION
(``int(ct_islink) - 2``); the engine's CSV carries an explicit
``row_id`` column and links reference it directly — same semantics,
robust under distributed/row-order-free readers.

Scale shape: the CSV is a small curated side input (like the S3
dictionary loaders), so link resolution is a vectorized local pass;
the RDF templating then runs as a distributed ``map_batches`` over
the resolved mapping rows and feeds the shared triple dedup.
"""

from __future__ import annotations

import pandas as pd
import ray.data as rd

from ..functions.text import make_standard_uri
from ..namespaces import NS, TRIPLE_COLUMNS, uri

# reference TYPE_MAPPING (title_extraction.py:17-24)
TYPE_MAPPING = {
    "monographic": "standaloneWork",
    "analytic": "embeddedWork",
    "journal": "periodical",
    "series": "series",
    "unpublished": "unpublished",
}


def resolve_title_links(df: pd.DataFrame) -> pd.DataFrame:
    """CSV rows → flat mapping rows (key, label, title_type), one row
    per (entity key × carried label/type), mirroring the reference's
    ``csv_matches`` dict (title_extraction.py:26-60): a valid link
    merges source+target into one entry registered under BOTH titles,
    labels/types ordered [target, source]; rows already consumed by a
    link are skipped."""
    rows = df.to_dict("records")
    by_id = {r["row_id"]: r for r in rows}
    seen: set = set()
    out = []
    for r in rows:
        if r["row_id"] in seen:
            continue
        link = r.get("ct_islink")
        target = None
        try:
            target = by_id.get(int(link))
        except (TypeError, ValueError):
            target = None
        if target is not None and target["row_id"] != r["row_id"]:
            labels = [target["normalized"], r["normalized"]]
            types = [target["titletype"], r["titletype"]]
            for key in (r["normalized"], target["normalized"]):
                for lab, ty in zip(labels, types):
                    out.append({"key": key, "label": lab,
                                "title_type": ty})
            seen.add(r["row_id"])
            seen.add(target["row_id"])
        else:
            out.append({"key": r["normalized"], "label": r["normalized"],
                        "title_type": r["titletype"]})
    return pd.DataFrame(out)


def _template(batch: pd.DataFrame) -> pd.DataFrame:
    subj = batch["key"].map(lambda t: make_standard_uri(t + " TITLE"))
    parts = [
        pd.DataFrame({"subj": subj, "pred": NS["rdf"] + "type",
                      "obj": uri("kg", "Title"), "obj_kind": "uri"}),
        pd.DataFrame({"subj": subj, "pred": NS["rdfs"] + "label",
                      "obj": batch["label"], "obj_kind": "literal"}),
    ]
    mapped = batch["title_type"].str.lower().map(TYPE_MAPPING)
    ok = mapped.notna()
    if ok.any():
        parts.append(pd.DataFrame({
            "subj": subj[ok], "pred": NS["rdf"] + "type",
            "obj": mapped[ok].map(lambda c: uri("kg", c)),
            "obj_kind": "uri"}))
    out = pd.concat(parts, ignore_index=True)
    out["obj_lang"] = None
    out["obj_datatype"] = None
    out["conv_id"] = None
    out["turn_idx"] = None
    return out[TRIPLE_COLUMNS]


def title_rdf(csv_path: str) -> rd.Dataset:
    """CSV → deduped ``kg:Title`` triples (rdflib-graph set semantics
    via the shared two-level dedup)."""
    from ..stages.dedup import dedup_triples
    mapping = resolve_title_links(pd.read_csv(csv_path,
                                              keep_default_na=False))
    triples = rd.from_pandas(mapping).map_batches(
        _template, batch_format="pandas", batch_size=None)
    return dedup_triples(triples)
