"""Deterministic miniature mapping tables (FIXTURES.md T2).

Shapes mirror the reference's ``data/*.csv`` broadcast tables
(SURVEY §2.5 J1-J6): person alias → canonical URI (people_mapping.csv),
"settlement,region" → gazetteer URI (places.csv), org authority
(orgNames.csv), and the vocab term maps (occupation / cause-of-death /
cultural-form / education). Everything is generated from word lists in
code — no external data — and is small (<10k entries), so it ships to
each linker actor once via ``__init__``.
"""

from __future__ import annotations

from ..functions.text import clean_term, clean_term_stemmed, make_standard_uri
from ..namespaces import uri

# ---------------------------------------------------------------- people

_FIRST = [
    "Margaret", "Eleanor", "Harriet", "Dorothy", "Beatrice", "Florence",
    "Agnes", "Edith", "Lucy", "Clara", "Winifred", "Constance", "Maud",
    "Sylvia", "Vera", "Mabel", "Gwen", "Ida", "Nora", "Olive",
    "Arthur", "Edmund", "Walter", "Hugh", "Cedric", "Rupert",
    "Percival", "Lionel", "Gilbert", "Horace",
]
_LAST = [
    "Blake", "Hargreaves", "Whitfield", "Ashcombe", "Penrose", "Fairfax",
    "Lanyon", "Trevelyan", "Mortimer", "Kingsley", "Abernathy", "Calloway",
    "Drummond", "Ellsworth", "Farnsworth", "Goodwin", "Holloway",
    "Ingram", "Jessop", "Kirkwood",
]

# canonical person names: first_i × last_(i mod) — 60 deterministic names
PEOPLE: list[str] = [
    f"{_FIRST[i % len(_FIRST)]} {_LAST[(i * 7 + i // len(_FIRST)) % len(_LAST)]}"
    for i in range(60)
]

def _person_uri(name: str) -> str:
    return make_standard_uri(name, "data")

# alias dict: canonical name, initials form, and a nickname form all
# resolve to the canonical URI (role of people_mapping.csv, 7,148
# rows). An abbreviated surface shared by two people (e.g. the
# E.-initial form of Eleanor and Edmund Trevelyan) is AMBIGUOUS and
# excluded — a dict would otherwise silently keep the last writer and
# the linker would attach one person's facts to the other's node.
PERSON_ALIASES: dict[str, str] = {}
AMBIGUOUS_ALIASES: set[str] = set()
for _name in PEOPLE:
    _first, _last = _name.split(" ", 1)
    _u = _person_uri(_name)
    for _surface in (_name, f"{_first[0]}. {_last}", f"{_first} {_last[0]}."):
        _prev = PERSON_ALIASES.get(_surface)
        if _prev is not None and _prev != _u:
            AMBIGUOUS_ALIASES.add(_surface)
        else:
            PERSON_ALIASES[_surface] = _u
for _surface in AMBIGUOUS_ALIASES:
    PERSON_ALIASES.pop(_surface, None)

# writers table analogue: canonical uri → (id, sex) (writers_sex.csv)
WRITERS: dict[str, tuple[str, str]] = {
    _person_uri(n): (f"w{i:04d}", "FEMALE" if i % 3 else "MALE")
    for i, n in enumerate(PEOPLE)
}

# ---------------------------------------------------------------- places

_SETTLEMENTS = [
    "Bath", "Norwich", "Kendal", "Ludlow", "Falmouth", "Whitby", "Alnwick",
    "Hexham", "Tavistock", "Ripon", "Malton", "Bideford", "Frome",
    "Oswestry", "Thirsk", "Buxton", "Stroud", "Malvern", "Cromer", "Filey",
    "Dunster", "Lynton", "Clovelly", "Staithes", "Grasmere",
]
_REGIONS = [
    "Somerset", "Norfolk", "Cumbria", "Shropshire", "Cornwall", "Yorkshire",
    "Northumberland", "Devon", "Derbyshire", "Gloucestershire",
]

# gazetteer: "settlement,region" (cleaned) → geonames-style URI
# (places.csv / Utils/place.py:123-156). Every 7th settlement is left
# OUT of the gazetteer to exercise the miss counters (place.py:100-113).
PLACES: dict[str, str] = {}
PLACE_NAMES: list[tuple[str, str]] = []  # (settlement, region) incl. unmapped
for _i, _s in enumerate(_SETTLEMENTS):
    _r = _REGIONS[_i % len(_REGIONS)]
    PLACE_NAMES.append((_s, _r))
    if _i % 7 != 6:
        PLACES[clean_term(f"{_s},{_r}")] = uri("geo", f"{3000000 + _i * 17}/")

# ------------------------------------------------------------------ orgs

_ORG_WORDS = [
    "Athenaeum Society", "Circulating Library", "Philosophical Institute",
    "Temperance League", "Literary Fund", "Choral Union", "Botanical Club",
    "Mechanics Institute", "Antiquarian Society", "Dispensary Trust",
]
ORGS: dict[str, str] = {}
for _i, _s in enumerate(_SETTLEMENTS[:20]):
    _label = f"{_s} {_ORG_WORDS[_i % len(_ORG_WORDS)]}"
    ORGS[clean_term(_label)] = make_standard_uri(_label + " ORG", "data")

ORG_NAMES: list[str] = [
    f"{_s} {_ORG_WORDS[_i % len(_ORG_WORDS)]}" for _i, _s in enumerate(_SETTLEMENTS[:20])
]
# two orgs NOT in the authority list → standard-name fallback URIs
ORG_NAMES += ["Provincial Ballooning Guild", "Society of Gnomon Makers"]

# ----------------------------------------------------------- vocabularies

# occupation vocab (occupation_mapping.csv, matched via clean_term):
_JOBS = [
    "novelist", "governess", "printer", "milliner", "schoolmistress",
    "engraver", "apothecary", "bookbinder", "archivist", "translator",
    "botanist", "midwife", "stonemason", "lexicographer", "illustrator",
    "composer", "weaver", "brewer", "cartographer", "journalist",
]
OCCUPATIONS: dict[str, str] = {clean_term(j): uri("occ", j.replace(" ", "_")) for j in _JOBS}
# job mentioned in text but missing from vocab → literal fallback path
UNMAPPED_JOBS = ["ratcatcher", "mudlark"]

# cause-of-death vocab (COD_mapping, matched via plain clean_term):
_CAUSES = [
    "typhoid fever", "consumption", "scarlet fever", "apoplexy",
    "pneumonia", "cholera", "influenza", "dropsy", "smallpox", "pleurisy",
]
CAUSES: dict[str, str] = {clean_term(c): uri("cod", c.replace(" ", "_")) for c in _CAUSES}
UNMAPPED_CAUSES = ["a surfeit of lampreys"]

# cultural-form vocab (cf_mapping.csv, matched via the STEMMED cleaner so
# "Methodists"/"Methodism" both hit "methodist"):
_CF_TERMS = {
    "religion": ["Methodist", "Quaker", "Anglican", "Catholic", "Unitarian",
                 "Presbyterian", "Baptist"],
    "nationality": ["English", "Scottish", "Welsh", "Irish", "Cornish",
                    "Manx", "French"],
    "gender": ["female", "male", "nonbinary"],
    "class": ["gentry", "working class", "middle class", "aristocracy",
              "merchant class"],
    "language": ["English", "French", "Latin", "Welsh", "Gaelic", "Italian"],
}
CULTURAL_FORMS: dict[str, dict[str, str]] = {
    cat: {clean_term_stemmed(t): uri("cf", t.lower().replace(" ", "_"))
          for t in terms}
    for cat, terms in _CF_TERMS.items()
}
CF_SURFACES = _CF_TERMS  # surfaces used by the generator
UNMAPPED_CF = {"religion": ["Muggletonian"], "nationality": ["Ruritanian"]}

# family relation map (family_mapping.csv / lifeInfo.py:278-291):
# relation word → (predicate, inverse predicate by subject sex)
FAMILY_RELATIONS: dict[str, tuple[str, str, str]] = {
    # relation: (forward predicate, inverse if other is male, inverse if female/neutral)
    "mother": ("hasMother", "hasSon", "hasDaughter"),
    "father": ("hasFather", "hasSon", "hasDaughter"),
    "brother": ("hasBrother", "hasBrother", "hasSister"),
    "sister": ("hasSister", "hasBrother", "hasSister"),
    "husband": ("hasHusband", "hasHusband", "hasWife"),
    "wife": ("hasWife", "hasHusband", "hasWife"),
    "son": ("hasSon", "hasFather", "hasMother"),
    "daughter": ("hasDaughter", "hasFather", "hasMother"),
    "uncle": ("hasUncle", "hasNephew", "hasNiece"),
    "aunt": ("hasAunt", "hasNephew", "hasNiece"),
    "cousin": ("hasCousin", "hasCousin", "hasCousin"),
    "grandmother": ("hasGrandmother", "hasGrandson", "hasGranddaughter"),
}

# education vocab (education_mapping.csv):
DEGREES: dict[str, str] = {
    clean_term(d): uri("edu", d.replace(" ", "_"))
    for d in ["bachelor of arts", "master of arts", "doctorate", "diploma",
              "certificate", "licentiate"]
}
SUBJECTS = ["botany", "philology", "mathematics", "theology", "geology",
            "rhetoric", "astronomy", "chemistry"]

# nickname surfaces (personname.py:19-39 connotation dicts analogue):
NICKNAMES = ["The Fenland Sibyl", "Old Thunder", "The Alnwick Nightingale",
             "Mrs. Quill", "The Lady Cartographer", "Bo", "Fanny"]

# work titles for the title census (titles/readFiles.py):
TITLES = [
    "The Glass Orchard", "Letters from the Fens", "A Winter in Alnwick",
    "The Cartographer's Daughter", "Songs of the Tideline",
    "An Inquiry into Mosses", "The Penrose Papers", "Collected Sermons",
    "The Midnight Packet", "Recollections of a Governess",
]

# childlessness classifier vocabulary (lifeInfo.py:80-106): keyword →
# reproductiveHistory category
CHILDLESSNESS_WORDS: dict[str, list[str]] = {
    "birthControl": ["contraception", "birth control", "family planning"],
    "adoption": ["adopted", "adoption"],
    "childlessness": ["childless", "no children", "no surviving children"],
    "miscarriage": ["miscarriage", "miscarried"],
    "stillbirth": ["stillborn", "stillbirth"],
    "abortion": ["abortion"],
}

BURIAL_KEYWORDS = ["buried", "grave", "interred"]  # birthDeath.py:15

# other-contexts vocab (other_contexts.py:14-109 categories):
HEALTH_CONDITIONS = ["melancholia", "rheumatism", "a weak constitution",
                     "failing eyesight", "nervous exhaustion"]
LEISURE_PURSUITS = ["botanizing", "watercolour painting", "archery",
                    "sea-bathing", "amateur theatricals"]


# ------------------------------------------------------------ seed triples

def vocab_labels() -> dict[str, str]:
    """URI → English label for every closed-vocabulary term (the J9
    label join side; reference reviewTerms.py:35-63 reads these from
    the published vocab graphs)."""
    labels: dict[str, str] = {}
    for j in _JOBS:
        labels[uri("occ", j.replace(" ", "_"))] = j
    for c in _CAUSES:
        labels[uri("cod", c.replace(" ", "_"))] = c
    for terms in _CF_TERMS.values():
        for t in terms:
            labels[uri("cf", t.lower().replace(" ", "_"))] = t
    for d in ("bachelor of arts", "master of arts", "doctorate", "diploma",
              "certificate", "licentiate"):
        labels[uri("edu", d.replace(" ", "_"))] = d
    return labels


def seed_triples_table():
    """Static seed graph merged into the corpus output (the
    ``additional_triples.ttl`` / ``organizations.ttl`` analogue,
    reference ``Utils/utilities.py:552-556``,
    ``Biography/combineTriples.py:90``): writer sameAs links, org
    authority labels, and vocab term labels. Returns an Arrow table in
    the triple schema (provenance columns empty — corpus-level)."""
    import pyarrow as pa

    from ..namespaces import NS, TRIPLE_COLUMNS
    rows: list[tuple[str, str, str, str, str, str]] = []
    label = NS["rdfs"] + "label"
    for i, (puri, (wid, _sex)) in enumerate(sorted(WRITERS.items())):
        rows.append((puri, NS["kg"] + "sameAs",
                     uri("wd", f"Q{9_000_000 + i}"), "uri", "", ""))
        rows.append((puri, NS["kg"] + "writerId", wid, "literal", "", ""))
    for clean, ouri in sorted(ORGS.items()):
        rows.append((ouri, label, clean, "literal", "en", ""))
    for vuri, vlabel in sorted(vocab_labels().items()):
        rows.append((vuri, label, vlabel, "literal", "en", ""))
    cols = list(zip(*rows))
    data = {
        "subj": pa.array(cols[0], pa.string()),
        "pred": pa.array(cols[1], pa.string()),
        "obj": pa.array(cols[2], pa.string()),
        "obj_kind": pa.array(cols[3], pa.string()),
        "obj_lang": pa.array(cols[4], pa.string()),
        "obj_datatype": pa.array(cols[5], pa.string()),
        "conv_id": pa.array([""] * len(rows), pa.string()),
        "turn_idx": pa.array([-1] * len(rows), pa.int32()),
    }
    return pa.table({c: data[c] for c in TRIPLE_COLUMNS})


def build_linker_maps() -> dict:
    """All broadcast dictionaries in one bundle for the linker actor."""
    return {
        "people": dict(PERSON_ALIASES),
        "writers": dict(WRITERS),
        "places": dict(PLACES),
        "orgs": dict(ORGS),
        "occupations": dict(OCCUPATIONS),
        "causes": dict(CAUSES),
        "cultural_forms": {k: dict(v) for k, v in CULTURAL_FORMS.items()},
        "degrees": dict(DEGREES),
        "family": dict(FAMILY_RELATIONS),
    }
