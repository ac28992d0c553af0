"""Deterministic synthetic transcript generator (FIXTURES.md T1).

Produces the ``input_hint`` table — ``(conv_id:string, turn_idx:int32,
role:string, text:string, tool:string, ts:timestamp[us])`` — whose turn
texts embed every structure the rebuilt extractors recover (SURVEY §2.2
/ FIXTURES.md): person mentions via alias surfaces, gazetteer-form
places, org names (with and without authority hits), work titles,
dates across the full 12-pattern ``date_parse`` waterfall plus
unparseable strings, certainty markers, burial keywords in the turn
after a death, childlessness vocabulary, moved/leaving patterns, vocab
term surfaces incl. stemming variants and near-miss typos.

Alongside the turns it returns the *planted facts* (same row shape as
the extractor's output) so tests can score extraction P/R and the
pipeline can be benchmarked on known ground truth. The generator never
calls extractor code — expectations are computed at plant time.

Everything is a pure function of ``(n_convs, seed)``.
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pyarrow as pa

from .state import fixtures as fx

# bump when generator output changes — cache paths embed it so stale
# /tmp corpora are never reused across versions
GENERATOR_VERSION = 5

TURNS_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
])

FACT_COLUMNS = [
    "conv_id", "turn_idx", "seq", "fact_type", "person", "other",
    "place", "place2", "term", "category", "date", "certainty",
    "title", "org", "amount",
]

_MONTHS_FULL = ["January", "February", "March", "April", "May", "June", "July",
                "August", "September", "October", "November", "December"]
_MONTHS_ABBR = ["Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul", "Aug", "Sep",
                "Oct", "Nov", "Dec"]

_BASE_TS = _dt.datetime(2026, 1, 1)


def _date_string(rng: np.random.Generator) -> str:
    """A date in one of the 12 waterfall formats, or (1/13) unparseable."""
    y = int(rng.integers(1790, 1900))
    m = int(rng.integers(1, 13))
    d = int(rng.integers(1, 28))
    kind = int(rng.integers(0, 13))
    if kind == 0:
        return f"{y}-{m:02d}-{d:02d}"
    if kind == 1:
        return f"{y}-{m:02d}-{d:02d}-"
    if kind == 2:
        return f"{y}--"
    if kind == 3:
        return f"{y}-"
    if kind == 4:
        return f"{y}"
    if kind == 5:
        return f"{y}-{m:02d}-"
    if kind == 6:
        return f"{y}-{m:02d}"
    if kind == 7:
        return f"{_MONTHS_FULL[m - 1]} {y}"
    if kind == 8:
        return f"{d} {_MONTHS_FULL[m - 1]} {y}"
    if kind == 9:
        return f"{y}-{m:02d}--"
    if kind == 10:
        return f"{_MONTHS_ABBR[m - 1]} {y}"
    if kind == 11:
        return f"{d} {_MONTHS_ABBR[m - 1]} {y}"
    return "the spring equinox of that year"  # unparseable → literal path


def _surface(rng: np.random.Generator, name: str) -> str:
    """Pick one of the alias surfaces for a canonical person, skipping
    surfaces shared by two people (those are excluded from the alias
    dict — see fixtures.AMBIGUOUS_ALIASES — so planting them would
    make the ground truth ambiguous)."""
    first, last = name.split(" ", 1)
    forms = [f for f in (name, f"{first[0]}. {last}", f"{first} {last[0]}.")
             if f not in fx.AMBIGUOUS_ALIASES]
    return forms[int(rng.integers(0, len(forms)))]


def _place(rng: np.random.Generator) -> str:
    s, r = fx.PLACE_NAMES[int(rng.integers(0, len(fx.PLACE_NAMES)))]
    return f"{s}, {r}"


class _Conv:
    """Accumulates one conversation's turns + planted facts."""

    def __init__(self, conv_id: str, subject: str):
        self.conv_id = conv_id
        self.subject = subject
        self.turns: list[tuple[str, str, str]] = []  # (role, text, tool)
        self.facts: list[dict] = []
        self.seq = 0
        self.moved_leaving: list[tuple[int, str]] = []  # (fact_list_pos, place)

    def turn(self, role: str, text: str, tool: str = "") -> int:
        self.turns.append((role, text, tool))
        return len(self.turns) - 1

    def fact(self, turn_idx: int, fact_type: str, **kw) -> dict:
        row = {c: None for c in FACT_COLUMNS}
        row.update(conv_id=self.conv_id, turn_idx=turn_idx, seq=self.seq,
                   fact_type=fact_type, **kw)
        self.facts.append(row)
        self.seq += 1
        return row


def _plant(rng: np.random.Generator, c: _Conv, prev_death: bool) -> bool:
    """Plant one fact turn; returns whether this turn was a death."""
    s = c.subject
    surf = _surface(rng, s)
    kind = int(rng.integers(0, 21))

    if prev_death and int(rng.integers(0, 2)) == 0:
        # burial keyword in the turn AFTER a death (birthDeath.py:15,237-256)
        place = _place(rng)
        kw = fx.BURIAL_KEYWORDS[int(rng.integers(0, 3))]
        i = c.turn("assistant", f"{surf} was {kw} in {place}.")
        c.fact(i, "burial", person=surf, place=place)
        return False

    if kind == 0:  # birth, with certainty-marker variants
        date = _date_string(rng)
        place = _place(rng)
        marker, cert = [("on", "CERT"), ("by", "BY"), ("after", "AFTER"),
                        ("around", "ROUGHLYDATED")][int(rng.integers(0, 4))]
        i = c.turn("assistant", f"{surf} was born {marker} {date} in {place}.")
        c.fact(i, "birth", person=surf, date=date, certainty=cert, place=place)
    elif kind == 1:  # death (+cause); occasionally an unmapped cause
        causes = fx._CAUSES + fx.UNMAPPED_CAUSES
        cause = causes[int(rng.integers(0, len(causes)))]
        date = _date_string(rng)
        place = _place(rng)
        i = c.turn("assistant", f"{surf} died of {cause} on {date} in {place}.")
        c.fact(i, "death", person=surf, term=cause, date=date,
               certainty="CERT", place=place)
        return True
    elif kind == 2:  # occupation paid / volunteer / income
        v = int(rng.integers(0, 3))
        if v == 2:
            amount = int(rng.integers(20, 900))
            i = c.turn("assistant", f"{surf} earned {amount} pounds a year.")
            c.fact(i, "income", person=surf, amount=str(amount))
        else:
            jobs = fx._JOBS + fx.UNMAPPED_JOBS
            job = jobs[int(rng.integers(0, len(jobs)))]
            verb = "worked as a" if v == 0 else "volunteered as a"
            i = c.turn("assistant", f"{surf} {verb} {job}.")
            c.fact(i, "occupation", person=surf, term=job,
                   category="paid" if v == 0 else "volunteer")
    elif kind == 3:  # simple locations
        verb, loc_kind = [("lived in", "habitation"), ("travelled to", "travel"),
                          ("visited", "visit")][int(rng.integers(0, 3))]
        place = _place(rng)
        i = c.turn("assistant", f"{surf} {verb} {place}.")
        c.fact(i, "location", person=surf, place=place, category=loc_kind)
    elif kind == 4:  # moved: relocation + (occurrence-checked) spatialRelationship
        a, b = _place(rng), _place(rng)
        i = c.turn("assistant", f"{surf} moved to {a}, leaving {b}.")
        c.fact(i, "location", person=surf, place=a, category="relocation")
        c.fact(i, "location", person=surf, place=b, category="spatialRelationship")
        c.moved_leaving.append((len(c.facts) - 1, b))
    elif kind == 5:  # migration: migration(to) + emigration(from)
        a, b = _place(rng), _place(rng)
        i = c.turn("assistant", f"{surf} migrated to {a} from {b}.")
        c.fact(i, "location", person=surf, place=a, category="migration")
        c.fact(i, "location", person=surf, place=b, category="emigration")
    elif kind == 6:  # cultural form: religion (incl. stem variants + typos)
        terms = fx.CF_SURFACES["religion"] + fx.UNMAPPED_CF["religion"] + ["Quakker"]
        t = terms[int(rng.integers(0, len(terms)))]
        if int(rng.integers(0, 3)) == 0 and t[-1].isalpha():
            t = t + "s"  # plural form — stemmed cleaner must still hit
        i = c.turn("assistant", f"{surf} was {t} by religion.")
        c.fact(i, "culturalform", person=surf, term=t, category="religion")
    elif kind == 7:  # cultural form: nationality
        terms = fx.CF_SURFACES["nationality"] + fx.UNMAPPED_CF["nationality"]
        t = terms[int(rng.integers(0, len(terms)))]
        i = c.turn("assistant", f"{surf} identified as {t}.")
        c.fact(i, "culturalform", person=surf, term=t, category="nationality")
    elif kind == 8:  # gender
        t = fx.CF_SURFACES["gender"][int(rng.integers(0, 3))]
        i = c.turn("assistant", f"{surf}'s gender was {t}.")
        c.fact(i, "culturalform", person=surf, term=t, category="gender")
    elif kind == 9:  # family relation (forward + sex-conditional inverse)
        rel = list(fx.FAMILY_RELATIONS)[int(rng.integers(0, len(fx.FAMILY_RELATIONS)))]
        other = fx.PEOPLE[int(rng.integers(0, len(fx.PEOPLE)))]
        if other == s:
            other = fx.PEOPLE[(fx.PEOPLE.index(s) + 1) % len(fx.PEOPLE)]
        osurf = _surface(rng, other)
        i = c.turn("assistant", f"{surf}'s {rel} was {osurf}.")
        c.fact(i, "family", person=surf, other=osurf, term=rel)
    elif kind == 10:  # friend / cohabitant
        other = fx.PEOPLE[int(rng.integers(0, len(fx.PEOPLE)))]
        if other == s:
            other = fx.PEOPLE[(fx.PEOPLE.index(s) + 3) % len(fx.PEOPLE)]
        osurf = _surface(rng, other)
        if int(rng.integers(0, 2)) == 0:
            i = c.turn("assistant", f"{surf} was a close friend of {osurf}.")
            c.fact(i, "friend", person=surf, other=osurf, category="friend")
        else:
            i = c.turn("assistant", f"{surf} lived with {osurf}.")
            c.fact(i, "friend", person=surf, other=osurf, category="cohabitant")
    elif kind == 11:  # childlessness vocabulary
        cat = list(fx.CHILDLESSNESS_WORDS)[int(rng.integers(0, len(fx.CHILDLESSNESS_WORDS)))]
        word = fx.CHILDLESSNESS_WORDS[cat][0]
        i = c.turn("assistant", f"Regarding children, {surf} was marked by {word}.")
        c.fact(i, "childlessness", person=surf, category=cat)
    elif kind == 12:  # education
        if int(rng.integers(0, 2)) == 0:
            subj = fx.SUBJECTS[int(rng.integers(0, len(fx.SUBJECTS)))]
            org = fx.ORG_NAMES[int(rng.integers(0, len(fx.ORG_NAMES)))]
            i = c.turn("assistant", f"{surf} studied {subj} at the {org}.")
            c.fact(i, "education", person=surf, term=subj, org=org, category="study")
        else:
            deg = ["bachelor of arts", "master of arts", "doctorate",
                   "diploma"][int(rng.integers(0, 4))]
            subj = fx.SUBJECTS[int(rng.integers(0, len(fx.SUBJECTS)))]
            i = c.turn("assistant", f"{surf} earned a {deg} in {subj}.")
            c.fact(i, "education", person=surf, term=deg, place2=subj, category="degree")
    elif kind == 13:  # work title (repeats across corpus drive the census)
        t = fx.TITLES[int(rng.integers(0, len(fx.TITLES)))]
        i = c.turn("assistant", f'{surf} wrote "{t}".')
        c.fact(i, "title", person=surf, title=t)
    elif kind == 15:  # person-name facts (personname.py:131-269)
        if int(rng.integers(0, 2)) == 0:
            nick = fx.NICKNAMES[int(rng.integers(0, len(fx.NICKNAMES)))]
            i = c.turn("assistant", f'{surf} was also known as "{nick}".')
            c.fact(i, "personname", person=surf, term=nick,
                   category="nickname")
        else:
            birth_name = fx.PEOPLE[int(rng.integers(0, len(fx.PEOPLE)))]
            i = c.turn("assistant", f"{surf}'s birth name was {birth_name}.")
            c.fact(i, "personname", person=surf, other=birth_name,
                   category="birthname")
    elif kind == 17:  # other contexts (other_contexts.py:14-109)
        v = int(rng.integers(0, 4))
        if v == 0:
            t = fx.HEALTH_CONDITIONS[int(rng.integers(0, len(fx.HEALTH_CONDITIONS)))]
            i = c.turn("assistant", f"{surf} suffered from {t}.")
            c.fact(i, "othercontext", person=surf, term=t, category="health")
        elif v == 1:
            place = _place(rng)
            i = c.turn("assistant", f"{surf} was assaulted in {place}.")
            c.fact(i, "othercontext", person=surf, place=place,
                   category="violence")
        elif v == 2:
            amount = int(rng.integers(100, 9000))
            i = c.turn("assistant",
                       f"{surf} inherited a fortune of {amount} pounds.")
            c.fact(i, "othercontext", person=surf, amount=str(amount),
                   category="wealth")
        else:
            t = fx.LEISURE_PURSUITS[int(rng.integers(0, len(fx.LEISURE_PURSUITS)))]
            i = c.turn("assistant", f"{surf} took pleasure in {t}.")
            c.fact(i, "othercontext", person=surf, term=t,
                   category="leisure")
    elif kind == 18:  # citation (Utils/citation.py:27-72)
        t = fx.TITLES[int(rng.integers(0, len(fx.TITLES)))]
        page = int(rng.integers(1, 400))
        i = c.turn("assistant",
                   f'This is recorded in "{t}", page {page}.')
        # no subject surface in the text — attributed to the
        # conversation subject (canonical name) downstream
        c.fact(i, "citation", person=s, title=t, amount=str(page))
    elif kind == 19:  # cultural form: class
        terms = fx.CF_SURFACES["class"]
        t = terms[int(rng.integers(0, len(terms)))]
        i = c.turn("assistant", f"{surf} belonged to the {t}.")
        c.fact(i, "culturalform", person=surf, term=t, category="class")
    elif kind == 20:  # cultural form: language competence
        terms = fx.CF_SURFACES["language"]
        t = terms[int(rng.integers(0, len(terms)))]
        comp = ["native", "acquired"][int(rng.integers(0, 2))]
        i = c.turn("assistant", f"{surf} spoke {t} with {comp} fluency.")
        c.fact(i, "culturalform", person=surf, term=t, category="language",
               certainty=comp.upper())
    elif kind == 16:  # author summary → profile literal (writing M16)
        frags = ["a novelist of quiet power", "an essayist of the first rank",
                 "a diarist of rare candour", "a poet of the northern coast"]
        words = " and ".join(frags[int(rng.integers(0, 4))]
                             for _ in range(int(rng.integers(1, 12))))
        i = c.turn("assistant", f"To summarise the oeuvre: {surf} was {words}.")
        c.fact(i, "profile", person=surf, term=f"{surf} was {words}.")
    else:  # org membership / biographer cue
        if int(rng.integers(0, 2)) == 0:
            org = fx.ORG_NAMES[int(rng.integers(0, len(fx.ORG_NAMES)))]
            i = c.turn("assistant", f"{surf} joined the {org}.")
            c.fact(i, "org", person=surf, org=org)
        else:
            other = fx.PEOPLE[int(rng.integers(0, len(fx.PEOPLE)))]
            role_word = ["biographer", "critic", "historian"][int(rng.integers(0, 3))]
            osurf = _surface(rng, other)
            i = c.turn("assistant",
                       f"Her {role_word} {osurf} recorded much of this.")
            # no subject surface in the text — attributed to the
            # conversation subject (canonical name) downstream
            c.fact(i, "biographer", person=s, other=osurf, category=role_word)
    return False


def _resolve_moved(c: _Conv) -> None:
    """Reproduce the reference's MOVED occurrence quirk per conversation
    (location.py:74-103 + pre-pass 126-141): a 'leaving X' place only
    yields a spatialRelationship fact if, after removing this occurrence,
    X appears in no other location mention of the same conversation
    (across ALL relation kinds)."""
    from collections import Counter
    occ = Counter(f["place"] for f in c.facts
                  if f["fact_type"] == "location" and f["place"])
    drop = {pos for pos, p in c.moved_leaving if occ[p] > 1}
    if not drop:
        return
    kept = [f for i, f in enumerate(c.facts) if i not in drop]
    # re-sequence so seq stays dense in turn order
    for new_seq, f in enumerate(kept):
        f["seq"] = new_seq
    c.facts = kept


_EVENT_DESCS = ["a great flood", "the county fair", "a solar eclipse",
                "the turnpike riots", "a travelling menagerie",
                "the cholera quarantine", "a grand regatta"]


def _freestanding_conv(rng: np.random.Generator, c: _Conv) -> None:
    """Person-less event conversation (freestanding_events.py:50-103)."""
    c.turn("user", "What notable events do the archives record?")
    for _ in range(int(rng.integers(2, 7))):
        date = _date_string(rng)
        desc = _EVENT_DESCS[int(rng.integers(0, len(_EVENT_DESCS)))]
        place = _place(rng)
        i = c.turn("assistant", f"On {date}, {desc} took place in {place}.")
        c.fact(i, "event", term=desc, date=date, place=place)


def generate(n_convs: int, seed: int = 42, mega_every: int = 500,
             events_every: int = 25) -> tuple[pa.Table, pa.Table]:
    """Generate ``(turns, planted_facts)`` Arrow tables.

    Every ``mega_every``-th conversation is a mega-conversation (~10×
    median turns) to exercise skew handling; every ``events_every``-th
    is a person-less freestanding-events conversation (M17).
    """
    rows_conv, rows_idx, rows_role, rows_text, rows_tool, rows_ts = [], [], [], [], [], []
    fact_rows: list[dict] = []
    for i in range(n_convs):
        rng = np.random.default_rng(seed * 1_000_003 + i)  # per-conv stream
        conv_id = f"conv{i:07d}"
        subject = fx.PEOPLE[i % len(fx.PEOPLE)]
        c = _Conv(conv_id, subject)
        c.turn("system", "You are a biographical research assistant.")
        if events_every and i % events_every == events_every - 2:
            _freestanding_conv(rng, c)
            base = _BASE_TS + _dt.timedelta(seconds=i * 3600)
            for idx, (role, text, tool) in enumerate(c.turns):
                rows_conv.append(conv_id)
                rows_idx.append(idx)
                rows_role.append(role)
                rows_text.append(text)
                rows_tool.append(tool)
                rows_ts.append(base + _dt.timedelta(seconds=idx * 37))
            fact_rows.extend(c.facts)
            continue
        c.turn("user", f"Tell me about {subject}.")
        n_facts = int(rng.integers(4, 20))
        if mega_every and i % mega_every == mega_every - 1:
            n_facts = int(rng.integers(150, 220))  # mega-conversation
        prev_death = False
        for _ in range(n_facts):
            if int(rng.integers(0, 5)) == 0:  # noise turns
                v = int(rng.integers(0, 3))
                if v == 0:
                    c.turn("user", "What happened next?")
                elif v == 1:
                    c.turn("tool", f"archive lookup results for {subject}",
                           tool="archive_search")
                else:
                    c.turn("assistant", "The records are unclear on this point.")
                continue
            prev_death = _plant(rng, c, prev_death)
        _resolve_moved(c)
        base = _BASE_TS + _dt.timedelta(seconds=i * 3600)
        for idx, (role, text, tool) in enumerate(c.turns):
            rows_conv.append(conv_id)
            rows_idx.append(idx)
            rows_role.append(role)
            rows_text.append(text)
            rows_tool.append(tool)
            rows_ts.append(base + _dt.timedelta(seconds=idx * 37))
        fact_rows.extend(c.facts)

    turns = pa.table({
        "conv_id": pa.array(rows_conv, pa.string()),
        "turn_idx": pa.array(rows_idx, pa.int32()),
        "role": pa.array(rows_role, pa.string()),
        "text": pa.array(rows_text, pa.string()),
        "tool": pa.array(rows_tool, pa.string()),
        "ts": pa.array(rows_ts, pa.timestamp("us")),
    }, schema=TURNS_SCHEMA)
    facts = pa.table({c: pa.array([r[c] for r in fact_rows],
                                  pa.int32() if c in ("turn_idx", "seq") else pa.string())
                      for c in FACT_COLUMNS})
    return turns, facts


_GENRES = ["poetry", "epistolary novel", "travel narrative", "sermon",
           "natural history", "memoir", "gothic romance", "ballad"]
_PUBLISHERS = ["Harrow and Sons", "The Minster Press", "Caxton Brothers",
               "Albion House", "The Quayside Press"]
_ROLES = ["author", "editor", "translator", "illustrator", "compiler"]
_RELATED = ["host", "series", "preceding", "succeeding"]

WORKS_SCHEMA = pa.schema([
    ("record_id", pa.string()),
    ("title", pa.string()),
    ("subtitle", pa.string()),
    ("creator", pa.string()),
    ("creator_role", pa.string()),
    ("publisher", pa.string()),
    ("pub_place", pa.string()),
    ("pub_date", pa.string()),
    ("lang", pa.string()),
    ("related_id", pa.string()),
    ("related_type", pa.string()),
])


def generate_works(n_works: int, seed: int = 42
                   ) -> tuple[pa.Table, pa.Table]:
    """Deterministic MODS-record analogue tables: ``works`` (one row
    per bibliography record, FLAT — related items are rows with a
    ``related_id`` back-reference, replacing modsBib's recursive
    sub-soups) and ``writing`` (the pass-1 genre side: one row per
    (record_id, genre), reference WritingParse)."""
    rng = np.random.default_rng(seed * 7_777_777)
    w_rows: list[dict] = []
    g_rows: list[dict] = []
    for i in range(n_works):
        rec = f"rec{i:06d}"
        title = fx.TITLES[i % len(fx.TITLES)]
        creator = fx.PEOPLE[int(rng.integers(0, len(fx.PEOPLE)))]
        related = int(rng.integers(0, 4)) == 0 and i > 0
        w_rows.append({
            "record_id": rec,
            "title": title,
            "subtitle": ("An Account in Several Parts"
                         if int(rng.integers(0, 3)) == 0 else ""),
            "creator": creator,
            "creator_role": _ROLES[int(rng.integers(0, len(_ROLES)))],
            "publisher": _PUBLISHERS[int(rng.integers(0, len(_PUBLISHERS)))],
            "pub_place": "{}, {}".format(
                *fx.PLACE_NAMES[int(rng.integers(0, len(fx.PLACE_NAMES)))]),
            "pub_date": _date_string(rng),
            "lang": ["en", "fr", "la"][int(rng.integers(0, 3))],
            "related_id": f"rec{int(rng.integers(0, i)):06d}" if related else "",
            "related_type": (_RELATED[int(rng.integers(0, len(_RELATED)))]
                             if related else ""),
        })
        for _ in range(int(rng.integers(0, 3))):
            g_rows.append({
                "record_id": rec,
                "genre": _GENRES[int(rng.integers(0, len(_GENRES)))],
            })
    works = pa.table({f.name: pa.array([r[f.name] for r in w_rows], f.type)
                      for f in WORKS_SCHEMA})
    writing = pa.table({
        "record_id": pa.array([r["record_id"] for r in g_rows], pa.string()),
        "genre": pa.array([r["genre"] for r in g_rows], pa.string()),
    })
    return works, writing


def write_works(path: str, n_works: int, seed: int = 42) -> tuple[str, str]:
    """Write works + writing tables; returns their paths."""
    import os
    import pyarrow.parquet as pq
    works, writing = generate_works(n_works, seed)
    os.makedirs(path, exist_ok=True)
    wp = os.path.join(path, "works.parquet")
    gp = os.path.join(path, "writing.parquet")
    pq.write_table(works, wp)
    pq.write_table(writing, gp)
    return wp, gp


_TITLE_TYPES = ["monographic", "analytic", "journal", "series",
                "unpublished", "broadside"]  # last one unmapped on purpose


def write_titles_csv(path: str, n_titles: int, seed: int = 42) -> str:
    """Deterministic curated-titles CSV (reference
    ``titles/title_extraction.py`` input shape): columns ``row_id,
    normalized, titletype, ct_islink``. ~20% of rows link a later row
    (explicit ``row_id`` reference); each row is source or target of
    at most ONE link and titles are unique, matching the invariants
    the reference's was_seen bookkeeping assumes. ~10% carry the
    'n'/''/'?' non-link markers, the rest empty."""
    import csv as _csv
    rng = np.random.default_rng(seed * 424_243)
    rows = []
    for i in range(n_titles):
        base = fx.TITLES[i % len(fx.TITLES)]
        rows.append({
            "row_id": i,
            "normalized": f"{base} No. {i}",
            "titletype": _TITLE_TYPES[int(rng.integers(
                0, len(_TITLE_TYPES)))],
            "ct_islink": ["n", "", "?"][int(rng.integers(0, 3))]
            if rng.integers(0, 10) == 0 else "",
        })
    used: set[int] = set()
    for i in range(n_titles):
        if i in used or rows[i]["ct_islink"] != "":
            continue
        if rng.integers(0, 5) == 0:
            free = [j for j in range(i + 1, min(i + 8, n_titles))
                    if j not in used and rows[j]["ct_islink"] == ""]
            if free:
                j = free[int(rng.integers(0, len(free)))]
                rows[i]["ct_islink"] = str(j)
                used.update((i, j))
    import os
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w", newline="") as f:
        w = _csv.DictWriter(f, fieldnames=["row_id", "normalized",
                                           "titletype", "ct_islink"])
        w.writeheader()
        w.writerows(rows)
    return path


def write_turns(path: str, n_convs: int, seed: int = 42,
                rows_per_file: int = 65_536) -> str:
    """Write the turns table as (possibly multi-file) Parquet; returns path."""
    import os
    import pyarrow.parquet as pq
    turns, _ = generate(n_convs, seed)
    os.makedirs(path, exist_ok=True)
    n = turns.num_rows
    nfiles = max(1, (n + rows_per_file - 1) // rows_per_file)
    for f in range(nfiles):
        chunk = turns.slice(f * rows_per_file, rows_per_file)
        pq.write_table(chunk, os.path.join(path, f"turns-{f:04d}.parquet"))
    return path
