"""Broadcast lookup state: mapping tables + linker dictionaries.

The reference loads ~27k CSV rows of mapping tables into module-global
dicts at import time (``Utils/utilities.py:153-182`` etc.). Here they
are deterministic in-code fixtures (SURVEY §2.5: the small side of every
join), built once per linker actor in ``__init__`` — one copy per
actor, never re-shipped per batch.
"""

from .fixtures import (
    PEOPLE,
    PERSON_ALIASES,
    PLACES,
    ORGS,
    OCCUPATIONS,
    CAUSES,
    CULTURAL_FORMS,
    FAMILY_RELATIONS,
    DEGREES,
    SUBJECTS,
    TITLES,
    build_linker_maps,
)

__all__ = [
    "PEOPLE", "PERSON_ALIASES", "PLACES", "ORGS", "OCCUPATIONS",
    "CAUSES", "CULTURAL_FORMS", "FAMILY_RELATIONS", "DEGREES",
    "SUBJECTS", "TITLES", "build_linker_maps",
]
