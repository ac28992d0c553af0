"""Pure scalar function library (SURVEY.md §2.4 F1-F9).

These define output equality with the reference and are unit-tested in
``tests/test_functions.py``. They are called inside ``map_batches``
bodies — batch-at-a-time over Arrow/numpy columns.
"""

from .text import (
    remove_punctuation,
    make_standard_uri,
    clean_term,
    clean_term_stemmed,
    strip_all_whitespace,
    split_by_casing,
    limit_words,
    limit_to_full_sentences,
)
from .dates import date_parse, xsd_datatype_for, format_date_parts

__all__ = [
    "remove_punctuation",
    "make_standard_uri",
    "clean_term",
    "clean_term_stemmed",
    "strip_all_whitespace",
    "split_by_casing",
    "limit_words",
    "limit_to_full_sentences",
    "date_parse",
    "xsd_datatype_for",
    "format_date_parts",
]
