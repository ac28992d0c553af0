"""String normalization / URI-minting scalars.

Behavioral parity targets (semantics re-derived, not copied):
- ``remove_punctuation`` / ``make_standard_uri``:
  reference ``Utils/utilities.py:221-235, 307-322`` — strip punctuation
  (keep ``-``), spaces → ``_``, ASCII-fold unicode, then prepend a
  closed-namespace prefix.
- ``clean_term`` (plain + stemming variants):
  reference ``Biography/birthDeath.py:24-26`` and
  ``Biography/culturalForm.py:513-521``.
- ``limit_words`` / ``limit_to_full_sentences``:
  reference ``Utils/utilities.py:242-281`` (the only doctested
  functions in the reference).
"""

from __future__ import annotations

import re
import string as _string
import unicodedata

from ..namespaces import uri

# punctuation translation tables: keep "-" in the standard variant
_PUNCT_KEEP_HYPHEN = str.maketrans("", "", _string.punctuation.replace("-", ""))
_PUNCT_ALL = str.maketrans("", "", _string.punctuation)

# the reference special-cases a few glyphs before unidecode
_GLYPHS = {"¾": "3-4", "©": "c", "Ã": "A"}


def _ascii_fold(s: str) -> str:
    """Pure-stdlib stand-in for ``unidecode`` (not installed here):
    NFKD-decompose and drop combining marks / non-ASCII."""
    out = unicodedata.normalize("NFKD", s)
    return out.encode("ascii", "ignore").decode("ascii")


def remove_punctuation(s: str, all_punct: bool = False) -> str:
    """Strip punctuation (keeping ``-`` unless ``all_punct``), replace
    spaces with underscores, ASCII-fold."""
    for glyph, repl in _GLYPHS.items():
        s = s.replace(glyph, repl)
    s = s.translate(_PUNCT_ALL if all_punct else _PUNCT_KEEP_HYPHEN)
    s = s.replace(" ", "_")
    return _ascii_fold(s)


def make_standard_uri(std_str: str, ns: str = "data") -> str:
    """Deterministic URI minting from a standard name.

    Same string → same URI on every worker of every run; this property
    replaces the reference's in-RAM memo caches (SURVEY §2.5 J11).
    """
    return uri(ns, remove_punctuation(std_str))


def clean_term(s: str) -> str:
    """lower, de-hyphen, de-space (vocabulary lookup key, plain form)."""
    return s.lower().replace("-", " ").strip().replace(" ", "")


def clean_term_stemmed(s: str) -> str:
    """Plain clean + crude suffix stemming: strip trailing s / ism /
    ist / ing / er (cultural-form lookup key)."""
    s = clean_term(s)
    if s[-1:] == "s":
        s = s[:-1]
    if s[-3:] in ("ism", "ist", "ing"):
        s = s[:-3]
    if s[-2:] == "er":
        s = s[:-2]
    return s


def strip_all_whitespace(s: str) -> str:
    return re.sub(r"\s+", "", str(s))


def split_by_casing(s: str) -> str:
    """``"birthPosition"`` → ``"birth Position"`` (label prettifier)."""
    return " ".join(re.findall(r"^[a-z]+|[A-Z][^A-Z]*", s))


def limit_words(s: str, word_count: int) -> str:
    """Truncate to ``word_count`` words, appending ``...`` when cut.

    >>> limit_words("This is a sample string", 2)
    'This is...'
    >>> limit_words("This is a sample string", 10)
    'This is a sample string'
    """
    assert word_count > 0, "Invalid word count!"
    words = " ".join(str(s).split()).split(" ")
    out = " ".join(words[:word_count])
    if len(words) > word_count:
        out += "..."
    return out


def limit_to_full_sentences(s: str, max_words: int) -> str:
    """Keep whole sentences until ~``max_words`` words (snippet rule,
    MAX_WORD_COUNT=35 in the reference)."""
    s = s.strip()
    if s == "":
        return s
    text = ""
    for sentence in s.split("."):
        if text.count(" ") < max_words:
            text += sentence.strip()
            if text and text[-1] != ".":
                text += "."
        else:
            break
    return text.replace(".  .", ". ")
