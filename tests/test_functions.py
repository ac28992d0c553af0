"""Unit tests for the scalar library (SURVEY §2.4 F1-F9) — these pin
the behaviors that define output equality with the reference."""

from rdf_extraction_ray.functions import (
    clean_term,
    clean_term_stemmed,
    date_parse,
    limit_to_full_sentences,
    limit_words,
    make_standard_uri,
    remove_punctuation,
    split_by_casing,
    strip_all_whitespace,
    xsd_datatype_for,
)
from rdf_extraction_ray.functions.dates import timestamp_predicate


class TestDateWaterfall:
    """12-pattern waterfall w/ end-of-period expansion
    (reference Utils/activity.py:82-169)."""

    def test_full_date(self):
        assert date_parse("1851-03-02") == (
            "1851-03-02T00:00:00", True, "1851-03-02T23:59:59")

    def test_full_date_trailing_dash(self):
        assert date_parse("1851-03-02-")[0] == "1851-03-02T00:00:00"

    def test_year_only(self):
        s, ok, e = date_parse("1851")
        assert (s, ok, e) == ("1851-01-01T00:00:00", True, "1851-12-31T23:59:59")

    def test_year_dashes(self):
        assert date_parse("1851--")[2] == "1851-12-31T23:59:59"
        assert date_parse("1851-")[1] is True

    def test_year_month(self):
        s, ok, e = date_parse("1851-03")
        assert (s, e) == ("1851-03-01T00:00:00", "1851-03-31T23:59:59")

    def test_year_month_december_rollover(self):
        assert date_parse("1851-12")[2] == "1851-12-31T23:59:59"

    def test_month_name_forms(self):
        assert date_parse("March 1851")[0] == "1851-03-01T00:00:00"
        assert date_parse("Mar 1851")[0] == "1851-03-01T00:00:00"
        assert date_parse("2 March 1851")[0] == "1851-03-02T00:00:00"
        assert date_parse("2 Mar 1851")[0] == "1851-03-02T00:00:00"

    def test_unparseable_roundtrips(self):
        s, ok, e = date_parse("the spring equinox of that year")
        assert ok is False and s == e == "the spring equinox of that year"

    def test_whitespace_stripped(self):
        assert date_parse("  1851 ")[1] is True


class TestXsdTyping:
    """Length-typed literals (reference Utils/event.py:90-110)."""

    def test_lengths(self):
        assert xsd_datatype_for("1851-03-02") == ("1851-03-02", "xsd:date")
        assert xsd_datatype_for("1851-03") == ("1851-03", "xsd:gYearMonth")
        assert xsd_datatype_for("1851") == ("1851", "xsd:gYear")
        assert xsd_datatype_for("1851-03-02T00:00:00") == (
            "1851-03-02T00:00:00", "xsd:dateTime")

    def test_trailing_dash_stripped_before_typing(self):
        assert xsd_datatype_for("1851--") == ("1851", "xsd:gYear")
        assert xsd_datatype_for("1851-03-") == ("1851-03", "xsd:gYearMonth")

    def test_untyped(self):
        assert xsd_datatype_for("around 1851") == ("around 1851", "")

    def test_length_rule_is_purely_lexical(self):
        # the reference types by LENGTH alone (event.py:90-110): any
        # 10-char string gets xsd:date — quirk preserved deliberately
        assert xsd_datatype_for("circa 1851") == ("circa 1851", "xsd:date")

    def test_certainty_predicates(self):
        assert timestamp_predicate("CERT") == "hasTimeStamp"
        assert timestamp_predicate("BY") == "hasLatestBeginTimeStamp"
        assert timestamp_predicate("AFTER") == "hasEarliestBeginTimeStamp"
        assert timestamp_predicate("ROUGHLYDATED") == "hasTime"
        assert timestamp_predicate("") == "hasTimeStamp"


class TestTextScalars:
    def test_remove_punctuation(self):
        assert remove_punctuation("O'Brien, Mary-Anne") == "OBrien_Mary-Anne"
        assert remove_punctuation("a-b", all_punct=True) == "ab"
        assert remove_punctuation("Aged 55 ¾") == "Aged_55_3-4"

    def test_make_standard_uri_deterministic(self):
        u1 = make_standard_uri("Margaret Blake")
        u2 = make_standard_uri("Margaret Blake")
        assert u1 == u2
        assert u1.endswith("Margaret_Blake")

    def test_clean_term(self):
        assert clean_term("Typhoid Fever") == "typhoidfever"
        assert clean_term("self-taught") == "selftaught"

    def test_clean_term_stemmed(self):
        # plural + ism/ist/ing/er stripping (culturalForm.py:513-521)
        assert clean_term_stemmed("Methodists") == "method"
        assert clean_term_stemmed("Methodism") == "method"
        assert clean_term_stemmed("Methodist") == "method"
        assert clean_term_stemmed("Quaker") == "quak"

    def test_limit_words(self):
        # reference doctest cases (utilities.py:242-263)
        assert limit_words("This is a sample string", 2) == "This is..."
        assert limit_words("This is a sample string", 10) == \
            "This is a sample string"

    def test_limit_to_full_sentences(self):
        out = limit_to_full_sentences("One two three. Four five six.", 4)
        assert out.endswith(".")
        assert limit_to_full_sentences("", 5) == ""

    def test_misc(self):
        assert strip_all_whitespace(" a b\tc ") == "abc"
        assert split_by_casing("birthPosition") == "birth Position"
