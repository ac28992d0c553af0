"""Curation operators: PII redaction, repetition stats,
benchmark decontamination."""

import pandas as pd
import ray.data as rd

from rdf_extraction_ray.stages.curate import (benchmark_gram_set,
                                              decontaminate, pii_redact,
                                              repetition_stats)


def test_pii_redact_patterns_and_order():
    batch = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [
            "mail me at a.b+c@example.org now",
            "ssn 123-45-6789 then call 555-0142",
            "plain text, no pii at all",
        ]})
    out = pii_redact(batch)
    assert out["n_email"].tolist() == [1, 0, 0]
    assert out["n_ssn"].tolist() == [0, 1, 0]
    # SSN redacted FIRST, so its tail can't be double-counted as phone
    assert out["n_phone"].tolist() == [0, 1, 0]
    assert out["text_redacted"][0] == "mail me at [EMAIL] now"
    assert out["text_redacted"][1] == "ssn [SSN] then call [PHONE]"
    assert out["text_redacted"][2] == batch["text"][2]


def test_pii_redact_null_and_empty():
    batch = pd.DataFrame({"doc_id": [1, 2], "text": [None, ""]})
    out = pii_redact(batch)
    assert out["n_email"].tolist() == [0, 0]
    assert out["text_redacted"].tolist() == ["", ""]


def test_repetition_stats_gate():
    batch = pd.DataFrame({
        "doc_id": [10, 11, 12],
        "text": [
            # top word 'spam' 6/12 -> fails word gate
            "spam spam spam spam spam spam a b c d e f",
            # all distinct words, distinct bigrams -> passes
            "alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu",
            "",  # empty -> fails (0*5 < 0 is False)
        ]})
    out = repetition_stats(batch).set_index("doc_id")
    assert out.loc[10, "n_words_r"] == 12
    assert out.loc[10, "max_word_n"] == 6
    assert not out.loc[10, "repetition_ok"]
    assert out.loc[11, "n_distinct_words"] == 12
    assert out.loc[11, "max_word_n"] == 1
    assert out.loc[11, "max_bigram_n"] == 1
    assert bool(out.loc[11, "repetition_ok"])
    assert out.loc[12, "n_words_r"] == 0
    assert not out.loc[12, "repetition_ok"]


def test_repetition_bigram_counts():
    # 'x y' appears 3 times; words x:3 y:3 of 6 total
    out = repetition_stats(pd.DataFrame(
        {"doc_id": [1], "text": ["x y x y x y"]})).iloc[0]
    assert out["n_words_r"] == 6
    assert out["max_word_n"] == 3
    assert out["max_bigram_n"] == 3  # 'x y' at positions 0,2,4


def test_decontaminate_planted_overlap():
    bench_text = "one two three four five six seven"
    corpus = rd.from_pandas(pd.DataFrame({
        "doc_id": [100, 101],
        "text": [
            # shares the 5-gram 'two three four five six'
            "zzz two three four five six qqq",
            "totally different words with no overlap at all here",
        ]}))
    bench = rd.from_pandas(pd.DataFrame({"doc_id": [0],
                                         "text": [bench_text]}))
    ref = benchmark_gram_set(bench)
    out = decontaminate(corpus, ref).to_pandas().set_index("doc_id")
    assert bool(out.loc[100, "contaminated"])
    # grams of doc 100 hitting the bench set: exactly the one window
    # fully inside the shared run
    assert out.loc[100, "n_hit_grams"] == 1
    assert not out.loc[101, "contaminated"]
    assert out.loc[101, "n_hit_grams"] == 0
