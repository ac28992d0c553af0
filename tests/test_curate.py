"""Curation operators: PII redaction, repetition stats,
benchmark decontamination."""

import numpy as np
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
            "",  # empty -> no repetition, passes
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
    # an empty doc has NO repetition, so the gate passes it — filtering
    # empties is the length/quality gate's job, not this one's
    assert bool(out.loc[12, "repetition_ok"])


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


def test_incremental_dedup_planted_overlap():
    from rdf_extraction_ray.stages.curate import incremental_dedup
    snap = rd.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["alpha body", "beta body", "gamma body"]}))
    new = rd.from_pandas(pd.DataFrame({
        "doc_id": [10, 11, 12, 13],
        "text": ["beta body",            # exact match → dropped
                 "beta body ",           # trailing space → kept (exact)
                 "fresh content one",    # new → kept
                 "gamma body"]}))        # exact match → dropped
    kept = sorted(incremental_dedup(new, snap).to_pandas()["doc_id"])
    assert kept == [11, 12]


def test_incremental_dedup_small_bloom_false_positives():
    # a 64-bit bloom (m_log2=6) with 500 snapshot docs saturates —
    # nearly every probe is a bloom positive; the exact confirm join
    # must still produce the exact answer
    from rdf_extraction_ray.stages.curate import incremental_dedup
    snap = rd.from_pandas(pd.DataFrame({
        "doc_id": range(500),
        "text": [f"snapshot doc {i}" for i in range(500)]}))
    new = rd.from_pandas(pd.DataFrame({
        "doc_id": [1000, 1001, 1002],
        "text": ["snapshot doc 7", "genuinely new", "snapshot doc 499"]}))
    kept = sorted(incremental_dedup(new, snap,
                                    m_log2=6).to_pandas()["doc_id"])
    assert kept == [1001]


def test_source_cap_deterministic_quota():
    import hashlib

    from rdf_extraction_ray.stages.curate import source_cap
    df = pd.DataFrame({
        "doc_id": range(40),
        "source": ["a"] * 30 + ["b"] * 10})
    out = source_cap(rd.from_pandas(df), cap=5).to_pandas()
    assert out.groupby("source").size().to_dict() == {"a": 5, "b": 5}
    # the pick is the 5 smallest md5(doc_id) rank keys per source
    rk = {d: int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16)
          for d in df["doc_id"]}
    for src, grp in df.groupby("source"):
        want = set(sorted(grp["doc_id"], key=lambda d: (rk[d], d))[:5])
        got = set(out.loc[out["source"] == src, "doc_id"])
        assert got == want, src


def test_source_cap_local_prune_matches_single_block():
    # many small blocks (local prune engaged) vs one block: same pick
    from rdf_extraction_ray.stages.curate import source_cap
    df = pd.DataFrame({"doc_id": range(200),
                       "source": [f"s{i % 3}" for i in range(200)]})
    one = source_cap(rd.from_pandas(df), cap=7).to_pandas()
    many = source_cap(rd.from_pandas(df).repartition(20),
                      cap=7).to_pandas()
    key = ["doc_id", "source"]
    assert one.sort_values(key, ignore_index=True).equals(
        many.sort_values(key, ignore_index=True))


def test_dup_span_stats_planted():
    from rdf_extraction_ray.stages.dedup_docs import dup_span_stats
    shared = "one two three four five six seven eight nine ten"
    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [f"{shared} tail one", f"head {shared}",
                 "completely different words " * 4]}))
    out = (dup_span_stats(docs, n_words=10).to_pandas()
           .set_index("doc_id").sort_index())
    # docs 1 and 2 share exactly the one 10-word window
    assert out.loc[1, "n_dup_spans"] == 1
    assert out.loc[2, "n_dup_spans"] == 1
    assert out.loc[3, "n_dup_spans"] == 0
    # totals: doc1 has 12 words → 3 windows; doc2 11 words → 2
    assert out.loc[1, "n_spans"] == 3
    assert out.loc[2, "n_spans"] == 2


def test_dup_span_stats_within_doc_repeat():
    # a window repeated INSIDE one doc counts at both locations
    from rdf_extraction_ray.stages.dedup_docs import dup_span_stats
    run = "a b c d e f g h i j"
    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": [5], "text": [f"{run} {run}"]}))
    out = dup_span_stats(docs, n_words=10).to_pandas()
    # 20 words → 11 windows; windows at pos 0 and pos 10 are the same
    assert int(out["n_spans"].iloc[0]) == 11
    assert int(out["n_dup_spans"].iloc[0]) == 2


def test_train_shards_deterministic_and_partitioned(tmp_path):
    import os

    import ray.data as rd

    from rdf_extraction_ray.stages.curate import (
        train_shard_assignment,
        write_train_shards,
    )
    df = pd.DataFrame({"doc_id": np.arange(40), "text": "x"})
    a1 = (train_shard_assignment(rd.from_pandas(df), n_shards=4)
          .to_pandas().sort_values("doc_id", ignore_index=True))
    a2 = (train_shard_assignment(rd.from_pandas(df.sample(frac=1.0,
                                                          random_state=0)),
                                 n_shards=4)
          .to_pandas().sort_values("doc_id", ignore_index=True))
    # assignment is a pure function of ids — input order irrelevant
    assert a1.equals(a2)
    # positions are dense 0..k-1 within each shard
    for _, g in a1.groupby("shard"):
        assert sorted(g["pos"]) == list(range(len(g)))
    out = str(tmp_path / "shards")
    write_train_shards(rd.from_pandas(df), out, n_shards=4)
    dirs = {d for d in os.listdir(out) if d.startswith("shard=")}
    assert dirs == {f"shard={s}" for s in a1["shard"].unique()}


def test_pii_redacts_ten_digit_phone_whole():
    from rdf_extraction_ray.stages.curate import pii_redact
    df = pd.DataFrame({"doc_id": [0],
                       "text": ["call 555-123-4567 or 555-0199 now"]})
    out = pii_redact(df)
    assert out.loc[0, "n_phone"] == 2
    red = out.loc[0, "text_redacted"]
    assert "555-" not in red and red.count("[PHONE]") == 2


def test_repetition_short_clean_doc_passes():
    from rdf_extraction_ray.stages.curate import repetition_stats
    df = pd.DataFrame({"doc_id": [0, 1],
                       "text": ["one two three four five six seven",
                                "spam spam spam spam spam spam"]})
    out = repetition_stats(df)
    assert bool(out.loc[0, "repetition_ok"])      # short but clean
    assert not bool(out.loc[1, "repetition_ok"])  # actual repetition


def test_strip_boilerplate_planted_footer():
    from rdf_extraction_ray.stages.curate import strip_boilerplate
    footer = "(c) example corp - all rights reserved"
    df = pd.DataFrame({
        "doc_id": range(6),
        "text": [f"body text {i}\n{footer}\nunique line {i}"
                 for i in range(5)] + ["no footer here at all"]})
    out = (strip_boilerplate(rd.from_pandas(df), min_df=5)
           .to_pandas().sort_values("doc_id", ignore_index=True))
    for i in range(5):
        assert out.loc[i, "n_removed"] == 1
        assert footer not in out.loc[i, "text_clean"]
        assert f"unique line {i}" in out.loc[i, "text_clean"]
    assert out.loc[5, "n_removed"] == 0
    assert out.loc[5, "text_clean"] == "no footer here at all"


def test_train_shards_resume_skips_published_and_is_byte_identical(tmp_path):
    """A run killed after shard 0 resumes: the re-run skips the
    published shard (its files are never rewritten — byte-identical
    across resumes) and fills in only the missing shards."""
    import hashlib
    import os

    import ray.data as rd

    from rdf_extraction_ray.stages.curate import write_train_shards

    def _files(root):
        out = {}
        for dirpath, _, names in os.walk(root):
            for n in names:
                p = os.path.join(dirpath, n)
                with open(p, "rb") as f:
                    out[os.path.relpath(p, root)] = \
                        hashlib.md5(f.read()).hexdigest()
        return out

    df = pd.DataFrame({"doc_id": np.arange(64), "text": "x"})
    out = str(tmp_path / "shards")

    # simulate a run killed after publishing only shard 0
    r1 = write_train_shards(rd.from_pandas(df), out, n_shards=4,
                            fingerprint="fp1", shards=[0])
    assert r1 == {"written": [0], "skipped": []}
    assert os.listdir(out) == ["shard=0"]
    shard0_before = _files(os.path.join(out, "shard=0"))
    assert "_SHARD.json" in shard0_before

    # resume: shard 0 skipped, 1-3 written; shard 0 byte-identical
    r2 = write_train_shards(rd.from_pandas(df), out, n_shards=4,
                            fingerprint="fp1")
    assert r2 == {"written": [1, 2, 3], "skipped": [0]}
    assert _files(os.path.join(out, "shard=0")) == shard0_before

    # fully-published output: a further re-run is a no-op
    all_before = _files(out)
    r3 = write_train_shards(rd.from_pandas(df), out, n_shards=4,
                            fingerprint="fp1")
    assert r3 == {"written": [], "skipped": [0, 1, 2, 3]}
    assert _files(out) == all_before

    # the full resumed output matches a clean one-shot run row-for-row
    clean = str(tmp_path / "clean")
    write_train_shards(rd.from_pandas(df), clean, n_shards=4,
                       fingerprint="fp1")
    import pyarrow.parquet as pq
    for s in range(4):
        a = pq.read_table(os.path.join(out, f"shard={s}"),
                          ignore_prefixes=["_"]).to_pandas()
        b = pq.read_table(os.path.join(clean, f"shard={s}"),
                          ignore_prefixes=["_"]).to_pandas()
        assert a.sort_values("doc_id", ignore_index=True).equals(
            b.sort_values("doc_id", ignore_index=True))

    # a changed input fingerprint invalidates every shard
    r4 = write_train_shards(rd.from_pandas(df), out, n_shards=4,
                            fingerprint="fp2")
    assert r4["skipped"] == [] and r4["written"] == [0, 1, 2, 3]


def test_run_curation_resumes_full_chain(tmp_path, monkeypatch):
    """End-to-end resume of the composed curation DAG (gate → dedup →
    shards): a run killed mid-sink resumes from the survivor
    checkpoint — the gate/dedup stages are NOT recomputed (asserted
    by poisoning quality_score) and only missing shards are written;
    touching the input invalidates the checkpoint."""
    import os
    import shutil

    import pyarrow.parquet as pq

    import rdf_extraction_ray.stages.textstats as TS
    from rdf_extraction_ray.stages.curate import run_curation

    long = ("a reasonably long sentence with plenty of words in it "
            "for the quality gate to accept without any complaint")
    df = pd.DataFrame({
        "doc_id": range(6),
        "text": [long, long, long + " tail", "short", long + " tail",
                 long + " other"]})
    inp = str(tmp_path / "docs.parquet")
    df.to_parquet(inp)
    out = str(tmp_path / "out")

    r1 = run_curation(inp, out, n_shards=4)
    assert (r1["docs_in"], r1["docs_out"]) == (6, 3)
    assert not r1["resumed"]
    assert r1["shards"]["written"] == [0, 1, 2, 3]
    full = pd.read_parquet(out).sort_values("doc_id",
                                            ignore_index=True)
    assert full["doc_id"].tolist() == [0, 2, 5]

    # simulate a crash after two shards published: delete the others
    shutil.rmtree(os.path.join(out, "shard=2"))
    shutil.rmtree(os.path.join(out, "shard=3"))

    real_qs = TS.quality_score

    def _boom(*a, **kw):
        raise AssertionError("gate recomputed despite checkpoint")

    monkeypatch.setattr(TS, "quality_score", _boom)
    r2 = run_curation(inp, out, n_shards=4)
    assert r2["resumed"]
    assert r2["shards"] == {"written": [2, 3], "skipped": [0, 1]}
    resumed = pd.read_parquet(out).sort_values("doc_id",
                                               ignore_index=True)
    pd.testing.assert_frame_equal(
        resumed[["doc_id", "text"]], full[["doc_id", "text"]])

    # a fully-published output is a no-op resume
    r3 = run_curation(inp, out, n_shards=4)
    assert r3["resumed"] and r3["shards"]["written"] == []

    # touching the input invalidates both checkpoints
    monkeypatch.setattr(TS, "quality_score", real_qs)
    df2 = pd.concat([df, pd.DataFrame(
        {"doc_id": [9], "text": [long + " nine"]})],
        ignore_index=True)
    df2.to_parquet(inp)
    r4 = run_curation(inp, out, n_shards=4)
    assert not r4["resumed"]
    assert (r4["docs_in"], r4["docs_out"]) == (7, 4)
    got = pd.read_parquet(out)
    assert sorted(got["doc_id"]) == [0, 2, 5, 9]


def test_run_curation_neardup_stage_and_two_level_resume(tmp_path,
                                                         monkeypatch):
    """neardup=True adds the checkpointed near-dup stage: a planted
    near-duplicate pair collapses to its longest member; a run killed
    mid-near-dup resumes from the exact checkpoint and redoes only
    near-dup (gate poisoned); a run killed mid-sink resumes from the
    FINAL checkpoint (near-dup poisoned too)."""
    import os
    import shutil

    import rdf_extraction_ray.stages.dedup_docs as DD
    import rdf_extraction_ray.stages.textstats as TS
    from rdf_extraction_ray.stages.curate import run_curation

    words = ("alpha bravo charlie delta echo foxtrot golf hotel "
             "india juliet kilo lima mike november oscar papa "
             "quebec romeo sierra tango uniform victor whiskey "
             "xray yankee zulu one two three four five six seven")
    near_a = words + " extra tail here"        # longest — the winner
    near_b = words                             # near-dup loser
    other = ("completely different content about ships and sails "
             "and harbors and tides and long voyages across seas "
             "with plenty of unrelated vocabulary in every line")
    df = pd.DataFrame({"doc_id": [1, 2, 3],
                       "text": [near_a, near_b, other]})
    inp = str(tmp_path / "docs.parquet")
    df.to_parquet(inp)
    out = str(tmp_path / "out")

    r1 = run_curation(inp, out, n_shards=2, neardup=True)
    assert not r1["resumed"]
    surv = pd.read_parquet(out)
    assert sorted(surv["doc_id"]) == [1, 3]  # loser 2 dropped

    # killed mid-near-dup: final checkpoint missing, exact present
    shutil.rmtree(os.path.join(out, "_survivors_neardup"))
    for d in list(os.listdir(out)):
        if d.startswith("shard="):
            shutil.rmtree(os.path.join(out, d))
    monkeypatch.setattr(TS, "quality_score",
                        lambda *a, **kw: (_ for _ in ()).throw(
                            AssertionError("gate recomputed")))
    r2 = run_curation(inp, out, n_shards=2, neardup=True)
    assert r2["resumed"] and r2["resumed_stage"] == "exact"
    surv2 = pd.read_parquet(out)
    assert sorted(surv2["doc_id"]) == [1, 3]

    # killed mid-sink: final checkpoint present — near-dup skipped too
    shutil.rmtree(os.path.join(out, "shard=0"))
    monkeypatch.setattr(DD, "ngram_jaccard_pairs",
                        lambda *a, **kw: (_ for _ in ()).throw(
                            AssertionError("near-dup recomputed")))
    r3 = run_curation(inp, out, n_shards=2, neardup=True)
    assert r3["resumed"] and r3["resumed_stage"] == "neardup"
    assert r3["shards"]["skipped"] == [1]
    surv3 = pd.read_parquet(out)
    assert sorted(surv3["doc_id"]) == [1, 3]


def test_run_curation_config_change_invalidates_shards(tmp_path):
    """Shard markers key on input + pipeline config: re-running with
    neardup toggled on the SAME input must rewrite the shards (the
    old markers would otherwise silently keep near-dup losers in the
    output while docs_out reports them removed)."""
    import random

    from rdf_extraction_ray.stages.curate import run_curation
    rng = random.Random(7)
    para = "".join(rng.choice("abcdefg hijk") for _ in range(400))
    df = pd.DataFrame({"doc_id": [1, 2, 3],
                       "text": [para + " one tail", "pre " + para,
                                "totally different " + "".join(
                                    rng.choice("mnopqr st")
                                    for _ in range(350))]})
    inp = str(tmp_path / "docs.parquet")
    df.to_parquet(inp)
    out = str(tmp_path / "out")

    r1 = run_curation(inp, out, n_shards=2)          # no near-dup
    assert r1["docs_out"] == 3
    assert sorted(pd.read_parquet(out)["doc_id"]) == [1, 2, 3]

    r2 = run_curation(inp, out, n_shards=2, neardup=True)
    assert r2["shards"]["written"] == [0, 1]  # config change: rewrite
    got = sorted(pd.read_parquet(out)["doc_id"])
    assert len(got) == r2["docs_out"] == 2  # a near-dup loser dropped


def test_train_shards_none_fingerprint_never_skips(tmp_path):
    """fingerprint=None means fingerprinting is DISABLED: a second
    run must rewrite instead of treating null==null as a match."""
    import ray.data as rd

    from rdf_extraction_ray.stages.curate import write_train_shards
    df = pd.DataFrame({"doc_id": np.arange(8), "text": "x"})
    out = str(tmp_path / "s")
    r1 = write_train_shards(rd.from_pandas(df), out, n_shards=2,
                            fingerprint=None)
    assert r1["written"] == [0, 1]
    r2 = write_train_shards(rd.from_pandas(df), out, n_shards=2,
                            fingerprint=None)
    assert r2 == {"written": [0, 1], "skipped": []}


def test_train_shards_shrinking_n_shards_removes_stale_dirs(tmp_path):
    """Shrinking n_shards must delete the higher-indexed shard dirs
    of the previous layout — otherwise a shard=* glob reads every
    row twice."""
    import os

    import ray.data as rd

    from rdf_extraction_ray.stages.curate import write_train_shards
    df = pd.DataFrame({"doc_id": np.arange(32), "text": "y"})
    out = str(tmp_path / "s")
    write_train_shards(rd.from_pandas(df), out, n_shards=8,
                       fingerprint="f")
    assert len([d for d in os.listdir(out)
                if d.startswith("shard=")]) == 8
    write_train_shards(rd.from_pandas(df), out, n_shards=2,
                       fingerprint="f")
    dirs = sorted(d for d in os.listdir(out)
                  if d.startswith("shard="))
    assert dirs == ["shard=0", "shard=1"]
    got = pd.read_parquet(out)
    assert sorted(got["doc_id"]) == list(range(32))  # each row once


def test_input_fingerprint_empty_dir_disables_checkpointing(tmp_path):
    from rdf_extraction_ray.stages.curate import _input_fingerprint
    d = tmp_path / "nested"
    (d / "shard=0").mkdir(parents=True)
    assert _input_fingerprint(str(d)) is None


def test_shard_sink_ignores_malformed_shard_dirs(tmp_path):
    """ADVICE r4: a foreign/malformed directory like ``shard=old``
    must be ignored by the marker scan, not abort the whole sink
    with a ValueError."""
    import os

    from rdf_extraction_ray.stages.curate import write_train_shards

    out = str(tmp_path / "out")
    os.makedirs(os.path.join(out, "shard=old"))
    df = pd.DataFrame({"doc_id": range(8),
                       "text": [f"doc {i}" for i in range(8)]})
    res = write_train_shards(rd.from_pandas(df), out, n_shards=2,
                             fingerprint="fpX")
    assert res["written"] == [0, 1]
    # the foreign dir survives untouched and unclaimed
    assert os.path.isdir(os.path.join(out, "shard=old"))
    got = pd.read_parquet(os.path.join(out, "shard=0"))
    assert len(got) > 0


def test_input_fingerprint_is_recursive(tmp_path):
    """ADVICE r4: a dir with top-level parquet PLUS nested/partitioned
    files must change fingerprint when only a nested file changes —
    otherwise a resumed run_curation semi-joins a stale survivor
    set."""
    import os
    import time

    from rdf_extraction_ray.stages.curate import _input_fingerprint

    root = tmp_path / "docs"
    nested = root / "part=0"
    nested.mkdir(parents=True)
    pd.DataFrame({"doc_id": [1], "text": ["top"]}).to_parquet(
        root / "top.parquet")
    nested_file = nested / "data.parquet"
    pd.DataFrame({"doc_id": [2], "text": ["deep"]}).to_parquet(
        nested_file)

    fp1 = _input_fingerprint(str(root))
    assert fp1 is not None
    # rewrite ONLY the nested file (same size is fine — mtime guards)
    time.sleep(0.01)
    pd.DataFrame({"doc_id": [3], "text": ["deep2"]}).to_parquet(
        nested_file)
    fp2 = _input_fingerprint(str(root))
    assert fp2 is not None and fp2 != fp1

    # no parquet anywhere → checkpointing disabled, not a collision
    empty = tmp_path / "empty"
    (empty / "sub").mkdir(parents=True)
    (empty / "sub" / "notes.txt").write_text("x")
    assert _input_fingerprint(str(empty)) is None


def test_run_curation_neardup_stays_distributed():
    """ADVICE r4: the near-dup loser resolution must not pull
    component membership / clustered rows to the driver — no
    ``to_pandas`` (or ray.put of an id map) anywhere in
    run_curation; winners resolve in a bucketed groupby and losers
    leave via a partitioned hash anti join."""
    import inspect

    from rdf_extraction_ray.stages.curate import run_curation

    src = inspect.getsource(run_curation)
    assert "to_pandas" not in src
    assert "ray.put" not in src
    assert 'groupby("cbucket")' in src
    assert 'how="anti"' in src
