"""Tokenizer-training / data-mixing operators: BPE adjacent-pair
counts and temperature-scaled source-mixture weights."""

import numpy as np
import pandas as pd
import ray.data as rd


class TestBpePairCounts:
    def test_known_corpus_counts(self):
        from rdf_extraction_ray.stages.textstats import bpe_pair_counts
        # vocab: "low" ×3, "lower" ×1  →  lo:4 ow:4 we:1 er:1
        df = pd.DataFrame({
            "doc_id": [1, 2],
            "text": ["low low", "low Lower!"]})
        out = bpe_pair_counts(rd.from_pandas(df), k=10)
        got = {(r.a, r.b): r.n for r in out.itertuples()}
        assert got == {("l", "o"): 4, ("o", "w"): 4,
                       ("w", "e"): 1, ("e", "r"): 1}
        # ordering: (n desc, a, b)
        assert out[["a", "b"]].values.tolist()[:2] == [["l", "o"],
                                                       ["o", "w"]]

    def test_weighting_is_by_word_frequency_not_vocab(self):
        from rdf_extraction_ray.stages.textstats import bpe_pair_counts
        df = pd.DataFrame({"doc_id": [1], "text": ["aa aa aa ab"]})
        out = bpe_pair_counts(rd.from_pandas(df), k=10)
        got = {(r.a, r.b): r.n for r in out.itertuples()}
        assert got == {("a", "a"): 3, ("a", "b"): 1}

    def test_single_char_words_and_empty(self):
        from rdf_extraction_ray.stages.textstats import bpe_pair_counts
        df = pd.DataFrame({"doc_id": [1], "text": ["a b c 1 2 3"]})
        out = bpe_pair_counts(rd.from_pandas(df), k=10)
        assert len(out) == 0
        assert list(out.columns) == ["a", "b", "n"]
        empty = bpe_pair_counts(
            rd.from_pandas(pd.DataFrame({"doc_id": [1], "text": [""]})))
        assert len(empty) == 0 and list(empty.columns) == ["a", "b", "n"]


class TestMixtureWeights:
    def test_alpha_half_upweights_small_sources(self):
        from rdf_extraction_ray.stages.textstats import mixture_weights
        df = pd.DataFrame({"source": ["big"] * 16 + ["small"]})
        out = mixture_weights(rd.from_pandas(df), alpha=0.5)
        assert out["source"].tolist() == ["big", "small"]
        assert out["n_docs"].tolist() == [16, 1]
        # weights: 4/(4+1), 1/(4+1)
        assert np.allclose(out["weight"], [0.8, 0.2])
        # small source oversampled vs its 1/17 natural share
        assert out.loc[1, "epochs_at_uniform"] > 1.0
        assert out.loc[0, "epochs_at_uniform"] < 1.0
        assert np.isclose(out["weight"].sum(), 1.0)

    def test_alpha_one_is_proportional(self):
        from rdf_extraction_ray.stages.textstats import mixture_weights
        df = pd.DataFrame({"source": ["a", "a", "a", "b"]})
        out = mixture_weights(rd.from_pandas(df), alpha=1.0)
        assert np.allclose(out["weight"], [0.75, 0.25])
        assert np.allclose(out["epochs_at_uniform"], [1.0, 1.0])

    def test_empty_is_typed(self):
        from rdf_extraction_ray.stages.textstats import mixture_weights
        out = mixture_weights(rd.from_pandas(
            pd.DataFrame({"source": pd.Series([], dtype=object)})))
        assert len(out) == 0
        assert list(out.columns) == ["source", "n_docs", "weight",
                                     "epochs_at_uniform"]


class TestBpeTrain:
    def test_greedy_merges_match_reference(self):
        from rdf_extraction_ray.stages.textstats import bpe_train
        # "ababab" x3 + "abc": round 1 must merge (a,b) with count
        # 3*3 + 1 = 10 (left-to-right: 'ababab' -> ab,ab,ab)
        df = pd.DataFrame({"text": ["ababab ababab", "ababab abc"]})
        out = bpe_train(rd.from_pandas(df).repartition(2), n_merges=2)
        assert list(out.iloc[0][["sym_a", "sym_b", "pair_count"]]) \
            == ["a", "b", 10]
        # round 2: after merging, 'ababab' = (ab)(ab)(ab) -> pairs
        # (ab,ab) x2 per word x3 words = 6; 'abc' gives (ab,c) x1
        assert list(out.iloc[1][["sym_a", "sym_b", "pair_count"]]) \
            == ["ab", "ab", 6]

    def test_overlap_run_parity(self):
        from rdf_extraction_ray.stages.textstats import bpe_train
        # 'aaaa' (word count 3): matches at 0,1,2 -> greedy keeps
        # 0 and 2 -> (aa)(aa); weighted pair count = 3 pos x 3 = 9
        df = pd.DataFrame({"text": ["aaaa aaaa aaaa"]})
        out = bpe_train(rd.from_pandas(df), n_merges=2)
        assert list(out.iloc[0][["sym_a", "sym_b", "pair_count"]]) \
            == ["a", "a", 9]
        # after round 1 the word is (aa)(aa) -> round 2 merges
        # (aa,aa): 1 pos x word count 3 = 3
        assert list(out.iloc[1][["sym_a", "sym_b", "pair_count"]]) \
            == ["aa", "aa", 3]

    def test_partition_invariant_and_empty(self):
        from rdf_extraction_ray.stages.textstats import bpe_train
        rng = np.random.default_rng(9)
        words = ["".join(rng.choice(list("abcde"), 6)) for _ in range(300)]
        df = pd.DataFrame({"text": [" ".join(words[i::7])
                                    for i in range(7)]})
        a = bpe_train(rd.from_pandas(df), n_merges=3)
        b = bpe_train(rd.from_pandas(df).repartition(5), n_merges=3)
        pd.testing.assert_frame_equal(a, b)
        empty = bpe_train(rd.from_pandas(
            pd.DataFrame({"text": pd.Series([], dtype=object)})))
        assert len(empty) == 0
        assert list(empty.columns) == ["merge_idx", "sym_a", "sym_b",
                                       "pair_count"]


class TestBpeTokenize:
    def test_counts_match_manual_application(self):
        from rdf_extraction_ray.stages.textstats import (
            bpe_tokenize_counts)
        df = pd.DataFrame({
            "doc_id": np.array([1, 2, 3], dtype="int64"),
            "text": ["the then there", "aaaa ab", "zzz"]})
        rules = [("t", "h"), ("th", "e"), ("a", "a")]
        out = bpe_tokenize_counts(rd.from_pandas(df).repartition(2),
                                  rules)
        got = {r.doc_id: (r.n_words, r.n_bpe_tokens)
               for r in out.itertuples()}
        # the->(the)=1; then->(the,n)=2; there->(the,r,e)=3
        # aaaa->(aa,aa)=2; ab->(a,b)=2; zzz->(z,z,z)=3
        assert got == {1: (3, 6), 2: (2, 4), 3: (1, 3)}

    def test_wordless_doc_omitted_and_empty(self):
        from rdf_extraction_ray.stages.textstats import (
            bpe_tokenize_counts)
        df = pd.DataFrame({"doc_id": np.array([7, 8], dtype="int64"),
                           "text": ["only words", "123 !!!"]})
        out = bpe_tokenize_counts(rd.from_pandas(df), [("o", "n")])
        assert list(out["doc_id"]) == [7]
        empty = bpe_tokenize_counts(rd.from_pandas(
            pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                          "text": pd.Series([], dtype=object)})),
            [("a", "b")])
        assert len(empty) == 0


def test_bpe_oracle_noop_on_collapsed_vocabulary(tmp_path):
    """A round with no remaining pairs must be a NO-OP in the SQL
    chain (LEFT JOIN ON TRUE), matching the engine's early break —
    a CROSS JOIN against the empty rule would wipe the symbol table
    and zero the tokenize oracle."""
    import duckdb

    import __ray_entry__ as E
    from rdf_extraction_ray.stages.textstats import (bpe_tokenize_counts,
                                                     bpe_train)
    df = pd.DataFrame({"doc_id": np.array([1, 2], dtype="int64"),
                       "text": ["ab ab", "ab"]})
    pq = str(tmp_path / "docs.parquet")
    df.to_parquet(pq)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * "
                f"FROM read_parquet('{pq}')")
    want_train = con.sql(E._bpe_train_sql(3)).df()
    got_train = bpe_train(rd.from_pandas(df), n_merges=3)
    # engine breaks after round 1 (vocab collapses to one symbol);
    # oracle rounds 2-3 must produce no rules and leave symbols alone
    assert len(got_train) == 1 and len(want_train) == 1
    assert list(want_train.iloc[0][["sym_a", "sym_b"]]) == ["a", "b"]
    rules = list(zip(got_train["sym_a"], got_train["sym_b"]))
    got_tok = bpe_tokenize_counts(rd.from_pandas(df), rules)
    want_tok = con.sql(E._bpe_tokenize_sql(3)).df()
    assert got_tok["n_bpe_tokens"].tolist() == [2, 1]
    assert want_tok["n_bpe_tokens"].astype("int64").tolist() == [2, 1]


class TestReviewPinsRound4:
    def test_fingerprint_non_ascii_matches_codepoint_oracle(self):
        """Engine fingerprints hash codepoints-mod-256 per CHARACTER
        position — byte-positioned UTF-8 windows silently diverged
        from the SQL oracle on any non-ASCII text."""
        import duckdb

        from rdf_extraction_ray.stages.textstats import fingerprint
        df = pd.DataFrame({
            "doc_id": [0, 1, 2],
            "text": ["café déjà vu résumé here",
                     "中文 text with 汉字 mixed in",
                     None]})
        eng = fingerprint(df)
        con = duckdb.connect()
        con.register("documents", df)
        ora = con.sql("""
            WITH norm AS (
                SELECT doc_id,
                       CASE WHEN length(t) < 8 THEN rpad(t, 8, '_')
                            ELSE t END AS t
                FROM (SELECT doc_id,
                             trim(regexp_replace(lower(coalesce(text,
                                                                '')),
                                                 '\\s+', ' ', 'g'))
                                 AS t
                      FROM documents))
            SELECT doc_id,
                   min(  (ord(substr(t, i, 1)) % 256)::BIGINT * 662062621900811
                       + (ord(substr(t, i + 1, 1)) % 256)::BIGINT * 5053913144281
                       + (ord(substr(t, i + 2, 1)) % 256)::BIGINT * 38579489651
                       + (ord(substr(t, i + 3, 1)) % 256)::BIGINT * 294499921
                       + (ord(substr(t, i + 4, 1)) % 256)::BIGINT * 2248091
                       + (ord(substr(t, i + 5, 1)) % 256)::BIGINT * 17161
                       + (ord(substr(t, i + 6, 1)) % 256)::BIGINT * 131
                       + (ord(substr(t, i + 7, 1)) % 256)::BIGINT)::BIGINT
                       AS fingerprint
            FROM norm, unnest(generate_series(1, length(t) - 7)) s(i)
            GROUP BY doc_id ORDER BY doc_id
        """).df()
        assert eng.sort_values("doc_id")["fingerprint"].tolist() \
            == ora["fingerprint"].astype("int64").tolist()

    def test_cdc_nan_text_emits_no_chunks(self):
        import numpy as np

        from rdf_extraction_ray.stages.textstats import cdc_chunks
        out = cdc_chunks(pd.DataFrame(
            {"doc_id": [1, 2], "text": [np.nan, None]}))
        assert len(out) == 0

    def test_emit_partials_bounded_under_mass_ties(self):
        import numpy as np

        from rdf_extraction_ray.stages.ann import (_emit_mink_partials,
                                                   _emit_topk_partials)
        sims = np.zeros((3, 500))  # every candidate ties
        ids = np.arange(500, dtype="int64")
        qids = np.arange(3, dtype="int64")
        out = _emit_topk_partials(sims, ids, qids, k=10)
        assert len(out) == 30  # k per query, not 1500
        # deterministic: the smallest neighbor ids survive
        assert out.loc[out["query_id"] == 0,
                       "neighbor_id"].tolist() == list(range(10))
        dists = np.zeros((2, 300), dtype="int64")
        out2 = _emit_mink_partials(dists, ids[:300],
                                   qids[:2], k=5)
        assert len(out2) == 10
        assert out2.loc[out2["query_id"] == 1,
                        "neighbor_id"].tolist() == list(range(5))
