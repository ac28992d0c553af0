"""Property-based tests (hypothesis) for the pure-python/numpy
kernels whose correctness claims are easy to state against a naive
reference implementation: the vocab-vectorized Levenshtein matcher
and the tie-deterministic ANN partial-emit + driver merge."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from rdf_extraction_ray.stages.ann import (
    _emit_topk_partials,
    _topk_from_partials,
)
from rdf_extraction_ray.stages.fuzzy import NO_DIST, NO_MATCH, VocabMatcher


def _ref_lev(a: str, b: str) -> int:
    """Textbook Wagner-Fischer, the naive reference."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (ca != cb))
        prev = cur
    return prev[len(b)]


@given(st.text(alphabet="abcx", max_size=8),
       st.lists(st.text(alphabet="abcx", min_size=1, max_size=8),
                min_size=1, max_size=5, unique=True))
@settings(max_examples=200, deadline=None)
def test_vocab_matcher_matches_reference_dp(s, vocab):
    m = VocabMatcher(vocab, max_dist=2)
    got = m._best(s)
    d, v = min((_ref_lev(s, w), w) for w in sorted(vocab))
    assert got == ((v, d) if d <= 2 else (NO_MATCH, NO_DIST))


@given(st.integers(0, 2**31 - 1), st.integers(1, 8),
       st.integers(2, 25), st.integers(1, 6))
@settings(max_examples=100, deadline=None)
def test_ann_partial_plus_merge_equals_reference_topk(seed, nq, nc, k):
    """partial emit (tie-complete) + driver merge == naive top-k by
    (cosine desc, neighbor_id asc) — including heavy-tie inputs."""
    rng = np.random.RandomState(seed)
    # few distinct values → many exact ties at the cutoff
    sims = rng.choice([-0.5, 0.0, 0.5, 1.0], size=(nq, nc))
    ids = rng.permutation(nc).astype("int64")
    q_ids = np.arange(nq, dtype="int64")
    got = _topk_from_partials(
        _emit_topk_partials(sims, ids, q_ids, k), k)
    for q in range(nq):
        order = sorted(range(nc), key=lambda j: (-sims[q, j], ids[j]))
        want = [ids[j] for j in order[:k]]
        g = got[got["query_id"] == q].sort_values("rank")
        assert g["neighbor_id"].tolist() == want, (q, sims[q], ids)


@given(st.integers(0, 2**31 - 1), st.integers(1, 30))
@settings(max_examples=100, deadline=None)
def test_ann_sentinel_rows_never_emit(seed, nc):
    rng = np.random.RandomState(seed)
    sims = np.full((2, nc), -2.0)        # fully masked rows
    sims[1, : max(1, nc // 2)] = 0.5     # row 1 has real candidates
    ids = np.arange(nc, dtype="int64")
    out = _emit_topk_partials(sims, ids, np.array([7, 8]), k=5)
    assert not (out["query_id"] == 7).any()
    assert (out[out["query_id"] == 8]["cosine"] > -1.5).all()


@given(st.lists(st.text(max_size=30), min_size=1, max_size=10))
@settings(max_examples=150, deadline=None)
def test_ntriples_literal_escaping_round_trips(texts):
    """format_ntriples literal escaping matches the canonical
    escape order for arbitrary object text (backslash first, so no
    double-escaping), and the emitted line stays single-line."""
    from rdf_extraction_ray.stages.serialize import format_ntriples

    batch = pd.DataFrame({
        "subj": "http://s", "pred": "http://p",
        "obj": pd.Series(texts, dtype=object),
        "obj_kind": "literal", "obj_lang": "", "obj_datatype": "",
    })
    lines = format_ntriples(batch)["line"]
    for raw, line in zip(texts, lines):
        assert "\n" not in line and "\r" not in line
        body = line[line.index('"') + 1: line.rindex('"')]
        esc = (raw.replace("\\", "\\\\").replace('"', '\\"')
               .replace("\n", "\\n").replace("\r", "\\r")
               .replace("\t", "\\t"))
        assert body == esc, (raw, body)


class TestCanonicalUrlProperties:
    @given(
        scheme=st.sampled_from(["http", "https"]),
        host=st.from_regex(r"[a-z][a-z0-9-]{0,10}(\.[a-z]{2,6}){1,2}",
                           fullmatch=True),
        path=st.lists(st.from_regex(r"[A-Za-z0-9._~-]{1,8}",
                                    fullmatch=True), max_size=4),
        tracking=st.lists(st.sampled_from(
            ["utm_source=x", "utm_medium=m", "gclid=1", "fbclid=2",
             "ref=r"]), max_size=3),
        keep=st.lists(st.from_regex(r"[a-z]{1,6}=[A-Za-z0-9]{0,6}",
                                    fullmatch=True), max_size=3),
        frag=st.sampled_from(["", "#top", "#a=b"]),
        upper_host=st.booleans(),
        default_port=st.booleans(),
        trailing=st.booleans(),
    )
    @settings(max_examples=200, deadline=None)
    def test_idempotent_and_variant_invariant(self, scheme, host, path,
                                              tracking, keep, frag,
                                              upper_host, default_port,
                                              trailing):
        from rdf_extraction_ray.stages.urlnorm import (TRACKING_PARAMS,
                                                       canonical_url)
        p = "/" + "/".join(path)
        q = "&".join(keep + tracking)
        raw_host = host.upper() if upper_host else host
        port = (":443" if scheme == "https" else ":80") \
            if default_port else ""
        raw = (f"{scheme}://{raw_host}{port}{p}"
               + ("/" if trailing and p != "/" else "")
               + (f"?{q}" if q else "") + frag)
        plain = (f"{scheme}://{host}{p}"
                 + (f"?{'&'.join(keep)}" if keep else ""))
        c = canonical_url(raw)
        # every surface variant canonicalizes to the plain form
        assert c == canonical_url(plain)
        # idempotence: canonical form is a fixed point
        assert canonical_url(c) == c
        # no tracking parameter survives
        assert not any(t.split("=")[0] in c.split("?")[-1]
                       for t in tracking if "?" in c)
        assert TRACKING_PARAMS  # imported constant stays non-empty


class TestBpeMergePassProperty:
    """bpe_merge_pass vs a straightforward per-word greedy scan."""

    @staticmethod
    def _reference_merge(word_syms, a, b):
        out, i = [], 0
        while i < len(word_syms):
            if (i + 1 < len(word_syms) and word_syms[i] == a
                    and word_syms[i + 1] == b):
                out.append(a + b)
                i += 2
            else:
                out.append(word_syms[i])
                i += 1
        return out

    @given(st.lists(st.text(alphabet="ab", min_size=1, max_size=10),
                    min_size=1, max_size=12),
           st.sampled_from(["a", "b"]),
           st.sampled_from(["a", "b"]))
    @settings(max_examples=60, deadline=None)
    def test_matches_greedy_reference(self, words, a, b):
        from rdf_extraction_ray.stages.textstats import bpe_merge_pass
        wid = np.concatenate([
            np.full(len(w), i, dtype=np.int64)
            for i, w in enumerate(words)])
        sym = np.array([c for w in words for c in w], dtype=object)
        take, new_sym = bpe_merge_pass(wid, sym, a, b)
        got = {}
        for i, s in zip(wid[take], new_sym[take]):
            got.setdefault(int(i), []).append(s)
        want = {i: self._reference_merge(list(w), a, b)
                for i, w in enumerate(words)}
        assert got == want


class TestGreedyPairClosedForm:
    """The prefix-deficit closed form events_greedy_pairs relies on:
    greedy disjoint (view→purchase) matches =
    #purchases − max(0, max_prefix(#purchases − #views))."""

    @given(st.lists(st.sampled_from(["v", "p"]), max_size=40))
    @settings(max_examples=200, deadline=None)
    def test_formula_equals_literal_greedy(self, seq):
        opens, greedy = 0, 0
        for e in seq:
            if e == "v":
                opens += 1
            elif opens:
                opens -= 1
                greedy += 1
        run, mx, n_p = 0, 0, 0
        for e in seq:
            run += 1 if e == "p" else -1
            mx = max(mx, run)
            n_p += 1 if e == "p" else 0
        assert n_p - max(mx, 0) == greedy


class TestJsonldVectorizedProperty:
    """format_jsonld's group-concat assembly is byte-identical to the
    row-at-a-time dict builder for ARBITRARY text (exact json.dumps
    escaping, encounter-order values, sorted keys)."""

    @given(st.lists(st.tuples(
        st.sampled_from(["s1", "s2", "s3"]),
        st.sampled_from(["p:a", "p:b", "rdf:type"]),
        st.text(max_size=24),
        st.sampled_from(["uri", "literal"]),
        st.sampled_from([None, "", "en"]),
        st.sampled_from([None, "", "xsd:date"])),
        min_size=1, max_size=24))
    @settings(max_examples=120, deadline=None)
    def test_matches_rowwise_builder(self, rows):
        import json

        import pandas as pd

        from rdf_extraction_ray.namespaces import NS
        from rdf_extraction_ray.stages.serialize import format_jsonld
        batch = pd.DataFrame(rows, columns=[
            "subj", "pred", "obj", "obj_kind", "obj_lang",
            "obj_datatype"])

        def rowwise(b):
            out = []
            for subj, g in b.groupby("subj", sort=True):
                node = {"@id": subj}
                for _, r in g.iterrows():
                    if r["obj_kind"] == "uri":
                        val = {"@id": r["obj"]}
                    else:
                        val = {"@value": r["obj"]}
                        if r["obj_lang"]:
                            val["@language"] = r["obj_lang"]
                        elif r["obj_datatype"]:
                            dd = r["obj_datatype"]
                            val["@type"] = (NS[dd.split(":")[0]]
                                            + dd.split(":")[1])
                    node.setdefault(r["pred"], []).append(val)
                out.append(" " + json.dumps(node, sort_keys=True))
            return out

        assert format_jsonld(batch)["line"].tolist() == rowwise(batch)
