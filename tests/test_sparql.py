"""SPARQL text front-end: the parsed-and-dispatched result of each
query form must equal the hand-built planner call it maps to."""

import pandas as pd
import pytest
import ray.data as rd

from rdf_extraction_ray.stages.sparql import parse_sparql, run_sparql

PRE = "PREFIX ex: <http://ex.org/> "


def _triples():
    rows = [
        ("ev1", "http://ex.org/died", "alice"),
        ("ev2", "http://ex.org/died", "alice"),
        ("ev3", "http://ex.org/died", "bob"),
        ("alice", "http://ex.org/dplace", "york"),
        ("alice", "http://ex.org/bplace", "leeds"),
        ("bob", "http://ex.org/bplace", "hull"),
        ("carol", "http://ex.org/dplace", "york"),
        ("alice", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
         "Person"),
    ]
    return rd.from_pandas(pd.DataFrame(
        rows, columns=["subj", "pred", "obj"]))


def _canon(ds):
    df = ds.to_pandas() if hasattr(ds, "to_pandas") else ds
    return (df.reindex(sorted(df.columns), axis=1)
            .sort_values(sorted(df.columns), ignore_index=True))


class TestSelect:
    def test_basic_join_optional_filter(self):
        tr = _triples()
        got = run_sparql(tr, PRE + """
            SELECT ?ev ?p ?bp WHERE {
              ?ev ex:died ?p .
              OPTIONAL { ?p ex:dplace ?dp }
              ?p ex:bplace ?bp .
              FILTER (?bp != "hull")
            }""")
        df = _canon(got)
        assert df["p"].unique().tolist() == ["alice"]
        assert len(df) == 2  # ev1, ev2

    def test_select_star_and_distinct(self):
        tr = _triples()
        got = _canon(run_sparql(
            tr, PRE + "SELECT DISTINCT ?p WHERE { ?ev ex:died ?p }"))
        assert got["p"].tolist() == ["alice", "bob"]

    def test_rdf_type_a_and_semicolon_comma(self):
        tr = _triples()
        got = _canon(run_sparql(tr, PRE + """
            SELECT ?s WHERE { ?s a "Person" ; ex:bplace "leeds" . }"""))
        assert got["s"].tolist() == ["alice"]

    def test_order_by_limit(self):
        tr = _triples()
        got = run_sparql(tr, PRE + """
            SELECT ?ev ?p WHERE { ?ev ex:died ?p }
            ORDER BY DESC(?ev) LIMIT 2""").to_pandas()
        assert got["ev"].tolist() == ["ev3", "ev2"]

    def test_values_and_bind(self):
        tr = _triples()
        got = _canon(run_sparql(tr, PRE + """
            SELECT ?p ?up WHERE {
              ?ev ex:died ?p .
              VALUES ?p { "alice" }
              BIND (UCASE(?p) AS ?up)
            }"""))
        assert set(got["up"]) == {"ALICE"}

    def test_projection_expression(self):
        tr = _triples()
        got = _canon(run_sparql(tr, PRE + """
            SELECT ?p (STRLEN(?p) AS ?n) WHERE {
              ?ev ex:died ?p }"""))
        assert dict(zip(got["p"], got["n"]))["alice"] == "5"

    def test_inverse_and_alternation_paths(self):
        tr = _triples()
        # ?p ^ex:died ?ev  ==  ?ev ex:died ?p
        got = _canon(run_sparql(tr, PRE + """
            SELECT DISTINCT ?p WHERE { ?p ^ex:died ?ev }"""))
        assert got["p"].tolist() == ["alice", "bob"]
        got = _canon(run_sparql(tr, PRE + """
            SELECT DISTINCT ?place WHERE {
              ?p ex:dplace|ex:bplace ?place }"""))
        assert got["place"].tolist() == ["hull", "leeds", "york"]


class TestOtherForms:
    def test_ask(self):
        tr = _triples()
        assert run_sparql(
            tr, PRE + 'ASK { ?ev ex:died "alice" }') is True
        assert run_sparql(
            tr, PRE + 'ASK { ?ev ex:died "nobody" }') is False

    def test_construct(self):
        tr = _triples()
        got = _canon(run_sparql(tr, PRE + """
            CONSTRUCT { ?p ex:deceased "yes" }
            WHERE { ?ev ex:died ?p }"""))
        assert got["subj"].tolist() == ["alice", "bob"]
        assert set(got["pred"]) == {"http://ex.org/deceased"}

    def test_describe(self):
        tr = _triples()
        got = run_sparql(tr, PRE + """
            DESCRIBE ?p WHERE { ?p ex:dplace "york" }""").to_pandas()
        assert set(got["subj"]) == {"alice", "carol"}

    def test_union(self):
        tr = _triples()
        got = _canon(run_sparql(tr, PRE + """
            SELECT DISTINCT ?place WHERE {
              { ?p ex:dplace ?place } UNION { ?p ex:bplace ?place }
            }"""))
        assert got["place"].tolist() == ["hull", "leeds", "york"]

    def test_minus_and_not_exists_and_exists(self):
        tr = _triples()
        q = """
            SELECT DISTINCT ?p WHERE {
              ?ev ex:died ?p . %s { ?p ex:dplace ?dp }
            }"""
        for clause, want in [("MINUS", ["bob"]),
                             ("FILTER NOT EXISTS", ["bob"]),
                             ("FILTER EXISTS", ["alice"])]:
            got = _canon(run_sparql(tr, PRE + q % clause))
            assert got["p"].tolist() == want, clause

    def test_aggregate_group_by_having(self):
        tr = _triples()
        got = run_sparql(tr, PRE + """
            SELECT ?p (COUNT(*) AS ?n) WHERE { ?ev ex:died ?p }
            GROUP BY ?p HAVING (COUNT(*) >= 2)""").to_pandas()
        assert got[["p", "n"]].values.tolist() == [["alice", 2]]

    def test_update_delete_insert(self):
        tr = _triples()
        got = run_sparql(tr, PRE + """
            DELETE { ?ev ex:died ?p }
            INSERT { ?p ex:diedIn ?dp }
            WHERE { ?ev ex:died ?p . ?p ex:dplace ?dp }""").to_pandas()
        tups = set(map(tuple, got[["subj", "pred", "obj"]].to_numpy()))
        assert ("alice", "http://ex.org/diedIn", "york") in tups
        # ev1/ev2 retracted; ev3 (bob, no dplace binding) kept
        assert ("ev1", "http://ex.org/died", "alice") not in tups
        assert ("ev3", "http://ex.org/died", "bob") in tups

    def test_delete_where_shorthand(self):
        tr = _triples()
        got = _canon(run_sparql(
            tr, PRE + "DELETE WHERE { ?ev ex:died ?p }"))
        assert "http://ex.org/died" not in set(got["pred"])


class TestParserErrors:
    @pytest.mark.parametrize("q,err", [
        ("SELECT ?x WHERE { ?x <p>|<q>+ ?y }", NotImplementedError),
        ("SELECT ?x WHERE { OPTIONAL { ?x <p>* ?y } }",
         NotImplementedError),
        ("SELECT ?x WHERE { ?x ^?p ?y }", NotImplementedError),
        ("SELECT ?x WHERE { ?x ?p|<q> ?y }", NotImplementedError),
        ("SELECT ?x WHERE { ?x ?p+ ?y }", NotImplementedError),
        ("SELECT ?g WHERE { GRAPH 42 { ?x <p> ?y } }", SyntaxError),
        ("SELECT ?x WHERE { GRAPH ?g { ?x <p>+ ?y } }",
         NotImplementedError),
        ("SELECT ?x ?y WHERE { { GRAPH ?g { ?x <p> ?y } } UNION "
         "{ ?x <q> ?y } }", NotImplementedError),
        ("SELECT ?x WHERE { ?x <p> ?y } OFFSET 5", NotImplementedError),
        ("SELECT ?x WHERE { ?x <p> ?y } LIMIT x", SyntaxError),
        ("FROB ?x WHERE { }", SyntaxError),
        ("SELECT ?x WHERE { ?x ex:p ?y }", SyntaxError),  # no PREFIX
        ('SELECT (GROUP_CONCAT(?v; SEPARATOR=";") AS ?a) '
         'WHERE { ?x <p> ?v }', NotImplementedError),
    ])
    def test_loud_errors(self, q, err):
        with pytest.raises(err):
            run_sparql(_triples(), q)

    def test_comments_and_literals_tokenize(self):
        q = parse_sparql("""# find alice
            SELECT ?x WHERE { ?x <http://ex.org/died> "ali\\"ce" }""")
        assert q["group"]["patterns"] == [
            ("?x", "http://ex.org/died", 'ali"ce')]

    def test_prefix_expansion_and_typed_literal(self):
        q = parse_sparql(PRE + """SELECT ?x WHERE {
            ?x ex:age "42"^^<http://www.w3.org/2001/XMLSchema#int> }""")
        assert q["group"]["patterns"] == [
            ("?x", "http://ex.org/age", "42")]


class TestSubquery:
    def test_nested_aggregate_select_joins_outer(self):
        tr = _triples()
        got = run_sparql(tr, PRE + """
            SELECT ?ev ?p ?n WHERE {
              ?ev ex:died ?p .
              { SELECT ?p (COUNT(*) AS ?n) WHERE { ?e2 ex:died ?p }
                GROUP BY ?p HAVING (COUNT(*) >= 2) }
            }""").to_pandas().sort_values("ev", ignore_index=True)
        assert got[["ev", "p"]].values.tolist() == [
            ["ev1", "alice"], ["ev2", "alice"]]
        assert set(got["n"]) == {2}

    def test_subquery_must_share_a_var_and_aggregate(self):
        tr = _triples()
        with pytest.raises(ValueError):
            run_sparql(tr, PRE + """
                SELECT ?s WHERE { ?s ex:bplace ?b .
                  { SELECT ?p (COUNT(*) AS ?n)
                    WHERE { ?e ex:died ?p } GROUP BY ?p } }""")
        with pytest.raises(NotImplementedError):
            run_sparql(tr, PRE + """
                SELECT ?s WHERE { ?s ex:bplace ?b .
                  { SELECT ?b WHERE { ?e ex:dplace ?b } } }""")


class TestClosurePath:
    def test_transitive_path_forms(self):
        tr = rd.from_pandas(pd.DataFrame(
            [("a", "http://ex.org/p", "b"),
             ("b", "http://ex.org/p", "c"),
             ("x", "http://ex.org/q", "y")],
            columns=["subj", "pred", "obj"]))
        got = _canon(run_sparql(tr, PRE + """
            SELECT ?s ?t WHERE { ?s ex:p+ ?t }"""))
        assert list(map(tuple, got[["s", "t"]].to_numpy())) == [
            ("a", "b"), ("a", "c"), ("b", "c")]
        # constant start binds only the end var
        got = run_sparql(tr, PRE + """
            SELECT ?t WHERE { "a" ex:p+ ?t }""").to_pandas()
        assert sorted(got["t"]) == ["b", "c"]
        assert list(got.columns) == ["t"]
        # constant end filters the closure
        got = run_sparql(tr, PRE + """
            SELECT ?s WHERE { ?s ex:p+ "c" }""").to_pandas()
        assert sorted(got["s"]) == ["a", "b"]

    def test_closure_out_of_scope_forms_are_loud(self):
        # composition and p* are supported since round 4
        # (TestClosureForms); closures in auxiliary blocks and in
        # graph-returning forms stay loud
        tr = _triples()
        with pytest.raises(NotImplementedError):
            run_sparql(tr, PRE + """
                SELECT ?s WHERE { ?s ex:q ?t .
                                  MINUS { ?s ex:p+ ?t } }""")
        with pytest.raises(NotImplementedError):
            run_sparql(tr, PRE + """
                DESCRIBE ?s WHERE { ?s ex:p+ ?t . ?t ex:q ?u }""")


class TestClosureForms:
    """Round-4 grammar closures: p* alone, p+/p* composed with other
    patterns (derived-relation join), and OFFSET pagination."""

    @staticmethod
    def _chain():
        # a -> b -> c -> d  via ex:next, plus names on each node
        rows = [
            ("a", "http://ex.org/next", "b"),
            ("b", "http://ex.org/next", "c"),
            ("c", "http://ex.org/next", "d"),
            ("a", "http://ex.org/name", "NA"),
            ("b", "http://ex.org/name", "NB"),
            ("c", "http://ex.org/name", "NC"),
            ("d", "http://ex.org/name", "ND"),
        ]
        return rd.from_pandas(pd.DataFrame(
            rows, columns=["subj", "pred", "obj"]))

    def test_star_single_pattern_includes_zero_length(self):
        got = _canon(run_sparql(
            self._chain(),
            PRE + "SELECT ?y WHERE { <a> ex:next* ?y }"))
        assert got["y"].tolist() == ["a", "b", "c", "d"]

    def test_star_var_endpoints_self_pairs(self):
        got = _canon(run_sparql(
            self._chain(),
            PRE + "SELECT ?x ?y WHERE { ?x ex:next* ?y }"))
        pairs = set(zip(got["x"], got["y"]))
        # every URI term self-paired (zero hops)...
        for t in ["a", "b", "c", "d", "NA", "NB", "NC", "ND"]:
            assert (t, t) in pairs
        # ...plus the transitive reach
        assert {("a", "b"), ("a", "c"), ("a", "d"),
                ("b", "d")} <= pairs

    def test_plus_composed_with_pattern(self):
        # reachable-from-a nodes joined with their names
        got = _canon(run_sparql(self._chain(), PRE + """
            SELECT ?y ?n WHERE {
              <a> ex:next+ ?y .
              ?y ex:name ?n .
            }"""))
        assert list(zip(got["y"], got["n"])) == [
            ("b", "NB"), ("c", "NC"), ("d", "ND")]

    def test_star_composed_with_filter(self):
        got = _canon(run_sparql(self._chain(), PRE + """
            SELECT ?y ?n WHERE {
              <a> ex:next* ?y .
              ?y ex:name ?n .
              FILTER (?n != "NC")
            }"""))
        assert list(zip(got["y"], got["n"])) == [
            ("a", "NA"), ("b", "NB"), ("d", "ND")]

    def test_plus_composed_ask_and_construct(self):
        assert run_sparql(self._chain(), PRE + """
            ASK { <a> ex:next+ ?y . ?y ex:name "ND" }""") is True
        assert run_sparql(self._chain(), PRE + """
            ASK { <a> ex:next+ ?y . ?y ex:name "NA" }""") is False
        cons = _canon(run_sparql(self._chain(), PRE + """
            CONSTRUCT { <a> ex:reaches ?y } WHERE {
              <a> ex:next+ ?y . ?y ex:name ?n }"""))
        assert set(cons["obj"]) == {"b", "c", "d"}
        assert set(cons["pred"]) == {"http://ex.org/reaches"}

    def test_offset_paginates_sorted_results(self):
        q = PRE + ("SELECT ?s ?n WHERE { ?s ex:name ?n } "
                   "ORDER BY ?n LIMIT 2 OFFSET %d")
        page0 = run_sparql(self._chain(), q % 0).to_pandas()
        page1 = run_sparql(self._chain(), q % 2).to_pandas()
        assert page0["n"].tolist() == ["NA", "NB"]
        assert page1["n"].tolist() == ["NC", "ND"]
        # past-the-end page is empty
        assert len(run_sparql(self._chain(), q % 4).to_pandas()) == 0

    def test_offset_requires_order_and_limit(self):
        with pytest.raises(NotImplementedError):
            run_sparql(self._chain(), PRE +
                       "SELECT ?s WHERE { ?s ex:name ?n } "
                       "ORDER BY ?n OFFSET 1")
        with pytest.raises(NotImplementedError):
            run_sparql(self._chain(), PRE +
                       "SELECT (COUNT(*) AS ?c) WHERE "
                       "{ ?s ex:name ?n } LIMIT 1 OFFSET 1")


class TestInverseClosure:
    def test_inverse_plus_and_star(self):
        # chain a -> b -> c; ^next+ walks it backwards
        tr = rd.from_pandas(pd.DataFrame(
            [("a", "http://ex.org/next", "b"),
             ("b", "http://ex.org/next", "c")],
            columns=["subj", "pred", "obj"]))
        got = _canon(run_sparql(
            tr, PRE + "SELECT ?x ?y WHERE { ?x ^ex:next+ ?y }"))
        assert set(zip(got["x"], got["y"])) == {
            ("b", "a"), ("c", "b"), ("c", "a")}
        got = _canon(run_sparql(
            tr, PRE + "SELECT ?y WHERE { <c> ^ex:next* ?y }"))
        assert got["y"].tolist() == ["a", "b", "c"]

    def test_inverse_closure_composed(self):
        tr = rd.from_pandas(pd.DataFrame(
            [("a", "http://ex.org/next", "b"),
             ("b", "http://ex.org/next", "c"),
             ("a", "http://ex.org/name", "NA")],
            columns=["subj", "pred", "obj"]))
        got = _canon(run_sparql(tr, PRE + """
            SELECT ?y ?n WHERE {
              <c> ^ex:next+ ?y . ?y ex:name ?n }"""))
        assert list(zip(got["y"], got["n"])) == [("a", "NA")]


class TestAlternationClosure:
    def test_grouped_alternation_plus(self):
        # a -next-> b -link-> c; (next|link)+ reaches across both
        tr = rd.from_pandas(pd.DataFrame(
            [("a", "http://ex.org/next", "b"),
             ("b", "http://ex.org/link", "c")],
            columns=["subj", "pred", "obj"]))
        got = _canon(run_sparql(tr, PRE + """
            SELECT ?x ?y WHERE { ?x (ex:next|ex:link)+ ?y }"""))
        assert set(zip(got["x"], got["y"])) == {
            ("a", "b"), ("b", "c"), ("a", "c")}

    def test_mixed_inverse_alternation_is_undirected_closure(self):
        # (next|^next)+ from a reaches everything in the weak
        # component, both directions
        tr = rd.from_pandas(pd.DataFrame(
            [("a", "http://ex.org/next", "b"),
             ("c", "http://ex.org/next", "b")],
            columns=["subj", "pred", "obj"]))
        got = run_sparql(tr, PRE + """
            SELECT ?y WHERE { <a> (ex:next|^ex:next)+ ?y }""") \
            .to_pandas()
        assert sorted(got["y"]) == ["a", "b", "c"]  # a via b-cycle

    def test_grouped_star_and_composition(self):
        tr = rd.from_pandas(pd.DataFrame(
            [("a", "http://ex.org/next", "b"),
             ("b", "http://ex.org/link", "c"),
             ("c", "http://ex.org/name", "NC")],
            columns=["subj", "pred", "obj"]))
        got = _canon(run_sparql(tr, PRE + """
            SELECT ?y ?n WHERE {
              <a> (ex:next|ex:link)* ?y . ?y ex:name ?n }"""))
        assert list(zip(got["y"], got["n"])) == [("c", "NC")]

    def test_ungrouped_alternation_quantifier_is_loud(self):
        with pytest.raises(NotImplementedError):
            run_sparql(_triples(), PRE +
                       "SELECT ?x WHERE { ?x ex:p|ex:q+ ?y }")


class TestReviewRegressionPins:
    """Round-4 review findings pinned: closure markers and OFFSET must
    not silently leak into subquery bodies, and the ^p+ oracle shape
    must agree with the engine on NON-mutual edges."""

    def test_closure_in_subquery_body_is_loud(self):
        with pytest.raises(NotImplementedError):
            run_sparql(_triples(), PRE + """
                SELECT ?o WHERE {
                  ?s ex:p ?o .
                  { SELECT ?o (COUNT(?x) AS ?c)
                    WHERE { ?x ex:next+ ?o } GROUP BY ?o }
                }""")

    def test_offset_in_subquery_is_loud(self):
        with pytest.raises(NotImplementedError):
            run_sparql(_triples(), PRE + """
                SELECT ?o WHERE {
                  ?s ex:q ?o .
                  { SELECT ?o (COUNT(?x) AS ?c)
                    WHERE { ?x ex:q ?o } GROUP BY ?o OFFSET 5 }
                }""")

    def test_inverse_closure_oracle_shape_on_non_mutual_chain(self):
        """On a one-directional chain the corrected oracle shape
        (y = forward-closure START) matches the engine; the old
        node-side binding would not."""
        import duckdb
        rows = [("a", "http://ex.org/rel", "b"),
                ("b", "http://ex.org/rel", "c"),
                ("a", "http://ex.org/cod", "CA"),
                ("b", "http://ex.org/cod", "CB"),
                ("c", "http://ex.org/cod", "CC")]
        df = pd.DataFrame(rows, columns=["subj", "pred", "obj"])
        got = _canon(run_sparql(rd.from_pandas(df), PRE + """
            SELECT DISTINCT ?y ?cod WHERE {
              ?x ^ex:rel+ ?y . ?y ex:cod ?cod }"""))
        con = duckdb.connect()
        con.register("t", df)
        want = con.sql("""
            WITH RECURSIVE e AS (
                SELECT DISTINCT subj AS s, obj AS o FROM t
                WHERE pred = 'http://ex.org/rel'),
            c(start, node) AS (
                SELECT s, o FROM e
                UNION
                SELECT c.start, e.o FROM c JOIN e ON c.node = e.s)
            SELECT DISTINCT c.start AS y, d.obj AS cod
            FROM c JOIN t d ON c.start = d.subj
            WHERE d.pred = 'http://ex.org/cod'
        """).df().sort_values(["y", "cod"], ignore_index=True)
        got = got.rename(columns=str).sort_values(
            ["cod", "y"]).reset_index(drop=True)
        want = want.sort_values(["cod", "y"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got[["cod", "y"]], want[["cod", "y"]])
        # starts only: c never starts a forward path
        assert set(got["y"]) == {"a", "b"}


class TestClosureFastPathSemantics:
    """Round-4 review pins: shapes the direct closure dispatch cannot
    represent must route through the composed path with full
    solution semantics."""

    @staticmethod
    def _chain():
        return rd.from_pandas(pd.DataFrame(
            [("a", "http://ex.org/next", "b"),
             ("b", "http://ex.org/next", "c")],
            columns=["subj", "pred", "obj"]))

    def test_same_variable_closure_is_cycle_membership(self):
        # acyclic chain: ?x next+ ?x has NO solutions
        got = run_sparql(self._chain(), PRE +
                         "SELECT ?x WHERE { ?x ex:next+ ?x }") \
            .to_pandas()
        assert len(got) == 0
        # with a cycle b->a added, a and b satisfy it
        tr = rd.from_pandas(pd.DataFrame(
            [("a", "http://ex.org/next", "b"),
             ("b", "http://ex.org/next", "a")],
            columns=["subj", "pred", "obj"]))
        got = run_sparql(tr, PRE +
                         "SELECT ?x WHERE { ?x ex:next+ ?x }") \
            .to_pandas()
        assert sorted(got["x"]) == ["a", "b"]

    def test_distinct_subset_projection_dedups(self):
        got = run_sparql(self._chain(), PRE +
                         "SELECT DISTINCT ?x WHERE "
                         "{ ?x ex:next+ ?y }").to_pandas()
        assert sorted(got["x"]) == ["a", "b"]  # not [a, a, b]
        # bag semantics WITHOUT distinct keep the duplicate
        bag = run_sparql(self._chain(), PRE +
                         "SELECT ?x WHERE { ?x ex:next+ ?y }") \
            .to_pandas()
        assert sorted(bag["x"]) == ["a", "a", "b"]

    def test_unbound_selected_var_is_loud(self):
        with pytest.raises(ValueError):
            run_sparql(self._chain(), PRE +
                       "SELECT ?z WHERE { ?x ex:next+ ?y }") \
                .to_pandas()

    def test_star_zero_pairs_include_literal_only_subjects(self):
        tr = rd.from_pandas(pd.DataFrame(
            [("a", "http://ex.org/next", "b", "uri"),
             ("c", "http://ex.org/name", "Carol", "literal")],
            columns=["subj", "pred", "obj", "obj_kind"]))
        got = run_sparql(tr, PRE + "SELECT ?x ?y WHERE "
                         "{ ?x ex:next* ?y }").to_pandas()
        pairs = set(zip(got["x"], got["y"]))
        assert ("c", "c") in pairs  # c is a URI term of the graph
        assert ("Carol", "Carol") not in pairs  # literals are not


def _quads():
    rows = [
        ("ev1", "http://ex.org/died", "alice", "conv1"),
        ("ev2", "http://ex.org/died", "alice", "conv2"),
        ("ev3", "http://ex.org/died", "bob", "conv2"),
        ("alice", "http://ex.org/dplace", "york", None),
        ("bob", "http://ex.org/bplace", "hull", "conv1"),
    ]
    return rd.from_pandas(pd.DataFrame(
        rows, columns=["subj", "pred", "obj", "graph"]))


class TestVariablePredicates:
    """Round-5 grammar closure: a bare ?p in the predicate slot plans
    as the unfiltered scan with the predicate bound (VERDICT r4
    missing #1; reference analogue Utils/utilities.py:446-490)."""

    def test_predicate_histogram(self):
        got = _canon(run_sparql(_triples(), """
            SELECT ?p (COUNT(*) AS ?n) WHERE { ?s ?p ?o }
            GROUP BY ?p"""))
        want = {"http://ex.org/died": 3, "http://ex.org/dplace": 2,
                "http://ex.org/bplace": 2,
                "http://www.w3.org/1999/02/22-rdf-syntax-ns#type": 1}
        assert dict(zip(got["p"], got["n"])) == want

    def test_constant_subject_binds_pred_and_obj(self):
        got = _canon(run_sparql(_triples(), """
            SELECT ?p ?o WHERE { <alice> ?p ?o }"""))
        assert set(zip(got["p"], got["o"])) == {
            ("http://ex.org/dplace", "york"),
            ("http://ex.org/bplace", "leeds"),
            ("http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
             "Person")}

    def test_pred_var_joins_across_patterns(self):
        # predicates used by BOTH alice and bob
        got = _canon(run_sparql(_triples(), """
            SELECT DISTINCT ?p WHERE {
              <alice> ?p ?o1 . <bob> ?p ?o2 . }"""))
        assert got["p"].tolist() == ["http://ex.org/bplace"]

    def test_pred_var_in_construct_template(self):
        got = _canon(run_sparql(_triples(), """
            CONSTRUCT { ?o ?p ?s } WHERE { ?s ?p ?o . }"""))
        assert len(got) == 8  # every triple reversed, set-deduped
        assert ("york", "http://ex.org/dplace", "alice") in set(
            map(tuple, got[["subj", "pred", "obj"]].to_numpy()))

    def test_pred_var_distinct_select(self):
        # the schema-census shape: distinct predicate inventory
        got = _canon(run_sparql(_triples(), """
            SELECT DISTINCT ?p WHERE { ?s ?p ?o }"""))
        assert len(got) == 4


class TestNamedGraphs:
    """Round-5 GRAPH clause: quad patterns over the engine's N-Quads
    layout (VERDICT r4 missing #1; reference analogue
    Huviz/huvizQuads.py:15,129-140)."""

    def test_graph_var_binds_and_skips_default_graph(self):
        got = _canon(run_sparql(_quads(), PRE + """
            SELECT ?g ?s WHERE { GRAPH ?g { ?s ex:died ?p } }"""))
        assert set(zip(got["g"], got["s"])) == {
            ("conv1", "ev1"), ("conv2", "ev2"), ("conv2", "ev3")}
        # the NULL-graph dplace row never matches GRAPH ?g
        got2 = _canon(run_sparql(_quads(), PRE + """
            SELECT ?g WHERE { GRAPH ?g { ?s ex:dplace ?o } }"""))
        assert len(got2) == 0

    def test_graph_constant_filters(self):
        got = _canon(run_sparql(_quads(), PRE + """
            SELECT ?s ?o WHERE { GRAPH <conv2> { ?s ex:died ?o } }"""))
        assert set(zip(got["s"], got["o"])) == {
            ("ev2", "alice"), ("ev3", "bob")}

    def test_graph_with_variable_predicate_aggregate(self):
        got = _canon(run_sparql(_quads(), """
            SELECT ?g (COUNT(*) AS ?n) WHERE { GRAPH ?g { ?s ?p ?o } }
            GROUP BY ?g"""))
        assert dict(zip(got["g"], got["n"])) == {"conv1": 2,
                                                 "conv2": 2}

    def test_graph_mixed_with_default_patterns(self):
        got = _canon(run_sparql(_quads(), PRE + """
            SELECT ?g ?p2 WHERE {
              GRAPH ?g { ?ev ex:died ?p } .
              ?p ex:dplace ?p2 . }"""))
        assert set(zip(got["g"], got["p2"])) == {
            ("conv1", "york"), ("conv2", "york")}

    def test_graph_on_tripleset_without_graph_column_errors(self):
        with pytest.raises(Exception, match="graph"):
            run_sparql(_triples(), PRE + """
                SELECT ?g WHERE { GRAPH ?g { ?s ex:died ?o } }"""
                       ).to_pandas()


class TestVarPredGraphDifferential:
    """Randomized DuckDB differential for the round-5 forms: on
    seeded random quad graphs, the engine's variable-predicate and
    GRAPH results must equal the SQL replay row-for-row."""

    @pytest.mark.parametrize("seed", [3, 11, 29])
    def test_random_graph_matches_duckdb(self, seed):
        import duckdb
        import numpy as np

        rng = np.random.default_rng(seed)
        n = int(rng.integers(30, 120))
        nodes = [f"n{i}" for i in range(int(rng.integers(5, 15)))]
        preds = [f"p{i}" for i in range(int(rng.integers(2, 6)))]
        graphs = [f"g{i}" for i in range(3)] + [None]
        df = pd.DataFrame({
            "subj": rng.choice(nodes, n),
            "pred": rng.choice(preds, n),
            "obj": rng.choice(nodes, n),
            "graph": rng.choice(np.array(graphs, dtype=object), n),
        }).drop_duplicates(ignore_index=True)
        ds = rd.from_pandas(df)
        con = duckdb.connect()
        con.register("t", df)

        got = _canon(run_sparql(ds, """
            SELECT ?p (COUNT(*) AS ?n) WHERE { ?s ?p ?o }
            GROUP BY ?p"""))
        want = _canon(con.sql(
            "SELECT pred AS p, count(*)::BIGINT AS n FROM t "
            "GROUP BY pred").df())
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

        got = _canon(run_sparql(ds, f"""
            SELECT ?g ?s WHERE {{ GRAPH ?g {{ ?s <{preds[0]}> ?o }} }}
        """))
        want = _canon(con.sql(
            f"SELECT DISTINCT graph AS g, subj AS s FROM t "
            f"WHERE pred = '{preds[0]}' AND graph IS NOT NULL").df())
        # engine keeps solution bag; compare as sets of (g, s)
        got = got.drop_duplicates(ignore_index=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

        got = _canon(run_sparql(ds, f"""
            SELECT ?p ?o WHERE {{ <{nodes[0]}> ?p ?o }}"""))
        want = _canon(con.sql(
            f"SELECT pred AS p, obj AS o FROM t "
            f"WHERE subj = '{nodes[0]}'").df())
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

        got = _canon(run_sparql(ds, """
            SELECT ?g (COUNT(*) AS ?n) WHERE { GRAPH ?g { ?s ?p ?o } }
            GROUP BY ?g"""))
        want = _canon(con.sql(
            "SELECT graph AS g, count(*)::BIGINT AS n FROM t "
            "WHERE graph IS NOT NULL GROUP BY graph").df())
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


class TestRound5Compositions:
    """Edge compositions of the round-5 forms, each pinned against
    hand-computed results on the quad fixture graph
    subj/pred/obj/graph = (a p1 b g1)(a p2 x g1)(b p1 c g2)
    (c p2 y None)(c p3 z g2)(d p1 a g1)."""

    def _ds(self):
        tri = pd.DataFrame({
            "subj": ["a", "a", "b", "c", "c", "d"],
            "pred": ["p1", "p2", "p1", "p2", "p3", "p1"],
            "obj": ["b", "x", "c", "y", "z", "a"],
            "graph": ["g1", "g1", "g2", None, "g2", "g1"]})
        return rd.from_pandas(tri), rd.from_pandas(
            tri[["subj", "pred", "obj"]])

    def test_graph_with_chained_optional(self):
        ds, _ = self._ds()
        r = run_sparql(ds, """
            SELECT ?s ?g ?o2 WHERE {
              GRAPH ?g { ?s <p1> ?o }
              OPTIONAL { ?o <p1> ?o2 } }""").to_pandas()
        assert sorted(map(tuple, r.fillna("-").values.tolist())) == [
            ("a", "g1", "c"), ("b", "g2", "-"), ("d", "g1", "b")]

    def test_optional_containing_graph(self):
        ds, _ = self._ds()
        r = run_sparql(ds, """
            SELECT ?s ?g WHERE {
              ?s <p1> ?o .
              OPTIONAL { GRAPH ?g { ?s <p2> ?x } } }""").to_pandas()
        assert sorted(map(tuple, r.fillna("-").values.tolist())) == [
            ("a", "g1"), ("b", "-"), ("d", "-")]

    def test_describe_with_variable_predicate(self):
        _, ds3 = self._ds()
        r = run_sparql(ds3, "DESCRIBE ?s WHERE { ?s ?p <c> }"
                       ).to_pandas()
        assert sorted(set(r["subj"])) == ["b"]

    def test_minus_with_variable_predicate(self):
        _, ds3 = self._ds()
        r = run_sparql(ds3, """
            SELECT DISTINCT ?s WHERE {
              ?s <p1> ?o . MINUS { ?s ?q <x> } }""").to_pandas()
        assert sorted(r["s"]) == ["b", "d"]

    def test_union_branches_with_variable_predicates(self):
        _, ds3 = self._ds()
        r = run_sparql(ds3, """
            SELECT DISTINCT ?p WHERE {
              { <a> ?p ?o } UNION { <b> ?p ?o } }""").to_pandas()
        assert sorted(r["p"]) == ["p1", "p2"]

    def test_update_with_variable_predicate_templates(self):
        _, ds3 = self._ds()
        r = run_sparql(ds3, """
            DELETE { ?s ?p ?o } INSERT { ?o ?p ?s }
            WHERE { ?s ?p ?o }""").to_pandas()
        assert len(r) == 6
        assert ("b", "p1", "a") in set(
            map(tuple, r[["subj", "pred", "obj"]].to_numpy()))

    def test_constant_graph_with_varpred_and_filter(self):
        ds, _ = self._ds()
        r = run_sparql(ds, """
            SELECT ?s ?p WHERE { GRAPH <g1> { ?s ?p ?o }
              FILTER (?p != "p2") }""").to_pandas()
        assert sorted(map(tuple, r.values.tolist())) == [
            ("a", "p1"), ("d", "p1")]


class TestRound5ReviewGuards:
    """Round-5 self-review findings, pinned: shapes that would have
    been silently wrong (or misleadingly failing) must raise loud
    NotImplementedErrors."""

    def test_varpred_does_not_compose_with_closure(self):
        # the composed plan unions synthetic closure predicates into
        # the scan; an unfiltered ?q pattern would match them
        tr = rd.from_pandas(pd.DataFrame({
            "subj": ["a", "b"], "pred": ["p", "p"],
            "obj": ["b", "c"]}))
        with pytest.raises(NotImplementedError, match="variable"):
            run_sparql(tr, """
                SELECT ?x ?q ?o WHERE { ?x <p>+ ?y . ?x ?q ?o }""")
        # ... and in negation bodies too
        with pytest.raises(NotImplementedError, match="variable"):
            run_sparql(tr, """
                SELECT ?x WHERE { ?x <p>+ ?y .
                  MINUS { ?x ?q <c> } }""")

    def test_nested_graph_is_loud(self):
        with pytest.raises(NotImplementedError, match="nested"):
            parse_sparql("""
                SELECT ?g2 WHERE {
                  GRAPH ?g1 { GRAPH ?g2 { ?s <p> ?o } } }""")

    def test_graph_in_optional_does_not_compose_with_closure(self):
        quads = rd.from_pandas(pd.DataFrame({
            "subj": ["a"], "pred": ["p"], "obj": ["b"],
            "graph": ["g1"]}))
        with pytest.raises(NotImplementedError, match="GRAPH"):
            run_sparql(quads, """
                SELECT ?x ?y ?g WHERE { ?x <p>+ ?y .
                  OPTIONAL { GRAPH ?g { ?x <q> ?z } } }""")


def test_ask_and_construct_with_graph_patterns():
    """GRAPH quads flow through every bgp_match-routed form: ASK
    (existence under a named-graph restriction) and CONSTRUCT
    (template instantiated from quad-pattern bindings)."""
    quads = rd.from_pandas(pd.DataFrame({
        "subj": ["a", "b", "c"], "pred": ["p", "p", "p"],
        "obj": ["x", "y", "z"], "graph": ["g1", "g2", None]}))
    assert run_sparql(quads,
                      "ASK { GRAPH <g1> { ?s <p> ?o } }") is True
    assert run_sparql(quads,
                      "ASK { GRAPH <g9> { ?s <p> ?o } }") is False
    got = run_sparql(quads, """
        CONSTRUCT { ?s <inGraph> ?g }
        WHERE { GRAPH ?g { ?s <p> ?o } }""").to_pandas()
    assert sorted(map(tuple, got.values.tolist())) == [
        ("a", "inGraph", "g1"), ("b", "inGraph", "g2")]
