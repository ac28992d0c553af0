"""SPARQL text front-end: parse a SPARQL query string into the
engine's BGP planner calls and run it over a triple Dataset.

The reference drives its graph through rdflib / a Stardog endpoint
with textual SPARQL (cwrc/RDF-extraction Utils/utilities.py:446-490;
extraction_validation/verify_terms.py issues SELECTs); this module
gives the Ray engine the same user surface — a string in, a streaming
Dataset out — on top of the already-oracled plan operators
(:mod:`rdf_extraction_ray.stages.graph`). Parsing is driver-side and
O(query text); ALL data movement remains in the planner operators, so
the text layer adds zero exchanges.

Supported grammar (the subset the planner implements — every form
raises a precise error outside it):

* ``PREFIX ns: <uri>`` declarations, ``a`` for rdf:type.
* ``SELECT [DISTINCT] (?v | (AGG(?v) AS ?alias) | (EXPR AS ?v))* | *``
  with aggregates COUNT(*) / COUNT(?v) / COUNT(DISTINCT ?v) / SUM /
  AVG / MIN / MAX / GROUP_CONCAT(?v; SEPARATOR="|") and BIND-style
  projection expressions (STRLEN LCASE UCASE CONCAT SUBSTR STRBEFORE
  STRAFTER).
* WHERE groups: triple patterns with ``;`` / ``,`` abbreviation,
  predicate paths ``^p`` (inverse) and ``p1|p2`` (alternation),
  OPTIONAL { }, FILTER (comparisons ``= != < <= > >=`` chained with
  ``&&``, plus CONTAINS/STRSTARTS), FILTER [NOT] EXISTS { },
  MINUS { }, VALUES, BIND (expr AS ?v), and a top-level
  ``{ g } UNION { g }``.
* Solution modifiers GROUP BY / HAVING / ORDER BY [ASC|DESC] /
  LIMIT / OFFSET (OFFSET requires ORDER BY + LIMIT — the paginated
  top-k idiom; an unordered OFFSET is nondeterministic).
* ``{ SELECT ... }`` subqueries (aggregate inner sequences, joined on
  the shared variables via :func:`graph.bgp_subquery`).
* Property-path quantifiers ``p+`` (one-or-more) and ``p*``
  (zero-or-more; zero-length pairs are the graph's URI terms paired
  with themselves), over a forward or inverse (``^p``) predicate or
  a parenthesized alternation of those (``(p1|^p2)+`` — e.g. ``p``
  with its inverse gives weak/undirected reachability): alone they
  dispatch straight to
  :func:`graph.path_closure` (constant subject/object slots restrict
  the origin set / filter the closure end); COMPOSED with other
  patterns in a SELECT / ASK / CONSTRUCT, the closure joins the BGP
  plan as a derived relation under a synthetic predicate
  (:func:`_compose_closures`) — no planner change, zero extra
  exchanges beyond the closure itself.
* Query forms SELECT, ASK, CONSTRUCT, DESCRIBE ?v, and the update
  form ``DELETE { } INSERT { } WHERE { }`` (either template optional;
  ``DELETE WHERE { }`` shorthand).

* VARIABLE PREDICATES: a bare ``?p`` in the predicate slot plans as
  the unfiltered triple scan with the predicate term bound into the
  solution (the schema-census scan shape) — composable with every
  form that routes through :func:`graph.bgp_match` (SELECT incl.
  aggregates/DISTINCT/ORDER BY, ASK, CONSTRUCT, DESCRIBE, updates,
  UNION, MINUS, EXISTS, subqueries). Reference analogue: arbitrary
  endpoint SPARQL (cwrc/RDF-extraction Utils/utilities.py:446-490).
* NAMED GRAPHS: ``GRAPH ?g { ... }`` / ``GRAPH <iri> { ... }`` in
  the required/OPTIONAL blocks — each inner triple pattern becomes a
  quad pattern whose 4th slot binds (or constant-filters) the
  input's ``graph`` column (the engine's N-Quads layout,
  stages/serialize.py; a NULL graph row never matches ``GRAPH ?g``,
  per quad-store semantics). Reference analogue: named-graph quads
  (cwrc/RDF-extraction Huviz/huvizQuads.py:15,129-140).

Out of scope (documented, loud errors): path operators over a
variable predicate (``?p+`` / ``^?p`` / ``?p|q``), variable
predicates composed with p+/p* closures (the composed plan scans a
union carrying synthetic closure predicates), nested GRAPH groups,
GRAPH inside UNION/MINUS/EXISTS/subqueries/templates or composed
with p+/p*, closures outside the required pattern block, and
non-"|" GROUP_CONCAT separators (the engine pins "|").
"""

from __future__ import annotations

import re

_RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

_TOKEN_RE = re.compile(r"""
    (?P<comment>\#[^\n]*)
  | (?P<iri><[^<>\s]*>)
  | (?P<literal>"(?:[^"\\]|\\.)*"(?:@[A-Za-z][A-Za-z0-9-]*|\^\^<[^>]*>)?)
  | (?P<var>\?[A-Za-z_]\w*)
  | (?P<num>-?\d+(?:\.\d+)?)
  | (?P<pname>[A-Za-z_][\w-]*:\w(?:[\w.-]*[\w-])?|[A-Za-z_][\w-]*:(?=\s)|:\w(?:[\w.-]*[\w-])?)
  | (?P<word>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<punct>&&|!=|<=|>=|[{}().;,|^=<>:*+])
  | (?P<bad>\S)
""", re.X)

_AGG_FNS = {"count", "sum", "avg", "min", "max", "group_concat"}
_BIND_FNS = {"strlen", "lcase", "ucase", "concat", "substr",
             "strbefore", "strafter"}
_FILTER_FNS = {"contains", "strstarts"}
_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", '"': '"', "\\": "\\"}


def _tokenize(text: str) -> list[tuple[str, str]]:
    out = []
    pos = 0
    for m in _TOKEN_RE.finditer(text):
        gap = text[pos:m.start()]
        if gap.strip():
            raise SyntaxError(f"cannot tokenize {gap.strip()[:20]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "comment":
            continue
        if kind == "bad":
            raise SyntaxError(f"unexpected character {m.group()!r}")
        out.append((kind, m.group()))
    if text[pos:].strip():
        raise SyntaxError(f"cannot tokenize {text[pos:].strip()[:20]!r}")
    return out


def _unquote(lit: str) -> str:
    body = lit[1:lit.rindex('"')]
    return re.sub(r"\\(.)",
                  lambda m: _ESCAPES.get(m.group(1), m.group(1)), body)


class _Parser:
    def __init__(self, text: str):
        self.toks = _tokenize(text)
        self.i = 0
        self.prefixes: dict[str, str] = {}

    # ---------------------------------------------------- primitives
    def _peek(self, k: int = 0):
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else ("eof", "")

    def _next(self):
        t = self._peek()
        self.i += 1
        return t

    def _kw(self, k: int = 0) -> str:
        kind, val = self._peek(k)
        return val.lower() if kind == "word" else ""

    def _expect(self, val: str):
        kind, got = self._next()
        ok = got == val or (kind == "word" and got.lower() == val)
        if not ok:
            raise SyntaxError(f"expected {val!r}, got {got!r}")

    def _expand(self, pname: str) -> str:
        pre, _, local = pname.partition(":")
        if pre not in self.prefixes:
            raise SyntaxError(f"undeclared prefix {pre!r}:")
        return self.prefixes[pre] + local

    def _term(self) -> str:
        kind, val = self._next()
        if kind == "var":
            return val
        if kind == "iri":
            return val[1:-1]
        if kind == "pname":
            return self._expand(val)
        if kind == "literal":
            return _unquote(val)
        if kind == "num":
            return val
        if kind == "word" and val == "a":
            return _RDF_TYPE
        raise SyntaxError(f"expected term, got {val!r}")

    def _path(self):
        """Predicate path: a bare ``?var`` (VARIABLE predicate — the
        unfiltered scan binds the predicate term), iri, ^iri, a
        |-alternation of those, or a quantified closure ``p+`` /
        ``p*`` / ``^p+`` / ``(p1|^p2|...)+`` (parenthesized
        alternations may carry the quantifier; SPARQL requires the
        parens for grouping, and an UNparenthesized ``p1|p2+`` stays
        a loud error rather than silently binding the quantifier to
        the whole alternation). A variable composes with no path
        operator — ``?p|q`` / ``?p+`` / ``^?p`` stay loud errors."""
        if self._peek()[0] == "var":
            var = self._next()[1]
            if self._peek()[1] in ("|", "+", "*"):
                raise NotImplementedError(
                    "path operators over a variable predicate are "
                    "not supported")
            return var

        def one():
            if self._peek()[1] == "^":
                self._next()
                return "^" + self._const_iri()
            return self._const_iri()

        grouped = self._peek()[1] == "("
        if grouped:
            self._next()
        alts = [one()]
        while self._peek()[1] == "|":
            self._next()
            alts.append(one())
        if grouped:
            self._expect(")")
        quant = self._peek()[1]
        if quant in ("+", "*"):
            self._next()
            if len(alts) > 1 and not grouped:
                raise NotImplementedError(
                    f"p{quant} over an alternation needs parentheses: "
                    "(p1|p2)" + quant)
            body = alts[0] if len(alts) == 1 else tuple(alts)
            return ("__closure_star__" if quant == "*"
                    else "__closure__", body)
        return alts[0] if len(alts) == 1 else tuple(alts)

    def _const_iri(self) -> str:
        kind, val = self._next()
        if kind == "iri":
            return val[1:-1]
        if kind == "pname":
            return self._expand(val)
        if kind == "word" and val == "a":
            return _RDF_TYPE
        if kind == "var":
            raise NotImplementedError(
                "a variable predicate composes with no path operator "
                "(^ / | / + / *) — use a bare ?var")
        raise SyntaxError(f"expected predicate, got {val!r}")

    # ------------------------------------------------------- prologue
    def parse_prologue(self):
        while self._kw() == "prefix":
            self._next()
            kind, val = self._next()
            if kind == "pname" or (kind == "punct" and val == ":"):
                pre = val[:-1] if val.endswith(":") else \
                    val.partition(":")[0]
                if kind == "punct":
                    pre = ""
            elif kind == "word":
                pre = val
                self._expect(":")
            else:
                raise SyntaxError(f"bad PREFIX name {val!r}")
            kind, iri = self._next()
            if kind != "iri":
                raise SyntaxError("PREFIX needs an <iri>")
            self.prefixes[pre] = iri[1:-1]

    # ------------------------------------------------- group contents
    def parse_group(self) -> dict:
        """One { ... } group body -> plan fragment dict."""
        g: dict = {"patterns": [], "optional": [], "filters": [],
                   "minus": None, "exists": None, "not_exists": None,
                   "values": None, "binds": [], "union": None,
                   "subquery": None}
        self._expect("{")
        # top-level UNION: { {g1} UNION {g2} [UNION {g3}] }
        if self._peek()[1] == "{" and self._kw(1) != "select":
            branches = [self.parse_group()]
            while self._kw() == "union":
                self._next()
                branches.append(self.parse_group())
            self._expect("}")
            if len(branches) == 1:  # plain nested group: inline it
                branches[0].setdefault("patterns", [])
                return branches[0]
            for b in branches:
                if (b["filters"] or b["minus"] or b["exists"]
                        or b["not_exists"] or b["values"] or b["binds"]
                        or b["union"]):
                    raise NotImplementedError(
                        "UNION branches support only triple patterns "
                        "and OPTIONAL")
            g["union"] = [(b["patterns"], b["optional"] or None)
                          for b in branches]
            return g
        while self._peek()[1] != "}":
            if self._peek()[1] == ".":
                # SPARQL allows an optional '.' after any group
                # pattern (OPTIONAL/GRAPH/FILTER blocks etc.)
                self._next()
                continue
            kw = self._kw()
            if kw == "optional":
                self._next()
                sub = self.parse_group()
                if any(sub[k] for k in sub if k != "patterns"):
                    raise NotImplementedError(
                        "OPTIONAL groups support only triple patterns")
                g["optional"].extend(sub["patterns"])
            elif kw == "filter":
                self._next()
                self._parse_filter(g)
            elif kw == "minus":
                self._next()
                sub = self.parse_group()
                if g["minus"] is not None:
                    raise NotImplementedError("one MINUS per group")
                g["minus"] = sub["patterns"]
            elif kw == "graph":
                # GRAPH (?g | <iri>) { triple patterns }: each inner
                # pattern becomes a QUAD pattern (s, p, o, gterm) —
                # the planner binds/filters the input's graph column
                # (quad layout; reference analogue named-graph quads,
                # Huviz/huvizQuads.py:15,129-140)
                self._next()
                kind, val = self._peek()
                if kind == "var":
                    gterm = self._next()[1]
                elif kind == "iri":
                    gterm = self._next()[1][1:-1]
                elif kind == "pname":
                    gterm = self._expand(self._next()[1])
                else:
                    raise SyntaxError(
                        f"GRAPH needs ?var or an IRI, got {val!r}")
                sub = self.parse_group()
                if any(sub[k] for k in sub if k != "patterns"):
                    raise NotImplementedError(
                        "GRAPH groups support only triple patterns")
                for pat in sub["patterns"]:
                    if _is_closure_term(pat[1]):
                        raise NotImplementedError(
                            "p+/p* inside GRAPH is not supported")
                    if len(pat) == 4:
                        # silently re-wrapping would overwrite the
                        # inner graph term — loud instead
                        raise NotImplementedError(
                            "nested GRAPH groups are not supported")
                    g["patterns"].append(
                        (pat[0], pat[1], pat[2], gterm))
            elif kw == "values":
                self._next()
                g["values"] = self._parse_values()
            elif kw == "bind":
                self._next()
                self._expect("(")
                expr = self._parse_expr()
                self._expect("as")
                kind, var = self._next()
                if kind != "var":
                    raise SyntaxError("BIND needs (expr AS ?var)")
                self._expect(")")
                g["binds"].append((expr, var))
            elif self._peek()[1] == "{":
                if self._kw(1) != "select":
                    raise NotImplementedError(
                        "nested groups are supported as UNION "
                        "branches or { SELECT ... } subqueries only")
                if g["subquery"] is not None:
                    raise NotImplementedError("one subquery per group")
                self._next()  # {
                g["subquery"] = self._parse_subselect()
                self._expect("}")
            else:
                self._parse_triples_block(g["patterns"])
        self._expect("}")
        return g

    def _parse_triples_block(self, out: list):
        """subject (path obj-list (';' path obj-list)*) '.'?"""
        subj = self._term()
        while True:
            path = self._path()
            while True:
                obj = self._term()
                out.append((subj, path, obj))
                if self._peek()[1] == ",":
                    self._next()
                    continue
                break
            if self._peek()[1] == ";":
                self._next()
                if self._peek()[1] in ("}", "."):  # trailing ;
                    break
                continue
            break
        if self._peek()[1] == ".":
            self._next()

    def _parse_filter(self, g: dict):
        kw = self._kw()
        if kw in ("exists", "not"):
            negated = kw == "not"
            self._next()
            if negated:
                self._expect("exists")
            sub = self.parse_group()
            key = "not_exists" if negated else "exists"
            if g[key] is not None:
                raise NotImplementedError(f"one FILTER {key} per group")
            g[key] = sub["patterns"]
            return
        self._expect("(")
        while True:
            g["filters"].append(self._parse_comparison())
            if self._peek()[1] == "&&":
                self._next()
                continue
            break
        self._expect(")")

    def _parse_comparison(self):
        if self._kw() in _FILTER_FNS:
            fn = self._kw()
            self._next()
            self._expect("(")
            var = self._term()
            self._expect(",")
            const = self._term()
            self._expect(")")
            return (var, fn, const)
        lhs = self._term()
        kind, op = self._next()
        if op not in ("=", "!=", "<", "<=", ">", ">="):
            raise SyntaxError(f"bad FILTER operator {op!r}")
        rhs = self._term()
        return (lhs, "==" if op == "=" else op, rhs)

    def _parse_values(self):
        kind, val = self._peek()
        if kind == "var":           # VALUES ?v { c1 c2 } -> scalar rows
            self._next()
            self._expect("{")
            rows = []
            while self._peek()[1] != "}":
                rows.append(self._term())
            self._expect("}")
            return ([val], rows)
        self._expect("(")           # VALUES (?a ?b) { (c d) ... }
        vs = []
        while self._peek()[0] == "var":
            vs.append(self._next()[1])
        self._expect(")")
        self._expect("{")
        rows = []
        while self._peek()[1] == "(":
            self._next()
            row = tuple(self._term() for _ in vs)
            self._expect(")")
            rows.append(row)
        self._expect("}")
        return (vs, rows)

    def _parse_expr(self):
        """BIND / projection expression -> planner tuple AST."""
        fn = self._kw()
        if fn not in _BIND_FNS:
            raise NotImplementedError(
                f"unsupported expression function {fn!r} (supported: "
                f"{sorted(_BIND_FNS)})")
        self._next()
        self._expect("(")
        args = []
        while self._peek()[1] != ")":
            kind, val = self._peek()
            if kind == "num":
                self._next()
                args.append(int(float(val)))
            else:
                args.append(self._term())
            if self._peek()[1] == ",":
                self._next()
        self._expect(")")
        return (fn, *args)

    # ------------------------------------------------------ SELECT
    def _parse_projection(self, q: dict):
        if self._peek()[1] == "*":
            self._next()
            q["select"] = None
            return
        sel: list[str] = []
        while True:
            kind, val = self._peek()
            if kind == "var":
                self._next()
                sel.append(val[1:])
            elif val == "(":
                self._next()
                if self._kw() in _AGG_FNS:
                    q["aggs"].append(self._parse_agg())
                else:
                    expr = self._parse_expr()
                    self._expect("as")
                    kind, var = self._next()
                    if kind != "var":
                        raise SyntaxError("projection needs AS ?var")
                    self._expect(")")
                    q["binds"].append((expr, var))
                    sel.append(var[1:])
            else:
                break
        q["select"] = sel or None

    def _parse_agg(self):
        fn = self._kw()
        self._next()
        self._expect("(")
        distinct = False
        if self._kw() == "distinct":
            distinct = True
            self._next()
        kind, val = self._next()
        if val == "*":
            var = "*"
        elif kind == "var":
            var = val[1:]
        else:
            raise SyntaxError(f"aggregate needs ?var or *, got {val!r}")
        if fn == "group_concat" and self._peek()[1] == ";":
            self._next()
            self._expect("separator")
            self._expect("=")
            kind, sep = self._next()
            if kind != "literal" or _unquote(sep) != "|":
                raise NotImplementedError(
                    'the engine pins GROUP_CONCAT SEPARATOR="|"')
        self._expect(")")
        self._expect("as")
        kind, alias = self._next()
        if kind != "var":
            raise SyntaxError("aggregate needs AS ?alias")
        self._expect(")")
        if distinct:
            if fn != "count":
                raise NotImplementedError(
                    "DISTINCT is supported for COUNT only")
            fn = "count_distinct"
        return (fn, var, alias[1:])

    # ---------------------------------------------------- modifiers
    def _parse_modifiers(self, q: dict):
        while True:
            kw = self._kw()
            if kw == "group":
                self._next()
                self._expect("by")
                while self._peek()[0] == "var":
                    q["group_by"].append(self._next()[1][1:])
            elif kw == "having":
                self._next()
                self._expect("(")
                while True:
                    q["having"].append(self._parse_having_clause(q))
                    if self._peek()[1] == "&&":
                        self._next()
                        continue
                    break
                self._expect(")")
            elif kw == "order":
                self._next()
                self._expect("by")
                while True:
                    kind, val = self._peek()
                    if kind == "var":
                        self._next()
                        q["order_by"].append((val, "asc"))
                    elif kind == "word" and val.lower() in ("asc",
                                                            "desc"):
                        self._next()
                        self._expect("(")
                        kind, var = self._next()
                        if kind != "var":
                            raise SyntaxError("ORDER BY ASC/DESC(?v)")
                        self._expect(")")
                        q["order_by"].append((var, val.lower()))
                    else:
                        break
            elif kw == "limit":
                self._next()
                kind, n = self._next()
                if kind != "num":
                    raise SyntaxError("LIMIT needs a number")
                q["limit"] = int(n)
            elif kw == "offset":
                self._next()
                kind, n = self._next()
                if kind != "num":
                    raise SyntaxError("OFFSET needs a number")
                q["offset"] = int(n)
            else:
                break

    def _parse_having_clause(self, q: dict):
        """HAVING(COUNT(?v) > 3) or HAVING(?alias > 3): resolve the
        aggregate expression to its SELECT alias."""
        kind, val = self._peek()
        if kind == "var":
            self._next()
            alias = val[1:]
        elif self._kw() in _AGG_FNS:
            fn = self._kw()
            self._next()
            self._expect("(")
            distinct = self._kw() == "distinct"
            if distinct:
                self._next()
            kind, v = self._next()
            var = "*" if v == "*" else v[1:]
            self._expect(")")
            if distinct:
                fn = "count_distinct"
            match = [a for a in q["aggs"]
                     if a[0] == fn and a[1] == var]
            if not match:
                raise SyntaxError(
                    "HAVING aggregate must also appear in SELECT")
            alias = match[0][2]
        else:
            raise SyntaxError("HAVING needs ?alias or AGG(?v)")
        kind, op = self._next()
        if op not in ("=", "!=", "<", "<=", ">", ">="):
            raise SyntaxError(f"bad HAVING operator {op!r}")
        kind, n = self._next()
        if kind != "num":
            raise SyntaxError("HAVING compares against a number")
        return (alias, "==" if op == "=" else op, float(n))

    # ------------------------------------------------------- queries
    @staticmethod
    def _new_q() -> dict:
        return {"form": None, "distinct": False, "select": None,
                "aggs": [], "binds": [], "group_by": [],
                "having": [], "order_by": [], "limit": None,
                "offset": None, "template": None,
                "describe_var": None, "delete": None, "insert": None,
                "group": None}

    def _parse_subselect(self) -> dict:
        """SELECT header + group + modifiers (shared by the top-level
        SELECT form and { SELECT ... } subqueries)."""
        q = self._new_q()
        self._expect("select")
        q["form"] = "select"
        if self._kw() == "distinct":
            q["distinct"] = True
            self._next()
        self._parse_projection(q)
        if self._kw() == "where":
            self._next()
        q["group"] = self.parse_group()
        q["binds"] = q["group"]["binds"] + q["binds"]
        self._parse_modifiers(q)
        return q

    def parse(self) -> dict:
        self.parse_prologue()
        q: dict = self._new_q()
        kw = self._kw()
        if kw == "select":
            q = self._parse_subselect()
        elif kw == "ask":
            self._next()
            q["form"] = "ask"
            if self._kw() == "where":
                self._next()
            q["group"] = self.parse_group()
        elif kw == "construct":
            self._next()
            q["form"] = "construct"
            tpl: list = []
            self._expect("{")
            while self._peek()[1] != "}":
                self._parse_triples_block(tpl)
            self._expect("}")
            q["template"] = tpl
            self._expect("where")
            q["group"] = self.parse_group()
        elif kw == "describe":
            self._next()
            q["form"] = "describe"
            kind, var = self._next()
            if kind != "var":
                raise NotImplementedError(
                    "DESCRIBE supports a single ?var")
            q["describe_var"] = var
            self._expect("where")
            q["group"] = self.parse_group()
        elif kw in ("delete", "insert"):
            q["form"] = "update"
            if kw == "delete":
                self._next()
                if self._kw() == "where":  # DELETE WHERE { } shorthand
                    self._next()
                    q["group"] = self.parse_group()
                    q["delete"] = list(q["group"]["patterns"])
                else:
                    tpl = []
                    self._expect("{")
                    while self._peek()[1] != "}":
                        self._parse_triples_block(tpl)
                    self._expect("}")
                    q["delete"] = tpl
            if self._kw() == "insert":
                self._next()
                tpl = []
                self._expect("{")
                while self._peek()[1] != "}":
                    self._parse_triples_block(tpl)
                self._expect("}")
                q["insert"] = tpl
            if q["group"] is None:
                self._expect("where")
                q["group"] = self.parse_group()
        else:
            raise SyntaxError(f"unknown query form {kw!r}")
        if self._peek()[0] != "eof":
            raise SyntaxError(
                f"trailing tokens from {self._peek()[1]!r}")
        return q


def parse_sparql(text: str) -> dict:
    """Parse a SPARQL string into the engine's plan dict (see module
    docstring for the supported subset)."""
    return _Parser(text).parse()


_CLOSURE_MARKS = ("__closure__", "__closure_star__")


def _is_closure_term(t) -> bool:
    """Is this PREDICATE term a parsed closure (``p+`` / ``p*``)?"""
    return isinstance(t, tuple) and len(t) == 2 \
        and t[0] in _CLOSURE_MARKS


def _is_closure(p) -> bool:
    return _is_closure_term(p[1])


def _closure_pairs(G, triples, pred, star: bool,
                   start_const: str | None, n_buckets: int):
    """The (start, node) relation of ``pred+`` / ``pred*`` as a
    set-distinct Dataset. ``pred*`` unions the ``pred+`` closure with
    the zero-length pairs — every URI term in the graph paired with
    itself (or just (s, s) when the subject slot is the constant
    ``s``) — then pair-dedups (a cycle makes (x, x) reachable via
    ``pred+`` too; set semantics must collapse it).

    ``pred`` is a single member or a tuple (alternation); each member
    may be inverse (``^p``). Anything beyond the plain single forward
    predicate normalizes through ONE stateless edge-projection pass —
    forward members keep (subj, obj), inverse members swap — under a
    synthetic predicate, and the same dual-path closure runs over
    that relation; no extra exchanges."""
    import pandas as pd
    import ray.data as rd

    members = list(pred) if isinstance(pred, tuple) else [pred]
    fwd = [m for m in members if not m.startswith("^")]
    inv = [m[1:] for m in members if m.startswith("^")]
    if len(members) == 1 and fwd:
        src, p_use = triples, members[0]
    else:
        p_use = "urn:x-closure-edge"

        def _edges(df: pd.DataFrame) -> pd.DataFrame:
            parts = []
            if fwd:
                f = df[df["pred"].isin(fwd)]
                parts.append(pd.DataFrame({"subj": f["subj"],
                                           "obj": f["obj"]}))
            if inv:
                i = df[df["pred"].isin(inv)]
                parts.append(pd.DataFrame({
                    "subj": i["obj"].to_numpy(),
                    "obj": i["subj"].to_numpy()}))
            out = (pd.concat(parts, ignore_index=True) if parts
                   else pd.DataFrame({"subj": pd.Series(dtype=object),
                                      "obj": pd.Series(dtype=object)}))
            out["pred"] = p_use
            return out[["subj", "pred", "obj"]]

        src = triples.map_batches(_edges, batch_format="pandas")

    clo = G.path_closure(src, p_use,
                         starts=[start_const] if start_const else None,
                         n_buckets=n_buckets)
    if not star:
        return clo  # path_closure output is already set-distinct
    if start_const is not None:
        zero = rd.from_pandas(pd.DataFrame(
            {"start": [start_const], "node": [start_const]}))
    else:
        def _zero_rows(df: pd.DataFrame) -> pd.DataFrame:
            # subjects are always URI terms of the graph (RDF), so
            # they self-pair unconditionally; only the OBJECT side
            # is filtered to URI kind — a subject whose triples all
            # have literal objects still gets its zero-length pair
            g = df[df["obj_kind"] == "uri"] \
                if "obj_kind" in df.columns else df
            t = pd.unique(pd.concat([df["subj"], g["obj"]],
                                    ignore_index=True))
            return pd.DataFrame({"start": t, "node": t})

        zero = triples.map_batches(_zero_rows, batch_format="pandas")

    def _pair_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df[["start", "node"]]
        h = pd.util.hash_pandas_object(
            g["start"].astype(str) + "\x00" + g["node"].astype(str),
            index=False)
        return g.assign(pb=(h % n_buckets).astype("int64"))

    return (clo.union(zero)
            .map_batches(_pair_bucket, batch_format="pandas")
            .groupby("pb")
            .map_groups(lambda g: g[["start", "node"]]
                        .drop_duplicates(), batch_format="pandas"))


def _compose_closures(G, triples, patterns, n_buckets: int):
    """Rewrite closure patterns as DERIVED RELATIONS joined into the
    BGP plan: each ``(s, p+/p*, o)`` pattern's (start, node) pairs
    become triple rows under a synthetic predicate, unioned with the
    base scan (projected to subj/pred/obj — the only columns the BGP
    planner reads), and the pattern becomes an ordinary constant-
    predicate pattern over that predicate. The closure exchanges stay
    inside :func:`graph.path_closure`; the union adds zero extra
    shuffles."""
    import pyarrow as pa

    base = triples.map_batches(
        lambda t: t.select(["subj", "pred", "obj"]),
        batch_format="pyarrow")
    aug = base
    out_pats = []
    for i, pat in enumerate(patterns):
        if not _is_closure(pat):
            out_pats.append(pat)
            continue
        s, (mark, pred), o = pat
        syn = f"urn:x-sparql-closure:{i}"
        pairs = _closure_pairs(
            G, triples, pred, star=mark == "__closure_star__",
            start_const=None if s.startswith("?") else s,
            n_buckets=n_buckets)

        def _to_triples(t, syn=syn):
            return pa.table({
                "subj": t.column("start").cast(pa.string()),
                "pred": pa.array([syn] * len(t), pa.string()),
                "obj": t.column("node").cast(pa.string())})

        aug = aug.union(pairs.map_batches(_to_triples,
                                          batch_format="pyarrow"))
        out_pats.append((s, syn, o))
    return aug, out_pats


def run_sparql(triples, text: str, n_buckets: int = 64):
    """Parse ``text`` and execute it over the ``triples`` Dataset
    (columns subj/pred/obj[, provenance]) — a Dataset out for
    SELECT/CONSTRUCT/DESCRIBE/update, a bool for ASK. Dispatches to
    the oracled plan operators; the text layer itself moves no
    data."""
    from rdf_extraction_ray.stages import graph as G

    q = parse_sparql(text)
    g = q["group"]

    # closure paths (p+ / p*) outside the required pattern block are
    # out of scope — loud errors, never a silent misplan
    aux_pats = list(g["optional"]) + list(g["minus"] or []) \
        + list(g["exists"] or []) + list(g["not_exists"] or []) \
        + [p for pats, opt in (g["union"] or [])
           for p in list(pats) + list(opt or [])] \
        + list(q["template"] or []) + list(q["delete"] or []) \
        + list(q["insert"] or [])
    if g["subquery"] is not None:
        ig = g["subquery"]["group"]
        # subquery bodies route to bgp_aggregate, which reads a
        # closure marker tuple as a plain predicate ALTERNATION —
        # guard them too, or transitive patterns silently become
        # single-hop matches
        aux_pats += list(ig["patterns"]) + list(ig["optional"]) \
            + list(ig["minus"] or []) + list(ig["exists"] or []) \
            + list(ig["not_exists"] or [])
        if g["subquery"].get("offset") is not None:
            raise NotImplementedError(
                "OFFSET inside a subquery is not supported")
    if any(_is_closure(p) for p in aux_pats):
        raise NotImplementedError(
            "p+/p* are supported in the required pattern block of "
            "the (outer) query only")

    # GRAPH (quad) patterns plan through bgp_match's graph slot —
    # supported in the required and OPTIONAL blocks; everywhere else
    # (UNION branches, MINUS / EXISTS bodies, subqueries, templates)
    # stays a loud error rather than a silently ignored 4th slot
    no_quad_zones = list(g["minus"] or []) + list(g["exists"] or []) \
        + list(g["not_exists"] or []) \
        + [p for pats, opt in (g["union"] or [])
           for p in list(pats) + list(opt or [])] \
        + list(q["template"] or []) + list(q["delete"] or []) \
        + list(q["insert"] or [])
    if g["subquery"] is not None:
        ig = g["subquery"]["group"]
        no_quad_zones += list(ig["patterns"]) + list(ig["optional"])
    if any(len(tuple(p)) == 4 for p in no_quad_zones):
        raise NotImplementedError(
            "GRAPH patterns are supported in the required and "
            "OPTIONAL blocks of the outer query only")

    closures = [p for p in (g["patterns"] or []) if _is_closure(p)]
    if closures:
        # the composed plan unions closure pairs into the scanned
        # triple set under synthetic predicates and projects it to
        # (subj, pred, obj) — two whole-query shapes cannot share
        # that scan and must stay loud:
        # 1. GRAPH quads anywhere (the projection drops the graph
        #    column → a misleading runtime error),
        # 2. VARIABLE predicates anywhere (the unfiltered scan would
        #    match the synthetic 'urn:x-sparql-closure:N' rows as if
        #    they were real triples — silently wrong solutions)
        _composed_zones = list(g["patterns"]) + list(g["optional"]) \
            + list(g["minus"] or []) + list(g["exists"] or []) \
            + list(g["not_exists"] or [])
        if any(len(tuple(p)) == 4 for p in _composed_zones):
            raise NotImplementedError(
                "GRAPH patterns do not compose with p+/p* (the "
                "closure union projects the graph column away)")
        if any(isinstance(p[1], str) and p[1].startswith("?")
               for p in _composed_zones):
            raise NotImplementedError(
                "variable predicates do not compose with p+/p* "
                "(the unfiltered scan would match the derived "
                "closure relation's synthetic predicates)")
        simple = (
            q["form"] == "select" and len(g["patterns"]) == 1
            and not any(g[k] for k in ("optional", "filters", "binds"))
            and not g["union"] and not g["minus"] and not g["exists"]
            and not g["not_exists"] and not g["values"]
            and not g["subquery"] and not q["aggs"]
            and not q["order_by"] and q["limit"] is None
            and q["offset"] is None)
        if simple:
            # the direct dispatch additionally requires a shape whose
            # result IS the (already set-distinct) closure relation:
            # distinct endpoint slots (?x p+ ?x needs the planner's
            # same-variable equality), a projection that keeps every
            # bound variable (a strict subset would need a dedup
            # under DISTINCT and bgp_match's loud unbound-var check
            # otherwise) — anything else routes through the composed
            # path, where bgp_match applies the full solution
            # semantics
            s, (mark, pred), o = g["patterns"][0]
            svar = s[1:] if s.startswith("?") else None
            ovar = o[1:] if o.startswith("?") else None
            bound = {v for v in (svar, ovar) if v}
            sel = q["select"]
            simple = (
                (svar is None or svar != ovar)
                and (sel is None or set(sel) == bound))
        if simple:
            out = _closure_pairs(
                G, triples, pred, star=mark == "__closure_star__",
                start_const=None if s.startswith("?") else s,
                n_buckets=n_buckets)
            # closure columns are (start, node); map them to the
            # pattern's variables (a constant slot filters instead) —
            # one zero-copy Arrow pass does filter + rename + project
            names = {"start": s[1:] if s.startswith("?") else None,
                     "node": o[1:] if o.startswith("?") else None}
            keep = q["select"] or [v for v in names.values() if v]
            keep = [v for v in keep if v in names.values()]

            def _shape(t, o=o, names=names, keep=keep):
                import pyarrow as pa
                import pyarrow.compute as pc
                if names["node"] is None:  # ?x p+ <const o>
                    t = t.filter(pc.equal(t.column("node"), o))
                cols = {v: t.column(c) for c, v in names.items() if v}
                return pa.table({v: cols[v] for v in keep})

            return out.map_batches(_shape, batch_format="pyarrow")
        if q["form"] not in ("select", "ask", "construct"):
            raise NotImplementedError(
                "p+/p* compose with other patterns in SELECT / ASK / "
                "CONSTRUCT only (DESCRIBE and updates return graph "
                "triples, which a derived closure relation would "
                "pollute)")
        triples, g["patterns"] = _compose_closures(
            G, triples, g["patterns"], n_buckets)

    if q["form"] == "ask":
        if g["union"] or g["minus"] or g["exists"] or g["not_exists"] \
                or g["values"] or g["binds"] or g["subquery"]:
            raise NotImplementedError(
                "ASK supports patterns + OPTIONAL + FILTER")
        return G.bgp_ask(triples, g["patterns"],
                         optional=g["optional"] or None,
                         filters=g["filters"] or None,
                         n_buckets=n_buckets)

    if q["form"] == "construct":
        if g["filters"] or g["union"] or g["minus"] or g["values"] \
                or g["subquery"] or g["binds"]:
            raise NotImplementedError(
                "CONSTRUCT supports patterns + OPTIONAL")
        return G.bgp_construct(triples, g["patterns"], q["template"],
                               optional=g["optional"] or None,
                               n_buckets=n_buckets)

    if q["form"] == "describe":
        if g["filters"] or g["union"] or g["minus"] or g["values"] \
                or g["subquery"] or g["binds"]:
            raise NotImplementedError(
                "DESCRIBE supports patterns + OPTIONAL")
        return G.describe_subjects(triples, g["patterns"],
                                   q["describe_var"],
                                   optional=g["optional"] or None,
                                   n_buckets=n_buckets)

    if q["form"] == "update":
        if g["filters"] or g["union"] or g["minus"] or g["values"] \
                or g["subquery"] or g["binds"]:
            raise NotImplementedError(
                "updates support patterns + OPTIONAL in WHERE")
        return G.sparql_update(triples, g["patterns"],
                               delete=q["delete"], insert=q["insert"],
                               optional=g["optional"] or None,
                               n_buckets=n_buckets)

    # ---- SELECT
    if q["offset"] is not None and (
            g["union"] is not None or g["subquery"] is not None
            or q["aggs"] or q["group_by"] or g["minus"] is not None
            or g["exists"] is not None or g["not_exists"] is not None):
        raise NotImplementedError(
            "OFFSET composes with the plain pattern SELECT "
            "(ORDER BY + LIMIT pagination)")
    if g["union"] is not None:
        if q["aggs"] or q["binds"] or q["order_by"] or q["limit"] \
                or q["group_by"]:
            raise NotImplementedError(
                "UNION composes with DISTINCT only")
        select = q["select"]
        if select is None:  # SELECT *: vars in first-appearance order
            from rdf_extraction_ray.stages.graph import _pattern_vars
            select = []
            for pats, opt in g["union"]:
                for v in _pattern_vars(list(pats) + list(opt or [])):
                    if v not in select:
                        select.append(v)
        return G.bgp_union(triples, g["union"], select,
                           distinct=q["distinct"], n_buckets=n_buckets)

    if g["subquery"] is not None:
        inner = g["subquery"]
        ig = inner["group"]
        if not inner["aggs"]:
            raise NotImplementedError(
                "subqueries must be aggregate SELECTs (the planner "
                "joins an aggregate-small inner sequence)")
        if ig["union"] or ig["minus"] or ig["exists"] \
                or ig["not_exists"] or ig["values"] or ig["subquery"] \
                or inner["order_by"] or inner["limit"]:
            raise NotImplementedError(
                "subquery bodies support patterns, OPTIONAL, FILTER "
                "and BIND")
        if q["aggs"] or q["binds"] or q["order_by"] or q["limit"] \
                or g["minus"] or g["exists"] or g["not_exists"] \
                or g["values"]:
            raise NotImplementedError(
                "the outer query of a subquery supports patterns, "
                "OPTIONAL, FILTER and DISTINCT")
        sub = G.bgp_aggregate(triples, ig["patterns"],
                              inner["group_by"], inner["aggs"],
                              optional=ig["optional"] or None,
                              filters=ig["filters"] or None,
                              having=inner["having"] or None,
                              binds=inner["binds"] or None,
                              n_buckets=n_buckets)
        from rdf_extraction_ray.stages.graph import _pattern_vars
        outer_vars = _pattern_vars(
            list(g["patterns"]) + list(g["optional"]))
        inner_cols = inner["group_by"] + [a[2] for a in inner["aggs"]]
        on = [v for v in inner_cols if v in outer_vars]
        if not on:
            raise ValueError(
                "subquery shares no variable with the outer pattern")
        return G.bgp_subquery(triples, g["patterns"], sub, on,
                              select=q["select"],
                              distinct=q["distinct"],
                              optional=g["optional"] or None,
                              filters=g["filters"] or None,
                              n_buckets=n_buckets)

    if q["aggs"] or q["group_by"]:
        if not q["aggs"]:
            raise NotImplementedError("GROUP BY needs aggregates")
        if g["minus"] or g["exists"] or g["not_exists"] or g["values"]:
            raise NotImplementedError(
                "aggregates compose with patterns/OPTIONAL/FILTER/BIND")
        if q["order_by"] or q["limit"]:
            raise NotImplementedError(
                "ORDER BY / LIMIT over aggregates is not supported")
        return G.bgp_aggregate(triples, g["patterns"], q["group_by"],
                               q["aggs"],
                               optional=g["optional"] or None,
                               filters=g["filters"] or None,
                               having=q["having"] or None,
                               binds=q["binds"] or None,
                               n_buckets=n_buckets)
    if q["having"]:
        raise NotImplementedError("HAVING needs GROUP BY aggregates")

    if g["minus"] is not None or g["not_exists"] is not None:
        if g["values"] or q["binds"] or q["order_by"] or q["limit"] \
                or g["exists"] is not None:
            raise NotImplementedError(
                "MINUS / NOT EXISTS compose with patterns, OPTIONAL, "
                "FILTER and DISTINCT")
        return G.bgp_minus(triples, g["patterns"],
                           g["minus"] if g["minus"] is not None
                           else g["not_exists"],
                           select=q["select"], distinct=q["distinct"],
                           optional=g["optional"] or None,
                           filters=g["filters"] or None,
                           n_buckets=n_buckets)

    if g["exists"] is not None:
        if g["values"] or q["binds"] or q["order_by"] or q["limit"]:
            raise NotImplementedError(
                "FILTER EXISTS composes with patterns, OPTIONAL, "
                "FILTER and DISTINCT")
        return G.bgp_exists(triples, g["patterns"], g["exists"],
                            select=q["select"], distinct=q["distinct"],
                            optional=g["optional"] or None,
                            filters=g["filters"] or None,
                            n_buckets=n_buckets)

    offset = q["offset"]
    if offset:
        # paginated top-k: fetch the sorted top (offset + limit)
        # rows, then drop the first ``offset`` — the materialization
        # is RESULT-PAGE-sized (offset + limit rows), never the full
        # solution sequence, which is why ORDER BY + LIMIT are
        # required (unordered OFFSET would be nondeterministic
        # anyway)
        if not q["order_by"] or q["limit"] is None:
            raise NotImplementedError(
                "OFFSET requires ORDER BY and LIMIT")
        import pandas as pd
        import ray.data as rd
        out = G.bgp_match(triples, g["patterns"], select=q["select"],
                          distinct=q["distinct"],
                          optional=g["optional"] or None,
                          filters=g["filters"] or None,
                          values=g["values"],
                          order_by=q["order_by"] or None,
                          limit=q["limit"] + offset,
                          binds=q["binds"] or None,
                          n_buckets=n_buckets)
        page = out.to_pandas().iloc[offset:].reset_index(drop=True)
        return rd.from_pandas(page)
    return G.bgp_match(triples, g["patterns"], select=q["select"],
                       distinct=q["distinct"],
                       optional=g["optional"] or None,
                       filters=g["filters"] or None,
                       values=g["values"],
                       order_by=q["order_by"] or None,
                       limit=q["limit"], binds=q["binds"] or None,
                       n_buckets=n_buckets)
