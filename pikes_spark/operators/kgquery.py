"""SPARQL basic-graph-pattern queries over the materialized triple table.

The reference emits RDF that users query downstream with SPARQL (its
TQL/Turtle dumps feed triple stores; cf. SURVEY §2.1 S4). This module
closes that loop inside the engine: a small SPARQL subset —
PREFIX, SELECT [DISTINCT], WHERE { triple patterns + FILTER +
OPTIONAL { ... } }, ORDER BY, LIMIT — compiled straight to DataFrame
operations over the (subject, predicate, object) table the distiller
materializes. OPTIONAL groups become left-outer joins on the shared
variables (unbound optional vars surface as NULL, SPARQL's unbound).

Spark-first compilation:
- each triple pattern becomes a filtered projection of the triple
  scan — constant terms turn into equality predicates that Catalyst
  pushes down to the parquet scan (PushedFilters), variables become
  column aliases;
- shared variables between patterns become equi-join keys (shuffle
  hash join; AQE picks broadcast when one side is small at runtime).
  Patterns are joined most-constrained-first (more constants = more
  selective) so intermediate results stay small without a cost model;
- a pattern whose predicate AND object are constants is a
  high-selectivity dimension probe: it is explicitly broadcast()
  so a 10^12-triple join plan never shuffles the big side on it;
- FILTER expressions apply as soon as all their variables are bound.

No driver-side evaluation: the query plan is fully declarative, so a
BGP over a 100 TB triple table distributes exactly like any relational
join DAG.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

from pyspark.sql import DataFrame, functions as F


class SparqlError(ValueError):
    pass


_TERM_RE = re.compile(
    r"""\s*(?:
        (?P<var>\?[A-Za-z_][A-Za-z0-9_]*)
      | (?P<iri><[^>\s]+>)
      | (?P<pname>[A-Za-z_][A-Za-z0-9_.-]*:[A-Za-z0-9_.%-]*)
      | (?P<lit>"(?:[^"\\]|\\.)*")
      | (?P<num>-?\d+(?:\.\d+)?)
      | (?P<a>\ba\b)
    )\s*""",
    re.VERBOSE,
)

_DEFAULT_PREFIXES = {
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "owl": "http://www.w3.org/2002/07/owl#",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
}


class _Term:
    __slots__ = ("kind", "value", "trans", "iris", "inv", "mod")

    def __init__(self, kind: str, value: str, trans: bool = False):
        self.kind = kind    # 'var' | 'iri' | 'lit' | 'path'
        self.value = value  # var name without '?', absolute IRI, or literal text
        self.trans = trans  # legacy flag: one-or-more property path (predicate+)
        # property-path step attributes (kind == 'path'):
        self.iris: List[str] = []  # alternation members (>=1 IRI)
        self.inv = False           # ^ inverse step
        self.mod = ""              # '' | '+' | '*' | '?'


def _parse_term(tok: str, prefixes: Dict[str, str]) -> _Term:
    m = _TERM_RE.match(tok)
    if not m or m.end() != len(tok):
        raise SparqlError(f"bad term: {tok!r}")
    if m.group("var"):
        return _Term("var", m.group("var")[1:])
    if m.group("iri"):
        return _Term("iri", m.group("iri")[1:-1])
    if m.group("a"):
        return _Term("iri", _DEFAULT_PREFIXES["rdf"] + "type")
    if m.group("pname"):
        pfx, local = m.group("pname").split(":", 1)
        if pfx not in prefixes:
            raise SparqlError(f"unknown prefix: {pfx}")
        return _Term("iri", prefixes[pfx] + local)
    if m.group("lit"):
        return _Term("lit", re.sub(r"\\(.)", r"\1", m.group("lit")[1:-1]))
    return _Term("lit", m.group("num"))


_VALUES_TOKEN_RE = re.compile(
    "UNDEF"
    r'|<[^>\s]+>'
    r'|"(?:[^"\\]|\\.)*"'
    r"|[A-Za-z_][\w.-]*:[\w.%-]*"
    r"|-?\d+(?:\.\d+)?")

_FILTER_RE = re.compile(
    r"""^(?:
        regex\(\s*\?(?P<rvar>\w+)\s*,\s*"(?P<rpat>(?:[^"\\]|\\.)*)"\s*\)
      | \?(?P<lvar>\w+)\s*(?P<op>!=|<=|>=|=|<|>)\s*(?P<rhs>.+)
    )$""",
    re.VERBOSE,
)


class _Unbound(Exception):
    """An expression references a variable not (yet) bound."""

    def __init__(self, var: str):
        self.var = var


_EXPR_TOKEN_RE = re.compile(
    r'\s*(?:(?P<str>"(?:[^"\\]|\\.)*")'
    r"|(?P<num>-?\d+(?:\.\d+)?)"
    r"|(?P<var>\?\w+)"
    r"|(?P<iri><[^<>\s]*>)"
    r"|(?P<pname>[A-Za-z_][\w.-]*:[\w.%-]*)"
    r"|(?P<name>[A-Za-z_]\w*)"
    r"|(?P<op>\|\||&&|!=|<=|>=|=|<|>|[()+,*!/-]))")

# SPARQL builtin -> 1-arg Column transform
_FN1 = {
    "STRLEN": F.length,
    "UCASE": F.upper,
    "LCASE": F.lower,
    "STR": lambda c: c.cast("string"),
    "ABS": F.abs,
    "BOUND": lambda c: c.isNotNull(),
    "ROUND": F.round,
    "CEIL": F.ceil,
    "FLOOR": F.floor,
    "MD5": lambda c: F.md5(c.cast("string")),
    "SHA1": lambda c: F.sha1(c.cast("string")),
    "SHA256": lambda c: F.sha2(c.cast("string"), 256),
    # url_encode is form-encoding (space -> '+'); SPARQL requires the
    # RFC 3986 percent form, so rewrite '+' to %20
    "ENCODE_FOR_URI": lambda c: F.regexp_replace(
        F.url_encode(c.cast("string")), r"\+", "%20"),
}
_FN2 = {
    "STRSTARTS": lambda a, b: a.startswith(b),
    "STRENDS": lambda a, b: a.endswith(b),
    "CONTAINS": lambda a, b: a.contains(b),
    "STRBEFORE": lambda a, b: F.substring_index(a, b, 1),
    "STRAFTER": lambda a, b: F.substring_index(a, b, -1),
}


class _ExprParser:
    """Recursive-descent compiler for the SPARQL expression subset
    used in FILTER / BIND / HAVING: ||, &&, !, comparisons, + - * /,
    string builtins (STRLEN/UCASE/LCASE/STR/CONCAT/SUBSTR/REPLACE/
    STRSTARTS/STRENDS/CONTAINS/STRBEFORE/STRAFTER), REGEX, BOUND, IF
    and COALESCE — each mapping 1:1 onto a Catalyst expression, so
    the whole filter/bind stays JVM-side."""

    def __init__(self, text: str, bound: Dict[str, str],
                 prefixes: Dict[str, str]):
        self.toks: List[Tuple[str, str]] = []
        pos = 0
        while pos < len(text):
            m = _EXPR_TOKEN_RE.match(text, pos)
            if not m or m.end() == pos:
                if text[pos:].strip():
                    raise SparqlError(f"bad expression token at: {text[pos:]!r}")
                break
            pos = m.end()
            for kind in ("str", "num", "var", "iri", "pname", "name", "op"):
                if m.group(kind) is not None:
                    self.toks.append((kind, m.group(kind)))
                    break
        self.i = 0
        self.bound = bound
        self.prefixes = prefixes

    def _peek(self, kind=None, value=None):
        if self.i >= len(self.toks):
            return None
        k, v = self.toks[self.i]
        if kind and k != kind:
            return None
        if value and v != value:
            return None
        return v

    def _next(self):
        tok = self.toks[self.i]
        self.i += 1
        return tok

    def parse(self):
        out = self._or()
        if self.i < len(self.toks):
            raise SparqlError(
                f"trailing expression tokens: {self.toks[self.i:]!r}")
        return out

    def _or(self):
        left = self._and()
        while self._peek("op", "||"):
            self._next()
            left = left | self._and()
        return left

    def _and(self):
        left = self._not()
        while self._peek("op", "&&"):
            self._next()
            left = left & self._not()
        return left

    def _not(self):
        if self._peek("op", "!"):
            self._next()
            return ~self._not()
        return self._cmp()

    def _cmp(self):
        left = self._add()
        for op in ("!=", "<=", ">=", "=", "<", ">"):
            if self._peek("op", op):
                self._next()
                right = self._add()
                return {"=": left == right, "!=": left != right,
                        "<": left < right, ">": left > right,
                        "<=": left <= right, ">=": left >= right}[op]
        return left

    def _add(self):
        left = self._mul()
        while True:
            if self._peek("op", "+"):
                self._next()
                left = left + self._mul()
            elif self._peek("op", "-"):
                self._next()
                left = left - self._mul()
            else:
                return left

    def _mul(self):
        left = self._atom()
        while True:
            if self._peek("op", "*"):
                self._next()
                left = left * self._atom()
            elif self._peek("op", "/"):
                self._next()
                left = left / self._atom()
            else:
                return left

    def _args(self) -> list:
        if not self._peek("op", "("):
            raise SparqlError("expected ( after function name")
        self._next()
        args = [self._or()]
        while self._peek("op", ","):
            self._next()
            args.append(self._or())
        if not self._peek("op", ")"):
            raise SparqlError("expected ) closing function call")
        self._next()
        return args

    def _atom(self):
        if self._peek("op", "("):
            self._next()
            out = self._or()
            if not self._peek("op", ")"):
                raise SparqlError("unbalanced ( in expression")
            self._next()
            return out
        if self.i >= len(self.toks):
            raise SparqlError("unexpected end of expression")
        kind, v = self._next()
        if kind == "str":
            return F.lit(v[1:-1].replace('\\"', '"').replace("\\\\", "\\"))
        if kind == "num":
            return F.lit(float(v) if "." in v else int(v))
        if kind in ("iri", "pname"):
            return F.lit(_parse_term(v, self.prefixes).value)
        if kind == "var":
            name = v[1:]
            if name not in self.bound:
                raise _Unbound(name)
            return F.col(self.bound[name])
        if kind == "name":
            fn = v.upper()
            args = self._args()
            if fn in _FN1 and len(args) == 1:
                return _FN1[fn](args[0])
            if fn in _FN2 and len(args) == 2:
                return _FN2[fn](args[0], args[1])
            if fn == "CONCAT":
                return F.concat(*[a.cast("string") for a in args])
            if fn == "COALESCE":
                return F.coalesce(*args)
            if fn == "SUBSTR" and len(args) == 2:
                return args[0].substr(args[1].cast("int"),
                                      F.length(args[0]))
            if fn == "SUBSTR" and len(args) == 3:
                return args[0].substr(args[1].cast("int"),
                                      args[2].cast("int"))
            if fn == "REPLACE" and len(args) == 3:
                return F.regexp_replace(args[0], args[1], args[2])
            if fn == "REGEX" and len(args) == 2:
                return F.regexp_like(args[0], args[1])
            if fn == "IF" and len(args) == 3:
                return F.when(args[0], args[1]).otherwise(args[2])
            raise SparqlError(f"unsupported function {v}({len(args)} args)")
        raise SparqlError(f"unexpected token {v!r} in expression")


def _compile_expr(text: str, bound: Dict[str, str],
                  prefixes: Dict[str, str]):
    """Compile an expression to a Column; None if a variable it uses
    is not yet bound (caller defers the filter)."""
    try:
        return _ExprParser(text, bound, prefixes).parse()
    except _Unbound:
        return None


def _match_paren(text: str, open_idx: int) -> int:
    """Index just past the ')' matching text[open_idx] == '(' (quote
    aware); raises on imbalance."""
    depth = 0
    i = open_idx
    in_quote = False
    while i < len(text):
        ch = text[i]
        if in_quote:
            if ch == "\\":
                i += 1
            elif ch == '"':
                in_quote = False
        elif ch == '"':
            in_quote = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    raise SparqlError("unbalanced ( in expression")


def _match_brace(text: str, open_idx: int) -> int:
    """Index just past the '}' matching text[open_idx] == '{' (quote
    aware); raises on imbalance."""
    depth = 0
    i = open_idx
    in_quote = False
    while i < len(text):
        ch = text[i]
        if in_quote:
            if ch == "\\":
                i += 1
            elif ch == '"':
                in_quote = False
        elif ch == '"':
            in_quote = True
        elif ch == "{":
            depth += 1
        elif ch == "}":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    raise SparqlError("unbalanced { in group")


def _split_patterns(body: str) -> List[str]:
    """Split the WHERE body on '.' separators that sit outside quotes
    and outside <IRI> brackets (IRIs and literals may contain dots)."""
    parts: List[str] = []
    buf: List[str] = []
    in_quote = in_iri = False
    i = 0
    while i < len(body):
        ch = body[i]
        if in_quote:
            buf.append(ch)
            if ch == "\\" and i + 1 < len(body):
                buf.append(body[i + 1])
                i += 1
            elif ch == '"':
                in_quote = False
        elif in_iri:
            buf.append(ch)
            if ch == ">":
                in_iri = False
        elif ch == '"':
            in_quote = True
            buf.append(ch)
        elif ch == "<":
            in_iri = True
            buf.append(ch)
        elif ch == ".":
            nxt = body[i + 1] if i + 1 < len(body) else " "
            if nxt.isspace() or nxt == "}" or i + 1 == len(body):
                parts.append("".join(buf))
                buf = []
            else:
                buf.append(ch)
        else:
            buf.append(ch)
        i += 1
    parts.append("".join(buf))
    return [p.strip() for p in parts if p.strip()]


class SparqlQuery:
    """Parsed representation of the supported SPARQL subset."""

    def __init__(self, text: str):
        self.prefixes = dict(_DEFAULT_PREFIXES)
        self.distinct = False
        self.projection: List[str] = []
        self.patterns: List[Tuple[_Term, _Term, _Term]] = []
        self.filters: List[str] = []
        # OPTIONAL groups: each a (patterns, filters) pair, left-joined
        self.optionals: List[Tuple[List[Tuple[_Term, _Term, _Term]], List[str]]] = []
        # (fn, distinct, arg('?v'|'*'), alias) projection aggregates
        self.aggregates: List[Tuple[str, bool, str, str]] = []
        self.group_by: List[str] = []
        # UNION blocks: each a list of branch (patterns, filters)
        self.unions: List[List[Tuple[list, List[str]]]] = []
        # negation groups (MINUS / FILTER NOT EXISTS): (patterns, filters)
        self.minuses: List[Tuple[list, List[str]]] = []
        # positive FILTER EXISTS groups: (patterns, filters), semi-joined
        self.exists: List[Tuple[list, List[str]]] = []
        # nested { SELECT ... } subqueries: raw text, joined on shared vars
        self.subqueries: List[str] = []
        # GRAPH groups: (graph _Term or None-for-var, var name or None,
        # patterns, filters) — quads against the `graph` column
        self.graph_groups: List[Tuple[Optional[str], Optional[str],
                                      list, List[str]]] = []
        # GROUP_CONCAT alias -> separator (default " ")
        self.agg_sep: Dict[str, str] = {}
        # VALUES blocks: (var names, rows of str-or-None)
        self.values: List[Tuple[List[str], List[List[Optional[str]]]]] = []
        self.order_by: List[Tuple[str, bool]] = []  # (var, descending)
        self.limit: Optional[int] = None
        self.offset: Optional[int] = None
        self.binds: List[Tuple[str, str]] = []  # (alias, expr text), in order
        self.having: Optional[str] = None  # expr with aggs -> ?_hav<i>
        self._seq = 0  # fresh-variable counter for '/'-sequence expansion
        self._parse(text)

    # one FILTER(...) clause: quoted strings and one paren-nesting
    # level (function calls like regex(...)) are matched, so multiple
    # FILTERs in a row — no dot separator needed in SPARQL — split
    _QSTR = '"(?:[^"\\\\]|\\\\.)*"'  # quoted string with escape pairs
    _FILTER_CLAUSE_RE = re.compile(
        'FILTER\\s*\\((?P<e>(?:[^()"]|' + _QSTR
        + '|\\((?:[^()"]|' + _QSTR + ')*\\))*)\\)',
        re.I | re.S)

    def _parse_group(self, body: str):
        patterns: List[Tuple[_Term, _Term, _Term]] = []
        filters: List[str] = []
        for part in _split_patterns(body):
            def _grab_filter(fm):
                filters.append(fm.group("e").strip())
                return " "

            part = self._FILTER_CLAUSE_RE.sub(_grab_filter, part).strip()
            if not part:
                continue
            patterns.extend(self._parse_triple(part))
        return patterns, filters

    # a path atom: IRI, pname, or the 'a' keyword — NO trailing-space
    # consumption, so modifier adjacency (p+ vs "p ?o") is decidable
    _PATH_ATOM_RE = re.compile(r"<[^>\s]+>|[A-Za-z_][\w.-]*:[\w.%-]*|a(?![\w:])")

    def _atom_iri(self, tok: str) -> str:
        t = _parse_term(tok, self.prefixes)
        if t.kind != "iri":
            raise SparqlError(f"property path atom must be an IRI: {tok!r}")
        return t.value

    def _parse_path(self, s: str, pos: int):
        """Parse a property-path expression at s[pos:]: a '/'-sequence
        of steps, each step  '^'? (iri | '(' iri ('|' iri)* ')') [+*?].
        Top-level alternation a|b (no parens) is accepted when the whole
        path is one step. Returns (steps, newpos) where each step is
        (iris, inv, mod)."""
        steps = []
        while True:
            while pos < len(s) and s[pos].isspace():
                pos += 1
            inv = False
            if pos < len(s) and s[pos] == "^":
                inv = True
                pos += 1
                while pos < len(s) and s[pos].isspace():
                    pos += 1
            iris: List[str] = []
            if pos < len(s) and s[pos] == "(":
                end = s.find(")", pos)
                if end < 0:
                    raise SparqlError("unbalanced ( in property path")
                for alt in s[pos + 1: end].split("|"):
                    iris.append(self._atom_iri(alt.strip()))
                pos = end + 1
            else:
                m = self._PATH_ATOM_RE.match(s, pos)
                if not m:
                    raise SparqlError(f"bad property path at: {s[pos:]!r}")
                iris.append(self._atom_iri(m.group(0)))
                pos = m.end()
                # bare top-level alternation: p1|p2 (spaces allowed)
                while True:
                    save = pos
                    while pos < len(s) and s[pos].isspace():
                        pos += 1
                    if pos < len(s) and s[pos] == "|":
                        pos += 1
                        while pos < len(s) and s[pos].isspace():
                            pos += 1
                        m = self._PATH_ATOM_RE.match(s, pos)
                        if not m:
                            raise SparqlError(
                                f"bad path alternation at: {s[pos:]!r}")
                        iris.append(self._atom_iri(m.group(0)))
                        pos = m.end()
                    else:
                        pos = save
                        break
            mod = ""
            if pos < len(s) and s[pos] in "+*?":
                # adjacency required: "p?" is zero-or-one, "p ?o" is an
                # object variable
                mod = s[pos]
                pos += 1
            steps.append((iris, inv, mod))
            save = pos
            while pos < len(s) and s[pos].isspace():
                pos += 1
            if pos < len(s) and s[pos] == "/":
                pos += 1
                continue
            return steps, save

    def _parse_triple(self, part: str):
        """One triple pattern 'subject path object' -> one or more
        (s, p, o) pattern tuples ('/' sequences expand through fresh
        internal variables named _pp<N>)."""
        tm = _TERM_RE.match(part, 0)
        if not tm:
            raise SparqlError(f"bad triple pattern: {part!r}")
        subj = _parse_term(part[tm.start(): tm.end()].strip(), self.prefixes)
        if subj.kind == "path":
            raise SparqlError("property path only valid on predicate")
        pos = tm.end()
        look = pos
        while look < len(part) and part[look].isspace():
            look += 1
        if look < len(part) and part[look] == "?":
            tm = _TERM_RE.match(part, pos)
            pred = _parse_term(part[tm.start(): tm.end()].strip(),
                               self.prefixes)
            steps = None
            pos = tm.end()
        else:
            steps, pos = self._parse_path(part, pos)
        tm = _TERM_RE.match(part, pos)
        if not tm:
            raise SparqlError(f"pattern needs an object term: {part!r}")
        obj = _parse_term(part[tm.start(): tm.end()].strip(), self.prefixes)
        if tm.end() != len(part):
            raise SparqlError(f"trailing tokens in pattern: {part!r}")
        if steps is None:
            return [(subj, pred, obj)]
        out = []
        cur = subj
        for i, (iris, inv, mod) in enumerate(steps):
            last = i == len(steps) - 1
            if last:
                nxt = obj
            else:
                nxt = _Term("var", f"_pp{self._seq}")
                self._seq += 1
            if len(iris) == 1 and not inv and mod == "":
                p = _Term("iri", iris[0])
            else:
                p = _Term("path", iris[0], trans=(mod == "+"))
                p.iris = list(iris)
                p.inv = inv
                p.mod = mod
            out.append((cur, p, nxt))
            cur = nxt
        return out

    def _parse(self, text: str) -> None:
        text = text.strip()
        for m in re.finditer(r"PREFIX\s+(\w+):\s*<([^>]*)>", text, re.I):
            self.prefixes[m.group(1)] = m.group(2)
        m = re.search(
            r"SELECT\s+(DISTINCT\s+)?(?P<proj>.*?)\s*WHERE\s*\{(?P<body>.*)\}"
            r"\s*(?P<tail>[^}]*)$",
            text, re.I | re.S)
        if not m:
            raise SparqlError("expected SELECT ... WHERE { ... }")
        self.distinct = bool(m.group(1))
        proj = m.group("proj").strip()
        # aggregate entries: (FN([DISTINCT] ?v | *) AS ?alias)
        agg_re = re.compile(
            r"\(\s*(?P<fn>COUNT|SUM|MIN|MAX|AVG|GROUP_CONCAT|SAMPLE)\s*\(\s*"
            r"(?P<dist>DISTINCT\s+)?(?P<arg>\?\w+|\*)\s*"
            r'(?:;\s*SEPARATOR\s*=\s*"(?P<sep>(?:[^"\\]|\\.)*)"\s*)?\)\s+'
            r"AS\s+\?(?P<alias>\w+)\s*\)", re.I)
        for am in agg_re.finditer(proj):
            fn = am.group("fn").upper()
            self.aggregates.append((fn, bool(am.group("dist")),
                                    am.group("arg"),
                                    am.group("alias")))
            if fn == "GROUP_CONCAT":
                sep = am.group("sep")
                self.agg_sep[am.group("alias")] = (
                    " " if sep is None
                    else sep.replace('\\"', '"').replace("\\\\", "\\"))
        proj = agg_re.sub(" ", proj)
        if proj.strip() == "*" and not self.aggregates:
            self.projection = []
        else:
            self.projection = [v[1:] for v in re.findall(r"\?\w+", proj)]
            if not self.projection and not self.aggregates:
                raise SparqlError(f"bad projection: {proj!r}")
        body = m.group("body")
        # nested { SELECT ... } subqueries: balanced-brace scan first,
        # since the inner WHERE group would confuse the flat regexes
        while True:
            sm = re.search(r"\{\s*SELECT\b", body, re.I)
            if not sm:
                break
            end = _match_brace(body, sm.start())
            self.subqueries.append(body[sm.start() + 1: end - 1].strip())
            body = body[: sm.start()] + " " + body[end:]

        def _grab_graph(gm_):
            gtok = gm_.group(1)
            pats, filts = self._parse_group(gm_.group(2))
            if gtok.startswith("?"):
                self.graph_groups.append((None, gtok[1:], pats, filts))
            else:
                iri = _parse_term(gtok, self.prefixes)
                if iri.kind != "iri":
                    raise SparqlError(f"GRAPH needs an IRI or ?var: {gtok!r}")
                self.graph_groups.append((iri.value, None, pats, filts))
            return " "

        body = re.sub(
            r"GRAPH\s+(\?\w+|<[^>\s]+>|[A-Za-z_][\w.-]*:[\w.%-]*)"
            r"\s*\{([^{}]*)\}",
            _grab_graph, body, flags=re.I | re.S)

        def _values_terms(chunk):
            out = []
            for tok in _VALUES_TOKEN_RE.findall(chunk):
                if tok.upper() == "UNDEF":
                    out.append(None)
                else:
                    out.append(_parse_term(tok, self.prefixes).value)
            return out

        def _grab_values_multi(vm):
            vs = [v[1:] for v in re.findall(r"\?\w+", vm.group(1))]
            rows = [_values_terms(r) for r in re.findall(r"\(([^()]*)\)",
                                                         vm.group(2))]
            for r in rows:
                if len(r) != len(vs):
                    raise SparqlError("VALUES row arity mismatch")
            self.values.append((vs, rows))
            return " "

        def _grab_values_single(vm):
            var = vm.group(1)[1:]
            rows = [[t] for t in _values_terms(vm.group(2))]
            self.values.append(([var], rows))
            return " "

        body = re.sub(r"VALUES\s*\(((?:\s*\?\w+)+)\s*\)\s*\{([^{}]*)\}",
                      _grab_values_multi, body, flags=re.I | re.S)
        body = re.sub(r"VALUES\s+(\?\w+)\s*\{([^{}]*)\}",
                      _grab_values_single, body, flags=re.I | re.S)

        def _grab_union(um):
            branches = [self._parse_group(b)
                        for b in re.findall(r"\{([^{}]*)\}", um.group(0))]
            self.unions.append(branches)
            return " "

        body = re.sub(r"\{[^{}]*\}(?:\s*UNION\s*\{[^{}]*\})+",
                      _grab_union, body, flags=re.I | re.S)

        def _grab_minus(mm2):
            self.minuses.append(self._parse_group(mm2.group(1)))
            return " "

        body = re.sub(r"(?:MINUS|FILTER\s+NOT\s+EXISTS)\s*\{([^{}]*)\}",
                      _grab_minus, body, flags=re.I | re.S)

        def _grab_exists(em):
            self.exists.append(self._parse_group(em.group(1)))
            return " "

        body = re.sub(r"FILTER\s+EXISTS\s*\{([^{}]*)\}",
                      _grab_exists, body, flags=re.I | re.S)

        def _grab_optional(om2):
            self.optionals.append(self._parse_group(om2.group(1)))
            return " "

        body = re.sub(r"OPTIONAL\s*\{([^{}]*)\}", _grab_optional, body,
                      flags=re.I | re.S)
        # BIND(expr AS ?alias): balanced-paren scan (the expression may
        # itself contain calls); applied in textual order after the BGP
        while True:
            bm = re.search(r"\bBIND\s*\(", body, re.I)
            if not bm:
                break
            open_idx = body.index("(", bm.start())
            end = _match_paren(body, open_idx)
            inner = body[open_idx + 1: end - 1]
            am = re.search(r"\s+AS\s+\?(\w+)\s*$", inner, re.I)
            if not am:
                raise SparqlError(f"BIND needs AS ?var: {inner!r}")
            self.binds.append((am.group(1), inner[: am.start()].strip()))
            body = body[: bm.start()] + " " + body[end:]
        self.patterns, self.filters = self._parse_group(body)
        tail = m.group("tail") or ""
        om = re.search(r"ORDER\s+BY\s+(?P<keys>.+?)(?:LIMIT|$)", tail, re.I | re.S)
        if om:
            for km in re.finditer(r"(DESC|ASC)?\s*\(?\s*\?(\w+)\s*\)?", om.group("keys"), re.I):
                self.order_by.append((km.group(2),
                                      (km.group(1) or "").upper() == "DESC"))
        gm = re.search(r"GROUP\s+BY\s+(?P<keys>(?:\?\w+\s*)+)", tail, re.I)
        if gm:
            self.group_by = [v[1:] for v in re.findall(r"\?\w+", gm.group("keys"))]
        # HAVING(expr over aggregates): rewrite each aggregate call to an
        # internal ?_hav<i> aggregate computed alongside the projection
        hm = re.search(r"\bHAVING\s*\(", tail, re.I)
        if hm:
            open_idx = tail.index("(", hm.start())
            end = _match_paren(tail, open_idx)
            hx = tail[open_idx + 1: end - 1]
            hagg_re = re.compile(
                r"(?P<fn>COUNT|SUM|MIN|MAX|AVG)\s*\(\s*"
                r"(?P<dist>DISTINCT\s+)?(?P<arg>\?\w+|\*)\s*\)", re.I)

            def _grab_hagg(ham):
                alias = f"_hav{len(self.aggregates)}"
                self.aggregates.append((ham.group("fn").upper(),
                                        bool(ham.group("dist")),
                                        ham.group("arg"), alias))
                return f"?{alias}"

            self.having = hagg_re.sub(_grab_hagg, hx)
        if self.aggregates and not self.group_by and self.projection:
            raise SparqlError("non-aggregated projection needs GROUP BY")
        lm = re.search(r"LIMIT\s+(\d+)", tail, re.I)
        if lm:
            self.limit = int(lm.group(1))
        om2 = re.search(r"OFFSET\s+(\d+)", tail, re.I)
        if om2:
            self.offset = int(om2.group(1))
        if (not self.patterns and not self.unions and not self.values
                and not self.subqueries and not self.graph_groups):
            raise SparqlError("empty WHERE clause")


def _closure_edges(edges: DataFrame, max_iter: int = 12) -> DataFrame:
    """One-or-more transitive closure of an edge set (src, dst) — the
    checkpointed-frontier iteration (cf. operators/graph.bfs_hops).
    Intended for hierarchy predicates (taxonomies, containment) whose
    closure is depth-bounded; an all-pairs closure of a dense relation
    would explode at scale and is the user's responsibility, as in any
    SPARQL engine."""
    paths = edges.localCheckpoint()
    frontier = paths
    e2 = edges.withColumnRenamed("src", "_m").withColumnRenamed("dst", "dst2")
    for _ in range(max_iter - 1):
        nxt = (frontier.join(e2, frontier.dst == e2._m)
               .select("src", F.col("dst2").alias("dst"))
               .distinct()
               .join(paths, ["src", "dst"], "left_anti")
               .localCheckpoint())
        if nxt.isEmpty():
            break
        paths = paths.unionAll(nxt).localCheckpoint()
        frontier = nxt
    return (paths.withColumnRenamed("src", "subject")
            .withColumnRenamed("dst", "object"))


def _graph_nodes(triples: DataFrame) -> DataFrame:
    """All RDF terms occurring in the graph, as (src, dst) identity
    pairs — the zero-length-path solution set (SPARQL 1.1 §18.4:
    a zero-length path matches every graph term with itself)."""
    nodes = (triples.select(F.col("subject").alias("src"))
             .unionAll(triples.select(F.col("object").alias("src")))
             .distinct())
    return nodes.withColumn("dst", F.col("src"))


def _path_step_df(triples: DataFrame, p: _Term) -> DataFrame:
    """One property-path step -> (subject, object) pair frame.
    Alternation = predicate IN-list on the scan (pushed down);
    inverse = column swap; '+' = frontier-iterated closure;
    '*' / '?' = union with the zero-length identity set."""
    pred = F.col("predicate")
    base = triples.filter(pred == p.iris[0] if len(p.iris) == 1
                          else pred.isin(p.iris))
    s_col, o_col = ("object", "subject") if p.inv else ("subject", "object")
    edges = base.select(F.col(s_col).alias("src"),
                        F.col(o_col).alias("dst")).distinct()
    if p.mod == "+":
        return _closure_edges(edges)
    if p.mod == "*":
        closed = (_closure_edges(edges)
                  .select(F.col("subject").alias("src"),
                          F.col("object").alias("dst")))
        out = closed.unionAll(_graph_nodes(triples)).distinct()
    elif p.mod == "?":
        out = edges.unionAll(_graph_nodes(triples)).distinct()
    else:
        out = edges
    return (out.withColumnRenamed("src", "subject")
            .withColumnRenamed("dst", "object"))


def _pattern_df(triples: DataFrame, pat: Tuple[_Term, _Term, _Term],
                idx: int, gvar: Optional[str] = None
                ) -> Tuple[DataFrame, Dict[str, str]]:
    """One triple pattern -> filtered projection; returns (df, var->col).
    With ``gvar`` set, the pattern is a QUAD: the triple's `graph`
    column binds the GRAPH variable as well."""
    s, p, o = pat
    if p.kind == "path":
        if gvar is not None:
            raise SparqlError(
                "property paths inside GRAPH ?var are not supported")
        df = _path_step_df(triples, p)
        binds: Dict[str, str] = {}
        first_col: Dict[str, str] = {}
        cols = []
        for term, col in ((s, "subject"), (o, "object")):
            if term.kind == "var":
                if term.value in binds:
                    df = df.filter(F.col(col) == F.col(first_col[term.value]))
                else:
                    alias = f"_v{idx}_{term.value}"
                    binds[term.value] = alias
                    first_col[term.value] = col
                    cols.append(F.col(col).alias(alias))
            else:
                df = df.filter(F.col(col) == term.value)
        out = df.select(*cols) if cols else df.select(F.lit(1).alias(f"_m{idx}"))
        return out, binds
    df = triples
    binds: Dict[str, str] = {}
    first_col: Dict[str, str] = {}  # var -> source column of first use
    cols = []
    for term, col in ((s, "subject"), (p, "predicate"), (o, "object")):
        if term.kind == "var":
            if term.value in binds:  # repeated var within one pattern
                df = df.filter(F.col(col) == F.col(first_col[term.value]))
            else:
                alias = f"_v{idx}_{term.value}"
                binds[term.value] = alias
                first_col[term.value] = col
                cols.append(F.col(col).alias(alias))
        elif term.kind == "iri":
            df = df.filter(F.col(col) == term.value)
            if col == "object" and "object_is_literal" in triples.columns:
                df = df.filter(~F.col("object_is_literal"))
        else:  # literal
            df = df.filter(F.col(col) == term.value)
            if col == "object" and "object_is_literal" in triples.columns:
                df = df.filter(F.col("object_is_literal"))
    if gvar is not None:
        if gvar in binds:  # GRAPH ?g { ?g ... } — same var reused
            df = df.filter(F.col("graph") == F.col(first_col[gvar]))
        else:
            alias = f"_v{idx}_{gvar}"
            binds[gvar] = alias
            first_col[gvar] = "graph"
            cols.append(F.col("graph").alias(alias))
    out = df.select(*cols) if cols else df.select(F.lit(1).alias(f"_m{idx}"))
    n_const = 3 - len(binds)
    if n_const >= 2:
        # predicate+object (or subject+...) both fixed: a dimension-probe
        # sized result — broadcast so the big fact side never shuffles
        out = F.broadcast(out)
    return out, binds


def _filter_expr(expr: str, bound: Dict[str, str], prefixes: Dict[str, str]):
    m = _FILTER_RE.match(expr.strip())
    if not m:
        # not a simple comparison/REGEX: hand to the full expression
        # compiler (||/&&/!, arithmetic, string builtins, IF/COALESCE)
        return _compile_expr(expr, bound, prefixes)
    if m.group("rvar"):
        var = m.group("rvar")
        if var not in bound:
            return None
        return F.col(bound[var]).rlike(m.group("rpat"))
    lvar = m.group("lvar")
    if lvar not in bound:
        return None
    lhs = F.col(bound[lvar])
    rhs_txt = m.group("rhs").strip()
    if rhs_txt.startswith("?"):
        rv = rhs_txt[1:]
        if rv not in bound:
            return None
        rhs = F.col(bound[rv])
    else:
        try:
            t = _parse_term(rhs_txt, prefixes)
        except SparqlError:
            # rhs isn't a single term (e.g. `?a = e:x || ?a = e:y`):
            # the whole filter goes through the expression compiler
            return _compile_expr(expr, bound, prefixes)
        rhs = F.lit(t.value)
    op = m.group("op")
    return {"=": lhs == rhs, "!=": lhs != rhs, "<": lhs < rhs,
            ">": lhs > rhs, "<=": lhs <= rhs, ">=": lhs >= rhs}[op]


def _compile_bgp(triples: DataFrame, patterns, filters, prefixes,
                 idx_offset: int = 0, gvar: Optional[str] = None):
    """Compile a pattern group to (df, var->col). Greedy connected
    ordering: seed with the most-constrained pattern, then always
    extend with a pattern sharing a bound variable (most constants
    wins among candidates) — a cross join only happens when the group
    itself is disconnected."""
    def n_const(i: int) -> int:
        return sum(t.kind != "var" for t in patterns[i])

    def pat_vars(i: int) -> set:
        return {t.value for t in patterns[i] if t.kind == "var"}

    if not patterns:
        return None, {}, list(filters)
    remaining = sorted(range(len(patterns)), key=lambda i: (-n_const(i), i))
    order: List[int] = []
    seen_vars: set = set()
    while remaining:
        connected = [i for i in remaining if pat_vars(i) & seen_vars]
        nxt = connected[0] if connected else remaining[0]
        remaining.remove(nxt)
        order.append(nxt)
        seen_vars |= pat_vars(nxt)
    acc: Optional[DataFrame] = None
    bound: Dict[str, str] = {}
    pending = list(filters)
    for i in order:
        df, binds = _pattern_df(triples, patterns[i], idx_offset + i, gvar)
        if acc is None:
            acc = df
            bound.update(binds)
        else:
            shared = [(bound[v], binds[v]) for v in binds if v in bound]
            if shared:
                cond = None
                for a, b in shared:
                    c = F.col(a) == F.col(b)
                    cond = c if cond is None else (cond & c)
                acc = acc.join(df, cond)
                acc = acc.drop(*[b for _, b in shared])
                for v in binds:
                    if v not in bound:
                        bound[v] = binds[v]
            else:
                acc = acc.crossJoin(df)
                bound.update(binds)
        # apply any filter whose variables are now all bound
        still: List[str] = []
        for fx in pending:
            cond = _filter_expr(fx, bound, prefixes)
            if cond is None:
                still.append(fx)
            else:
                acc = acc.filter(cond)
        pending = still
    return acc, bound, pending


def _join_on_shared(acc, bound, df, dbinds, how="inner"):
    """Join df (with var->col map dbinds) into acc on shared vars;
    extends bound with df's new vars. Returns (acc, had_shared)."""
    shared = [(bound[v], dbinds[v]) for v in dbinds if v in bound]
    if shared:
        cond = None
        for a, b in shared:
            c = F.col(a) == F.col(b)
            cond = c if cond is None else (cond & c)
        acc = acc.join(df, cond, how).drop(*[b for _, b in shared])
    elif how == "inner":
        acc = acc.crossJoin(df)
    else:
        return acc, False
    for v in dbinds:
        if v not in bound:
            bound[v] = dbinds[v]
    return acc, True


def sparql_query(triples: DataFrame, query: str) -> DataFrame:
    """Run a SPARQL query against a triple DataFrame with columns
    (subject, predicate, object[, object_is_literal]).

    Returns a DataFrame with one column per projected variable;
    variables bound only inside an unmatched OPTIONAL (or an UNDEF /
    non-binding UNION branch) come back NULL."""
    q = SparqlQuery(query)
    acc, bound, pending = _compile_bgp(triples, q.patterns, q.filters,
                                       q.prefixes)
    off = len(q.patterns)
    uid = 0
    # GRAPH groups: quads against the `graph` column. Fixed-IRI groups
    # compile over the graph-filtered scan (partition pruning on a
    # graph-partitioned store); ?var groups bind the graph column per
    # pattern, so all patterns in the group share ONE graph.
    for giri, gname, pats, filts in q.graph_groups:
        if "graph" in triples.columns:
            quads = triples
        else:
            raise SparqlError("GRAPH requires a `graph` column on the "
                              "triple view")
        if giri is not None:
            gdf, gb, gpend = _compile_bgp(quads.filter(F.col("graph") == giri),
                                          pats, filts, q.prefixes,
                                          idx_offset=off)
        else:
            gdf, gb, gpend = _compile_bgp(quads, pats, filts, q.prefixes,
                                          idx_offset=off, gvar=gname)
        off += len(pats)
        if gpend:
            raise SparqlError(f"FILTER uses unbound variable: {gpend[0]!r}")
        if acc is None:
            acc = gdf
            bound.update(gb)
        else:
            acc, _ = _join_on_shared(acc, bound, gdf, gb)
    # UNION blocks: each branch compiles independently; branches align
    # on the union of their variables (missing -> NULL), then the block
    # joins the accumulated solution on shared vars
    for branches in q.unions:
        allvars = sorted({t.value for pats, _ in branches
                          for pat in pats for t in pat if t.kind == "var"})
        parts = []
        ubinds = {v: f"_u{uid}_{v}" for v in allvars}
        for pats, filts in branches:
            bdf, bb, bpend = _compile_bgp(triples, pats, filts, q.prefixes,
                                          idx_offset=off)
            off += len(pats)
            if bpend:
                raise SparqlError(
                    f"FILTER uses unbound variable: {bpend[0]!r}")
            parts.append(bdf.select(*[
                (F.col(bb[v]) if v in bb
                 else F.lit(None).cast("string")).alias(ubinds[v])
                for v in allvars]))
        udf = parts[0]
        for extra_part in parts[1:]:
            udf = udf.unionAll(extra_part)
        uid += 1
        if acc is None:
            acc = udf
            bound.update(ubinds)
        else:
            acc, _ = _join_on_shared(acc, bound, udf, ubinds)
    # VALUES blocks: inline bindings -> broadcast literal table.
    # UNDEF entries are NULL and must match ANY value of an
    # already-bound variable (SPARQL's unbound-joins-all), so the join
    # condition treats NULL on the VALUES side as a wildcard.
    for vs, rows in q.values:
        vbinds = {v: f"_val{uid}_{v}" for v in vs}
        uid += 1
        vdf = F.broadcast(triples.sparkSession.createDataFrame(
            [tuple(r) for r in rows],
            ", ".join(f"{vbinds[v]} string" for v in vs)))
        if acc is None:
            acc = vdf
            bound.update(vbinds)
            continue
        shared = [v for v in vs if v in bound]
        if shared:
            cond = None
            for v in shared:
                c = (F.col(vbinds[v]).isNull()
                     | (F.col(bound[v]) == F.col(vbinds[v])))
                cond = c if cond is None else (cond & c)
            acc = acc.join(vdf, cond).drop(*[vbinds[v] for v in shared])
        else:
            acc = acc.crossJoin(vdf)
        for v in vs:
            if v not in bound:
                bound[v] = vbinds[v]
    # nested { SELECT ... } subqueries: compiled recursively, result
    # columns are the subquery's projected variable names; joined into
    # the outer solution on shared variables (cross-join if disjoint)
    pfx_text = "".join(f"PREFIX {k}: <{v}>\n" for k, v in q.prefixes.items())
    for subtext in q.subqueries:
        sdf = sparql_query(triples, pfx_text + subtext)
        sbinds = {c: f"_sub{uid}_{c}" for c in sdf.columns}
        uid += 1
        sdf = sdf.select(*[F.col(c).alias(a) for c, a in sbinds.items()])
        if acc is None:
            acc = sdf
            bound.update(sbinds)
        else:
            acc, _ = _join_on_shared(acc, bound, sdf, sbinds)
    # positive FILTER EXISTS: left-semi join on shared variables —
    # keeps outer solutions with >=1 witness, never duplicates them
    for epats, efilters in q.exists:
        edf, ebound, epend = _compile_bgp(triples, epats, efilters,
                                          q.prefixes, idx_offset=off)
        off += len(epats)
        if epend:
            raise SparqlError(f"FILTER uses unbound variable: {epend[0]!r}")
        shared = [(bound[v], ebound[v]) for v in ebound if v in bound]
        if not shared:
            raise SparqlError(
                "FILTER EXISTS shares no variable with the required part")
        cond = None
        for a, b in shared:
            c = F.col(a) == F.col(b)
            cond = c if cond is None else (cond & c)
        acc = acc.join(edf.select(*[b for _, b in shared]).distinct(),
                       cond, "left_semi")
    # negation: anti-join on the shared variables — MINUS and
    # FILTER NOT EXISTS coincide on this shared-variable subset
    for mpats, mfilters in q.minuses:
        mdf, mbound, mpend = _compile_bgp(triples, mpats, mfilters,
                                          q.prefixes, idx_offset=off)
        off += len(mpats)
        if mpend:
            raise SparqlError(f"FILTER uses unbound variable: {mpend[0]!r}")
        shared = [(bound[v], mbound[v]) for v in mbound if v in bound]
        if not shared:
            raise SparqlError(
                "MINUS group shares no variable with the required part")
        cond = None
        for a, b in shared:
            c = F.col(a) == F.col(b)
            cond = c if cond is None else (cond & c)
        acc = acc.join(mdf.select(*[b for _, b in shared]).distinct(),
                       cond, "left_anti")
    for gpats, gfilters in q.optionals:
        gdf, gbound, gpend = _compile_bgp(triples, gpats, gfilters,
                                          q.prefixes, idx_offset=off)
        off += len(gpats)
        if gpend:
            raise SparqlError(f"FILTER uses unbound variable: {gpend[0]!r}")
        acc, ok = _join_on_shared(acc, bound, gdf, gbound, how="left")
        if not ok:
            raise SparqlError(
                "OPTIONAL group shares no variable with the required part")
    # BIND(expr AS ?v): computed columns, in textual order so later
    # binds/filters may reference earlier aliases
    for alias, expr_txt in q.binds:
        if alias in bound:
            raise SparqlError(f"BIND would rebind ?{alias}")
        col = _compile_expr(expr_txt, bound, q.prefixes)
        if col is None:
            raise SparqlError(f"BIND uses unbound variable: {expr_txt!r}")
        cname = f"_bind_{alias}"
        acc = acc.withColumn(cname, col)
        bound[alias] = cname
    # outer filters that waited for UNION/VALUES/BIND-bound variables
    for fx in pending:
        cond = _filter_expr(fx, bound, q.prefixes)
        if cond is None:
            raise SparqlError(f"FILTER uses unbound variable: {fx!r}")
        acc = acc.filter(cond)
    if q.aggregates:
        for v in q.group_by + [a[1:] for _, _, a, _ in q.aggregates
                               if a != "*"]:
            if v not in bound:
                raise SparqlError(f"aggregate/group variable never bound: ?{v}")
        extra = [v for v in q.projection if v not in q.group_by]
        if extra:
            raise SparqlError(
                f"projected ?{extra[0]} is neither grouped nor aggregated")
        # map-side partial aggregation is free here: groupBy compiles to
        # HashAggregate(partial) -> exchange on the group keys -> final
        agg_vars = sorted({a[1:] for _, _, a, _ in q.aggregates if a != "*"})
        named = acc.select(
            *[F.col(bound[v]).alias(v) for v in q.group_by],
            *[F.col(bound[v]).alias(f"_agg_{v}") for v in agg_vars])
        aggs = []
        for fn, dist, arg, alias in q.aggregates:
            if arg == "*":
                expr = F.count(F.lit(1))
            else:
                col = F.col(f"_agg_{arg[1:]}")
                if fn in ("SUM", "AVG"):
                    col = col.cast("double")  # SPARQL numeric literals
                if fn == "COUNT":
                    expr = (F.countDistinct(col) if dist else F.count(col))
                elif fn == "GROUP_CONCAT":
                    # SPARQL leaves concat order undefined; sort for a
                    # deterministic (oracle-comparable) result
                    vals = F.collect_set(col) if dist else F.collect_list(col)
                    expr = F.array_join(F.array_sort(vals),
                                        q.agg_sep.get(alias, " "))
                elif fn == "SAMPLE":
                    # any value satisfies SAMPLE; min is deterministic
                    expr = F.min(col)
                else:
                    expr = getattr(F, fn.lower())(col)
            aggs.append(expr.alias(alias))
        out = (named.groupBy(*q.group_by).agg(*aggs) if q.group_by
               else named.agg(*aggs))
        out = out.select(*q.group_by, *[a[3] for a in q.aggregates])
        if q.having is not None:
            hcond = _compile_expr(q.having, {c: c for c in out.columns},
                                  q.prefixes)
            if hcond is None:
                raise SparqlError(f"HAVING uses unbound: {q.having!r}")
            out = out.filter(hcond)
        internal = [a[3] for a in q.aggregates if a[3].startswith("_hav")]
        if internal:
            out = out.drop(*internal)
    else:
        # _pp<N> are internal sequence-expansion variables, never projected
        proj = q.projection or sorted(v for v in bound
                                      if not v.startswith("_pp"))
        missing = [v for v in proj if v not in bound]
        if missing:
            raise SparqlError(f"projected variable never bound: ?{missing[0]}")
        out = acc.select(*[F.col(bound[v]).alias(v) for v in proj])
        if q.distinct:
            out = out.distinct()
    if q.order_by:
        keys = [F.col(v).desc() if d else F.col(v).asc()
                for v, d in q.order_by if v in out.columns]
        out = out.orderBy(*keys)
    if q.offset is not None:
        out = out.offset(q.offset)
    if q.limit is not None:
        out = out.limit(q.limit)
    return out


def sparql_construct(triples: DataFrame, query: str) -> DataFrame:
    """CONSTRUCT { template } WHERE { ... }: run the WHERE clause, then
    instantiate each template triple per solution — one select per
    template triple, unioned and deduplicated (a CONSTRUCT result is a
    graph, i.e. a set). Returns (subject, predicate, object)."""
    m = re.search(r"CONSTRUCT\s*\{(?P<tmpl>[^{}]*)\}\s*(?P<rest>WHERE\s*\{.*)$",
                  query.strip(), re.I | re.S)
    if not m:
        raise SparqlError("expected CONSTRUCT { ... } WHERE { ... }")
    prefixes = "".join(f"PREFIX {k}: <{v}>\n" for k, v in
                       re.findall(r"PREFIX\s+(\w+):\s*<([^>]*)>", query, re.I))
    sol_q = prefixes + "SELECT * " + m.group("rest")
    sol = sparql_query(triples, sol_q)
    tmpl_query = SparqlQuery(prefixes + "SELECT * WHERE { "
                             + m.group("tmpl") + " }")
    parts = []
    for s, p_, o in tmpl_query.patterns:
        cols = []
        for term, name in ((s, "subject"), (p_, "predicate"), (o, "object")):
            if term.kind == "var":
                if term.value not in sol.columns:
                    raise SparqlError(
                        f"template variable ?{term.value} not bound in WHERE")
                cols.append(F.col(term.value).alias(name))
            else:
                cols.append(F.lit(term.value).alias(name))
        parts.append(sol.select(*cols))
    out = parts[0]
    for extra in parts[1:]:
        out = out.unionAll(extra)
    # template rows with an unbound (NULL) slot are dropped, per spec
    return (out.filter(F.col("subject").isNotNull()
                       & F.col("predicate").isNotNull()
                       & F.col("object").isNotNull())
            .distinct())


def sparql_ask(triples: DataFrame, query: str) -> bool:
    """ASK { ... } -> does at least one solution exist."""
    m = re.search(r"ASK\s*(?P<body>\{.*)$", query.strip(), re.I | re.S)
    if not m:
        raise SparqlError("expected ASK { ... }")
    prefixes = "".join(f"PREFIX {k}: <{v}>\n" for k, v in
                       re.findall(r"PREFIX\s+(\w+):\s*<([^>]*)>", query, re.I))
    sol = sparql_query(triples, prefixes + "SELECT * WHERE "
                       + m.group("body"))
    return bool(sol.limit(1).take(1))


def sparql_describe(triples: DataFrame, query: str) -> DataFrame:
    """DESCRIBE <iri>... | DESCRIBE ?v... WHERE { ... } — returns the
    sub-graph describing the named/matched resources. The description
    form is implementation-defined per SPARQL 1.1 §16.4; this engine
    emits the symmetric concise description: every triple whose
    subject is a described resource, plus every triple whose
    (non-literal) object is one. The KG has no blank nodes, so no
    blank-node closure is needed.

    The describe set is small by construction (explicit IRIs, or the
    distinct bindings of the projected variables), so both membership
    probes are broadcast semi-joins — the triple table never shuffles.
    """
    m = re.search(r"DESCRIBE\s+(?P<terms>.*?)\s*(?P<rest>WHERE\s*\{.*)?$",
                  query.strip(), re.I | re.S)
    if not m or not m.group("terms").strip():
        raise SparqlError("expected DESCRIBE <term>... [WHERE { ... }]")
    prefixes = dict(re.findall(r"PREFIX\s+(\w+):\s*<([^>]*)>", query, re.I))
    terms = [_parse_term(t, prefixes) for t in m.group("terms").split()]
    spark = triples.sparkSession
    var_terms = [t for t in terms if t.kind == "var"]
    iri_terms = [t for t in terms if t.kind != "var"]
    parts = []
    if var_terms:
        if not m.group("rest"):
            raise SparqlError("DESCRIBE with variables needs WHERE { }")
        pfx_text = "".join(f"PREFIX {k}: <{v}>\n"
                           for k, v in prefixes.items())
        proj = " ".join(f"?{t.value}" for t in var_terms)
        sol = sparql_query(triples, f"{pfx_text}SELECT DISTINCT {proj} "
                           + m.group("rest"))
        for t in var_terms:
            parts.append(sol.select(F.col(t.value).alias("r")))
    if iri_terms:
        parts.append(spark.createDataFrame(
            [(t.value,) for t in iri_terms], "r string"))
    res = parts[0]
    for extra in parts[1:]:
        res = res.unionAll(extra)
    res = res.distinct()
    by_subj = triples.join(F.broadcast(res),
                           triples["subject"] == res["r"], "leftsemi")
    obj_side = triples
    if "object_is_literal" in triples.columns:
        obj_side = triples.filter(~F.col("object_is_literal"))
    by_obj = obj_side.join(F.broadcast(res),
                           obj_side["object"] == res["r"], "leftsemi")
    return by_subj.unionAll(by_obj).distinct()


# ---------------------------------------------------------------------------
# Relational-view triple derivation (driver oracle surface)
# ---------------------------------------------------------------------------
# A deterministic triple view over the TPC-H-ish tables lets DuckDB
# compute the SAME BGP as explicit SQL joins — a semantic oracle (two
# independent engines, two independent formulations), unlike the
# frozen-checksum oracles the rule-NLP queries need.

_EX = "http://example.org/"

REL_TRIPLES_SQL = f"""
    SELECT 'cust:' || c_custkey AS subject,
           '{_EX}inNation' AS predicate,
           'nat:' || c_nationkey AS object, FALSE AS object_is_literal
    FROM customer
    UNION ALL
    SELECT 'nat:' || n_nationkey, '{_EX}inRegion', 'reg:' || n_regionkey, FALSE
    FROM nation
    UNION ALL
    SELECT 'nat:' || n_nationkey, '{_EX}name', n_name, TRUE FROM nation
    UNION ALL
    SELECT 'reg:' || r_regionkey, '{_EX}name', r_name, TRUE FROM region
    UNION ALL
    SELECT 'cust:' || c_custkey, '{_EX}segment', c_mktsegment, TRUE
    FROM customer
    UNION ALL
    SELECT 'cust:' || c_custkey, '{_EX}partOf', 'nat:' || c_nationkey, FALSE
    FROM customer
    UNION ALL
    SELECT 'nat:' || n_nationkey, '{_EX}partOf', 'reg:' || n_regionkey, FALSE
    FROM nation
"""


def rel_triples(spark, sf_dir: str) -> DataFrame:
    """Materialize the relational triple view in Spark (same derivation
    as REL_TRIPLES_SQL runs in DuckDB)."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    r = spark.read.parquet(f"{sf_dir}/region.parquet")
    ex = _EX
    t1 = c.select(F.concat(F.lit("cust:"), "c_custkey").alias("subject"),
                  F.lit(ex + "inNation").alias("predicate"),
                  F.concat(F.lit("nat:"), "c_nationkey").alias("object"),
                  F.lit(False).alias("object_is_literal"))
    t2 = n.select(F.concat(F.lit("nat:"), "n_nationkey").alias("subject"),
                  F.lit(ex + "inRegion").alias("predicate"),
                  F.concat(F.lit("reg:"), "n_regionkey").alias("object"),
                  F.lit(False).alias("object_is_literal"))
    t3 = n.select(F.concat(F.lit("nat:"), "n_nationkey").alias("subject"),
                  F.lit(ex + "name").alias("predicate"),
                  F.col("n_name").alias("object"),
                  F.lit(True).alias("object_is_literal"))
    t4 = r.select(F.concat(F.lit("reg:"), "r_regionkey").alias("subject"),
                  F.lit(ex + "name").alias("predicate"),
                  F.col("r_name").alias("object"),
                  F.lit(True).alias("object_is_literal"))
    t5 = c.select(F.concat(F.lit("cust:"), "c_custkey").alias("subject"),
                  F.lit(ex + "segment").alias("predicate"),
                  F.col("c_mktsegment").alias("object"),
                  F.lit(True).alias("object_is_literal"))
    t6 = c.select(F.concat(F.lit("cust:"), "c_custkey").alias("subject"),
                  F.lit(ex + "partOf").alias("predicate"),
                  F.concat(F.lit("nat:"), "c_nationkey").alias("object"),
                  F.lit(False).alias("object_is_literal"))
    t7 = n.select(F.concat(F.lit("nat:"), "n_nationkey").alias("subject"),
                  F.lit(ex + "partOf").alias("predicate"),
                  F.concat(F.lit("reg:"), "n_regionkey").alias("object"),
                  F.lit(False).alias("object_is_literal"))
    return (t1.unionAll(t2).unionAll(t3).unionAll(t4).unionAll(t5)
            .unionAll(t6).unionAll(t7))


# the driver BGP: customers in the AMERICA region with BUILDING
# segment, joined through nation, nation name projected — 4 patterns,
# 2 of them broadcast dimension probes, 1 literal FILTER
REL_BGP = """
PREFIX ex: <http://example.org/>
SELECT ?cust ?nname WHERE {
  ?cust ex:inNation ?nat .
  ?cust ex:segment "BUILDING" .
  ?nat ex:inRegion ?reg .
  ?reg ex:name "AMERICA" .
  ?nat ex:name ?nname .
  FILTER (?nname != "CANADA")
}
ORDER BY ?cust LIMIT 500
"""

SPARQL_REL_SQL = f"""
    WITH triples AS ({REL_TRIPLES_SQL}),
    p1 AS (SELECT subject AS cust, object AS nat FROM triples
           WHERE predicate = '{_EX}inNation'),
    p2 AS (SELECT subject AS cust FROM triples
           WHERE predicate = '{_EX}segment' AND object = 'BUILDING'
             AND object_is_literal),
    p3 AS (SELECT subject AS nat, object AS reg FROM triples
           WHERE predicate = '{_EX}inRegion'),
    p4 AS (SELECT subject AS reg FROM triples
           WHERE predicate = '{_EX}name' AND object = 'AMERICA'
             AND object_is_literal),
    p5 AS (SELECT subject AS nat, object AS nname FROM triples
           WHERE predicate = '{_EX}name' AND object_is_literal)
    SELECT p1.cust, p5.nname
    FROM p1 JOIN p2 USING (cust) JOIN p3 USING (nat)
            JOIN p4 USING (reg) JOIN p5 ON p5.nat = p1.nat
    WHERE p5.nname <> 'CANADA'
    ORDER BY p1.cust LIMIT 500
"""

# OPTIONAL driver query: Asian nations, each with its MACHINERY
# customers whose id ends in 7 — nations without one keep a NULL ?cust
# (the left-join semantics under test)
REL_BGP_OPTIONAL = """
PREFIX ex: <http://example.org/>
SELECT ?nat ?nname ?cust WHERE {
  ?nat ex:name ?nname .
  ?nat ex:inRegion ?reg .
  ?reg ex:name "ASIA" .
  OPTIONAL {
    ?cust ex:inNation ?nat .
    ?cust ex:segment "MACHINERY" .
    FILTER (regex(?cust, "7$"))
  }
}
ORDER BY ?nname ?cust
"""

SPARQL_OPTIONAL_SQL = f"""
    WITH triples AS ({REL_TRIPLES_SQL}),
    nm AS (SELECT subject AS nat, object AS nname FROM triples
           WHERE predicate = '{_EX}name' AND object_is_literal),
    nr AS (SELECT subject AS nat, object AS reg FROM triples
           WHERE predicate = '{_EX}inRegion'),
    rn AS (SELECT subject AS reg FROM triples
           WHERE predicate = '{_EX}name' AND object = 'ASIA'
             AND object_is_literal),
    base AS (
      SELECT nm.nat, nm.nname
      FROM nm JOIN nr USING (nat) JOIN rn USING (reg)
    ),
    opt AS (
      SELECT cn.subject AS cust, cn.object AS nat
      FROM triples cn
      JOIN triples cs ON cs.subject = cn.subject
                     AND cs.predicate = '{_EX}segment'
                     AND cs.object = 'MACHINERY' AND cs.object_is_literal
      WHERE cn.predicate = '{_EX}inNation'
        AND regexp_matches(cn.subject, '7$')
    )
    SELECT b.nat, b.nname, o.cust
    FROM base b LEFT JOIN opt o ON o.nat = b.nat
    ORDER BY b.nname, o.cust
"""

# Aggregate driver query: customer count + distinct segment count per
# AMERICA nation — GROUP BY compiles to partial-agg + one exchange
REL_BGP_AGG = """
PREFIX ex: <http://example.org/>
SELECT ?nname (COUNT(?cust) AS ?ncust) (COUNT(DISTINCT ?seg) AS ?nseg) WHERE {
  ?cust ex:inNation ?nat .
  ?cust ex:segment ?seg .
  ?nat ex:name ?nname .
  ?nat ex:inRegion ?reg .
  ?reg ex:name "AMERICA" .
}
GROUP BY ?nname
ORDER BY ?nname
"""

SPARQL_AGG_SQL = f"""
    WITH triples AS ({REL_TRIPLES_SQL}),
    cn AS (SELECT subject AS cust, object AS nat FROM triples
           WHERE predicate = '{_EX}inNation'),
    cs AS (SELECT subject AS cust, object AS seg FROM triples
           WHERE predicate = '{_EX}segment' AND object_is_literal),
    nm AS (SELECT subject AS nat, object AS nname FROM triples
           WHERE predicate = '{_EX}name' AND object_is_literal),
    nr AS (SELECT subject AS nat, object AS reg FROM triples
           WHERE predicate = '{_EX}inRegion'),
    rn AS (SELECT subject AS reg FROM triples
           WHERE predicate = '{_EX}name' AND object = 'AMERICA'
             AND object_is_literal)
    SELECT nm.nname, COUNT(cn.cust) AS ncust,
           COUNT(DISTINCT cs.seg) AS nseg
    FROM cn JOIN cs USING (cust) JOIN nm USING (nat)
            JOIN nr ON nr.nat = cn.nat JOIN rn USING (reg)
    GROUP BY nm.nname ORDER BY nm.nname
"""

# BIND/HAVING/OFFSET driver query: per-nation customer counts keyed by
# a computed (lower-cased, suffixed) name — exercises the expression
# compiler end-to-end: BIND chains, boolean-connective FILTER with
# string builtins, arithmetic comparison, HAVING over an aggregate not
# in the projection alias list, and OFFSET pagination
REL_BGP_BIND = """
PREFIX ex: <http://example.org/>
SELECT ?nkey (COUNT(?cust) AS ?ncust) WHERE {
  ?cust ex:inNation ?nat .
  ?nat ex:name ?nname .
  BIND(LCASE(?nname) AS ?lname)
  BIND(CONCAT(?lname, "!") AS ?nkey)
  FILTER(CONTAINS(?lname, "a") || STRSTARTS(?lname, "u"))
  FILTER(STRLEN(?lname) + 1 > 5)
}
GROUP BY ?nkey HAVING(COUNT(?cust) > 10)
ORDER BY ?nkey LIMIT 10 OFFSET 2
"""

SPARQL_BIND_SQL = f"""
    WITH triples AS ({REL_TRIPLES_SQL}),
    cn AS (SELECT subject AS cust, object AS nat FROM triples
           WHERE predicate = '{_EX}inNation'),
    nm AS (SELECT subject AS nat, object AS nname FROM triples
           WHERE predicate = '{_EX}name' AND object_is_literal),
    b AS (
      SELECT cn.cust, lower(nm.nname) AS lname,
             lower(nm.nname) || '!' AS nkey
      FROM cn JOIN nm USING (nat)
      WHERE (contains(lower(nm.nname), 'a')
             OR starts_with(lower(nm.nname), 'u'))
        AND length(lower(nm.nname)) + 1 > 5
    )
    SELECT nkey, COUNT(cust) AS ncust FROM b
    GROUP BY nkey HAVING COUNT(cust) > 10
    ORDER BY nkey LIMIT 10 OFFSET 2
"""


# EXISTS + GROUP_CONCAT driver query: regions with the sorted list of
# their nations that have at least one BUILDING customer — the semi-
# join must not duplicate a nation however many witnesses it has
REL_BGP_EXISTS_CONCAT = """
PREFIX ex: <http://example.org/>
SELECT ?rname (GROUP_CONCAT(?nname ; SEPARATOR=",") AS ?nations) WHERE {
  ?nat ex:inRegion ?reg .
  ?reg ex:name ?rname .
  ?nat ex:name ?nname .
  FILTER EXISTS { ?cust ex:inNation ?nat . ?cust ex:segment "BUILDING" . }
}
GROUP BY ?rname
ORDER BY ?rname
"""

SPARQL_EXISTS_CONCAT_SQL = f"""
    WITH triples AS ({REL_TRIPLES_SQL}),
    nr AS (SELECT subject AS nat, object AS reg FROM triples
           WHERE predicate = '{_EX}inRegion'),
    rn AS (SELECT subject AS reg, object AS rname FROM triples
           WHERE predicate = '{_EX}name' AND object_is_literal),
    nm AS (SELECT subject AS nat, object AS nname FROM triples
           WHERE predicate = '{_EX}name' AND object_is_literal),
    w AS (SELECT DISTINCT cn.object AS nat
          FROM triples cn
          JOIN triples cs ON cs.subject = cn.subject
                         AND cs.predicate = '{_EX}segment'
                         AND cs.object = 'BUILDING' AND cs.object_is_literal
          WHERE cn.predicate = '{_EX}inNation')
    SELECT rn.rname, string_agg(nm.nname, ',' ORDER BY nm.nname) AS nations
    FROM nr JOIN rn USING (reg) JOIN nm ON nm.nat = nr.nat
            JOIN w ON w.nat = nr.nat
    GROUP BY rn.rname ORDER BY rn.rname
"""

# Subquery driver query: inner SELECT aggregates customers per nation,
# outer decorates with the nation name — the classic aggregate-then-
# join shape SPARQL can only express with a nested SELECT
REL_BGP_SUBQUERY = """
PREFIX ex: <http://example.org/>
SELECT ?nname ?ncust WHERE {
  ?nat ex:name ?nname .
  { SELECT ?nat (COUNT(?cust) AS ?ncust) WHERE {
      ?cust ex:inNation ?nat . } GROUP BY ?nat }
}
ORDER BY ?nname
"""

SPARQL_SUBQUERY_SQL = f"""
    WITH triples AS ({REL_TRIPLES_SQL}),
    nm AS (SELECT subject AS nat, object AS nname FROM triples
           WHERE predicate = '{_EX}name' AND object_is_literal),
    sub AS (SELECT object AS nat, COUNT(subject) AS ncust FROM triples
            WHERE predicate = '{_EX}inNation' GROUP BY object)
    SELECT nm.nname, sub.ncust
    FROM nm JOIN sub USING (nat)
    ORDER BY nm.nname
"""


def query_snapshot(spark, out_root: str, query: str) -> DataFrame:
    """Run a SPARQL query against a materialized KG produced by
    pipeline.run_pipeline: loads the latest committed spo snapshot
    (subject-sorted parquet — subject-constant patterns benefit from
    min/max row-group pruning) and compiles the query against it."""
    from ..sources.tables import SnapshotTable

    spo = SnapshotTable(f"{out_root}/triples",
                        ["subject", "predicate", "object"], name="triples")
    triples = spo.read(spark)
    if triples is None:
        raise ValueError(f"no committed triples snapshot under {out_root}")
    return sparql_query(triples, query)

# UNION driver query: FURNITURE-segment subjects or NATION_1x-named
# subjects — branch-aligned union, then DISTINCT
REL_BGP_UNION = """
PREFIX ex: <http://example.org/>
SELECT DISTINCT ?x WHERE {
  { ?x ex:segment "FURNITURE" . }
  UNION
  { ?x ex:name ?n . FILTER (regex(?n, "^NATION_1")) }
}
ORDER BY ?x LIMIT 300
"""

SPARQL_UNION_SQL = f"""
    WITH triples AS ({REL_TRIPLES_SQL})
    SELECT DISTINCT x FROM (
      SELECT subject AS x FROM triples
      WHERE predicate = '{_EX}segment' AND object = 'FURNITURE'
        AND object_is_literal
      UNION ALL
      SELECT subject AS x FROM triples
      WHERE predicate = '{_EX}name' AND object_is_literal
        AND regexp_matches(object, '^NATION_1')
    ) ORDER BY x LIMIT 300
"""

# VALUES driver query: customers whose segment is in an inline list
REL_BGP_VALUES = """
PREFIX ex: <http://example.org/>
SELECT ?cust ?seg WHERE {
  ?cust ex:segment ?seg .
  VALUES ?seg { "BUILDING" "AUTOMOBILE" }
}
ORDER BY ?cust ?seg LIMIT 400
"""

SPARQL_VALUES_SQL = f"""
    WITH triples AS ({REL_TRIPLES_SQL})
    SELECT subject AS cust, object AS seg FROM triples
    WHERE predicate = '{_EX}segment' AND object_is_literal
      AND object IN ('BUILDING', 'AUTOMOBILE')
    ORDER BY cust, seg LIMIT 400
"""

# Property-path driver query: everything transitively part of region 1
# (nations directly, customers through their nation)
REL_BGP_PATH = """
PREFIX ex: <http://example.org/>
SELECT ?x WHERE {
  ?x ex:partOf+ <reg:1> .
}
ORDER BY ?x LIMIT 500
"""

SPARQL_PATH_SQL = f"""
    WITH RECURSIVE triples AS ({REL_TRIPLES_SQL}),
    edges AS (
      SELECT subject AS src, object AS dst FROM triples
      WHERE predicate = '{_EX}partOf'
    ),
    cl (src, dst) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT c.src, e.dst FROM cl c JOIN edges e ON e.src = c.dst
    )
    SELECT src AS x FROM cl WHERE dst = 'reg:1' ORDER BY x LIMIT 500
"""

# sequence path driver query: customer -> nation -> region in ONE
# pattern (ex:inNation/ex:inRegion expands through a fresh internal
# variable, i.e. an ordinary equi-join chain Catalyst plans as usual)
REL_BGP_PATH_SEQ = """
PREFIX ex: <http://example.org/>
SELECT ?cust ?rname WHERE {
  ?cust ex:inNation/ex:inRegion ?reg .
  ?reg ex:name ?rname .
  ?cust ex:segment "MACHINERY" .
}
ORDER BY ?cust ?rname LIMIT 400
"""

SPARQL_PATH_SEQ_SQL = f"""
    WITH triples AS ({REL_TRIPLES_SQL}),
    hop AS (
      SELECT cn.subject AS cust, nr.object AS reg
      FROM triples cn
      JOIN triples nr ON nr.subject = cn.object
                     AND nr.predicate = '{_EX}inRegion'
      WHERE cn.predicate = '{_EX}inNation'
    )
    SELECT h.cust AS cust, rn.object AS rname
    FROM hop h
    JOIN triples rn ON rn.subject = h.reg AND rn.predicate = '{_EX}name'
                   AND rn.object_is_literal
    JOIN triples sg ON sg.subject = h.cust AND sg.predicate = '{_EX}segment'
                   AND sg.object = 'MACHINERY' AND sg.object_is_literal
    ORDER BY cust, rname LIMIT 400
"""

# inverse + alternation driver query: ^(p1|p2) — the inverse step swaps
# the (subject, object) columns, the alternation is an IN-list predicate
# pushed to the scan
REL_BGP_PATH_OPS = """
PREFIX ex: <http://example.org/>
SELECT DISTINCT ?reg ?nat WHERE {
  ?reg ^(ex:inRegion|ex:partOf) ?nat .
  ?reg ex:name "ASIA" .
}
ORDER BY ?reg ?nat LIMIT 100
"""

SPARQL_PATH_OPS_SQL = f"""
    WITH triples AS ({REL_TRIPLES_SQL})
    SELECT DISTINCT e.object AS reg, e.subject AS nat
    FROM triples e
    JOIN triples nm ON nm.subject = e.object AND nm.predicate = '{_EX}name'
                   AND nm.object = 'ASIA' AND nm.object_is_literal
    WHERE e.predicate IN ('{_EX}inRegion', '{_EX}partOf')
    ORDER BY reg, nat LIMIT 100
"""

# zero-or-more driver query: bound subject, cust -> nation -> region
# ancestry including the zero-length self match (SPARQL 1.1 §18.4: a
# zero-length path matches every graph term with itself)
REL_BGP_PATH_STAR = """
PREFIX ex: <http://example.org/>
PREFIX cust: <cust:>
SELECT DISTINCT ?anc WHERE {
  cust:19 ex:partOf* ?anc .
}
ORDER BY ?anc LIMIT 100
"""

SPARQL_PATH_STAR_SQL = f"""
    WITH RECURSIVE triples AS ({REL_TRIPLES_SQL}),
    edges AS (
      SELECT subject AS src, object AS dst FROM triples
      WHERE predicate = '{_EX}partOf'
    ),
    cl (src, dst) AS (
      SELECT src, dst FROM edges WHERE src = 'cust:19'
      UNION
      SELECT c.src, e.dst FROM cl c JOIN edges e ON e.src = c.dst
    )
    SELECT DISTINCT anc FROM (
      SELECT dst AS anc FROM cl
      UNION ALL
      SELECT 'cust:19' AS anc WHERE 'cust:19' IN
        (SELECT subject FROM triples UNION SELECT object FROM triples)
    ) ORDER BY anc LIMIT 100
"""

# CONSTRUCT driver query: derive locatedIn triples + region typing from
# the two-hop chain — KG-to-KG transformation
REL_CONSTRUCT = """
PREFIX ex: <http://example.org/>
CONSTRUCT {
  ?cust ex:locatedIn ?reg .
  ?reg a ex:Region .
}
WHERE {
  ?cust ex:inNation ?nat .
  ?nat ex:inRegion ?reg .
}
"""

SPARQL_CONSTRUCT_SQL = f"""
    WITH triples AS ({REL_TRIPLES_SQL}),
    sol AS (
      SELECT cn.subject AS cust, nr.object AS reg
      FROM triples cn
      JOIN triples nr ON nr.subject = cn.object
                     AND nr.predicate = '{_EX}inRegion'
      WHERE cn.predicate = '{_EX}inNation'
    )
    SELECT DISTINCT * FROM (
      SELECT cust AS subject, '{_EX}locatedIn' AS predicate, reg AS object
      FROM sol
      UNION ALL
      SELECT reg, 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type',
             '{_EX}Region'
      FROM sol
    ) ORDER BY subject, predicate, object
"""

# Negation driver query: ASIA nations with NO MACHINERY customer whose
# id ends in 7 — MINUS compiles to a left-anti join (same inner pattern
# as the OPTIONAL query, which proves both outcomes occur in the data)
REL_BGP_MINUS = """
PREFIX ex: <http://example.org/>
SELECT ?nname WHERE {
  ?nat ex:name ?nname .
  ?nat ex:inRegion ?reg .
  ?reg ex:name "ASIA" .
  MINUS {
    ?cust ex:inNation ?nat .
    ?cust ex:segment "MACHINERY" .
    FILTER (regex(?cust, "7$"))
  }
}
ORDER BY ?nname
"""

SPARQL_MINUS_SQL = f"""
    WITH triples AS ({REL_TRIPLES_SQL}),
    nm AS (SELECT subject AS nat, object AS nname FROM triples
           WHERE predicate = '{_EX}name' AND object_is_literal),
    nr AS (SELECT subject AS nat, object AS reg FROM triples
           WHERE predicate = '{_EX}inRegion'),
    rn AS (SELECT subject AS reg FROM triples
           WHERE predicate = '{_EX}name' AND object = 'ASIA'
             AND object_is_literal),
    base AS (SELECT nm.nat, nm.nname
             FROM nm JOIN nr USING (nat) JOIN rn USING (reg)),
    furn AS (SELECT DISTINCT cn.object AS nat
             FROM triples cn
             JOIN triples cs ON cs.subject = cn.subject
                            AND cs.predicate = '{_EX}segment'
                            AND cs.object = 'MACHINERY'
                            AND cs.object_is_literal
             WHERE cn.predicate = '{_EX}inNation'
               AND regexp_matches(cn.subject, '7$'))
    SELECT nname FROM base
    WHERE NOT EXISTS (SELECT 1 FROM furn WHERE furn.nat = base.nat)
    ORDER BY nname
"""

# DESCRIBE driver query: the full symmetric description of every
# AMERICA nation — subject triples (name, inRegion, partOf) plus the
# triples pointing at them (each customer's inNation / partOf)
REL_DESCRIBE = """
PREFIX ex: <http://example.org/>
DESCRIBE ?nat WHERE {
  ?nat ex:inRegion ?reg .
  ?reg ex:name "AMERICA" .
}
"""

SPARQL_DESCRIBE_SQL = f"""
    WITH triples AS ({REL_TRIPLES_SQL}),
    rn AS (SELECT subject AS reg FROM triples
           WHERE predicate = '{_EX}name' AND object = 'AMERICA'
             AND object_is_literal),
    res AS (SELECT DISTINCT nr.subject AS r
            FROM triples nr JOIN rn ON rn.reg = nr.object
            WHERE nr.predicate = '{_EX}inRegion'),
    d AS (
      SELECT t.* FROM triples t JOIN res ON res.r = t.subject
      UNION
      SELECT t.* FROM triples t JOIN res ON res.r = t.object
      WHERE NOT t.object_is_literal
    )
    SELECT DISTINCT * FROM d
    ORDER BY subject, predicate, object, object_is_literal
"""


# ---------------------------------------------------------------------------
# Property-table materialization (triples -> wide entity table)
# ---------------------------------------------------------------------------

def entity_property_table(spark, sf_dir: str) -> DataFrame:
    """Materialize the classic RDF *property table* layout (Jena /
    Sempala / S2RDF): one wide row per subject, one column per chosen
    single-valued predicate — the layout that turns star-shaped SPARQL
    BGPs into a single scan instead of k self-joins.

    Scale shape: ONE map-side-combined groupBy(subject) with
    conditional-aggregation columns — no join at all; contrast with
    the k-way self-join the triple layout needs for the same star.
    Multi-valued predicates keep MAX semantics here (documented);
    production would emit list columns for those."""
    t = rel_triples(spark, sf_dir)
    cust = t.filter(F.col("subject").startswith("cust:"))

    def first_of(pred):
        return F.max(F.when(F.col("predicate") == _EX + pred,
                            F.col("object")))

    return (cust.groupBy("subject")
            .agg(first_of("inNation").alias("in_nation"),
                 first_of("segment").alias("segment"),
                 first_of("partOf").alias("part_of"))
            .orderBy("subject"))


def entity_property_table_sql() -> str:
    return f"""
WITH triples AS ({REL_TRIPLES_SQL})
SELECT subject,
       MAX(CASE WHEN predicate = '{_EX}inNation' THEN object END) AS in_nation,
       MAX(CASE WHEN predicate = '{_EX}segment'  THEN object END) AS segment,
       MAX(CASE WHEN predicate = '{_EX}partOf'   THEN object END) AS part_of
FROM triples WHERE subject LIKE 'cust:%'
GROUP BY subject ORDER BY subject
"""


# ---------------------------------------------------------------------------
# characteristic sets (Neumann & Moerkotte 2011) — SPARQL cardinality
# estimation statistics
# ---------------------------------------------------------------------------

def characteristic_sets(spark, sf_dir: str) -> DataFrame:
    """Group subjects by their exact SET of predicates and count each
    set's subjects and triples — the statistic a SPARQL optimizer uses
    to estimate star-join cardinalities without per-predicate
    independence assumptions (Neumann & Moerkotte, ICDE 2011).

    Scale shape: one groupBy(subject) with collect_set (map-side
    partial aggregation collapses duplicate predicates early), then a
    second groupBy on the sorted-set string — set-count-sized output.
    At 10^12 triples the subject agg is the big exchange; it is keyed
    by the same subject hash the spo layout already clusters by, so
    on the bucketed table it becomes a shuffle-free re-read."""
    t = rel_triples(spark, sf_dir)
    per_subj = (t.groupBy("subject")
                .agg(F.concat_ws(
                    ",", F.sort_array(F.collect_set("predicate")))
                    .alias("pred_set"),
                    F.count("*").alias("n_triples")))
    return (per_subj.groupBy("pred_set")
            .agg(F.count("*").cast("bigint").alias("n_subjects"),
                 F.sum("n_triples").cast("bigint").alias("n_triples"))
            .orderBy("pred_set"))


CHAR_SETS_SQL = f"""
WITH triples AS ({REL_TRIPLES_SQL}),
per_subj AS (
  SELECT subject,
         array_to_string(list_sort(list(DISTINCT predicate)), ',')
           AS pred_set,
         count(*) AS n_triples
  FROM triples GROUP BY subject
)
SELECT pred_set, CAST(count(*) AS BIGINT) AS n_subjects,
       CAST(sum(n_triples) AS BIGINT) AS n_triples
FROM per_subj GROUP BY pred_set ORDER BY pred_set
"""


# ---------------------------------------------------------------------------
# SHACL-lite shape validation (W3C SHACL core constraints as joins)
# ---------------------------------------------------------------------------

_SHACL_ALLOWED_SEGMENTS = ("AUTOMOBILE", "BUILDING", "FURNITURE",
                           "HOUSEHOLD")  # sh:in — MACHINERY deliberately
# excluded so the validator provably reports real violations


def shacl_report(spark, sf_dir: str) -> DataFrame:
    """Validate the relational triple view against a small SHACL-core
    shape set and emit the violation report — the data-QA pass a KG
    construction pipeline runs before committing a snapshot (W3C SHACL
    Recommendation: sh:minCount / sh:maxCount / sh:in / sh:nodeKind).

    Shapes (focus = subjects with prefix cust: / nat:):
      S1 cust minCount  — every cust: must have >= 1 ex:inNation
      S2 cust maxCount  — every cust: must have <= 1 ex:inNation
      S3 cust sh:in     — ex:segment value must be in the allowed set
                          (MACHINERY excluded on purpose: real rows)
      S4 nat  nodeKind  — ex:inRegion object must be an IRI, and every
                          nat: must have exactly one
      S5 nat  minCount  — every nat: must have >= 1 ex:name literal

    Each SHACL core constraint is ONE aggregation or anti-join over
    the triple table — validation is a handful of Catalyst plans, not
    a per-node interpreter, so the report costs a few predicate-pruned
    scans of the (already predicate-partitionable) triple table at any
    scale. Returns (shape_id, focus, n_violations) ordered; conforming
    shapes appear with n_violations = 0 via the shape spine, so the
    report schema is stable whatever the data.
    """
    t = rel_triples(spark, sf_dir)
    ex = _EX
    cust = (t.filter(F.col("subject").startswith("cust:"))
            .select("subject").distinct())
    nat = (t.filter(F.col("subject").startswith("nat:"))
           .select("subject").distinct())

    in_nation = t.filter(F.col("predicate") == ex + "inNation")
    cnt = in_nation.groupBy("subject").agg(F.count("*").alias("c"))
    s1 = cust.join(cnt, "subject", "left_anti")  # minCount 1
    s2 = cnt.filter(F.col("c") > 1).select("subject")  # maxCount 1
    s3 = (t.filter((F.col("predicate") == ex + "segment")
                   & ~F.col("object").isin(*_SHACL_ALLOWED_SEGMENTS))
          .select("subject"))
    in_region = t.filter(F.col("predicate") == ex + "inRegion")
    s4a = in_region.filter(F.col("object_is_literal")).select("subject")
    s4b = nat.join(in_region.select("subject").distinct(),
                   "subject", "left_anti")
    s5 = nat.join(
        t.filter((F.col("predicate") == ex + "name")
                 & F.col("object_is_literal")).select("subject").distinct(),
        "subject", "left_anti")

    spine = [("S1_cust_minCount_inNation", s1),
             ("S2_cust_maxCount_inNation", s2),
             ("S3_cust_in_segment", s3),
             ("S4_nat_nodeKind_inRegion", s4a.unionAll(s4b)),
             ("S5_nat_minCount_name", s5)]
    parts = [df.agg(F.count("*").cast("bigint").alias("n_violations"))
             .select(F.lit(sid).alias("shape_id"), "n_violations")
             for sid, df in spine]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.orderBy("shape_id")


SHACL_SQL = """
WITH triples AS ({rel}),
cust AS (SELECT DISTINCT subject FROM triples
         WHERE subject LIKE 'cust:%'),
nat AS (SELECT DISTINCT subject FROM triples
        WHERE subject LIKE 'nat:%'),
in_nation AS (SELECT subject, count(*) AS c FROM triples
              WHERE predicate = '{ex}inNation' GROUP BY subject),
in_region AS (SELECT subject, object, object_is_literal FROM triples
              WHERE predicate = '{ex}inRegion')
SELECT 'S1_cust_minCount_inNation' AS shape_id,
       CAST((SELECT count(*) FROM cust
             WHERE subject NOT IN (SELECT subject FROM in_nation))
            AS BIGINT) AS n_violations
UNION ALL
SELECT 'S2_cust_maxCount_inNation',
       CAST((SELECT count(*) FROM in_nation WHERE c > 1) AS BIGINT)
UNION ALL
SELECT 'S3_cust_in_segment',
       CAST((SELECT count(*) FROM triples
             WHERE predicate = '{ex}segment'
               AND object NOT IN {seg_list}) AS BIGINT)
UNION ALL
SELECT 'S4_nat_nodeKind_inRegion',
       CAST(((SELECT count(*) FROM in_region WHERE object_is_literal)
             + (SELECT count(*) FROM nat WHERE subject NOT IN
                (SELECT subject FROM in_region))) AS BIGINT)
UNION ALL
SELECT 'S5_nat_minCount_name',
       CAST((SELECT count(*) FROM nat WHERE subject NOT IN
             (SELECT subject FROM triples
              WHERE predicate = '{ex}name' AND object_is_literal))
            AS BIGINT)
ORDER BY shape_id
""".replace("{seg_list}",
            "(" + ", ".join(f"'{s}'" for s in _SHACL_ALLOWED_SEGMENTS)
            + ")")


def shacl_sql() -> str:
    return SHACL_SQL.format(rel=REL_TRIPLES_SQL, ex=_EX)


# ---------------------------------------------------------------------------
# sorted N-Triples serialization (the reference's RDF text output)
# ---------------------------------------------------------------------------
# Reference parity: the reference emits sorted RDF text via rdfpro's
# TQL writer (RDFGenerator.java:382 ".tql.gz" output, Main.java:39
# TQL registration; SURVEY §2 S4 sorted RDF writer);
# this operator is the Spark-side serializer: triple rows -> escaped
# N-Triples lines in bytewise sorted order, value-checked line-for-
# line in DuckDB.

_NT_BASE = "http://example.org/"


def _nt_escape(col):
    # N-Triples string escaping (W3C N-Triples §2.3): backslash first,
    # then quote, LF, CR, TAB — same replace() chain in both engines
    out = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    out = F.replace(out, F.lit('"'), F.lit('\\"'))
    out = F.replace(out, F.lit("\n"), F.lit("\\n"))
    out = F.replace(out, F.lit("\r"), F.lit("\\r"))
    out = F.replace(out, F.lit("\t"), F.lit("\\t"))
    return out


def nt_export(spark, sf_dir: str) -> DataFrame:
    """Serialize the relational triple view to N-Triples lines in
    bytewise sorted order — the text-RDF export stage. Pure Catalyst
    string assembly; the sort is the same total-order write the spo
    snapshot commits use (range partition + in-partition sort on a
    cluster; the engine never collects the lines).

    At 100 TB this is a map stage plus ONE range-partitioned sort; the
    output contract (sorted, escaped, newline-terminated lines) is
    what makes downstream text-diff / rdfpro-style processing and
    byte-level dedup possible."""
    t = rel_triples(spark, sf_dir)
    subj = F.concat(F.lit("<" + _NT_BASE), F.col("subject"), F.lit(">"))
    pred = F.concat(F.lit("<"), F.col("predicate"), F.lit(">"))
    obj = F.when(
        F.col("object_is_literal"),
        F.concat(F.lit('"'), _nt_escape(F.col("object")), F.lit('"')))\
        .otherwise(F.concat(F.lit("<" + _NT_BASE), F.col("object"),
                            F.lit(">")))
    line = F.concat_ws(" ", subj, pred, obj, F.lit("."))
    return (t.select(line.alias("nt_line"))
            .orderBy("nt_line"))


NT_EXPORT_SQL = f"""
WITH triples AS ({{rel}})
SELECT concat_ws(' ',
         '<{_NT_BASE}' || subject || '>',
         '<' || predicate || '>',
         CASE WHEN object_is_literal THEN
           '"' || replace(replace(replace(replace(replace(object,
             '\\', '\\\\'), '"', '\\"'), chr(10), '\\n'),
             chr(13), '\\r'), chr(9), '\\t') || '"'
         ELSE '<{_NT_BASE}' || object || '>' END,
         '.') AS nt_line
FROM triples ORDER BY nt_line
"""


def nt_export_sql() -> str:
    return NT_EXPORT_SQL.format(rel=REL_TRIPLES_SQL)


# ---------------------------------------------------------------------------
# named-graph (quad) view + GRAPH driver query
# ---------------------------------------------------------------------------

def rel_quads(spark, sf_dir: str) -> DataFrame:
    """The relational triple view as QUADS: graph = 'g:' + the
    subject's entity kind (the per-source-table named-graph layout a
    federated KG store uses; the distiller's own output carries real
    murmur3 fact graphs in the same column)."""
    t = rel_triples(spark, sf_dir)
    return t.withColumn(
        "graph", F.concat(F.lit("g:"), F.split(F.col("subject"), ":")[0]))


REL_QUADS_SQL = (
    "SELECT *, 'g:' || split_part(subject, ':', 1) AS graph FROM ("
    + REL_TRIPLES_SQL + ")")

# GRAPH driver query: both forms in one query — a variable graph group
# (nation partOf+name quads bind ?g) joined with a fixed-IRI graph
# group (customer segment quads read only the g:cust partition)
REL_BGP_GRAPH = """
PREFIX ex: <http://example.org/>
SELECT ?g ?c ?s ?nm ?seg WHERE {
  GRAPH ?g { ?s ex:partOf ?o . ?s ex:name ?nm }
  GRAPH <g:cust> { ?c ex:segment ?seg . ?c ex:partOf ?s }
}
ORDER BY ?c LIMIT 2000
"""

SPARQL_GRAPH_SQL = f"""
    WITH quads AS ({REL_QUADS_SQL}),
    pg AS (
      SELECT p1.graph AS g, p1.subject AS s, p2.object AS nm
      FROM quads p1
      JOIN quads p2 ON p2.subject = p1.subject AND p2.graph = p1.graph
       AND p2.predicate = '{_EX}name' AND p2.object_is_literal
      WHERE p1.predicate = '{_EX}partOf'
    ),
    pc AS (
      SELECT c1.subject AS c, c1.object AS seg, c2.object AS s
      FROM quads c1
      JOIN quads c2 ON c2.subject = c1.subject AND c2.graph = 'g:cust'
       AND c2.predicate = '{_EX}partOf'
      WHERE c1.predicate = '{_EX}segment' AND c1.graph = 'g:cust'
        AND c1.object_is_literal
    )
    SELECT pg.g, pc.c, pg.s, pg.nm, pc.seg
    FROM pg JOIN pc ON pc.s = pg.s
    ORDER BY pc.c LIMIT 2000
"""


def sparql_graph_rel(spark, sf_dir: str) -> DataFrame:
    out = sparql_query(rel_quads(spark, sf_dir), REL_BGP_GRAPH)
    return out.select(*[F.col(c) for c in ["g", "c", "s", "nm", "seg"]])
