"""Minimal Turtle/TriG parser for the reference's eval graphs.

Covers exactly the subset used by src/site/resources/eval-pm/*.ttl and
pikes.patch.trig: @prefix, <IRI>, prefixed names (incl. %-escapes and
interior dots), `a`, `;` / `,` continuation, plain / triple-quoted /
typed (^^) literals, bare booleans and numbers, and TriG
`graph { ... }` blocks. No blank nodes or collections (verified absent
in the data).

Terms are represented as:
  IRI      -> plain str
  literal  -> ("lit", lexical_form)    (datatype/lang dropped: nothing
              in the eval semantics compares literals by type)
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

Term = object  # str (IRI) | tuple ("lit", str)
Quad = Tuple[str, str, object, Optional[str]]

# The gold files abbreviate the eval namespaces as eval:schema#,
# eval:propbank# etc. while the Java code (Util.NAMESPACES) uses
# http://pikes.fbk.eu/ontologies/... — normalize to the code's form.
NS_ALIASES = {
    "eval:schema#": "http://pikes.fbk.eu/ontologies/eval#",
    "eval:propbank#": "http://pikes.fbk.eu/ontologies/propbank#",
    "eval:nombank#": "http://pikes.fbk.eu/ontologies/nombank#",
    "eval:verbnet#": "http://pikes.fbk.eu/ontologies/verbnet#",
    "eval:framenet#": "http://pikes.fbk.eu/ontologies/framenet#",
}


def _norm_iri(iri: str) -> str:
    for alias, target in NS_ALIASES.items():
        if iri.startswith(alias):
            return target + iri[len(alias):]
    return iri


_TOKEN_RE = re.compile(r"""
      (?P<LONGLIT>\"\"\"(?:[^"\\]|\\.|"(?!""))*\"\"\")
    | (?P<LIT>"(?:[^"\\\n]|\\.)*")
    | (?P<IRI><[^<>\s]*>)
    | (?P<PUNCT>\^\^|[;,.{}])
    | (?P<PNAME>[A-Za-z_][\w\-]*)?:(?P<LOCAL>(?:[\w\-%=.:]*[\w\-%=])?)
    | (?P<KW>\ba\b|true|false|@prefix|@base)
    | (?P<NUM>[+-]?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
    | (?P<LANG>@[A-Za-z][A-Za-z0-9\-]*)
""", re.X)


def _tokenize(text: str) -> List[Tuple[str, str]]:
    # strip comments (a '#' outside of quotes and IRIs starts a comment)
    out: List[Tuple[str, str]] = []
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch in " \t\r\n":
            i += 1
            continue
        if ch == "#":
            j = text.find("\n", i)
            i = n if j < 0 else j + 1
            continue
        m = _TOKEN_RE.match(text, i)
        if not m:
            raise ValueError(f"ttl tokenize error at {i}: {text[i:i+40]!r}")
        i = m.end()
        kind = m.lastgroup
        if kind == "LOCAL":  # prefixed name matched (PNAME group may be None)
            out.append(("PNAME", m.group(0)))
        else:
            out.append((kind, m.group(0)))
    return out


def _unescape(s: str) -> str:
    return (s.replace("\\\\", "\x00").replace('\\"', '"')
            .replace("\\n", "\n").replace("\\t", "\t").replace("\x00", "\\"))


class _Parser:

    # the data files reference a few well-known prefixes without
    # declaring them (e.g. rdfs: in pikes.patch.trig) — pre-seed them
    WELL_KNOWN = {
        "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
        "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
        "owl": "http://www.w3.org/2002/07/owl#",
        "xs": "http://www.w3.org/2001/XMLSchema#",
        "xsd": "http://www.w3.org/2001/XMLSchema#",
    }

    def __init__(self, text: str):
        self.toks = _tokenize(text)
        self.pos = 0
        self.prefixes: Dict[str, str] = dict(self.WELL_KNOWN)
        self.quads: List[Quad] = []
        # statements rebuilt by the syntax-error recovery rules, for audit
        self.recovered: List[Tuple] = []

    def _peek(self):
        return self.toks[self.pos] if self.pos < len(self.toks) else (None, None)

    def _next(self):
        tok = self._peek()
        self.pos += 1
        return tok

    def _expect(self, value: str) -> None:
        kind, tok = self._next()
        if tok != value:
            raise ValueError(f"expected {value!r}, got {tok!r} at token {self.pos}")

    def parse(self) -> List[Quad]:
        last_subject = None
        while self.pos < len(self.toks):
            kind, tok = self._peek()
            if tok == "@prefix":
                self._next()
                _, pname = self._next()
                if not pname.endswith(":"):
                    pname += ":"  # PNAME token includes the colon already
                _, iri = self._next()
                self.prefixes[pname.rstrip(":").split(":")[0]] = _norm_iri(iri[1:-1])
                self._expect(".")
                continue
            # subject (or TriG graph name followed by '{')
            term = self._term()
            kind2, tok2 = self._peek()
            if tok2 == "{":
                self._next()
                self._statements(graph=term)
                self._expect("}")
            else:
                # RECOVERY (shipped gold files contain literal syntax
                # errors): a top-level statement of the form
                # `pb:xyz :obj .` (subject in a frame namespace, then a
                # terminator instead of an object) is a `;` typoed as
                # `.` — the role belongs to the PREVIOUS subject.
                nxt_kind, nxt_tok = self._peek()
                save = self.pos
                obj_is_terminator = False
                try:
                    probe = self._term()
                    k3, t3 = self._peek()
                    obj_is_terminator = t3 in (".", ";", ",")
                except ValueError:
                    probe = None
                self.pos = save
                if (last_subject is not None and probe is not None
                        and obj_is_terminator and isinstance(term, str)
                        and "/ontologies/" in term):
                    # malformed statement: record for audit but DROP —
                    # the reference's published eval numbers (the
                    # separate.*.html reports) demonstrably exclude
                    # these statements, so parity requires dropping
                    pred, obj = term, self._term()
                    self.recovered.append((last_subject, pred, obj))
                    k3, t3 = self._peek()
                    if t3 in (";", ","):
                        self._next()
                        self._po_list(subject=last_subject, graph=None)
                    self._expect(".")
                else:
                    self._po_list(subject=term, graph=None)
                    self._expect(".")
                    last_subject = term
        return self.quads

    def _statements(self, graph: str) -> None:
        while True:
            kind, tok = self._peek()
            if tok == "}" or kind is None:
                return
            subj = self._term()
            self._po_list(subject=subj, graph=graph)
            kind, tok = self._peek()
            if tok == ".":
                self._next()

    def _po_list(self, subject, graph) -> None:
        while True:
            pred = self._term()
            if pred == "a":
                pred = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
            # RECOVERY: `... a X ; Y .` (a `,` typoed as `;` in a type
            # list) — the lone term Y before a terminator would be one
            # more rdf:type object; dropped for parity with the
            # published eval (see above), recorded for audit.
            k, t = self._peek()
            if t in (".", ";", ",", "}"):
                self.recovered.append((subject, "rdf:type", pred))
                if t in (";", ","):
                    self._next()
                    k2, t2 = self._peek()
                    if t2 in (".", "}", None):
                        return
                    continue
                return
            while True:
                obj = self._term()
                self.quads.append((subject, pred, obj, graph))
                kind, tok = self._peek()
                if tok == ",":
                    self._next()
                    continue
                break
            kind, tok = self._peek()
            if tok == ";":
                self._next()
                # allow trailing ';' before '.'
                kind, tok = self._peek()
                if tok in (".", "}", None):
                    return
                continue
            return

    def _term(self):
        kind, tok = self._next()
        if kind == "IRI":
            return _norm_iri(tok[1:-1])
        if kind == "PNAME":
            prefix, _, local = tok.partition(":")
            ns = self.prefixes.get(prefix)
            if ns is None:
                raise ValueError(f"unknown prefix {prefix!r} in {tok!r}")
            return _norm_iri(ns + local)
        if kind in ("LIT", "LONGLIT"):
            body = tok[3:-3] if kind == "LONGLIT" else tok[1:-1]
            # optional ^^datatype or @lang suffix
            k2, t2 = self._peek()
            if t2 == "^^":
                self._next()
                self._term()  # datatype IRI, dropped
            elif k2 == "LANG":
                self._next()
            return ("lit", _unescape(body))
        if kind == "KW":
            if tok == "a":
                return "a"
            if tok in ("true", "false"):
                return ("lit", tok)
        if kind == "NUM":
            return ("lit", tok)
        raise ValueError(f"unexpected term token {tok!r} ({kind})")


def parse_ttl(text: str) -> List[Quad]:
    return _Parser(text).parse()


def parse_ttl_file(path: str) -> List[Quad]:
    with open(path, encoding="utf-8") as f:
        return parse_ttl(f.read())
