"""Dependency-tree path-regex engine — the reference's hidden query operator.

Re-implements (from observed behavior, not code) the semantics of:

- path-string encoding         KAFDocument.java:1906-1925
- label -> char interning      KAFDocument.java:1886-1904
- pattern compilation          KAFDocument.java:1927-1965
- span head                    KAFDocument.java:2027-2044
- BFS descendants/ancestors    KAFDocument.java:2046-2112
- undirected tree path         KAFDocument.java:1973-2001 (getDepPath)

A dependency edge is (frm, to, rfunc): frm is the HEAD term index, to
the dependent. Paths between two terms are encoded as a string
``_±<c>_±<c>_...`` where ``+`` means the edge was traversed from head
to dependent and ``-`` the inverse, and ``<c>`` is a single character
interned per lowercase label. Multi-label edges ("NMOD-TMP") emit one
±c per '-'-separated component (KAFDocument.java:1918).

Patterns like ``(COORD CONJ?)*`` or the reference's
``MODIFIER_REGEX``/``PARTICIPATION_REGEX`` (RDFGenerator.java:106-110)
compile into ordinary regexes over that encoding: each label token
becomes ``([^_]*\\+c[^_]*_)`` (or ``-c`` when the token is prefixed
with '-'), other punctuation (``(|)*?``) passes through.

Pure Python, used inside Arrow UDFs; documents are small so per-doc
O(n^2) path extraction is fine (reference does the same).
"""

from __future__ import annotations

import re
from typing import Dict, Iterable, List, Optional, Sequence, Set, Tuple

Dep = Tuple[int, int, str]  # (head/frm, dependent/to, rfunc)

# process-global interning, mirrors KAFDocument.DEP_PATH_CHARS
_DEP_PATH_CHARS: Dict[str, str] = {}
_DEP_PATH_REGEXS: Dict[str, "re.Pattern[str]"] = {}


def _dep_path_char(label: str) -> str:
    key = label.lower()
    ch = _DEP_PATH_CHARS.get(key)
    if ch is None:
        # next unused char starting at 'a' (KAFDocument.java:1893-1899)
        ch = "a"
        for existing in _DEP_PATH_CHARS.values():
            if existing >= ch:
                ch = chr(ord(existing) + 1)
        _DEP_PATH_CHARS[key] = ch
    return ch


def dep_path_string(frm: int, path: Iterable[Dep]) -> str:
    """Encode a dep path starting at term ``frm`` (KAFDocument.java:1906-1925)."""
    out = ["_"]
    cur = frm
    for head, dep, rfunc in path:
        if head == cur:
            prefix, cur = "+", dep
        else:
            prefix, cur = "-", head
        for label in rfunc.split("-"):
            out.append(prefix)
            out.append(_dep_path_char(label))
        out.append("_")
    return "".join(out)


def compile_dep_pattern(pattern: str) -> "re.Pattern[str]":
    """Compile a label-level pattern into the char-level regex
    (KAFDocument.java:1927-1965)."""
    regex = _DEP_PATH_REGEXS.get(pattern)
    if regex is not None:
        return regex
    builder = ["_"]
    start = -1
    padded = pattern + " "
    for i, ch in enumerate(padded):
        if ch.isalpha() or ch == "-":
            if start < 0:
                start = i
        else:
            if start >= 0:
                inverse = padded[start] == "-"
                label = padded[start + 1 if inverse else start : i]
                letter = _dep_path_char(label)
                builder.append(
                    "([^_]*" + re.escape(("-" if inverse else "+") + letter) + "[^_]*_)"
                )
                start = -1
            if not ch.isspace():
                builder.append(ch)
    regex = re.compile("".join(builder))
    _DEP_PATH_REGEXS[pattern] = regex
    return regex


def match_dep_path(frm: int, path: Iterable[Dep], pattern: str) -> bool:
    """matchDepPath (KAFDocument.java:1967-1971): fullmatch semantics."""
    return compile_dep_pattern(pattern).fullmatch(dep_path_string(frm, path)) is not None


class DepGraph:
    """Per-document dependency forest with the reference's query ops.

    ``deps``: (head, dependent, rfunc) triples; at most one incoming
    edge per dependent (tree per sentence, forest per document).
    """

    def __init__(self, deps: Sequence[Dep]):
        self.parent: Dict[int, Tuple[int, str]] = {}
        self.children: Dict[int, List[Tuple[int, str]]] = {}
        for frm, to, rfunc in deps:
            self.parent[to] = (frm, rfunc)
            self.children.setdefault(frm, []).append((to, rfunc))
        # the tree is immutable after construction; root paths are hot
        # (every descendants_matching call walks them) and cacheable
        self._root_paths: Dict[int, List[int]] = {}

    # --- getDepToTerm ---------------------------------------------------
    def dep_to(self, term: int) -> Optional[Tuple[int, str]]:
        return self.parent.get(term)

    # --- getTermsByDepAncestors (KAFDocument.java:2046-2063) -------------
    def descendants(self, roots: Iterable[int]) -> Set[int]:
        seen: Set[int] = set(roots)
        queue = list(seen)
        while queue:
            t = queue.pop()
            for child, _ in self.children.get(t, ()):
                if child not in seen:
                    seen.add(child)
                    queue.append(child)
        return seen

    # --- getTermsByDepDescendants (KAFDocument.java:2080-2097) -----------
    def ancestors(self, terms: Iterable[int]) -> Set[int]:
        seen: Set[int] = set(terms)
        queue = list(seen)
        while queue:
            t = queue.pop()
            p = self.parent.get(t)
            if p is not None and p[0] not in seen:
                seen.add(p[0])
                queue.append(p[0])
        return seen

    def _root_path(self, term: int) -> List[int]:
        cached = self._root_paths.get(term)
        if cached is not None:
            return cached
        path = [term]
        seen = {term}
        while True:
            p = self.parent.get(path[-1])
            if p is None or p[0] in seen:
                self._root_paths[term] = path
                return path
            path.append(p[0])
            seen.add(p[0])

    # --- getDepPath (KAFDocument.java:1973-2001) -------------------------
    def path(self, frm: int, to: int) -> Optional[List[Dep]]:
        """Undirected tree path frm -> to as a list of dep edges, ordered
        so that walking with cur=frm reproduces the reference's
        traversal (up to the LCA, then down)."""
        if frm == to:
            return []
        up_a = self._root_path(frm)
        up_b = self._root_path(to)
        pos_b = {t: i for i, t in enumerate(up_b)}
        lca = None
        for i, t in enumerate(up_a):
            if t in pos_b:
                lca = t
                cut_a, cut_b = i, pos_b[t]
                break
        if lca is None:
            return None  # different trees
        edges: List[Dep] = []
        for t in up_a[:cut_a]:
            head, rfunc = self.parent[t]
            edges.append((head, t, rfunc))
        for t in reversed(up_b[:cut_b]):
            head, rfunc = self.parent[t]
            edges.append((head, t, rfunc))
        return edges

    # --- getTermsByDepAncestors w/ pattern (KAFDocument.java:2066-2078) --
    def descendants_matching(self, roots: Iterable[int], pattern: str) -> Set[int]:
        """Equivalent to matching path(root, desc) for every descendant,
        but as ONE DFS per root that extends the encoded path string
        edge by edge — the per-pair path()/_root_path() walk made this
        the top per-document profile entry (paths under a root share
        their prefixes; recomputing them per descendant is O(n*depth))."""
        regex = compile_dep_pattern(pattern)
        result: Set[int] = set()
        for root in roots:
            stack = [(root, "_")]
            seen = {root}
            while stack:
                t, enc = stack.pop()
                # includes the root itself (path "_"), matching the
                # reference's getTermsByDepAncestors semantics
                if regex.fullmatch(enc):
                    result.add(t)
                for child, rfunc in self.children.get(t, ()):
                    if child in seen:
                        continue
                    seen.add(child)
                    parts = [enc]
                    for label in rfunc.split("-"):
                        parts.append("+")
                        parts.append(_dep_path_char(label))
                    parts.append("_")
                    stack.append((child, "".join(parts)))
        return result

    # --- getTermsHead (KAFDocument.java:2027-2044) ------------------------
    def head_of_span(self, span: Iterable[int]) -> Optional[int]:
        term_set = set(span)
        root: Optional[int] = None
        for t in term_set:
            p = self.parent.get(t)
            if p is None or p[0] not in term_set:
                if root is None:
                    root = t
                elif root != t:
                    return None  # multiple roots -> no unique head
        return root
