"""Converter semantics (eval/Converter.java) — raw graphs -> eval schema.

A converted graph per (sentence, system) holds:
  nodes      : set of node IRIs (`a eval:Node` in the Java output)
  node_terms : node IRI -> set of term names (eval:denotedBy targets)
  triples    : set of (s, p, o) with node subjects, after URI rewriting
               (o is an IRI str or ("lit", str))

Node splitting: a node denoted by k>1 distinct terms becomes k nodes
`<node>_<term>`, pairwise owl:sameAs (Converter.java:272-283,410-433);
statements touching a split node are only kept if whitelisted by a
metadata "splitting statement" (Converter.java:254-259,322-338) —
otherwise this module raises, exactly like the Java.
"""

from __future__ import annotations

import re
from typing import Dict, Iterable, List, Optional, Set, Tuple

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"
OWL_SAMEAS = "http://www.w3.org/2002/07/owl#sameAs"

EVAL_NS = "http://pikes.fbk.eu/ontologies/eval#"
PB_NS = "http://pikes.fbk.eu/ontologies/propbank#"
NB_NS = "http://pikes.fbk.eu/ontologies/nombank#"
VN_NS = "http://pikes.fbk.eu/ontologies/verbnet#"
FN_NS = "http://pikes.fbk.eu/ontologies/framenet#"
DUL_ASSOCIATED_WITH = ("http://www.ontologydesignpatterns.org/ont/dul/"
                       "DUL.owl#associatedWith")

GAF_DENOTED_BY = "http://groundedannotationframework.org/gaf#denotedBy"
NIF_NS = "http://persistence.uni-leipzig.org/nlp2rdf/ontologies/nif-core#"
KS_NS = "http://dkm.fbk.eu/ontologies/knowledgestore#"
NWR = "http://www.newsreader-project.eu/ontologies/"
PREMON_NS = "http://premon.fbk.eu/resource/"
FRB_NS = "http://framebase.org/ns/"

# Converter.java:49-50
AM_ROLES = {"dir", "loc", "mnr", "ext", "rec", "prd", "pnc", "cau",
            "dis", "adv", "mod", "neg"}

# Converter.java:189-196 (statement predicates / type objects dropped)
IGNORABLE_TERMS = {
    NWR + "propbank/adv", NWR + "nombank/adv", GAF_DENOTED_BY,
    "http://www.ontologydesignpatterns.org/ont/fred/pos.owl#boxerpos",
    "http://ontologydesignpatterns.org/cp/owl/semiotics.owl#denotes",
    "http://ontologydesignpatterns.org/cp/owl/semiotics.owl#hasInterpretant",
    NIF_NS + "OffsetBasedString", NIF_NS + "beginIndex",
    NIF_NS + "endIndex", NIF_NS + "referenceContext",
}


class Sentence:
    """Term model (Converter.java Sentence:530-630): maximal runs of
    letters/'-'/'_' are terms; repeated words get _1.._k suffixes."""

    def __init__(self, text: str):
        self.text = text
        terms: List[str] = []
        begins: List[int] = []
        ends: List[int] = []
        start = None
        for i, ch in enumerate(text + " "):
            letter = ch.isalpha() or ch in "-_"
            if letter and start is None:
                start = i
            elif not letter and start is not None:
                terms.append(text[start:i])
                begins.append(start)
                ends.append(i)
                start = None
        ambiguous = {t for t in terms if terms.count(t) > 1}
        for t in ambiguous:
            idx = 0
            for i, term in enumerate(terms):
                if term == t:
                    idx += 1
                    terms[i] = f"{t}_{idx}"
        self.terms = terms
        self.begins = begins
        self.ends = ends
        self.term_set = set(terms)

    def term_for_name(self, local_name: str) -> str:
        """getTerm(String) — case-insensitive prefix match, stripping
        trailing _X parts (Converter.java:593-608)."""
        index = len(local_name)
        while True:
            candidate = local_name[:index]
            for term in self.terms:
                if candidate.lower() == term.lower():
                    return term
            index = local_name.rfind("_", 0, index)
            if index < 0:
                raise ValueError(
                    f"cannot map {local_name!r} to a term; terms={self.terms}")

    def term_for_span(self, begin: int, end: int,
                      multi: str = "error") -> str:
        """getTerm(begin, end) — unique overlapping term
        (Converter.java:610-628). The Java throws on 0 or 2+ matches;
        the reference data supplies eval:head for multi-term mentions.
        ``multi='last'`` falls back to the LAST overlapped term, which
        reproduces every eval:head in pikes.patch.trig (all of them
        pick the final word of the mention)."""
        matches = [self.terms[i] for i in range(len(self.terms))
                   if begin < self.ends[i] and end > self.begins[i]]
        if not matches:
            raise ValueError(f"no term matching {begin},{end} in {self.text!r}")
        if len(matches) > 1:
            if multi == "last":
                return matches[-1]
            raise ValueError(
                f"multiple terms matching {begin},{end}: {matches}")
        return matches[0]


class ConvertedGraph:

    def __init__(self, sentence_iri: str, system: str, sentence: Sentence):
        self.sentence_iri = sentence_iri
        self.system = system
        self.sentence = sentence
        self.nodes: Set[str] = set()
        self.node_terms: Dict[str, Set[str]] = {}
        self.triples: Set[Tuple] = set()

    def term_iri(self, term: str) -> str:
        return self.sentence_iri + "term_" + term


def _rewrite_pikes_iri(iri: str) -> str:
    """PIKES_CONVERTER uriRewriter (Converter.java:155-187), extended to
    also cover the PreMOn IRIs emitted by this repo's F20 stage
    (NAFFilter.java:1644-1720): premon pb17-/nb10-/vb32-/fn15- class and
    role IRIs reduce to the same eval names as the 2015 newsreader ones."""
    ns, name = _split(iri)
    if ns == FRB_NS:
        # FrameBase names are case-normalized for comparison: the
        # shipped pikes-both graphs carry lowercase fe- properties
        # (fe-becoming-entity) where gold has canonical case
        # (fe-Becoming-Entity); the published scores treat them equal
        return FRB_NS + name.lower()
    if ns == PREMON_NS:
        m = re.fullmatch(r"(pb17|nb10|vb32|fn15)-(.*)", name)
        if not m:
            return iri
        kind, rest = m.group(1), m.group(2)
        cls, sep, role = rest.partition("@")
        if kind in ("pb17", "nb10"):
            target_ns = PB_NS if kind == "pb17" else NB_NS
            if sep:  # role IRI: ...@arg0 / ...@argmnr
                r = role[3:] if role.startswith("arg") else role
                if r.isdigit():
                    return target_ns + "a" + r
                return target_ns + ("am-" + r if r in AM_ROLES else r)
            return target_ns + cls
        if kind == "vb32":
            if sep:
                return VN_NS + role
            i = cls.find("-")
            return VN_NS + (cls[i + 1:] if i > 0 else cls)
        # fn15
        return FN_NS + (role if sep else cls)
    if ns == NWR + "propbank/" or ns == NWR + "nombank/":
        target_ns = PB_NS if "propbank" in ns else NB_NS
        low = name.lower()
        if low in AM_ROLES:
            return target_ns + "am-" + low
        if re.search(r"_[0-5]$", name):
            return target_ns + "a" + name[-1]
        return target_ns + name
    if ns == NWR + "verbnet/":
        i = name.find("-")
        return VN_NS + (name[i + 1:] if i > 0 else name)
    if ns == NWR + "framenet/":
        return FN_NS + name
    if iri == KS_NS + "mod":
        return DUL_ASSOCIATED_WITH
    return iri


def _rewrite_gold_iri(iri: str) -> str:
    """GOLD_CONVERTER uriRewriter (Converter.java:130-140): strip the
    lemma part of VN class names (want-32.1 -> 32.1)."""
    ns, name = _split(iri)
    if ns == VN_NS:
        i = name.find("-")
        if i > 0:
            return VN_NS + name[i + 1:]
    return iri


def _split(iri: str) -> Tuple[str, str]:
    """rdf4j namespace/localname split: after the last '#', '/', ':'."""
    for sep in "#/:":
        i = iri.rfind(sep)
        if i >= 0:
            return iri[:i + 1], iri[i + 1:]
    return "", iri


def _namespace_of(iri: str) -> str:
    return _split(iri)[0]


def convert(quads: Iterable[Tuple], system: str,
            sentences: Dict[str, str],
            mention_heads: Optional[Dict[str, object]] = None,
            sentence_of_node: Optional[Dict[str, str]] = None,
            multi_term: str = "error",
            default_sentence: Optional[str] = None,
            skip_unmappable: bool = False) -> Dict[str, ConvertedGraph]:
    """Convert one raw graph into eval graphs, one per sentence.

    quads           : (s, p, o, g) — g ignored except eval:metadata quads
                      which are skipped from the copy loop
    system          : "gold" | "pikes" | "spark" — selects node query +
                      uriRewriter per Converter.java's three instances
    sentences       : sentence IRI -> sentence text (pre-trimmed)
    mention_heads   : mention IRI -> head term LOCAL NAME (the
                      eval:head statements of pikes.patch.trig, or the
                      distiller-recorded heads for the spark system)
    sentence_of_node: node IRI -> sentence IRI override (spark system,
                      where node namespaces aren't the sentence IRI)
    """
    mention_heads = mention_heads or {}
    sent_models = {iri: Sentence(text.strip()) for iri, text in sentences.items()}

    quads = list(quads)
    metadata_stmts = {(s, p, o) for (s, p, o, g) in quads
                      if g == EVAL_NS + "metadata"}
    data = [(s, p, o) for (s, p, o, g) in quads if g != EVAL_NS + "metadata"]

    # --- node query ---------------------------------------------------
    node_terms: Dict[str, Set[str]] = {}
    node_sentence: Dict[str, str] = {}

    def sentence_for(node: str) -> Optional[str]:
        if sentence_of_node and node in sentence_of_node:
            return sentence_of_node[node]
        ns = _namespace_of(node)
        if ns in sent_models:
            return ns
        return default_sentence

    if system == "gold":
        node_types = {EVAL_NS + "Node", EVAL_NS + "Entity",
                      EVAL_NS + "Frame", EVAL_NS + "Quality"}
        for (s, p, o) in data:
            if p == RDF_TYPE and o in node_types and isinstance(s, str):
                sent_iri = sentence_for(s)
                if sent_iri is None:
                    continue
                term = sent_models[sent_iri].term_for_name(_split(s)[1])
                node_terms.setdefault(s, set()).add(term)
                node_sentence[s] = sent_iri
    else:
        # ?node gaf:denotedBy ?m . ?m nif:beginIndex ?b ; nif:endIndex ?e
        begins: Dict[str, int] = {}
        ends: Dict[str, int] = {}
        for (s, p, o) in data:
            if p == NIF_NS + "beginIndex" and isinstance(o, tuple):
                begins[s] = int(o[1])
            elif p == NIF_NS + "endIndex" and isinstance(o, tuple):
                ends[s] = int(o[1])
        for (s, p, o) in data:
            if p != GAF_DENOTED_BY or not isinstance(o, str):
                continue
            sent_iri = sentence_for(o) or sentence_for(s)
            if sent_iri is None or o not in begins:
                continue
            model = sent_models[sent_iri]
            head = mention_heads.get(o)
            try:
                if isinstance(head, tuple):  # (begin, end) head char span
                    term = model.term_for_span(head[0], head[1], multi="last")
                elif head is not None:
                    term = model.term_for_name(_split(head)[1] if "/" in head
                                               or "#" in head else head)
                else:
                    term = model.term_for_span(begins[o], ends[o],
                                               multi=multi_term)
            except ValueError:
                # a designated head with NO term at all (digit heads:
                # "March 2013" headed by "2013") falls back to the
                # leftmost term of the full mention span; anything else
                # unmappable is skipped when asked (it could never
                # align and would be "extra" regardless)
                full = [model.terms[i] for i in range(len(model.terms))
                        if begins[o] < model.ends[i]
                        and ends[o] > model.begins[i]]
                head_has_term = isinstance(head, tuple) and any(
                    head[0] < model.ends[i] and head[1] > model.begins[i]
                    for i in range(len(model.terms)))
                if full and isinstance(head, tuple) and not head_has_term:
                    term = full[0]
                elif skip_unmappable:
                    continue
                else:
                    raise
            node_terms.setdefault(s, set()).add(term)
            node_sentence[s] = sent_iri

    # --- build per-sentence graphs with node typing + denotedBy --------
    graphs: Dict[str, ConvertedGraph] = {}
    for sent_iri in sentences:
        graphs[sent_iri] = ConvertedGraph(sent_iri, system, sent_models[sent_iri])

    def split_node(node: str, terms: Set[str]) -> List[str]:
        if len(terms) <= 1:
            return [node]
        return [node + "_" + t for t in sorted(terms)]

    node_split_iris: Dict[str, List[str]] = {}
    for node, terms in node_terms.items():
        g = graphs[node_sentence[node]]
        parts = []
        for term in sorted(terms):
            node_iri = node if len(terms) == 1 else node + "_" + term
            g.nodes.add(node_iri)
            g.node_terms.setdefault(node_iri, set()).add(term)
            g.triples.add((node_iri, RDF_TYPE, EVAL_NS + "Node"))
            g.triples.add((node_iri, EVAL_NS + "denotedBy", g.term_iri(term)))
            parts.append(node_iri)
        node_split_iris[node] = parts

    rewrite = _rewrite_gold_iri if system == "gold" else _rewrite_pikes_iri

    # --- statement copy loop (Converter.java:297-340) -------------------
    for (s, p, o) in data:
        if not isinstance(s, str) or s not in node_terms:
            continue
        if p in IGNORABLE_TERMS:
            continue
        if p == RDF_TYPE and o in IGNORABLE_TERMS:
            continue
        pred = rewrite(p)
        obj = o
        if pred == RDF_TYPE and isinstance(o, str):
            obj = rewrite(o)
        sent_iri = node_sentence[s]
        g = graphs[sent_iri]
        subj_iris = node_split_iris[s]
        obj_vals = (node_split_iris.get(obj, [obj])
                    if isinstance(obj, str) else [obj])
        _corefer(g, subj_iris)
        if isinstance(obj, str):
            _corefer(g, obj_vals)
        splitting = len(subj_iris) > 1 or len(obj_vals) > 1
        added = False
        for si in subj_iris:
            for ov in obj_vals:
                if not splitting or (si, pred, ov) in metadata_stmts:
                    g.triples.add((si, pred, ov))
                    added = True
        if not added:
            raise ValueError(
                f"could not split statement ({s}, {p}, {o}); "
                f"subj={subj_iris} obj={obj_vals}")

    return graphs


def _corefer(g: ConvertedGraph, values: List[str]) -> None:
    if len(values) > 1:
        ordered = sorted(values)
        for i, a in enumerate(ordered):
            for b in ordered[i + 1:]:
                g.triples.add((a, OWL_SAMEAS, b))
