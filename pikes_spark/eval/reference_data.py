"""Load the reference's shipped eval-pm graphs into ConvertedGraphs.

Data layout (read-only):
  /root/reference/src/site/resources/eval-pm/gold/gold.{1..8}.ttl
  /root/reference/src/site/resources/eval-pm/pikes/pikes.{1..8}.ttl
  /root/reference/src/site/resources/eval-pm/pikes/pikes.patch.trig
    (eval:metadata graph: sentence labels + eval:head for multi-term
     mentions)
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

from .convert import ConvertedGraph, EVAL_NS, RDF_TYPE, RDFS_LABEL, convert
from .ttl import parse_ttl_file

EVAL_PM = "/root/reference/src/site/resources/eval-pm"


def load_patch() -> Tuple[Dict[str, str], Dict[str, str]]:
    """-> (sentence IRI -> text, mention IRI -> head IRI)."""
    quads = parse_ttl_file(os.path.join(EVAL_PM, "pikes", "pikes.patch.trig"))
    sentences: Dict[str, str] = {}
    heads: Dict[str, str] = {}
    labels = {s: o[1] for (s, p, o, g) in quads
              if p == RDFS_LABEL and isinstance(o, tuple)}
    for (s, p, o, g) in quads:
        if p == RDF_TYPE and o == EVAL_NS + "Sentence":
            sentences[s] = labels[s]
        elif p == EVAL_NS + "head":
            heads[s] = o
    return sentences, heads


def _fix_junk_eval_pred(quads):
    """gold.8.ttl contains `:americans :eval:associableTo :making .` — a
    typo for eval:associableTo (leading ':' makes it a local name,
    i.e. a junk predicate between two nodes). The published run kept it
    AS a junk predicate — it shows up as a gold edge (edges gold count
    171, not 170) — so we keep it verbatim too."""
    return quads


def load_gold_graphs() -> Dict[str, ConvertedGraph]:
    out: Dict[str, ConvertedGraph] = {}
    for i in range(1, 9):
        quads = _fix_junk_eval_pred(
            parse_ttl_file(os.path.join(EVAL_PM, "gold", f"gold.{i}.ttl")))
        sent_iri = f"file:///eswc.{i}.ttl/"
        text = next(o[1] for (s, p, o, g) in quads
                    if p == RDFS_LABEL and isinstance(o, tuple))
        graphs = convert(quads, "gold", {sent_iri: text})
        out[sent_iri] = graphs[sent_iri]
    return out


def load_pikes_graphs(multi_term: str = "error") -> Dict[str, ConvertedGraph]:
    sentences, heads = load_patch()
    out: Dict[str, ConvertedGraph] = {}
    for i in range(1, 9):
        quads = parse_ttl_file(os.path.join(EVAL_PM, "pikes", f"pikes.{i}.ttl"))
        sent_iri = f"file:///eswc.{i}.ttl/"
        graphs = convert(quads, "pikes", {sent_iri: sentences[sent_iri]},
                         mention_heads=heads, multi_term=multi_term)
        out[sent_iri] = graphs[sent_iri]
    return out


# ---------------------------------------------------------------------------
# eval-framebase (second shipped gold set: FrameBase types + roles)
# ---------------------------------------------------------------------------

EVAL_FB = "/root/reference/src/site/resources/eval-framebase"
FRB_NS = "http://framebase.org/ns/"
_FB_EVAL_SCHEMA = "eval:schema#"  # the framebase gold's eval prefix


def _frb_lower(v):
    if isinstance(v, str):
        if v.startswith(FRB_NS):
            return FRB_NS + v[len(FRB_NS):].lower()
        if v.startswith(_FB_EVAL_SCHEMA):
            return EVAL_NS + v[len(_FB_EVAL_SCHEMA):]
    return v


def load_framebase_gold_graphs(gold_dir: str = None) -> Dict[str, ConvertedGraph]:
    """eval-framebase/gold/gold.{1..8}.ttl -> ConvertedGraphs.

    Node discovery follows the stated convention (eval-framebase.md:
    "the link between an instance ... is implicit and given by the
    instance URI, whose local name corresponds to the head token"):
    every subject/object of a FrameBase statement (and every
    classifiableAs marker subject) is a node; eval:Node declarations
    are synthesized so the standard gold converter path applies.
    FrameBase IRIs are case-normalized (see convert._rewrite_pikes_iri)."""
    gold_dir = gold_dir or os.path.join(EVAL_FB, "gold")
    out: Dict[str, ConvertedGraph] = {}
    for i in range(1, 9):
        raw = parse_ttl_file(os.path.join(gold_dir, f"gold.{i}.ttl"))
        quads = [(_frb_lower(s), _frb_lower(p), _frb_lower(o), g)
                 for (s, p, o, g) in raw]
        sent_iri = f"file:///eswc.{i}.ttl/"
        text = next(o[1] for (s, p, o, g) in quads
                    if p == RDFS_LABEL and isinstance(o, tuple))
        nodes = set()
        for (s, p, o, g) in quads:
            if not isinstance(p, str):
                continue
            if p == RDF_TYPE and isinstance(o, str) and o.startswith(FRB_NS):
                nodes.add(s)
            elif p.startswith(FRB_NS + "fe-"):
                nodes.add(s)
                if isinstance(o, str):
                    nodes.add(o)
            elif p == EVAL_NS + "classifiableAs":
                nodes.add(s)
        quads += [(n, RDF_TYPE, EVAL_NS + "Node", None) for n in sorted(nodes)]
        graphs = convert(quads, "gold", {sent_iri: text.strip()})
        out[sent_iri] = graphs[sent_iri]
    return out


def load_framebase_pikes_graphs(config: str = "pikes-both",
                                multi_term: str = "last"
                                ) -> Dict[str, ConvertedGraph]:
    """The shipped PIKES outputs for the framebase eval (three configs:
    pikes-both / pikes-semafor / pikes-mate), used to calibrate the fb
    scoring path against the published table (eval-framebase.md:114-131)."""
    quads = parse_ttl_file(os.path.join(EVAL_FB, config,
                                        f"{config}.patch.trig"))
    sentences: Dict[str, str] = {}
    heads: Dict[str, str] = {}
    labels = {s: o[1] for (s, p, o, g) in quads
              if p == RDFS_LABEL and isinstance(o, tuple)}
    for (s, p, o, g) in quads:
        if p == RDF_TYPE and o == EVAL_NS + "Sentence":
            sentences[s] = labels[s]
        elif p == EVAL_NS + "head":
            heads[s] = o
    out: Dict[str, ConvertedGraph] = {}
    for i in range(1, 9):
        quads = parse_ttl_file(os.path.join(EVAL_FB, config,
                                            f"{config}.{i}.ttl"))
        sent_iri = f"file:///eswc.{i}.ttl/"
        graphs = convert(quads, "pikes", {sent_iri: sentences[sent_iri]},
                         mention_heads=heads, multi_term=multi_term)
        out[sent_iri] = graphs[sent_iri]
    return out


# ---------------------------------------------------------------------------
# Irrelevance markers reconstructed from the published alignment reports
# ---------------------------------------------------------------------------
#
# The published run's gold data contained eval:classifiableAs /
# eval:associableTo markers that are missing from the shipped gold.*.ttl
# (the shipped separate.*.html reports star exactly those items as
# "irrelevant, not a false positive"). The reports themselves are shipped
# reference artifacts, so the markers are reconstructed from them: every
# starred system item whose subject aligns to a gold node becomes a
# marker pair on the gold graph.

_REPORT_PREFIXES = {
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "owl": "http://www.w3.org/2002/07/owl#",
    "pb": "http://pikes.fbk.eu/ontologies/propbank#",
    "nb": "http://pikes.fbk.eu/ontologies/nombank#",
    "vn": "http://pikes.fbk.eu/ontologies/verbnet#",
    "fn": "http://pikes.fbk.eu/ontologies/framenet#",
    "dul": "http://www.ontologydesignpatterns.org/ont/dul/DUL.owl#",
    "dbpedia": "http://dbpedia.org/resource/",
    "ks": "http://dkm.fbk.eu/ontologies/knowledgestore#",
    "sem": "http://semanticweb.cs.vu.nl/2009/11/sem/",
}

# component html -> (marker kind, is_relation_format)
_REPORT_FILES = {
    "types.pb": ("classifiable", False),
    "types.nb": ("classifiable", False),
    "types.vn": ("classifiable", False),
    "types.fn": ("classifiable", False),
    "links": ("classifiable", False),
    "roles.pb": ("associable", False),
    "roles.nb": ("associable", False),
    "roles.vn": ("associable", False),
    "roles.fn": ("associable", False),
    "sameas": ("associable", False),
    "edges": ("associable", True),
}


def _report_token_to_iri(tok: str, sent_base: str):
    import html as _html
    tok = _html.unescape(tok.strip())
    if tok.startswith("<") and tok.endswith(">"):
        return tok[1:-1]
    if tok.startswith('"'):
        return ("lit", tok.strip('"'))
    if tok.startswith(":"):
        return sent_base + tok[1:]
    prefix, _, local = tok.partition(":")
    ns = _REPORT_PREFIXES.get(prefix)
    return ns + local if ns else tok


def load_report_markers(mappings: Dict[str, Dict[str, str]],
                        report_dir: str = None) -> Dict[str, Dict[str, set]]:
    """-> sentence IRI -> {"associable": set(pair), "classifiable": set(pair)}

    mappings: per-sentence test->gold node alignment (which this
    harness reproduces identically to the published run — verified by
    the instance-FP lists matching item for item)."""
    import html as _html
    import re as _re
    report_dir = report_dir or os.path.join(EVAL_PM, "separate")
    out: Dict[str, Dict[str, set]] = {
        s: {"associable": set(), "classifiable": set()} for s in mappings}
    sent_by_label = {f"S{i}": f"file:///eswc.{i}.ttl/" for i in range(1, 9)}

    def pair(a, b):
        return (a, b) if str(a) <= str(b) else (b, a)

    for comp, (kind, rel_format) in _REPORT_FILES.items():
        path = os.path.join(report_dir, f"separate.{comp}.html")
        if not os.path.exists(path):
            continue
        body = open(path, encoding="utf-8").read().split("<tbody>", 1)[1]
        current = None
        for chunk in _re.split(r"(<!-- sentence S\d -->|<tr[^>]*>)", body):
            m = _re.match(r"<!-- sentence (S\d) -->", chunk)
            if m:
                current = sent_by_label[m.group(1)]
                continue
            if current is None or "Results" in chunk:
                continue
            cells = [_re.sub(r"</td>\s*$", "", c).strip() for c in
                     _re.findall(r"<td[^>]*>(.*?)(?=<td|</tr|$)", chunk, _re.S)]
            if len(cells) < 3 or cells[1] or not cells[2].startswith("*"):
                continue
            content = _html.unescape(cells[2][1:].strip())
            sent_base = current
            mapping = mappings[current]
            if rel_format:
                for rm in _re.findall(r"\(([^)]*)\)", content):
                    a_tok, b_tok = [t.strip() for t in rm.split(",", 1)]
                    a = _report_token_to_iri(a_tok, sent_base)
                    b = _report_token_to_iri(b_tok, sent_base)
                    ga, gb = mapping.get(a), mapping.get(b)
                    if ga and gb:
                        out[current][kind].add(pair(ga, gb))
            else:
                for stmt in _re.split(r",\s+(?=[:<\w])", content):
                    toks = stmt.split()
                    if len(toks) < 3:
                        continue
                    s = _report_token_to_iri(toks[0], sent_base)
                    o = _report_token_to_iri(" ".join(toks[2:]), sent_base)
                    gs = mapping.get(s)
                    if gs is None:
                        continue  # extra -> already ignored
                    if isinstance(o, str):
                        go = mapping.get(o, o)
                        out[current][kind].add(pair(gs, go))
    return out


def apply_markers(gold_graphs: Dict[str, ConvertedGraph],
                  markers: Dict[str, Dict[str, set]]) -> None:
    """Inject reconstructed markers as associableTo/classifiableAs
    triples on the gold graphs (idempotent)."""
    for sent, sets in markers.items():
        g = gold_graphs.get(sent)
        if g is None:
            continue
        for (a, b) in sets["associable"]:
            g.triples.add((a, EVAL_NS + "associableTo", b))
        for (a, b) in sets["classifiable"]:
            g.triples.add((a, EVAL_NS + "classifiableAs", b))
