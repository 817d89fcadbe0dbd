"""Aligner + Evaluation semantics (eval/{Aligner,Evaluation}.java).

Input: per-sentence ConvertedGraph pairs (gold, test). Output: per
component (instances, unlabelled edges, labelled roles by NS, types by
NS, linking, triples aggregate) a (tp, fp, fn) count plus listings of
FP/FN items for debugging.

"gold" here is whichever graph plays the reference role — the shipped
eval-pm gold standard, or the converted PIKES output when scoring
parity with reference semantics (the north rule).
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Set, Tuple

from .convert import (ConvertedGraph, EVAL_NS, OWL_SAMEAS, PB_NS, NB_NS,
                      VN_NS, FN_NS, FRB_NS, RDF_TYPE, _namespace_of)

ASSOCIABLE_TO = EVAL_NS + "associableTo"
NOT_ASSOCIABLE_TO = EVAL_NS + "notAssociableTo"
CLASSIFIABLE_AS = EVAL_NS + "classifiableAs"
DENOTED_BY = EVAL_NS + "denotedBy"
OWL_NS = "http://www.w3.org/2002/07/owl#"

_EXCLUDED_PREDS = {ASSOCIABLE_TO, NOT_ASSOCIABLE_TO, CLASSIFIABLE_AS,
                   EVAL_NS + "mappedTo"}


def _pair(a: str, b: str) -> Tuple[str, str]:
    return (a, b) if a <= b else (b, a)


def _relations_for(g: ConvertedGraph) -> Set[Tuple[str, str]]:
    """Aligner.relationsFor (Aligner.java:210-230): unordered node-node
    pairs linked by any non-eval predicate, plus (node, class) pairs
    from rdf:type statements."""
    rels: Set[Tuple[str, str]] = set()
    for (s, p, o) in g.triples:
        if p in _EXCLUDED_PREDS or not isinstance(o, str) or s == o:
            continue
        if s in g.nodes and (o in g.nodes or p == RDF_TYPE):
            rels.add(_pair(s, o))
    return rels


def align(gold: ConvertedGraph, test: ConvertedGraph,
          max_alternatives: int = 200_000) -> Dict[str, str]:
    """Aligner.align (Aligner.java:81-173): term-anchored node mapping,
    disambiguated by maximizing relation-overlap TP."""
    gold_by_term: Dict[str, List[str]] = {}
    for node, terms in gold.node_terms.items():
        for t in terms:
            gold_by_term.setdefault(t, []).append(node)
    for v in gold_by_term.values():
        v.sort()

    test_by_term: Dict[str, List[str]] = {}
    for node, terms in test.node_terms.items():
        for t in terms:
            if t in gold_by_term:
                test_by_term.setdefault(t, []).append(node)
    for v in test_by_term.values():
        v.sort()

    base: Dict[str, str] = {}
    alt_test: List[str] = []
    alt_gold: List[List[str]] = []
    count = 1
    for term in sorted(test_by_term):
        gold_nodes = gold_by_term[term]
        for tn in test_by_term[term]:
            if len(gold_nodes) == 1:
                base[tn] = gold_nodes[0]
            else:
                alt_test.append(tn)
                alt_gold.append(gold_nodes)
                count *= len(gold_nodes)

    gold_rels = _relations_for(gold)
    test_rels = _relations_for(test)

    def tp_of(mapping: Dict[str, str]) -> int:
        rewritten = set()
        for (a, b) in test_rels:
            ra, rb = mapping.get(a, a), mapping.get(b, b)
            if ra != rb:
                rewritten.add(_pair(ra, rb))
        return len(gold_rels & rewritten)

    if count == 1:
        return base
    if count > max_alternatives:
        # greedy fallback (never triggered by the 8-sentence data; a
        # guard against pathological inputs)
        mapping = dict(base)
        for tn, options in zip(alt_test, alt_gold):
            best = max(options, key=lambda gn: tp_of({**mapping, tn: gn}))
            mapping[tn] = best
        return mapping

    best_mapping, best_tp, best_count = dict(base), -1, -1
    for combo in itertools.product(*alt_gold):
        mapping = dict(base)
        mapping.update(zip(alt_test, combo))
        tp = tp_of(mapping)
        distinct = len(set(mapping.values()))
        if tp > best_tp or (tp == best_tp and distinct > best_count):
            best_tp, best_count, best_mapping = tp, distinct, mapping
    return best_mapping


@dataclass
class PR:
    tp: int = 0
    fp: int = 0
    fn: int = 0
    fp_items: list = field(default_factory=list)
    fn_items: list = field(default_factory=list)

    @property
    def precision(self) -> float:
        return self.tp / (self.tp + self.fp) if self.tp + self.fp else 0.0

    @property
    def recall(self) -> float:
        return self.tp / (self.tp + self.fn) if self.tp + self.fn else 0.0

    @property
    def f1(self) -> float:
        p, r = self.precision, self.recall
        return 2 * p * r / (p + r) if p + r else 0.0

    def add(self, other: "PR") -> None:
        self.tp += other.tp
        self.fp += other.fp
        self.fn += other.fn
        self.fp_items += other.fp_items
        self.fn_items += other.fn_items

    def row(self) -> str:
        return (f"{self.tp + self.fn:4d} {self.tp:4d} {self.fp:4d} "
                f"{self.fn:4d}  {self.precision:5.3f} {self.recall:5.3f} "
                f"{self.f1:5.3f}")


def _gold_markers(gold: ConvertedGraph, pred: str) -> Set[Tuple[str, str]]:
    return {_pair(s, o) for (s, p, o) in gold.triples
            if p == pred and isinstance(o, str)}


def evaluate_sentence(gold: ConvertedGraph, test: ConvertedGraph,
                      mapping: Dict[str, str],
                      symmetric_sameas: bool = False) -> Dict[str, PR]:
    """Evaluation.Evaluator component PRs for one sentence
    (Evaluation.java:400-846), gold-standard PRs only.

    symmetric_sameas canonicalizes node-node owl:sameAs direction
    AFTER mapping (owl:sameAs is symmetric; the engine's emission
    direction is arbitrary). Off by default — the published eval-pm
    run is direction-sensitive and the calibration must reproduce it;
    the held-out scoring turns it on."""
    out: Dict[str, PR] = {}
    ignorable = _gold_markers(gold, ASSOCIABLE_TO)
    ignorable_types = _gold_markers(gold, CLASSIFIABLE_AS)

    # --- instances (nodeEvaluation :400-492) ---------------------------
    pr = PR()
    mapped_gold = set(mapping.values())
    for gn in sorted(gold.nodes):
        if gn in mapped_gold:
            pr.tp += 1
        else:
            pr.fn += 1
            pr.fn_items.append(gn)
    for tn in sorted(test.nodes):
        if tn not in mapping:
            pr.fp += 1
            pr.fp_items.append(tn)
    out["instances"] = pr

    # --- unlabelled edges (unlabelledEvaluation :494-610) --------------
    def graph_relations(g: ConvertedGraph):
        rels: Set[Tuple[str, str]] = set()
        for (s, p, o) in g.triples:
            if (p in _EXCLUDED_PREDS or p == DENOTED_BY
                    or not isinstance(o, str) or s == o):
                continue
            if s in g.nodes and o in g.nodes:
                rels.add(_pair(s, o))
        return rels

    gold_rels = graph_relations(gold)
    test_keys: Dict[Tuple[str, str], bool] = {}  # rm -> extra
    for (a, b) in graph_relations(test):
        ma, mb = mapping.get(a), mapping.get(b)
        if ma is not None and mb is not None and ma == mb:
            continue
        rm = _pair(ma if ma is not None else a, mb if mb is not None else b)
        extra = ma is None or mb is None
        test_keys[rm] = test_keys.get(rm, True) and extra
    pr = PR()
    for gr in sorted(gold_rels):
        if gr in test_keys:
            pr.tp += 1
        else:
            pr.fn += 1
            pr.fn_items.append(gr)
    for rm, extra in sorted(test_keys.items()):
        if rm not in gold_rels:
            ignore = extra or rm in ignorable
            if not ignore:
                pr.fp += 1
                pr.fp_items.append(rm)
    out["edges"] = pr

    # --- labelled (labelledEvaluation :612-729) ------------------------
    def labelled(ns_set: Optional[Set[str]]) -> PR:
        def stmts(g: ConvertedGraph, mp: Dict[str, str]):
            keys: Dict[Tuple, bool] = {}
            for (s, p, o) in g.triples:
                if (p in _EXCLUDED_PREDS or p == DENOTED_BY
                        or not isinstance(o, str) or s == o):
                    continue
                if s not in g.nodes or o not in g.nodes:
                    continue
                if ns_set is not None and _namespace_of(p) not in ns_set:
                    continue
                ms, mo = mp.get(s), mp.get(o)
                if ms is not None and mo is not None and ms == mo:
                    continue
                ks_, ko_ = (ms if ms is not None else s,
                            mo if mo is not None else o)
                if symmetric_sameas and p == OWL_SAMEAS and ko_ < ks_:
                    ks_, ko_ = ko_, ks_
                key = (ks_, p, ko_)
                extra = ms is None or mo is None
                keys[key] = keys.get(key, True) and extra
            return keys

        gold_keys = stmts(gold, {})
        tkeys = stmts(test, mapping)
        pr = PR()
        for gk in sorted(gold_keys):
            if gk in tkeys:
                pr.tp += 1
            else:
                pr.fn += 1
                pr.fn_items.append(gk)
        for tk, extra in sorted(tkeys.items()):
            if tk not in gold_keys:
                ignore = extra or _pair(tk[0], tk[2]) in ignorable
                if not ignore:
                    pr.fp += 1
                    pr.fp_items.append(tk)
        return pr

    out["labelled"] = labelled({PB_NS, NB_NS, VN_NS, FN_NS, OWL_NS})
    out["roles_pb"] = labelled({PB_NS})
    out["roles_nb"] = labelled({NB_NS})
    out["roles_vn"] = labelled({VN_NS})
    out["roles_fn"] = labelled({FN_NS})
    out["sameas"] = labelled({OWL_NS})

    # --- types / linking (attributeEvaluation :731-846) ----------------
    def attributes(predicate: str, value_ns: Optional[Set[str]],
                   ignore_set: Set[Tuple[str, str]]) -> PR:
        def stmts(g: ConvertedGraph, mp: Dict[str, str]):
            keys: Dict[Tuple, bool] = {}
            for (s, p, o) in g.triples:
                if p != predicate or s not in g.nodes:
                    continue
                if isinstance(o, str) and o in g.nodes:
                    continue
                if o == EVAL_NS + "Node":
                    continue
                if value_ns is not None and (
                        not isinstance(o, str)
                        or _namespace_of(o) not in value_ns):
                    continue
                ms = mp.get(s)
                key = (ms if ms is not None else s, p, o)
                keys[key] = keys.get(key, True) and (ms is None)
            return keys

        gold_keys = stmts(gold, {})
        tkeys = stmts(test, mapping)
        pr = PR()
        for gk in sorted(gold_keys):
            if gk in tkeys:
                pr.tp += 1
            else:
                pr.fn += 1
                pr.fn_items.append(gk)
        for tk, extra in sorted(tkeys.items()):
            if tk not in gold_keys:
                ignore = extra or (isinstance(tk[2], str)
                                   and _pair(tk[0], tk[2]) in ignore_set)
                if not ignore:
                    pr.fp += 1
                    pr.fp_items.append(tk)
        return pr

    all_type_ns = {PB_NS, NB_NS, VN_NS, FN_NS}
    out["types"] = attributes(RDF_TYPE, all_type_ns, ignorable_types)
    out["types_pb"] = attributes(RDF_TYPE, {PB_NS}, ignorable_types)
    out["types_nb"] = attributes(RDF_TYPE, {NB_NS}, ignorable_types)
    out["types_vn"] = attributes(RDF_TYPE, {VN_NS}, ignorable_types)
    out["types_fn"] = attributes(RDF_TYPE, {FN_NS}, ignorable_types)
    out["linking"] = attributes(OWL_SAMEAS, None, ignorable_types)

    # --- triples aggregate (Evaluation.java:350-351) --------------------
    agg = PR()
    for k in ("labelled", "types", "linking"):
        agg.add(out[k])
    out["triples"] = agg

    # --- FrameBase components (eval-framebase.md: type / role / all) ----
    out["types_fb"] = attributes(RDF_TYPE, {FRB_NS}, ignorable_types)
    out["roles_fb"] = labelled({FRB_NS})
    fb = PR()
    fb.add(out["types_fb"])
    fb.add(out["roles_fb"])
    out["all_fb"] = fb
    return out


COMPONENTS = ["instances", "triples", "linking",
              "types_vn", "types_fn", "types_pb", "types_nb",
              "roles_vn", "roles_fn", "roles_pb", "roles_nb",
              "sameas", "edges"]

FB_COMPONENTS = ["types_fb", "roles_fb", "all_fb"]


def evaluate(gold_graphs: Dict[str, ConvertedGraph],
             test_graphs: Dict[str, ConvertedGraph],
             symmetric_sameas: bool = False) -> Dict[str, PR]:
    """Align + evaluate every sentence; aggregate per component."""
    totals = {k: PR() for k in COMPONENTS + FB_COMPONENTS
              + ["labelled", "types"]}
    for sent_iri in sorted(gold_graphs):
        gold = gold_graphs[sent_iri]
        test = test_graphs.get(sent_iri)
        if test is None:
            test = ConvertedGraph(sent_iri, "missing", gold.sentence)
        mapping = align(gold, test)
        prs = evaluate_sentence(gold, test, mapping,
                                symmetric_sameas=symmetric_sameas)
        for k, pr in prs.items():
            totals[k].add(pr)
    return totals


def report(totals: Dict[str, PR], title: str,
           components: Optional[List[str]] = None) -> str:
    lines = [f"## {title}", "",
             "| component | gold | TP | FP | FN | P | R | F1 |",
             "|---|---|---|---|---|---|---|---|"]
    for k in components or COMPONENTS:
        pr = totals[k]
        lines.append(
            f"| {k} | {pr.tp + pr.fn} | {pr.tp} | {pr.fp} | {pr.fn} "
            f"| {pr.precision:.3f} | {pr.recall:.3f} | {pr.f1:.3f} |")
    return "\n".join(lines)
