"""F17 corefSpanFixing + F18 corefForRoleDependencies
(NAFFilter.java:784-983) — the two coreference post-fix stages.

Both are OFF by default, matching the reference's own default
configuration (the shipped runs never enable them); the full-breadth
NomBank index makes their role tests faithful: a nominal is a "role"
predicate iff its NomBank roleset declares mandatory or optional
predicate-filled args (NomBank.Roleset.getPredMandatoryArgNums /
getPredOptionalArgNums).
"""

from __future__ import annotations

from typing import Dict, List, Optional

ENABLE_COREF_SPAN_FIXING = False   # F17 (reference default: off)
ENABLE_COREF_ROLE_DEPS = False     # F18 (reference default: off)


def _head(graph, sp: List[int]) -> int:
    return graph.head_of_span(sp) or sp[-1]


def _nombank_role_status(doc: dict, term: int, nb) -> Optional[bool]:
    """True/False: the first NomBank roleset found on a predicate at
    ``term`` declares (no) pred-filled args; None: no NomBank
    predicate there (NAFFilter.java:846-864, 926-942 break at the
    first ref)."""
    for pred in doc.get("predicates", []):
        if pred.get("head_id", pred["term_ids"][0]) != term \
                and term not in pred["term_ids"]:
            continue
        for r in pred.get("refs") or []:
            if (r.get("resource") or "").lower() == "nombank":
                rs = nb.roleset(r.get("reference")) if nb else None
                if rs is None:
                    return None
                return bool(rs.mandatory_args or rs.optional_args)
    return None


def coref_span_fixing(doc: dict, graph) -> None:
    """F17 (NAFFilter.java:784-894): per coref cluster — drop spans
    containing smaller member spans; with a proper-noun head present,
    drop VB-headed spans and non-role nominal-predicate spans (unless
    the cluster is an event cluster by SUMO Process); without one,
    split the cluster per sentence. Mutates doc["corefs"]."""
    from .resource_loaders import nombank_index
    nb = nombank_index()
    terms = doc["terms"]
    tokens = doc["tokens"]
    out: List[dict] = []

    def emit(spans: List[List[int]]) -> None:
        if spans:
            out.append({"id": f"co{len(out) + 1}", "spans": sorted(spans)})

    for co in doc.get("corefs", []):
        spans = [list(sp) for sp in co["spans"]]
        # remove spans that strictly contain another member span
        spans = [s1 for s1 in spans
                 if not any(len(s1) > len(s2) and set(s2) <= set(s1)
                            for s2 in spans)]
        heads = [_head(graph, sp) for sp in spans]
        has_pn = any((terms[h]["morphofeat"] or "").startswith("NNP")
                     for h in heads)
        is_event = any((r.get("resource") or "").lower() == "sumo"
                       and r.get("source") == "process"
                       for h in heads for r in terms[h].get("refs") or [])
        if has_pn:
            kept: List[List[int]] = []
            for sp, h in zip(spans, heads):
                mf = terms[h]["morphofeat"] or ""
                if not mf.startswith("NNP") and not is_event:
                    if mf.startswith("VB"):
                        continue
                    if _nombank_role_status(doc, h, nb) is False:
                        continue  # non-role nominal predicate
                kept.append(sp)
            emit(kept)
        else:
            by_sent: Dict[int, List[List[int]]] = {}
            for sp in spans:
                by_sent.setdefault(tokens[sp[0]]["sent"], []).append(sp)
            if len(by_sent) > 1:
                for group in by_sent.values():
                    if len(group) > 1:
                        emit(group)
            else:
                emit(spans)
    doc["corefs"] = out


def coref_for_role_dependencies(doc: dict, graph) -> None:
    """F18 (NAFFilter.java:896-983): an APPO/TITLE/NMOD dependency
    between a proper name and a ROLE nominal (NomBank roleset with
    pred-filled args) becomes a new coreference cluster, with
    coordination expansion and number agreement. Mutates
    doc["corefs"]."""
    from .resource_loaders import nombank_index
    nb = nombank_index()
    terms = doc["terms"]
    corefs = doc.setdefault("corefs", [])

    def heads_of(co) -> set:
        return {_head(graph, sp) for sp in co["spans"]}

    for d in doc.get("deps", []):
        if d["rfunc"] not in ("APPO", "TITLE", "NMOD"):
            continue
        f, t = d["from"], d["to"]
        mf_f = terms[f]["morphofeat"] or ""
        mf_t = terms[t]["morphofeat"] or ""
        if mf_f.startswith("NNP") and mf_t.startswith("NN") \
                and not mf_t.startswith("NNP"):
            name, role = f, t
        elif mf_t.startswith("NNP") and mf_f.startswith("NN") \
                and not mf_f.startswith("NNP") and d["rfunc"] == "APPO":
            name, role = t, f
        else:
            continue
        if any(name in heads_of(co) and role in heads_of(co)
               for co in corefs):
            continue  # already coreferential
        if _nombank_role_status(doc, role, nb) is not True:
            continue  # not an actual role nominal
        role_heads = sorted(graph.descendants_matching(
            [role], "(COORD CONJ?)*"))
        name_heads = sorted(graph.descendants_matching(
            [name], "(COORD CONJ?)*"))
        if any(not (terms[h]["morphofeat"] or "").startswith("NNP")
               for h in name_heads):
            continue
        agree = True
        for rh in role_heads:
            plural = (terms[rh]["morphofeat"] or "").endswith("S")
            if (len(name_heads) == 1 and plural) \
                    or (len(name_heads) > 1 and not plural):
                agree = False
                break
        if not agree:
            continue
        spans = [[name]] + [[rh] for rh in role_heads]
        corefs.append({"id": f"co{len(corefs) + 1}", "spans": sorted(spans)})
