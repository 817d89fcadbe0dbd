"""F9 srlPreprocess: merge predicates from two SRL sources
(NAFFilter.java:985-1107).

Semantics re-expressed:
1. drop predicates without a valid head;
2. drop predicates from disabled tools;
3. for each Semafor (FrameNet) predicate whose head matches a Mate
   predicate: merge INTO the Mate predicate —
   - FrameNet refs copied only when both agree on the frame (or Mate
     has none);
   - roles with equal spans merged (refs unioned), others appended;
   the Semafor predicate is then removed.

Pure Python over the predicate dicts; exercised whenever a second
(FrameNet) SRL head is plugged into the annotate stage.
"""

from __future__ import annotations

from typing import Dict, List, Optional


def _ref(pred: dict, resource: str) -> Optional[str]:
    for r in pred.get("refs") or []:
        if (r.get("resource") or "").lower() == resource.lower():
            return r.get("reference")
    return None


def merge_srl_sources(predicates: List[dict], graph,
                      enable_mate: bool = True,
                      enable_semafor: bool = True) -> List[dict]:
    """predicates (mixed sources) -> merged list (F9)."""
    mate: Dict[int, dict] = {}
    semafor: Dict[int, dict] = {}
    ellipsis: List[dict] = []
    for pred in predicates:
        if pred.get("ellipsis"):
            # a second instance over the same head (gapped coordination)
            # passes through the merge untouched
            ellipsis.append(pred)
            continue
        head = pred.get("head_id")
        if head is None:
            head = graph.head_of_span(pred["term_ids"])
        if head is None:
            continue  # no valid head -> dropped (NAFFilter.java:992-997)
        is_semafor = (pred.get("source") or "").lower() == "semafor"
        if is_semafor and not enable_semafor:
            continue
        if not is_semafor and not enable_mate:
            continue
        (semafor if is_semafor else mate)[head] = pred

    out: List[dict] = []
    for head, mpred in mate.items():
        spred = semafor.get(head)
        if spred is None:
            out.append(mpred)
            continue
        merged = dict(mpred)
        merged["refs"] = list(mpred.get("refs") or [])
        merged["roles"] = [dict(r) for r in mpred.get("roles") or []]
        s_fn = _ref(spred, "FrameNet")
        m_fn = _ref(mpred, "FrameNet")
        merge_framenet = s_fn is not None and (m_fn is None or m_fn == s_fn)
        for ref in spred.get("refs") or []:
            res = (ref.get("resource") or "").lower()
            if res == "framenet" and not merge_framenet:
                continue
            if _ref(merged, ref.get("resource") or "") != ref.get("reference"):
                merged["refs"].append(dict(ref))
        # roles: equal spans merge, others append (NAFFilter.java:1064-1092)
        for srole in spred.get("roles") or []:
            s_span = sorted(srole.get("term_ids") or [])
            matched = None
            for mrole in merged["roles"]:
                if sorted(mrole.get("term_ids") or []) == s_span:
                    matched = mrole
                    break
            if matched is not None:
                refs = list(matched.get("refs") or [])
                for ref in srole.get("refs") or []:
                    if (not merge_framenet
                            and (ref.get("resource") or "").lower() == "framenet"):
                        continue
                    if ref not in refs:
                        refs.append(dict(ref))
                matched["refs"] = refs
            else:
                srole2 = dict(srole)
                if not merge_framenet:
                    srole2["refs"] = [r for r in srole.get("refs") or []
                                      if (r.get("resource") or "").lower() != "framenet"]
                merged["roles"].append(srole2)
        out.append(merged)
    # semafor-only predicates survive as-is
    for head, spred in semafor.items():
        if head not in mate:
            out.append(spred)
    out.extend(ellipsis)
    return out
