"""NAF XML debug export (SURVEY §2.1, S2's optional dump).

Serializes one annotations row (operators/annotate.ANNOTATIONS_SCHEMA)
to a NAF v3 document with the layer layout of the reference's naflib
writer (ReadWriteManager.java:1918-2400: NAF root with xml:lang +
version, nafHeader with fileDesc/public/linguisticProcessors, raw
CDATA, text/wf, terms with spans + externalReferences, deps, entities,
timeExpressions, srl predicates/roles, coreferences). This is the
debug artifact a reference user gets from ``--naf`` style output — a
faithful LAYOUT, not a byte-for-byte naflib clone (JDOM pretty-print
details differ).

Deterministic by construction: layers are emitted in fixed order, ids
come from the row, attribute order is hardcoded — the same row always
serializes to the same bytes (the frozen-VALUES oracle relies on it).
"""

from __future__ import annotations

from typing import Iterable, List

_ESC = {"&": "&amp;", "<": "&lt;", ">": "&gt;", '"': "&quot;"}


def _seq(v) -> list:
    """None/numpy-array/list -> plain list (pandas hands Arrow list
    columns over as numpy arrays, whose truthiness is ambiguous)."""
    if v is None:
        return []
    return list(v)


def _esc(v) -> str:
    s = str(v)
    for k, r in _ESC.items():
        s = s.replace(k, r)
    return s


def _cdata(text: str) -> str:
    # "]]>" must be split across CDATA sections per the XML spec
    return "<![CDATA[" + text.replace("]]>", "]]]]><![CDATA[>") + "]]>"


def _span(tids: Iterable[int], prefix: str = "t") -> List[str]:
    out = ["<span>"]
    for t in tids:
        out.append(f'<target id="{prefix}{int(t) + 1}"/>')
    out.append("</span>")
    return out


def _ext_refs(refs) -> List[str]:
    refs = _seq(refs)
    if not refs:
        return []
    out = ["<externalReferences>"]
    for r in refs:
        attrs = [f'resource="{_esc(r["resource"])}"',
                 f'reference="{_esc(r["reference"])}"']
        conf = r.get("confidence")
        if conf is not None:
            attrs.append(f'confidence="{conf}"')
        src = r.get("source")
        if src:
            attrs.append(f'source="{_esc(src)}"')
        out.append("<externalRef " + " ".join(attrs) + "/>")
    out.append("</externalReferences>")
    return out


def doc_to_naf(row: dict) -> str:
    """annotations row (dicts per ANNOTATIONS_SCHEMA) -> NAF v3 XML."""
    url = row.get("url") or ""
    lang = row.get("lang") or "en"
    text = row.get("text") or ""
    p: List[str] = ['<?xml version="1.0" encoding="UTF-8"?>']
    p.append(f'<NAF xml:lang="{_esc(lang)}" version="v3">')
    # header (fileDesc/public: ReadWriteManager.java:1928-1961)
    p.append("<nafHeader>")
    p.append(f'<fileDesc filename="{_esc(url)}" filetype="text/plain"/>')
    p.append(f'<public uri="{_esc(url)}"/>')
    for layer in ("text", "terms", "deps", "entities", "timeExpressions",
                  "srl", "coreferences"):
        p.append(f'<linguisticProcessors layer="{layer}">'
                 f'<lp name="pikes_spark" version="1.0"/>'
                 f"</linguisticProcessors>")
    p.append("</nafHeader>")
    if text:
        p.append("<raw>" + _cdata(text) + "</raw>")
    # text/wf (:1996-2022)
    for i, tok in enumerate(_seq(row.get("tokens"))):
        if i == 0:
            p.append("<text>")
        p.append(f'<wf id="w{tok["id"] + 1}" sent="{tok["sent"] + 1}" '
                 f'offset="{tok["begin"]}" length="{tok["len"]}">'
                 f'{_esc(tok["form"])}</wf>')
    if _seq(row.get("tokens")):
        p.append("</text>")
    # terms (termToDOM: :2025-2033)
    terms = _seq(row.get("terms"))
    if terms:
        p.append("<terms>")
        for tm in terms:
            p.append(f'<term id="t{tm["id"] + 1}" '
                     f'lemma="{_esc(tm["lemma"])}" pos="{_esc(tm["pos"])}" '
                     f'morphofeat="{_esc(tm["morphofeat"])}">')
            p.extend(_span(_seq(tm.get("wf_ids")) or [tm["id"]],
                           prefix="w"))
            p.extend(_ext_refs(tm.get("refs")))
            p.append("</term>")
        p.append("</terms>")
    # deps
    deps = _seq(row.get("deps"))
    if deps:
        p.append("<deps>")
        for d in deps:
            p.append(f'<dep from="t{d["from"] + 1}" to="t{d["to"] + 1}" '
                     f'rfunc="{_esc(d["rfunc"])}"/>')
        p.append("</deps>")
    # entities (references wraps the span in naflib)
    entities = _seq(row.get("entities"))
    if entities:
        p.append("<entities>")
        for en in entities:
            p.append(f'<entity id="{_esc(en["id"])}" '
                     f'type="{_esc(en["type"])}">')
            p.append("<references>")
            p.extend(_span(_seq(en.get("term_ids"))))
            p.append("</references>")
            p.extend(_ext_refs(en.get("refs")))
            p.append("</entity>")
        p.append("</entities>")
    # timeExpressions
    timexes = _seq(row.get("timexes"))
    if timexes:
        p.append("<timeExpressions>")
        for x in timexes:
            p.append(f'<timex3 id="{_esc(x["id"])}" type="{_esc(x["type"])}" '
                     f'value="{_esc(x["value"])}">')
            p.extend(_span(_seq(x.get("wf_ids")), prefix="w"))
            p.append("</timex3>")
        p.append("</timeExpressions>")
    # srl
    preds = _seq(row.get("predicates"))
    if preds:
        p.append("<srl>")
        for pr in preds:
            p.append(f'<predicate id="{_esc(pr["id"])}">')
            p.extend(_ext_refs(pr.get("refs")))
            p.extend(_span(_seq(pr.get("term_ids"))))
            for k, role in enumerate(_seq(pr.get("roles"))):
                p.append(f'<role id="{_esc(pr["id"])}_r{k + 1}" '
                         f'semRole="{_esc(role["sem_role"])}">')
                p.extend(_ext_refs(role.get("refs")))
                p.extend(_span(_seq(role.get("term_ids"))))
                p.append("</role>")
            p.append("</predicate>")
        p.append("</srl>")
    # coreferences
    corefs = _seq(row.get("corefs"))
    if corefs:
        p.append("<coreferences>")
        for c in corefs:
            p.append(f'<coref id="{_esc(c["id"])}">')
            for sp in _seq(c.get("spans")):
                ids = sp["ids"] if isinstance(sp, dict) else sp
                p.extend(_span(_seq(ids)))
            p.append("</coref>")
        p.append("</coreferences>")
    p.append("</NAF>")
    return "\n".join(p)
