"""Build eval graphs for THIS repo's pipeline output ("spark" system).

Runs the library-surface pipeline (annotate -> link -> distill) in pure
Python over the 8 gold sentences — the same code the Spark operators
execute inside mapInPandas/mapInArrow (operators/annotate.py), so the
scored output is exactly what `kg_triples` emits for the gold pages.

The per-document linking here mirrors operators/linking.link_entities
expression for expression (surface dictionary join, prior * (1 +
context jaccard) scoring, argmax per span with (score desc, uri asc)).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

from ..functions.nlp import annotate_document
from ..functions.el_dict import el_candidates
from ..functions.resources import LINKING_STOPWORDS
from ..operators.distill import Distiller
from ..sources.gold import GOLD_PAGES
from .convert import ConvertedGraph, convert


def _python_links(doc: dict) -> List[dict]:
    """Mirror of operators/linking.entity_mentions + link_entities."""
    tokens = doc["tokens"]
    doc_tokens = {t["form"].lower() for t in tokens}
    links: List[dict] = []
    for ent in doc["entities"]:
        if not ent.get("named"):
            continue
        tids = sorted(ent["term_ids"])
        if not tids:
            continue
        surface = " ".join(tokens[t]["form"].lower() for t in tids)
        if surface in LINKING_STOPWORDS:
            continue
        begin = tokens[tids[0]]["begin"]
        end = tokens[tids[-1]]["begin"] + tokens[tids[-1]]["len"]
        best = None
        for uri, prior in el_candidates().get(surface, []):
            ctx = [w.lower() for w in
                   uri.rsplit("/", 1)[-1].replace("_", " ").replace(",", " ").split()]
            overlap = sum(1 for w in set(ctx) if w in doc_tokens) / len(set(ctx))
            score = float(prior) * (1.0 + overlap)
            key = (-score, uri)
            if best is None or key < best[0]:
                best = (key, {"begin": begin, "end": end, "uri": uri,
                              "score": score})
        if best:
            links.append(best[1])
    return links


from ..operators.annotate import _merge_links  # noqa: E402  (F5 — one impl)


def distill_gold_page(url: str, text: str) -> Tuple[List[dict], Dict[str, tuple]]:
    """-> (triple rows, mention IRI -> head char span)."""
    doc = annotate_document(text)
    _merge_links(doc, _python_links(doc))
    dist = Distiller(url, text, doc)
    triples = dist.run()
    return triples, dist.mention_heads


def build_spark_graphs(sentence_map: Dict[str, str] | None = None
                       ) -> Dict[str, ConvertedGraph]:
    """-> sentence IRI (file:///eswc.N.ttl/) -> ConvertedGraph for the
    repo pipeline's output on the 8 gold sentences."""
    pages = dict(GOLD_PAGES)
    out: Dict[str, ConvertedGraph] = {}
    for i in range(1, 9):
        gid = f"g{i}"
        sent_iri = f"file:///eswc.{i}.ttl/"
        url = f"http://example.org/gold/{gid}"
        text = pages[gid]
        triples, heads = distill_gold_page(url, text)
        quads = []
        for t in triples:
            o = (("lit", t["object"]) if t.get("object_is_literal")
                 else t["object"])
            quads.append((t["subject"], t["predicate"], o, None))
        graphs = convert(quads, "spark", {sent_iri: text},
                         mention_heads=heads, default_sentence=sent_iri,
                         multi_term="last")
        out[sent_iri] = graphs[sent_iri]
    return out
