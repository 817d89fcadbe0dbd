"""NAF XML debug export (S2's optional dump, SURVEY §2.1): structural
differential backing the frozen kg_naf_export oracle — the XML must be
well-formed, offsets/forms must round-trip against the raw text, and
every annotation layer must survive serialization count-for-count."""

import xml.etree.ElementTree as ET

from pikes_spark.functions.naf_xml import doc_to_naf
from pikes_spark.functions.nlp import annotate_document
from pikes_spark.sources.gold import GOLD_PAGES


def _row(url, text):
    doc = annotate_document(text)
    doc = dict(doc)
    doc["url"], doc["lang"] = url, "en"
    doc["text"] = text
    doc["corefs"] = [{"id": c["id"], "spans": [{"ids": s}
                                               for s in c["spans"]]}
                     for c in doc["corefs"]]
    return doc


def test_naf_well_formed_and_layers_roundtrip():
    for gid, text in GOLD_PAGES:
        row = _row(f"http://example.org/gold/{gid}", text)
        xml = doc_to_naf(row)
        root = ET.fromstring(xml)
        assert root.tag == "NAF" and root.get("version") == "v3"
        # raw CDATA preserves the text byte-for-byte
        assert root.find("raw").text == text
        # every layer count survives
        assert len(root.findall("text/wf")) == len(row["tokens"])
        assert len(root.findall("terms/term")) == len(row["terms"])
        assert len(root.findall("deps/dep")) == len(row["deps"])
        assert len(root.findall("entities/entity")) == len(row["entities"])
        assert len(root.findall("srl/predicate")) == len(row["predicates"])
        assert (len(root.findall("coreferences/coref"))
                == len(row["corefs"]))
        # wf offsets and forms round-trip against the raw text
        for wf in root.findall("text/wf"):
            b, ln = int(wf.get("offset")), int(wf.get("length"))
            assert text[b:b + ln] == wf.text
        # role counts survive per predicate
        n_roles_xml = len(root.findall("srl/predicate/role"))
        n_roles = sum(len(p["roles"]) for p in row["predicates"])
        assert n_roles_xml == n_roles


def test_naf_escaping_and_cdata_edge():
    text = 'He said "A & B" <loudly> and typed ]]> too.'
    row = _row("http://example.org/esc", text)
    xml = doc_to_naf(row)
    root = ET.fromstring(xml)  # must stay well-formed
    assert root.find("raw").text == text
    forms = [wf.text for wf in root.findall("text/wf")]
    assert '"A' in forms or "&" in forms  # escaped forms parse back


def test_naf_determinism():
    _, text = GOLD_PAGES[0]
    row = _row("http://example.org/det", text)
    assert doc_to_naf(row) == doc_to_naf(dict(row))


def test_naf_spark_operator(spark):
    """annotations_to_naf end-to-end: one NAF per gold page, parseable,
    with the page's own token count."""
    from pikes_spark.operators.annotate import (annotate_pages,
                                                annotations_to_naf)
    from pikes_spark.sources.gold import gold_pages_df
    ann = annotate_pages(gold_pages_df(spark))
    out = {r["url"]: r["naf"]
           for r in annotations_to_naf(ann).collect()}
    n_tok = {r["url"]: len(r["tokens"])
             for r in ann.select("url", "tokens").collect()}
    assert set(out) == set(n_tok)
    for url, xml in out.items():
        root = ET.fromstring(xml)
        assert len(root.findall("text/wf")) == n_tok[url]
