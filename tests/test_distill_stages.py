"""Per-stage distillation tests (pure Python, fast): F-stage filters,
copular skip, mention IRIs, fact hashing, PreMOn IRIs, F11, D13."""

from pikes_spark.functions.nlp import annotate_document
from pikes_spark.operators.distill import (
    Distiller, distill_document, premon_class_iri, premon_role_iri)


def _triples(text, url="http://e/t", **kw):
    return Distiller(url, text, annotate_document(text), **kw).run()


def test_copular_be_kept_without_coref():
    # RDFGenerator.java:533-567: the copular skip fires ONLY when the
    # A1/A2 heads corefer; otherwise the copula stays a normal frame
    # (cf. gold.5 ':is a pb:be.01 ; pb:a1 :group ; pb:a2 :offshoot')
    trips = _triples("Blatter became president of FIFA in 1998.")
    events = [t for t in trips if t["object"].endswith("sem/Event")]
    become = [t["subject"] for t in events if "become" in t["subject"]]
    assert become
    # A1/A2 role edges connect the copula's arguments
    roles = [t for t in trips if "become.01@arg" in t["predicate"]]
    assert any(t["predicate"].endswith("arg1") for t in roles)
    assert any(t["predicate"].endswith("arg2")
               and t["object"].endswith("#president") for t in roles)


def test_mention_iri_scheme():
    text = "Bono visited Paris."
    trips = _triples(text, url="http://e/m")
    anchors = {t["subject"]: t["object"] for t in trips
               if t["predicate"].endswith("anchorOf")}
    # contiguous mention: #char=b,e and anchor == text slice
    for iri, anchor in anchors.items():
        assert "#char=" in iri
        b, e = iri.split("#char=")[1].split(",")[:2]
        if ";" not in iri:
            assert text[int(b):int(e)] == anchor


def test_fact_graph_reification():
    trips = _triples("Bono visited Paris.")
    fact_graphs = {t["graph"] for t in trips if t["graph"]}
    assert fact_graphs and all(g.startswith("fact:") for g in fact_graphs)
    expressed = [t for t in trips if t["predicate"].endswith("expressedBy")]
    assert expressed and all(t["subject"].startswith("fact:") for t in expressed)


def test_premon_iris():
    assert premon_class_iri("propbank", "cost.01") == \
        "http://premon.fbk.eu/resource/pb17-cost.01"
    assert premon_role_iri("propbank", "cost.01", "A1") == \
        "http://premon.fbk.eu/resource/pb17-cost.01@arg1"
    assert premon_role_iri("nombank", "aid.01", "AM-LOC") == \
        "http://premon.fbk.eu/resource/nb10-aid.01@argloc"
    # VN/FN role names keep their case (gold FEs like Participant_1)
    assert premon_role_iri("verbnet", "cost-54.2", "Value") == \
        "http://premon.fbk.eu/resource/vb32-cost-54.2@Value"


def test_f11_strict_rolesets():
    text = "The zorgle blorfed the fnarp."  # unknown roleset blorf.01
    loose = _triples(text)
    strict = _triples(text, strict_rolesets=True)
    loose_pb = [t for t in loose if t["component"] == "type_pb"]
    strict_pb = [t for t in strict if t["component"] == "type_pb"]
    assert loose_pb and not strict_pb


def test_f3_entity_overlap_removal():
    # 'March 2002' timex overlaps any entity on the same tokens
    trips = _triples("They met in March 2002.")
    ents = [t for t in trips if t["component"] == "type_entity"]
    # no entity typed over the timex span
    assert not any("2002" in t["subject"] for t in ents)


def test_f8_value_normalization():
    trips = _triples("It cost $5 billion.")
    cur = [t for t in trips if t["predicate"].endswith("hasCurrencyValue")]
    assert cur and cur[0]["object"] == "5000000000"
    assert any(t["predicate"].endswith("hasCurrency") and t["object"] == "USD"
               for t in trips)


def test_d13_compaction(spark):
    from pikes_spark.operators.compaction import compact_fact_graphs
    rows = [
        ("u1", "s1", "p", "o", "fact:a", "instance"),
        ("u1", "s1", "p", "o", "fact:b", "instance"),  # same stmt, diff graph
        ("u1", "s2", "p", "o2", "fact:c", "instance"),
        ("u1", "m", "ks:expressedBy", "x", "", "mention_link"),
    ]
    df = spark.createDataFrame(
        rows, "url string, subject string, predicate string, object string, "
              "graph string, component string")
    out = compact_fact_graphs(df).collect()
    fact_rows = [r for r in out if r["graph"]]
    # the two identical statement-sets collapse to ONE graph id
    graphs = {r["graph"] for r in fact_rows if r["subject"] == "s1"}
    assert len(graphs) == 1
    assert len([r for r in fact_rows if r["subject"] == "s1"]) == 1
    # default-graph rows untouched
    assert any(r["graph"] == "" for r in out)
