"""F17 corefSpanFixing + F18 corefForRoleDependencies tests
(NAFFilter.java:784-983 semantics; off by default like the reference)."""

import pytest

import pikes_spark.functions.coref_fixes as cf
from pikes_spark.functions.nlp import annotate_document
from pikes_spark.functions.resource_loaders import nombank_index


def _with_flags(text, span_fixing=False, role_deps=False):
    cf.ENABLE_COREF_SPAN_FIXING = span_fixing
    cf.ENABLE_COREF_ROLE_DEPS = role_deps
    try:
        return annotate_document(text)
    finally:
        cf.ENABLE_COREF_SPAN_FIXING = False
        cf.ENABLE_COREF_ROLE_DEPS = False


def test_defaults_off_match_reference():
    assert cf.ENABLE_COREF_SPAN_FIXING is False
    assert cf.ENABLE_COREF_ROLE_DEPS is False


def test_f17_splits_nameless_cluster_by_sentence():
    # two they-clusters across sentences, no proper-noun head: F17
    # splits per sentence (NAFFilter.java:869-884), dropping singletons
    text = ("The donors sent money and they agreed. "
            "The workers arrived and they left.")
    base = _with_flags(text)
    fixed = _with_flags(text, span_fixing=True)
    for co in fixed["corefs"]:
        sents = {base["tokens"][sp[0]]["sent"] for sp in co["spans"]}
        assert len(sents) == 1  # no cross-sentence nameless clusters


def test_f17_keeps_proper_noun_clusters():
    text = "Bashar al-Assad hopes to remain. Bashar al-Assad said so."
    fixed = _with_flags(text, span_fixing=True)
    # exact-name coref across sentences survives (has proper-noun head)
    assert any(len(co["spans"]) >= 2 for co in fixed["corefs"])


def test_f18_adds_cluster_for_role_dependency():
    if nombank_index() is None:
        pytest.skip("NomBank breadth not available")
    # direct unit test (the end-to-end path overlaps the title sieve):
    # NMOD(name NNP -> role NN) where the role has a pred-filled
    # NomBank roleset -> new cluster; with corefs emptied first so the
    # link can only come from F18
    from pikes_spark.functions.deptree import DepGraph
    doc = {
        "tokens": [{"id": 0, "sent": 0}, {"id": 1, "sent": 0},
                   {"id": 2, "sent": 0}],
        "terms": [
            {"id": 0, "morphofeat": "NNP", "refs": []},     # Smith
            {"id": 1, "morphofeat": "NN", "refs": []},      # president
            {"id": 2, "morphofeat": "VBD", "refs": []},     # spoke
        ],
        # deps are head->dependent: "president Smith" heads at the
        # name, with the role noun as its NMOD dependent
        "deps": [{"from": 0, "to": 1, "rfunc": "NMOD"},
                 {"from": 2, "to": 0, "rfunc": "SUB"}],
        "predicates": [{"id": "p1", "head_id": 1, "term_ids": [1],
                        "refs": [{"resource": "NomBank",
                                  "reference": "president.01"}],
                        "roles": []}],
        "corefs": [],
    }
    graph = DepGraph([(d["from"], d["to"], d["rfunc"])
                      for d in doc["deps"]])
    cf.coref_for_role_dependencies(doc, graph)
    assert any(any(0 in sp for sp in co["spans"])
               and any(1 in sp for sp in co["spans"])
               for co in doc["corefs"])
    # a NON-role nominal (no pred-filled args) must NOT cluster
    doc2 = {**doc, "corefs": [],
            "predicates": [{"id": "p1", "head_id": 1, "term_ids": [1],
                            "refs": [{"resource": "NomBank",
                                      "reference": "battle.01"}],
                            "roles": []}]}
    cf.coref_for_role_dependencies(doc2, graph)
    assert doc2["corefs"] == []
