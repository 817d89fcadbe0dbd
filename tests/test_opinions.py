"""F19/D8 opinion extraction + distillation (functions/opinions.py,
distill.process_opinions, operators/sentiment.py): lexicon parser
fidelity to the MPQA clues format, dependency rules for expression /
holder / target / negation, D8 triple shape per
RDFGenerator.java:1393-1467, and the reference-default OFF gate."""

from pikes_spark.functions.deptree import DepGraph
from pikes_spark.functions.nlp import annotate_document
from pikes_spark.functions.opinions import (extract_opinions,
                                            parse_subjectivity_lexicon,
                                            subjectivity_lexicon)
from pikes_spark.operators.distill import Distiller


def _distill(text, emit_opinions=None):
    doc = annotate_document(text)
    doc["corefs"] = [{"id": c["id"], "spans": [list(s) for s in c["spans"]]}
                     for c in doc["corefs"]]
    d = Distiller("http://e/x", text, doc, "en",
                  emit_opinions=emit_opinions)
    return d.run()


def _opinions(text):
    doc = annotate_document(text)
    graph = DepGraph([(d["from"], d["to"], d["rfunc"])
                      for d in doc["deps"]])
    return extract_opinions(doc["tokens"], doc["terms"], graph), doc


def test_lexicon_parser_mpqa_format():
    """SubjectivityLexicon.index fidelity: key=value tokens, pos
    mapping adj->G / adverb->A / noun->N / verb->V, weakneg->negative,
    strong from type."""
    lex = parse_subjectivity_lexicon(
        "type=strongsubj len=1 word1=abuse pos1=verb stemmed1=y "
        "priorpolarity=negative\n"
        "type=weaksubj len=1 word1=able pos1=adj stemmed1=n "
        "priorpolarity=weakneg\n"
        "type=weaksubj len=1 word1=ably pos1=adverb stemmed1=n "
        "priorpolarity=positive\n"
        "type=weaksubj len=1 word1=aid pos1=anypos stemmed1=n "
        "priorpolarity=positive\n"
        "garbage line without equals\n")
    assert lex[("abuse", "V")] == ("negative", True)
    assert lex[("able", "G")] == ("negative", False)  # weakneg
    assert lex[("ably", "A")] == ("positive", False)
    assert lex[("aid", None)] == ("positive", False)
    assert len(lex) == 4


def test_experiencer_verb_holder_and_target():
    ops, doc = _opinions("The officials feared the attack on the city.")
    fear = next(o for o in ops
                if doc["terms"][o["head_id"]]["lemma"] == "fear")
    assert fear["polarity"] == "negative"
    holder_lemmas = {doc["terms"][i]["lemma"] for i in fear["holder_ids"]}
    target_lemmas = {doc["terms"][i]["lemma"] for i in fear["target_ids"]}
    assert "official" in holder_lemmas
    assert "attack" in target_lemmas


def test_speech_verb_holder():
    ops, doc = _opinions("Maria said the plan was good for Iraq.")
    good = next(o for o in ops
                if doc["terms"][o["head_id"]]["lemma"] == "good")
    assert good["polarity"] == "positive"
    holder = {doc["terms"][i]["lemma"].lower() for i in good["holder_ids"]}
    assert "maria" in holder


def test_predicative_adjective_targets_copular_subject():
    ops, doc = _opinions("The plan was good.")
    good = next(o for o in ops
                if doc["terms"][o["head_id"]]["lemma"] == "good")
    assert any(doc["terms"][i]["lemma"] == "plan"
               for i in good["target_ids"])


def test_negation_flips_polarity():
    ops, doc = _opinions("The plan was not good.")
    good = next(o for o in ops
                if doc["terms"][o["head_id"]]["lemma"] == "good")
    assert good["polarity"] == "negative"
    ops2, doc2 = _opinions("The plan was good.")
    good2 = next(o for o in ops2
                 if doc2["terms"][o["head_id"]]["lemma"] == "good")
    assert good2["polarity"] == "positive"


def test_attributive_adjective_targets_noun():
    ops, doc = _opinions("They fought a terrible war.")
    ter = next(o for o in ops
               if doc["terms"][o["head_id"]]["lemma"] == "terrible")
    assert any(doc["terms"][i]["lemma"] == "war"
               for i in ter["target_ids"])


def test_d8_triples_shape_and_default_off():
    text = "The officials feared the attack."
    on = _distill(text, emit_opinions=True)
    ops = [t for t in on if t["component"] == "opinion"]
    ks = "http://dkm.fbk.eu/ontologies/knowledgestore#"
    types = {t["object"] for t in ops
             if t["predicate"].endswith("#type")}
    assert ks + "Opinion" in types
    assert ks + "NegativeOpinion" in types
    assert "http://www.ontologyportal.org/SUMO.owl#Entity" in types
    props = {t["predicate"] for t in ops}
    assert ks + "expression" in props
    assert ks + "holder" in props and ks + "target" in props
    labels = [t for t in ops if t["predicate"].endswith("label")]
    assert labels and labels[0]["object_is_literal"]
    # reference default: no raid stage -> no opinion triples
    off = _distill(text)
    assert not [t for t in off if t["component"] == "opinion"]
    # and the rest of the graph is unchanged by the flag
    key = lambda ts: sorted(  # noqa: E731
        (t["subject"], t["predicate"], t["object"]) for t in ts
        if t["component"] != "opinion")
    assert key(on) == key(off)


def test_sentiment_lexicon_collapse_deterministic():
    from pikes_spark.operators.sentiment import sentiment_lexicon_rows
    rows = sentiment_lexicon_rows()
    assert rows == sorted(rows)
    words = [w for w, _ in rows]
    assert len(words) == len(set(words))
    d = dict(rows)
    assert d["good"] == 2 and d["bad"] == -2
    assert d["simple"] == 1 and d["concern"] == -1
    # every lexicon surface form survives the collapse
    lex_words = {w for (w, _p) in subjectivity_lexicon()
                 if subjectivity_lexicon()[(w, _p)][0] != "neutral"}
    assert set(words) == lex_words
