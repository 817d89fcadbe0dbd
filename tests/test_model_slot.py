"""Pluggable batched-model contract (functions/model_slot.py): the
rule tagger is the default, a registered BatchTagger takes over the
POS layer end-to-end (through annotate_document and the Spark
operators), and the real ONNX implementation loads when the runtime +
a model file are present (skipped otherwise)."""

import os

import pytest

from pikes_spark.functions import model_slot
from pikes_spark.functions.nlp import annotate_document


class _RecordingRuleTagger:
    """Deterministic fake model: replays the rule tagger's output but
    records the batch shapes — proves the slot is exercised and that
    calls arrive BATCHED (per-sentence lists, one call per document)."""

    def __init__(self):
        self.calls = []

    def tag(self, sentences):
        from pikes_spark.functions import tokenize as T
        self.calls.append([len(s) for s in sentences])
        out = []
        for sent in sentences:
            text = " ".join(sent)
            toks = T.tokenize_sentence(text, 0, len(text), 0, 0)
            out.append([g.morphofeat for g in T.tag_tokens(toks)][:len(sent)])
        return out


class _AllNounTagger:
    def tag(self, sentences):
        return [["NN"] * len(s) for s in sentences]


@pytest.fixture
def slot():
    yield
    model_slot.register_tagger(None)


def test_registered_model_drives_pipeline(slot):
    tagger = _AllNounTagger()
    model_slot.register_tagger(tagger)
    doc = annotate_document("Bush met supporters in Paris.")
    # with every token forced NN, no NNP run exists -> no named entity
    assert not [e for e in doc["entities"] if e.get("named")]
    model_slot.register_tagger(None)
    doc2 = annotate_document("Bush met supporters in Paris.")
    assert [e for e in doc2["entities"] if e.get("named")]


def test_batched_call_shape(slot):
    tagger = _RecordingRuleTagger()
    model_slot.register_tagger(tagger)
    annotate_document("Bush met supporters. They signed an agreement.")
    # ONE batched call per document, one entry per sentence
    assert len(tagger.calls) == 1
    assert len(tagger.calls[0]) == 2


def test_onnx_tagger_real_model(slot):
    onnxruntime = pytest.importorskip("onnxruntime")  # noqa: F841
    model = os.environ.get("PIKES_POS_ONNX")
    if not model or not os.path.exists(model):
        pytest.skip("no $PIKES_POS_ONNX model file")
    tagger = model_slot.OnnxTagger(
        model, model + ".vocab", model + ".labels")
    model_slot.register_tagger(tagger)
    doc = annotate_document("Bush met supporters in Paris.")
    assert doc["tokens"]
