"""Pluggable batched-model contract (SURVEY §7 milestone 5).

The NLP front-end's POS layer is a SLOT: by default the deterministic
rule tagger runs (tokenize.tag_tokens), but any batched model with the
``BatchTagger`` signature can be registered and the whole pipeline —
including the Spark mapInPandas/mapInArrow operators, which call
``annotate_document`` per Arrow batch — picks it up without any other
code change. This is the stub/real isolation the reference gets from
its annotator interface (eu.fbk.dkm.pikes.tintop's pluggable Stanford
pipeline annotators): models are per-worker singletons, loaded once
per Python worker and reused across batches.

Contract:
  tag(sentences) -> per-sentence Penn tag lists, same shapes as the
  input token-form lists. Implementations MUST be batch-vectorized —
  the caller hands over all sentences of a document at once, and on
  Spark executors consecutive documents reuse the same instance (the
  Arrow-batch slot; never per-token Python in the hot path).

``OnnxTagger`` is the real-model reference implementation: a
token-classification ONNX graph (inputs ``input_ids`` int64
[batch, seq], output ``logits`` [batch, seq, n_tags]) plus a vocab
file (token per line) and a labels file (Penn tag per line). It is
import-guarded — onnxruntime is not in this container — and covered
by an opt-in test that skips when the runtime or a model file is
absent (tests/test_model_slot.py).
"""

from __future__ import annotations

from typing import List, Optional, Protocol


class BatchTagger(Protocol):
    def tag(self, sentences: List[List[str]]) -> List[List[str]]:
        """token-form lists -> Penn tag lists (same shapes)."""


_ACTIVE: Optional[BatchTagger] = None


def register_tagger(tagger: Optional[BatchTagger]) -> None:
    """Install a batched POS model for the whole process (executor
    worker); None restores the rule tagger."""
    global _ACTIVE
    _ACTIVE = tagger


def active_tagger() -> Optional[BatchTagger]:
    return _ACTIVE


class OnnxTagger:
    """Token-classification ONNX model behind the BatchTagger contract
    (see module docstring for the expected graph/vocab/labels format).
    Raises ImportError when onnxruntime is unavailable."""

    def __init__(self, model_path: str, vocab_path: str,
                 labels_path: str, max_len: int = 256,
                 unk_id: int = 0):
        import onnxruntime  # noqa: F401 — hard dependency of this impl
        import numpy as np
        self._np = np
        self._sess = onnxruntime.InferenceSession(
            model_path, providers=["CPUExecutionProvider"])
        with open(vocab_path, encoding="utf-8") as fh:
            self._vocab = {w.rstrip("\n"): i for i, w in enumerate(fh)}
        with open(labels_path, encoding="utf-8") as fh:
            self._labels = [ln.rstrip("\n") for ln in fh if ln.strip()]
        self._max_len = max_len
        self._unk = unk_id

    def tag(self, sentences: List[List[str]]) -> List[List[str]]:
        np = self._np
        if not sentences:
            return []
        width = min(self._max_len, max(len(s) for s in sentences))
        ids = np.zeros((len(sentences), width), dtype=np.int64)
        for i, sent in enumerate(sentences):
            for j, form in enumerate(sent[:width]):
                ids[i, j] = self._vocab.get(form.lower(), self._unk)
        logits = self._sess.run(None, {"input_ids": ids})[0]
        pred = logits.argmax(axis=-1)
        out: List[List[str]] = []
        for i, sent in enumerate(sentences):
            tags = [self._labels[pred[i, j]] if j < width else "NN"
                    for j in range(len(sent))]
            out.append(tags)
        return out
