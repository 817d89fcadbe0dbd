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
from zlib import crc32


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


# ---------------------------------------------------------------------------
# NumpyTagger — the real-model path that EXECUTES in this sandbox.
#
# onnxruntime is not installed here, so the OnnxTagger below can never
# run in CI; this class makes the slot contract a tested fact instead
# of a design claim (round-4 verdict item 8): a genuinely LEARNED
# statistical model (hashed-feature naive Bayes, trained by
# scripts/train_slot_tagger.py — deterministic, generated in-repo, no
# download) executing batched numpy inference behind the identical
# BatchTagger contract the ONNX path uses. Swap = register_tagger().
# ---------------------------------------------------------------------------

_FEAT_DIM = 1 << 16  # hashed feature space


def _token_shape(form: str) -> str:
    """Collapsed character-class shape: 'Al-Qaeda' -> 'Xx-Xx'."""
    out = []
    for ch in form:
        c = ("X" if ch.isupper() else "x" if ch.islower()
             else "d" if ch.isdigit() else ch)
        if not out or out[-1] != c:
            out.append(c)
    return "".join(out)


def hashed_features(sentence: List[str], j: int) -> List[int]:
    """The 7 hashed lexical/context features of token j — the single
    source of truth shared by training (scripts/train_slot_tagger.py)
    and inference (NumpyTagger.tag)."""
    form = sentence[j]
    low = form.lower()
    prev = sentence[j - 1].lower() if j > 0 else "<s>"
    nxt = sentence[j + 1].lower() if j + 1 < len(sentence) else "</s>"
    keys = ("W:" + low, "S3:" + low[-3:], "S2:" + low[-2:],
            "P1:" + form[:1], "SH:" + _token_shape(form),
            "PW:" + prev, "NW:" + nxt)
    return [crc32(k.encode("utf-8")) % _FEAT_DIM for k in keys]


class NumpyTagger:
    """Learned hashed-feature tagger behind the BatchTagger contract.

    Artifact (``.npz``, written by scripts/train_slot_tagger.py):
      ``w``      float32 [_FEAT_DIM, n_tags] — per-feature log-probs
      ``prior``  float32 [n_tags]            — tag log-priors
      ``labels`` unicode [n_tags]            — Penn tags

    Inference is batch-vectorized: one fancy-index gather + sum over
    the feature axis + argmax for ALL tokens of all sentences at once
    (no per-token model call) — the same batching contract OnnxTagger
    promises over its ONNX session.
    """

    def __init__(self, npz_path: str):
        import numpy as np
        self._np = np
        data = np.load(npz_path)
        self._w = data["w"].astype(np.float32)
        self._prior = data["prior"].astype(np.float32)
        self._labels = [str(x) for x in data["labels"]]
        if self._w.shape != (_FEAT_DIM, len(self._labels)):
            raise ValueError(f"weight shape {self._w.shape} does not "
                             f"match ({_FEAT_DIM}, {len(self._labels)})")

    def tag(self, sentences: List[List[str]]) -> List[List[str]]:
        np = self._np
        if not sentences:
            return []
        fids = [hashed_features(sent, j)
                for sent in sentences for j in range(len(sent))]
        if not fids:
            return [[] for _ in sentences]
        f = np.asarray(fids, dtype=np.int64)        # [n_tok, 7]
        scores = self._w[f].sum(axis=1) + self._prior
        pred = scores.argmax(axis=1)
        out: List[List[str]] = []
        k = 0
        for sent in sentences:
            out.append([self._labels[pred[k + j]]
                        for j in range(len(sent))])
            k += len(sent)
        return out


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
