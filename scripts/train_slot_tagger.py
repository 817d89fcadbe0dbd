"""Train the NumpyTagger artifact for the pluggable POS model slot —
deterministic, generated entirely in-repo (no download).

The model is a hashed-feature naive-Bayes tagger (the 7 features in
``model_slot.hashed_features``): one pass of count accumulation with
``np.add.at`` over supervision produced by the deterministic rule
tagger on the local testdata corpus, then per-feature log-probs plus
tag log-priors. It exists to EXECUTE the "swap rule model for neural
model" slot end-to-end in this sandbox (onnxruntime absent), not to
beat the rule tagger — agreement with its own supervision on held-out
documents is the quality gate (tests/test_model_slot.py).

Usage: python scripts/train_slot_tagger.py [out.npz] [sf_dir] [n_docs]
Importable: ``train_from_texts(texts, out_path)``.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from pikes_spark.functions.model_slot import (_FEAT_DIM,  # noqa: E402
                                              hashed_features)
from pikes_spark.functions.tokenize import (split_sentences,  # noqa: E402
                                            tag_tokens, tokenize_sentence)


def _rule_tagged_sentences(text: str):
    """(forms, penn_tags) per sentence, from the rule tagger."""
    sents = split_sentences(text)
    tokens = []
    for s_idx, (b, e) in enumerate(sents):
        tokens.extend(tokenize_sentence(text, b, e, s_idx, len(tokens)))
    tagged = tag_tokens(tokens)
    out = []
    for s_idx in range(len(sents)):
        forms = [t.form for t in tokens if t.sent == s_idx]
        tags = [tg.morphofeat for t, tg in zip(tokens, tagged)
                if t.sent == s_idx]
        if forms:
            out.append((forms, tags))
    return out


def train_from_texts(texts, out_path: str) -> dict:
    """Accumulate feature-tag counts over the rule tagger's output and
    save the npz artifact; returns {'n_tokens', 'labels'}."""
    labels: list = []
    lab_id: dict = {}
    feat_rows: list = []
    tag_rows: list = []
    for text in texts:
        for forms, tags in _rule_tagged_sentences(text):
            for j, tag in enumerate(tags):
                if tag not in lab_id:
                    lab_id[tag] = len(labels)
                    labels.append(tag)
                feat_rows.append(hashed_features(forms, j))
                tag_rows.append(lab_id[tag])
    f = np.asarray(feat_rows, dtype=np.int64)          # [n_tok, 7]
    t = np.asarray(tag_rows, dtype=np.int64)           # [n_tok]
    n_tags = len(labels)
    counts = np.zeros((_FEAT_DIM, n_tags), dtype=np.float64)
    np.add.at(counts, (f.ravel(), np.repeat(t, f.shape[1])), 1.0)
    tag_counts = np.bincount(t, minlength=n_tags).astype(np.float64)
    # per-feature log P(f|tag) with Laplace smoothing; prior log P(tag)
    alpha = 0.1
    w = np.log(counts + alpha) - np.log(tag_counts + alpha * _FEAT_DIM)
    prior = np.log(tag_counts + 1.0) - np.log(tag_counts.sum() + n_tags)
    np.savez_compressed(out_path if out_path.endswith(".npz")
                        else out_path + ".npz",
                        w=w.astype(np.float32),
                        prior=prior.astype(np.float32),
                        labels=np.asarray(labels))
    return {"n_tokens": int(t.size), "labels": labels}


def main() -> None:
    import duckdb
    out = sys.argv[1] if len(sys.argv) > 1 else "pos_slot.npz"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    n_docs = int(sys.argv[3]) if len(sys.argv) > 3 else 400
    texts = [r[0] for r in duckdb.sql(
        f"SELECT text FROM '{sf_dir}/documents.parquet' "
        f"ORDER BY doc_id LIMIT {n_docs}").fetchall()]
    # the synthetic corpus is a ~30-word template vocabulary; mix in
    # the repo's real-prose corpora (gold + held-out sentences) so the
    # model sees the full tag inventory
    from pikes_spark.sources.gold import GOLD_PAGES
    texts += [t for _, t in GOLD_PAGES]
    try:
        from pikes_spark.eval.heldout import HELDOUT, HELDOUT_TEST
        texts += [row[1] for row in list(HELDOUT) + list(HELDOUT_TEST)]
    except Exception:
        pass
    info = train_from_texts(texts, out)
    print(f"trained on {info['n_tokens']} tokens, "
          f"{len(info['labels'])} tags -> {out}")


if __name__ == "__main__":
    main()
