"""BPE tokenizer training and encoding over the word-frequency table.

The step every LLM pipeline runs after cleaning: learn byte-pair-
encoding merges (Sennrich et al. 2016) and encode the corpus with
them. The scale split mirrors every production trainer
(SentencePiece, HuggingFace tokenizers): the CORPUS-scale work is the
word-frequency count — one map-side-combined groupBy over 100 TB of
text — while the merge loop itself runs over the AGGREGATED table,
whose size is the vocabulary (10^5-10^6 rows at web scale, Zipf-
bounded), not the corpus. Training on the counts table is exact:
BPE's pair statistics are a linear function of word frequencies, so
no information is lost by aggregating first.

Encoding is distributed the same way: the learned merges apply to
DISTINCT words once (a vocabulary-sized mapInPandas), and the
word->pieces map broadcast-joins back to the token stream — no
per-token Python, and the document text never rides a shuffle.

Determinism: merge selection is (pair frequency DESC, left ASC,
right ASC) — a total order over integer counts, so the merge table
is a pure function of the corpus and safe to freeze as a VALUES
oracle (scripts/refreeze_corpus_stats.py).
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

_EOW = "</w>"       # end-of-word marker (Sennrich convention)
_N_MERGES = 24      # synthetic corpus has a 31-word vocabulary;
# 24 leaves post-merge multi-piece words so the encode check is
# non-trivial (real trainers run 10^4-10^5 merges — same loop)


def word_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(token, freq) over the whole corpus — the distributed step.

    Scale shape: explode + groupBy with map-side partial aggregation;
    each partition collapses to its distinct tokens before the
    exchange, so the shuffle carries vocabulary-sized data."""
    from .dedup import _documents
    from .textstats import _tokens
    docs = _documents(spark, sf_dir)
    return (docs.select(F.explode(_tokens(F.col("text"))).alias("token"))
            .filter(F.length("token") > 0)
            .groupBy("token").agg(F.count("*").alias("freq")))


# Driver-pull bounds (VERDICT r4 finding 4): a 100 TB crawl's junk-token
# tail (hashes, base64, URLs) makes the DISTINCT-word table unbounded, so
# the collect below must be capped the way real trainers cap it —
# SentencePiece/HF both cut by min frequency and/or top-V before the merge
# loop. (freq DESC, token ASC) is a total order, so the cut is
# deterministic; on the frozen corpus (no hapaxes, 31-word vocabulary)
# neither bound fires and the frozen merge oracle is unchanged.
_MAX_VOCAB = 65_536
_MIN_FREQ = 2


def cap_vocab(wf: DataFrame, max_vocab: int = _MAX_VOCAB,
              min_freq: int = _MIN_FREQ) -> DataFrame:
    """Bound a (token, freq) table to the training vocabulary: filter
    to freq >= min_freq, keep the top max_vocab by (freq DESC, token
    ASC). The limit compiles to TakeOrderedAndProject (per-partition
    top-V, merged on the driver), not a global sort."""
    return (wf.filter(F.col("freq") >= min_freq)
            .orderBy(F.col("freq").desc(), F.col("token").asc())
            .limit(max_vocab))


def collect_vocab(spark: SparkSession, sf_dir: str,
                  max_vocab: int = _MAX_VOCAB,
                  min_freq: int = _MIN_FREQ) -> List[Tuple[str, int]]:
    """BOUNDED driver pull of the training vocabulary — the driver
    never holds more than max_vocab rows regardless of corpus size."""
    top = cap_vocab(word_freq(spark, sf_dir), max_vocab, min_freq)
    return [(r["token"], r["freq"]) for r in top.collect()]


def _pair_counts(vocab: Dict[Tuple[str, ...], int]) -> Dict[Tuple[str, str], int]:
    pairs: Dict[Tuple[str, str], int] = {}
    for sym, f in vocab.items():
        for a, b in zip(sym, sym[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + f
    return pairs


def _merge_word(sym: Tuple[str, ...], pair: Tuple[str, str]) -> Tuple[str, ...]:
    """Replace non-overlapping occurrences of pair, left to right."""
    out: List[str] = []
    i, n = 0, len(sym)
    a, b = pair
    while i < n:
        if i + 1 < n and sym[i] == a and sym[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def train_merges(freqs: List[Tuple[str, int]],
                 n_merges: int = _N_MERGES) -> List[Tuple[int, str, str, int]]:
    """The merge loop over the aggregated (word, freq) table —
    driver-side by design (see module docstring). Returns
    [(rank, left, right, pair_freq)] with rank starting at 1."""
    vocab: Dict[Tuple[str, ...], int] = {}
    for w, f in freqs:
        sym = tuple(w) + (_EOW,)
        vocab[sym] = vocab.get(sym, 0) + f
    merges: List[Tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        pairs = _pair_counts(vocab)
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), f = best
        merges.append((rank, a, b, f))
        vocab = {_merge_word(s, (a, b)): fr for s, fr in vocab.items()}
    return merges


def apply_merges(word: str,
                 merges: List[Tuple[int, str, str, int]]) -> List[str]:
    """Encode one word: apply merges in rank order (the standard
    greedy-by-rank BPE segmenter)."""
    sym: Tuple[str, ...] = tuple(word) + (_EOW,)
    for _, a, b, _ in merges:
        if len(sym) < 2:
            break
        sym = _merge_word(sym, (a, b))
    return list(sym)


def bpe_train(spark: SparkSession, sf_dir: str,
              n_merges: int = _N_MERGES) -> DataFrame:
    """Driver query: the learned merge table (rank, lhs, rhs,
    pair_freq), ordered by rank. (lhs/rhs, not left/right — those
    are SQL keywords and would break the VALUES oracle.)"""
    freqs = collect_vocab(spark, sf_dir)
    merges = train_merges(sorted(freqs), n_merges)
    return spark.createDataFrame(
        merges, "rank int, lhs string, rhs string, pair_freq bigint"
    ).orderBy("rank")


def _encode_words(spark: SparkSession, words: DataFrame,
                  merges: List[Tuple[int, str, str, int]]) -> DataFrame:
    """word -> (word, n_pieces, pieces) for DISTINCT words, via an
    Arrow-batched mapInPandas over the broadcast merge list."""
    sc = spark.sparkContext
    bc = sc.broadcast(merges)

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ms = bc.value
        for pdf in batches:
            pieces = [apply_merges(w, ms) for w in pdf["token"]]
            yield pd.DataFrame({
                "token": pdf["token"],
                "n_pieces": [len(p) for p in pieces],
                "pieces": ["|".join(p) for p in pieces]})

    return words.mapInPandas(
        enc, "token string, n_pieces int, pieces string")


def bpe_encode_stats(spark: SparkSession, sf_dir: str,
                     n_merges: int = _N_MERGES) -> DataFrame:
    """Driver query: corpus-level digest of the full BPE encode —
    (n_docs, n_distinct_words, sum_pieces, checksum). The checksum
    bit_xor's xxhash64(doc_id:n_pieces) over documents (order-
    insensitive, overflow-free), so it pins the PER-DOCUMENT piece
    counts, not just the global total.

    Scale shape: encode runs once per distinct word; the token
    stream joins the (vocabulary-sized, broadcast) word->n_pieces
    map; per-doc sums partial-aggregate map-side."""
    from .dedup import _documents
    from .textstats import _tokens
    # one (token, freq) aggregation feeds the bounded training pull,
    # the encode vocabulary and its count — it was recomputed from the
    # corpus for each of the three
    wf = word_freq(spark, sf_dir).localCheckpoint()
    freqs = [(r["token"], r["freq"])
             for r in cap_vocab(wf).collect()]
    merges = train_merges(sorted(freqs), n_merges)
    words = wf.select("token")
    n_words = words.count()  # encode vocabulary (uncapped distinct words)
    enc = F.broadcast(_encode_words(spark, words, merges)
                      .select("token", "n_pieces"))
    docs = _documents(spark, sf_dir)
    toks = (docs.select("doc_id",
                        F.explode(_tokens(F.col("text"))).alias("token"))
            .filter(F.length("token") > 0))
    per_doc = (toks.join(enc, "token")
               .groupBy("doc_id")
               .agg(F.sum("n_pieces").cast("bigint").alias("np")))
    return (per_doc
            .withColumn("h", F.xxhash64(F.concat_ws(
                ":", F.col("doc_id").cast("string"),
                F.col("np").cast("string"))))
            .agg(F.count("*").cast("bigint").alias("n_docs"),
                 F.lit(n_words).cast("bigint").alias("n_words"),
                 F.sum("np").cast("bigint").alias("sum_pieces"),
                 F.expr("bit_xor(h)").alias("checksum")))
