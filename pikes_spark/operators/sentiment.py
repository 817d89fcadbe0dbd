"""Lexicon sentiment scoring over the documents table — the sf-scaled
curation-side face of F19 (functions/opinions.py holds the per-document
dependency extractor; this is the bag-of-words prior-polarity score a
training-data pipeline gates on, same task split the reference makes
between pikes-raid's extractor and SubjectivityLexicon's priors).

Spark plan: tokenize (the shared _tokens contract) -> posexplode with
the token array kept -> broadcast join the collapsed lexicon ->
negation flip from the PRECEDING token read by ARRAY INDEX (no window:
a lag() would shuffle + sort per doc for a value the row already
carries) -> per-doc sum. All integers, so the DuckDB oracle (same
lexicon as a VALUES table, same t[i-1] index) matches hash-exactly.
At 100 TB: the lexicon broadcast is a few KB, and the only exchange is
the map-side-combined aggregate on near-unique doc_id keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.opinions import NEGATORS, subjectivity_lexicon
from .textstats import _tokens


def sentiment_lexicon_rows():
    """(word, weight) rows: ±1 weak / ±2 strong prior polarity,
    collapsed by surface word (deterministic: sorted entries, strongest
    wins, negative breaks weight ties — a conflict-free collapse on the
    shipped lexicon, asserted in tests)."""
    by_word = {}
    for (word, _pos), (polarity, strong) in sorted(
            subjectivity_lexicon().items(),
            key=lambda kv: (kv[0][0], kv[0][1] or "")):
        if polarity == "neutral":
            continue
        w = (2 if strong else 1) * (1 if polarity == "positive" else -1)
        old = by_word.get(word)
        if old is None or (abs(w), -w) > (abs(old), -old):
            by_word[word] = w
    return sorted(by_word.items())


def sentiment_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document lexicon sentiment: subjective-token count, signed
    score (negation-flipped), and a ternary label. The preceding token
    is read by ARRAY INDEX off the kept token array — no per-doc
    window (at 100 TB a lag() window is a shuffle + per-doc sort for
    something the row already knows)."""
    rows = sentiment_lexicon_rows()
    lex = F.broadcast(spark.createDataFrame(rows, "word string, w int"))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = (docs.select("doc_id", _tokens(F.col("text")).alias("t"))
            .select("doc_id", "t",
                    F.posexplode("t").alias("pos", "word")))
    prev = F.when(F.col("pos") > 0,
                  F.element_at("t", F.col("pos")))  # 1-based = pos-1
    flipped = (toks.withColumn("prev", prev)
               .drop("t")
               .join(lex, "word")
               .withColumn("signed",
                           F.when(F.col("prev").isin(*sorted(NEGATORS)),
                                  -F.col("w")).otherwise(F.col("w"))))
    return (flipped.groupBy("doc_id")
            .agg(F.count("*").cast("bigint").alias("n_subjective"),
                 F.sum("signed").cast("bigint").alias("score"))
            .withColumn("label",
                        F.when(F.col("score") > 0, "positive")
                        .when(F.col("score") < 0, "negative")
                        .otherwise("neutral"))
            .orderBy("doc_id"))


def sentiment_sql() -> str:
    """DuckDB twin: same collapsed lexicon as VALUES, same tokenizer
    contract as TOKENS_SQL, same lag-based negation flip."""
    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"  # "n't" needs doubling

    lex_values = ", ".join(f"({q(w)}, {v})"
                           for w, v in sentiment_lexicon_rows())
    negs = ", ".join(q(n) for n in sorted(NEGATORS))
    # NB: prev comes from the FULL token stream by array index (1-based
    # t[i]; t[0] is NULL), matching the Spark side's element_at
    return f"""
WITH lex(word, w) AS (VALUES {lex_values}),
toks AS (
  SELECT doc_id,
         regexp_split_to_array(trim(lower(text)), '\\s+') AS t
  FROM documents
),
tok AS (
  SELECT doc_id, t[i] AS word, t[i - 1] AS prev
  FROM toks, UNNEST(range(1, len(t) + 1)) AS r(i)
),
flipped AS (
  SELECT t.doc_id,
         CASE WHEN t.prev IN ({negs}) THEN -l.w ELSE l.w END AS signed
  FROM tok t JOIN lex l ON t.word = l.word
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_subjective,
       CAST(SUM(signed) AS BIGINT) AS score,
       CASE WHEN SUM(signed) > 0 THEN 'positive'
            WHEN SUM(signed) < 0 THEN 'negative'
            ELSE 'neutral' END AS label
FROM flipped GROUP BY doc_id ORDER BY doc_id
"""
