"""Text-analysis operators over the ``documents`` table: token counts,
language ID, quality scoring, document fingerprinting.

Every operator here is pure Catalyst (built-in pyspark.sql.functions,
JVM-side, whole-stage-codegen) — NO Python UDFs — and each has an
exact DuckDB-SQL oracle (returned alongside) so the driver's
correctness gate can verify values, not just row counts.

Definitions are chosen to be expressible identically in Spark and
ANSI/DuckDB SQL (integer arithmetic, regexp token splits, list
reductions) so both engines compute bit-identical results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .dedup import _documents

# English/German/French/Spanish stopword markers for the n-gram-free
# deterministic language-ID heuristic (rule: argmax stopword hits).
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with", "for", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"],
    "fr": ["le", "la", "les", "et", "est", "une", "dans", "que", "pour", "des"],
    "es": ["el", "la", "los", "y", "es", "una", "en", "que", "por", "con"],
}

FP_MOD = 1_000_000_007
FP_BASE = 131


def _tokens(col):
    """Whitespace tokens of trimmed lowered text — same split in DuckDB:
    regexp_split_to_array(trim(lower(text)), '\\s+')."""
    return F.split(F.trim(F.lower(col)), r"\s+")


def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token count + char count per doc."""
    from .dedup import _documents
    docs = _documents(spark, sf_dir)
    return (docs.select(
        "doc_id",
        F.size(_tokens(F.col("text"))).alias("n_tokens"),
        F.length("text").alias("n_chars"))
        .orderBy("doc_id"))


TOKEN_COUNTS_SQL = """
SELECT doc_id,
       len(regexp_split_to_array(trim(lower(text)), '\\s+')) AS n_tokens,
       length(text) AS n_chars
FROM documents ORDER BY doc_id
"""


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stopword-vote language ID; ties broken by language
    code order (en < de handled by explicit ordering: greatest hit
    count, then lexicographic lang)."""
    from .dedup import _documents
    docs = _documents(spark, sf_dir)  # re-split tiny single-file input to cores
    toks = _tokens(F.col("text"))
    scored = docs.select("doc_id", F.col("lang").alias("true_lang"), *[
        F.size(F.filter(toks, lambda t: t.isin(*LANG_MARKERS[lang])))
        .alias(f"hits_{lang}")
        for lang in LANG_MARKERS
    ])
    # argmax with deterministic tie-break on language code
    pred = F.greatest(*[
        F.struct(F.col(f"hits_{lang}").alias("h"),
                 # invert code ordering so greatest() prefers the earlier code on ties
                 F.lit({"en": 4, "de": 3, "es": 2, "fr": 1}[lang]).alias("pri"),
                 F.lit(lang).alias("lang"))
        for lang in LANG_MARKERS
    ])
    return (scored.select("doc_id", "true_lang", pred["lang"].alias("pred_lang"),
                          pred["h"].alias("marker_hits"))
            .orderBy("doc_id"))


LANG_ID_SQL = """
WITH scored AS (
  SELECT doc_id, lang AS true_lang,
    len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
        t -> t IN ('the','and','of','to','in','is','that','with','for','was'))) AS hits_en,
    len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
        t -> t IN ('der','die','das','und','ist','nicht','ein','mit','von','zu'))) AS hits_de,
    len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
        t -> t IN ('le','la','les','et','est','une','dans','que','pour','des'))) AS hits_fr,
    len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
        t -> t IN ('el','la','los','y','es','una','en','que','por','con'))) AS hits_es
  FROM documents
)
SELECT doc_id, true_lang,
  CASE greatest(hits_en*10+4, hits_de*10+3, hits_es*10+2, hits_fr*10+1)
    WHEN hits_en*10+4 THEN 'en' WHEN hits_de*10+3 THEN 'de'
    WHEN hits_es*10+2 THEN 'es' ELSE 'fr' END AS pred_lang,
  greatest(hits_en, hits_de, hits_fr, hits_es) AS marker_hits
FROM scored ORDER BY doc_id
"""


def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic quality features: length, mean token length x1000
    (integer), punctuation count, stopword hits — the
    length/punct/stopword-ratio family of pretraining quality filters."""
    from .dedup import _documents
    docs = _documents(spark, sf_dir)  # re-split tiny single-file input to cores
    toks = _tokens(F.col("text"))
    n_tok = F.size(toks)
    punct = F.length("text") - F.length(F.regexp_replace("text", r"[.,;:!?]", ""))
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*LANG_MARKERS["en"])))
    return (docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        n_tok.alias("n_tokens"),
        (F.floor(F.length(F.regexp_replace(F.trim(F.lower("text")), r"\s+", ""))
                 * F.lit(1000) / n_tok)).cast("bigint").alias("mean_tok_len_x1000"),
        punct.alias("n_punct"),
        stop_hits.alias("en_stop_hits"),
        F.floor((stop_hits * 1000) / n_tok).cast("bigint").alias("stop_ratio_x1000"))
        .orderBy("doc_id"))


QUALITY_SQL = """
WITH t AS (
  SELECT doc_id, text,
         regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
  FROM documents
)
SELECT doc_id,
  length(text) AS n_chars,
  len(toks) AS n_tokens,
  CAST(floor(length(regexp_replace(trim(lower(text)), '\\s+', '', 'g')) * 1000.0
       / len(toks)) AS BIGINT) AS mean_tok_len_x1000,
  length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS n_punct,
  len(list_filter(toks, x -> x IN
      ('the','and','of','to','in','is','that','with','for','was'))) AS en_stop_hits,
  CAST(floor(len(list_filter(toks, x -> x IN
      ('the','and','of','to','in','is','that','with','for','was'))) * 1000.0
      / len(toks)) AS BIGINT) AS stop_ratio_x1000
FROM t ORDER BY doc_id
"""


def fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling polynomial hash over the UTF-8 code units of the text:
    acc = (acc*131 + code) % 1e9+7. Spark: aggregate() over a char
    split; DuckDB: list_reduce over the same split. JVM-side, no UDF."""
    from .dedup import _documents
    docs = _documents(spark, sf_dir)  # re-split tiny single-file input to cores
    chars = F.split(F.col("text"), "")
    fp = F.aggregate(
        chars,
        F.lit(0).cast("bigint"),
        lambda acc, ch: (acc * FP_BASE + F.ascii(ch)) % FP_MOD)
    return docs.select("doc_id", fp.alias("fp")).orderBy("doc_id")


FINGERPRINT_SQL = f"""
SELECT doc_id,
       list_reduce(list_prepend(CAST(0 AS BIGINT),
                   [CAST(ascii(c) AS BIGINT) for c in regexp_split_to_array(text, '')]),
                   (acc, ch) -> (acc * {FP_BASE} + ch) % {FP_MOD}) AS fp
FROM documents ORDER BY doc_id
"""

def top_terms(spark: SparkSession, sf_dir: str, k: int = 3,
              min_len: int = 4) -> DataFrame:
    """Per-document top-k distinguishing terms, tf-idf-style but with
    EXACT integer semantics so two engines agree bit-for-bit: rank by
    term frequency DESC, then document frequency ASC (rarer term wins
    the tie — the idf signal), then term ASC.

    Plan shape (scale): one explode + two shuffles — partial-aggregated
    groupBy (doc_id, term) for tf, a window over term for df (df could
    equivalently come from a term-level aggregate + shuffle join; the
    window reuses the same exchange), then the per-doc top-k window.
    All JVM-side; no Python."""
    from pyspark.sql import Window

    from .dedup import _documents
    docs = _documents(spark, sf_dir)  # re-split tiny single-file input to cores
    toks = (docs.select("doc_id", F.explode(
        F.split(F.lower("text"), "[^a-z]+")).alias("term"))
        .filter(F.length("term") >= min_len))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_w = Window.partitionBy("term")
    rank_w = (Window.partitionBy("doc_id")
              .orderBy(F.desc("tf"), F.asc("df"), F.asc("term")))
    return (tf.withColumn("df", F.count("*").over(df_w))
            .withColumn("rn", F.row_number().over(rank_w))
            .filter(F.col("rn") <= k)
            .select("doc_id", F.col("rn").cast("bigint").alias("rn"),
                    "term", "tf", "df")
            .orderBy("doc_id", "rn"))


TOP_TERMS_SQL = """
WITH toks AS (
  SELECT doc_id, t.term
  FROM documents,
       unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS t(term)
  WHERE length(t.term) >= 4
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
), dfc AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), ranked AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfc.df,
         row_number() OVER (PARTITION BY tf.doc_id
                            ORDER BY tf.tf DESC, dfc.df ASC, tf.term ASC) AS rn
  FROM tf JOIN dfc USING (term)
)
SELECT doc_id, CAST(rn AS BIGINT) AS rn, term, tf, df
FROM ranked WHERE rn <= 3 ORDER BY doc_id, rn
"""


def postings(spark: SparkSession, sf_dir: str, min_len: int = 4) -> DataFrame:
    """Inverted index: every term with its document frequency and the
    full sorted posting list, comma-joined so the value oracle is
    exact. One explode + distinct + one groupBy(term) — the standard
    index-build plan. At web scale a heavy term's posting list must be
    sharded ((term, bucket) composite key, bucket = doc_id hash band)
    before the collect_list; the synthetic corpus's vocabulary is tiny
    and shared (df ≈ 0.8·N for every term), so the unsharded plan is
    the honest one here and the skew note lives in this docstring."""
    docs = _documents(spark, sf_dir)
    toks = (docs.select("doc_id", F.explode(
        F.split(F.lower("text"), "[^a-z]+")).alias("term"))
        .filter(F.length("term") >= min_len)
        .distinct())
    return (toks.groupBy("term")
            .agg(F.count("*").alias("df"),
                 F.array_join(F.array_sort(F.collect_list(
                     F.col("doc_id").cast("string"))), ",").alias("posting"))
            .orderBy("term"))


POSTINGS_SQL = """
WITH toks AS (
  SELECT DISTINCT doc_id, t.term
  FROM documents,
       unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS t(term)
  WHERE length(t.term) >= 4
)
SELECT term, count(*) AS df,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY CAST(doc_id AS VARCHAR)) AS posting
FROM toks GROUP BY term
ORDER BY term
"""

def length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language exact token-count quantiles with pure-integer index
    semantics (p50 at rank ceil(n/2) = (n+1)//2, p90 at rank
    ceil(9n/10) = (9n+9)//10, ties broken by doc_id) so two engines
    agree exactly — no interpolated-percentile float drift.

    Plan: one groupBy for per-lang counts + one rank window on the
    same (lang) partitioning — the exchange is reused."""
    from pyspark.sql import Window

    docs = _documents(spark, sf_dir)
    tc = docs.select(
        "doc_id", "lang",
        F.size(_tokens(F.col("text"))).alias("n_tokens"))
    w = Window.partitionBy("lang").orderBy("n_tokens", "doc_id")
    ranked = tc.withColumn("rn", F.row_number().over(w))
    ranked = ranked.withColumn(
        "n", F.count("*").over(Window.partitionBy("lang")))
    return (ranked.groupBy("lang")
            .agg(F.max("n").alias("n_docs"),
                 F.max(F.when(F.col("rn") == F.floor((F.col("n") + 1) / 2),
                              F.col("n_tokens"))).alias("p50_tokens"),
                 F.max(F.when(
                     F.col("rn") == F.floor((9 * F.col("n") + 9) / 10),
                     F.col("n_tokens"))).alias("p90_tokens"))
            .orderBy("lang"))


LENGTH_QUANTILES_SQL = """
WITH tc AS (
  SELECT doc_id, lang,
         len(regexp_split_to_array(trim(lower(text)), '\\s+')) AS n_tokens
  FROM documents
), ranked AS (
  SELECT lang, n_tokens,
         row_number() OVER (PARTITION BY lang ORDER BY n_tokens, doc_id) AS rn,
         count(*) OVER (PARTITION BY lang) AS n
  FROM tc
)
SELECT lang, MAX(n) AS n_docs,
       MAX(CASE WHEN rn = (n + 1) // 2 THEN n_tokens END) AS p50_tokens,
       MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN n_tokens END) AS p90_tokens
FROM ranked GROUP BY lang ORDER BY lang
"""

def train_test_split(spark: SparkSession, sf_dir: str,
                     test_hex: str = "33333333") -> DataFrame:
    """Deterministic, engine-independent train/test split: md5 of the
    doc id keyed against a fixed hex threshold (~20% test at
    '33333333'). Both Spark and DuckDB produce identical lowercase-hex
    md5, so the assignment is reproducible anywhere — the property a
    training pipeline needs so a document never migrates between
    splits across runs, engines, or cluster sizes. Pure Catalyst;
    embarrassingly parallel (no shuffle before the per-lang count)."""
    docs = _documents(spark, sf_dir)
    h8 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8)
    labeled = docs.select(
        "doc_id", "lang",
        F.when(h8 < test_hex, "test").otherwise("train").alias("split"))
    return (labeled.groupBy("lang", "split")
            .agg(F.count("*").alias("n"),
                 F.min("doc_id").alias("min_doc"),
                 F.max("doc_id").alias("max_doc"))
            .orderBy("lang", "split"))


TRAIN_TEST_SPLIT_SQL = """
WITH labeled AS (
  SELECT doc_id, lang,
         CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '33333333'
              THEN 'test' ELSE 'train' END AS split
  FROM documents
)
SELECT lang, split, count(*) AS n,
       min(doc_id) AS min_doc, max(doc_id) AS max_doc
FROM labeled GROUP BY lang, split ORDER BY lang, split
"""


def token_batches(spark: SparkSession, sf_dir: str,
                  budget: int = 4096) -> DataFrame:
    """Sequence-packing plan for pretraining: documents in doc_id
    order are greedily packed into token-budgeted batches per
    language. batch = floor(exclusive-prefix-sum(tokens) / budget) —
    the deterministic approximation of greedy packing that a window
    cumulative sum expresses exactly in both engines (a document
    larger than the budget occupies its batch alone and bleeds into
    the next index, matching the SQL formulation bit-for-bit).

    Per-lang window = one exchange; the cumsum stays inside it."""
    from pyspark.sql import Window

    docs = _documents(spark, sf_dir)
    tc = docs.select(
        "doc_id", "lang",
        F.size(_tokens(F.col("text"))).alias("n_tokens"))
    w = (Window.partitionBy("lang").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    with_prefix = tc.withColumn(
        "prefix", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    batched = with_prefix.withColumn(
        "batch", F.floor(F.col("prefix") / budget).cast("bigint"))
    return (batched.groupBy("lang", "batch")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_tokens").alias("batch_tokens"),
                 F.min("doc_id").alias("first_doc"))
            .orderBy("lang", "batch"))


TOKEN_BATCHES_SQL = """
WITH tc AS (
  SELECT doc_id, lang,
         len(regexp_split_to_array(trim(lower(text)), '\\s+')) AS n_tokens
  FROM documents
), pre AS (
  SELECT doc_id, lang, n_tokens,
         COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS prefix
  FROM tc
)
SELECT lang, CAST(floor(prefix / 4096) AS BIGINT) AS batch,
       count(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS batch_tokens,
       MIN(doc_id) AS first_doc
FROM pre GROUP BY lang, batch ORDER BY lang, batch
"""

# PII scrubbing patterns: chosen to mean the same thing in Java regex
# (Spark) and RE2 (DuckDB) — no lookaround, no backreferences
_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_URL_RE = "https?://[^ \\t\\n]+"


def redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data scrubbing: replace emails and URLs with fixed
    placeholder tokens. Output carries per-doc match counts and the
    md5 of the redacted text — both engines produce identical
    lowercase-hex md5, so the oracle verifies the REDACTED BYTES, not
    just the counts. Pure Catalyst; embarrassingly parallel."""
    docs = _documents(spark, sf_dir)
    red = F.regexp_replace(
        F.regexp_replace("text", _EMAIL_RE, "<EMAIL>"),
        _URL_RE, "<URL>")
    return (docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(_EMAIL_RE), 0))
        .cast("bigint").alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(_URL_RE), 0))
        .cast("bigint").alias("n_urls"),
        F.md5(red).alias("redacted_md5"))
        .orderBy("doc_id"))


REDACT_PII_SQL = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{_URL_RE}')) AS BIGINT) AS n_urls,
       md5(regexp_replace(
             regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
             '{_URL_RE}', '<URL>', 'g')) AS redacted_md5
FROM documents ORDER BY doc_id
"""


def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals per document (Rae et al.
    2021 §A1.1 use duplicate-line / most-common-n-gram fractions to
    drop boilerplate and spam): token count, distinct-token count, the
    most frequent unigram and bigram with their counts, and a pass/fail
    flag at the classic thresholds (top unigram < 20 % of tokens, top
    bigram < 10 % of bigrams, using integer cross-multiplication so
    both engines compare exactly).

    Scale design: one explode + two-level aggregation per n-gram order
    — partial counts combine map-side, then one `min_by` per doc picks
    the argmax with a deterministic (count desc, token asc) tie-break;
    no window function, no Python. The explode is ~n_tokens rows per
    doc but carries only (doc_id, token) through the exchange.
    """
    docs = _documents(spark, sf_dir)
    toks = docs.select("doc_id", _tokens(F.col("text")).alias("t"))
    uni = (toks.select("doc_id", F.explode("t").alias("w"))
           .groupBy("doc_id", "w").agg(F.count("*").alias("n"))
           .groupBy("doc_id")
           .agg(F.sum("n").alias("n_tokens"),
                F.count("*").alias("n_distinct"),
                # argmax with (count desc, token asc) tie-break:
                # min_by over the composite (-n, w)
                F.expr("min_by(w, struct(-n, w))").alias("top_token"),
                F.max("n").alias("top_token_n")))
    # word bigrams: zip the array with its tail, join with a space
    bi_arr = F.expr(
        "transform(slice(t, 1, size(t) - 1), (w, i) ->"
        " concat(w, ' ', element_at(t, i + 2)))")
    bi = (toks.filter(F.size("t") >= 2)
          .select("doc_id", F.explode(bi_arr).alias("g"))
          .groupBy("doc_id", "g").agg(F.count("*").alias("n"))
          .groupBy("doc_id")
          .agg(F.sum("n").alias("n_bigrams"),
               F.expr("min_by(g, struct(-n, g))").alias("top_bigram"),
               F.max("n").alias("top_bigram_n")))
    out = (uni.join(bi, "doc_id", "left")
           .select(
               "doc_id", "n_tokens", "n_distinct",
               "top_token", "top_token_n",
               F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
               "top_bigram",
               F.coalesce("top_bigram_n", F.lit(0)).alias("top_bigram_n"),
               ((F.col("top_token_n") * 5 < F.col("n_tokens"))
                & (F.coalesce(F.col("top_bigram_n"), F.lit(0)) * 10
                   < F.coalesce(F.col("n_bigrams"), F.lit(1)) * 1)
                ).alias("passes")))
    return out.orderBy("doc_id")


REPETITION_SQL = """
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
  FROM documents
),
uni_counts AS (
  SELECT doc_id, w, COUNT(*) AS n,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY n DESC, w ASC) AS rk
  FROM (SELECT doc_id, unnest(t) AS w FROM toks)
  GROUP BY doc_id, w
),
uni AS (
  SELECT doc_id,
         SUM(n) AS n_tokens,
         COUNT(*) AS n_distinct,
         MAX(CASE WHEN rk = 1 THEN w END) AS top_token,
         MAX(n) AS top_token_n
  FROM uni_counts GROUP BY doc_id
),
bi_counts AS (
  SELECT doc_id, g, COUNT(*) AS n,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY n DESC, g ASC) AS rk
  FROM (
    SELECT doc_id, t[i] || ' ' || t[i + 1] AS g
    FROM toks, UNNEST(range(1, len(t))) AS r(i)
    WHERE len(t) >= 2
  ) GROUP BY doc_id, g
),
bi AS (
  SELECT doc_id,
         SUM(n) AS n_bigrams,
         MAX(CASE WHEN rk = 1 THEN g END) AS top_bigram,
         MAX(n) AS top_bigram_n
  FROM bi_counts GROUP BY doc_id
)
SELECT u.doc_id,
       CAST(u.n_tokens AS BIGINT) AS n_tokens,
       u.n_distinct, u.top_token, u.top_token_n,
       CAST(COALESCE(b.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       b.top_bigram,
       COALESCE(b.top_bigram_n, 0) AS top_bigram_n,
       (u.top_token_n * 5 < u.n_tokens
        AND COALESCE(b.top_bigram_n, 0) * 10 < COALESCE(b.n_bigrams, 1))
         AS passes
FROM uni u LEFT JOIN bi b USING (doc_id)
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# BM25 ranked retrieval
# ---------------------------------------------------------------------------
# Okapi BM25 (k1=1.2, b=0.75) over whitespace tokens — the ranked
# counterpart of the boolean inverted index above. Per-(doc, term)
# scores are floored to x1e6 fixed point BEFORE the per-doc sum so the
# final total is an integer sum (order-independent), keeping Spark and
# DuckDB hash-identical despite float idf/tf math.

BM25_QUERY = "hash join filter window"
BM25_K1 = 1.2
BM25_B = 0.75


def bm25_topk(spark: SparkSession, sf_dir: str,
              query: str = BM25_QUERY, k: int = 20) -> DataFrame:
    """Top-k documents for `query` by BM25, (doc_id, score_x1e6)
    ordered by score desc then doc_id.

    Scale shape: the three statistics joins are all broadcasts — the
    per-term df table and the corpus-level (N, avgdl) row are tiny by
    construction, so the only shuffle is the per-(doc, term) tf
    aggregation over documents that contain a query term (the scan
    prunes everything else with an isin filter pushed to the gram
    explode)."""
    qterms = list(dict.fromkeys(query.split()))
    docs = _documents(spark, sf_dir)
    toks = F.split(F.regexp_replace(F.trim(F.lower("text")), r"\s+", " "), " ")
    ex = docs.select("doc_id", F.size(toks).alias("dl"),
                     F.explode(toks).alias("term"))
    corpus = docs.select(
        F.count("*").alias("n_docs"),
        F.sum(F.size(toks)).alias("total_len"))
    tf = (ex.filter(F.col("term").isin(qterms))
          .groupBy("doc_id", "dl", "term")
          .agg(F.count("*").alias("tf")))
    dfreq = tf.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df"))
    scored = (tf.join(F.broadcast(dfreq), "term")
              .crossJoin(F.broadcast(corpus)))
    avgdl = F.col("total_len") * 1.0 / F.col("n_docs")
    idf = F.log(F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    tfw = (F.col("tf") * (BM25_K1 + 1)) / (
        F.col("tf") + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / avgdl))
    per_term = F.floor(idf * tfw * 1e6).cast("bigint")
    return (scored.withColumn("s", per_term)
            .groupBy("doc_id").agg(F.sum("s").alias("score_x1e6"))
            .orderBy(F.desc("score_x1e6"), "doc_id")
            .limit(k))


BM25_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         regexp_split_to_array(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ') AS t
  FROM documents
), ex AS (
  SELECT doc_id, len(t) AS dl, unnest(t) AS term FROM toks
), corpus AS (
  SELECT count(*) AS n_docs, sum(len(t)) AS total_len FROM toks
), tf AS (
  SELECT doc_id, dl, term, count(*) AS tf
  FROM ex WHERE term IN ('hash', 'join', 'filter', 'window')
  GROUP BY 1, 2, 3
), dfreq AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1
), scored AS (
  SELECT tf.doc_id,
         CAST(floor(
           ln(1.0 + (c.n_docs - d.df + 0.5) / (d.df + 0.5))
           * (tf.tf * ({BM25_K1} + 1))
           / (tf.tf + {BM25_K1} * (1 - {BM25_B}
              + {BM25_B} * tf.dl / (c.total_len * 1.0 / c.n_docs)))
           * 1e6) AS BIGINT) AS s
  FROM tf JOIN dfreq d USING (term) CROSS JOIN corpus c
)
SELECT doc_id, CAST(SUM(s) AS BIGINT) AS score_x1e6
FROM scored GROUP BY doc_id
ORDER BY score_x1e6 DESC, doc_id LIMIT 20
"""


def stratified_sample(spark: SparkSession, sf_dir: str,
                      k: int = 25) -> DataFrame:
    """Deterministic stratified sample: the k documents per language
    with the smallest md5(doc_id) — a fixed pseudo-random order both
    engines compute identically, so the sample never migrates across
    runs, engines, or cluster sizes (same property as the train/test
    split). Returns (lang, doc_id, n_chars) ordered.

    Scale shape: one hash-partitioned window per stratum; rank
    truncation happens inside the window sort (WindowGroupLimit pushes
    the k-cutoff below the shuffle in Spark >= 3.5), so only ~k rows
    per stratum survive to the output."""
    from pyspark.sql import Window
    docs = _documents(spark, sf_dir)
    w = (Window.partitionBy("lang")
         .orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id"))
    return (docs.select("lang", "doc_id", F.length("text").alias("n_chars"),
                        F.row_number().over(w).alias("rk"))
            .filter(F.col("rk") <= k).drop("rk")
            .orderBy("lang", "doc_id"))


STRATIFIED_SAMPLE_SQL = """
WITH ranked AS (
  SELECT lang, doc_id, length(text) AS n_chars,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
           AS rk
  FROM documents
)
SELECT lang, doc_id, n_chars FROM ranked WHERE rk <= 25
ORDER BY lang, doc_id
"""


def unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style language-model quality signal with an in-repo
    model: each document's mean token surprisal -ln p(t) under the
    corpus's own unigram distribution (CCNet uses a KenLM 5-gram;
    the unigram variant keeps the same plan shape without shipping a
    model file). Low = templated/common text, high = rare-token text.

    Per-token surprisal is floored to x1e6 fixed point BEFORE the
    per-doc mean, so cross-engine float determinism reduces to ln()
    on identical doubles (same libm) and all aggregation is integer.

    Scale shape: the unigram table is vocabulary-sized — Zipf keeps
    it millions of rows at web scale, far smaller than the corpus —
    so Spark broadcasts it under AQE; the only big exchange is the
    per-doc sum, pre-aggregated map-side."""
    docs = _documents(spark, sf_dir)
    toks = F.split(F.regexp_replace(F.trim(F.lower("text")), r"\s+", " "), " ")
    ex = docs.select("doc_id", F.explode(toks).alias("term"))
    uni = ex.groupBy("term").agg(F.count("*").alias("c"))
    total = ex.agg(F.count("*").alias("total"))
    s = (ex.join(uni, "term").crossJoin(F.broadcast(total))
         .withColumn("s_x1e6",
                     F.floor(-F.log(F.col("c") * 1.0 / F.col("total")) * 1e6)
                     .cast("bigint")))
    return (s.groupBy("doc_id")
            .agg(F.floor(F.sum("s_x1e6") / F.count("*")).cast("bigint")
                 .alias("surprisal_x1e6"))
            .orderBy("doc_id"))


UNIGRAM_SURPRISAL_SQL = """
WITH ex AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(regexp_replace(trim(lower(text)),
                '\\s+', ' ', 'g'), ' ')) AS term
  FROM documents
), uni AS (
  SELECT term, count(*) AS c FROM ex GROUP BY 1
), tot AS (SELECT count(*) AS total FROM ex)
SELECT e.doc_id,
       CAST(floor(SUM(CAST(floor(-ln(u.c * 1.0 / t.total) * 1e6) AS BIGINT))
                  / count(*)) AS BIGINT) AS surprisal_x1e6
FROM ex e JOIN uni u USING (term) CROSS JOIN tot t
GROUP BY e.doc_id
ORDER BY e.doc_id
"""


# ---------------------------------------------------------------------------
# Feature-hashed linear quality classifier (fastText-style serving path)
# ---------------------------------------------------------------------------

_HC_DIM = 128          # hashed feature buckets
_HC_MIX = 2654435761   # Knuth multiplicative constant -> frozen weights


def hash_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serving path of a feature-hashed linear text classifier (the
    fastText / Vowpal-Wabbit trick used for CCNet-style quality and
    language filters at corpus scale): token -> hash bucket ->
    broadcast weight -> per-doc score.

    The weight VECTOR here is frozen deterministically from the bucket
    index ((b * Knuth) % 1001 - 500, integers in [-500, 500]) — the
    serving plan is identical whatever training produced the weights,
    and integer weights make the score an exact cross-engine value
    (no float dot product to drift in the last ulp).

    Scale shape: explode -> per-token polynomial hash (JVM-side
    aggregate over the char array, same rolling hash as
    ``fingerprints``) -> map-side-combined groupBy(doc_id) SUM. One
    doc-keyed exchange carrying one partial sum per task — the weight
    "table" is an expression, so nothing is broadcast at all."""
    docs = _documents(spark, sf_dir)
    toks = (docs.select("doc_id", F.explode(_tokens(F.col("text")))
                        .alias("tok"))
            .filter(F.length("tok") > 0))
    polyhash = F.aggregate(
        F.split(F.col("tok"), ""),
        F.lit(0).cast("bigint"),
        lambda acc, ch: (acc * FP_BASE + F.ascii(ch)) % FP_MOD)
    bucket = polyhash % _HC_DIM
    weight = (bucket * _HC_MIX) % 1001 - 500
    scored = (toks.select("doc_id", weight.alias("w"))
              .groupBy("doc_id")
              .agg(F.sum("w").alias("score")))
    return (scored.select(
        "doc_id", F.col("score").cast("bigint").alias("score"),
        F.when(F.col("score") > 0, F.lit("keep")).otherwise(F.lit("drop"))
        .alias("verdict"))
        .orderBy("doc_id"))


HASH_CLASSIFIER_SQL = f"""
WITH toks AS (
  SELECT doc_id, t.tok
  FROM documents,
       unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS t(tok)
  WHERE length(t.tok) > 0
), h AS (
  SELECT doc_id,
         (list_reduce(list_prepend(CAST(0 AS BIGINT),
            [CAST(ascii(c) AS BIGINT) for c in regexp_split_to_array(tok, '')]),
            (acc, ch) -> (acc * {FP_BASE} + ch) % {FP_MOD})
          % {_HC_DIM}) * {_HC_MIX} % 1001 - 500 AS w
  FROM toks
)
SELECT doc_id, CAST(SUM(w) AS BIGINT) AS score,
       CASE WHEN SUM(w) > 0 THEN 'keep' ELSE 'drop' END AS verdict
FROM h GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# tokenize-to-ids: vocabulary build + corpus encoding (the step every
# LLM training pipeline runs between cleaning and batching)

_VOCAB_K = 24  # the synthetic corpus has a 31-token vocabulary;
# 24 leaves real OOV traffic for the encode check (k is a free
# parameter; real BPE vocabs are 10^4-10^5)


def vocab_build(spark: SparkSession, sf_dir: str,
                k: int = _VOCAB_K) -> DataFrame:
    """Top-k token vocabulary with dense ids (1..k), ordered by
    (count DESC, token) so the id assignment is a total order.

    Scale shape: the corpus-wide token count is one partially
    aggregated groupBy (map-side combine collapses each partition to
    its distinct tokens); the top-k is TakeOrderedAndProject — a
    per-partition heap + driver merge of k rows, NOT a global sort of
    the vocabulary. Only the k winning rows (k ~ 10^4-10^5 for real
    BPE vocabs) pass through the final single-partition id window."""
    from .dedup import _documents
    docs = _documents(spark, sf_dir)
    counts = (docs.select(F.explode(_tokens(F.col("text"))).alias("token"))
              .filter(F.length("token") > 0)
              .groupBy("token").agg(F.count("*").alias("cnt")))
    top = counts.orderBy(F.desc("cnt"), F.asc("token")).limit(k)
    from pyspark.sql.window import Window
    w = Window.orderBy(F.desc("cnt"), F.asc("token"))
    return top.select(F.row_number().over(w).cast("bigint").alias("id"),
                      "token", "cnt").orderBy("id")


VOCAB_SQL_TEMPLATE = """
WITH counts AS (
  SELECT t.tok AS token, count(*) AS cnt
  FROM documents,
       unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS t(tok)
  WHERE length(t.tok) > 0
  GROUP BY 1
)
SELECT * FROM (
  SELECT row_number() OVER (ORDER BY cnt DESC, token) AS id, token, cnt
  FROM counts
) WHERE id <= {k} ORDER BY id
"""

VOCAB_SQL = VOCAB_SQL_TEMPLATE.format(k=_VOCAB_K)


def encode_corpus(spark: SparkSession, sf_dir: str,
                  k: int = _VOCAB_K) -> DataFrame:
    """Encode every document to vocabulary ids (OOV -> 0) and emit
    (doc_id, n_tokens, n_oov, ids_md5) where ids_md5 fingerprints the
    exact id sequence (comma-joined, position order) — the value the
    oracle recomputes, so the check covers ORDER, not just counts.

    Scale shape: the vocabulary is broadcast (k rows); encoding is a
    map-only broadcast-hash join on the exploded tokens, and the
    sequence rebuild is one groupBy(doc_id) whose rows carry (pos,
    id) pairs — int pairs, not text. No shuffle ever carries the
    document text."""
    from .dedup import _documents
    docs = _documents(spark, sf_dir)
    vocab = F.broadcast(vocab_build(spark, sf_dir, k).select("token", "id"))
    toks = (docs.select("doc_id",
                        F.posexplode(_tokens(F.col("text")))
                        .alias("pos", "token"))
            .filter(F.length("token") > 0))
    enc = (toks.join(vocab, "token", "left")
           .select("doc_id", "pos",
                   F.coalesce("id", F.lit(0)).cast("bigint").alias("id")))
    return (enc.groupBy("doc_id")
            .agg(F.count("*").alias("n_tokens"),
                 F.sum(F.when(F.col("id") == 0, 1).otherwise(0))
                 .cast("bigint").alias("n_oov"),
                 F.md5(F.array_join(
                     F.transform(
                         F.sort_array(F.collect_list(
                             F.struct("pos", "id"))),
                         lambda s: s["id"].cast("string")), ","))
                 .alias("ids_md5"))
            .orderBy("doc_id"))


ENCODE_SQL_TEMPLATE = """
WITH vocab AS (
  SELECT * FROM (
    SELECT row_number() OVER (ORDER BY cnt DESC, token) AS id, token
    FROM (
      SELECT t.tok AS token, count(*) AS cnt
      FROM documents,
           unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS t(tok)
      WHERE length(t.tok) > 0
      GROUP BY 1)
  ) WHERE id <= {k}
),
toks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token,
         unnest(range(0, len(regexp_split_to_array(trim(lower(text)),
                                                   '\\s+')))) AS pos
  FROM documents
),
enc AS (
  SELECT toks.doc_id, toks.pos, COALESCE(vocab.id, 0) AS id
  FROM toks LEFT JOIN vocab ON toks.token = vocab.token
  WHERE length(toks.token) > 0
)
SELECT doc_id, count(*) AS n_tokens,
       CAST(SUM(CASE WHEN id = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       md5(string_agg(CAST(id AS VARCHAR), ',' ORDER BY pos)) AS ids_md5
FROM enc GROUP BY doc_id ORDER BY doc_id
"""

ENCODE_SQL = ENCODE_SQL_TEMPLATE.format(k=_VOCAB_K)


# ---------------------------------------------------------------------------
# bigram language-model surprisal (the KenLM-shaped quality signal)
# ---------------------------------------------------------------------------

def bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean bigram surprisal: -ln p(t_i | t_{i-1}) under
    the corpus's own MLE bigram model, with the unigram model scoring
    each document's FIRST token (CCNet scores with a KenLM 5-gram;
    the 2-gram keeps the identical plan shape — an n-gram count table
    joined back to the token stream — without shipping a model file).
    Low = templated text whose transitions the corpus has seen; high
    = rare transitions. Conditioned on the corpus itself, every
    observed bigram has count >= 1, so the MLE conditional is always
    defined and no smoothing branch is needed.

    Determinism contract (same as unigram_surprisal): each token's
    surprisal is floored to x1e6 fixed point BEFORE the per-doc mean,
    so cross-engine agreement reduces to ln() on identical doubles;
    all aggregation is integer.

    Scale shape: the bigram table is (vocab x observed-successor)-
    sized — Zipf keeps it ~10x the unigram table, still orders of
    magnitude under the corpus — so AQE broadcasts it; the token
    stream shuffles ONCE on doc_id for the lag() window, and the
    same partitioning feeds the final per-doc aggregation, so adding
    the model joins adds no fact-side exchange (the joins are
    broadcast-hash on the exploded stream)."""
    from .dedup import _documents
    docs = _documents(spark, sf_dir)
    from pyspark.sql import Window
    toks = docs.select(
        "doc_id", F.posexplode(_tokens(F.col("text"))).alias("pos", "tok"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    stream = toks.withColumn("prev", F.lag("tok").over(w))
    uni = stream.groupBy("tok").agg(F.count("*").alias("c1"))
    tot = stream.agg(F.count("*").alias("t"))
    big = (stream.filter(F.col("prev").isNotNull())
           .groupBy("prev", "tok").agg(F.count("*").alias("c2")))
    lft = (stream.filter(F.col("prev").isNotNull())
           .groupBy("prev").agg(F.count("*").alias("cl")))
    s = (stream.join(uni, "tok")
         .join(big, ["prev", "tok"], "left")
         .join(lft, "prev", "left")
         .crossJoin(F.broadcast(tot))
         .withColumn(
             "s_x1e6",
             F.when(F.col("prev").isNull(),
                    F.floor(-F.log(F.col("c1") * 1.0 / F.col("t")) * 1e6))
             .otherwise(
                 F.floor(-F.log(F.col("c2") * 1.0 / F.col("cl")) * 1e6))
             .cast("bigint")))
    return (s.groupBy("doc_id")
            .agg(F.floor(F.sum("s_x1e6") / F.count("*")).cast("bigint")
                 .alias("surprisal2_x1e6"))
            .orderBy("doc_id"))


BIGRAM_SURPRISAL_SQL = """
WITH toks AS (
  SELECT doc_id, pos, tok,
         lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
  FROM (
    SELECT doc_id,
           unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok,
           unnest(range(0, len(regexp_split_to_array(trim(lower(text)),
                                                     '\\s+')))) AS pos
    FROM documents)
),
uni AS (SELECT tok, count(*) AS c1 FROM toks GROUP BY 1),
tot AS (SELECT count(*) AS t FROM toks),
big AS (SELECT prev, tok, count(*) AS c2 FROM toks
        WHERE prev IS NOT NULL GROUP BY 1, 2),
lft AS (SELECT prev, count(*) AS cl FROM toks
        WHERE prev IS NOT NULL GROUP BY 1)
SELECT s.doc_id,
       CAST(floor(SUM(CASE WHEN s.prev IS NULL
           THEN CAST(floor(-ln(u.c1 * 1.0 / t.t) * 1e6) AS BIGINT)
           ELSE CAST(floor(-ln(b.c2 * 1.0 / l.cl) * 1e6) AS BIGINT)
           END) / count(*)) AS BIGINT) AS surprisal2_x1e6
FROM toks s
JOIN uni u ON s.tok = u.tok
LEFT JOIN big b ON s.prev = b.prev AND s.tok = b.tok
LEFT JOIN lft l ON s.prev = l.prev
CROSS JOIN tot t
GROUP BY s.doc_id ORDER BY s.doc_id
"""


# ---------------------------------------------------------------------------
# pretraining sequence packing (concat-and-chunk) efficiency stats
# ---------------------------------------------------------------------------

_SEQ_LEN = 128


def pack_sequences(spark: SparkSession, sf_dir: str,
                   seq_len: int = _SEQ_LEN) -> DataFrame:
    """GPT-style packing: per language, concatenate all documents'
    token streams in doc_id order and cut fixed seq_len training
    sequences. Reports, per lang: docs, total tokens, sequence count,
    last-sequence fill, and how many documents SPAN a sequence
    boundary (the rows a boundary-respecting packer would have to
    pad around — the padding-vs-fragmentation tradeoff number).

    Scale shape: token counting is a map-only projection (no
    explode — F.size on the split); the running offset is ONE window
    cumsum per lang partition over (doc_id-ordered) int rows; the
    rollup is a map-side-combinable groupBy(lang). The document text
    itself never enters the window exchange."""
    from .dedup import _documents
    from pyspark.sql import Window
    docs = _documents(spark, sf_dir)
    n = F.size(_tokens(F.col("text")))
    w = (Window.partitionBy("lang").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    d = (docs.select("lang", "doc_id", n.alias("n"))
         .withColumn("endo", F.sum("n").over(w))
         .withColumn("starto", F.col("endo") - F.col("n")))
    L = F.lit(seq_len)
    spans = (F.col("n") > 0) & (
        F.floor(F.col("starto") / L) != F.floor((F.col("endo") - 1) / L))
    return (d.groupBy("lang")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n").cast("bigint").alias("total_tokens"),
                 F.ceil(F.sum("n") / L).cast("bigint").alias("n_seqs"),
                 (F.sum("n") - (F.ceil(F.sum("n") / L) - 1) * L)
                 .cast("bigint").alias("last_fill"),
                 F.sum(spans.cast("int")).cast("bigint")
                 .alias("n_spanning"))
            .orderBy("lang"))


PACK_SEQUENCES_SQL = f"""
WITH d AS (
  SELECT lang, doc_id,
         len(regexp_split_to_array(trim(lower(text)), '\\s+')) AS n
  FROM documents
),
o AS (
  SELECT lang, doc_id, n,
         SUM(n) OVER (PARTITION BY lang ORDER BY doc_id
                      ROWS UNBOUNDED PRECEDING) AS endo
  FROM d
)
SELECT lang, count(*) AS n_docs,
       CAST(sum(n) AS BIGINT) AS total_tokens,
       CAST(ceil(sum(n) / {_SEQ_LEN}.0) AS BIGINT) AS n_seqs,
       CAST(sum(n) - (ceil(sum(n) / {_SEQ_LEN}.0) - 1) * {_SEQ_LEN} AS BIGINT)
         AS last_fill,
       CAST(SUM(CASE WHEN n > 0 AND
                floor((endo - n) / {_SEQ_LEN}.0) <> floor((endo - 1) / {_SEQ_LEN}.0)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_spanning
FROM o GROUP BY lang ORDER BY lang
"""


# ---------------------------------------------------------------------------
# RAG chunking: fixed-window token chunks with stride
# ---------------------------------------------------------------------------

_CHUNK_W = 64       # window tokens
_CHUNK_S = 48       # stride (W - S = 16 tokens overlap)


def chunk_windows(spark: SparkSession, sf_dir: str,
                  w: int = _CHUNK_W, s: int = _CHUNK_S) -> DataFrame:
    """Split every document into overlapping token windows (size w,
    stride s) with stable chunk ids and a content fingerprint — the
    retrieval-indexing step of a RAG pipeline. Emits (doc_id,
    chunk_no, start_tok, n_tok, chunk_md5) ordered.

    Scale shape: map-only — split, generate start offsets with
    sequence(), explode, slice; no shuffle at all until the output
    sort (which a real pipeline wouldn't do — it's oracle ordering).
    A document yields ceil(max(n-w+s,1)/s)-ish rows; the text rides
    only within its original partition."""
    from .dedup import _documents
    docs = _documents(spark, sf_dir)
    toks = _tokens(F.col("text"))
    n = F.size(toks)
    starts = F.filter(
        F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(s)),
        lambda st: st < n)
    d = (docs.select("doc_id", toks.alias("toks"), n.alias("n"),
                     F.posexplode(starts).alias("chunk_no", "start_tok")))
    chunk = F.slice(F.col("toks"), F.col("start_tok") + 1, w)
    return (d.select("doc_id", "chunk_no", "start_tok",
                     F.size(chunk).alias("n_tok"),
                     F.md5(F.array_join(chunk, " ")).alias("chunk_md5"))
            .orderBy("doc_id", "chunk_no"))


CHUNK_WINDOWS_SQL = f"""
WITH d AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
  FROM documents
),
st AS (
  SELECT doc_id, toks, len(toks) AS n,
         unnest(range(0, greatest(len(toks) - 1, 0) + 1, {_CHUNK_S}))
           AS start_tok,
         generate_subscripts(range(0, greatest(len(toks) - 1, 0) + 1,
                                   {_CHUNK_S}), 1) - 1 AS chunk_no
  FROM d
)
SELECT doc_id, chunk_no, start_tok,
       CAST(len(list_slice(toks, start_tok + 1,
                           least(start_tok + {_CHUNK_W}, n))) AS INT)
         AS n_tok,
       md5(array_to_string(list_slice(toks, start_tok + 1,
                           least(start_tok + {_CHUNK_W}, n)), ' '))
         AS chunk_md5
FROM st WHERE start_tok < n
ORDER BY doc_id, chunk_no
"""


# ---------------------------------------------------------------------------
# DSIR importance weights (Xie et al., "Data Selection for Language
# Models via Importance Resampling", NeurIPS 2023): score every raw
# document by how target-domain-like its hashed n-gram distribution is.
# ---------------------------------------------------------------------------

_DSIR_DIM = 512            # hashed feature buckets (unigram + bigram)
_DSIR_SCALE = 1_000_000    # fixed-point scale for per-feature log-ratio


def _dsir_features(docs):
    """(doc_id, lang, bucket) rows: hashed unigram AND bigram features
    of each document, polyhash -> bucket (same rolling hash as
    ``fingerprints`` so both engines bucket identically)."""
    toks = _tokens(F.col("text"))
    uni = toks
    big = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit("_"), b))
    feats = F.filter(F.concat(uni, big), lambda t: F.length(t) > 0)
    polyhash = F.aggregate(
        F.split(F.col("feat"), ""),
        F.lit(0).cast("bigint"),
        lambda acc, ch: (acc * FP_BASE + F.ascii(ch)) % FP_MOD)
    return (docs.select("doc_id", "lang",
                        F.explode(feats).alias("feat"))
            .select("doc_id", "lang", (polyhash % _DSIR_DIM)
                    .alias("bucket")))


def dsir_weights(spark: SparkSession, sf_dir: str,
                 target_lang: str = "en") -> DataFrame:
    """Per-document DSIR importance weight: sum over the doc's hashed
    unigram+bigram features of the add-one-smoothed log probability
    ratio between the target domain (here: ``lang == target_lang``
    documents, standing in for the curated target corpus) and the raw
    corpus. Positive = more target-like than the corpus average.

    Fixed-point discipline (same as bm25/surprisal): the per-FEATURE
    log-ratio is floored to integer millionths BEFORE the per-doc sum,
    so the aggregate is exact integer arithmetic in both engines.

    Scale shape: two bucket-keyed aggregations whose output is
    feature-dim-sized (map-side combine collapses each partition to
    <= _DSIR_DIM partial rows); the log-ratio table (512 rows) is
    broadcast-joined onto the exploded feature stream; ONE doc-keyed
    exchange carries the partially-summed weights. At 10^12 docs the
    only large movement is that final map-side-combined sum — the
    estimator itself costs two tiny aggregations, exactly why DSIR is
    the standard cheap data-selection pass before expensive training.
    """
    from .dedup import _documents
    docs = _documents(spark, sf_dir)  # re-split tiny single-file input to cores
    # materialize the hashed feature stream once: three consumers (raw
    # counts, target counts, the final per-doc sum) each re-ran the
    # char-fold polyhash over every feature otherwise
    f = _dsir_features(docs).localCheckpoint()
    raw = f.groupBy("bucket").agg(F.count("*").alias("cr"))
    tgt = (f.filter(F.col("lang") == target_lang)
           .groupBy("bucket").agg(F.count("*").alias("ct")))
    tot = (raw.agg(F.sum("cr").alias("tr")).crossJoin(
        f.filter(F.col("lang") == target_lang)
        .agg(F.count("*").alias("tt"))))
    lr = (raw.join(tgt, "bucket", "left")
          .withColumn("ct", F.coalesce("ct", F.lit(0)))
          .crossJoin(F.broadcast(tot))
          .select(
              "bucket",
              F.floor(_DSIR_SCALE * (
                  F.log(F.col("ct") + 1) - F.log(F.col("tt") + _DSIR_DIM)
                  - F.log(F.col("cr") + 1) + F.log(F.col("tr") + _DSIR_DIM)))
              .cast("bigint").alias("lr")))
    return (f.join(F.broadcast(lr), "bucket")
            .groupBy("doc_id")
            .agg(F.sum("lr").cast("bigint").alias("dsir_w"))
            .orderBy("doc_id"))


DSIR_SQL = f"""
WITH feats AS (
  SELECT doc_id, lang, f.feat
  FROM (
    SELECT doc_id, lang,
           list_concat(
             toks,
             [toks[i] || '_' || toks[i+1] for i in range(1, len(toks))]
           ) AS fl
    FROM (SELECT doc_id, lang,
                 regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
          FROM documents)
  ), unnest(fl) AS f(feat)
  WHERE length(f.feat) > 0
), fb AS (
  SELECT doc_id, lang,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
           [CAST(ascii(c) AS BIGINT) for c in regexp_split_to_array(feat, '')]),
           (acc, ch) -> (acc * {FP_BASE} + ch) % {FP_MOD}) % {_DSIR_DIM}
           AS bucket
  FROM feats
), raw AS (
  SELECT bucket, count(*) AS cr FROM fb GROUP BY bucket
), tgt AS (
  SELECT bucket, count(*) AS ct FROM fb WHERE lang = 'en' GROUP BY bucket
), tot AS (
  SELECT (SELECT count(*) FROM fb) AS tr,
         (SELECT count(*) FROM fb WHERE lang = 'en') AS tt
), lr AS (
  SELECT raw.bucket,
         CAST(floor({_DSIR_SCALE} * (
           ln(COALESCE(ct, 0) + 1) - ln(tt + {_DSIR_DIM})
           - ln(cr + 1) + ln(tr + {_DSIR_DIM}))) AS BIGINT) AS lr
  FROM raw LEFT JOIN tgt ON raw.bucket = tgt.bucket CROSS JOIN tot
)
SELECT fb.doc_id, CAST(SUM(lr.lr) AS BIGINT) AS dsir_w
FROM fb JOIN lr ON fb.bucket = lr.bucket
GROUP BY fb.doc_id ORDER BY fb.doc_id
"""


# ---------------------------------------------------------------------------
# distributed linear-probe training: full-batch gradient descent in
# exact integer fixed point (deterministic, value-checkable training)
# ---------------------------------------------------------------------------

_LP_DIM = 64          # hashed feature buckets
_LP_ITERS = 8         # unrolled GD iterations
_LP_SCALE = 1_000_000


# integer step division: Spark's `div` and DuckDB's `//` BOTH truncate
# toward zero (verified: -7//2 = -3 in DuckDB), so plain `div` keeps
# the two engines bit-identical on negative gradients.
_LP_FLOORDIV = "({a}) div ({b})"


def train_linear_probe(spark: SparkSession, sf_dir: str,
                       iters: int = _LP_ITERS) -> DataFrame:
    """Train a least-squares linear classifier (lang=='en' probe) on
    hashed token-count features by FULL-BATCH gradient descent carried
    out entirely in integer fixed point — the training counterpart of
    ``hash_classifier``'s serving path, and the degenerate-but-exact
    member of the distributed-training family (full-batch GD is the
    one SGD variant whose result is independent of partitioning and
    visit order, because each step is a pure corpus aggregation).

        w_b <- w_b - floor( sum_d x_db * (score_d - y_d*S) / norm )
        score_d = sum_b x_db * w_b ,  norm = sum x^2 (constant)

    Every quantity is int64; divisions are explicit floor-divisions
    (emulated in Spark, native `//` in DuckDB), so the learned weights
    are bit-identical in both engines and across any cluster size.

    Scale shape per iteration: one broadcast join of the 64-row weight
    vector onto the (doc, bucket, x) feature table, one doc-keyed
    partial-agg sum (scores), one bucket-keyed partial-agg sum
    (gradient, output = dim rows). Nothing driver-side except the loop
    counter; at 10^12 docs each step is two map-side-combined
    aggregations — exactly how parameter-server-free full-batch
    distributed training is shaped.
    """
    from .dedup import _documents
    docs = _documents(spark, sf_dir)  # re-split tiny single-file input to cores
    toks = (docs.select("doc_id", "lang",
                        F.explode(_tokens(F.col("text"))).alias("tok"))
            .filter(F.length("tok") > 0))
    polyhash = F.aggregate(
        F.split(F.col("tok"), ""),
        F.lit(0).cast("bigint"),
        lambda acc, ch: (acc * FP_BASE + F.ascii(ch)) % FP_MOD)
    fb = (toks.select("doc_id", "lang", (polyhash % _LP_DIM).alias("bucket"))
          .groupBy("doc_id", "lang", "bucket")
          .agg(F.count("*").cast("bigint").alias("x"))
          .localCheckpoint())
    labels = (fb.select("doc_id", "lang").distinct()
              .select("doc_id",
                      F.when(F.col("lang") == "en", F.lit(1))
                      .otherwise(F.lit(0)).cast("bigint").alias("y")))
    norm = fb.agg(F.sum(F.col("x") * F.col("x")).alias("nrm"))
    w = (spark.range(_LP_DIM).select(F.col("id").alias("bucket"),
                                     F.lit(0).cast("bigint").alias("w"))
         .localCheckpoint())
    for _ in range(iters):
        scores = (fb.join(F.broadcast(w), "bucket")
                  .groupBy("doc_id")
                  .agg(F.sum(F.col("x") * F.col("w")).alias("score")))
        resid = (scores.join(labels, "doc_id")
                 .select("doc_id",
                         (F.col("score") - F.col("y") * _LP_SCALE)
                         .alias("r")))
        grad = (fb.join(resid, "doc_id")
                .groupBy("bucket")
                .agg(F.sum(F.col("x") * F.col("r")).alias("g")))
        step = _LP_FLOORDIV.format(a="coalesce(g, 0L)", b="nrm")
        w = (w.join(grad, "bucket", "left")
             .crossJoin(F.broadcast(norm))
             .select("bucket",
                     (F.col("w") - F.expr(step)).alias("w"))
             .localCheckpoint())
    return w.orderBy("bucket")


def _lp_iter_sql(k: int) -> str:
    prev = f"w{k - 1}"
    return f"""sc{k} AS (
  SELECT fb.doc_id, sum(fb.x * {prev}.w) AS score
  FROM fb JOIN {prev} ON fb.bucket = {prev}.bucket
  GROUP BY fb.doc_id
),
rs{k} AS (
  SELECT sc{k}.doc_id, sc{k}.score - labels.y * {_LP_SCALE} AS r
  FROM sc{k} JOIN labels ON sc{k}.doc_id = labels.doc_id
),
gr{k} AS (
  SELECT fb.bucket, sum(fb.x * rs{k}.r) AS g
  FROM fb JOIN rs{k} ON fb.doc_id = rs{k}.doc_id
  GROUP BY fb.bucket
),
w{k} AS (
  SELECT {prev}.bucket,
         {prev}.w - (COALESCE(gr{k}.g, 0) // (SELECT nrm FROM norm))
           AS w
  FROM {prev} LEFT JOIN gr{k} ON {prev}.bucket = gr{k}.bucket
)"""


LINEAR_PROBE_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang, t.tok
  FROM documents,
       unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS t(tok)
  WHERE length(t.tok) > 0
),
fb AS (
  SELECT doc_id, lang,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
           [CAST(ascii(c) AS BIGINT) for c in regexp_split_to_array(tok, '')]),
           (acc, ch) -> (acc * {FP_BASE} + ch) % {FP_MOD}) % {_LP_DIM}
           AS bucket,
         CAST(count(*) AS BIGINT) AS x
  FROM toks GROUP BY doc_id, lang, 3
),
labels AS (
  SELECT DISTINCT doc_id,
         CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT) AS y
  FROM fb
),
norm AS (SELECT sum(x * x) AS nrm FROM fb),
w0 AS (
  SELECT CAST(range AS BIGINT) AS bucket, CAST(0 AS BIGINT) AS w
  FROM range(0, {_LP_DIM})
),
__ITERS__
SELECT bucket, CAST(w AS BIGINT) AS w FROM w{_LP_ITERS} ORDER BY bucket
""".replace("__ITERS__", ",\n".join(_lp_iter_sql(k)
                                    for k in range(1, _LP_ITERS + 1)))


# ---------------------------------------------------------------------------
# data-mixture rebalancing: deterministic downsampling to a target
# per-domain token share (the "data recipe" step of LLM corpus prep)
# ---------------------------------------------------------------------------

# target token shares in ppm (parts per million); domains absent from
# the recipe keep nothing — the recipe IS the corpus definition.
_MIX_TARGET_PPM = {"en": 500_000, "de": 200_000,
                   "fr": 200_000, "es": 100_000}


def domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rebalance the corpus to a target per-language token mixture by
    deterministic hash-threshold sampling — the data-recipe pass every
    LLM pretraining pipeline runs between cleaning and packing (the
    mixture tables in the LLaMA / Gopher / The-Pile reports).

    For each domain d with raw token count T_d, the most
    over-represented-vs-target domain is kept in full (rate 1e6 ppm)
    and every other domain is kept at

        rate_d = min(1e6, target_d/share_bound * T_total / T_d)

    computed so the realized mixture approaches the target from below
    without UP-sampling (no duplication — the conservative recipe).
    Acceptance is per-document and deterministic: keep iff
    pmod(polyhash(doc_id), 1e6) < rate_d, so ANY engine, partitioning
    or corpus order selects the identical subset — reproducible data
    recipes are exactly this property.

    Scale shape: the per-domain token census is one map-side-combined
    aggregation (domain-count rows); rates join back as a broadcast;
    the keep-filter is pure codegen. Output: per-domain
    (n_docs_kept, tokens_kept, rate_ppm) — the recipe audit table."""
    docs = _documents(spark, sf_dir)
    toks = (docs.select("doc_id", "lang",
                        F.size(_tokens(F.col("text"))).cast("bigint")
                        .alias("n_tok")))
    census = toks.groupBy("lang").agg(F.sum("n_tok").alias("t_d"))
    total = census.agg(F.sum("t_d").alias("t_all"))
    tgt = F.create_map(*[F.lit(x) for kv in _MIX_TARGET_PPM.items()
                         for x in kv])
    rates = (census.crossJoin(F.broadcast(total))
             .withColumn("tgt_ppm", tgt[F.col("lang")])
             .select("lang",
                     F.when(F.col("tgt_ppm").isNull(),
                            F.lit(0).cast("bigint"))
                     .otherwise(F.least(
                         F.lit(1_000_000).cast("bigint"),
                         F.expr("(t_all * tgt_ppm) div t_d")
                         .cast("bigint")))
                     .alias("rate_ppm")))
    h = F.pmod(F.col("doc_id") * 2654435761 + 12345, F.lit(1_000_000))
    kept = (toks.join(F.broadcast(rates), "lang")
            .filter(h < F.col("rate_ppm")))
    return (kept.groupBy("lang", "rate_ppm")
            .agg(F.count("*").cast("bigint").alias("n_docs_kept"),
                 F.sum("n_tok").cast("bigint").alias("tokens_kept"))
            .select("lang", F.col("rate_ppm").cast("bigint"),
                    "n_docs_kept", "tokens_kept")
            .orderBy("lang"))


def domain_mix_sql() -> str:
    cases = " ".join(
        f"WHEN '{k}' THEN {v}" for k, v in _MIX_TARGET_PPM.items())
    return f"""
WITH toks AS (
  SELECT doc_id, lang,
         CAST(len(regexp_split_to_array(trim(lower(text)), '\\s+'))
              AS BIGINT) AS n_tok
  FROM documents
),
census AS (SELECT lang, sum(n_tok) AS t_d FROM toks GROUP BY lang),
total AS (SELECT sum(t_d) AS t_all FROM census),
rates AS (
  SELECT lang,
         CASE WHEN tgt_ppm IS NULL THEN 0
              ELSE LEAST(1000000, (t_all * tgt_ppm) // t_d) END
           AS rate_ppm
  FROM (SELECT lang, t_d,
               CASE lang {cases} END AS tgt_ppm
        FROM census) CROSS JOIN total
),
kept AS (
  SELECT t.lang, r.rate_ppm, t.n_tok
  FROM toks t JOIN rates r ON t.lang = r.lang
  WHERE ((t.doc_id * 2654435761 + 12345) % 1000000 + 1000000) % 1000000
        < r.rate_ppm
)
SELECT lang, CAST(rate_ppm AS BIGINT) AS rate_ppm,
       CAST(count(*) AS BIGINT) AS n_docs_kept,
       CAST(sum(n_tok) AS BIGINT) AS tokens_kept
FROM kept GROUP BY lang, rate_ppm ORDER BY lang
"""


# ---------------------------------------------------------------------------
# compression-ratio quality signal (zlib entropy proxy)
# ---------------------------------------------------------------------------

_ZR_LEVEL = 6  # fixed level => deterministic bytes for a given zlib


def compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document zlib compression ratio — the entropy-proxy quality
    signal production corpus filters use to drop boilerplate/spam
    (highly repetitive pages compress far below prose; cf. the
    repetition heuristics in the Gopher/RefinedWeb filter stacks,
    which this complements with a single codec-level number).

    This is a deliberate Python (Arrow-batched mapInPandas) operator:
    no JVM builtin exposes a codec, and a per-batch C zlib call is the
    right cost model — one Python task per Arrow batch, zero per-row
    overhead, nothing but (doc_id, 3 ints) crosses back. Ratio is
    integer fixed point (compressed*1e6 div raw). Deterministic for a
    fixed zlib level, so the driver digest is frozen the same way the
    media-codec features are."""
    import pandas as pd

    docs = _documents(spark, sf_dir) \
        .select("doc_id", "text")

    def batches(it):
        import zlib
        for pdf in it:
            raw = pdf["text"].str.encode("utf-8")
            comp = raw.map(lambda b: len(zlib.compress(b, _ZR_LEVEL)))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "raw_len": raw.str.len().astype("int64"),
                "comp_len": comp.astype("int64")})

    out = docs.mapInPandas(
        batches, "doc_id bigint, raw_len bigint, comp_len bigint")
    return (out.select(
        "doc_id", "raw_len", "comp_len",
        F.expr("(comp_len * 1000000) div raw_len").alias("ratio_ppm"))
        .orderBy("doc_id"))


def compression_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver digest: corpus-level compression stats + per-doc
    checksum (bit_xor of doc_id*ratio mix) — frozen-VALUES oracle."""
    cr = compression_ratio(spark, sf_dir)
    return (cr.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("raw_len").cast("bigint").alias("sum_raw"),
        F.sum("comp_len").cast("bigint").alias("sum_comp"),
        F.expr("bit_xor(doc_id * 1048583 + ratio_ppm)").cast("bigint")
        .alias("checksum")))


# ---------------------------------------------------------------------------
# contrastive training-pair mining (embedding-model data prep)
# ---------------------------------------------------------------------------

_CTR_B = 32  # negative-sampling buckets


def contrastive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mine (anchor, positive, negative) training triplets for a
    text-embedding model from the chunk index — the SimCSE/E5-style
    data-prep pass: positive = the next overlapping window of the SAME
    document (adjacent strides share w-s tokens — related by
    construction); negative = a deterministic hash-picked chunk of a
    DIFFERENT document.

    Negative selection is bucket-local, not global: chunks hash into
    _CTR_B buckets, each bucket pre-aggregates its two lexicographic-
    min fingerprints from DISTINCT documents, and every anchor joins
    its hash-assigned bucket and takes whichever representative is
    from another document. No global row numbering (a total-order
    window would serialize), no RNG; the bucket-reps table is
    _CTR_B-sized and broadcast.

    Output: (doc_id, chunk_no, anchor_md5, pos_md5, neg_md5, neg_doc)
    — anchors whose assigned bucket holds only their own document are
    dropped (deterministically rare at corpus scale)."""
    chunks = chunk_windows(spark, sf_dir).select(
        "doc_id", "chunk_no", "chunk_md5")

    def poly(col):
        return F.aggregate(
            F.split(col, ""),
            F.lit(0).cast("bigint"),
            lambda acc, ch: (acc * FP_BASE + F.ascii(ch)) % FP_MOD)

    from pyspark.sql import Window
    w = Window.partitionBy("doc_id").orderBy("chunk_no")
    anch = (chunks
            .withColumn("pos_md5", F.lead("chunk_md5").over(w))
            .filter(F.col("pos_md5").isNotNull()))
    bch = chunks.withColumn("bucket", poly(F.col("chunk_md5")) % _CTR_B)
    r1 = (bch.groupBy("bucket")
          .agg(F.min("chunk_md5").alias("m1"),
               F.min_by("doc_id", "chunk_md5").alias("d1")))
    r2 = (bch.join(r1, "bucket")
          .filter(F.col("doc_id") != F.col("d1"))
          .groupBy("bucket")
          .agg(F.min("chunk_md5").alias("m2"),
               F.min_by("doc_id", "chunk_md5").alias("d2")))
    reps = r1.join(r2, "bucket", "left")
    abucket = poly(F.concat_ws("#", F.col("doc_id"), F.col("chunk_no"))) \
        % _CTR_B
    joined = (anch.withColumn("bucket", abucket)
              .join(F.broadcast(reps), "bucket"))
    neg_md5 = F.when(F.col("d1") != F.col("doc_id"), F.col("m1")) \
        .otherwise(F.col("m2"))
    neg_doc = F.when(F.col("d1") != F.col("doc_id"), F.col("d1")) \
        .otherwise(F.col("d2"))
    return (joined.select("doc_id", "chunk_no",
                          F.col("chunk_md5").alias("anchor_md5"),
                          "pos_md5", neg_md5.alias("neg_md5"),
                          neg_doc.cast("bigint").alias("neg_doc"))
            .filter(F.col("neg_md5").isNotNull())
            .orderBy("doc_id", "chunk_no"))


CONTRASTIVE_SQL = f"""
WITH chunks AS (
  SELECT doc_id, chunk_no, chunk_md5 FROM ({{chunks}})
),
poly AS (
  SELECT doc_id, chunk_no, chunk_md5,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
           [CAST(ascii(c) AS BIGINT)
            for c in regexp_split_to_array(chunk_md5, '')]),
           (acc, ch) -> (acc * {FP_BASE} + ch) % {FP_MOD}) % {_CTR_B}
           AS bucket
  FROM chunks
),
anch AS (
  SELECT doc_id, chunk_no, chunk_md5,
         lead(chunk_md5) OVER (PARTITION BY doc_id ORDER BY chunk_no)
           AS pos_md5,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
           [CAST(ascii(c) AS BIGINT) for c in regexp_split_to_array(
              doc_id || '#' || chunk_no, '')]),
           (acc, ch) -> (acc * {FP_BASE} + ch) % {FP_MOD}) % {_CTR_B}
           AS bucket
  FROM chunks
),
r1 AS (
  SELECT bucket, min(chunk_md5) AS m1,
         arg_min(doc_id, chunk_md5) AS d1
  FROM poly GROUP BY bucket
),
r2 AS (
  SELECT p.bucket, min(p.chunk_md5) AS m2,
         arg_min(p.doc_id, p.chunk_md5) AS d2
  FROM poly p JOIN r1 ON p.bucket = r1.bucket
  WHERE p.doc_id <> r1.d1
  GROUP BY p.bucket
)
SELECT a.doc_id, a.chunk_no, a.chunk_md5 AS anchor_md5, a.pos_md5,
       CASE WHEN r1.d1 <> a.doc_id THEN r1.m1 ELSE r2.m2 END AS neg_md5,
       CAST(CASE WHEN r1.d1 <> a.doc_id THEN r1.d1 ELSE r2.d2 END
            AS BIGINT) AS neg_doc
FROM anch a JOIN r1 ON a.bucket = r1.bucket
LEFT JOIN r2 ON a.bucket = r2.bucket
WHERE a.pos_md5 IS NOT NULL
  AND (CASE WHEN r1.d1 <> a.doc_id THEN r1.m1 ELSE r2.m2 END)
      IS NOT NULL
ORDER BY a.doc_id, a.chunk_no
"""


def contrastive_sql() -> str:
    return CONTRASTIVE_SQL.format(
        chunks=CHUNK_WINDOWS_SQL.replace(
            "ORDER BY doc_id, chunk_no", ""))


# ---------------------------------------------------------------------------
# token co-occurrence PMI (association mining over the corpus)
# ---------------------------------------------------------------------------

_PMI_V = 40          # vocabulary cap: top-V tokens by document frequency
_PMI_MIN_PAIR = 5    # pair support floor
_PMI_SCALE = 1_000_000


def cooc_pmi(spark: SparkSession, sf_dir: str,
             v: int = _PMI_V, min_pair: int = _PMI_MIN_PAIR) -> DataFrame:
    """Document-level token co-occurrence with an exact-rational PMI
    lift: lift_fp = floor(N * c12 * SCALE / (c1 * c2)) — all-integer,
    so the score is hash-identical cross-engine (ln() would round
    differently in the last ulp between libm builds; the monotone
    rational lift avoids floats entirely).

    Scale shape: the vocabulary is CAPPED at the top-`v` tokens by
    document frequency (min_by-free: one partial-agg count + a top-k
    that is v rows) and broadcast; the pair generation self-joins the
    vocab-restricted doc-term table ON doc_id, so per-doc work is
    bounded by v^2 and the pair aggregation is map-side combinable.
    Nothing in the plan carries more than (docs x v) rows."""
    docs = _documents(spark, sf_dir)
    dt = (docs.select("doc_id",
                      F.explode(_tokens(F.col("text"))).alias("tok"))
          .distinct())
    dfreq = dt.groupBy("tok").agg(F.count("*").alias("c"))
    vocab = F.broadcast(
        dfreq.orderBy(F.desc("c"), F.asc("tok")).limit(v))
    dtv = dt.join(vocab, "tok").select("doc_id", "tok", "c")
    n_docs = docs.select(F.count("*").alias("n"))
    l, r = dtv.alias("l"), dtv.alias("r")
    pairs = (l.join(r, (F.col("l.doc_id") == F.col("r.doc_id"))
                    & (F.col("l.tok") < F.col("r.tok")))
             .groupBy(F.col("l.tok").alias("t1"),
                      F.col("r.tok").alias("t2"),
                      F.col("l.c").alias("c1"),
                      F.col("r.c").alias("c2"))
             .agg(F.count("*").alias("c12"))
             .filter(F.col("c12") >= min_pair))
    return (pairs.crossJoin(F.broadcast(n_docs))
            .select("t1", "t2", "c1", "c2", "c12",
                    F.expr(f"n * c12 * {_PMI_SCALE} div (c1 * c2)")
                    .alias("lift_fp"))
            .orderBy(F.desc("lift_fp"), "t1", "t2"))


COOC_PMI_SQL = f"""
WITH dt AS (
  SELECT DISTINCT doc_id, unnest(
    regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
  FROM documents
),
dfreq AS (SELECT tok, COUNT(*) AS c FROM dt GROUP BY tok),
vocab AS (SELECT tok, c FROM dfreq ORDER BY c DESC, tok ASC LIMIT {_PMI_V}),
dtv AS (SELECT dt.doc_id, dt.tok, v.c FROM dt JOIN vocab v USING (tok)),
n AS (SELECT COUNT(*) AS n FROM documents),
pairs AS (
  SELECT l.tok AS t1, r.tok AS t2, l.c AS c1, r.c AS c2,
         COUNT(*) AS c12
  FROM dtv l JOIN dtv r ON l.doc_id = r.doc_id AND l.tok < r.tok
  GROUP BY l.tok, r.tok, l.c, r.c
  HAVING COUNT(*) >= {_PMI_MIN_PAIR}
)
SELECT t1, t2, CAST(c1 AS BIGINT) AS c1, CAST(c2 AS BIGINT) AS c2,
       CAST(c12 AS BIGINT) AS c12,
       CAST(n.n * c12 * {_PMI_SCALE} // (c1 * c2) AS BIGINT) AS lift_fp
FROM pairs, n
ORDER BY lift_fp DESC, t1, t2
"""


# ---------------------------------------------------------------------------
# per-language percentile quality filter (bottom-decile drop)
# ---------------------------------------------------------------------------

def percentile_filter(spark: SparkSession, sf_dir: str,
                      drop_pct: int = 10) -> DataFrame:
    """CCNet-style per-language percentile gate: drop the bottom
    `drop_pct`% of each language by an integer quality score (here
    stopword-ratio x1000, ties broken by doc_id so the cut is
    deterministic). Exact integer rank semantics — a doc is dropped
    iff rank <= n * drop_pct // 100 under (score, doc_id) — so two
    engines and any two cluster sizes agree on MEMBERSHIP, not just
    counts (the same discipline as train_test_split).

    Plan: one lang-partitioned rank window + one lang count over the
    same exchange; the verdict is a codegen comparison. At 10^12 docs
    the window is per-language (the natural partition) — skewed
    languages shard with the same salting recipe as any hot key."""
    docs = _documents(spark, sf_dir)
    toks = _tokens(F.col("text"))
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*LANG_MARKERS["en"])))
    scored = docs.select(
        "doc_id", "lang",
        F.floor((stop_hits * 1000) / F.size(toks)).cast("bigint")
        .alias("score"))
    from pyspark.sql import Window
    w = Window.partitionBy("lang").orderBy("score", "doc_id")
    ranked = (scored
              .withColumn("rn", F.row_number().over(w))
              .withColumn("n", F.count("*").over(Window.partitionBy("lang"))))
    return (ranked.select(
        "doc_id", "lang", "score",
        (F.col("rn") <= F.expr(f"n * {drop_pct} div 100")).alias("dropped"))
        .orderBy("doc_id"))


PERCENTILE_FILTER_SQL = """
WITH scored AS (
  SELECT doc_id, lang,
         CAST(floor(len(list_filter(
             regexp_split_to_array(trim(lower(text)), '\\s+'), x -> x IN
             ('the','and','of','to','in','is','that','with','for','was')))
             * 1000.0 /
             len(regexp_split_to_array(trim(lower(text)), '\\s+')))
           AS BIGINT) AS score
  FROM documents
), ranked AS (
  SELECT doc_id, lang, score,
         row_number() OVER (PARTITION BY lang ORDER BY score, doc_id) AS rn,
         count(*) OVER (PARTITION BY lang) AS n
  FROM scored
)
SELECT doc_id, lang, score, rn <= n * 10 // 100 AS dropped
FROM ranked ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# curation funnel: the composed training-data pipeline, counted per stage
# ---------------------------------------------------------------------------

def curation_funnel(spark: SparkSession, sf_dir: str,
                    cap_per_lang: int = 50) -> DataFrame:
    """The end-to-end data-curation pipeline as ONE composed plan with
    per-stage survivor accounting (the report every corpus release
    publishes — C4/RefinedWeb/FineWeb all lead with this table):

      s1 quality gate  — 20 <= tokens <= 1000 and mean token length
                          in [3, 10) (integer x1000 semantics);
      s2 exact dedup   — keep-first by md5(text), first = min doc_id;
      s3 decontaminate — drop the held-out 'test' split (md5 threshold,
                          same rule as train_test_split);
      s4 per-lang cap  — smallest-k md5(doc_id) per language (same
                          rule as stratified_sample).

    Stages are CUMULATIVE (a doc is counted at s_k only if it survived
    s_1..s_{k-1}), and every verdict is deterministic MEMBERSHIP, so
    the whole funnel value-checks cross-engine.

    Plan shape: one md5(text) window for the dedup verdict, one
    lang window for the cap rank (computed over survivors), one final
    per-lang conditional aggregation — three exchanges total, each on
    a natural key; everything else is codegen column math."""
    from pyspark.sql import Window
    docs = _documents(spark, sf_dir)
    toks = _tokens(F.col("text"))
    n_tok = F.size(toks)
    mean_len_x1000 = F.floor(
        F.length(F.regexp_replace(F.trim(F.lower("text")), r"\s+", ""))
        * F.lit(1000) / n_tok).cast("bigint")
    d = docs.select(
        "doc_id", "lang", "text",
        ((n_tok >= 20) & (n_tok <= 1000)
         & (mean_len_x1000 >= 3000) & (mean_len_x1000 < 10000))
        .alias("q_ok"))
    # s2: keep-first within md5(text) group, among quality survivors
    wdup = Window.partitionBy(F.md5("text"), "q_ok")
    d = d.withColumn(
        "dedup_ok", F.col("q_ok") & (F.col("doc_id") == F.min("doc_id").over(wdup)))
    # s3: decontamination = not in the held-out test split
    h8 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8)
    d = d.withColumn("decon_ok", F.col("dedup_ok") & (h8 >= "33333333"))
    # s4: per-lang cap over s3 survivors
    wcap = (Window.partitionBy("lang", "decon_ok")
            .orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id"))
    d = d.withColumn(
        "cap_ok",
        F.col("decon_ok") & (F.row_number().over(wcap) <= cap_per_lang))
    return (d.groupBy("lang")
            .agg(F.count("*").alias("n0_all"),
                 F.sum(F.col("q_ok").cast("long")).alias("n1_quality"),
                 F.sum(F.col("dedup_ok").cast("long")).alias("n2_dedup"),
                 F.sum(F.col("decon_ok").cast("long")).alias("n3_decon"),
                 F.sum(F.col("cap_ok").cast("long")).alias("n4_capped"))
            .orderBy("lang"))


CURATION_FUNNEL_SQL = """
WITH base AS (
  SELECT doc_id, lang, text,
         len(regexp_split_to_array(trim(lower(text)), '\\s+')) AS n_tok,
         CAST(floor(length(regexp_replace(trim(lower(text)), '\\s+', '', 'g'))
              * 1000.0 /
              len(regexp_split_to_array(trim(lower(text)), '\\s+')))
           AS BIGINT) AS mlen
  FROM documents
), s1 AS (
  SELECT doc_id, lang, text,
         (n_tok >= 20 AND n_tok <= 1000 AND mlen >= 3000 AND mlen < 10000)
           AS q_ok
  FROM base
), s2 AS (
  SELECT *, q_ok AND doc_id = MIN(doc_id)
             OVER (PARTITION BY md5(text), q_ok) AS dedup_ok
  FROM s1
), s3 AS (
  SELECT *, dedup_ok AND
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) >= '33333333' AS decon_ok
  FROM s2
), s4 AS (
  SELECT *, decon_ok AND
         ROW_NUMBER() OVER (PARTITION BY lang, decon_ok
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
           <= 50 AS cap_ok
  FROM s3
)
SELECT lang, COUNT(*) AS n0_all,
       CAST(SUM(CASE WHEN q_ok THEN 1 ELSE 0 END) AS BIGINT) AS n1_quality,
       CAST(SUM(CASE WHEN dedup_ok THEN 1 ELSE 0 END) AS BIGINT) AS n2_dedup,
       CAST(SUM(CASE WHEN decon_ok THEN 1 ELSE 0 END) AS BIGINT) AS n3_decon,
       CAST(SUM(CASE WHEN cap_ok THEN 1 ELSE 0 END) AS BIGINT) AS n4_capped
FROM s4 GROUP BY lang ORDER BY lang
"""


# ---------------------------------------------------------------------------
# corpus n-gram novelty (cross-document originality score)
# ---------------------------------------------------------------------------

_NOVELTY_N = 5


def novelty_scores(spark: SparkSession, sf_dir: str,
                   n: int = _NOVELTY_N) -> DataFrame:
    """Per-document n-gram NOVELTY under doc_id arrival order: the
    share of a document's distinct n-grams whose FIRST corpus
    occurrence is this document (min doc_id over the gram group).
    The cross-document originality signal curation pipelines pair
    with repetition_stats' within-document one — near-template pages
    score low, fresh content scores high.

    Exact integer ratio (x1e6) — membership-deterministic.
    Plan: gram explode -> distinct -> one gram-keyed exchange
    computing min(doc_id) per gram (map-side combinable), rejoined on
    the gram key; the final per-doc ratio is a partial-agg count
    pair. Grams are xxhash64-hashed to 8-byte ints before the exchange
    so the shuffle never carries raw text."""
    from .dedup import _documents
    docs = _documents(spark, sf_dir)  # re-split tiny single-file input to cores
    toks = _tokens(F.col("text"))
    # Short-doc guard (like _shingles_of): size < n would make
    # F.sequence descend and F.slice start at 0 -> runtime error. A
    # <n-token doc has zero n-grams and drops out — matching the
    # oracle's empty range(1, len-n+2).
    gram_arr = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, n))))
    ).otherwise(F.array().cast("array<bigint>"))
    grams = (docs.select("doc_id", F.explode(gram_arr).alias("g"))
             .distinct())
    first = grams.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    return (grams.join(first, "g")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_grams"),
                 F.sum((F.col("doc_id") == F.col("first_doc"))
                       .cast("long")).alias("n_novel"))
            .select("doc_id", "n_grams", "n_novel",
                    F.expr("n_novel * 1000000 div n_grams")
                    .alias("novelty_fp"))
            .orderBy("doc_id"))


NOVELTY_SQL = f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
  FROM documents
),
grams AS (
  SELECT DISTINCT doc_id,
         md5(array_to_string(t[i : i + {_NOVELTY_N} - 1], ' ')) AS g
  FROM toks, UNNEST(range(1, len(t) - {_NOVELTY_N} + 2)) AS u(i)
),
first AS (SELECT g, MIN(doc_id) AS first_doc FROM grams GROUP BY g)
SELECT grams.doc_id, COUNT(*) AS n_grams,
       CAST(SUM(CASE WHEN grams.doc_id = first.first_doc THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
       CAST(SUM(CASE WHEN grams.doc_id = first.first_doc THEN 1 ELSE 0 END)
            * 1000000 // COUNT(*) AS BIGINT) AS novelty_fp
FROM grams JOIN first USING (g)
GROUP BY grams.doc_id ORDER BY grams.doc_id
"""


# ---------------------------------------------------------------------------
# positional phrase search
# ---------------------------------------------------------------------------

_PHRASE = ("table", "hash")


def phrase_search(spark: SparkSession, sf_dir: str,
                  phrase=_PHRASE) -> DataFrame:
    """Exact phrase matching over a POSITIONAL inverted index: the
    posting lists of the phrase terms are equi-joined on
    (doc_id, pos + 1 = pos) — the classic IR adjacency join, which at
    corpus scale touches only the phrase terms' postings (predicate
    pushdown prunes the explode output to the two terms) instead of
    re-scanning text. Returns (doc_id, n_hits, first_pos).

    The scan keeps only the needed terms BEFORE the exchange, so the
    shuffled volume is the two posting lists, not the token stream."""
    docs = _documents(spark, sf_dir)
    pos = (docs.select("doc_id",
                       F.posexplode(_tokens(F.col("text")))
                       .alias("pos", "tok"))
           .filter(F.col("tok").isin(*phrase)))
    p1 = pos.filter(F.col("tok") == phrase[0]).select("doc_id", "pos")
    p2 = (pos.filter(F.col("tok") == phrase[1])
          .select("doc_id", (F.col("pos") - 1).alias("pos")))
    return (p1.join(p2, ["doc_id", "pos"])
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_hits"),
                 (F.min("pos") + 1).cast("bigint").alias("first_pos"))
            .orderBy("doc_id"))


PHRASE_SEARCH_SQL = f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS a
  FROM documents
),
pos AS (
  SELECT doc_id, i - 1 AS pos, a[i] AS tok
  FROM toks, UNNEST(range(1, len(a) + 1)) AS u(i)
  WHERE a[i] IN ('{_PHRASE[0]}', '{_PHRASE[1]}')
),
p1 AS (SELECT doc_id, pos FROM pos WHERE tok = '{_PHRASE[0]}'),
p2 AS (SELECT doc_id, pos - 1 AS pos FROM pos WHERE tok = '{_PHRASE[1]}')
SELECT doc_id, COUNT(*) AS n_hits,
       CAST(MIN(p1.pos) + 1 AS BIGINT) AS first_pos
FROM p1 JOIN p2 USING (doc_id, pos)
GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# RAG chunking: overlapping token windows
# ---------------------------------------------------------------------------

_CHUNK_SIZE = 64
_CHUNK_STRIDE = 48


def chunk_documents(spark: SparkSession, sf_dir: str,
                    size: int = _CHUNK_SIZE,
                    stride: int = _CHUNK_STRIDE) -> DataFrame:
    """Split every document into overlapping token-window CHUNKS — the
    retrieval-corpus preparation step of a RAG pipeline (fixed token
    budget per chunk, stride < size so context spans chunk borders).
    Chunk starts are 0, stride, 2*stride, ... while < n_tokens, each
    chunk is the next ``size`` tokens (the final ones run short), so
    every token is covered and chunk count is ceil(n/stride).

    Returns (doc_id, chunk_idx, start_tok, n_tokens, chunk_hash) —
    the md5 of the joined chunk text stands in for the chunk body so
    the checked result stays narrow; a real pipeline would carry the
    text column to the embedding stage.

    Scale shape: one narrow projection + explode, NO shuffle at all
    until the caller aggregates — chunking is embarrassingly parallel
    and Catalyst keeps it inside a single WholeStageCodegen scan. The
    explode fan-out is bounded by ceil(n_tokens/stride) per row.
    """
    docs = _documents(spark, sf_dir)
    toks = _tokens(F.col("text"))
    starts = F.when(F.size(toks) > 0,
                    F.sequence(F.lit(0), F.size(toks) - 1,
                               F.lit(stride))
                    ).otherwise(F.array().cast("array<int>"))
    return (docs.select("doc_id", toks.alias("t"),
                        F.posexplode(starts).alias("chunk_idx", "start"))
            .select("doc_id",
                    F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
                    F.col("start").cast("bigint").alias("start_tok"),
                    F.size(F.slice(F.col("t"), F.col("start") + 1,
                                   size)).cast("bigint").alias("n_tokens"),
                    F.md5(F.concat_ws(
                        " ", F.slice(F.col("t"), F.col("start") + 1, size)))
                    .alias("chunk_hash"))
            .orderBy("doc_id", "chunk_idx"))


CHUNKS_SQL = f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
  FROM documents
),
starts AS (
  SELECT doc_id, t, i AS start,
         CAST(row_number() OVER (PARTITION BY doc_id ORDER BY i) - 1
              AS BIGINT) AS chunk_idx
  FROM toks, UNNEST(range(0, len(t), {_CHUNK_STRIDE})) AS u(i)
)
SELECT doc_id, chunk_idx, CAST(start AS BIGINT) AS start_tok,
       CAST(len(t[start + 1 : start + {_CHUNK_SIZE}]) AS BIGINT) AS n_tokens,
       md5(array_to_string(t[start + 1 : start + {_CHUNK_SIZE}], ' '))
         AS chunk_hash
FROM starts
ORDER BY doc_id, chunk_idx
"""
