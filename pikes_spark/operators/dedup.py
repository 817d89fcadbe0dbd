"""Deduplication operators over the ``documents`` table.

Large-scale training-data dedup family (SURVEY round brief):
  - exact dedup            : hash groupBy on normalized text
  - MinHash + LSH          : shingle -> minhash -> band -> bucket join,
                             then EXACT-jaccard verification of the
                             LSH candidates (the standard
                             Broder/Leskovec-MMDS construction)
  - SimHash                : 64-bit simhash, Hamming<=k via block LSH
  - n-gram Jaccard         : exact pairwise (the oracle/verifier path)
  - embedding cosine       : near-dup pairs over the embeddings table

Plan-shape notes (100 TB thinking):
  - Exact dedup is one salted-safe groupBy on xxhash64(text) — the
    hash pre-aggregates map-side; no full-text shuffle (only the
    64-bit key + doc_id move).
  - MinHash signatures are computed in one vectorized pandas UDF
    (numpy (a*h+b) mod p over all shingles x permutations at once);
    band buckets explode to (band, hash) keys and self-join — the
    join key space is uniform (hash values), so no skew salting is
    needed; AQE handles residual imbalance.
  - Verification recomputes exact Jaccard ONLY for candidate pairs
    (a join back to shingle sets), so the quadratic blowup never
    happens.
"""

from __future__ import annotations

from typing import Iterator, List

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import ArrayType, LongType

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Groups of byte-identical normalized texts: (rep_doc_id, doc_id)
    for every doc in a >1-sized group. Normalization: lower + trim +
    whitespace collapse.

    Shuffle key is a 128-bit content hash (two independent xxhash64
    seeds), NOT the text itself — at 100 TB only 16 bytes + doc_id move
    through the exchange. Collision probability for 128 bits is
    ~n^2/2^129 (< 1e-15 even at 10^12 docs), so no text verify pass is
    needed; the oracle groups on the full text and agrees whenever no
    collision occurs."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    norm = F.regexp_replace(F.trim(F.lower("text")), r"\s+", " ")
    normed = docs.select("doc_id",
                         F.xxhash64(norm).alias("h1"),
                         F.xxhash64(norm, F.lit(0x9E3779B9)).alias("h2"))
    groups = (normed.groupBy("h1", "h2")
              .agg(F.min("doc_id").alias("rep_doc_id"),
                   F.count("*").alias("group_size"))
              .filter(F.col("group_size") > 1))
    return (normed.join(groups, ["h1", "h2"])
            .select("rep_doc_id", "doc_id", "group_size")
            .orderBy("rep_doc_id", "doc_id"))


EXACT_DUP_SQL = """
WITH n AS (
  SELECT doc_id, regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS norm
  FROM documents
), g AS (
  SELECT norm, min(doc_id) AS rep_doc_id, count(*) AS group_size
  FROM n GROUP BY norm HAVING count(*) > 1
)
SELECT g.rep_doc_id, n.doc_id, g.group_size
FROM n JOIN g USING (norm)
ORDER BY rep_doc_id, doc_id
"""


# ---------------------------------------------------------------------------
# shingles + exact n-gram jaccard (verifier / oracle path)
# ---------------------------------------------------------------------------

NGRAM = 3
_MERSENNE = (1 << 61) - 1
N_HASHES = 128
BANDS = 32
ROWS_PER_BAND = N_HASHES // BANDS
JACCARD_T = 0.8


def shingle_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingles:array<string>) — distinct word 3-grams of the
    normalized text, built with Catalyst transform (no UDF)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.split(F.regexp_replace(F.trim(F.lower("text")), r"\s+", " "), " ")
    n = F.size(toks)
    grams = F.when(n >= NGRAM, F.array_distinct(F.transform(
        F.sequence(F.lit(0), n - NGRAM),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, NGRAM)),
    ))).otherwise(F.array(F.concat_ws(" ", toks)))
    return docs.select("doc_id", grams.alias("shingles"))


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str,
                        threshold: float = JACCARD_T) -> DataFrame:
    """Exact all-pairs word-3-gram Jaccard >= threshold (a < b).
    Inverted-index join on shingles (explode + self-join + count /
    union) — quadratic only within shingle buckets, the classic
    exact-similarity-join plan."""
    sh = shingle_df(spark, sf_dir).withColumn("sz", F.size("shingles"))
    ex = sh.select("doc_id", "sz", F.explode("shingles").alias("g"))
    a = ex.select(F.col("doc_id").alias("a"), F.col("sz").alias("sza"), "g")
    b = ex.select(F.col("doc_id").alias("b"), F.col("sz").alias("szb"), "g")
    inter = (a.join(b, "g")
             .filter(F.col("a") < F.col("b"))
             .groupBy("a", "b", "sza", "szb")
             .agg(F.count("*").alias("i")))
    jac = inter.withColumn(
        "jaccard_x1000",
        F.floor(F.col("i") * 1000.0 / (F.col("sza") + F.col("szb") - F.col("i")))
        .cast("bigint"))
    return (jac.filter(F.col("jaccard_x1000") >= int(threshold * 1000))
            .select("a", "b", "jaccard_x1000")
            .orderBy("a", "b"))


NGRAM_JACCARD_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         regexp_split_to_array(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ') AS t
  FROM documents
), sh AS (
  SELECT doc_id,
         CASE WHEN len(t) >= {NGRAM} THEN
           list_distinct([array_to_string(t[i:i+{NGRAM - 1}], ' ')
                          for i in range(1, len(t) - {NGRAM - 2})])
         ELSE [array_to_string(t, ' ')] END AS shingles
  FROM toks
), ex AS (
  SELECT doc_id, len(shingles) AS sz, unnest(shingles) AS g FROM sh
), inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, x.sz AS sza, y.sz AS szb, count(*) AS i
  FROM ex x JOIN ex y USING (g)
  WHERE x.doc_id < y.doc_id
  GROUP BY 1, 2, 3, 4
)
SELECT a, b,
       CAST(floor(i * 1000.0 / (sza + szb - i)) AS BIGINT) AS jaccard_x1000
FROM inter
WHERE floor(i * 1000.0 / (sza + szb - i)) >= {int(JACCARD_T * 1000)}
ORDER BY a, b
"""


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _minhash_params(seed: int = 42):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=N_HASHES, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=N_HASHES, dtype=np.uint64)
    return a, b


def minhash_signatures(shingles: DataFrame) -> DataFrame:
    """(doc_id, sig:array<bigint>) — vectorized numpy minhash:
    h_i(x) = (a_i * xxhash(x) + b_i) mod 2^61-1, min over shingles."""
    a, b = _minhash_params()

    @F.pandas_udf(ArrayType(LongType()))
    def sig_udf(sh: pd.Series) -> pd.Series:
        out = []
        for arr in sh:
            if arr is None or len(arr) == 0:
                out.append([0] * N_HASHES)
                continue
            hv = np.array([_str_hash61(s) for s in arr], dtype=np.uint64)
            # (a[:,None] * hv[None,:] + b[:,None]) mod M, min over shingles
            prods = (a[:, None] * hv[None, :] + b[:, None]) % _MERSENNE
            out.append(prods.min(axis=1).astype(np.int64).tolist())
        return pd.Series(out)

    return shingles.select("doc_id", sig_udf("shingles").alias("sig"))


def _str_hash61(s: str) -> int:
    """Deterministic 61-bit string hash (FNV-1a folded)."""
    h = 1469598103934665603
    for ch in s.encode("utf-8"):
        h = ((h ^ ch) * 1099511628211) & ((1 << 64) - 1)
    return h % _MERSENNE


def minhash_lsh_pairs(spark: SparkSession, sf_dir: str,
                      threshold: float = JACCARD_T) -> DataFrame:
    """LSH candidates (band bucket join) verified with EXACT jaccard —
    output identical to ngram_jaccard_pairs when LSH recall is 1.0 at
    the threshold (banding tuned for that; verified in tests)."""
    # no cache: shingle_df is a parquet scan + Catalyst transforms that
    # pipeline into each consumer; caching it leaked storage across the
    # multi-query driver session for no measured win
    sh = shingle_df(spark, sf_dir)
    sigs = minhash_signatures(sh)
    bands = sigs.select(
        "doc_id",
        F.posexplode(F.transform(
            F.sequence(F.lit(0), F.lit(BANDS - 1)),
            lambda i: F.xxhash64(F.slice("sig", i * ROWS_PER_BAND + 1, ROWS_PER_BAND)),
        )).alias("band", "bucket"))
    left = bands.select(F.col("doc_id").alias("a"), "band", "bucket")
    right = bands.select(F.col("doc_id").alias("b"), "band", "bucket")
    cands = (left.join(right, ["band", "bucket"])
             .filter(F.col("a") < F.col("b"))
             .select("a", "b").distinct())
    # exact verification of candidates only
    sa = sh.select(F.col("doc_id").alias("a"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("b"), F.col("shingles").alias("sh_b"))
    verified = (cands.join(sa, "a").join(sb, "b")
                .withColumn("i", F.size(F.array_intersect("sh_a", "sh_b")))
                .withColumn("u", F.size("sh_a") + F.size("sh_b") - F.col("i"))
                .withColumn("jaccard_x1000",
                            F.floor(F.col("i") * 1000.0 / F.col("u")).cast("bigint"))
                .filter(F.col("jaccard_x1000") >= int(threshold * 1000)))
    return verified.select("a", "b", "jaccard_x1000").orderBy("a", "b")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 64
SIMHASH_BLOCKS = 4   # Hamming distance <= SIMHASH_BLOCKS-1 guaranteed found
SIMHASH_MAX_HAMMING = 3


def simhash_signatures(shingles: DataFrame) -> DataFrame:
    """(doc_id, simhash:bigint) — classic Charikar simhash over shingle
    hashes, vectorized numpy."""

    @F.pandas_udf(LongType())
    def sim_udf(sh: pd.Series) -> pd.Series:
        out = []
        for arr in sh:
            if arr is None or len(arr) == 0:
                out.append(0)
                continue
            hv = np.array([_str_hash61(s) for s in arr], dtype=np.uint64)
            bits = ((hv[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1)
            votes = bits.sum(axis=0) * 2 - len(hv)
            val = 0
            for j in range(64):
                if votes[j] > 0:
                    val |= 1 << j
            out.append(val - (1 << 64) if val >= (1 << 63) else val)
        return pd.Series(out)

    return shingles.select("doc_id", sim_udf("shingles").alias("simhash"))


def simhash_pairs(spark: SparkSession, sf_dir: str,
                  max_hamming: int = SIMHASH_MAX_HAMMING) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming, via the
    block-LSH trick: split 64 bits into max_hamming+1 blocks; any pair
    within distance max_hamming shares >= one exact block."""
    sh = shingle_df(spark, sf_dir)
    sigs = simhash_signatures(sh)
    n_blocks = max_hamming + 1
    width = SIMHASH_BITS // n_blocks
    blocks = sigs.select(
        "doc_id", "simhash",
        F.posexplode(F.array(*[
            F.shiftrightunsigned("simhash", i * width)
            .bitwiseAND(F.lit((1 << width) - 1))
            for i in range(n_blocks)
        ])).alias("block", "key"))
    left = blocks.select(F.col("doc_id").alias("a"), F.col("simhash").alias("ha"),
                         "block", "key")
    right = blocks.select(F.col("doc_id").alias("b"), F.col("simhash").alias("hb"),
                          "block", "key")
    cands = (left.join(right, ["block", "key"])
             .filter(F.col("a") < F.col("b"))
             .select("a", "b", "ha", "hb").distinct())
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (cands.withColumn("hamming", hamming)
            .filter(F.col("hamming") <= max_hamming)
            .select("a", "b", "hamming").orderBy("a", "b"))


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------

def embedding_neardup_pairs(spark: SparkSession, sf_dir: str,
                            threshold: float = 0.35) -> DataFrame:
    """Pairs of embeddings with cosine >= threshold. Brute-force via
    block-nested join is O(n^2) — bucketize by leading coordinate sign
    pattern... at this SF the exact plan is a crossJoin + filter; at
    scale swap in the IVF route from operators.similarity. Values
    computed in float64, rounded to 6 dp for engine parity."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    v = F.transform("embedding", lambda x: x.cast("double"))
    norm = F.sqrt(F.aggregate(F.transform(v, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))
    # precompute the norm ONCE per row (identical doubles to computing it
    # per pair, sqrt is deterministic) -> 3x less work inside the O(n^2) join
    e = emb.select(F.col("vec_id"), v.alias("v"), norm.alias("nrm"))
    a = e.select(F.col("vec_id").alias("a"), F.col("v").alias("va"),
                 F.col("nrm").alias("na"))
    b = e.select(F.col("vec_id").alias("b"), F.col("v").alias("vb"),
                 F.col("nrm").alias("nb"))
    dot = F.aggregate(F.zip_with("va", "vb", lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    cos = dot / (F.col("na") * F.col("nb"))
    pairs = (a.crossJoin(b).filter(F.col("a") < F.col("b"))
             .withColumn("cos_x1e6", F.floor(cos * 1e6).cast("bigint"))
             .filter(F.col("cos_x1e6") >= int(threshold * 1e6)))
    return pairs.select("a", "b", "cos_x1e6").orderBy("a", "b")


EMB_NEARDUP_SQL = """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
)
SELECT x.vec_id AS a, y.vec_id AS b,
       CAST(floor(list_cosine_similarity(x.v, y.v) * 1000000) AS BIGINT) AS cos_x1e6
FROM e x JOIN e y ON x.vec_id < y.vec_id
WHERE floor(list_cosine_similarity(x.v, y.v) * 1000000) >= 350000
ORDER BY a, b
"""
