"""Deterministic streaming sketches: Count-Min and HyperLogLog.

Sketches are THE corpus-scale answer to heavy-hitter and cardinality
questions (Cormode & Muthukrishnan 2005; Flajolet et al. 2007): fixed
memory, one pass, mergeable across partitions — which is exactly what
a map-side-combined groupBy gives for free. Both sketches here are
built with INTEGER-EXACT arithmetic end-to-end:

- the per-item hash is the repo's rolling polynomial hash (the one
  ``textstats.fingerprints`` proved bit-identical in Spark and DuckDB);
- Count-Min counters are plain integer sums;
- the HyperLogLog estimator avoids the float harmonic mean by summing
  the dyadic terms 2^(RHO_MAX - reg) as INTEGERS and dividing once
  with integer division (alpha as the rational 709/1000 for m=64).

So unlike library sketch implementations (whose estimates depend on
merge order / float rounding), every value here is bit-identical in
any engine and under any partitioning — the property that makes them
driver-oracle-checkable.

Scale shape: both sketches are one explode + one map-side-combined
groupBy whose exchange is SKETCH-sized (d*w counter cells / m
registers), not data-sized. That is the whole point of a sketch in a
shuffle-based engine: 10^12 tokens reduce to 1024 cells per task
before the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .dedup import _documents

from .textstats import FP_BASE, FP_MOD, _tokens

# Count-Min geometry: d rows x w buckets; per-row affine mixers (odd
# multipliers, distinct offsets) over the base polynomial hash.
CM_DEPTH = 4
CM_WIDTH = 256
CM_MIX = [(1, 0), (2654435761, 911), (40503, 3), (69069, 7919)]
# terms whose frequency the driver query estimates (common English
# stopwords -> guaranteed heavy hitters in the synthetic corpus)
CM_PROBES = ["the", "and", "of", "to", "data"]

# HyperLogLog geometry: m = 64 registers, 24 value bits -> rho <= 25
HLL_M = 64
HLL_BITS = 24
HLL_RHO_MAX = HLL_BITS + 1
# alpha_64 = 0.709 as a rational
HLL_ALPHA_NUM, HLL_ALPHA_DEN = 709, 1000


def _polyhash_col(col):
    """Rolling hash over the char array (JVM-side aggregate) — same
    fold as textstats.fingerprints, applied per token."""
    return F.aggregate(
        F.split(col, ""),
        F.lit(0).cast("bigint"),
        lambda acc, ch: (acc * FP_BASE + F.ascii(ch)) % FP_MOD)


def _polyhash_py(tok: str) -> int:
    acc = 0
    for ch in tok:
        acc = (acc * FP_BASE + ord(ch)) % FP_MOD
    return acc


def _docs_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _documents(spark, sf_dir)
    return (docs.select(F.explode(_tokens(F.col("text"))).alias("tok"))
            .filter(F.length("tok") > 0))


# ---------------------------------------------------------------------------
# Count-Min
# ---------------------------------------------------------------------------

def count_min_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the d x w Count-Min sketch over every corpus token, then
    answer point queries for CM_PROBES: est(t) = min_j cm[j][h_j(t)],
    reported next to the exact count (est >= exact always — the CM
    one-sided error guarantee, which the oracle re-derives)."""
    toks = _docs_tokens(spark, sf_dir)
    h = _polyhash_col(F.col("tok"))
    cells = toks.select(F.posexplode(F.array(*[
        ((h * a + b) % FP_MOD % CM_WIDTH)
        for a, b in CM_MIX])).alias("row", "bucket"))
    cm = cells.groupBy("row", "bucket").agg(F.count("*").alias("c"))

    # probe lookups: tiny literal table of (term, row, bucket); LEFT
    # join so an empty counter cell reads 0 (otherwise a term absent
    # from the corpus would lose its zero cells and over-estimate)
    probe_rows = [(t, j, (_polyhash_py(t) * a + b) % FP_MOD % CM_WIDTH)
                  for t in CM_PROBES
                  for j, (a, b) in enumerate(CM_MIX)]
    probes = spark.createDataFrame(probe_rows,
                                   "term string, row int, bucket long")
    est = (probes.join(cm, ["row", "bucket"], "left")
           .groupBy("term")
           .agg(F.min(F.coalesce("c", F.lit(0))).alias("est_count")))
    exact = (toks.filter(F.col("tok").isin(CM_PROBES))
             .groupBy(F.col("tok").alias("term"))
             .agg(F.count("*").alias("exact_count")))
    return (est.join(exact, "term", "left")
            .select("term", F.col("est_count").cast("bigint").alias("est_count"),
                    F.coalesce("exact_count", F.lit(0)).cast("bigint")
                    .alias("exact_count"))
            .orderBy("term"))


def count_min_sql() -> str:
    mix_rows = ",\n    ".join(
        f"({j}, {a}::BIGINT, {b}::BIGINT)"
        for j, (a, b) in enumerate(CM_MIX))
    probe_list = ", ".join(f"'{t}'" for t in CM_PROBES)
    probe_rows = ",\n    ".join(
        f"('{t}', {j}, {(_polyhash_py(t) * a + b) % FP_MOD % CM_WIDTH}::BIGINT)"
        for t in CM_PROBES
        for j, (a, b) in enumerate(CM_MIX))
    return f"""
WITH toks AS (
  SELECT t.tok FROM documents,
       unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS t(tok)
  WHERE length(t.tok) > 0
),
hashed AS (
  SELECT tok,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
            [CAST(ascii(c) AS BIGINT) for c in regexp_split_to_array(tok, '')]),
            (acc, ch) -> (acc * {FP_BASE} + ch) % {FP_MOD}) AS h
  FROM toks
),
mix(row, a, b) AS (VALUES
    {mix_rows}
),
cm AS (
  SELECT mix.row, (h * a + b) % {FP_MOD} % {CM_WIDTH} AS bucket,
         COUNT(*) AS c
  FROM hashed CROSS JOIN mix
  GROUP BY 1, 2
),
probes(term, row, bucket) AS (VALUES
    {probe_rows}
),
est AS (
  SELECT term, MIN(COALESCE(c, 0)) AS est_count
  FROM probes LEFT JOIN cm USING (row, bucket)
  GROUP BY term
),
exact AS (
  SELECT tok AS term, COUNT(*) AS exact_count FROM toks
  WHERE tok IN ({probe_list}) GROUP BY tok
)
SELECT term, CAST(est_count AS BIGINT) AS est_count,
       CAST(COALESCE(exact_count, 0) AS BIGINT) AS exact_count
FROM est LEFT JOIN exact USING (term)
ORDER BY term
"""


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

def _lc_table() -> list:
    """Linear-counting estimates m*ln(m/V) for V = 0..m, precomputed
    ONCE here (so neither engine evaluates a float log — the table is
    shared integer data, like the classifier weights)."""
    import math
    return [0] + [round(HLL_M * math.log(HLL_M / v))
                  for v in range(1, HLL_M + 1)]


def hll_distinct_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog cardinality of the corpus's distinct (doc_id, token)
    pairs, next to the exact count. One row:
    (m, hll_raw, zero_regs, hll_estimate, exact_distinct).

    Register build: bucket = h % m; rho = leading-zero count of the
    remaining HLL_BITS value bits + 1, computed INTEGER-exactly as
    bits - msb(v) + 1 where msb comes from the binary-string length
    (no float log2, whose last-ulp behavior differs between engines).
    Raw estimator: E = alpha * m^2 / sum(2^-reg); the sum of dyadic
    terms is the integer S = sum 2^(RHO_MAX - reg), so
    E = floor(alpha_num * m^2 * 2^RHO_MAX / (alpha_den * S)).
    Small-range regime (E <= 5m/2 and empty registers exist) switches
    to linear counting m*ln(m/V) via a precomputed 65-entry INTEGER
    lookup — the branch condition compares integers, so the published
    estimate is bit-deterministic in any engine."""
    items = (spark.read.parquet(f"{sf_dir}/documents.parquet")
             .select("doc_id", F.explode(_tokens(F.col("text")))
                     .alias("tok"))
             .filter(F.length("tok") > 0)
             .select(F.concat(F.col("doc_id").cast("string"),
                              F.lit(":"), F.col("tok")).alias("item")))
    h = _polyhash_col(F.col("item"))
    hv = items.select((h % HLL_M).alias("bucket"),
                      (F.floor(h / HLL_M).cast("bigint")
                       % (1 << HLL_BITS)).alias("v"))
    msb = F.when(F.col("v") == 0, F.lit(0)) \
        .otherwise(F.length(F.conv(F.col("v").cast("string"), 10, 2)))
    rho = (F.lit(HLL_BITS) - msb + 1)
    regs = (hv.select("bucket", rho.alias("rho"))
            .groupBy("bucket").agg(F.max("rho").alias("reg")))
    # left-join a full bucket range so empty registers count as 0
    full = (spark.range(HLL_M).select(F.col("id").alias("bucket"))
            .join(regs, "bucket", "left")
            .select(F.coalesce("reg", F.lit(0)).alias("reg")))
    agg = full.agg(
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), "
                     f"{HLL_RHO_MAX} - CAST(reg AS INT))"))
        .cast("bigint").alias("s"),
        F.sum(F.when(F.col("reg") == 0, 1).otherwise(0))
        .cast("bigint").alias("zero_regs"))
    exact = items.agg(F.countDistinct("item").alias("exact_distinct"))
    est_num = HLL_ALPHA_NUM * HLL_M * HLL_M * (1 << HLL_RHO_MAX)
    raw = F.floor(F.lit(est_num) / (F.lit(HLL_ALPHA_DEN) * F.col("s"))) \
        .cast("bigint")
    lc = F.element_at(F.array(*[F.lit(x) for x in _lc_table()]),
                      (F.col("zero_regs") + 1).cast("int")).cast("bigint")
    final = F.when((raw <= F.lit(5 * HLL_M // 2))
                   & (F.col("zero_regs") > 0), lc).otherwise(raw)
    return (agg.crossJoin(exact)
            .select(F.lit(HLL_M).cast("bigint").alias("m"),
                    raw.alias("hll_raw"),
                    F.col("zero_regs"),
                    final.alias("hll_estimate"),
                    F.col("exact_distinct").cast("bigint")))


def hll_sql() -> str:
    est_num = HLL_ALPHA_NUM * HLL_M * HLL_M * (1 << HLL_RHO_MAX)
    lc_rows = ",\n    ".join(f"({v}, {e}::BIGINT)"
                             for v, e in enumerate(_lc_table()))
    return f"""
WITH items AS (
  SELECT CAST(doc_id AS VARCHAR) || ':' || t.tok AS item
  FROM documents,
       unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS t(tok)
  WHERE length(t.tok) > 0
),
hashed AS (
  SELECT item,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
            [CAST(ascii(c) AS BIGINT) for c in regexp_split_to_array(item, '')]),
            (acc, ch) -> (acc * {FP_BASE} + ch) % {FP_MOD}) AS h
  FROM items
),
hv AS (
  SELECT h % {HLL_M} AS bucket,
         (h // {HLL_M}) % {1 << HLL_BITS} AS v
  FROM hashed
),
rhos AS (
  SELECT bucket,
         {HLL_BITS} - (CASE WHEN v = 0 THEN 0
                       ELSE length(bin(v)) END) + 1 AS rho
  FROM hv
),
regs AS (
  SELECT r.bucket, COALESCE(MAX(rhos.rho), 0) AS reg
  FROM range({HLL_M}) AS r(bucket)
  LEFT JOIN rhos ON rhos.bucket = r.bucket
  GROUP BY r.bucket
),
agg AS (
  SELECT SUM(CAST(1 AS BIGINT) << ({HLL_RHO_MAX} - reg)) AS s,
         SUM(CASE WHEN reg = 0 THEN 1 ELSE 0 END) AS zero_regs
  FROM regs
),
lc(v, est) AS (VALUES
    {lc_rows}
),
exact AS (SELECT COUNT(DISTINCT item) AS exact_distinct FROM items)
SELECT CAST({HLL_M} AS BIGINT) AS m,
       CAST({est_num} // ({HLL_ALPHA_DEN} * agg.s) AS BIGINT) AS hll_raw,
       CAST(agg.zero_regs AS BIGINT) AS zero_regs,
       CAST(CASE WHEN {est_num} // ({HLL_ALPHA_DEN} * agg.s) <= {5 * HLL_M // 2}
                  AND agg.zero_regs > 0
            THEN lc.est
            ELSE {est_num} // ({HLL_ALPHA_DEN} * agg.s) END AS BIGINT)
         AS hll_estimate,
       CAST(exact.exact_distinct AS BIGINT) AS exact_distinct
FROM agg JOIN lc ON lc.v = agg.zero_regs CROSS JOIN exact
"""


# ---------------------------------------------------------------------------
# grouped HyperLogLog: per-language distinct tokens
# ---------------------------------------------------------------------------

def hll_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language HLL distinct-token cardinality next to the exact
    count — the GROUPED form of hll_distinct_tokens, demonstrating
    what makes sketches the scale answer for grouped COUNT(DISTINCT):
    the exchange carries one m-register sketch per group (m=64 longs)
    instead of the distinct item set. Same integer-exact estimator and
    linear-counting branch; per-group registers come from one
    (lang, bucket) MAX aggregation and the full bucket range is
    restored with a langs x range(m) cross join (group-count-sized)."""
    docs = _documents(spark, sf_dir)
    items = (docs.select("lang", F.explode(_tokens_col()).alias("tok"))
             .filter(F.length("tok") > 0)
             .select("lang", F.col("tok").alias("item")))
    h = _polyhash_col(F.col("item"))
    hv = items.select("lang", (h % HLL_M).alias("bucket"),
                      (F.floor(h / HLL_M).cast("bigint")
                       % (1 << HLL_BITS)).alias("v"))
    msb = F.when(F.col("v") == 0, F.lit(0)) \
        .otherwise(F.length(F.conv(F.col("v").cast("string"), 10, 2)))
    regs = (hv.select("lang", "bucket",
                      (F.lit(HLL_BITS) - msb + 1).alias("rho"))
            .groupBy("lang", "bucket").agg(F.max("rho").alias("reg")))
    langs = items.select("lang").distinct()
    full = (langs.crossJoin(spark.range(HLL_M)
                            .select(F.col("id").alias("bucket")))
            .join(regs, ["lang", "bucket"], "left")
            .select("lang", F.coalesce("reg", F.lit(0)).alias("reg")))
    agg = full.groupBy("lang").agg(
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), "
                     f"{HLL_RHO_MAX} - CAST(reg AS INT))"))
        .cast("bigint").alias("s"),
        F.sum(F.when(F.col("reg") == 0, 1).otherwise(0))
        .cast("bigint").alias("zero_regs"))
    exact = items.groupBy("lang").agg(
        F.countDistinct("item").alias("exact_distinct"))
    est_num = HLL_ALPHA_NUM * HLL_M * HLL_M * (1 << HLL_RHO_MAX)
    raw = F.floor(F.lit(est_num) / (F.lit(HLL_ALPHA_DEN) * F.col("s"))) \
        .cast("bigint")
    lc = F.element_at(F.array(*[F.lit(x) for x in _lc_table()]),
                      (F.col("zero_regs") + 1).cast("int")).cast("bigint")
    final = F.when((raw <= F.lit(5 * HLL_M // 2))
                   & (F.col("zero_regs") > 0), lc).otherwise(raw)
    return (agg.join(exact, "lang")
            .select("lang", raw.alias("hll_raw"), "zero_regs",
                    final.alias("hll_estimate"),
                    F.col("exact_distinct").cast("bigint"))
            .orderBy("lang"))


def _tokens_col():
    return F.split(F.trim(F.lower(F.col("text"))), r"\s+")


def hll_by_lang_sql() -> str:
    est_num = HLL_ALPHA_NUM * HLL_M * HLL_M * (1 << HLL_RHO_MAX)
    lc_rows = ",\n    ".join(f"({v}, {e}::BIGINT)"
                             for v, e in enumerate(_lc_table()))
    return f"""
WITH items AS (
  SELECT lang, t.tok AS item
  FROM documents,
       unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS t(tok)
  WHERE length(t.tok) > 0
),
hashed AS (
  SELECT lang, item,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
            [CAST(ascii(c) AS BIGINT) for c in regexp_split_to_array(item, '')]),
            (acc, ch) -> (acc * {FP_BASE} + ch) % {FP_MOD}) AS h
  FROM items
),
rhos AS (
  SELECT lang, h % {HLL_M} AS bucket,
         {HLL_BITS} - (CASE WHEN (h // {HLL_M}) % {1 << HLL_BITS} = 0 THEN 0
                       ELSE length(bin((h // {HLL_M}) % {1 << HLL_BITS}))
                       END) + 1 AS rho
  FROM hashed
),
langs AS (SELECT DISTINCT lang FROM items),
regs AS (
  SELECT langs.lang, r.bucket, COALESCE(MAX(rhos.rho), 0) AS reg
  FROM langs CROSS JOIN range({HLL_M}) AS r(bucket)
  LEFT JOIN rhos ON rhos.bucket = r.bucket AND rhos.lang = langs.lang
  GROUP BY langs.lang, r.bucket
),
agg AS (
  SELECT lang, SUM(CAST(1 AS BIGINT) << ({HLL_RHO_MAX} - reg)) AS s,
         SUM(CASE WHEN reg = 0 THEN 1 ELSE 0 END) AS zero_regs
  FROM regs GROUP BY lang
),
lc(v, est) AS (VALUES
    {lc_rows}
),
exact AS (
  SELECT lang, COUNT(DISTINCT item) AS exact_distinct FROM items GROUP BY lang
)
SELECT agg.lang,
       CAST({est_num} // ({HLL_ALPHA_DEN} * agg.s) AS BIGINT) AS hll_raw,
       CAST(agg.zero_regs AS BIGINT) AS zero_regs,
       CAST(CASE WHEN {est_num} // ({HLL_ALPHA_DEN} * agg.s) <= {5 * HLL_M // 2}
                  AND agg.zero_regs > 0
            THEN (SELECT est FROM lc WHERE lc.v = agg.zero_regs)
            ELSE {est_num} // ({HLL_ALPHA_DEN} * agg.s) END AS BIGINT)
         AS hll_estimate,
       CAST(exact.exact_distinct AS BIGINT) AS exact_distinct
FROM agg JOIN exact USING (lang)
ORDER BY agg.lang
"""
