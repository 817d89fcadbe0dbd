"""Skew-mitigation join utilities.

At 10^12-row scale a shuffle join on a power-law key ("united states"
appears on millions of pages) sends one key's entire row set to one
reducer — the straggler that defines job wall time. AQE's skew-join
splitting handles sort-merge joins after the fact; this module gives
the explicit, planner-independent form the north rule asks for:

- salted_join: the fact side gets a uniform random salt in [0, salt);
  the dimension side is replicated salt-fold (explode over the salt
  range); the join key becomes (key, salt), so a hot key's rows fan
  out over `salt` reducers instead of one. Cost: dimension side
  shuffles salt× its size — use when the dimension is too big to
  broadcast but far smaller than the fact side (the classic middle
  regime between broadcast and plain shuffle join).

The salt values are random per run; the JOIN RESULT is independent of
them (every fact row still meets every matching dimension row exactly
once), which is what the equivalence oracle checks.
"""

from __future__ import annotations

from typing import List, Union

from pyspark.sql import DataFrame, functions as F


def salted_join(fact: DataFrame, dim: DataFrame,
                on: Union[str, List[str]], salt: int = 16,
                how: str = "inner", seed: int = 7) -> DataFrame:
    """Join a skewed fact table to a non-broadcastable dimension by
    salting the shuffle key. `on` must name equi-join column(s)
    present on both sides; output columns match fact.join(dim, on,
    how) with the fact side's key columns kept."""
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left only")
    f = fact.withColumn("_salt",
                        F.floor(F.rand(seed) * salt).cast("int"))
    d = dim.withColumn("_salt", F.explode(
        F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<int>")))
    out = f.join(d, keys + ["_salt"], how)
    return out.drop("_salt")


# ---------------------------------------------------------------------------
# Bloom-filter semi-join reduction
# ---------------------------------------------------------------------------

_BLOOM_SEEDS = (101, 211, 307)   # k = 3 deterministic hash functions


def bloom_bitmap(dim: DataFrame, key: str, m_bits: int = 1 << 16) -> list:
    """Build a deterministic Bloom bitmap (m_bits bits as m_bits/64
    longs) over dim[key] with k=3 xxhash64 seeds.

    Scale shape: each key maps to k (word, bit) pairs; a map-side-
    combined groupBy(word) bit_or's them so the exchange and the
    driver collect carry AT MOST m_bits/64 rows (1024 longs at the
    default 64 Kbit) regardless of dim's row count — the same bitmap
    any Bloom build must materialize. This is the explicit form of
    Spark's runtime-filter BloomFilterAggregate; making it an
    operator (a) fixes the hashes so the filter is deterministic and
    (b) lets the reduction cross stage/job boundaries the runtime
    filter can't (e.g. pre-filtering a different source)."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    k = F.col(key).cast("string")
    pos = [F.pmod(F.xxhash64(k, F.lit(s)), F.lit(m_bits)) for s in _BLOOM_SEEDS]
    words = dim.select(
        F.explode(F.array(*pos)).alias("p")).select(
        (F.col("p") / 64).cast("long").alias("w"),
        # shiftleft() takes a literal shift; build the bit via expr
        F.expr("shiftleft(cast(1 AS bigint), cast(p % 64 AS int))")
        .alias("b")).groupBy("w").agg(F.bit_or("b").alias("bits"))
    bitmap = [0] * (m_bits // 64)
    for r in words.collect():
        bitmap[r["w"]] = r["bits"]
    return bitmap


def bloom_might_contain(bitmap: list, key_col, m_bits: int = 1 << 16):
    """JVM-side membership test against a literal bitmap: true iff
    all k bits are set. Pure codegen expressions (array element_at +
    getbit) — no Python crosses the row path."""
    lit = F.lit(bitmap)    # array<bigint> literal, broadcast with the plan
    k = key_col.cast("string")
    tests = []
    for s in _BLOOM_SEEDS:
        p = F.pmod(F.xxhash64(k, F.lit(s)), F.lit(m_bits))
        word = F.element_at(lit, ((p / 64).cast("int") + 1))
        tests.append(F.getbit(word, p % 64) == 1)
    out = tests[0]
    for t in tests[1:]:
        out = out & t
    return out


def bloom_semi_join(fact: DataFrame, dim: DataFrame, fact_key: str,
                    dim_key: str, m_bits: int = 1 << 16) -> DataFrame:
    """Semi-join reduction: pre-filter the fact side with a Bloom
    filter built from dim's keys BEFORE the shuffle join, then join
    exactly (the exact join removes Bloom false positives, so the
    result is identical to fact JOIN dim — the equivalence oracle).

    When it pays: both sides too large to broadcast AND the join is
    selective (most fact keys miss). The bitmap is a plan literal —
    8 KiB at the default 64 Kbit; size m_bits ~ 10 n_dim_keys for a
    ~1.7% false-positive floor at k=3 (128 MiB of literal at 10^8
    keys — at that point build it once and reuse across queries).
    Every pruned fact row is a row that never enters the exchange:
    at a 1% hit rate the fact shuffle shrinks 100x, which is the
    difference between a working join and a spilled one at 100 TB."""
    keep = bloom_might_contain(
        bloom_bitmap(dim, dim_key, m_bits),
        F.col(fact_key), m_bits)
    pruned = fact.filter(keep)
    return pruned.join(dim, pruned[fact_key] == dim[dim_key], "inner")


def bloom_join_revenue(spark, sf_dir: str,
                       segment: str = "BUILDING") -> DataFrame:
    """Driver query: orders of customers in one market segment,
    revenue per order priority — fact (orders) Bloom-pruned by the
    dim (segment customers) before the equi-join."""
    cust = (spark.read.parquet(f"{sf_dir}/customer.parquet")
            .filter(F.col("c_mktsegment") == segment)
            .select("c_custkey"))
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey", "o_orderpriority", "o_totalprice")
    j = bloom_semi_join(orders, cust, "o_custkey", "c_custkey")
    return (j.groupBy("o_orderpriority")
            .agg(F.count("*").alias("n_orders"),
                 F.floor(F.sum("o_totalprice")).cast("bigint")
                 .alias("revenue_fl"))
            .orderBy("o_orderpriority"))


BLOOM_JOIN_SQL = """
SELECT o_orderpriority, count(*) AS n_orders,
       CAST(floor(sum(o_totalprice)) AS BIGINT) AS revenue_fl
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""
