"""Count-Min and HyperLogLog sketch guarantees on real testdata."""

from pikes_spark.operators.sketches import (
    count_min_estimates, hll_distinct_tokens)

SF = "/root/testdata/sf0.001"


def test_count_min_one_sided_error(spark):
    rows = count_min_estimates(spark, SF).collect()
    assert rows, "probe terms must appear"
    for r in rows:
        # CM guarantee: estimate never undercounts
        assert r.est_count >= r.exact_count, r
        # width 256, depth 4: overestimate stays within eps*N of truth
        # for these heavy probes on the tiny corpus
        assert r.est_count <= r.exact_count + 2000, r


def test_hll_estimate_within_bound(spark):
    row = hll_distinct_tokens(spark, SF).collect()[0]
    assert row.m == 64
    # standard error 1.04/sqrt(64) = 13%; allow 3 sigma
    rel = abs(row.hll_estimate - row.exact_distinct) / row.exact_distinct
    assert rel < 0.40, (row.hll_estimate, row.exact_distinct)


def test_hll_partitioning_invariance(spark):
    """The sketch value must be identical under any input partitioning
    (the mergeability property that makes it oracle-checkable)."""
    a = hll_distinct_tokens(spark, SF).collect()[0].hll_estimate
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    import tempfile
    tmp = tempfile.mkdtemp(prefix="pikes_hll_")
    docs.repartition(13).write.parquet(f"{tmp}/documents.parquet")
    b = hll_distinct_tokens(spark, tmp).collect()[0].hll_estimate
    assert a == b
