"""Physical-plan audits: the optimizations we claim must be visible in
.explain() output — filter pushdown to the parquet scan, broadcast
joins for dictionary/candidate tables, no Python eval in JVM-only
operators, partial aggregation, no row-level cartesian products."""

from pyspark.sql import functions as F

from pikes_spark.plans.audit import (assert_broadcast_join,
                                     assert_no_cartesian,
                                     assert_no_python_eval,
                                     assert_partial_aggregation,
                                     assert_pushed_filter,
                                     assert_read_schema)

SF = "/root/testdata/sf0.001"


def test_lang_filter_pushes_to_parquet_scan(spark):
    from pikes_spark.sources.pages import pages_from_documents
    pages = pages_from_documents(spark, SF).filter(F.col("lang") == "en")
    assert_pushed_filter(pages, "[IsNotNull(lang), EqualTo(lang,en)]")


def test_textstats_have_no_python_eval(spark):
    from pikes_spark.operators.textstats import (
        fingerprints, lang_id, quality_scores, token_counts)
    for fn in (token_counts, lang_id, quality_scores, fingerprints):
        assert_no_python_eval(fn(spark, SF))


def test_linking_join_is_broadcast(spark):
    from pikes_spark.sources.pages import pages_from_documents
    from pikes_spark.operators.annotate import annotate_pages
    from pikes_spark.operators.linking import candidates_df, link_entities
    links = link_entities(annotate_pages(pages_from_documents(spark, SF)),
                          candidates_df(spark))
    assert_broadcast_join(links)


def test_relational_agg_is_partial(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    agg = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s"))
    assert_partial_aggregation(agg)


def test_column_pruning_reaches_scan(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select("l_orderkey")
    assert_read_schema(li, "struct<l_orderkey:bigint>")


def test_dedup_pair_operators_have_no_cartesian(spark):
    # embedding_neardup_pairs intentionally carries a tiny
    # BroadcastNestedLoopJoin over BLOCK ids (not rows) — its own plan
    # test in test_operators_spark asserts the row-level guarantee
    from pikes_spark.operators.dedup import (minhash_lsh_pairs,
                                             simhash_pairs)
    for fn in (minhash_lsh_pairs, simhash_pairs):
        assert_no_cartesian(fn(spark, SF))


def test_entry_smoke(spark):
    import __spark_entry__ as e
    df = e.entry(spark)
    rows = df.limit(5).collect()
    assert df.columns and rows is not None
    assert set(["subject", "predicate", "object"]) <= set(df.columns)
