"""Physical-plan audits: the optimizations we claim must be visible in
.explain() output — filter pushdown to the parquet scan, broadcast
joins for dictionary/candidate tables, no Python eval in JVM-only
operators, partial aggregation."""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_lang_filter_pushes_to_parquet_scan(spark):
    from pikes_spark.sources.pages import pages_from_documents
    pages = pages_from_documents(spark, SF).filter(F.col("lang") == "en")
    plan = _plan(pages)
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan, plan


def test_textstats_have_no_python_eval(spark):
    from pikes_spark.operators.textstats import (
        fingerprints, lang_id, quality_scores, token_counts)
    for fn in (token_counts, lang_id, quality_scores, fingerprints):
        plan = _plan(fn(spark, SF))
        assert "EvalPython" not in plan, (fn.__name__, plan)


def test_linking_join_is_broadcast(spark):
    from pikes_spark.sources.pages import pages_from_documents
    from pikes_spark.operators.annotate import annotate_pages
    from pikes_spark.operators.linking import candidates_df, link_entities
    links = link_entities(annotate_pages(pages_from_documents(spark, SF)),
                          candidates_df(spark))
    plan = _plan(links)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_relational_agg_is_partial(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    agg = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s"))
    plan = _plan(agg)
    # two HashAggregates (partial + final) around the exchange
    assert plan.count("HashAggregate") >= 2, plan


def test_column_pruning_reaches_scan(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select("l_orderkey")
    plan = _plan(li)
    assert "ReadSchema: struct<l_orderkey:bigint>" in plan, plan


def test_entry_smoke(spark):
    import __spark_entry__ as e
    df = e.entry(spark)
    rows = df.limit(5).collect()
    assert df.columns and rows is not None
    assert set(["subject", "predicate", "object"]) <= set(df.columns)
