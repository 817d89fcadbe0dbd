"""Hash classifier, retention cohorts, entity property table."""

import datetime

from pyspark.sql import functions as F

from pikes_spark.operators.events import retention_cohorts
from pikes_spark.operators.kgquery import entity_property_table
from pikes_spark.operators.textstats import (
    FP_BASE, FP_MOD, _HC_DIM, _HC_MIX, hash_classifier)


def _weight(tok: str) -> int:
    acc = 0
    for ch in tok:
        acc = (acc * FP_BASE + ord(ch)) % FP_MOD
    return (acc % _HC_DIM) * _HC_MIX % 1001 - 500


def test_hash_classifier_matches_reference_weights(spark, tmp_path):
    rows = [(1, "the quick brown fox"), (2, "Hello  World"), (3, "a")]
    p = str(tmp_path / "documents.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(p)
    got = {r.doc_id: (r.score, r.verdict)
           for r in hash_classifier(spark, str(tmp_path)).collect()}
    for doc_id, text in rows:
        toks = text.strip().lower().split()
        score = sum(_weight(t) for t in toks)
        assert got[doc_id] == (score, "keep" if score > 0 else "drop")


def test_retention_cohorts(spark, tmp_path):
    # users 1,2 start week 0; user 1 returns week 1 and 2; user 3
    # starts week 1 (its own cohort)
    def ts(day):
        return datetime.datetime(1970, 1, 1) + datetime.timedelta(days=day)
    rows = [(1, ts(0)), (1, ts(1)), (2, ts(2)),       # week 0
            (1, ts(8)), (3, ts(9)),                    # week 1
            (1, ts(15))]                               # week 2
    p = str(tmp_path / "events.parquet")
    spark.createDataFrame(rows, "user_id long, ts timestamp")\
        .write.parquet(p)
    got = {(r.cohort_week, r.week_offset): r.n_users
           for r in retention_cohorts(spark, str(tmp_path)).collect()}
    assert got == {(0, 0): 2, (0, 1): 1, (0, 2): 1, (1, 0): 1}


def test_entity_property_table_one_scan_no_join(spark):
    sf = "/root/testdata/sf0.001"
    out = entity_property_table(spark, sf)
    # no join in the plan: single aggregate over the union scan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    cust = spark.read.parquet(f"{sf}/customer.parquet").limit(1).collect()[0]
    row = out.filter(F.col("subject") == f"cust:{cust.c_custkey}").collect()[0]
    assert row.in_nation == f"nat:{cust.c_nationkey}"
    assert row.segment == cust.c_mktsegment
    assert row.part_of == f"nat:{cust.c_nationkey}"
