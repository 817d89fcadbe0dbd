"""Tokenize-to-ids (textstats.vocab_build / encode_corpus): id
assignment order, OOV handling, sequence fingerprint, plan shape."""

import duckdb

from pyspark.sql import functions as F

from pikes_spark.operators import textstats

SF = "/root/testdata/sf0.001"


def test_vocab_total_order(spark):
    v = textstats.vocab_build(spark, SF, k=10).collect()
    assert [r["id"] for r in v] == list(range(1, 11))
    pairs = [(-r["cnt"], r["token"]) for r in v]
    assert pairs == sorted(pairs)  # (cnt DESC, token ASC) total order


def test_encode_handcrafted(spark):
    import hashlib
    df = spark.createDataFrame(
        [(1, "b a a zz b"), (2, "a b")], "doc_id long, text string")
    df.createOrReplaceTempView("_docs")
    # vocab over these docs: a(3) b(3) zz(1) -> ids a=1, b=2, zz=3;
    # with k=2, zz is OOV
    from pikes_spark.operators.textstats import _tokens
    vocab = spark.createDataFrame(
        [("a", 1), ("b", 2)], "token string, id long")
    toks = (df.select("doc_id",
                      F.posexplode(_tokens(F.col("text")))
                      .alias("pos", "token")))
    enc = (toks.join(F.broadcast(vocab), "token", "left")
           .select("doc_id", "pos",
                   F.coalesce("id", F.lit(0)).cast("bigint").alias("id")))
    rows = {r["doc_id"]: r for r in
            enc.groupBy("doc_id").agg(
                F.md5(F.array_join(F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "id"))),
                    lambda s: s["id"].cast("string")), ",")).alias("m"))
            .collect()}
    assert rows[1]["m"] == hashlib.md5(b"2,1,1,0,2").hexdigest()
    assert rows[2]["m"] == hashlib.md5(b"1,2").hexdigest()


def test_encode_matches_duckdb(spark):
    got = sorted(tuple(r) for r in
                 textstats.encode_corpus(spark, SF).collect())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{SF}/documents.parquet'")
    exp = sorted(tuple(r) for r in con.sql(textstats.ENCODE_SQL).fetchall())
    assert got == exp
    assert any(r[2] > 0 for r in got)  # OOV path exercised


def test_encode_plan_broadcast_no_text_in_shuffle(spark):
    from pikes_spark.plans.audit import explain_formatted
    plan = explain_formatted(textstats.encode_corpus(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
