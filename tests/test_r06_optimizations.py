"""Focused seams for the round-6 optimizations: each rewrite that
changed an operator's internals is pinned against the straightforward
formulation it replaced (same session, same data)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from pikes_spark.session import get_spark
    s = get_spark(app="r06_opt_tests", master="local[4]",
                  shuffle_partitions=4)
    yield s


def test_minhash_signatures_hashed_equals_string_path(spark):
    """The refactored seam: signatures computed from pre-hashed (and
    sorted) shingle arrays are bit-identical to the original
    string-shingle path (min over a set is order-insensitive)."""
    from pikes_spark.operators import dedup as D
    rows = [(1, ["a b c", "b c d", "c d e"]),
            (2, ["b c d", "x y z"]),
            (3, ["lone shingle"]),
            (4, [])]
    sh = spark.createDataFrame(rows, "doc_id bigint, shingles array<string>")
    via_strings = {r["doc_id"]: list(r["sig"])
                   for r in D.minhash_signatures(sh).collect()}
    hashed = sh.select(
        "doc_id",
        F.array_sort(F.transform("shingles", lambda s: F.xxhash64(s)))
        .alias("hs"))
    via_hashes = {r["doc_id"]: list(r["sig"])
                  for r in D.minhash_signatures_hashed(hashed).collect()}
    assert via_strings == via_hashes


def test_lsh_group_key_groups_equal_string_sets(spark):
    """The int-array group key (xxhash64 over the sorted shingle-hash
    array) must group exactly the docs the old concat_ws string key
    grouped: same set -> same key, permuted same set -> same key,
    different set -> different key."""
    from pyspark.sql import functions as F
    rows = [(1, ["x", "y", "z"]), (2, ["z", "y", "x"]),
            (3, ["x", "y"]), (4, ["x", "y", "w"])]
    sh = spark.createDataFrame(rows, "doc_id bigint, shingles array<string>")
    keyed = sh.select(
        "doc_id",
        F.xxhash64(F.array_sort(F.transform("shingles",
                                            lambda s: F.xxhash64(s))))
        .alias("grp")).collect()
    grp = {r["doc_id"]: r["grp"] for r in keyed}
    assert grp[1] == grp[2]
    assert len({grp[1], grp[3], grp[4]}) == 3


def test_decontaminate_hashed_grams_match_string_reference(spark):
    """The 128-bit gram keys must reproduce the string-gram n_hits /
    n_grams on a planted train/test leak (doc_id md5 split: doc 6
    lands in 'test' under the default 33333333 threshold)."""
    import tempfile
    from pikes_spark.operators.dedup import decontaminate
    leak = "alpha beta gamma delta " * 4  # > 13 tokens, shared verbatim
    rows = [(6, leak + "tail one"),       # test split (md5('6')=1679.. < 3333..)
            (7, leak + "tail two"),       # train, shares 13-grams
            (8, "totally different words " * 5)]
    with tempfile.TemporaryDirectory() as d:
        (spark.createDataFrame(rows, "doc_id bigint, text string")
         .write.parquet(f"{d}/documents.parquet"))
        out = {r["doc_id"]: r for r in decontaminate(spark, d).collect()}
    # reference (string grams, python)
    def grams(text, n=13):
        toks = text.strip().lower().split()
        if len(toks) < n:
            return {" ".join(toks)}
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}
    test_g = grams(rows[0][1])
    for doc_id, text in rows[1:]:
        g = grams(text)
        assert out[doc_id]["n_grams"] == len(g)
        assert out[doc_id]["n_hits"] == len(g & test_g)
        assert out[doc_id]["contaminated"] == bool(g & test_g)


def test_semdedup_gemm_matches_pairwise_join_rule(spark):
    """The per-cluster int64 GEMM must drop exactly the vectors the
    old pairwise rule dropped: v is dropped iff some u < v in the
    same cluster has ||u-v||^2 <= theta2 (checked by brute force on
    the real table)."""
    from pikes_spark.operators import similarity as S
    out = {r["vec_id"]: (r["cluster"], r["kept"])
           for r in S.semdedup(spark, SF).collect()}
    emb = (spark.read.parquet(f"{SF}/embeddings.parquet")
           .orderBy("vec_id").collect())
    ids = np.array([r.vec_id for r in emb])
    V = np.floor(np.array([r.embedding for r in emb], dtype="float64")
                 * 1e6).astype("int64")
    by_cluster = {}
    for vid in ids:
        c, _ = out[int(vid)]
        by_cluster.setdefault(c, []).append(int(vid))
    pos = {int(v): i for i, v in enumerate(ids)}
    for c, members in by_cluster.items():
        members = sorted(members)
        for j, vj in enumerate(members):
            dropped = any(
                int(((V[pos[vi]] - V[pos[vj]]) ** 2).sum()) <= S._SD_THETA2
                for vi in members[:j])
            assert out[vj][1] == (not dropped), (c, vj)


def test_ivf_query_row_reuse_matches_base_collect(spark):
    """The query vector reused from the training sample must be the
    same doubles a base-table cast+collect produces."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    sample = (emb.select("vec_id", "embedding")
              .orderBy("vec_id").limit(2048).collect())
    qrow = next(r for r in sample if r["vec_id"] == 0)
    via_sample = [float(x) for x in qrow["embedding"]]
    via_cast = (emb.select(F.transform("embedding",
                                       lambda x: x.cast("double"))
                           .alias("v"))
                .where(F.col("vec_id") == 0).collect()[0]["v"])
    assert via_sample == list(via_cast)


def test_linking_minby_equals_window_argmax(spark):
    """The min_by((uri,score),(-score,uri)) aggregation must pick the
    same winner as the old row_number window on every span of the
    gold corpus (score desc, uri asc)."""
    from pyspark.sql import Window
    from pikes_spark.operators.annotate import annotate_pages
    from pikes_spark.operators.linking import (
        candidates_df, entity_mentions, link_entities, LINKING_STOPWORDS)
    from pikes_spark.sources.gold import gold_pages_df
    ann = annotate_pages(gold_pages_df(spark)).localCheckpoint()
    cands = candidates_df(spark)
    new = {(r["url"], r["begin"], r["end"]): (r["uri"], r["score"])
           for r in link_entities(ann, cands).collect()}
    mentions = entity_mentions(ann)
    stop = F.array(*[F.lit(s) for s in sorted(LINKING_STOPWORDS)])
    mentions = mentions.filter(~F.array_contains(stop, F.col("surface")))
    joined = mentions.join(F.broadcast(cands), "surface", "inner")
    overlap = F.size(F.array_intersect("ctx", "doc_tokens")) / F.size("ctx")
    scored = joined.withColumn("score", F.col("prior") * (1.0 + overlap))
    w = Window.partitionBy("url", "begin", "end").orderBy(
        F.desc("score"), F.asc("uri"))
    old = {(r["url"], r["begin"], r["end"]): (r["uri"], r["score"])
           for r in (scored.withColumn("rn", F.row_number().over(w))
                     .filter(F.col("rn") == 1)
                     .select("url", "begin", "end", "uri", "score")
                     .collect())}
    assert new == old and len(new) > 0
