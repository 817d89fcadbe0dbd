"""Fifth-session operators: prefix-filter exact Jaccard join, Bloom
semi-join reduction, bigram LM surprisal, BPE merge training."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# prefix-filtering exact Jaccard (AllPairs/PPJoin)
# ---------------------------------------------------------------------------

def test_jaccard_prefix_equals_all_pairs(spark):
    from pikes_spark.operators.dedup import (
        jaccard_prefix_pairs, ngram_jaccard_pairs)
    pre = {(r["a"], r["b"], r["jaccard_x1000"])
           for r in jaccard_prefix_pairs(spark, SF).collect()}
    exact = {(r["a"], r["b"], r["jaccard_x1000"])
             for r in ngram_jaccard_pairs(spark, SF).collect()}
    assert pre == exact


def test_jaccard_prefix_prunes_hot_shingles(spark):
    """Documents that share only one globally-hot shingle must never
    become candidates: the hot shingle is outside everyone's prefix."""
    from pikes_spark.operators import dedup
    tmp = tempfile.mkdtemp(prefix="pikes_prefix_")
    hot = "the terms of service apply"
    rows = []
    # 12 documents, pairwise Jaccard ~0 except the shared hot tail;
    # two genuine near-dups (doc 100/101) that must be found
    for i in range(12):
        rows.append((i, f"unique text body number {i} alpha beta gamma "
                        f"delta {i} epsilon zeta eta theta {i} " + hot, "en"))
    near = ("the quick brown fox jumps over the lazy dog and runs far "
            "away into the deep dark forest tonight")
    rows.append((100, near, "en"))
    rows.append((101, near + " extra", "en"))
    spark.createDataFrame(rows, "doc_id long, text string, lang string") \
         .write.mode("overwrite").parquet(f"{tmp}/documents.parquet")

    out = {(r["a"], r["b"]) for r in
           dedup.jaccard_prefix_pairs(spark, tmp, threshold=0.8).collect()}
    exact = {(r["a"], r["b"]) for r in
             dedup.ngram_jaccard_pairs(spark, tmp, threshold=0.8).collect()}
    assert out == exact
    assert (100, 101) in out
    # pruning: the prefix index must be strictly smaller than the full
    # inverted index (it holds ~(1-t) of each doc's shingles)
    sh = dedup.shingle_df(spark, tmp)
    full = sh.select(F.explode("shingles")).count()
    hset = sh.select("doc_id", F.array_distinct(
        F.transform("shingles", lambda s: F.xxhash64(s))).alias("h"))
    ex = hset.select("doc_id", F.size("h").alias("szh"),
                     F.explode("h").alias("gh"))
    from pyspark.sql import Window
    dfreq = ex.groupBy("gh").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy("df", "gh")
    pref = (ex.join(dfreq, "gh").withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= F.col("szh")
                    - F.ceil(F.col("szh") * 0.8) + 1))
    assert pref.count() < full / 3


# ---------------------------------------------------------------------------
# bigram LM surprisal
# ---------------------------------------------------------------------------

def test_bigram_surprisal_matches_duckdb(spark):
    import duckdb
    from pikes_spark.operators import textstats
    got = {(r["doc_id"], r["surprisal2_x1e6"]) for r in
           textstats.bigram_surprisal(spark, SF).collect()}
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS "
            f"SELECT * FROM '{SF}/documents.parquet'")
    want = set(map(tuple, con.sql(
        textstats.BIGRAM_SURPRISAL_SQL).fetchall()))
    assert got == want and len(got) > 0


def test_bigram_surprisal_orders_template_below_rare(spark):
    """A doc whose transitions dominate the corpus must score lower
    than a doc made of one-off transitions."""
    from pikes_spark.operators import textstats
    tmp = tempfile.mkdtemp(prefix="pikes_big_")
    rows = [(i, "the cat sat on the mat", "en") for i in range(20)]
    rows.append((100, "zyx wvu tsr qpo nml kji", "en"))
    spark.createDataFrame(rows, "doc_id long, text string, lang string") \
         .write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    s = {r["doc_id"]: r["surprisal2_x1e6"] for r in
         textstats.bigram_surprisal(spark, tmp).collect()}
    assert s[0] < s[100]


# ---------------------------------------------------------------------------
# Bloom semi-join reduction
# ---------------------------------------------------------------------------

def test_bloom_semi_join_equals_plain_join(spark):
    from pikes_spark.operators import skew
    fact = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
    dim = spark.range(0, 5000, 100).select(
        F.col("id").alias("dk"), F.lit("d").alias("tag"))
    got = {(r["k"], r["v"], r["dk"]) for r in
           skew.bloom_semi_join(fact, dim, "k", "dk")
           .select("k", "v", "dk").collect()}
    want = {(r["k"], r["v"], r["dk"]) for r in
            fact.join(dim, fact["k"] == dim["dk"]).collect()}
    assert got == want and len(got) == 50


def test_bloom_filter_actually_prunes(spark):
    """The Bloom pre-filter must reject almost all non-matching fact
    rows before the join (k=3, m=64Kbit, 50 keys -> FP rate ~0)."""
    from pikes_spark.operators import skew
    fact = spark.range(0, 5000).select(F.col("id").alias("k"))
    dim = spark.range(0, 5000, 100).select(F.col("id").alias("dk"))
    bm = skew.bloom_bitmap(dim, "dk")
    kept = fact.filter(skew.bloom_might_contain(bm, F.col("k"))).count()
    assert 50 <= kept <= 60   # all 50 members + at most ~10 FPs


def test_bloom_join_revenue_oracle_shape(spark):
    from pikes_spark.operators import skew
    out = skew.bloom_join_revenue(spark, SF)
    rows = out.collect()
    assert out.columns == ["o_orderpriority", "n_orders", "revenue_fl"]
    assert sum(r["n_orders"] for r in rows) > 0


# ---------------------------------------------------------------------------
# BPE merge training
# ---------------------------------------------------------------------------

def _naive_bpe(texts, n_merges):
    """Independent reference: operates on raw token OCCURRENCES (no
    word-frequency aggregation) — validates bpe.train_merges's
    aggregated formulation."""
    occ = []
    for t in texts:
        for w in t.strip().lower().split():
            occ.append(tuple(w) + ("</w>",))
    merges = []
    for rank in range(1, n_merges + 1):
        pairs = {}
        for sym in occ:
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + 1
        if not pairs:
            break
        (a, b), f = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, f))
        nxt = []
        for sym in occ:
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b); i += 2
                else:
                    out.append(sym[i]); i += 1
            nxt.append(tuple(out))
        occ = nxt
    return merges


def test_bpe_train_matches_naive_occurrence_impl(spark):
    import duckdb
    from pikes_spark.operators import bpe
    texts = [r[0] for r in duckdb.sql(
        f"SELECT text FROM '{SF}/documents.parquet' ORDER BY doc_id"
    ).fetchall()]
    want = _naive_bpe(texts, 24)
    got = [(r["rank"], r["lhs"], r["rhs"], r["pair_freq"])
           for r in bpe.bpe_train(spark, SF, 24).collect()]
    assert got == want and len(got) == 24


def test_bpe_apply_merges_roundtrip():
    from pikes_spark.operators import bpe
    merges = bpe.train_merges([("hello", 5), ("help", 3), ("world", 2)], 8)
    for w in ["hello", "help", "world", "hell", "x", ""]:
        pieces = bpe.apply_merges(w, merges)
        assert "".join(pieces) == w + "</w>"


def test_bpe_vocab_collect_is_bounded(spark):
    """VERDICT r4 finding 4: the driver-side vocabulary pull must stay
    bounded when the corpus grows a junk-token tail (hashes, base64,
    URLs — the 100 TB failure mode). Plant a long hapax tail plus a
    freq-2 junk block over the real word_freq table and assert (a) the
    capped vocab never exceeds max_vocab, (b) hapaxes are cut by
    min_freq, and (c) the learned merge table is unchanged vs the
    clean corpus."""
    from pikes_spark.operators import bpe
    wf_real = bpe.word_freq(spark, SF)
    junk_hapax = spark.createDataFrame(
        [(f"junk{i:06x}deadbeef", 1) for i in range(5000)],
        "token string, freq bigint")
    junk_lowfreq = spark.createDataFrame(
        [(f"zzz{i:06x}base64ish", 2) for i in range(3000)],
        "token string, freq bigint")
    wf_dirty = wf_real.unionByName(junk_hapax).unionByName(junk_lowfreq)

    capped = bpe.cap_vocab(wf_dirty, max_vocab=100, min_freq=2).collect()
    assert len(capped) <= 100                       # (a) hard bound
    toks = {r["token"] for r in capped}
    assert not any(t.startswith("junk") for t in toks)  # (b) hapaxes cut
    # real words all have freq >= 26 on this corpus, so the (freq DESC,
    # token ASC) top-100 keeps every real word ahead of the freq-2 junk
    real = {r["token"] for r in wf_real.collect()}
    assert real <= toks

    # (c) on the frozen corpus neither bound fires, so the capped
    # production path learns the identical merge table to an uncapped
    # pull — the frozen VALUES oracle is untouched by this change
    uncapped = bpe.train_merges(
        sorted((r["token"], r["freq"]) for r in wf_real.collect()), 24)
    capped_prod = bpe.train_merges(sorted(bpe.collect_vocab(spark, SF)), 24)
    assert uncapped == capped_prod


def test_bpe_encode_stats_consistent(spark):
    from pikes_spark.operators import bpe
    row = bpe_row = bpe.bpe_encode_stats(spark, SF).collect()[0]
    assert row["n_docs"] > 0 and row["sum_pieces"] >= row["n_docs"]
    # zero merges -> every piece is a single char+EOW: sum_pieces ==
    # total chars + n_tokens
    import duckdb
    chars, toks = duckdb.sql(f"""
        SELECT SUM(LEN(REPLACE(tok, ' ', ''))), COUNT(*) FROM (
          SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
          FROM '{SF}/documents.parquet') WHERE LEN(tok) > 0
    """).fetchone()
    row0 = bpe.bpe_encode_stats(spark, SF, n_merges=0).collect()[0]
    assert row0["sum_pieces"] == chars + toks
    assert bpe_row["sum_pieces"] < row0["sum_pieces"]


# ---------------------------------------------------------------------------
# sequence packing stats
# ---------------------------------------------------------------------------

def test_pack_sequences_small_exact(spark):
    """3 docs of 5 tokens each, seq_len=4: offsets [0,5) [5,10)
    [10,15) -> 4 seqs, last fill 3; docs 0 and 1 span a boundary
    (4 and 8), doc 2 spans 12."""
    from pikes_spark.operators import textstats
    tmp = tempfile.mkdtemp(prefix="pikes_pack_")
    rows = [(i, "a b c d e", "en") for i in range(3)]
    spark.createDataFrame(rows, "doc_id long, text string, lang string") \
         .write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    r = textstats.pack_sequences(spark, tmp, seq_len=4).collect()[0]
    assert (r["n_docs"], r["total_tokens"], r["n_seqs"],
            r["last_fill"], r["n_spanning"]) == (3, 15, 4, 3, 3)


def test_pack_sequences_aligned_docs_never_span(spark):
    from pikes_spark.operators import textstats
    tmp = tempfile.mkdtemp(prefix="pikes_pack2_")
    rows = [(i, "a b c d", "en") for i in range(5)]   # 4 tokens, L=4
    spark.createDataFrame(rows, "doc_id long, text string, lang string") \
         .write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    r = textstats.pack_sequences(spark, tmp, seq_len=4).collect()[0]
    assert r["n_spanning"] == 0 and r["n_seqs"] == 5 and r["last_fill"] == 4


# ---------------------------------------------------------------------------
# rendezvous crawl sharding
# ---------------------------------------------------------------------------

def test_crawl_shards_minimal_movement(spark):
    """Removing one shard moves ONLY the hosts that were on it —
    the rendezvous property a mod-N assignment lacks."""
    from pikes_spark.operators import weburl

    def assign(n_shards):
        hosts = (weburl.url_parse(spark, SF).select("host").distinct())
        cand = hosts.select("host", F.explode(
            F.sequence(F.lit(0), F.lit(n_shards - 1))).alias("shard"))
        h = F.md5(F.concat_ws(":", "host", F.col("shard").cast("string")))
        return {r["host"]: r["shard"] for r in
                cand.withColumn("h", h).groupBy("host")
                .agg(F.min_by("shard", "h").alias("shard")).collect()}

    a8, a7 = assign(8), assign(7)
    moved = {h for h in a8 if a8[h] != a7[h]}
    # every moved host must have been on the removed shard (7)
    assert all(a8[h] == 7 for h in moved)
    assert any(a8[h] == 7 for h in a8)   # shard 7 was non-empty


def test_crawl_shards_covers_all_pages(spark):
    from pikes_spark.operators import weburl
    rows = weburl.crawl_shards(spark, SF).collect()
    n_pages = sum(r["n_pages"] for r in rows)
    total = weburl.url_parse(spark, SF).count()
    assert n_pages == total
    assert all(0 <= r["shard"] < 8 for r in rows)


# ---------------------------------------------------------------------------
# RAG chunk windows
# ---------------------------------------------------------------------------

def test_chunk_windows_offsets_and_overlap(spark):
    from pikes_spark.operators import textstats
    tmp = tempfile.mkdtemp(prefix="pikes_chunk_")
    text = " ".join(f"t{i}" for i in range(100))
    spark.createDataFrame([(1, text, "en")],
                          "doc_id long, text string, lang string") \
         .write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    rows = textstats.chunk_windows(spark, tmp, w=64, s=48).collect()
    # starts 0, 48, 96 -> sizes 64, 52, 4
    assert [(r["chunk_no"], r["start_tok"], r["n_tok"]) for r in rows] \
        == [(0, 0, 64), (1, 48, 52), (2, 96, 4)]


def test_chunk_windows_matches_duckdb(spark):
    import duckdb
    from pikes_spark.operators import textstats
    got = [(r["doc_id"], r["chunk_no"], r["start_tok"], r["n_tok"],
            r["chunk_md5"])
           for r in textstats.chunk_windows(spark, SF).collect()]
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    want = [tuple(t) for t in
            con.sql(textstats.CHUNK_WINDOWS_SQL).fetchall()]
    assert got == want and len(got) >= 500


# ---------------------------------------------------------------------------
# z-order layout stats
# ---------------------------------------------------------------------------

def test_zorder_beats_linear_on_nonsort_column(spark):
    """The point of the operator: under the linear (date-sorted)
    layout the custkey span per file is ~the full domain; z-order
    bounds BOTH dimensions."""
    from pikes_spark.operators import layout
    # sf0.001 orders fill only 3 default-size files — shrink the file
    # size so the layout effect is visible (~24 files)
    rows = {r["layout"]: r for r in
            layout.zorder_stats(spark, SF, rows_per_file=64).collect()}
    lin, zed = rows["linear"], rows["zorder"]
    assert lin["n_files"] == zed["n_files"]
    # x (custkey) span: z-order must at least halve the linear total
    assert zed["sum_x_span"] * 2 < lin["sum_x_span"]
    # and not give up more than 8x on the date dimension
    assert zed["sum_y_span"] < lin["sum_y_span"] * 8


def test_z_expr_is_morton(spark):
    from pikes_spark.operators.layout import _z_expr
    df = spark.createDataFrame([(3, 5)], "x long, y long") \
              .selectExpr(f"{_z_expr('x', 'y')} AS z")
    # x=0b011, y=0b101 -> z bits y2x2 y1x1 y0x0 = 100111 = 39
    assert df.collect()[0]["z"] == 39


# ---------------------------------------------------------------------------
# int8 quantized recall
# ---------------------------------------------------------------------------

def test_quantized_recall_matches_duckdb_and_is_high(spark):
    import duckdb
    from pikes_spark.operators import similarity
    got = [tuple(r) for r in
           similarity.quantized_recall(spark, SF).collect()]
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS "
            f"SELECT * FROM '{SF}/embeddings.parquet'")
    want = [tuple(t) for t in
            con.sql(similarity.quantized_recall_sql(0, 10)).fetchall()]
    assert got == want
    # int8 cosine on these embeddings should keep most of the top-10
    assert got[0][1] >= 7


# ---------------------------------------------------------------------------
# SCD2, negative sampling, characteristic sets
# ---------------------------------------------------------------------------

def test_scd2_intervals_tile_and_collapse(spark):
    from pikes_spark.operators import events
    rows = events.scd2_history(spark, SF).collect()
    assert rows
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for user_rows in by_user.values():
        # intervals tile: each valid_to == next valid_from; last open
        for a, b in zip(user_rows, user_rows[1:]):
            assert a["valid_to_us"] == b["valid_from_us"]
            # consecutive versions always differ (repeats collapsed)
            assert a["event_type"] != b["event_type"]
        assert user_rows[-1]["valid_to_us"] == -1


def test_negative_samples_are_never_positive(spark):
    from pikes_spark.operators import graph
    import duckdb
    neg = graph.negative_samples(spark, SF).collect()
    pos = {(int(h), int(t)) for h, t in duckdb.sql(
        f"SELECT c_custkey, c_nationkey FROM '{SF}/customer.parquet'"
    ).fetchall()}
    assert neg
    for r in neg:
        assert (r["head"], r["neg_tail"]) not in pos
        assert 0 <= r["neg_tail"] < 25


def test_char_sets_partition_subjects(spark):
    from pikes_spark.operators import kgquery
    rows = kgquery.characteristic_sets(spark, SF).collect()
    n_subjects = sum(r["n_subjects"] for r in rows)
    distinct_subjects = (kgquery.rel_triples(spark, SF)
                         .select("subject").distinct().count())
    assert n_subjects == distinct_subjects
    # every customer has the same 4-predicate star -> one big set
    assert max(r["n_subjects"] for r in rows) >= 100


# ---------------------------------------------------------------------------
# k-core coreness, DSIR importance weights
# ---------------------------------------------------------------------------

def test_coreness_matches_sequential_peeling(spark):
    """Differential: distributed h-index fixpoint == independent
    sequential bucket-peeling on the same sf0.001 graph (this test
    backs the frozen KCORE_DIGEST oracle)."""
    from collections import defaultdict
    import duckdb
    from pikes_spark.operators import graph as G
    got = {r["node"]: r["coreness"]
           for r in G.coreness(G.orders_graph(spark, SF)).collect()}
    edges = duckdb.sql(f"""
      SELECT DISTINCT LEAST(o_custkey % 997, o_orderkey % 997) a,
                      GREATEST(o_custkey % 997, o_orderkey % 997) b
      FROM '{SF}/orders.parquet'
      WHERE o_custkey % 997 <> o_orderkey % 997""").fetchall()
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b); adj[b].add(a)
    deg = {v: len(ns) for v, ns in adj.items()}
    core, remaining, k = {}, set(adj), 0
    while remaining:
        while True:
            peel = [v for v in remaining if deg[v] <= k]
            if not peel:
                break
            for v in peel:
                core[v] = k
                remaining.discard(v)
                for u in adj[v]:
                    if u in remaining:
                        deg[u] -= 1
        k += 1
    assert got == core


def test_dsir_target_docs_score_higher(spark):
    """Sanity on the estimator itself: the mean DSIR weight of
    target-domain (en) docs must exceed the mean weight of the rest —
    the defining property of an importance-resampling score."""
    import duckdb
    from pikes_spark.operators import textstats as T
    w = {r["doc_id"]: r["dsir_w"]
         for r in T.dsir_weights(spark, SF).collect()}
    langs = dict(duckdb.sql(
        f"SELECT doc_id, lang FROM '{SF}/documents.parquet'").fetchall())
    en = [w[d] for d, l in langs.items() if l == "en"]
    rest = [w[d] for d, l in langs.items() if l != "en"]
    assert en and rest
    assert sum(en) / len(en) > sum(rest) / len(rest)


def test_shacl_report_flags_planted_violation(spark):
    """The sh:in shape must report exactly the MACHINERY customers;
    conforming shapes must be present with 0 (stable report spine)."""
    import duckdb
    from pikes_spark.operators import kgquery
    rows = {r["shape_id"]: r["n_violations"]
            for r in kgquery.shacl_report(spark, SF).collect()}
    n_machinery = duckdb.sql(
        f"SELECT count(*) FROM '{SF}/customer.parquet' "
        f"WHERE c_mktsegment = 'MACHINERY'").fetchone()[0]
    assert rows["S3_cust_in_segment"] == n_machinery > 0
    assert rows["S1_cust_minCount_inNation"] == 0
    assert rows["S2_cust_maxCount_inNation"] == 0
    assert rows["S4_nat_nodeKind_inRegion"] == 0
    assert rows["S5_nat_minCount_name"] == 0
    assert len(rows) == 5


def test_walk_corpus_walks_follow_edges(spark):
    """Every consecutive (node, next) in every walk must be a real
    edge, every walk has full length, and the corpus is deterministic
    across two runs (hash-random, no RNG)."""
    import duckdb
    from pikes_spark.operators import graph as G
    rows = [tuple(r) for r in G.walk_corpus_rel(spark, SF).collect()]
    rows2 = [tuple(r) for r in G.walk_corpus_rel(spark, SF).collect()]
    assert rows == rows2
    edges = set()
    for a, b in duckdb.sql(f"""
        SELECT DISTINCT o_custkey % 997, o_orderkey % 997
        FROM '{SF}/orders.parquet'
        WHERE o_custkey % 997 <> o_orderkey % 997""").fetchall():
        edges.add((a, b)); edges.add((b, a))
    walks = {}
    for wid, step, node in rows:
        walks.setdefault(wid, {})[step] = node
    assert walks
    for wid, w in walks.items():
        assert sorted(w) == [0, 1, 2, 3, 4]
        assert w[0] == wid
        for s in range(4):
            assert (w[s], w[s + 1]) in edges


def test_snm_window_bound_and_verify(spark):
    """Every emitted SNM pair passes the Jaccard floor; candidate
    generation respects the block (same lang) and the window bound."""
    import duckdb
    from pikes_spark.operators import dedup as D
    rows = [tuple(r) for r in D.snm_pairs(spark, SF).collect()]
    assert rows
    langs = dict(duckdb.sql(
        f"SELECT doc_id, lang FROM '{SF}/documents.parquet'").fetchall())
    rn = {d: r for d, r in duckdb.sql(f"""
      SELECT doc_id, row_number() OVER (PARTITION BY lang
        ORDER BY substring(text, 1, 24), doc_id)
      FROM '{SF}/documents.parquet'""").fetchall()}
    for a, b, j in rows:
        assert j >= 200_000
        assert langs[a] == langs[b]
        assert abs(rn[a] - rn[b]) <= 3


def test_linear_probe_training_reduces_loss(spark):
    """Full-batch GD sanity: the trained weights strictly reduce the
    corpus squared loss vs the zero initialization (the guarantee the
    1/norm step size buys), and a second run is bit-identical."""
    import duckdb
    from pikes_spark.operators import textstats as T
    w1 = [tuple(r) for r in T.train_linear_probe(spark, SF).collect()]
    w2 = [tuple(r) for r in T.train_linear_probe(spark, SF).collect()]
    assert w1 == w2
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * "
            f"FROM '{SF}/documents.parquet'")
    con.sql("CREATE TABLE w (bucket BIGINT, wv BIGINT)")
    con.executemany("INSERT INTO w VALUES (?, ?)", w1)
    loss0, loss1 = con.sql(f"""
WITH toks AS (
  SELECT doc_id, lang, t.tok FROM documents,
       unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS t(tok)
  WHERE length(t.tok) > 0),
fb AS (
  SELECT doc_id, lang,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
           [CAST(ascii(c) AS BIGINT) for c in
            regexp_split_to_array(tok, '')]),
           (acc, ch) -> (acc * 131 + ch) % 1000000007) % 64 AS bucket,
         CAST(count(*) AS BIGINT) AS x
  FROM toks GROUP BY 1, 2, 3),
sc AS (
  SELECT fb.doc_id,
         CAST(CASE WHEN min(fb.lang) = 'en' THEN 1 ELSE 0 END
              AS BIGINT) AS y,
         sum(fb.x * w.wv) AS score
  FROM fb JOIN w ON fb.bucket = w.bucket GROUP BY fb.doc_id)
SELECT sum((0 - y * 1000000) ** 2) AS loss0,
       sum((score - y * 1000000) ** 2) AS loss1
FROM sc""").fetchone()
    assert loss1 < loss0


def test_hybrid_rrf_fuses_both_rankings(spark):
    """RRF output must contain contributions from BOTH rankings and
    respect the fusion arithmetic on a spot row."""
    from pikes_spark.operators import similarity as S
    rows = S.hybrid_rrf_topk(spark, SF).collect()
    assert rows
    assert any(r["sparse_rank"] is not None for r in rows)
    assert any(r["dense_rank"] is not None for r in rows)
    for r in rows:
        want = 0
        if r["sparse_rank"] is not None:
            want += 1_000_000 // (60 + r["sparse_rank"])
        if r["dense_rank"] is not None:
            want += 1_000_000 // (60 + r["dense_rank"])
        assert r["rrf_x1e6"] == want


def test_domain_mix_rates_and_determinism(spark):
    """Over-represented domains are downsampled (rate < 1e6), no
    domain is UP-sampled, kept tokens never exceed raw tokens, and a
    re-run selects the identical subset."""
    import duckdb
    from pikes_spark.operators import textstats as T
    r1 = [tuple(r) for r in T.domain_mix(spark, SF).collect()]
    r2 = [tuple(r) for r in T.domain_mix(spark, SF).collect()]
    assert r1 == r2 and r1
    raw = dict(duckdb.sql(f"""
      SELECT lang, sum(len(regexp_split_to_array(trim(lower(text)),
                                                 '\\s+')))
      FROM '{SF}/documents.parquet' GROUP BY lang""").fetchall())
    for lang, rate, n_docs, toks in r1:
        assert 0 < rate <= 1_000_000
        assert toks <= raw[lang]
        if rate == 1_000_000:
            assert toks == raw[lang]  # kept in full


def test_json_props_rollup_no_python_and_values(spark):
    """JSON extraction stays JVM-side; a spot aggregate agrees with a
    direct duckdb computation."""
    import duckdb
    from pikes_spark.operators import events
    df = events.json_props_rollup(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    rows = {r["event_type"]: r for r in df.collect()}
    want = duckdb.sql(f"""
      SELECT count(*), sum(CAST(json_extract_string(props, '$.k')
                                AS BIGINT))
      FROM '{SF}/events.parquet' WHERE event_type = 'click'
    """).fetchone()
    assert rows["click"]["n"] == want[0]
    assert rows["click"]["sum_k"] == want[1]


def test_compression_ratio_matches_direct_zlib(spark):
    """Differential: the Arrow-batched codec path == direct per-doc
    zlib at the same level (backs the frozen COMPRESSION_DIGEST)."""
    import zlib
    import duckdb
    from pikes_spark.operators import textstats as T
    got = {r["doc_id"]: (r["raw_len"], r["comp_len"], r["ratio_ppm"])
           for r in T.compression_ratio(spark, SF).collect()}
    for d, t in duckdb.sql(
            f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
    ).fetchall():
        b = t.encode("utf-8")
        c = len(zlib.compress(b, 6))
        assert got[d] == (len(b), c, (c * 1_000_000) // len(b))


def test_incremental_neardup_finds_every_source(spark):
    """Every synthetic arrival must match its own source doc (tail
    append keeps Jaccard >= t), and all matches point at real corpus
    docs."""
    from pikes_spark.operators import dedup as D
    rows = [tuple(r) for r in D.incremental_neardup(spark, SF).collect()]
    assert rows
    matched_sources = {(n - 10_000_000, o) for n, o, _ in rows}
    new_ids = {n for n, _, _ in rows}
    # every batch doc (doc_id % 5 == 0 in the corpus) found its source
    import duckdb
    batch_src = {d for (d,) in duckdb.sql(
        f"SELECT doc_id FROM '{SF}/documents.parquet' "
        f"WHERE doc_id % 5 = 0").fetchall()}
    assert {n - 10_000_000 for n in new_ids} <= batch_src
    # a short doc legitimately falls below t=0.8 once the tail is
    # appended (the tail is a larger fraction of its shingle set);
    # every LONG batch doc must find its own source
    long_src = {d for (d,) in duckdb.sql(
        f"SELECT doc_id FROM '{SF}/documents.parquet' "
        f"WHERE doc_id % 5 = 0 AND len(regexp_split_to_array("
        f"trim(text), '\\s+')) >= 40").fetchall()}
    assert long_src
    for src in long_src:
        assert (src, src) in matched_sources, src


def test_incremental_neardup_banding_recall_is_total(spark):
    """Pins the oracle contract (ADVICE r4): INCREMENTAL_NEARDUP_SQL is
    an exact all-pairs new-vs-old join while the Spark side only
    verifies band-sharing candidates, so equality holds iff LSH recall
    at t=0.8 is 1.0 on the frozen corpus. Assert exactly that, at the
    sf the driver value-checks (0.01): the banded output == the exact
    all-pairs above-threshold join."""
    from pyspark.sql import functions as F
    from pikes_spark.operators import dedup as D
    sf01 = "/root/testdata/sf0.01"
    docs = (spark.read.parquet(f"{sf01}/documents.parquet")
            .select("doc_id", "text"))
    batch = D._incremental_batch(docs)
    corpus_sh = D._shingles_of(docs)
    batch_sh = D._shingles_of(batch)
    exact = (batch_sh.select(F.col("doc_id").alias("new_id"),
                             F.col("shingles").alias("sn"))
             .crossJoin(corpus_sh.select(F.col("doc_id").alias("old_id"),
                                         F.col("shingles").alias("so")))
             .select("new_id", "old_id",
                     F.size(F.array_intersect("sn", "so"))
                     .cast("bigint").alias("i"),
                     (F.size("sn") + F.size("so")).cast("bigint")
                     .alias("szsum"))
             .select("new_id", "old_id",
                     F.floor(F.col("i") * 1000.0
                             / (F.col("szsum") - F.col("i")))
                     .cast("bigint").alias("jaccard_x1000"))
             .filter(F.col("jaccard_x1000") >= int(D.JACCARD_T * 1000)))
    exact_rows = sorted(tuple(r) for r in exact.collect())
    banded_rows = sorted(tuple(r) for r in
                         D.incremental_neardup(spark, sf01).collect())
    assert banded_rows == exact_rows


def test_kmeans_codebook_reduces_inertia(spark):
    """Lloyd sanity: total squared distance to the assigned centroid
    after training <= after init (monotone non-increasing inertia),
    and re-run is bit-identical."""
    import numpy as np
    import duckdb
    from pikes_spark.operators import similarity as S
    cb1 = [tuple(r) for r in S.kmeans_codebook(spark, SF).collect()]
    cb2 = [tuple(r) for r in S.kmeans_codebook(spark, SF).collect()]
    assert cb1 == cb2
    vecs = {v: np.floor(np.array(e, dtype=np.float64) * 1_000_000)
            for v, e in duckdb.sql(
        f"SELECT vec_id, CAST(embedding AS DOUBLE[]) "
        f"FROM '{SF}/embeddings.parquet'").fetchall()}
    k = 1 + max(c for c, _, _ in cb1)
    cents = np.zeros((k, 64))
    for c, p, val in cb1:
        cents[c][p] = val
    init = np.stack([vecs[i] for i in sorted(vecs)[:k]])

    def inertia(cb):
        return sum(min(((v - c) ** 2).sum() for c in cb)
                   for v in vecs.values())
    assert inertia(cents) <= inertia(init)


def test_nt_export_escaping_and_sortedness(spark):
    """Lines come out bytewise sorted, every line is a syntactically
    valid N-Triples statement, and escaping round-trips a hostile
    literal."""
    import re
    from pikes_spark.operators import kgquery
    lines = [r["nt_line"] for r in kgquery.nt_export(spark, SF).collect()]
    assert lines == sorted(lines)
    pat = re.compile(r'^<[^>]+> <[^>]+> (<[^>]+>|"(\\.|[^"\\])*") \.$')
    for ln in lines:
        assert pat.match(ln), ln
    # hostile literal through the same escape chain
    df = spark.createDataFrame(
        [('a "quoted"\\ line\nwith\ttabs',)], "object string")
    from pikes_spark.operators.kgquery import _nt_escape
    out = df.select(_nt_escape(F.col("object")).alias("e")).first()["e"]
    assert out == 'a \\"quoted\\"\\\\ line\\nwith\\ttabs'


def test_contrastive_pairs_semantics(spark):
    """Positive = the anchor's own next window; negative never comes
    from the anchor document; deterministic across runs."""
    from pikes_spark.operators import textstats as T
    r1 = [tuple(r) for r in T.contrastive_pairs(spark, SF).collect()]
    r2 = [tuple(r) for r in T.contrastive_pairs(spark, SF).collect()]
    assert r1 == r2 and r1
    chunks = {(r["doc_id"], r["chunk_no"]): r["chunk_md5"]
              for r in T.chunk_windows(spark, SF).collect()}
    for doc, cno, amd5, pmd5, nmd5, ndoc in r1:
        assert chunks[(doc, cno)] == amd5
        assert chunks[(doc, cno + 1)] == pmd5
        assert ndoc != doc


def test_schema_evolution_null_backfill_and_time_travel(spark, tmp_path):
    """A column added in a later commit reads as NULL on older files
    under the unified schema; time travel reads the old snapshot with
    its own (narrower) schema."""
    from pikes_spark.sources.tables import SnapshotTable
    t = SnapshotTable(str(tmp_path / "t"), name="evo")
    t.append(spark.createDataFrame([(1, 10)], "k long, v long"), spark)
    t.append(spark.createDataFrame([(2, 20, "x")],
                                   "k long, v long, extra string"), spark)
    cur = t.read(spark, merge_schema=True)
    assert set(cur.columns) == {"k", "v", "extra"}
    rows = {r["k"]: r["extra"] for r in cur.collect()}
    assert rows == {1: None, 2: "x"}
    old = t.read(spark, sequence=0)
    assert set(old.columns) == {"k", "v"}
    assert old.count() == 1


def test_gnn_neighbor_mean_spot_node(spark):
    """Spot-check one node's aggregated feature digest against a
    direct numpy computation."""
    import numpy as np
    import duckdb
    from pikes_spark.operators import graph as G
    rows = {r["node"]: (r["dim"], r["sum_m"], r["min_m"], r["max_m"])
            for r in G.neighbor_mean_features(spark, SF).collect()}
    edges = duckdb.sql(f"""
      SELECT DISTINCT LEAST(o_custkey % 997, o_orderkey % 997),
                      GREATEST(o_custkey % 997, o_orderkey % 997)
      FROM '{SF}/orders.parquet'
      WHERE o_custkey % 997 <> o_orderkey % 997""").fetchall()
    embs = {v: np.floor(np.array(e, dtype=np.float64) * 1_000_000)
            for v, e in duckdb.sql(
        f"SELECT vec_id, CAST(embedding AS DOUBLE[]) "
        f"FROM '{SF}/embeddings.parquet'").fetchall()}
    node = next(iter(rows))
    nbrs = [b for a, b in edges if a == node] + \
           [a for a, b in edges if b == node]
    mat = np.stack([embs[n % 500] for n in nbrs])
    m = np.array([int(s) // len(nbrs) if s >= 0
                  else -((-int(s) + len(nbrs) - 1) // len(nbrs))
                  for s in mat.sum(axis=0)])
    # python // floors; engines truncate toward zero — recompute with
    # truncation semantics
    m = np.array([int(s) // len(nbrs) if int(s) % len(nbrs) == 0
                  or int(s) >= 0 else int(s) // len(nbrs) + 1
                  for s in mat.sum(axis=0)])
    assert rows[node] == (64, int(m.sum()), int(m.min()), int(m.max()))
