"""Round-5 operators: RAG token-window chunking, bucketed interval
range join, SemDeDup (within-cluster semantic near-dup drop)."""

import numpy as np
from pyspark.sql import functions as F

from pikes_spark.operators import events, similarity, textstats

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# txt_chunks
# ---------------------------------------------------------------------------

def test_chunks_cover_every_token_once_per_stride(spark):
    """Chunk starts are 0, stride, ... < n_tokens; each chunk is the
    next `size` tokens truncated at the end; together they cover the
    whole document."""
    out = textstats.chunk_documents(spark, SF, size=8, stride=5).collect()
    docs = {r.doc_id: r for r in
            spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", F.size(textstats._tokens(F.col("text")))
                    .alias("n")).collect()}
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, rows in by_doc.items():
        n = docs[doc_id].n
        rows.sort(key=lambda r: r.chunk_idx)
        assert [r.start_tok for r in rows] == list(range(0, n, 5))
        for r in rows:
            assert r.n_tokens == min(8, n - r.start_tok)
        # coverage: last chunk reaches the end
        last = rows[-1]
        assert last.start_tok + last.n_tokens == n


def test_chunks_hash_matches_manual_slice(spark):
    import hashlib
    doc = (spark.read.parquet(f"{SF}/documents.parquet")
           .orderBy("doc_id").limit(1).collect()[0])
    toks = doc.text.strip().lower().split()
    out = (textstats.chunk_documents(spark, SF)
           .filter(F.col("doc_id") == doc.doc_id)
           .orderBy("chunk_idx").collect())
    for r in out:
        want = " ".join(toks[r.start_tok:r.start_tok + 64])
        assert r.chunk_hash == hashlib.md5(want.encode()).hexdigest()


# ---------------------------------------------------------------------------
# evt_range_join
# ---------------------------------------------------------------------------

def test_range_join_equals_naive_inequality_join(spark):
    """The bucketed plan must equal the naive (user-key only)
    inequality join it replaces."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    ts = F.col("ts").cast("timestamp").cast("long")
    p = (ev.filter(F.col("event_type") == "purchase")
         .select("event_id", "user_id", ts.alias("p_s")))
    v = (ev.filter(F.col("event_type") == "view")
         .select("user_id", ts.alias("v_s")))
    naive = (p.join(v, "user_id", "left")
             .withColumn("hit", (F.col("v_s") >= F.col("p_s") - 1800)
                         & (F.col("v_s") < F.col("p_s")))
             .groupBy("event_id")
             .agg(F.sum(F.col("hit").cast("long")).alias("n"),
                  F.max(F.when(F.col("hit"), F.col("v_s"))).alias("last_v"),
                  F.first("p_s").alias("p_s")))
    want = {(r.event_id, r.n or 0,
             (r.p_s - r.last_v) if r.last_v is not None else None)
            for r in naive.collect()}
    got = {(r.event_id, r.n_views_30m, r.last_view_gap_s)
           for r in events.range_join_views(spark, SF).collect()}
    assert got == want


def test_range_join_bucket_edge_cases(spark):
    """A view exactly window_s before is included; one at the same
    second is excluded; bucket-boundary crossing works."""
    rows = [(1, "2024-01-01 10:00:00", 7, "purchase", 1.0, "{}"),
            (2, "2024-01-01 09:30:00", 7, "view", 0.0, "{}"),   # == -1800s
            (3, "2024-01-01 10:00:00", 7, "view", 0.0, "{}"),   # same sec
            (4, "2024-01-01 09:29:59", 7, "view", 0.0, "{}"),   # too old
            (5, "2024-01-01 09:59:59", 7, "view", 0.0, "{}")]   # in window
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        (spark.createDataFrame(rows, ["event_id", "ts", "user_id",
                                      "event_type", "value", "props"])
         .withColumn("ts", F.col("ts").cast("timestamp"))
         .write.parquet(f"{d}/events.parquet"))
        out = events.range_join_views(spark, d).collect()
    assert len(out) == 1
    assert out[0].n_views_30m == 2          # events 2 and 5
    assert out[0].last_view_gap_s == 1      # event 5, one second before


# ---------------------------------------------------------------------------
# sim_semdedup
# ---------------------------------------------------------------------------

def test_semdedup_matches_numpy_differential(spark):
    out = similarity.semdedup(spark, SF).collect()
    emb = (spark.read.parquet(f"{SF}/embeddings.parquet")
           .orderBy("vec_id").collect())
    ids = np.array([r.vec_id for r in emb])
    V = np.floor(np.array([r.embedding for r in emb], dtype="float64")
                 * 1e6).astype("int64")
    k, iters, theta2 = 4, 2, similarity._SD_THETA2
    C = V[np.argsort(ids)[:k]].copy()
    for _ in range(iters):
        d = ((V[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        a = np.argmin(d * k + np.arange(k)[None, :], axis=1)
        for c in range(k):
            m = a == c
            if m.any():
                # truncate toward zero like Spark's `s div n` and
                # DuckDB's `//` — numpy's floor-div rounds negative
                # components down instead (ADVICE r5: latent flake)
                C[c] = np.trunc(V[m].sum(0) / m.sum()).astype("int64")
    d = ((V[:, None, :] - C[None, :, :]) ** 2).sum(-1)
    a = np.argmin(d * k + np.arange(k)[None, :], axis=1)
    dropped = set()
    for c in range(k):
        idx = np.where(a == c)[0]
        D = ((V[idx][:, None, :] - V[idx][None, :, :]) ** 2).sum(-1)
        # emb is ordered by vec_id, so position order == id order and
        # j > i means ids[idx[j]] is the larger (dropped) vec_id
        for i in range(len(idx)):
            for j in range(i + 1, len(idx)):
                if D[i, j] <= theta2:
                    dropped.add(int(ids[idx[j]]))
    want = {(int(i), int(c), int(i) not in dropped)
            for i, c in zip(ids, a)}
    got = {(r.vec_id, r.cluster, r.kept) for r in out}
    assert got == want


def test_semdedup_planted_neardup_dropped(spark):
    """Two near-identical vectors -> the higher vec_id is dropped,
    everything else kept."""
    import tempfile
    base = [float(x) for x in np.linspace(-1, 1, 64)]
    far = [float(x) for x in np.linspace(1, -1, 64)]
    rows = [(0, base, 0), (1, [x + 1e-6 for x in base], 0),
            (2, far, 1), (3, [x * 0.5 for x in far], 1)]
    with tempfile.TemporaryDirectory() as d:
        (spark.createDataFrame(rows, "vec_id: long, embedding: array<float>,"
                               " label: int")
         .write.parquet(f"{d}/embeddings.parquet"))
        out = {r.vec_id: r.kept
               for r in similarity.semdedup(spark, d, k=2, iters=1).collect()}
    assert out == {0: True, 1: False, 2: True, 3: True}
