"""Similarity search over the ``embeddings`` table.

- brute-force cosine top-k: exact baseline, pure Catalyst
  (zip_with + aggregate dot products — JVM-side, codegen'd).
- IVF (inverted-file) ANN: deterministic k-means-lite centroids,
  cluster assignment via broadcast centroid table, probe nprobe
  nearest clusters — the scale path: the query only scans
  nprobe/nlist of the corpus.

Fixed-point outputs (cos * 1e6 floored) so Spark and the DuckDB
oracle (list_cosine_similarity) agree bit-for-bit.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(c):
    return F.sqrt(F.aggregate(F.transform(c, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def brute_force_topk(spark: SparkSession, sf_dir: str, query_vec_id: int = 0,
                     k: int = 10) -> DataFrame:
    """Exact top-k by cosine to the query embedding (excluding itself).
    One broadcast of the query row; ties broken by vec_id."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    e = emb.select("vec_id", _as_double(F.col("embedding")).alias("v"))
    q = e.filter(F.col("vec_id") == query_vec_id) \
         .select(F.col("v").alias("qv"))
    cos = _dot(F.col("v"), F.col("qv")) / (_norm(F.col("v")) * _norm(F.col("qv")))
    scored = (e.crossJoin(F.broadcast(q))
              .filter(F.col("vec_id") != query_vec_id)
              .withColumn("cos_x1e6", F.floor(cos * 1e6).cast("bigint")))
    return (scored.orderBy(F.desc("cos_x1e6"), F.asc("vec_id"))
            .select("vec_id", "cos_x1e6")
            .limit(k))


def brute_force_topk_sql(query_vec_id: int = 0, k: int = 10) -> str:
    return f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), q AS (
  SELECT v AS qv FROM e WHERE vec_id = {query_vec_id}
)
SELECT e.vec_id,
       CAST(floor(list_cosine_similarity(e.v, q.qv) * 1000000) AS BIGINT) AS cos_x1e6
FROM e, q
WHERE e.vec_id <> {query_vec_id}
ORDER BY cos_x1e6 DESC, e.vec_id ASC
LIMIT {k}
"""


# ---------------------------------------------------------------------------
# IVF ANN
# ---------------------------------------------------------------------------

def train_centroids(emb_pdf: np.ndarray, nlist: int, iters: int = 5,
                    seed: int = 42) -> np.ndarray:
    """Deterministic k-means on a sample (driver-side numpy — the
    centroid table is tiny and broadcast; at scale train on a
    .sample() pulled to the driver, exactly as FAISS IVF trains on a
    corpus sample)."""
    rng = np.random.RandomState(seed)
    n = emb_pdf.shape[0]
    idx = rng.choice(n, size=min(nlist, n), replace=False)
    cents = emb_pdf[np.sort(idx)].copy()
    for _ in range(iters):
        d = emb_pdf @ cents.T
        norms = np.linalg.norm(emb_pdf, axis=1)[:, None] * np.linalg.norm(cents, axis=1)[None, :]
        norms[norms == 0] = 1.0
        assign = np.argmax(d / norms, axis=1)
        for c in range(cents.shape[0]):
            members = emb_pdf[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def ivf_topk(spark: SparkSession, sf_dir: str, query_vec_id: int = 0,
             k: int = 10, nlist: int = 16, nprobe: int = 4) -> DataFrame:
    """IVF ANN: assign every vector to its nearest centroid (broadcast
    centroid join), then scan only the nprobe clusters nearest to the
    query. Returns (vec_id, cos_x1e6); recall vs brute force is
    checked in tests."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    sample_rows = (emb.select("vec_id", "embedding")
                   .orderBy("vec_id").limit(2048).collect())
    sample = np.array([r["embedding"] for r in sample_rows],
                      dtype=np.float64)
    cents = train_centroids(sample, nlist)
    cent_rows = [(int(i), [float(x) for x in c]) for i, c in enumerate(cents)]
    cdf = spark.createDataFrame(cent_rows, "cid int, cv array<double>")

    e = emb.select("vec_id", _as_double(F.col("embedding")).alias("v"))
    # hoist the two norms out of the ×nlist expansion: ||v|| is computed
    # once per vector (not once per centroid pair) and ||cv|| once per
    # centroid row inside the broadcast build — the same doubles the
    # inline expressions produced, so sim (and every argmax) is
    # bit-identical, at 1/nlist the aggregate work
    e = e.withColumn("nv", _norm(F.col("v")))
    cdf = cdf.withColumn("cn", _norm(F.col("cv")))
    sim = _dot(F.col("v"), F.col("cv")) / (F.col("nv") * F.col("cn"))
    # centroid assignment is an argmax per vec_id: max_by with a
    # (sim, -cid) tie-break runs as ONE partial-then-final aggregation
    # (map-side combine shrinks the exchange to one row per vec_id); a
    # row_number window here would shuffle the full ×nlist expansion —
    # nlist× the table — before discarding all but one row per key
    assigned = (e.crossJoin(F.broadcast(cdf))
                .withColumn("sim", sim)
                .groupBy("vec_id")
                .agg(F.max_by(
                        "cid", F.struct(F.col("sim").alias("s"),
                                        (-F.col("cid")).alias("tb")))
                     .alias("cid"),
                     F.any_value("v").alias("v"))
                .select("vec_id", "v", "cid"))

    # the query row comes from the already-collected training sample
    # when it is in it (float32 -> float64 is exact, so the values are
    # the same doubles the JVM cast produced), else one cheap base-table
    # collect — pulling it out of `assigned` forced the whole ×nlist
    # assignment aggregation to run twice
    qrow = next((r for r in sample_rows if r["vec_id"] == query_vec_id),
                None)
    if qrow is not None:
        qv = [float(x) for x in qrow["embedding"]]
    else:
        qv = e.filter(F.col("vec_id") == query_vec_id).collect()[0]["v"]
    qnp = np.array(qv)
    csim = cents @ qnp
    cn = np.linalg.norm(cents, axis=1) * np.linalg.norm(qnp)
    cn[cn == 0] = 1.0
    probe = np.argsort(-(csim / cn))[:nprobe].tolist()

    qdf = spark.createDataFrame([([float(x) for x in qv],)], "qv array<double>")
    qdf = qdf.withColumn("qn", _norm(F.col("qv")))  # once, in the broadcast
    cos = _dot(F.col("v"), F.col("qv")) / (_norm(F.col("v")) * F.col("qn"))
    return (assigned.filter(F.col("cid").isin(probe))
            .filter(F.col("vec_id") != query_vec_id)
            .crossJoin(F.broadcast(qdf))
            .withColumn("cos_x1e6", F.floor(cos * 1e6).cast("bigint"))
            .orderBy(F.desc("cos_x1e6"), F.asc("vec_id"))
            .select("vec_id", "cos_x1e6")
            .limit(k))


def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid (the aggregation step of k-means /
    IVF training) computed as pure Catalyst: posexplode to
    (label, dim, value) and mean per cell — no UDF, no collect.

    Each value is floored to x1e7 fixed point BEFORE the sum, so the
    aggregation is integer and therefore order-independent — float
    sums would differ in the last ulp between engines (and between
    partitionings of the same engine) once shuffle order changes.
    Output (label, dim, centroid_x1e7), one row per cell.

    Scale shape: the exchange carries (label, dim) keyed partial sums
    — map-side combine reduces each task to labels x dims rows, so at
    10^9 vectors the shuffle is centroid-sized, not data-sized."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    fixed = F.transform(
        "embedding",
        lambda v: F.floor(v.cast("double") * 1e7).cast("bigint"))
    ex = emb.select("label", F.posexplode(fixed).alias("dim", "v"))
    return (ex.groupBy("label", "dim")
            .agg(F.floor(F.sum("v") * 1.0 / F.count("*")).cast("bigint")
                 .alias("centroid_x1e7"))
            .orderBy("label", "dim"))


LABEL_CENTROIDS_SQL = """
WITH ex AS (
  SELECT label, i - 1 AS dim,
         CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e7) AS BIGINT) AS v
  FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS r(i)
)
SELECT label, dim,
       CAST(floor(SUM(v) * 1.0 / count(*)) AS BIGINT) AS centroid_x1e7
FROM ex GROUP BY label, dim
ORDER BY label, dim
"""


# ---------------------------------------------------------------------------
# All-pairs k-NN graph (semantic-dedup / clustering primitive)
# ---------------------------------------------------------------------------

_KNN_K = 5


def knn_graph(spark: SparkSession, sf_dir: str, k: int = _KNN_K,
              n_blocks: int = 8) -> DataFrame:
    """Exact cosine k-NN graph over EVERY embedding (the SemDeDup /
    clustering primitive: each doc's k nearest neighbors), via the
    same B x B block-grid GEMM as ``dedup.embedding_neardup_pairs`` —
    never a row-level crossJoin.

    Scale shape:
      - the only cross product is over B x B block-METADATA rows; each
        grid cell runs one vectorized numpy product for its chunk pair;
      - each cell emits only its CELL-LOCAL top-k per source row
        (selected under the same (cos desc, dst asc) total order the
        final ranking uses, so the prune is exact even across ties):
        the shuffle carries <= B*k rows per source, not n;
      - the global per-src rank is a window over those <= B*k rows.
    Fixed-point cos (floor x1e6) with the DuckDB sequential-fold
    accumulation order, so ranks are bit-stable cross-engine."""
    import pandas as pd
    from typing import Iterator, List

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    v = F.transform("embedding", lambda x: x.cast("double"))
    blocks = (emb.select((F.col("vec_id") % n_blocks).alias("block"),
                         F.struct(F.col("vec_id"), v.alias("v")).alias("row"))
              .groupBy("block")
              .agg(F.collect_list("row").alias("rows")))
    left = blocks.select(F.col("block").alias("ba"), F.col("rows").alias("ra"))
    right = blocks.select(F.col("block").alias("bb"), F.col("rows").alias("rb"))
    grid = left.join(right, F.col("ba") <= F.col("bb"))

    def cell_topk(ids_s: np.ndarray, ids_d: np.ndarray,
                  fp: np.ndarray, out: List) -> None:
        # per-source top-k of this cell under (cos desc, dst asc)
        for i in range(fp.shape[0]):
            row = fp[i]
            mask = ids_d != ids_s[i]
            cand_fp, cand_d = row[mask], ids_d[mask]
            if len(cand_fp) > k:
                order = np.lexsort((cand_d, -cand_fp))[:k]
            else:
                order = np.arange(len(cand_fp))
            out.append((np.full(len(order), ids_s[i]),
                        cand_d[order], cand_fp[order]))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parts: List = []
            for row in pdf.itertuples(index=False):
                ids_a = np.array([r["vec_id"] for r in row.ra])
                va = np.array([r["v"] for r in row.ra], dtype=np.float64)
                ids_b = np.array([r["vec_id"] for r in row.rb])
                vb = np.array([r["v"] for r in row.rb], dtype=np.float64)
                dim = va.shape[1]
                # DuckDB list_cosine_similarity fold order (see
                # embedding_neardup_pairs)
                dots = np.zeros((len(va), len(vb)))
                for d in range(dim):
                    dots += np.outer(va[:, d], vb[:, d])
                na = np.zeros(len(va))
                nb = np.zeros(len(vb))
                for d in range(dim):
                    na += va[:, d] * va[:, d]
                    nb += vb[:, d] * vb[:, d]
                cos = dots / np.sqrt(np.outer(na, nb))
                fp = np.floor(cos * 1e6).astype(np.int64)
                cell_topk(ids_a, ids_b, fp, parts)
                if row.ba != row.bb:
                    cell_topk(ids_b, ids_a, fp.T, parts)
            if parts:
                yield pd.DataFrame({
                    "src": np.concatenate([p[0] for p in parts]),
                    "dst": np.concatenate([p[1] for p in parts]),
                    "cos_x1e6": np.concatenate([p[2] for p in parts]),
                }).astype("int64")

    cand = grid.mapInPandas(gen, "src long, dst long, cos_x1e6 long")
    w = Window.partitionBy("src").orderBy(F.desc("cos_x1e6"), F.asc("dst"))
    return (cand.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select("src", "dst", "cos_x1e6",
                    F.col("rk").cast("bigint").alias("rk"))
            .orderBy("src", "rk"))


KNN_GRAPH_SQL = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
s AS (
  SELECT x.vec_id AS src, y.vec_id AS dst,
         CAST(floor(list_cosine_similarity(x.v, y.v) * 1000000) AS BIGINT)
           AS cos_x1e6
  FROM e x JOIN e y ON x.vec_id <> y.vec_id
),
r AS (
  SELECT *, row_number() OVER (
      PARTITION BY src ORDER BY cos_x1e6 DESC, dst) AS rk
  FROM s
)
SELECT src, dst, cos_x1e6, CAST(rk AS BIGINT) AS rk
FROM r WHERE rk <= {_KNN_K}
ORDER BY src, rk
"""


# ---------------------------------------------------------------------------
# int8 scalar quantization: memory-bound ANN serving, recall vs exact
# ---------------------------------------------------------------------------

def _quantize(v):
    """Symmetric int8 scalar quantization: q_i = floor(v_i * 127 /
    max|v| + 0.5). Scale factors cancel inside cosine, so ranking
    uses only the integer vectors — integer dot products are EXACT in
    doubles (values <= 127^2 * dim), which is what makes the oracle
    deterministic: the only float ops left are one sqrt and one
    divide on integer-valued doubles."""
    ma = F.array_max(F.transform(v, lambda x: F.abs(x)))
    return F.transform(
        v, lambda x: F.floor(x * 127.0 / ma + 0.5).cast("long"))


def quantized_recall(spark: SparkSession, sf_dir: str,
                     query_vec_id: int = 0, k: int = 10) -> DataFrame:
    """Recall@k of int8-quantized cosine search against the exact
    float top-k — the accuracy/cost tradeoff of serving embeddings at
    1/4 the bytes (the scalar-quantization half of a PQ story).

    Scale shape: quantization is a map-only projection; the search is
    the same broadcast-query scan as brute_force_topk (one pass, top-k
    via TakeOrderedAndProject); recall is a k-row join. At 100 TB the
    win is bandwidth: the scan streams 1 byte/dim instead of 4."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    e = emb.select("vec_id", _as_double(F.col("embedding")).alias("v"))
    qz = e.select("vec_id", _quantize(F.col("v")).alias("q"))
    qrow = (qz.filter(F.col("vec_id") == query_vec_id)
            .select(F.col("q").alias("qq")))
    dot = F.aggregate(F.zip_with("q", "qq", lambda a, b: a * b),
                      F.lit(0).cast("long"), lambda acc, x: acc + x)
    nrm = lambda c: F.aggregate(  # noqa: E731
        c, F.lit(0).cast("long"), lambda acc, x: acc + x * x)
    scored = (qz.crossJoin(F.broadcast(qrow))
              .filter(F.col("vec_id") != query_vec_id)
              .withColumn(
                  "score_x1e6",
                  F.floor(dot / F.sqrt(nrm(F.col("q")) * nrm(F.col("qq")))
                          * 1e6).cast("bigint")))
    approx = (scored.orderBy(F.desc("score_x1e6"), F.asc("vec_id"))
              .select("vec_id").limit(k))
    exact = brute_force_topk(spark, sf_dir, query_vec_id, k) \
        .select("vec_id")
    n_match = approx.join(exact, "vec_id").count()
    return spark.createDataFrame(
        [(k, n_match, n_match * 100 // k)],
        "k int, n_match int, recall_x100 bigint")


def quantized_recall_sql(query_vec_id: int = 0, k: int = 10) -> str:
    return f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
qz AS (
  SELECT vec_id,
         list_transform(v, x -> CAST(floor(
             x * 127.0 / list_max(list_transform(v, a -> abs(a))) + 0.5)
             AS BIGINT)) AS q
  FROM e
),
qq AS (SELECT q AS qv FROM qz WHERE vec_id = {query_vec_id}),
scored AS (
  SELECT z.vec_id,
         CAST(floor(list_dot_product(z.q, qq.qv)
              / sqrt(list_dot_product(z.q, z.q)
                     * list_dot_product(qq.qv, qq.qv)) * 1e6) AS BIGINT)
           AS score_x1e6
  FROM qz z, qq WHERE z.vec_id <> {query_vec_id}
),
approx AS (SELECT vec_id FROM scored
           ORDER BY score_x1e6 DESC, vec_id LIMIT {k}),
exact AS (
  SELECT e.vec_id,
         CAST(floor(list_cosine_similarity(e.v, q2.qv) * 1000000) AS BIGINT)
           AS cos_x1e6
  FROM e, (SELECT v AS qv FROM e WHERE vec_id = {query_vec_id}) q2
  WHERE e.vec_id <> {query_vec_id}
  ORDER BY cos_x1e6 DESC, e.vec_id ASC LIMIT {k}
)
SELECT {k} AS k, CAST(count(*) AS INT) AS n_match,
       CAST(count(*) * 100 // {k} AS BIGINT) AS recall_x100
FROM approx JOIN exact USING (vec_id)
"""


# ---------------------------------------------------------------------------
# hybrid retrieval: reciprocal-rank fusion of BM25 and dense top-k
# ---------------------------------------------------------------------------

_RRF_C = 60          # the standard RRF constant (Cormack et al. 2009)
_RRF_POOL = 20       # depth of each input ranking
_RRF_K = 15          # fused results returned


def hybrid_rrf_topk(spark: SparkSession, sf_dir: str,
                    query_vec_id: int = 0, k: int = _RRF_K) -> DataFrame:
    """RAG-style hybrid retrieval: fuse the BM25 (sparse) top-20 and
    the embedding-cosine (dense) top-20 for the same corpus by
    reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009):

        rrf(d) = sum over rankings of  1 / (C + rank_d)

    computed as the exact integer 1000000 div (C + rank), so the fused
    ordering is engine- and partitioning-independent. Documents found
    by only one ranking contribute one term (standard RRF over pooled
    lists). vec_id is doc_id in this corpus (aligned tables).

    Scale shape: each input ranking is already a bounded top-k
    (their own operators carry the scale argument — broadcast query
    row / pruned term scan); fusion itself runs on 2×20 rows, so the
    rank windows and the outer join are driver-scale no-ops however
    large the corpus. That asymmetry — rank deep, fuse shallow — is
    exactly why RRF is the production hybrid-retrieval default."""
    from pyspark.sql import Window

    from pikes_spark.operators.textstats import bm25_topk

    sparse = bm25_topk(spark, sf_dir, k=_RRF_POOL)
    dense = brute_force_topk(spark, sf_dir, query_vec_id, k=_RRF_POOL)
    ws = Window.orderBy(F.desc("score_x1e6"), F.asc("doc_id"))
    wd = Window.orderBy(F.desc("cos_x1e6"), F.asc("vec_id"))
    s = (sparse.withColumn("sparse_rank", F.row_number().over(ws))
         .select("doc_id", "sparse_rank"))
    d = (dense.withColumn("dense_rank", F.row_number().over(wd))
         .select(F.col("vec_id").alias("doc_id"), "dense_rank"))
    fused = (s.join(d, "doc_id", "full_outer")
             .select(
                 "doc_id", "sparse_rank", "dense_rank",
                 (F.expr(f"1000000 div ({_RRF_C} + coalesce(sparse_rank,"
                         f" 1000000000))")
                  + F.expr(f"1000000 div ({_RRF_C} + coalesce(dense_rank,"
                           f" 1000000000))")).alias("rrf_x1e6")))
    return (fused.orderBy(F.desc("rrf_x1e6"), F.asc("doc_id"))
            .limit(k))


def hybrid_rrf_sql(query_vec_id: int = 0, k: int = _RRF_K) -> str:
    from pikes_spark.operators.textstats import BM25_SQL
    return f"""
WITH sparse AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY score_x1e6 DESC, doc_id)
           AS sparse_rank
  FROM ({BM25_SQL})
),
dense AS (
  SELECT vec_id AS doc_id,
         row_number() OVER (ORDER BY cos_x1e6 DESC, vec_id)
           AS dense_rank
  FROM ({brute_force_topk_sql(query_vec_id, _RRF_POOL)})
)
SELECT COALESCE(sparse.doc_id, dense.doc_id) AS doc_id,
       sparse_rank, dense_rank,
       (1000000 // ({_RRF_C} + COALESCE(sparse_rank, 1000000000)))
       + (1000000 // ({_RRF_C} + COALESCE(dense_rank, 1000000000)))
         AS rrf_x1e6
FROM sparse FULL OUTER JOIN dense ON sparse.doc_id = dense.doc_id
ORDER BY rrf_x1e6 DESC, doc_id LIMIT {k}
"""


# ---------------------------------------------------------------------------
# distributed k-means (Lloyd) in integer fixed point — codebook training
# ---------------------------------------------------------------------------

_KM_K = 4
_KM_ITERS = 2
_KM_SCALE = 1_000_000
_KM_DIM = 64


def _km_int_vecs(spark, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return emb.select(
        "vec_id",
        F.transform("embedding",
                    lambda x: F.floor(x.cast("double") * _KM_SCALE)
                    .cast("bigint")).alias("v"))


def _km_dist(v, c):
    return F.aggregate(
        F.zip_with(v, c, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("bigint"), lambda acc, x: acc + x)


def kmeans_codebook(spark: SparkSession, sf_dir: str,
                    k: int = _KM_K, iters: int = _KM_ITERS) -> DataFrame:
    """Distributed Lloyd k-means over the embedding table, every step
    in integer fixed point — the codebook-training stage of a vector
    index (IVF coarse quantizer / PQ subspace codebooks), run as pure
    DataFrame ops so the trained centroids are BIT-IDENTICAL across
    engines and cluster sizes (floats are floored to millionths once,
    then assignment = integer L2 argmin, update = truncating-div
    component mean — no float accumulation anywhere).

    Init: the k lowest vec_ids (deterministic; real trainers use a
    sampled init, which is exactly as arbitrary). Empty clusters keep
    their previous centroid (standard Lloyd convention).

    Scale shape per iteration: assignment is a broadcast of the k×dim
    codebook + a map-side min_by argmin (NO per-vector exchange);
    update is one (cluster, pos)-keyed partial aggregation whose
    output is k·dim rows. At 10^9 vectors each Lloyd round moves one
    codebook-sized table plus the k·dim partial sums — the textbook
    parameter-light distributed training loop. Returns (cluster, pos,
    val) — the final codebook, value-checked in DuckDB via unrolled
    CTEs."""
    vecs = _km_int_vecs(spark, sf_dir).localCheckpoint()
    # deterministic init: the k lowest vec_ids, renumbered 0..k-1
    # (k rows — the only driver-side data in the loop)
    init_ids = sorted(r["vec_id"] for r in
                      vecs.select("vec_id").orderBy("vec_id")
                      .limit(k).collect())
    id2cluster = F.create_map(
        *[F.lit(x) for i, vid in enumerate(init_ids) for x in (vid, i)])
    cents = (vecs.filter(F.col("vec_id").isin(init_ids))
             .select(id2cluster[F.col("vec_id")].cast("int")
                     .alias("cluster"), F.col("v").alias("c")))
    cents = spark.createDataFrame(cents.collect(), cents.schema)
    for _ in range(iters):
        assign = (vecs.crossJoin(F.broadcast(cents))
                  .select("vec_id", "v", "cluster",
                          _km_dist(F.col("v"), F.col("c")).alias("d"))
                  .groupBy("vec_id")
                  .agg(F.min_by("cluster",
                                F.col("d") * k + F.col("cluster"))
                       .alias("cluster"),
                       F.first("v").alias("v")))
        upd = (assign.select("cluster", F.posexplode("v")
                             .alias("pos", "x"))
               .groupBy("cluster", "pos")
               .agg(F.sum("x").alias("s"),
                    F.count("*").alias("n"))
               .select("cluster", "pos",
                       F.expr("s div n").alias("val")))
        new_c = (upd.groupBy("cluster")
                 .agg(F.transform(
                     F.array_sort(F.collect_list(F.struct("pos", "val"))),
                     lambda st: st["val"]).alias("c")))
        cents = (cents.select("cluster").join(new_c, "cluster", "left")
                 .join(cents.select(F.col("cluster").alias("cluster_old"),
                                    F.col("c").alias("c_old")),
                       F.col("cluster") == F.col("cluster_old"))
                 .select("cluster", F.coalesce("c", "c_old").alias("c"))
                 .localCheckpoint())
    return (cents.select("cluster", F.posexplode("c").alias("pos", "val"))
            .select(F.col("cluster").cast("bigint"),
                    F.col("pos").cast("bigint"),
                    F.col("val").cast("bigint"))
            .orderBy("cluster", "pos"))


def _km_iter_sql(t: int, k: int) -> str:
    prev = f"c{t - 1}"
    return f"""a{t} AS (
  SELECT vec_id, arg_min(cluster, CAST(d AS BIGINT) * {k} + cluster)
           AS cluster
  FROM (
    SELECT v.vec_id, c.cluster,
           list_sum(list_transform(range(1, {_KM_DIM} + 1),
             i -> (v.v[i] - c.c[i]) * (v.v[i] - c.c[i]))) AS d
    FROM vecs v CROSS JOIN {prev} c
  ) GROUP BY vec_id
),
u{t} AS (
  SELECT a.cluster, p.pos, CAST(sum(v.v[p.pos]) AS BIGINT)
           // count(*) AS val
  FROM a{t} a JOIN vecs v USING (vec_id)
  CROSS JOIN (SELECT unnest(range(1, {_KM_DIM} + 1)) AS pos) p
  GROUP BY a.cluster, p.pos
),
c{t} AS (
  SELECT prev.cluster,
         COALESCE(nc.c, prev.c) AS c
  FROM {prev} prev LEFT JOIN (
    SELECT cluster, list(val ORDER BY pos) AS c
    FROM u{t} GROUP BY cluster) nc USING (cluster)
)"""


KMEANS_SQL = f"""
WITH vecs AS (
  SELECT vec_id,
         [CAST(floor(CAST(x AS DOUBLE) * {_KM_SCALE}) AS BIGINT)
          for x in embedding] AS v
  FROM embeddings
),
c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT)
           AS cluster, v AS c
  FROM (SELECT vec_id, v FROM vecs ORDER BY vec_id LIMIT {_KM_K})
),
__ITERS__
SELECT cluster, CAST(p.pos - 1 AS BIGINT) AS pos,
       CAST(c[p.pos] AS BIGINT) AS val
FROM c{_KM_ITERS} CROSS JOIN
     (SELECT unnest(range(1, {_KM_DIM} + 1)) AS pos) p
ORDER BY cluster, pos
""".replace("__ITERS__", ",\n".join(_km_iter_sql(t, _KM_K)
                                    for t in range(1, _KM_ITERS + 1)))


# ---------------------------------------------------------------------------
# k-NN majority-vote classification
# ---------------------------------------------------------------------------

_KNC_ENC = 16  # > max label (labels are 0..9)


def knn_classify(spark: SparkSession, sf_dir: str,
                 k: int = _KNN_K) -> DataFrame:
    """Leave-one-out k-NN classification over the embeddings table:
    each vector is labeled by the (most frequent, then smallest) label
    among its k exact-cosine nearest neighbors — the evaluation loop
    every embedding-quality dashboard runs.

    Built ON the knn_graph operator (block-grid GEMM, cell-local
    top-k), so the expensive part is the already-audited exact k-NN;
    the vote is one (src, label) count + one integer-MAX argmax
    (cnt*ENC encoding — deterministic ties, no window), then a
    broadcast join back to the true labels.

    Returns (vec_id, true_label, pred_label, correct)."""
    knn = knn_graph(spark, sf_dir, k=k)
    labels = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
              .select(F.col("vec_id").cast("bigint").alias("vec_id"),
                      F.col("label").cast("bigint").alias("label")))
    votes = (knn.join(labels.select(F.col("vec_id").alias("dst"),
                                    F.col("label").alias("nbr_label")),
                      "dst")
             .groupBy("src", "nbr_label").agg(F.count("*").alias("cnt")))
    pred = (votes.groupBy("src")
            .agg(F.max(F.col("cnt") * _KNC_ENC
                       + (_KNC_ENC - 1 - F.col("nbr_label"))).alias("m"))
            .select(F.col("src").alias("vec_id"),
                    (F.lit(_KNC_ENC - 1) - F.col("m") % _KNC_ENC)
                    .alias("pred_label")))
    return (pred.join(labels, "vec_id")
            .select("vec_id", F.col("label").alias("true_label"),
                    "pred_label",
                    (F.col("label") == F.col("pred_label")).alias("correct"))
            .orderBy("vec_id"))


KNN_CLASSIFY_SQL = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings
),
s AS (
  SELECT x.vec_id AS src, y.vec_id AS dst, y.label AS nbr_label,
         CAST(floor(list_cosine_similarity(x.v, y.v) * 1000000) AS BIGINT)
           AS cos_x1e6
  FROM e x JOIN e y ON x.vec_id <> y.vec_id
),
r AS (
  SELECT *, row_number() OVER (
      PARTITION BY src ORDER BY cos_x1e6 DESC, dst) AS rk
  FROM s
),
votes AS (
  SELECT src, nbr_label, COUNT(*) AS cnt
  FROM r WHERE rk <= {_KNN_K} GROUP BY src, nbr_label
),
pred AS (
  SELECT src AS vec_id,
         {_KNC_ENC - 1} - MAX(cnt * {_KNC_ENC}
                              + ({_KNC_ENC - 1} - nbr_label)) % {_KNC_ENC}
           AS pred_label
  FROM votes GROUP BY src
)
SELECT p.vec_id, CAST(e.label AS BIGINT) AS true_label,
       CAST(p.pred_label AS BIGINT) AS pred_label,
       e.label = p.pred_label AS correct
FROM pred p JOIN e ON e.vec_id = p.vec_id
ORDER BY p.vec_id
"""


# ---------------------------------------------------------------------------
# SemDeDup: semantic dedup inside k-means clusters
# ---------------------------------------------------------------------------

_SD_THETA2 = 1_300_000_000_000  # L2^2 on the 1e-6 fixed-point grid


def semdedup(spark: SparkSession, sf_dir: str, k: int = _KM_K,
             iters: int = _KM_ITERS,
             theta2: int = _SD_THETA2) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): cluster the embedding table with
    k-means, then drop near-duplicate members WITHIN each cluster —
    the scale trick is that the cluster partition turns an O(n^2)
    all-pairs semantic-similarity dedup into k independent
    O((n/k)^2) blocks, and with k grown ~sqrt(n) the per-block work
    stays flat as the corpus grows.

    All arithmetic inherits kmeans_codebook's integer fixed point, so
    membership is BIT-DETERMINISTIC across engines: assignment is the
    same integer argmin the trainer uses, and the dedup rule is the
    deterministic pair form "drop v if some u < v in the same cluster
    has ||u - v||^2 <= theta2" (the paper keeps one arbitrary member
    per epsilon-group; min-vec_id is that choice made reproducible).

    Plan: broadcast k x dim codebook -> map-side argmin (NO exchange
    for assignment), ONE shuffle on cluster for the self-join, exact
    distance filter in the join stage, left-anti style flag join back.
    Returns (vec_id, cluster, kept) for every vector.
    """
    codebook = kmeans_codebook(spark, sf_dir, k, iters)
    cents = (codebook.groupBy("cluster")
             .agg(F.transform(
                 F.array_sort(F.collect_list(F.struct("pos", "val"))),
                 lambda st: st["val"]).alias("c")))
    vecs = _km_int_vecs(spark, sf_dir)
    assign = (vecs.crossJoin(F.broadcast(cents))
              .select("vec_id", "v", "cluster",
                      _km_dist(F.col("v"), F.col("c")).alias("d"))
              .groupBy("vec_id")
              .agg(F.min_by("cluster", F.col("d") * k + F.col("cluster"))
                   .alias("cluster"),
                   F.first("v").alias("v"))
              .localCheckpoint())
    # Within-cluster pair scan as ONE integer GEMM per cluster (the
    # paper's cluster-resident matrix step): the cluster-keyed self-join
    # materialized O((n/k)^2) pair rows, each paying two 64-element
    # array allocations for the zip_with/aggregate fold. Here each
    # cluster ships its member matrix once and numpy computes
    # ||u-v||^2 = |u|^2+|v|^2-2u.v in int64 — integer addition is
    # associative, so membership is bit-identical to the fold.
    import pandas as pd
    from typing import Iterator, List

    def gen(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            out: List[np.ndarray] = []
            for row in pdf.itertuples(index=False):
                ids = np.array([r["vec_id"] for r in row.rows],
                               dtype=np.int64)
                V = np.array([r["v"] for r in row.rows], dtype=np.int64)
                order = np.argsort(ids)
                ids, V = ids[order], V[order]
                G = V @ V.T
                sq = np.diag(G)
                d2 = sq[:, None] + sq[None, :] - 2 * G
                # drop j if some i < j (ids sorted asc) has d2 <= theta2
                close = np.tril(d2 <= theta2, k=-1)
                out.append(ids[close.any(axis=1)])
            data = (np.concatenate(out) if out
                    else np.array([], dtype=np.int64))
            yield pd.DataFrame({"vec_id": pd.Series(data, dtype="int64")})

    grouped = (assign.select("cluster",
                             F.struct("vec_id", "v").alias("row"))
               .groupBy("cluster").agg(F.collect_list("row").alias("rows")))
    dropped = grouped.mapInPandas(gen, "vec_id long")
    return (assign.join(dropped.withColumn("_drop", F.lit(1)),
                        "vec_id", "left")
            .select("vec_id", F.col("cluster").cast("bigint").alias("cluster"),
                    F.col("_drop").isNull().alias("kept"))
            .orderBy("vec_id"))


SEMDEDUP_SQL = f"""
WITH vecs AS (
  SELECT vec_id,
         [CAST(floor(CAST(x AS DOUBLE) * {_KM_SCALE}) AS BIGINT)
          for x in embedding] AS v
  FROM embeddings
),
c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT)
           AS cluster, v AS c
  FROM (SELECT vec_id, v FROM vecs ORDER BY vec_id LIMIT {_KM_K})
),
__ITERS__,
af AS (
  SELECT vec_id, arg_min(cluster, CAST(d AS BIGINT) * {_KM_K} + cluster)
           AS cluster
  FROM (
    SELECT v.vec_id, c.cluster,
           list_sum(list_transform(range(1, {_KM_DIM} + 1),
             i -> (v.v[i] - c.c[i]) * (v.v[i] - c.c[i]))) AS d
    FROM vecs v CROSS JOIN c{_KM_ITERS} c
  ) GROUP BY vec_id
),
dropped AS (
  SELECT DISTINCT b.vec_id
  FROM af a JOIN af b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  JOIN vecs va ON va.vec_id = a.vec_id
  JOIN vecs vb ON vb.vec_id = b.vec_id
  WHERE list_sum(list_transform(range(1, {_KM_DIM} + 1),
          i -> (va.v[i] - vb.v[i]) * (va.v[i] - vb.v[i])))
        <= {_SD_THETA2}
)
SELECT af.vec_id, CAST(af.cluster AS BIGINT) AS cluster,
       d.vec_id IS NULL AS kept
FROM af LEFT JOIN dropped d USING (vec_id)
ORDER BY af.vec_id
""".replace("__ITERS__", ",\n".join(_km_iter_sql(t, _KM_K)
                                    for t in range(1, _KM_ITERS + 1)))
