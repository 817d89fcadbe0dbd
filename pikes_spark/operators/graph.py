"""Iterative graph traversal over DataFrame edge lists.

The north-star design calls for "iterative DataFrame self-join with
checkpointed frontiers" (BASELINE.json); canonicalize.py uses that
pattern for connected components — this module exposes it as a
general operator: multi-source BFS hop distances over an edge table.

Scale design (100 TB / 10^12-edge graph):
- one shuffle join per hop (frontier ⋈ edges on src), frontier and
  visited set partitioned by node id;
- the visited set is maintained with a left-anti join, so each node
  enters the frontier exactly once (first arrival = minimal hop count
  — BFS invariant), keeping frontier size monotone in reachable-set
  growth, not path count;
- localCheckpoint() per hop truncates lineage, the known failure mode
  of iterative DataFrame jobs (same rationale as canonicalize.py);
- the only driver-side action per hop is an isEmpty() probe on the
  new frontier, bounded by max_hops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def bfs_hops(edges: DataFrame, seeds, max_hops: int = 6,
             src: str = "src", dst: str = "dst",
             undirected: bool = False) -> DataFrame:
    """Minimum hop count from any seed to every reachable node.

    edges: DataFrame with columns (src, dst). seeds: list of node ids
    or a single-column DataFrame. Returns (node, hops), hops = 0 for
    the seeds themselves, traversal capped at max_hops.
    """
    spark = edges.sparkSession
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if undirected:
        e = e.unionAll(e.select(F.col("dst").alias("src"),
                                F.col("src").alias("dst")))
    e = e.distinct()
    if isinstance(seeds, DataFrame):
        frontier = seeds.toDF("node").distinct()
    else:
        node_type = dict(e.dtypes)["src"]
        frontier = spark.createDataFrame(
            [(s,) for s in seeds], f"node {node_type}").distinct()
    frontier = frontier.withColumn("hops", F.lit(0))
    visited = frontier.localCheckpoint()
    frontier = visited
    for h in range(1, max_hops + 1):
        nxt = (frontier.join(e, frontier.node == e.src)
               .select(F.col("dst").alias("node"))
               .distinct()
               .join(visited, "node", "left_anti")
               .withColumn("hops", F.lit(h))
               .localCheckpoint())
        if nxt.isEmpty():
            break
        visited = visited.unionAll(nxt).localCheckpoint()
        frontier = nxt
    return visited


# ---------------------------------------------------------------------------
# Driver surface: deterministic graph derived from the orders table
# ---------------------------------------------------------------------------
# nodes = residues mod 997, edges custkey->orderkey residues: an
# arbitrary sparse digraph whose BFS the oracle recomputes with a
# recursive CTE (UNION recursion = per-iteration dedup, so the oracle
# is path-explosion-safe).

_MOD = 997
_SEED = 0
_MAX_HOPS = 4


def orders_graph(spark, sf_dir: str) -> DataFrame:
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (o.select((F.col("o_custkey") % _MOD).alias("src"),
                     (F.col("o_orderkey") % _MOD).alias("dst"))
            .distinct())


def bfs_reach(spark, sf_dir: str) -> DataFrame:
    """Driver query: hop distances from node 0 over the orders-derived
    digraph, ≤ 4 hops."""
    out = bfs_hops(orders_graph(spark, sf_dir), [_SEED], max_hops=_MAX_HOPS)
    return (out.select(F.col("node").cast("bigint").alias("node"),
                       F.col("hops").cast("bigint").alias("hops"))
            .orderBy("node"))


BFS_REACH_SQL = f"""
    WITH RECURSIVE edges AS (
      SELECT DISTINCT o_custkey % {_MOD} AS src, o_orderkey % {_MOD} AS dst
      FROM orders
    ),
    bfs (node, dist) AS (
      SELECT CAST({_SEED} AS BIGINT) AS node, 0 AS dist
      UNION
      SELECT e.dst, b.dist + 1
      FROM bfs b JOIN edges e ON e.src = b.node
      WHERE b.dist < {_MAX_HOPS}
    )
    SELECT node, CAST(MIN(dist) AS BIGINT) AS hops
    FROM bfs GROUP BY node ORDER BY node
"""

def pagerank_int(edges: DataFrame, iters: int = 10,
                 damping_num: int = 85, damping_den: int = 100,
                 scale: int = 10 ** 12,
                 src: str = "src", dst: str = "dst") -> DataFrame:
    """Fixed-point integer PageRank: every operation is integer (floor
    division for the per-edge share, 64-bit sums for the gather), so
    the result is BIT-DETERMINISTIC under any partitioning or
    execution order — float PageRank is not (addition order varies
    with the shuffle), which is why distributed PageRank results
    normally can't be value-checked. Mass bound: n_nodes * scale
    ~ 1e15 at 1e3 nodes, far under int64; at 1e9+ nodes lower
    `scale` accordingly. Dangling nodes leak mass (the standard
    simplified variant); damping is the rational damping_num/_den.

    One shuffle join + one groupBy per iteration, lineage cut by
    localCheckpoint — the same frontier discipline as bfs_hops."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (e.select(F.col("src").alias("node"))
             .unionAll(e.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint())
    deg = e.groupBy("src").agg(F.count("*").alias("out_deg"))
    ed = e.join(deg, "src").localCheckpoint()
    base = (scale * (damping_den - damping_num)) // damping_den
    ranks = nodes.withColumn("rank", F.lit(scale).cast("bigint"))
    for _ in range(iters):
        contribs = (ranks.join(ed, ranks.node == ed.src)
                    .select(F.col("dst").alias("node"),
                            F.expr("rank div out_deg").alias("c")))
        sums = contribs.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = (nodes.join(sums, "node", "left")
                 .select("node",
                         (F.lit(base) + F.expr(
                             f"({damping_num} * coalesce(s, 0L))"
                             f" div {damping_den}")).alias("rank"))
                 .localCheckpoint())
    return ranks


def pagerank_top20(spark, sf_dir: str) -> DataFrame:
    """Driver query: integer PageRank over the orders-derived digraph
    (same graph as bfs_reach), top 20 nodes. Value-checked against
    frozen expectations — possible only because the fixed-point
    arithmetic is partitioning-independent."""
    ranks = pagerank_int(orders_graph(spark, sf_dir), iters=10)
    return (ranks.select(F.col("node").cast("bigint").alias("node"), "rank")
            .orderBy(F.desc("rank"), F.asc("node"))
            .limit(20))


def triangle_counts(edges: DataFrame, src: str = "src",
                    dst: str = "dst") -> DataFrame:
    """Per-node triangle participation counts over the undirected
    simple graph induced by `edges` (self-loops dropped, directions
    and duplicates collapsed). Returns (node, triangles).

    Scale design: the classic degree-ordered orientation (Suri &
    Vassilvitskii, "Counting Triangles and the Curse of the Last
    Reducer", WWW'11) — orient every undirected edge from its
    lower-(degree, id) endpoint to its higher one, enumerate wedges
    only at each edge's SOURCE, then close them against the oriented
    edge set. A node's wedge count is then O(sum of per-orientation
    out-degrees squared) with out-degree bounded by O(sqrt(m)) for
    any graph, so no single high-degree hub explodes one reducer —
    the failure mode of naive wedge counting on power-law webgraphs.
    Three shuffles total (degree agg, wedge self-join, closing join),
    all on node/edge keys; no driver-side state.
    """
    e = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
         .filter(F.col("a") != F.col("b")))
    # materialize the deduped undirected edge set once: the degree agg
    # and both join sides re-ran the upstream scan + distinct otherwise
    und = (e.unionAll(e.select(F.col("b").alias("a"),
                               F.col("a").alias("b"))).distinct()
           .localCheckpoint())
    deg = und.groupBy("a").agg(F.count("*").alias("deg"))
    # orient low (deg, id) -> high (deg, id): keeps out-degree O(sqrt m)
    dd = (und.join(deg, "a")
          .join(deg.select(F.col("a").alias("b"),
                           F.col("deg").alias("deg_b")), "b")
          .select("a", "b", "deg", "deg_b"))
    # three consumers (wedge left/right sides + the closing probe) —
    # checkpoint the oriented edges so orientation runs once
    oriented = (dd.filter(
        (F.col("deg") < F.col("deg_b"))
        | ((F.col("deg") == F.col("deg_b")) & (F.col("a") < F.col("b"))))
        .select("a", "b")
        .localCheckpoint())
    # wedges at the source: a -> (b, c) with b < c (each unordered pair once)
    o2 = oriented.select(F.col("a").alias("a2"), F.col("b").alias("c"))
    wedges = (oriented.join(o2, oriented.a == o2.a2)
              .filter(F.col("b") < F.col("c"))
              .select("a", "b", "c"))
    # close the wedge: the (b, c) edge exists in EITHER orientation —
    # normalize the probe side to b < c once instead of probing twice
    probe = (oriented.select(F.least("a", "b").alias("b"),
                             F.greatest("a", "b").alias("c"))
             .distinct())
    tris = wedges.join(probe, ["b", "c"])
    members = (tris.select(F.col("a").alias("node"))
               .unionAll(tris.select(F.col("b").alias("node")))
               .unionAll(tris.select(F.col("c").alias("node"))))
    return members.groupBy("node").agg(F.count("*").alias("triangles"))


def triangles_top(spark, sf_dir: str) -> DataFrame:
    """Driver query: per-node triangle counts over the orders-derived
    digraph viewed as an undirected graph, top 50 nodes."""
    out = triangle_counts(orders_graph(spark, sf_dir))
    return (out.select(F.col("node").cast("bigint").alias("node"),
                       F.col("triangles").cast("bigint").alias("triangles"))
            .orderBy(F.desc("triangles"), F.asc("node"))
            .limit(50))


TRIANGLES_SQL = f"""
    WITH und AS (
      SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
      FROM (
        SELECT o_custkey % {_MOD} AS src, o_orderkey % {_MOD} AS dst
        FROM orders
      ) WHERE src <> dst
    ),
    tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM und e1
      JOIN und e2 ON e2.a = e1.b
      JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
    )
    SELECT CAST(node AS BIGINT) AS node,
           CAST(COUNT(*) AS BIGINT) AS triangles
    FROM (
      SELECT x AS node FROM tri
      UNION ALL SELECT y FROM tri
      UNION ALL SELECT z FROM tri
    )
    GROUP BY node
    ORDER BY triangles DESC, node ASC
    LIMIT 50
"""


def degree_profile(triples: DataFrame) -> DataFrame:
    """Per-predicate KG profile: triple count, distinct subject/object
    counts, and the max out-degree (triples per subject) and in-degree
    (triples per object) — the first query anyone runs against an
    unfamiliar triple table.

    Scale shape: two partial-aggregation passes keyed by (predicate,
    node) — map-side combine shrinks each to ~distinct-node rows
    before its exchange; no join between the passes until both are
    predicate-sized (tiny)."""
    base = triples.groupBy("predicate").agg(
        F.count("*").alias("n_triples"),
        F.countDistinct("subject").alias("n_subjects"),
        F.countDistinct("object").alias("n_objects"))
    out_deg = (triples.groupBy("predicate", "subject").count()
               .groupBy("predicate")
               .agg(F.max("count").alias("max_out_deg")))
    in_deg = (triples.groupBy("predicate", "object").count()
              .groupBy("predicate")
              .agg(F.max("count").alias("max_in_deg")))
    return (base.join(out_deg, "predicate").join(in_deg, "predicate")
            .orderBy("predicate"))


def degree_profile_rel(spark, sf_dir: str) -> DataFrame:
    from pikes_spark.operators.kgquery import rel_triples
    return degree_profile(rel_triples(spark, sf_dir).drop("object_is_literal"))


DEGREE_PROFILE_SQL_TEMPLATE = """
WITH triples AS ({rel_triples}),
base AS (
  SELECT predicate, count(*) AS n_triples,
         count(DISTINCT subject) AS n_subjects,
         count(DISTINCT object) AS n_objects
  FROM triples GROUP BY 1
),
od AS (
  SELECT predicate, MAX(c) AS max_out_deg FROM (
    SELECT predicate, subject, count(*) AS c FROM triples GROUP BY 1, 2)
  GROUP BY 1
),
idg AS (
  SELECT predicate, MAX(c) AS max_in_deg FROM (
    SELECT predicate, object, count(*) AS c FROM triples GROUP BY 1, 2)
  GROUP BY 1
)
SELECT base.*, od.max_out_deg, idg.max_in_deg
FROM base JOIN od USING (predicate) JOIN idg USING (predicate)
ORDER BY predicate
"""


def _degree_profile_sql() -> str:
    from pikes_spark.operators.kgquery import REL_TRIPLES_SQL
    return DEGREE_PROFILE_SQL_TEMPLATE.format(rel_triples=REL_TRIPLES_SQL)


# ---------------------------------------------------------------------------
# Common-neighbors link prediction
# ---------------------------------------------------------------------------

_CN_HUB_CAP = 40
_CN_MIN_COMMON = 7


def common_neighbors(edges: DataFrame, src: str = "src", dst: str = "dst",
                     hub_cap: int = _CN_HUB_CAP,
                     min_common: int = _CN_MIN_COMMON) -> DataFrame:
    """Link prediction over a bipartite graph: node pairs ranked by the
    number of shared neighbors (the classic common-neighbors score used
    to propose missing KG edges / sameAs candidates before an expensive
    verifier runs).

    Scale shape (the well-known inverted-index pair generation):
      - the self-join keyed on the shared neighbor emits ~d^2/2 pairs
        per neighbor, so HUBS dominate: a neighbor of degree d at a
        10^12-edge graph would explode the join. The hub cap prunes
        neighbors with degree > hub_cap BEFORE the self-join (standard
        practice — a neighbor shared by everyone carries no linking
        signal, exactly the anchor-text/stopword argument);
      - pruning is a broadcastable semi-join (degree table is
        distinct-neighbor-sized after a partial agg);
      - the pair count aggregation is map-side combinable.
    The cap is part of the operator's CONTRACT (documented, mirrored in
    the oracle), not a silent truncation."""
    # the distinct bipartite edge set feeds the degree pass and the
    # pruning join; checkpoint so the upstream join/scan runs once
    e = (edges.select(F.col(src).alias("c"), F.col(dst).alias("p"))
         .distinct().localCheckpoint())
    small = (e.groupBy("p").count()
             .filter(F.col("count") <= hub_cap).select("p"))
    # both self-join sides read the pruned set — checkpoint it too
    # (neighbor-capped, so it is never larger than the edge set)
    pruned = e.join(F.broadcast(small), "p").localCheckpoint()
    a = pruned.select(F.col("c").alias("ca"), "p")
    b = pruned.select(F.col("c").alias("cb"), "p")
    return (a.join(b, "p")
            .filter(F.col("ca") < F.col("cb"))
            .groupBy("ca", "cb").agg(F.count("*").alias("common"))
            .filter(F.col("common") >= min_common)
            .orderBy(F.desc("common"), "ca", "cb"))


def common_neighbors_rel(spark, sf_dir: str) -> DataFrame:
    """Driver query: customer pairs that bought >= min_common of the
    same parts (orders x lineitem bipartite graph)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    edges = (l.join(o, l.l_orderkey == o.o_orderkey)
             .select(F.col("o_custkey").alias("src"),
                     F.col("l_partkey").alias("dst")))
    out = common_neighbors(edges)
    return out.select(F.col("ca").cast("bigint").alias("ca"),
                      F.col("cb").cast("bigint").alias("cb"),
                      F.col("common").cast("bigint").alias("common"))


COMMON_NEIGHBORS_SQL = f"""
WITH cp AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
deg AS (SELECT p, COUNT(*) AS d FROM cp GROUP BY p),
pairs AS (
  SELECT a.c AS ca, b.c AS cb, COUNT(*) AS common
  FROM cp a JOIN cp b ON a.p = b.p AND a.c < b.c
  JOIN deg ON deg.p = a.p AND deg.d <= {_CN_HUB_CAP}
  GROUP BY a.c, b.c
)
SELECT CAST(ca AS BIGINT) AS ca, CAST(cb AS BIGINT) AS cb,
       CAST(common AS BIGINT) AS common
FROM pairs WHERE common >= {_CN_MIN_COMMON}
ORDER BY common DESC, ca, cb
"""


# ---------------------------------------------------------------------------
# negative sampling for KG-embedding training (TransE-style data prep)
# ---------------------------------------------------------------------------

_NEG_K = 4
_NEG_MULT = 2654435761   # Knuth multiplicative hash constant
_NEG_STEP = 40503


def negative_samples(spark, sf_dir: str, k: int = _NEG_K) -> DataFrame:
    """For every positive (customer)-[inNation]->(nation) edge, emit k
    deterministic corrupted tails that are NOT true edges — the
    negative half of a margin-loss KG-embedding training batch.

    Corruption is pure integer arithmetic ((head * Knuth + i * step)
    mod n_tails) so both engines generate the identical candidate
    stream with no RNG; false negatives (candidates that happen to be
    real edges) are removed by a LEFT ANTI join against the positive
    set — the semantics that matters at 10^9 edges, where "filter
    against the single known tail" is wrong for multi-valued
    relations.

    Scale shape: the candidate expansion is map-only (k rows per
    positive, 3 ints each); the anti-join shuffles on (head, tail) —
    uniform keys by construction of the hash; nothing is collected."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n_tails = spark.read.parquet(f"{sf_dir}/nation.parquet").count()
    pos = cust.select(F.col("c_custkey").alias("head"),
                      F.col("c_nationkey").alias("tail"))
    cand = pos.select(
        "head",
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("try_no"))
    cand = cand.withColumn(
        "neg_tail",
        (F.col("head") * _NEG_MULT + F.col("try_no") * _NEG_STEP)
        % n_tails)
    neg = cand.alias("c").join(
        pos.alias("p"),
        (F.col("c.head") == F.col("p.head"))
        & (F.col("c.neg_tail") == F.col("p.tail")), "left_anti")
    return (neg.select("c.head", "c.try_no", "c.neg_tail")
            .orderBy("head", "try_no"))


def negative_samples_sql(n_tails: int, k: int = _NEG_K) -> str:
    return f"""
WITH pos AS (
  SELECT c_custkey AS head, c_nationkey AS tail FROM customer
),
cand AS (
  SELECT head, t.try_no,
         (head * {_NEG_MULT} + t.try_no * {_NEG_STEP}) % {n_tails}
           AS neg_tail
  FROM pos, (SELECT unnest(range(0, {k})) AS try_no) t
)
SELECT c.head, c.try_no, c.neg_tail
FROM cand c
ANTI JOIN pos p ON c.head = p.head AND c.neg_tail = p.tail
ORDER BY c.head, c.try_no
"""


# ---------------------------------------------------------------------------
# k-core decomposition (coreness) via distributed h-index iteration
# ---------------------------------------------------------------------------

def coreness(edges: DataFrame, max_iter: int = 64) -> DataFrame:
    """Coreness (k-core number) of every node in the undirected graph,
    by the distributed h-index fixpoint (Montresor, De Pellegrini &
    Miorandi, "Distributed k-core decomposition", IEEE TPDS 2013; also
    the locality lemma in Lu et al. 2016): initialize every node's
    estimate to its degree, then repeatedly set

        est(v) <- min(est(v), H({est(u) : u in N(v)}))

    where H is the h-index of the neighbor-estimate multiset. The
    estimates are non-increasing and lower-bounded by the true
    coreness, so the iteration converges to it exactly; no tie-break
    or ordering enters the result — fully deterministic.

    Scale shape: per iteration ONE join (adjacency ⋈ estimates, both
    hash-partitioned on node id) and ONE groupBy(node) computing the
    h-index over the degree-bounded neighbor-estimate list
    (sort_array(collect_list); the hub-node alternative — counting
    |{u : est(u) >= h}| per candidate h without materializing the
    list — swaps memory for an extra aggregation and matters only
    past ~10^6-degree hubs). localCheckpoint per iteration truncates
    lineage; the per-iteration driver action is one COUNT of changed
    estimates (bounded by max_iter, typically << graph diameter —
    h-index propagation converges in O(core-hierarchy depth)).
    """
    und = (edges.select(F.least("src", "dst").alias("a"),
                        F.greatest("src", "dst").alias("b"))
           .filter(F.col("a") != F.col("b")).distinct())
    adj = (und.select(F.col("a").alias("node"), F.col("b").alias("nbr"))
           .unionAll(und.select(F.col("b").alias("node"),
                                F.col("a").alias("nbr")))
           .localCheckpoint())
    est = (adj.groupBy("node").agg(F.count("*").alias("est"))
           .localCheckpoint())
    # h-index of a desc-sorted list xs: max over 1-based positions i
    # of min(i, xs[i]) — computed as a fold carrying (pos, best).
    def _hindex(lst):
        zero = F.lit(0).cast("bigint")
        return F.aggregate(
            F.reverse(F.sort_array(lst)),
            F.struct(zero.alias("i"), zero.alias("h")),
            lambda acc, x: F.struct(
                (acc["i"] + 1).alias("i"),
                F.greatest(acc["h"], F.least(acc["i"] + 1, x)).alias("h")),
            lambda acc: acc["h"])
    nbr_est = est.select(F.col("node").alias("nbr"),
                         F.col("est").alias("nbr_est"))
    for _ in range(max_iter):
        upd = (adj.join(nbr_est, "nbr")
               .groupBy("node")
               .agg(_hindex(F.collect_list("nbr_est")).alias("h")))
        # carry the previous estimate through the checkpoint so the
        # convergence probe is a filter-count over the materialized
        # frame instead of a second join against the old frontier
        new_est = (est.join(upd, "node")
                   .select("node", F.col("est").alias("old"),
                           F.least("est", "h").alias("est"))
                   .localCheckpoint())
        changed = new_est.filter(F.col("est") != F.col("old")).count()
        est = new_est.select("node", "est")
        if changed == 0:
            break
        nbr_est = est.select(F.col("node").alias("nbr"),
                             F.col("est").alias("nbr_est"))
    return est.select("node", F.col("est").alias("coreness"))


def kcore_digest(spark, sf_dir: str) -> DataFrame:
    """Driver query: coreness histogram of the orders-derived graph —
    (coreness, n_nodes, node_sum). The iterative fixpoint is not
    SQL-expressible; the oracle is a frozen-VALUES digest backed by a
    differential pytest against an independent sequential peeling
    implementation (tests/test_session5_ops.py)."""
    c = coreness(orders_graph(spark, sf_dir))
    return (c.groupBy(F.col("coreness").cast("bigint").alias("coreness"))
            .agg(F.count("*").cast("bigint").alias("n_nodes"),
                 F.sum("node").cast("bigint").alias("node_sum"))
            .orderBy("coreness"))


# ---------------------------------------------------------------------------
# DeepWalk-style walk corpus (deterministic hash-random walks)
# ---------------------------------------------------------------------------

_WALK_LEN = 4             # steps per walk (walk has _WALK_LEN+1 nodes)
_WALK_MOD = 1_000_000_007
_WALK_K1 = 1_000_003      # mixes walk_id
_WALK_K2 = 40_503         # mixes step
_WALK_K3 = 2_654_435_761  # Knuth constant, mixes neighbor id


def walk_corpus(edges: DataFrame, walk_len: int = _WALK_LEN) -> DataFrame:
    """The DeepWalk / node2vec(p=q=1) data-prep stage: one walk per
    node over the undirected graph, emitted as (walk_id, step, node)
    rows — the 'sentence' corpus a skip-gram KG-embedding trainer
    consumes (Perozzi et al., KDD 2014).

    Randomness is replaced by a deterministic hash choice: at step s,
    walk w moves to  argmin_{nbr}  H(w, s, nbr)  over cur's neighbors,
    with H an integer polynomial hash and ties broken by neighbor id
    (the argmin key is H * 2^20 + nbr, exact while node ids < 2^20 —
    true for the driver graph's mod-997 ids; wider graphs should bump
    the shift). Both engines replay the identical walks, so the whole
    corpus is value-checkable — the property that makes distributed
    walk generation testable at all.

    Scale shape: walk_len iterations of (frontier ⋈ adjacency on the
    current node) + a map-side-combinable min_by per walk — the same
    checkpointed-frontier discipline as bfs_hops; frontier stays ONE
    row per walk at every step, so each iteration moves O(nodes)
    rows however big the neighbor fan-out (the min_by collapses it
    before the exchange)."""
    und = (edges.select(F.least("src", "dst").alias("a"),
                        F.greatest("src", "dst").alias("b"))
           .filter(F.col("a") != F.col("b")).distinct())
    adj = (und.select(F.col("a").alias("cur"), F.col("b").alias("nbr"))
           .unionAll(und.select(F.col("b").alias("cur"),
                                F.col("a").alias("nbr")))
           .localCheckpoint())
    frontier = (adj.select(F.col("cur").alias("walk_id")).distinct()
                .select("walk_id", F.col("walk_id").alias("node"),
                        F.lit(0).cast("bigint").alias("step")))
    out = frontier
    for s in range(1, walk_len + 1):
        h = (F.col("walk_id") * _WALK_K1 + F.lit(s) * _WALK_K2
             + F.col("nbr") * _WALK_K3) % _WALK_MOD
        nxt = (frontier.join(adj, frontier.node == adj.cur)
               .select("walk_id", "nbr", (h * 1048576 + F.col("nbr"))
                       .alias("hk"))
               .groupBy("walk_id")
               .agg(F.min_by("nbr", "hk").alias("node"))
               .withColumn("step", F.lit(s).cast("bigint"))
               .localCheckpoint())
        out = out.unionAll(nxt.select("walk_id", "node", "step"))
        frontier = nxt.select("walk_id", "node")
    return (out.select(F.col("walk_id").cast("bigint").alias("walk_id"),
                       F.col("step").cast("bigint").alias("step"),
                       F.col("node").cast("bigint").alias("node"))
            .orderBy("walk_id", "step"))


def walk_corpus_rel(spark, sf_dir: str) -> DataFrame:
    """Driver query: walk corpus over the orders-derived graph."""
    return walk_corpus(orders_graph(spark, sf_dir))


def _walk_sql_steps(walk_len: int = _WALK_LEN) -> str:
    steps = []
    prev = "s0"
    sel = ["SELECT walk_id, step, node FROM s0"]
    for s in range(1, walk_len + 1):
        cur = f"s{s}"
        steps.append(f"""{cur} AS (
  SELECT walk_id, CAST({s} AS BIGINT) AS step,
         arg_min(nbr,
           ((walk_id * {_WALK_K1} + {s} * {_WALK_K2}
             + nbr * {_WALK_K3}) % {_WALK_MOD}) * 1048576 + nbr)
           AS node
  FROM {prev} JOIN adj ON adj.cur = {prev}.node
  GROUP BY walk_id
)""")
        sel.append(f"SELECT walk_id, step, node FROM s{s}")
        prev = cur
    return ",\n".join(steps) + "\n" + "\nUNION ALL ".join(sel)


WALK_CORPUS_SQL = f"""
WITH und AS (
  SELECT DISTINCT LEAST(o_custkey % {_MOD}, o_orderkey % {_MOD}) AS a,
                  GREATEST(o_custkey % {_MOD}, o_orderkey % {_MOD}) AS b
  FROM orders
  WHERE o_custkey % {_MOD} <> o_orderkey % {_MOD}
),
adj AS (
  SELECT a AS cur, b AS nbr FROM und
  UNION ALL SELECT b, a FROM und
),
s0 AS (
  SELECT DISTINCT cur AS walk_id, CAST(0 AS BIGINT) AS step,
         cur AS node FROM adj
),
{_walk_sql_steps()}
ORDER BY walk_id, step
"""


# ---------------------------------------------------------------------------
# GNN message-passing primitive: neighbor feature aggregation
# ---------------------------------------------------------------------------

_GNN_VECS = 500   # embeddings table size; node features = vec[node % 500]


def neighbor_mean_features(spark, sf_dir: str) -> DataFrame:
    """One GraphSAGE-style message-passing round as pure DataFrame
    ops: every node's aggregated feature = the component-wise mean of
    its neighbors' embedding vectors (features looked up by
    node % 500 against the embeddings table; floats floored to
    integer millionths first so the mean — truncating div — is exact
    in both engines).

    Scale shape: ONE edges ⋈ features hash join (features partitioned
    by node id exactly like any GNN feature store), then ONE
    (node, pos)-keyed partial aggregation; the exchange carries
    (node, pos, int) rows — the standard scatter-gather layout every
    distributed GNN system (GraphSAGE samplers, PyG/DGL dist) reduces
    to. Returns a digest — per node: degree plus the sum and min/max
    of the 64 aggregated components — so the oracle stays
    row-bounded while pinning every component's value through the
    sum."""
    und = (orders_graph(spark, sf_dir)
           .select(F.least("src", "dst").alias("a"),
                   F.greatest("src", "dst").alias("b"))
           .filter(F.col("a") != F.col("b")).distinct())
    adj = (und.select(F.col("a").alias("node"), F.col("b").alias("nbr"))
           .unionAll(und.select(F.col("b").alias("node"),
                                F.col("a").alias("nbr"))))
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding",
                    lambda x: F.floor(x.cast("double") * 1_000_000)
                    .cast("bigint")).alias("v"))
    feats = adj.withColumn("fkey", F.col("nbr") % _GNN_VECS) \
        .join(emb, F.col("fkey") == emb.vec_id)
    comp = (feats.select("node", F.posexplode("v").alias("pos", "x"))
            .groupBy("node", "pos")
            .agg(F.sum("x").alias("s"), F.count("*").alias("c"))
            .select("node", "pos", F.expr("s div c").alias("m")))
    return (comp.groupBy("node")
            .agg(F.count("*").cast("bigint").alias("dim"),
                 F.sum("m").cast("bigint").alias("sum_m"),
                 F.min("m").cast("bigint").alias("min_m"),
                 F.max("m").cast("bigint").alias("max_m"))
            .orderBy("node"))


NEIGHBOR_MEAN_SQL = f"""
WITH und AS (
  SELECT DISTINCT LEAST(o_custkey % {_MOD}, o_orderkey % {_MOD}) AS a,
                  GREATEST(o_custkey % {_MOD}, o_orderkey % {_MOD}) AS b
  FROM orders
  WHERE o_custkey % {_MOD} <> o_orderkey % {_MOD}
),
adj AS (
  SELECT a AS node, b AS nbr FROM und
  UNION ALL SELECT b, a FROM und
),
emb AS (
  SELECT vec_id,
         [CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)
          for x in embedding] AS v
  FROM embeddings
),
comp AS (
  SELECT adj.node, p.pos,
         CAST(sum(emb.v[p.pos]) AS BIGINT) // count(*) AS m
  FROM adj JOIN emb ON adj.nbr % {_GNN_VECS} = emb.vec_id
  CROSS JOIN (SELECT unnest(range(1, 65)) AS pos) p
  GROUP BY adj.node, p.pos
)
SELECT node, CAST(count(*) AS BIGINT) AS dim,
       CAST(sum(m) AS BIGINT) AS sum_m,
       CAST(min(m) AS BIGINT) AS min_m,
       CAST(max(m) AS BIGINT) AS max_m
FROM comp GROUP BY node ORDER BY node
"""


# ---------------------------------------------------------------------------
# HITS hubs & authorities (integer fixed point)
# ---------------------------------------------------------------------------

_HITS_ITERS = 3
_HITS_SCALE = 1_000_000


def hits_int(edges: DataFrame, iters: int = _HITS_ITERS,
             src: str = "src", dst: str = "dst") -> DataFrame:
    """Kleinberg HITS with all-integer arithmetic: authority gather,
    max-normalize to `_HITS_SCALE` by floor division, hub gather,
    max-normalize — so scores are BIT-DETERMINISTIC under any
    partitioning (same rationale as pagerank_int: float HITS sums
    depend on shuffle order and can't be value-checked distributed).

    Per iteration: two shuffle joins + two groupBys (gather along in-
    edges then out-edges) and one scalar-max aggregate each, shipped
    back into the plan as a broadcast cross join (one row — never a
    single-partition window). Lineage cut by localCheckpoint.
    Returns (node, auth, hub) for every node."""
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
         .distinct().localCheckpoint())
    nodes = (e.select(F.col("src").alias("node"))
             .unionAll(e.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint())
    hubs = nodes.withColumn("hub", F.lit(_HITS_SCALE).cast("bigint"))
    auths = None
    for _ in range(iters):
        # authority = sum of hub scores over in-edges, then normalize
        a = (hubs.join(e, hubs.node == e.src)
             .groupBy(F.col("dst").alias("node"))
             .agg(F.sum("hub").alias("a_raw")))
        amax = a.agg(F.max("a_raw").alias("amax"))
        auths = (nodes.join(a, "node", "left")
                 .crossJoin(F.broadcast(amax))
                 .select("node", F.expr(
                     f"coalesce(a_raw, 0L) * {_HITS_SCALE} div amax")
                     .alias("auth"))
                 .localCheckpoint())
        # hub = sum of authority scores over out-edges, then normalize
        h = (auths.join(e, auths.node == e.dst)
             .groupBy(F.col("src").alias("node"))
             .agg(F.sum("auth").alias("h_raw")))
        hmax = h.agg(F.max("h_raw").alias("hmax"))
        hubs = (nodes.join(h, "node", "left")
                .crossJoin(F.broadcast(hmax))
                .select("node", F.expr(
                    f"coalesce(h_raw, 0L) * {_HITS_SCALE} div hmax")
                    .alias("hub"))
                .localCheckpoint())
    return nodes.join(auths, "node").join(hubs, "node")


def hits_top20(spark, sf_dir: str) -> DataFrame:
    """Driver query: HITS over the orders-derived digraph (same graph
    as bfs_reach/pagerank), top 20 authorities."""
    out = hits_int(orders_graph(spark, sf_dir))
    return (out.select(F.col("node").cast("bigint").alias("node"),
                       "auth", "hub")
            .orderBy(F.desc("auth"), F.asc("node"))
            .limit(20))


def hits_sql(iters: int = _HITS_ITERS) -> str:
    """DuckDB twin: the same integer iteration unrolled into CTEs
    (scalar max via subquery; floor division `//` truncates toward
    zero exactly like Spark's `div` — both operands nonnegative)."""
    s = _HITS_SCALE
    parts = [f"""
    edges AS (
      SELECT DISTINCT o_custkey % {_MOD} AS src, o_orderkey % {_MOD} AS dst
      FROM orders
    ),
    nodes AS (
      SELECT src AS node FROM edges UNION SELECT dst FROM edges
    ),
    h0 AS (SELECT node, CAST({s} AS BIGINT) AS hub FROM nodes)"""]
    prev_h = "h0"
    for t in range(1, iters + 1):
        parts.append(f"""
    a{t}_raw AS (
      SELECT e.dst AS node, SUM(h.hub) AS a_raw
      FROM {prev_h} h JOIN edges e ON e.src = h.node GROUP BY e.dst
    ),
    a{t} AS (
      SELECT n.node,
             COALESCE(a.a_raw, 0) * {s} // (SELECT MAX(a_raw) FROM a{t}_raw)
               AS auth
      FROM nodes n LEFT JOIN a{t}_raw a ON a.node = n.node
    ),
    h{t}_raw AS (
      SELECT e.src AS node, SUM(a.auth) AS h_raw
      FROM a{t} a JOIN edges e ON e.dst = a.node GROUP BY e.src
    ),
    h{t} AS (
      SELECT n.node,
             COALESCE(h.h_raw, 0) * {s} // (SELECT MAX(h_raw) FROM h{t}_raw)
               AS hub
      FROM nodes n LEFT JOIN h{t}_raw h ON h.node = n.node
    )""")
        prev_h = f"h{t}"
    return ("WITH " + ",".join(parts) + f"""
    SELECT CAST(n.node AS BIGINT) AS node,
           CAST(a.auth AS BIGINT) AS auth,
           CAST(h.hub AS BIGINT) AS hub
    FROM nodes n JOIN a{iters} a ON a.node = n.node
                 JOIN h{iters} h ON h.node = n.node
    ORDER BY a.auth DESC, n.node ASC LIMIT 20
    """)


# ---------------------------------------------------------------------------
# semi-supervised label propagation (deterministic argmax)
# ---------------------------------------------------------------------------

_LP_ITERS = 3
_LP_SEEDS = (0, 1, 2, 3, 4)
_LP_ENC = 1024  # > _MOD, so cnt*ENC + (ENC-1-label) orders (cnt asc, label desc)


def label_propagation(edges: DataFrame, seeds=_LP_SEEDS,
                      iters: int = _LP_ITERS) -> DataFrame:
    """Semi-supervised label propagation with a DETERMINISTIC update:
    each unlabeled node takes the (most frequent, then smallest)
    neighbor label; seed nodes are clamped. Float-free and order-free:
    the argmax is one integer MAX over the encoding
    cnt * ENC + (ENC - 1 - label), so the result is identical under
    any partitioning — the property that makes a distributed LPA
    value-checkable (same discipline as pagerank_int/hits_int).

    Per iteration: one shuffle join (labels ⋈ undirected edges) + one
    map-side-combinable (node,label) count + one per-node MAX partial
    aggregation — no windows. Lineage cut by localCheckpoint."""
    e = (edges.select("src", "dst")
         .unionAll(edges.select(F.col("dst").alias("src"),
                                F.col("src").alias("dst")))
         .distinct().localCheckpoint())
    spark = edges.sparkSession
    seed_df = spark.createDataFrame([(int(s), int(s)) for s in seeds],
                                    ["node", "label"]).localCheckpoint()
    labels = seed_df
    seed_list = ",".join(str(int(s)) for s in seeds)
    for _ in range(iters):
        msgs = (labels.join(e, labels.node == e.src)
                .select(F.col("dst").alias("node"), "label"))
        cnts = msgs.groupBy("node", "label").agg(F.count("*").alias("cnt"))
        enc = (cnts.groupBy("node")
               .agg(F.max(F.col("cnt") * _LP_ENC
                          + (_LP_ENC - 1 - F.col("label"))).alias("m"))
               .select("node",
                       (F.lit(_LP_ENC - 1) - F.col("m") % _LP_ENC)
                       .alias("label")))
        labels = (seed_df.unionAll(
            enc.filter(~F.expr(f"node in ({seed_list})")))
            .localCheckpoint())
    return labels


def label_prop_rel(spark, sf_dir: str) -> DataFrame:
    """Driver query: LPA communities over the orders-derived digraph
    (undirected view), all labeled nodes."""
    out = label_propagation(orders_graph(spark, sf_dir))
    return (out.select(F.col("node").cast("bigint").alias("node"),
                       F.col("label").cast("bigint").alias("label"))
            .orderBy("node"))


def label_prop_sql(seeds=_LP_SEEDS, iters: int = _LP_ITERS) -> str:
    """DuckDB twin: the same integer iteration unrolled (argmax via
    the identical cnt*ENC encoding — no arg_max/window semantics to
    match across engines)."""
    seed_rows = ", ".join(f"({int(s)}, {int(s)})" for s in seeds)
    seed_list = ",".join(str(int(s)) for s in seeds)
    parts = [f"""
    dedges AS (
      SELECT DISTINCT o_custkey % {_MOD} AS src, o_orderkey % {_MOD} AS dst
      FROM orders
    ),
    edges AS (
      SELECT src, dst FROM dedges UNION SELECT dst, src FROM dedges
    ),
    seeds (node, label) AS (VALUES {seed_rows}),
    l0 AS (SELECT node, label FROM seeds)"""]
    prev = "l0"
    for t in range(1, iters + 1):
        parts.append(f"""
    c{t} AS (
      SELECT e.dst AS node, l.label, COUNT(*) AS cnt
      FROM {prev} l JOIN edges e ON e.src = l.node
      GROUP BY e.dst, l.label
    ),
    l{t} AS (
      SELECT node, label FROM seeds
      UNION ALL
      SELECT node,
             {_LP_ENC - 1} - MAX(cnt * {_LP_ENC} + ({_LP_ENC - 1} - label))
               % {_LP_ENC} AS label
      FROM c{t} WHERE node NOT IN ({seed_list})
      GROUP BY node
    )""")
        prev = f"l{t}"
    return ("WITH " + ",".join(parts) + f"""
    SELECT CAST(node AS BIGINT) AS node, CAST(label AS BIGINT) AS label
    FROM {prev} ORDER BY node
    """)
