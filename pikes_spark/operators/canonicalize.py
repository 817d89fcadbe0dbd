"""J4 cross-document canonicalization: sameAs smushing as distributed
connected components (replaces rdfpro's in-memory smush,
RDFGenerator.java:1859-1964 / SURVEY.md D12).

Edges between instance IRIs come from three sources:
  1. within-document owl:sameAs triples (coref D6, copular D3);
  2. entities linked to the same DBpedia URI (via the URI node);
  3. named entities sharing a normalized surface form (via a
     ``surface:`` hub node) — the power-law key ("united states" on
     millions of pages). Because nodes connect to a HUB rather than
     pairwise, the natural O(n^2) pair explosion becomes O(n) edges —
     this is the salting: the groupBy on surface form is replaced by a
     map-side edge emission, and the CC iteration handles hubs.

Connected components: alternating large-star/small-star
(Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14) — O(log n) rounds, skew-tolerant, expressed as DataFrame
self-joins with localCheckpoint per frontier to cut lineage.

The component representative (min IRI, with DBpedia URIs ordered
first so they win as canonical — the reference prefers DBpedia
canonical IRIs in smushing) rewrites triple subjects/objects; final
dropDuplicates on (s,p,o,graph) dedupes merged statements.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

OWL_SAMEAS = "http://www.w3.org/2002/07/owl#sameAs"
FOAF_NAME = "http://xmlns.com/foaf/0.1/name"

# canonical-preference prefix: DBpedia URIs sort before doc-minted IRIs
# ("\x01" < "h"), doc IRIs before entity:/surface: locals.


def _rank_key(col):
    return F.when(col.startswith("http://dbpedia.org/"), F.concat(F.lit("0"), col)) \
            .when(col.startswith("http://"), F.concat(F.lit("1"), col)) \
            .otherwise(F.concat(F.lit("2"), col))


def build_sameas_edges(triples: DataFrame) -> DataFrame:
    """-> edges(src, dst) between IRIs that must merge."""
    sameas = (triples.filter(F.col("predicate") == OWL_SAMEAS)
              .select(F.col("subject").alias("src"), F.col("object").alias("dst")))
    # entities sharing a foaf:name -> connect via surface hub (skew-safe)
    names = (triples.filter(F.col("predicate") == FOAF_NAME)
             .select(F.col("subject").alias("src"),
                     F.concat(F.lit("surface:"),
                              F.regexp_replace(F.lower("object"), r"[^a-z0-9]+", "_"))
                     .alias("dst")))
    return sameas.unionByName(names)


def connected_components(edges: DataFrame, max_iter: int = 50,
                         local_threshold: int = 2_000_000) -> DataFrame:
    """-> (node, component) via alternating large-star/small-star.

    Works directly on string node ids (min() = lexicographic; the
    ranked key makes DBpedia URIs canonical). Deterministic, converges
    in O(log n) rounds; each round localCheckpoints to truncate lineage.

    Adaptive strategy (AQE-style runtime choice): when the deduped edge
    set is below ``local_threshold`` rows, union-find on the driver is
    orders of magnitude cheaper than 2 log(n) shuffle rounds — the same
    result, picked at runtime from the observed edge count. The
    distributed star path is what runs at corpus scale (and is what the
    stress tests exercise with local_threshold=0).
    """
    # size probe is a counted AGGREGATE (one cheap job that moves a single
    # long to the driver), not a limit-collect of edge rows — IRI strings
    # are only pulled to the driver once the count proves the edge set is
    # small enough for the union-find fast path. The threshold matters:
    # below it, CC is one collect + one createDataFrame; above it, the
    # star iterations run a dozen small latency-bound shuffle jobs whose
    # cost is CONSTANT in core count (they only pay off when the edge set
    # is actually big) — measured as the dominant non-scaling term when
    # the threshold was set too low.
    if local_threshold > 0:
        n_edges = edges.select("src", "dst").count()
        if n_edges <= local_threshold:
            return _local_union_find_rows(edges.sparkSession,
                                          edges.select("src", "dst").collect())
    # normalize to ranked ids once; strip rank at the end
    e = (edges
         .select(_rank_key(F.col("src")).alias("u"), _rank_key(F.col("dst")).alias("v"))
         .filter(F.col("u") != F.col("v"))
         .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
         .distinct())

    def checksum(df: DataFrame) -> int:
        row = df.agg(F.count("*").alias("n"),
                     F.expr("bit_xor(xxhash64(u, v))").alias("h")).collect()[0]
        return (row["n"], row["h"])

    prev = None
    for _ in range(max_iter):
        # large-star: for each node, connect strictly-larger neighbors to
        # the min of (neighborhood ∪ self)
        nbrs = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = (nbrs.groupBy("u").agg(F.min("v").alias("mv"))
                .select("u", F.least("u", "mv").alias("m")))
        large = (nbrs.join(mins, "u")
                 .filter(F.col("v") > F.col("u"))
                 .select(F.col("v").alias("u"), F.col("m").alias("v"))
                 .filter(F.col("u") != F.col("v"))
                 .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
                 .distinct())
        # small-star: connect smaller-or-equal neighbors (and self) to min
        nbrs2 = large.unionByName(
            large.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins2 = (nbrs2.groupBy("u").agg(F.min("v").alias("mv"))
                 .select("u", F.least("u", "mv").alias("m")))
        small = (nbrs2.filter(F.col("v") <= F.col("u"))
                 .join(mins2, "u")
                 .select(F.col("v").alias("u"), F.col("m").alias("v"))
                 .unionByName(mins2.select(F.col("u"), F.col("m").alias("v")))
                 .filter(F.col("u") != F.col("v"))
                 .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
                 .distinct())
        e = small.localCheckpoint()  # truncate lineage per frontier
        cs = checksum(e)
        if prev is not None and cs == prev:
            break
        prev = cs

    comp = (e.select(F.col("u").alias("node"), F.col("v").alias("component"))
            .groupBy("node").agg(F.min("component").alias("component")))
    # strip the rank prefix
    strip = lambda c: F.substring(c, 2, 1_000_000)
    return comp.select(strip(F.col("node")).alias("node"),
                       strip(F.col("component")).alias("component"))


def _local_union_find(edges: DataFrame) -> DataFrame:
    """Driver-side union-find with the same ranked canonical preference."""
    return _local_union_find_rows(edges.sparkSession,
                                  edges.select("src", "dst").collect())


def _local_union_find_rows(spark, rows) -> DataFrame:

    def rank(x: str) -> str:
        if x.startswith("http://dbpedia.org/"):
            return "0" + x
        if x.startswith("http://"):
            return "1" + x
        return "2" + x

    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra == rb:
            return
        # smaller ranked key becomes the root (canonical)
        if rank(ra) <= rank(rb):
            parent[rb] = ra
        else:
            parent[ra] = rb

    for r in rows:
        union(r["src"], r["dst"])
    nodes = set(parent) | {r["src"] for r in rows} | {r["dst"] for r in rows}
    out = [(n, c) for n, c in ((n, find(n)) for n in nodes) if n != c]
    if not out:
        return spark.createDataFrame([], "node string, component string")
    return spark.createDataFrame(out, "node string, component string")


def dissolve_composites(triples: DataFrame) -> DataFrame:
    """D12 ks:include dissolution (RDFGenerator.java:1859-1964): minted
    coordination composites dissolve — every statement in which the
    composite takes part is propagated to each ks:include member, and
    the composite's own rows disappear. The include map is tiny
    (one row per coordinated coref member) -> broadcast joins."""
    ks_include = "http://dkm.fbk.eu/ontologies/knowledgestore#include"
    inc = (triples.filter(F.col("predicate") == ks_include)
           .select(F.col("subject").alias("_comp"),
                   F.col("object").alias("_member")).distinct())
    # No emptiness probe: when there are no ks:include rows the joins
    # below are no-ops (empty broadcast map, coalesce keeps originals),
    # so paying a blocking driver job just to skip them costs more
    # than it saves — it was a fixed-latency job on the short-run
    # critical path.
    # ONE scan: broadcast the composite->members map grouped as arrays,
    # left-join each side, explode members (or the original value) —
    # no anti-join/union passes, no shuffle, and no early dedupe (the
    # caller's final dropDuplicates covers merged statements; a second
    # full-table shuffle here was a measured chunk of the non-scaling
    # J4 wall)
    smap = inc.groupBy("_comp").agg(F.collect_list("_member").alias("_ms"))
    s_side = F.broadcast(smap.withColumnRenamed("_comp", "subject"))
    o_side = F.broadcast(smap.withColumnRenamed("_comp", "object")
                         .withColumnRenamed("_ms", "_mo"))
    return (triples.filter(F.col("predicate") != ks_include)
            .join(s_side, "subject", "left")
            .withColumn("_hit", F.col("_ms").isNotNull())
            .withColumn("subject",
                        F.explode(F.coalesce("_ms", F.array("subject"))))
            .drop("_ms")
            .join(o_side, "object", "left")
            .withColumn("_hit", F.col("_hit") | F.col("_mo").isNotNull())
            .withColumn("object",
                        F.explode(F.coalesce("_mo", F.array("object"))))
            .drop("_mo")
            # drop only self-loops CREATED by dissolution (a composite
            # whose subject and object explode to the same member);
            # pre-existing subject==object rows pass through untouched
            .filter(~F.col("_hit") | (F.col("subject") != F.col("object")))
            .drop("_hit"))


def canonicalize_triples(triples: DataFrame, max_iter: int = 50,
                         dissolve_includes: bool = True) -> DataFrame:
    """Rewrite subjects/objects to canonical representatives and dedupe.

    The canonical map is small relative to the triple table (only
    merged instances appear) -> broadcast join both rewrites."""
    if dissolve_includes:
        triples = dissolve_composites(triples)
    # materialize the edge set once: the size probe AND the collect (or
    # the star iterations) each re-ran the dissolve joins + explodes
    # over the full triple table otherwise — one full pass saved per
    # run. The edge set is sameAs/name-sized, far below the table.
    edges = build_sameas_edges(triples).localCheckpoint()
    # size probe (counted aggregate, one cheap job): small edge sets
    # take the driver union-find fast path — and then the canonical
    # map is KNOWN small (driver-built from those same edges), so the
    # byte-stats job below is skipped entirely. Fixed per-job latency
    # is the dominant non-scaling term of J4 on short runs.
    n_edges = edges.count()
    driver_path = n_edges <= 2_000_000
    if driver_path:
        comp = _local_union_find_rows(triples.sparkSession,
                                      edges.select("src", "dst").collect())
    else:
        comp = connected_components(edges, max_iter=max_iter,
                                    local_threshold=0)
    # drop synthetic surface hubs from the mapping domain
    comp = comp.filter(~F.col("node").startswith("surface:"))
    comp = comp.withColumn(
        "component",
        F.when(F.col("component").startswith("surface:"), F.col("node"))
        .otherwise(F.col("component")))

    # The canonical map is tiny relative to the triple table (merged
    # instances only). Statistics on it are unknown to Catalyst (it comes
    # out of the iterative CC), so AQE sometimes plans a sort-merge join
    # that sorts the FULL triple table twice — measured 10x slower.
    # Decide explicitly from the observed BYTE size (row counts lie for
    # IRI strings: 20M rows of 100-byte IRIs is ~2 GB and would OOM real
    # executors as a broadcast): broadcast under 64 MB of string payload,
    # shuffle join above it (the 10^12-document path).
    mapping = comp
    if driver_path:
        mapping = F.broadcast(mapping)
    else:
        stats = comp.agg(
            F.coalesce(F.sum(F.length("node") + F.length("component")),
                       F.lit(0)).alias("bytes")).collect()[0]
        if stats["bytes"] <= 64 * 1024 * 1024:
            mapping = F.broadcast(mapping)
    rewritten = (triples
                 .join(mapping.withColumnRenamed("node", "subject")
                       .withColumnRenamed("component", "_cs"), "subject", "left")
                 .join(mapping.withColumnRenamed("node", "object")
                       .withColumnRenamed("component", "_co"), "object", "left")
                 # a row that was ALREADY a self-loop stays one (its
                 # subject and object rewrite identically), so keep it;
                 # drop only self-loops CREATED by the rewrite — two
                 # DISTINCT coreferent nodes collapsing to one URI.
                 # Same spirit as dissolve_composites' _hit guard.
                 .withColumn("_was_loop",
                             F.col("subject") == F.col("object"))
                 .withColumn("subject", F.coalesce("_cs", "subject"))
                 .withColumn("object", F.coalesce("_co", "object"))
                 .drop("_cs", "_co")
                 .filter(F.col("_was_loop")
                         | (F.col("subject") != F.col("object")))
                 .drop("_was_loop"))
    return rewritten.dropDuplicates(["subject", "predicate", "object", "graph", "url"])
