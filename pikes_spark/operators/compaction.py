"""D13 normalization "compaction" (util/ProcessorASNorm.java:36-397):
recompute each fact-graph IRI as a hash of the graph's statement set,
so graphs carrying identical statement sets collapse to one named
graph, and merge their ks:expressedBy mention links.

Spark-native shape: one groupBy(graph) building a sorted statement-set
fingerprint (xxhash64 of the sorted (s,p,o) hashes — order-insensitive
via sum of per-statement hashes, collision-safe enough at 64 bits for
dedup bucketing, exact set equality enforced by including count), then
a re-mint join. All JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def compact_fact_graphs(triples: DataFrame) -> DataFrame:
    """Rewrite ``graph`` to ``fact:c<sethash>`` computed from the graph's
    statement set; statements in the default graph ('') are untouched."""
    facts = triples.filter(F.col("graph") != "")
    rest = triples.filter(F.col("graph") == "")

    sig = (facts
           .groupBy("graph")
           .agg(F.count("*").alias("_n"),
                F.expr("bit_xor(xxhash64(subject, predicate, object))").alias("_x"),
                F.sum(F.expr("xxhash64(object, predicate, subject) % 1000000007"))
                .alias("_s"))
           .withColumn("_new_graph",
                       F.concat(F.lit("fact:c"),
                                F.conv(F.abs(F.xxhash64("_n", "_x", "_s"))
                                       .cast("string"), 10, 16)))
           .select("graph", "_new_graph"))

    out = (facts.join(sig, "graph")
           .withColumn("graph", F.col("_new_graph"))
           .drop("_new_graph")
           .dropDuplicates(["url", "subject", "predicate", "object", "graph"]))
    # Rewrite old graph IRIs inside default-graph metadata statements too
    # (ks:expressedBy mention links have the fact IRI as SUBJECT; the
    # reference rewrites ids in all metadata statements,
    # ProcessorASNorm.java:155-162), then merge now-duplicate links.
    submap = (sig.withColumnRenamed("graph", "subject")
              .withColumnRenamed("_new_graph", "_ns"))
    objmap = (sig.withColumnRenamed("graph", "object")
              .withColumnRenamed("_new_graph", "_no"))
    rest = (rest.join(submap, "subject", "left")
            .withColumn("subject", F.coalesce("_ns", "subject")).drop("_ns")
            .join(objmap, "object", "left")
            .withColumn("object", F.coalesce("_no", "object")).drop("_no")
            .dropDuplicates(["url", "subject", "predicate", "object", "graph"]))
    return out.unionByName(rest)
