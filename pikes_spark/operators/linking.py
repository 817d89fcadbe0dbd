"""N11 entity linking: broadcast candidate-dictionary join + context
scoring + per-span argmax.

Reference behavior (AnnotationPipeline.java:197-206 collect spans,
:461-481 best-scoring candidate assigned to the entity whose span
matches exactly): candidates come from an external service; here they
come from a broadcast dictionary (surface -> candidate URIs with
priors), scored with a deterministic context-similarity term, and the
argmax per mention span is selected with a window — the exact plan
shape the north_rule prescribes:

    mentions (url, begin, end, surface)
      JOIN broadcast(candidates) ON surface          -- map-side, no shuffle
      -> score = prior * (1 + jaccard(doc context, candidate context))
      -> Window.partitionBy(url, begin, end).orderBy(desc(score)) rn=1

Scale notes: the candidate dictionary is the small side (<= a few GB
-> broadcast); mentions are the big side and never shuffle for the
join. The window shuffles by (url, begin, end) which is near-unique ->
no skew. At 10^12 documents the surface-form distribution is power-law
but that affects only the JOIN FANOUT, not a groupBy, so no salting is
needed here (canonicalization is where the salted groupBy lives).
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.resources import EL_CANDIDATES, LINKING_STOPWORDS


def candidates_df(spark: SparkSession) -> DataFrame:
    """The broadcast dictionary as a DataFrame (at deployment: read from
    a curated parquet; here: the deterministic fixture)."""
    rows = []
    for surface, cands in EL_CANDIDATES.items():
        for uri, prior in cands:
            # context tokens = URI localname words, the deterministic
            # stand-in for an entity-description embedding
            ctx = [w.lower() for w in
                   uri.rsplit("/", 1)[-1].replace("_", " ").replace(",", " ").split()]
            rows.append((surface, uri, float(prior), ctx))
    return spark.createDataFrame(rows, "surface string, uri string, prior double, ctx array<string>")


def entity_mentions(annotations: DataFrame) -> DataFrame:
    """Explode named-entity mentions to (url, begin, end, surface,
    doc_tokens). Pure Catalyst: explode + element_at, no UDF."""
    ents = (annotations
            .select("url", "tokens",
                    F.explode("entities").alias("ent"))
            .filter(F.col("ent.named"))
            .withColumn("tids", F.array_sort("ent.term_ids")))
    first_tok = F.element_at("tokens", F.element_at("tids", 1) + 1)
    last_tok = F.element_at("tokens", F.element_at("tids", -1) + 1)
    return (ents
            .withColumn("begin", first_tok["begin"])
            .withColumn("end", last_tok["begin"] + last_tok["len"])
            .withColumn("surface",
                        F.lower(F.concat_ws(" ", F.transform(
                            "tids", lambda i: F.element_at("tokens", i + 1)["form"]))))
            .withColumn("doc_tokens",
                        F.transform("tokens", lambda t: F.lower(t["form"])))
            .select("url", "begin", "end", "surface", "doc_tokens"))


def link_entities(annotations: DataFrame, candidates: DataFrame) -> DataFrame:
    """-> links(url, begin, end, uri, score): best candidate per span."""
    mentions = entity_mentions(annotations)
    stop = F.array(*[F.lit(s) for s in sorted(LINKING_STOPWORDS)])
    mentions = mentions.filter(~F.array_contains(stop, F.col("surface")))
    joined = mentions.join(F.broadcast(candidates), "surface", "inner")
    # context similarity: |candidate ctx ∩ doc tokens| / |ctx|
    overlap = F.size(F.array_intersect("ctx", "doc_tokens")) / F.size("ctx")
    scored = joined.withColumn("score", F.col("prior") * (1.0 + overlap))
    w = Window.partitionBy("url", "begin", "end").orderBy(
        F.desc("score"), F.asc("uri"))
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("url", "begin", "end", "uri", "score"))
