"""RDFS forward-chaining entailment (materialization) over the triple view.

The reference pipeline post-processes its emitted RDF with the rdfpro
tool chain (SURVEY.md §2.4 D11-D13 — smushing, TBox-aware processors,
compaction); rdfpro's rule engine materializes the RDFS closure of a
graph against its schema (rdfpro-rules `RuleEngine`, ruleset `rdfs`).
This module re-expresses that materialization Spark-first:

* the SCHEMA (subClassOf / subPropertyOf / domain / range) is tiny —
  dozens of rows — so its transitive closures are computed driver-side
  in plain Python (exactly what rdfpro does: the TBox is closed once,
  then streamed against the ABox) and shipped as **broadcast** join
  tables;
* the DATA passes are three broadcast hash joins (rdfs7 property
  propagation, rdfs2 domain typing, rdfs3 range typing) plus one more
  broadcast join for rdfs9 subclass typing — all map-side; the only
  exchange in the whole plan is the final `dropDuplicates` on the
  derived-triple key, which carries just the entailed rows;
* no anti-join against the input is needed: every derived predicate
  (rdf:type, ex:locatedIn, ex:relatedTo and the closed schema
  predicates) is disjoint from the data predicates by construction,
  and schema-vs-schema duplicates are subtracted driver-side.

At 10^12 triples the plan is: one scan of the fact table, four
broadcast joins (schema KBs in size), one distinct-shaped exchange
over the entailed rows — the standard scale shape for RDFS
materialization (cf. WebPIE / Urbani et al., "OWL reasoning with
MapReduce").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .kgquery import rel_triples, REL_TRIPLES_SQL

_EX = "http://example.org/"
_RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
_RDFS = "http://www.w3.org/2000/01/rdf-schema#"
_SUBCLASS = _RDFS + "subClassOf"
_SUBPROP = _RDFS + "subPropertyOf"

# The TBox for the relational triple view (kgquery.REL_TRIPLES_SQL):
# cust -inNation-> nat -inRegion-> reg with literal names/segments.
SUBCLASS_OF = [
    (_EX + "Customer", _EX + "Agent"),
    (_EX + "Agent", _EX + "Resource"),
    (_EX + "Nation", _EX + "Place"),
    (_EX + "Region", _EX + "Place"),
    (_EX + "Place", _EX + "Resource"),
]
SUBPROP_OF = [
    (_EX + "inNation", _EX + "locatedIn"),
    (_EX + "inRegion", _EX + "locatedIn"),
    (_EX + "locatedIn", _EX + "relatedTo"),
]
DOMAIN = [
    (_EX + "inNation", _EX + "Customer"),
    (_EX + "inRegion", _EX + "Nation"),
    (_EX + "segment", _EX + "Customer"),
]
RANGE = [
    (_EX + "inNation", _EX + "Nation"),
    (_EX + "inRegion", _EX + "Region"),
]


def _transitive_closure(pairs):
    """Strict transitive closure of a (child, parent) relation —
    driver-side; the schema is dozens of rows (the rdfpro split:
    close the TBox once, stream the ABox)."""
    reach = set(pairs)
    changed = True
    while changed:
        changed = False
        for (a, b) in list(reach):
            for (c, d) in list(reach):
                if b == c and (a, d) not in reach and a != d:
                    reach.add((a, d))
                    changed = True
    return sorted(reach)


def rdfs_entail(triples: DataFrame) -> DataFrame:
    """All RDFS-entailed triples NOT present in the input (data or
    schema): rdfs5/rdfs11 schema closures, rdfs7 subproperty
    propagation, rdfs2/rdfs3 domain/range typing, rdfs9 subclass
    typing.  Returns (subject, predicate, object) strings."""
    spark = triples.sparkSession
    sc_closed = _transitive_closure(SUBCLASS_OF)
    sp_closed = _transitive_closure(SUBPROP_OF)

    sp_df = F.broadcast(spark.createDataFrame(sp_closed, ["p", "super_p"]))
    dom_df = F.broadcast(spark.createDataFrame(DOMAIN, ["p", "dom_class"]))
    rng_df = F.broadcast(spark.createDataFrame(RANGE, ["p", "rng_class"]))
    sc_df = F.broadcast(spark.createDataFrame(sc_closed, ["cls", "super_cls"]))

    # three rule branches (rdfs7, rdfs2, rdfs3) each scan the ABox;
    # materialize the 4-column projection once instead of re-running
    # the upstream relational derivation per branch
    data = triples.select("subject", "predicate", "object",
                          "object_is_literal").localCheckpoint()

    # rdfs7: (s p o) + (p sp* q) => (s q o)
    prop = (data.join(sp_df, data.predicate == sp_df.p)
            .select("subject", F.col("super_p").alias("predicate"), "object"))

    # rdfs2 / rdfs3: domain and range typing
    typed_dom = (data.join(dom_df, data.predicate == dom_df.p)
                 .select("subject", F.lit(_RDF_TYPE).alias("predicate"),
                         F.col("dom_class").alias("object")))
    typed_rng = (data.filter(~F.col("object_is_literal"))
                 .join(rng_df, data.predicate == rng_df.p)
                 .select(F.col("object").alias("subject"),
                         F.lit(_RDF_TYPE).alias("predicate"),
                         F.col("rng_class").alias("object")))
    types0 = typed_dom.unionAll(typed_rng)

    # rdfs9: (x type C) + (C sc* D) => (x type D)
    super_types = (types0.join(sc_df, types0.object == sc_df.cls)
                   .select("subject", "predicate",
                           F.col("super_cls").alias("object")))

    # schema-closure triples beyond the asserted schema (rdfs5/rdfs11)
    schema_new = ([(a, _SUBCLASS, b) for (a, b) in sc_closed
                   if (a, b) not in set(SUBCLASS_OF)] +
                  [(a, _SUBPROP, b) for (a, b) in sp_closed
                   if (a, b) not in set(SUBPROP_OF)])
    schema_df = spark.createDataFrame(
        schema_new, ["subject", "predicate", "object"])

    out = (prop.unionAll(types0).unionAll(super_types).unionAll(schema_df)
           .dropDuplicates(["subject", "predicate", "object"]))
    return out.orderBy("subject", "predicate", "object")


def rdfs_entail_rel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rdfs_entail(rel_triples(spark, sf_dir))


def _values(pairs, cols):
    rows = ", ".join("('%s', '%s')" % p for p in pairs)
    return "(VALUES %s) AS t(%s, %s)" % (rows, cols[0], cols[1])


def rdfs_entail_sql() -> str:
    """DuckDB twin: recursive CTEs close the schema, joins mirror the
    rdfs2/3/7/9 rules, EXCEPT removes the asserted schema rows."""
    return f"""
    WITH triples AS ({REL_TRIPLES_SQL}),
    sc_base AS (SELECT * FROM {_values(SUBCLASS_OF, ('cls', 'super_cls'))}),
    sp_base AS (SELECT * FROM {_values(SUBPROP_OF, ('p', 'super_p'))}),
    dom AS (SELECT * FROM {_values(DOMAIN, ('p', 'dom_class'))}),
    rng AS (SELECT * FROM {_values(RANGE, ('p', 'rng_class'))}),
    sc AS (
      WITH RECURSIVE r (cls, super_cls) AS (
        SELECT cls, super_cls FROM sc_base
        UNION
        SELECT r.cls, b.super_cls FROM r JOIN sc_base b ON b.cls = r.super_cls
        WHERE r.cls <> b.super_cls
      ) SELECT * FROM r
    ),
    sp AS (
      WITH RECURSIVE r (p, super_p) AS (
        SELECT p, super_p FROM sp_base
        UNION
        SELECT r.p, b.super_p FROM r JOIN sp_base b ON b.p = r.super_p
        WHERE r.p <> b.super_p
      ) SELECT * FROM r
    ),
    prop AS (
      SELECT t.subject, sp.super_p AS predicate, t.object
      FROM triples t JOIN sp ON sp.p = t.predicate
    ),
    types0 AS (
      SELECT t.subject, '{_RDF_TYPE}' AS predicate, d.dom_class AS object
      FROM triples t JOIN dom d ON d.p = t.predicate
      UNION ALL
      SELECT t.object, '{_RDF_TYPE}', r.rng_class
      FROM triples t JOIN rng r ON r.p = t.predicate
      WHERE NOT t.object_is_literal
    ),
    super_types AS (
      SELECT ty.subject, ty.predicate, sc.super_cls AS object
      FROM types0 ty JOIN sc ON sc.cls = ty.object
    ),
    schema_closed AS (
      SELECT cls AS subject, '{_SUBCLASS}' AS predicate, super_cls AS object
      FROM sc
      EXCEPT SELECT cls, '{_SUBCLASS}', super_cls FROM sc_base
      UNION ALL
      (SELECT p, '{_SUBPROP}', super_p FROM sp
       EXCEPT SELECT p, '{_SUBPROP}', super_p FROM sp_base)
    )
    SELECT DISTINCT subject, predicate, object FROM (
      SELECT * FROM prop
      UNION ALL SELECT * FROM types0
      UNION ALL SELECT * FROM super_types
      UNION ALL SELECT * FROM schema_closed
    )
    ORDER BY subject, predicate, object
    """


# ---------------------------------------------------------------------------
# OWL-lite entailment: owl:TransitiveProperty + owl:inverseOf
# ---------------------------------------------------------------------------

_PART_OF = _EX + "partOf"
_HAS_PART = _EX + "hasPart"


def owl_entail(triples: DataFrame, max_iter: int = 8) -> DataFrame:
    """The two OWL-lite rules rdfpro's ruleset adds over RDFS that are
    DATA-scale (not schema-scale) computations:

    * owl:TransitiveProperty on ex:partOf — the closure runs over the
      fact table itself via the checkpointed-frontier iteration
      (kgquery._closure_edges, the same machinery as SPARQL `p+`),
      one shuffle join + one left-anti dedup per depth level;
    * owl:inverseOf(ex:partOf, ex:hasPart) — a projection flip over
      the CLOSED relation, no extra exchange.

    Returns entailed triples only: closure edges not asserted, plus
    every ex:hasPart inverse (none are asserted)."""
    from .kgquery import _closure_edges

    part = (triples.filter(F.col("predicate") == _PART_OF)
            .select(F.col("subject").alias("src"),
                    F.col("object").alias("dst")))
    closed = _closure_edges(part, max_iter=max_iter)  # subject, object
    derived = (closed
               .join(part.withColumnRenamed("src", "subject")
                     .withColumnRenamed("dst", "object"),
                     ["subject", "object"], "left_anti")
               .select("subject", F.lit(_PART_OF).alias("predicate"),
                       "object"))
    inverse = closed.select(F.col("object").alias("subject"),
                            F.lit(_HAS_PART).alias("predicate"),
                            F.col("subject").alias("object"))
    return (derived.unionAll(inverse)
            .orderBy("subject", "predicate", "object"))


def owl_entail_rel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return owl_entail(rel_triples(spark, sf_dir))


def owl_entail_sql() -> str:
    return f"""
    WITH triples AS ({REL_TRIPLES_SQL}),
    part AS (
      SELECT subject AS src, object AS dst FROM triples
      WHERE predicate = '{_PART_OF}'
    ),
    closed AS (
      WITH RECURSIVE r (src, dst) AS (
        SELECT src, dst FROM part
        UNION
        SELECT r.src, p.dst FROM r JOIN part p ON p.src = r.dst
      ) SELECT * FROM r
    ),
    derived AS (
      SELECT src AS subject, '{_PART_OF}' AS predicate, dst AS object
      FROM closed
      EXCEPT
      SELECT src, '{_PART_OF}', dst FROM part
    )
    SELECT subject, predicate, object FROM derived
    UNION ALL
    SELECT dst AS subject, '{_HAS_PART}' AS predicate, src AS object
    FROM closed
    ORDER BY subject, predicate, object
    """
