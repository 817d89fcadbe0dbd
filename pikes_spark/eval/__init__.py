"""Gold-graph evaluation harness.

Re-implements the reference's eval pipeline
(pikes-rdf/src/test/java/eu/fbk/dkm/pikes/eval/{Converter,Aligner,
Evaluation}.java) in Python so the Spark pipeline's output can be
scored — per component (instances, edges, roles, types, linking,
sameAs) — against:

  1. the shipped gold graphs  src/site/resources/eval-pm/gold/gold.{1..8}.ttl
  2. the shipped PIKES output src/site/resources/eval-pm/pikes/pikes.{1..8}.ttl
     (converted and used AS the reference standard for the
     "P/R vs reference semantics" north-rule number)

The harness is calibrated by re-scoring the pikes graphs against gold
and comparing to the published table (src/site/markdown/eval-pm.md,
"Latest results": Instances 147/13/6, Triples 335/136/261, ...).
"""
