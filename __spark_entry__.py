"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -- flagship: full pages->triples KG pipeline at sf0.001.
queries()      -- one entry per implemented operator (SURVEY.md §2 +
                  training-data ops); each takes (spark, sf_dir).
oracle_sql()   -- DuckDB-equivalent SQL for every SQL-expressible query
                  (tables region nation customer supplier part orders
                  lineitem events documents embeddings are views).
                  Non-SQL-expressible ops (the NLP/KG rule stages) get
                  rows-only checks.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from pikes_spark.sources.pages import pages_from_documents, PAGES_ORACLE_CTE
from pikes_spark.operators.annotate import (
    annotate_pages, distill_annotations, extract_pages_text, pages_to_triples)
from pikes_spark.operators import (
    textstats, dedup, similarity, events, kgquery, graph, skew, weburl, cdc,
    sketches, weblinks, bpe, layout, rdfs)
from pikes_spark.operators import sentiment as _sentiment
from pikes_spark.operators.linking import candidates_df, link_entities
from pikes_spark.operators.canonicalize import canonicalize_triples


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: pages -> annotate -> link -> distill -> canonicalize."""
    sf_dir = "/root/testdata/sf0.001"
    pages = pages_from_documents(spark, sf_dir)
    ann = annotate_pages(pages).localCheckpoint()
    links = link_entities(ann, candidates_df(spark))
    triples = distill_annotations(ann, links).localCheckpoint()
    return canonicalize_triples(triples, max_iter=6)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _q_pages(spark, sf_dir):
    return (pages_from_documents(spark, sf_dir)
            .select("url",
                    F.date_format("warc_ts", "yyyy-MM-dd HH:mm:ss").alias("warc_ts_s"),
                    F.length("html").alias("n_html_bytes"),
                    "lang")
            .orderBy("url"))


def _q_warc_read(spark, sf_dir):
    from pikes_spark.sources.warc import warc_read_pages
    return warc_read_pages(spark, sf_dir).orderBy("url")


def _q_extract(spark, sf_dir):
    """N1: byte-identical text extraction from html (the input_hint
    per-row invariant, checked VALUE-wise against the documents text)."""
    pages = pages_from_documents(spark, sf_dir).drop("text")
    return (extract_pages_text(pages)
            .select("url", F.col("extracted_text").alias("text"))
            .orderBy("url"))


def _gold_ann(spark):
    from pikes_spark.sources.gold import gold_pages_df
    return annotate_pages(gold_pages_df(spark))


def _gid(col):
    return F.regexp_extract(col, r"gold/(g\d+)$", 1)


def _q_gold_timexes(spark, sf_dir):
    """N6/D1 golden fixture: TIMEX spans + TimeML values on the gold
    corpus, value-checked against frozen expectations."""
    ann = _gold_ann(spark)
    return (ann.select(_gid(F.col("url")).alias("gold_id"),
                       F.explode("timexes").alias("t"))
            .select("gold_id", F.col("t.type").alias("timex_type"),
                    F.col("t.value").alias("timeml_value"))
            .orderBy("gold_id", "timeml_value"))


def _q_gold_entities(spark, sf_dir):
    """N5 golden fixture: named-entity spans + types on the gold corpus."""
    ann = _gold_ann(spark)
    ents = (ann.select(_gid(F.col("url")).alias("gold_id"), "tokens",
                       F.explode("entities").alias("e"))
            .filter(F.col("e.named")))
    surface = F.concat_ws(" ", F.transform(
        F.array_sort("e.term_ids"),
        lambda i: F.element_at("tokens", i + 1)["form"]))
    return (ents.select("gold_id", F.col("e.type").alias("entity_type"),
                        surface.alias("surface"))
            .orderBy("gold_id", "surface"))


def _q_gold_links(spark, sf_dir):
    """N11 golden fixture: winning DBpedia link per mention span."""
    ann = _gold_ann(spark)
    links = link_entities(ann, candidates_df(spark))
    return (links.select(_gid(F.col("url")).alias("gold_id"),
                         F.col("uri").alias("dbpedia_uri"))
            .orderBy("gold_id", "dbpedia_uri"))


def _q_naf_export(spark, sf_dir):
    """S2's NAF-XML debug dump on the gold corpus: per-page layer
    counts + byte length + xxhash64 of the serialized document
    (operators/annotate.annotations_to_naf), value-checked against
    frozen expectations (EXPECTED_NAF_STATS — serializer determinism
    means any layer OR layout drift flips the checksum). Structural
    well-formedness and offset fidelity are pytest-differential
    (tests/test_naf_export.py)."""
    from pikes_spark.operators.annotate import annotations_to_naf
    # two consumers (naf serialization + layer counts) branch from the
    # same annotations; checkpoint so the NLP stage runs once
    ann = _gold_ann(spark).localCheckpoint()
    naf = annotations_to_naf(ann)
    counts = ann.select(
        "url", F.size("tokens").alias("n_wf"),
        F.size("predicates").alias("n_preds"))
    return (naf.join(counts, "url")
            .select(_gid(F.col("url")).alias("gold_id"),
                    F.col("n_wf").cast("int").alias("n_wf"),
                    F.col("n_preds").cast("int").alias("n_preds"),
                    F.length("naf").cast("bigint").alias("naf_len"),
                    F.xxhash64("naf").alias("checksum"))
            .orderBy("gold_id"))


def _gold_triples(spark):
    """Gold-corpus triples via the full annotate -> link -> distill path."""
    ann = _gold_ann(spark).localCheckpoint()
    links = link_entities(ann, candidates_df(spark))
    return distill_annotations(ann, links)


def _q_gold_opinions(spark, sf_dir):
    """F19/D8 golden fixture: the opinion layer distilled with
    emit_opinions=True (OFF in the default pipeline, like the
    reference without pikes-raid) — per-page opinion triples shaped to
    local names, value-checked against frozen expectations
    (EXPECTED_OPINIONS). Rules + lexicon: functions/opinions.py."""
    ann = _gold_ann(spark)
    t = distill_annotations(ann, None, emit_opinions=True)
    frag = F.element_at(F.split(F.col("subject"), "#"), -1)
    prop = F.element_at(F.split(F.col("predicate"), "[#/]"), -1)
    obj = F.when(F.col("object_is_literal"), F.col("object")) \
        .otherwise(F.element_at(F.split(F.col("object"), "[#/]"), -1))
    return (t.filter(F.col("component") == "opinion")
            .select(_gid(F.col("url")).alias("gold_id"),
                    frag.alias("opinion"), prop.alias("prop"),
                    obj.alias("obj"))
            .orderBy("gold_id", "opinion", "prop", "obj"))


def _q_gold_triples(spark, sf_dir):
    """D* distillation VALUE check: per-(page, component) triple count +
    order-insensitive xxhash64 checksum, compared against the frozen
    fixture (sources/gold_expected_triples.py) — any change to the rule
    engine's OUTPUT flips a checksum (VERDICT round-1 item #2)."""
    t = _gold_triples(spark)
    return (t.select(_gid(F.col("url")).alias("gold_id"), "component",
                     F.xxhash64("subject", "predicate", "object", "graph")
                     .alias("h"))
            .groupBy("gold_id", "component")
            .agg(F.count("*").alias("n"),
                 F.expr("bit_xor(h)").alias("checksum"))
            .orderBy("gold_id", "component"))


def _q_gold_canonicalize(spark, sf_dir):
    """J4 canonicalization VALUE check on the gold corpus (cross-page
    entity merges included): per-component counts vs frozen fixture."""
    t = _gold_triples(spark).localCheckpoint()
    out = canonicalize_triples(t, max_iter=8)
    return (out.groupBy("component")
            .agg(F.count("*").alias("n"),
                 F.countDistinct("subject").alias("n_subjects"))
            .orderBy("component"))


def _q_gold_compaction(spark, sf_dir):
    """D13 compaction VALUE check on the gold corpus."""
    from pikes_spark.operators.compaction import compact_fact_graphs
    out = compact_fact_graphs(_gold_triples(spark))
    return (out.groupBy("component")
            .agg(F.count("*").alias("n"),
                 F.countDistinct("graph").alias("n_graphs"))
            .orderBy("component"))


def _q_annotations(spark, sf_dir):
    """N2/N3/N5/N7/N8 rule-NLP front-end: per-url layer counts."""
    ann = annotate_pages(pages_from_documents(spark, sf_dir))
    return (ann.select(
        "url",
        F.size("sentences").alias("n_sentences"),
        F.size("tokens").alias("n_tokens"),
        F.size("deps").alias("n_deps"),
        F.size("entities").alias("n_entities"),
        F.size("timexes").alias("n_timexes"),
        F.size("predicates").alias("n_predicates"),
        F.size("corefs").alias("n_corefs"))
        .orderBy("url"))


def _q_annotations_stats(spark, sf_dir):
    """Value-checked digest twin of kg_annotations (the one raw dump
    without one, VERDICT r3 item 6): corpus-wide layer totals plus an
    order-insensitive xxhash64 checksum over the per-url count rows —
    any drift in any NLP layer on any document flips the checksum."""
    ann = _q_annotations(spark, sf_dir)
    h = F.xxhash64("url", "n_sentences", "n_tokens", "n_deps",
                   "n_entities", "n_timexes", "n_predicates", "n_corefs")
    return (ann.withColumn("h", h)
            .agg(F.count("*").alias("n_urls"),
                 F.sum("n_sentences").alias("sum_sentences"),
                 F.sum("n_tokens").alias("sum_tokens"),
                 F.sum("n_deps").alias("sum_deps"),
                 F.sum("n_entities").alias("sum_entities"),
                 F.sum("n_timexes").alias("sum_timexes"),
                 F.sum("n_predicates").alias("sum_predicates"),
                 F.sum("n_corefs").alias("sum_corefs"),
                 F.expr("bit_xor(h)").alias("checksum")))


def _q_linking(spark, sf_dir):
    """N11 broadcast-dictionary entity linking + window argmax."""
    ann = annotate_pages(pages_from_documents(spark, sf_dir))
    links = link_entities(ann, candidates_df(spark))
    return (links.select("url", "begin", "end", "uri",
                         F.floor(F.col("score") * 1000).cast("bigint").alias("score_x1000"))
            .orderBy("url", "begin"))


def _q_linking_stats(spark, sf_dir):
    """Value-checked digest twin of kg_linking: corpus-wide link count
    + per-(uri) histogram checksum (order-insensitive)."""
    links = _q_linking(spark, sf_dir)
    h = F.xxhash64("url", "begin", "end", "uri", "score_x1000")
    return (links.withColumn("h", h)
            .agg(F.count("*").alias("n_links"),
                 F.countDistinct("uri").alias("n_uris"),
                 F.countDistinct("url").alias("n_urls"),
                 F.expr("bit_xor(h)").alias("checksum")))


def _q_triples(spark, sf_dir):
    """F*/D* distillation: mention-level triples (pre-canonicalization)."""
    return (pages_to_triples(pages_from_documents(spark, sf_dir))
            .select("url", "subject", "predicate", "object", "graph", "component")
            .orderBy("url", "subject", "predicate", "object", "graph"))


def _q_triples_by_component(spark, sf_dir):
    return (pages_to_triples(pages_from_documents(spark, sf_dir))
            .groupBy("component").agg(F.count("*").alias("n"))
            .orderBy("component"))


def _q_canonical(spark, sf_dir):
    """J4 canonicalization: connected-components-merged triples."""
    pages = pages_from_documents(spark, sf_dir)
    ann = annotate_pages(pages).localCheckpoint()  # reused by link + distill
    links = link_entities(ann, candidates_df(spark))
    # canonicalize scans the triple set several times -> materialize once
    triples = distill_annotations(ann, links).localCheckpoint()
    out = canonicalize_triples(triples, max_iter=8)
    return (out.groupBy("component").agg(
        F.count("*").alias("n"),
        F.countDistinct("subject").alias("n_subjects"))
        .orderBy("component"))


def _q_sim_ivf(spark, sf_dir):
    return similarity.ivf_topk(spark, sf_dir, query_vec_id=0, k=10)


def _q_simhash_stats(spark, sf_dir):
    """Value-checkable digest of the simhash pair set: per Hamming
    distance, pair count + an order-insensitive pair checksum (the raw
    40k-pair listing stays available as dedup_simhash)."""
    pairs = dedup.simhash_pairs(spark, sf_dir)
    mix = (F.col("a") * F.lit(1_000_003) + F.col("b")) % F.lit(2147483647)
    return (pairs.groupBy("hamming")
            .agg(F.count("*").alias("n_pairs"),
                 F.sum(mix).alias("pair_checksum"))
            .orderBy("hamming"))


def _q_compaction(spark, sf_dir):
    """D13 fact-graph compaction: identical statement-sets merge."""
    from pikes_spark.operators.compaction import compact_fact_graphs
    t = pages_to_triples(pages_from_documents(spark, sf_dir))
    out = compact_fact_graphs(t)
    return (out.groupBy("component")
            .agg(F.count("*").alias("n"),
                 F.countDistinct("graph").alias("n_graphs"))
            .orderBy("component"))


GOLD_SPARQL_AGG = """
PREFIX gaf: <http://groundedannotationframework.org/gaf#>
PREFIX ks: <http://dkm.fbk.eu/ontologies/knowledgestore#>
SELECT ?page (COUNT(DISTINCT ?ent) AS ?n_entities) WHERE {
  ?ent gaf:denotedBy ?m .
  ?m ks:mentionOf ?page .
}
GROUP BY ?page
ORDER BY ?page
"""


def _q_sparql_gold_agg(spark, sf_dir):
    """SPARQL aggregate over the engine's own gold KG: denoted-entity
    count per page through the mention layer (2-hop join + GROUP BY),
    value-checked against frozen expectations."""
    return kgquery.sparql_query(_gold_triples(spark), GOLD_SPARQL_AGG)


GOLD_SPARQL = """
PREFIX sem: <http://semanticweb.cs.vu.nl/2009/11/sem/>
PREFIX nwr: <http://www.newsreader-project.eu/ontologies/>
PREFIX foaf: <http://xmlns.com/foaf/0.1/>
SELECT DISTINCT ?event ?actor ?name WHERE {
  ?event sem:hasActor ?actor .
  ?event rdf:type sem:Event .
  ?actor rdf:type nwr:PERSON .
  ?actor foaf:name ?name .
}
ORDER BY ?event ?actor ?name
"""


def _q_sparql_rel(spark, sf_dir):
    """SPARQL BGP compiler over a relational triple view — semantic
    oracle: DuckDB runs the same BGP as explicit SQL joins
    (kgquery.SPARQL_REL_SQL), two independent formulations."""
    return kgquery.sparql_query(kgquery.rel_triples(spark, sf_dir),
                                kgquery.REL_BGP)


def _q_sparql_optional(spark, sf_dir):
    """SPARQL OPTIONAL (left-join) semantics — semantic DuckDB oracle
    with an explicit LEFT JOIN formulation."""
    return kgquery.sparql_query(kgquery.rel_triples(spark, sf_dir),
                                kgquery.REL_BGP_OPTIONAL)


def _q_sparql_agg(spark, sf_dir):
    """SPARQL GROUP BY + COUNT/COUNT DISTINCT — semantic DuckDB oracle."""
    return kgquery.sparql_query(kgquery.rel_triples(spark, sf_dir),
                                kgquery.REL_BGP_AGG)


def _q_sparql_bind(spark, sf_dir):
    """SPARQL BIND chains + expression FILTER (||, builtins,
    arithmetic) + HAVING + OFFSET — semantic DuckDB oracle."""
    return kgquery.sparql_query(kgquery.rel_triples(spark, sf_dir),
                                kgquery.REL_BGP_BIND)


def _q_sparql_exists_concat(spark, sf_dir):
    """Positive FILTER EXISTS (left-semi join) + GROUP_CONCAT/SAMPLE
    aggregates — semantic DuckDB oracle with string_agg."""
    return kgquery.sparql_query(kgquery.rel_triples(spark, sf_dir),
                                kgquery.REL_BGP_EXISTS_CONCAT)


def _q_sparql_subquery(spark, sf_dir):
    """Nested { SELECT ... } subquery joined into the outer solution —
    semantic DuckDB oracle (aggregate subquery + join)."""
    return kgquery.sparql_query(kgquery.rel_triples(spark, sf_dir),
                                kgquery.REL_BGP_SUBQUERY)


def _q_sparql_union(spark, sf_dir):
    """SPARQL UNION — branch-aligned unionAll; semantic DuckDB oracle."""
    return kgquery.sparql_query(kgquery.rel_triples(spark, sf_dir),
                                kgquery.REL_BGP_UNION)


def _q_sparql_values(spark, sf_dir):
    """SPARQL VALUES inline bindings — broadcast literal table join."""
    return kgquery.sparql_query(kgquery.rel_triples(spark, sf_dir),
                                kgquery.REL_BGP_VALUES)


def _q_sparql_path(spark, sf_dir):
    """SPARQL property path + (transitive closure via checkpointed
    frontier iteration) — recursive-CTE DuckDB oracle."""
    return kgquery.sparql_query(kgquery.rel_triples(spark, sf_dir),
                                kgquery.REL_BGP_PATH)


def _q_sparql_path_seq(spark, sf_dir):
    """SPARQL sequence path p1/p2 (expands through a fresh internal
    variable into an equi-join chain) — semantic DuckDB oracle."""
    return kgquery.sparql_query(kgquery.rel_triples(spark, sf_dir),
                                kgquery.REL_BGP_PATH_SEQ)


def _q_sparql_path_ops(spark, sf_dir):
    """SPARQL inverse + alternation path ^(p1|p2) — column swap over an
    IN-list predicate scan; semantic DuckDB oracle."""
    return kgquery.sparql_query(kgquery.rel_triples(spark, sf_dir),
                                kgquery.REL_BGP_PATH_OPS)


def _q_sparql_path_star(spark, sf_dir):
    """SPARQL zero-or-more path p* (closure + zero-length identity) —
    recursive-CTE DuckDB oracle with an explicit identity branch."""
    return kgquery.sparql_query(kgquery.rel_triples(spark, sf_dir),
                                kgquery.REL_BGP_PATH_STAR)


def _q_sparql_construct(spark, sf_dir):
    """SPARQL CONSTRUCT (KG-to-KG template instantiation) — semantic
    DuckDB oracle building the same derived graph with SQL."""
    out = kgquery.sparql_construct(kgquery.rel_triples(spark, sf_dir),
                                   kgquery.REL_CONSTRUCT)
    return out.orderBy("subject", "predicate", "object")


def _q_sparql_describe(spark, sf_dir):
    """SPARQL DESCRIBE (symmetric concise description of the matched
    resources) — semantic DuckDB oracle building the same sub-graph
    with explicit membership joins."""
    out = kgquery.sparql_describe(kgquery.rel_triples(spark, sf_dir),
                                  kgquery.REL_DESCRIBE)
    return out.orderBy("subject", "predicate", "object",
                       "object_is_literal")


def _q_sparql_minus(spark, sf_dir):
    """SPARQL MINUS / FILTER NOT EXISTS — left-anti join; semantic
    DuckDB oracle via NOT EXISTS."""
    return kgquery.sparql_query(kgquery.rel_triples(spark, sf_dir),
                                kgquery.REL_BGP_MINUS)


def _q_sparql_gold(spark, sf_dir):
    """SPARQL BGP over the engine's own gold KG: events with PERSON
    actors and their foaf:names — a 4-pattern join through the triple
    table, value-checked against frozen expectations."""
    return kgquery.sparql_query(_gold_triples(spark), GOLD_SPARQL)


def _q_media(spark, sf_dir):
    from pikes_spark.operators.multimodal import synthetic_media, extract_features
    feats = extract_features(synthetic_media(spark, 64))
    return (feats.select("media_id", "kind", "n_bytes", "sha256", "frames")
            .orderBy("media_id"))


def multimodal_phash(spark, sf_dir):
    from pikes_spark.operators.multimodal import phash_pairs
    return phash_pairs(spark, sf_dir)


def multimodal_audio_fp(spark, sf_dir):
    from pikes_spark.operators.multimodal import audio_fp_pairs
    return audio_fp_pairs(spark, sf_dir)


# relational layer (SURVEY.md §2.6: scan/filter/agg/join/window on the
# TPC-H-ish tables) — exact SQL oracles
def _q_sessionize_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drive the applyInPandasWithState sessionizer through a real
    Structured Streaming run (availableNow), then a second run whose
    far-future sentinel advances the watermark and fires the
    event-time timeouts closing the remaining sessions — yielding the
    COMPLETE session set, value-comparable to SESSIONIZE_SQL."""
    import datetime
    import tempfile

    from pikes_spark.streaming.stateful import streaming_sessionize

    tmp = tempfile.mkdtemp(prefix="pikes_stateful_q_")
    landing, out, ckpt = f"{tmp}/landing", f"{tmp}/out", f"{tmp}/ckpt"
    schema = "event_id bigint, ts timestamp, user_id bigint, value double"
    (spark.read.parquet(f"{sf_dir}/events.parquet")
     .select("event_id", "ts", "user_id", "value").write.parquet(landing))

    def run_once() -> None:
        stream = spark.readStream.schema(schema).parquet(landing)
        q = (streaming_sessionize(stream).writeStream
             .format("parquet").outputMode("append")
             .option("path", out).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(600)

    run_once()
    spark.createDataFrame([(2 ** 40, datetime.datetime(2100, 1, 1), -1, 0.0)],
                          schema).write.mode("append").parquet(landing)
    run_once()
    return (spark.read.parquet(out)
            .filter(F.col("user_id") >= 0)
            .select("user_id", F.col("sess_no").cast("bigint").alias("sess_no"),
                    "n_events", "sum_value_fl", "sess_start")
            .orderBy("user_id", "sess_no"))


def _q_stream_dedup(spark, sf_dir):
    """Streaming exact dedup through TWO availableNow runs: epoch 1
    lands the corpus, epoch 2 lands duplicate copies (same text,
    shifted doc_id) — the committed unique-set must contain exactly
    the original representatives, value-checked against the batch
    dedup semantics in SQL."""
    import tempfile

    from pikes_spark.streaming.stream_dedup import stream_dedup_exact
    from pikes_spark.sources.tables import SnapshotTable

    tmp = tempfile.mkdtemp(prefix="pikes_sdedup_q_")
    landing, out, ckpt = f"{tmp}/landing", f"{tmp}/out", f"{tmp}/ckpt"
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text", "lang"))
    docs.write.parquet(landing)
    stream_dedup_exact(spark, landing, out, ckpt).awaitTermination(600)
    (docs.filter(F.col("doc_id") % 7 == 0)
     .withColumn("doc_id", F.col("doc_id") + 10_000_000)
     .write.mode("append").parquet(landing))
    stream_dedup_exact(spark, landing, out, ckpt).awaitTermination(600)
    uniq = SnapshotTable(f"{out}/unique_docs", name="unique_docs").read(spark)
    return uniq.select("doc_id").orderBy("doc_id")


def _q_stream_view_click(spark, sf_dir):
    """Stream-stream watermarked INNER join (ad-attribution shape)
    driven through a real availableNow Structured Streaming run;
    value-checked against the batch join SQL. INNER join emits
    matches as found, so one pass is complete (watermark expiry only
    GCs state)."""
    import tempfile

    from pikes_spark.streaming.stream_join import run_view_click_join

    tmp = tempfile.mkdtemp(prefix="pikes_sjoin_q_")
    landing, out, ckpt = f"{tmp}/landing", f"{tmp}/out", f"{tmp}/ckpt"
    run_view_click_join(spark, sf_dir, landing, out, ckpt)
    return (spark.read.parquet(out)
            .select("user_id", "view_id", "click_id", "gap_us")
            .orderBy("user_id", "view_id", "click_id"))


# exact integer revenue: cents(price) x (1e6 - ppm(discount)) — both
# factors round near-integers (2-decimal prices, 6-decimal discounts),
# so the product and its sum are exact int64 in both engines
def _rev_micro_cents():
    ep_c = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    disc_ppm = F.round(F.col("l_discount") * 1_000_000).cast("bigint")
    return ep_c * (F.lit(1_000_000) - disc_ppm)


def _q_rel_q5(spark, sf_dir):
    """TPC-H Q5 shape (local-supplier volume): the 6-way join with the
    customer-and-supplier-same-nation constraint — the classic join-
    order / broadcast-strategy stress query. nation and region are
    broadcast (dimension-sized at any SF); customer/orders/lineitem/
    supplier hash-join on their keys with AQE free to reorder."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    su = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    r = spark.read.parquet(f"{sf_dir}/region.parquet")
    o = o.filter((F.col("o_orderdate") >= "1996-01-01")
                 & (F.col("o_orderdate") < "1997-01-01"))
    j = (li.join(o, li.l_orderkey == o.o_orderkey)
         .join(c, o.o_custkey == c.c_custkey)
         .join(su, li.l_suppkey == su.s_suppkey)
         .filter(F.col("c_nationkey") == F.col("s_nationkey"))
         .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
         .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
         .filter(F.col("r_name") == "ASIA"))
    return (j.groupBy("n_name")
            .agg(F.sum(_rev_micro_cents()).cast("bigint")
                 .alias("revenue_mc"))
            .orderBy(F.desc("revenue_mc"), F.asc("n_name")))


def _q_rel_q14(spark, sf_dir):
    """TPC-H Q14 shape (promo revenue share) per month of 1996: join
    lineitem to part (partkey hash join), conditional aggregation,
    integer ppm ratio."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    j = (li.filter((F.col("l_shipdate") >= "1996-01-01")
                   & (F.col("l_shipdate") < "1997-01-01"))
         .join(p, li.l_partkey == p.p_partkey))
    rev = _rev_micro_cents()
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
    return (j.groupBy(F.date_format("l_shipdate", "yyyy-MM")
                      .alias("month"))
            .agg(F.sum(promo).cast("bigint").alias("promo_mc"),
                 F.sum(rev).cast("bigint").alias("total_mc"))
            .select("month", "promo_mc", "total_mc",
                    # ratio on the cent scale: promo_mc*1e6 would
                    # overflow int64 on monthly sums
                    F.expr("((promo_mc div 1000000) * 1000000) "
                           "div (total_mc div 1000000)")
                    .alias("promo_ppm"))
            .orderBy("month"))


def _q_stream_windowed_counts(spark, sf_dir):
    """Tumbling-window streaming aggregation through two availableNow
    runs — the second lands a far-future sentinel that advances the
    watermark past every real window, flushing the complete final
    result set (same sentinel protocol as the stateful sessionizer);
    value-checked against the batch windowed SQL."""
    import datetime
    import tempfile

    from pikes_spark.streaming.stateful import streaming_windowed_counts

    tmp = tempfile.mkdtemp(prefix="pikes_swin_q_")
    landing, out, ckpt = f"{tmp}/landing", f"{tmp}/out", f"{tmp}/ckpt"
    schema = "event_id bigint, ts timestamp, user_id bigint, value double, event_type string"
    (spark.read.parquet(f"{sf_dir}/events.parquet")
     .select("event_id", "ts", "user_id", "value", "event_type")
     .write.parquet(landing))

    def run_once() -> None:
        stream = spark.readStream.schema(schema).parquet(landing)
        q = (streaming_windowed_counts(stream).writeStream
             .format("parquet").outputMode("append")
             .option("path", out).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(600)

    run_once()
    spark.createDataFrame(
        [(2 ** 40, datetime.datetime(2100, 1, 1), -1, 0.0, "sentinel")],
        schema).write.mode("append").parquet(landing)
    run_once()
    return (spark.read.parquet(out)
            .filter(F.col("event_type") != "sentinel")
            .select("win_start", "event_type", "n", "sum_value_fl")
            .orderBy("win_start", "event_type"))


def _q_stream_dedup_wm(spark, sf_dir):
    """Native dropDuplicatesWithinWatermark through a real streaming
    run over a twice-delivered landing dir; result == batch DISTINCT
    (copies are byte-identical, so the kept row is well-defined)."""
    import tempfile

    from pikes_spark.streaming.stream_dedup import (
        stream_dedup_within_watermark)

    tmp = tempfile.mkdtemp(prefix="pikes_sdwm_q_")
    stream_dedup_within_watermark(spark, sf_dir, f"{tmp}/landing",
                                  f"{tmp}/out", f"{tmp}/ckpt")
    return (spark.read.parquet(f"{tmp}/out")
            .select("event_id", "user_id", "event_type")
            .orderBy("event_id"))


def _q_tbl_schema_evolution(spark, sf_dir):
    """Iceberg-style schema evolution on the snapshot machinery: commit
    v0 without the `tier` column, commit v1 adding it; the unified
    read surfaces NULL tier on v0 files, and time travel still reads
    v0 under its own schema. Output digest: per (snapshot, tier)
    counts + exact cent sums, value-checked in plain SQL."""
    import tempfile

    from pikes_spark.sources.tables import SnapshotTable

    tmp = tempfile.mkdtemp(prefix="pikes_evo_q_")
    t = SnapshotTable(f"{tmp}/cust", name="cust_evo")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    cents = F.round(F.col("c_acctbal") * 100).cast("bigint").alias("cents")
    v0 = c.filter(F.col("c_custkey") % 3 != 0)           .select("c_custkey", cents)
    v1 = c.filter(F.col("c_custkey") % 3 == 0)           .select("c_custkey", cents,
                  F.col("c_mktsegment").alias("tier"))
    t.append(v0, spark)
    t.append(v1, spark)
    cur = (t.read(spark, merge_schema=True)
           .groupBy("tier")
           .agg(F.count("*").cast("bigint").alias("n"),
                F.sum("cents").cast("bigint").alias("cents"))
           .select(F.lit("latest").alias("snap"), "tier", "n", "cents"))
    v0r = (t.read(spark, sequence=0)
           .agg(F.count("*").cast("bigint").alias("n"),
                F.sum("cents").cast("bigint").alias("cents"))
           .select(F.lit("v0").alias("snap"),
                   F.lit(None).cast("string").alias("tier"), "n", "cents"))
    return (cur.unionByName(v0r)
            .orderBy("snap", F.asc_nulls_first("tier")))


def _q_rel_rollup(spark, sf_dir):
    """ROLLUP (region, nation) revenue in ONE pass — Spark and DuckDB
    both evaluate the grouping-sets lattice with partial aggregation,
    so the multi-level report costs one shuffle, not three queries.
    grouping_id() disambiguates subtotal rows from real NULLs."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    r = spark.read.parquet(f"{sf_dir}/region.parquet")
    j = (o.join(c, o.o_custkey == c.c_custkey)
         .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
         .join(F.broadcast(r), n.n_regionkey == r.r_regionkey))
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    return (j.rollup("r_name", "n_name")
            .agg(F.count("*").cast("bigint").alias("n_orders"),
                 F.sum(cents).cast("bigint").alias("cents"),
                 F.grouping_id().cast("bigint").alias("gid"))
            .orderBy(F.asc_nulls_first("r_name"),
                     F.asc_nulls_first("n_name")))


def _q_rel_agg(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (li.filter(F.col("l_shipdate") < "1997-01-01")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.floor(F.sum("l_quantity")).cast("bigint").alias("sum_qty"),
                 F.floor(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
                 .cast("bigint").alias("revenue_fl"),
                 F.count("*").alias("n"))
            .orderBy("l_returnflag", "l_linestatus"))


def _q_rel_salted_join(spark, sf_dir):
    """Skew-mitigation salted join (orders fact x customer dim on
    custkey, salt=8) aggregated per market segment — the oracle is the
    UNSALTED join, proving result-equivalence of the rewrite."""
    o = (spark.read.parquet(f"{sf_dir}/orders.parquet")
         .select(F.col("o_custkey").alias("c_custkey"), "o_totalprice"))
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    j = skew.salted_join(o, c.select("c_custkey", "c_mktsegment"),
                         "c_custkey", salt=8)
    return (j.groupBy("c_mktsegment")
            .agg(F.count("*").alias("n_orders"),
                 F.floor(F.sum("o_totalprice")).cast("bigint").alias("rev_fl"))
            .orderBy("c_mktsegment"))


def _q_rel_join_window(spark, sf_dir):
    from pyspark.sql import Window
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (j.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 3)
            .select("c_mktsegment", "rn", "o_orderkey",
                    F.floor("o_totalprice").cast("bigint").alias("price_fl"))
            .orderBy("c_mktsegment", "rn"))


def _utc(fn: Callable) -> Callable:
    """Timestamp-bearing outputs are compared against DuckDB (UTC-naive);
    pin the session TZ regardless of the driver session's default."""
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        return fn(spark, sf_dir)
    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {k: _utc(v) for k, v in _raw_queries().items()}


def _raw_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # KG pipeline (SURVEY.md §2.1-2.4)
        "kg_pages_table": _q_pages,
        # WARC container round trip (sources/warc): build + parse
        "warc_read_pages": _q_warc_read,
        "kg_extract_text": _q_extract,
        "kg_annotations": _q_annotations,
        "kg_annotations_stats": _q_annotations_stats,
        "kg_linking": _q_linking,
        "kg_linking_stats": _q_linking_stats,
        "kg_triples": _q_triples,
        "kg_triples_by_component": _q_triples_by_component,
        "kg_canonicalize": _q_canonical,
        "kg_compaction": _q_compaction,
        # golden fixtures (frozen expected values, SURVEY.md §5)
        "kg_gold_timexes": _q_gold_timexes,
        "kg_gold_entities": _q_gold_entities,
        "kg_gold_links": _q_gold_links,
        "kg_gold_triples": _q_gold_triples,
        "kg_naf_export": _q_naf_export,
        "kg_gold_opinions": _q_gold_opinions,
        "txt_sentiment": _sentiment.sentiment_scores,
        # r5: RAG token-window chunking (shuffle-free explode)
        "txt_chunks": textstats.chunk_documents,
        # r5: bucketed interval range join (views within 30 min
        # before each purchase; bounded 2x explode, one equi-join)
        "evt_range_join": events.range_join_views,
        # r5: SemDeDup — within-cluster semantic near-dup drop on the
        # fixed-point k-means partition (bit-deterministic membership)
        "sim_semdedup": similarity.semdedup,
        "kg_gold_canonicalize": _q_gold_canonicalize,
        "kg_gold_compaction": _q_gold_compaction,
        "kg_sparql_rel": _q_sparql_rel,
        "kg_sparql_optional": _q_sparql_optional,
        "kg_sparql_bind": _q_sparql_bind,
        "kg_sparql_exists_concat": _q_sparql_exists_concat,
        "kg_sparql_subquery": _q_sparql_subquery,
        "kg_sparql_agg": _q_sparql_agg,
        "kg_sparql_union": _q_sparql_union,
        "kg_sparql_values": _q_sparql_values,
        "kg_sparql_path": _q_sparql_path,
        "kg_sparql_path_seq": _q_sparql_path_seq,
        "kg_sparql_path_ops": _q_sparql_path_ops,
        "kg_sparql_path_star": _q_sparql_path_star,
        "kg_sparql_construct": _q_sparql_construct,
        "kg_sparql_describe": _q_sparql_describe,
        "kg_sparql_minus": _q_sparql_minus,
        # named-graph quads: GRAPH ?var (binds the graph column, all
        # patterns share one graph) + GRAPH <iri> (graph-pruned scan)
        "kg_sparql_graph": kgquery.sparql_graph_rel,
        "kg_sparql_gold": _q_sparql_gold,
        "kg_sparql_gold_agg": _q_sparql_gold_agg,
        # text analysis
        "txt_token_counts": textstats.token_counts,
        # tokenize-to-ids: vocab build (top-k heap, no global sort) +
        # broadcast-join corpus encoding; ids_md5 pins the SEQUENCE
        "txt_vocab": textstats.vocab_build,
        "txt_encode": textstats.encode_corpus,
        "txt_lang_id": textstats.lang_id,
        "txt_quality": textstats.quality_scores,
        "txt_fingerprint": textstats.fingerprints,
        "txt_top_terms": textstats.top_terms,
        "txt_length_quantiles": textstats.length_quantiles,
        "txt_train_test_split": textstats.train_test_split,
        "txt_token_batches": textstats.token_batches,
        "txt_redact_pii": textstats.redact_pii,
        "txt_postings": textstats.postings,
        "txt_bm25_topk": textstats.bm25_topk,
        "txt_stratified_sample": textstats.stratified_sample,
        "txt_unigram_surprisal": textstats.unigram_surprisal,
        # KenLM-shaped 2-gram LM quality signal (first token scored
        # by the unigram backoff model)
        "txt_bigram_surprisal": textstats.bigram_surprisal,
        # DSIR data-selection importance weights (hashed unigram+bigram
        # log-ratio vs the lang='en' target slice; fixed point before
        # the per-doc sum)
        "txt_dsir_weights": textstats.dsir_weights,
        # distributed full-batch GD training of a hashed linear probe
        # (integer fixed point -> bit-identical weights cross-engine)
        "txt_train_linear_probe": textstats.train_linear_probe,
        # data-recipe mixture rebalancing: deterministic hash-threshold
        # downsampling to target per-language token shares
        "txt_domain_mix": textstats.domain_mix,
        # zlib compression-ratio quality signal (entropy proxy);
        # Arrow-batched codec call, frozen digest oracle
        "txt_compression_digest": textstats.compression_digest,
        # cross-document n-gram novelty under arrival order (grams
        # md5-hashed before the exchange; exact integer ratio)
        "txt_novelty": textstats.novelty_scores,
        # positional-index exact phrase search (adjacency equi-join on
        # the phrase terms' posting lists only)
        "txt_phrase_search": textstats.phrase_search,
        # BPE tokenizer training: distributed word-freq count +
        # merge loop over the aggregated table (the SentencePiece/HF
        # split); encode stats pin per-doc piece counts via bit_xor
        "txt_bpe_merges": bpe.bpe_train,
        "txt_bpe_encode_stats": bpe.bpe_encode_stats,
        # concat-and-chunk packing efficiency (padding-vs-
        # fragmentation accounting for fixed-length batching)
        "txt_pack_sequences": textstats.pack_sequences,
        # RAG chunking: stride windows with stable ids + fingerprint
        "txt_chunk_windows": textstats.chunk_windows,
        # contrastive (anchor, positive, negative) triplet mining for
        # embedding-model training — bucket-local negatives, no global
        # row numbering, no RNG
        "txt_contrastive_pairs": textstats.contrastive_pairs,
        # OPTIMIZE ZORDER quantified: per-file min/max spans under
        # linear vs Morton-interleaved layout (same z expression text
        # runs in both engines)
        "tbl_zorder_stats": layout.zorder_stats,
        # bucketed co-located join: bucketBy layout makes the big-big
        # equi-join shuffle-free (plan-asserted); values must equal
        # the plain join
        "tbl_bucketed_join": layout.bucketed_join,
        # hive-partitioned event-log layout + partition-pruned scan
        # (manifest-resolved date predicate; plan-asserted pruning)
        "tbl_partition_prune": layout.partitioned_events_rollup,
        # int8 scalar-quantized ANN recall vs the exact float top-k
        "sim_quantized_recall": similarity.quantized_recall,
        # hybrid retrieval: reciprocal-rank fusion of the BM25 top-20
        # and the dense cosine top-20 (rank deep, fuse shallow)
        "sim_hybrid_rrf": similarity.hybrid_rrf_topk,
        # fixed-point Lloyd k-means codebook training (bit-identical
        # centroids across engines/cluster sizes)
        "sim_kmeans_codebook": similarity.kmeans_codebook,
        # rendezvous-hash fetch sharding (per-host politeness with
        # minimal movement on shard-count change); min_by argmin, no
        # window exchange
        "web_crawl_shards": weburl.crawl_shards,
        "txt_repetition": textstats.repetition_stats,
        # document-level token co-occurrence with exact-rational PMI
        # lift (top-V vocab broadcast; per-doc pair work bounded v^2)
        "txt_cooc_pmi": textstats.cooc_pmi,
        # per-language bottom-decile quality gate with exact integer
        # rank semantics (deterministic MEMBERSHIP, not just counts)
        "txt_percentile_filter": textstats.percentile_filter,
        # the composed curation pipeline (quality -> exact dedup ->
        # decontaminate -> per-lang cap) with per-stage survivor counts
        "txt_curation_funnel": textstats.curation_funnel,
        # feature-hashed linear classifier serving path (fastText-style)
        "txt_hash_classifier": textstats.hash_classifier,
        # deterministic integer-exact sketches (sketch-sized exchanges)
        "txt_count_min": sketches.count_min_estimates,
        "txt_hll_distinct": sketches.hll_distinct_tokens,
        # grouped HLL: per-language distinct tokens (one 64-register
        # sketch per group through the exchange, not the item set)
        "txt_hll_by_lang": sketches.hll_by_lang,
        "kg_bfs_reach": graph.bfs_reach,
        "kg_triangles": graph.triangles_top,
        "kg_pagerank": graph.pagerank_top20,
        # integer fixed-point HITS hubs/authorities (bit-deterministic
        # under any partitioning; scalar max rejoined as a broadcast)
        "kg_hits": graph.hits_top20,
        # deterministic-argmax label propagation communities (integer
        # cnt*ENC encoding -> one MAX partial agg per iteration)
        "kg_label_prop": graph.label_prop_rel,
        "kg_degree_profile": graph.degree_profile_rel,
        # common-neighbors link prediction (hub-capped inverted-index
        # pair generation; the cap is part of the contract)
        "kg_common_neighbors": graph.common_neighbors_rel,
        # TransE-style negative sampling: deterministic integer-hash
        # corruption + LEFT ANTI join against the positive edge set
        "kg_negative_samples": graph.negative_samples,
        # DeepWalk walk-corpus generation: deterministic hash-argmin
        # steps, one frontier row per walk per step
        "kg_walk_corpus": graph.walk_corpus_rel,
        # one GNN message-passing round (neighbor feature mean):
        # edges x features hash join + (node, pos) partial agg
        "kg_gnn_neighbor_mean": graph.neighbor_mean_features,
        # characteristic sets (SPARQL cardinality statistics)
        "kg_char_sets": kgquery.characteristic_sets,
        # RDFS forward-chaining materialization (rdfpro-rules shape):
        # driver-closed TBox broadcast against the fact scan; the only
        # exchange is the distinct over the entailed rows
        "kg_rdfs_entail": rdfs.rdfs_entail_rel,
        # OWL-lite data-scale rules: owl:TransitiveProperty closure via
        # the checkpointed-frontier iteration + owl:inverseOf flip
        "kg_owl_entail": rdfs.owl_entail_rel,
        # k-core decomposition: distributed h-index fixpoint; frozen
        # digest oracle backed by a differential peeling pytest
        "kg_kcore": graph.kcore_digest,
        # SHACL-core shape validation report (minCount/maxCount/in/
        # nodeKind as predicate-pruned aggregations and anti-joins)
        "kg_shacl_report": kgquery.shacl_report,
        # sorted N-Triples text serialization (the reference's RDF
        # writer output contract), line-for-line value-checked
        "kg_nt_export": kgquery.nt_export,
        # table maintenance: MERGE INTO + snapshot-diff CDC on the
        # committed snapshot tables (real commit/time-travel machinery;
        # oracle states the expected relational result)
        "kg_merge_upsert": cdc.merge_upsert_customers,
        "kg_snapshot_diff": cdc.snapshot_diff_customers,
        # write-audit-publish: batch staged as an invisible snapshot,
        # audited declaratively, only passing rows atomically published
        "tbl_write_audit_publish": cdc.write_audit_publish,
        # the Iceberg history/snapshots metadata view over the commit
        # manifests (pure metadata scan; deterministic columns only)
        "tbl_snapshot_history": cdc.snapshot_history,
        # RDF property-table materialization (star BGP -> one scan)
        "kg_entity_pivot": kgquery.entity_property_table,
        # web-URL hygiene family (Common-Crawl-style ingest)
        "web_url_parse": weburl.url_parse,
        "web_url_canon": weburl.url_canonicalize,
        "web_domain_stats": weburl.domain_stats,
        "web_corpus_filter": weburl.corpus_filter,
        "web_url_dedup": weburl.url_dedup_groups,
        # hyperlink extraction -> link graph -> anchor-text EL priors
        # (regex extraction checked against an INDEPENDENT arithmetic
        # derivation on the oracle side; host PageRank value-frozen)
        "web_page_links": weblinks.page_links,
        "web_host_graph": weblinks.host_graph_rel,
        "web_anchor_priors": weblinks.anchor_priors_rel,
        "web_host_pagerank": weblinks.host_pagerank,
        # dedup family
        "dedup_exact": dedup.exact_duplicates,
        "txt_decontaminate": dedup.decontaminate,
        "dedup_repeated_spans": dedup.repeated_spans,
        # ngram_jaccard is the exact all-pairs VERIFIER/oracle path —
        # quadratic on hot shingles, not the scale path; use
        # dedup_minhash_lsh for corpus-scale near-dup (its oracle IS
        # this query)
        "dedup_ngram_jaccard": dedup.ngram_jaccard_pairs,
        # prefix-filtering (AllPairs/PPJoin) EXACT similarity join —
        # the scale path for exact Jaccard: only the floor((1-t)|s|)+1
        # globally-rarest shingles of each doc are indexed, so hot
        # shingles never explode the candidate join
        "dedup_jaccard_prefix": dedup.jaccard_prefix_pairs,
        # sorted-neighborhood blocking (the ordering-aware third
        # blocking family): blocked lead-window candidates + exact
        # token-Jaccard verify
        "dedup_snm_pairs": dedup.snm_pairs,
        # incremental near-dup: new-batch band probes against the
        # corpus band index; O(batch), never O(corpus^2)
        "dedup_incremental": dedup.incremental_neardup,
        "dedup_minhash_lsh": dedup.minhash_lsh_pairs,
        "dedup_simhash": dedup.simhash_pairs,
        "dedup_simhash_stats": _q_simhash_stats,
        "dedup_embedding_cosine": dedup.embedding_neardup_pairs,
        # pairs -> groups -> keep/drop representative per group (CC
        # over the LSH pair graph via the canonicalization operator)
        "dedup_group_representatives": dedup.dedup_group_representatives,
        # cluster-size histogram over the near-dup groups (the corpus
        # release stat: groups of size k, docs removed)
        "dedup_cluster_sizes": dedup.dedup_cluster_sizes,
        # similarity search
        "sim_brute_force_topk": lambda s, d: similarity.brute_force_topk(s, d, 0, 10),
        "sim_ivf_topk": _q_sim_ivf,
        "sim_label_centroids": similarity.label_centroids,
        # exact all-docs k-NN graph via block-grid GEMM with
        # cell-local top-k pruning (SemDeDup/clustering primitive)
        "sim_knn_graph": similarity.knn_graph,
        # leave-one-out k-NN majority classification on top of the
        # k-NN graph (integer argmax vote, no window)
        "sim_knn_classify": similarity.knn_classify,
        # multimodal plumbing
        "mm_media_features": _q_media,
        # image aHash near-dup pairs: banded pigeonhole blocking +
        # JVM-side bit_count(xor) verify; frozen-VALUES oracle backed
        # by a brute-force differential pytest
        "mm_phash_pairs": multimodal_phash,
        # audio energy-fingerprint near-dup pairs (same banded join +
        # frozen-VALUES/differential protocol)
        "mm_audio_fp_pairs": multimodal_audio_fp,
        # relational layer
        "rel_filter_agg": _q_rel_agg,
        # TPC-H Q5/Q14 shapes: 6-way join with broadcast dims; promo
        # conditional agg — exact integer revenue (cents x ppm)
        "rel_q5_local_supplier": _q_rel_q5,
        # grouping-sets lattice in one shuffle (ROLLUP + grouping_id)
        "rel_rollup_revenue": _q_rel_rollup,
        # Iceberg-style schema evolution: later-commit column reads as
        # NULL on older files; time travel keeps the old schema
        "tbl_schema_evolution": _q_tbl_schema_evolution,
        "rel_q14_promo_share": _q_rel_q14,
        "rel_join_window_topk": _q_rel_join_window,
        "rel_salted_join": _q_rel_salted_join,
        # Bloom semi-join reduction: fact side pruned by a
        # deterministic k-hash bitmap of the dim keys BEFORE the
        # shuffle; exact join after = plain-join oracle
        "rel_bloom_semi_join": skew.bloom_join_revenue,
        # event-stream operators (batch form; streaming uses same exprs)
        "evt_sessionize": events.sessionize,
        "evt_windowed_counts": events.windowed_counts,
        # point-in-time as-of join (kdb aj / DuckDB ASOF semantics):
        # one user_id shuffle + running last() — no range self-join
        "evt_asof_join": events.asof_join,
        # event-time RANGE-frame sliding count (burst detection)
        "evt_funnel_depth": events.funnel_depth,
        "evt_sliding_count": events.sliding_window_count,
        "evt_retention_cohorts": events.retention_cohorts,
        # SCD type-2 dimension build (consecutive-change collapse +
        # validity intervals; one user_id exchange feeds lag AND lead)
        "evt_scd2_history": events.scd2_history,
        # schema-on-read JSON payload rollup (JVM-side get_json_object
        # before the exchange)
        "evt_json_props": events.json_props_rollup,
        # item-item co-visitation counts (recommendation candidates);
        # power users over the cap excluded — cap mirrored in oracle
        "evt_covisitation": events.covisitation,
        # daily trending top-k items (WindowGroupLimit rank cutoff)
        "evt_trending": events.trending_items,
        # first-order Markov item-transition counts (lead() on the
        # sessionizer's user_id exchange; exact rational row share)
        "evt_item_transitions": events.item_transitions,
        # custom STATEFUL streaming operator (applyInPandasWithState):
        # driven end-to-end through Structured Streaming, flushed via a
        # watermark sentinel, and value-checked against the same SQL
        # oracle as the batch sessionizer
        "evt_sessionize_stateful": _q_sessionize_stateful,
        "stream_dedup_exact": _q_stream_dedup,
        # stream-stream watermarked join (view->click attribution);
        # real streaming run, batch-SQL value oracle
        "stream_view_click_join": _q_stream_view_click,
        # native dropDuplicatesWithinWatermark (bounded-state keyed
        # dedup on an at-least-once stream)
        "stream_dedup_within_wm": _q_stream_dedup_wm,
        # streaming tumbling-window agg behind a watermark (append
        # mode; sentinel flush -> complete final windows)
        "stream_windowed_counts": _q_stream_windowed_counts,
    }


# ---------------------------------------------------------------------------
# oracles
# ---------------------------------------------------------------------------

PAGES_CTE = "WITH pages AS (" + PAGES_ORACLE_CTE + ")"


def _gold_values_sql(list_name: str, cols, order: str) -> str:
    from pikes_spark.sources import gold_expected as ge
    rows = getattr(ge, list_name)
    return ge.values_sql(rows, cols) + " ORDER BY " + order


def _corpus_values_sql(list_name: str, cols, order: str) -> str:
    """Frozen sf0.01 corpus stats (scripts/refreeze_corpus_stats.py) —
    the driver's oracle scale; see corpus_expected.py docstring."""
    from pikes_spark.sources import gold_expected as ge
    from pikes_spark.sources import corpus_expected as ce
    rows = getattr(ce, list_name)
    return ge.values_sql(rows, cols) + " ORDER BY " + order


def _gold_triples_values_sql(list_name: str, cols, order: str) -> str:
    from pikes_spark.sources import gold_expected as ge
    from pikes_spark.sources import gold_expected_triples as gt
    rows = getattr(gt, list_name)
    return ge.values_sql(rows, cols) + " ORDER BY " + order

# DuckDB twin of the deterministic html wrap (sources/pages.html_col /
# functions/htmltext.wrap_html) — shared by the pages-table oracle and
# the WARC round-trip oracle.
_HTML_WRAP_SQL = """(
  '<!DOCTYPE html><html><head><title></title><style>body{margin:0}</style></head><body>'
  || '<nav><ul><li><a href="/">Home</a></li><li><a href="/about">About</a></li></ul></nav>'
  || '<main><article><p>'
  || replace(replace(replace(replace(text, '&', '&amp;'),
             '<', '&lt;'), '>', '&gt;'),
             chr(10) || chr(10), '</p><p>')
  || '</p></article></main>'
  || '<footer>&copy; 2026 Example Corp. All rights reserved.</footer>'
  || '<script>var x=1;</script></body></html>')"""


def oracle_sql() -> dict[str, str]:
    from pikes_spark.streaming import stream_join
    return {
        "kg_pages_table": PAGES_CTE + f"""
            SELECT url, strftime(warc_ts, '%Y-%m-%d %H:%M:%S') AS warc_ts_s,
                   octet_length(encode({_HTML_WRAP_SQL})) AS n_html_bytes,
                   lang
            FROM pages ORDER BY url
        """,
        # WARC round trip: the oracle re-derives what the parser must
        # recover from the framed records, without any WARC framing
        "warc_read_pages": PAGES_CTE + f"""
            SELECT url,
                   strftime(warc_ts, '%Y-%m-%dT%H:%M:%SZ') AS warc_date_s,
                   CAST(200 AS BIGINT) AS status,
                   CAST(octet_length(encode({_HTML_WRAP_SQL})) AS BIGINT)
                     AS n_bytes,
                   md5({_HTML_WRAP_SQL}) AS html_md5
            FROM pages ORDER BY url
        """,
        "kg_extract_text": PAGES_CTE + """
            SELECT url, text FROM pages ORDER BY url
        """,
        "kg_gold_timexes": _gold_values_sql(
            "EXPECTED_TIMEXES", ["gold_id", "timex_type", "timeml_value"],
            order="gold_id, timeml_value"),
        "kg_gold_entities": _gold_values_sql(
            "EXPECTED_ENTITIES", ["gold_id", "entity_type", "surface"],
            order="gold_id, surface"),
        "kg_gold_links": _gold_values_sql(
            "EXPECTED_LINKS", ["gold_id", "dbpedia_uri"],
            order="gold_id, dbpedia_uri"),
        "kg_gold_triples": _gold_triples_values_sql(
            "EXPECTED_TRIPLE_STATS", ["gold_id", "component", "n", "checksum"],
            order="gold_id, component"),
        "kg_naf_export": _gold_triples_values_sql(
            "EXPECTED_NAF_STATS",
            ["gold_id", "n_wf", "n_preds", "naf_len", "checksum"],
            order="gold_id"),
        "kg_gold_opinions": _gold_triples_values_sql(
            "EXPECTED_OPINIONS", ["gold_id", "opinion", "prop", "obj"],
            order="gold_id, opinion, prop, obj"),
        "txt_sentiment": _sentiment.sentiment_sql(),
        "txt_chunks": textstats.CHUNKS_SQL,
        "evt_range_join": events.RANGE_JOIN_SQL,
        "sim_semdedup": similarity.SEMDEDUP_SQL,
        "kg_gold_canonicalize": _gold_triples_values_sql(
            "EXPECTED_CANONICAL_STATS", ["component", "n", "n_subjects"],
            order="component"),
        "kg_linking_stats": _corpus_values_sql(
            "LINKING_STATS",
            ["n_links", "n_uris", "n_urls", "checksum"],
            order="n_links"),
        "kg_annotations_stats": _corpus_values_sql(
            "ANNOTATION_STATS",
            ["n_urls", "sum_sentences", "sum_tokens", "sum_deps",
             "sum_entities", "sum_timexes", "sum_predicates",
             "sum_corefs", "checksum"],
            order="n_urls"),
        "kg_triples_by_component": _corpus_values_sql(
            "TRIPLES_BY_COMPONENT", ["component", "n"], order="component"),
        "kg_canonicalize": _corpus_values_sql(
            "CANONICAL_STATS", ["component", "n", "n_subjects"],
            order="component"),
        "kg_compaction": _corpus_values_sql(
            "COMPACTION_STATS", ["component", "n", "n_graphs"],
            order="component"),
        "dedup_simhash_stats": _corpus_values_sql(
            "SIMHASH_STATS", ["hamming", "n_pairs", "pair_checksum"],
            order="hamming"),
        "sim_label_centroids": similarity.LABEL_CENTROIDS_SQL,
        "sim_knn_graph": similarity.KNN_GRAPH_SQL,
        "sim_ivf_topk": _corpus_values_sql(
            "IVF_TOPK", ["vec_id", "cos_x1e6"], order="cos_x1e6 DESC, vec_id"),
        "kg_pagerank": _corpus_values_sql(
            "PAGERANK_TOP20", ["node", "rank"], order="rank DESC, node"),
        "mm_media_features": _corpus_values_sql(
            "MEDIA_FEATURES",
            ["media_id", "kind", "n_bytes", "sha256", "frames"],
            order="media_id"),
        # codec-backed hashes are not SQL-expressible; frozen VALUES
        # (brute-force hamming differential pytest backs the freeze)
        "mm_phash_pairs": _corpus_values_sql(
            "PHASH_PAIRS", ["id1", "id2", "hamming"], order="id1, id2"),
        "mm_audio_fp_pairs": _corpus_values_sql(
            "AUDIO_FP_PAIRS", ["id1", "id2", "hamming"], order="id1, id2"),
        "kg_gold_compaction": _gold_triples_values_sql(
            "EXPECTED_COMPACTION_STATS", ["component", "n", "n_graphs"],
            order="component"),
        "kg_sparql_rel": kgquery.SPARQL_REL_SQL,
        "kg_sparql_optional": kgquery.SPARQL_OPTIONAL_SQL,
        "kg_sparql_bind": kgquery.SPARQL_BIND_SQL,
        "kg_sparql_exists_concat": kgquery.SPARQL_EXISTS_CONCAT_SQL,
        "kg_sparql_subquery": kgquery.SPARQL_SUBQUERY_SQL,
        "kg_sparql_agg": kgquery.SPARQL_AGG_SQL,
        "kg_sparql_union": kgquery.SPARQL_UNION_SQL,
        "kg_sparql_values": kgquery.SPARQL_VALUES_SQL,
        "kg_sparql_path": kgquery.SPARQL_PATH_SQL,
        "kg_sparql_path_seq": kgquery.SPARQL_PATH_SEQ_SQL,
        "kg_sparql_path_ops": kgquery.SPARQL_PATH_OPS_SQL,
        "kg_sparql_path_star": kgquery.SPARQL_PATH_STAR_SQL,
        "kg_sparql_construct": kgquery.SPARQL_CONSTRUCT_SQL,
        "kg_sparql_describe": kgquery.SPARQL_DESCRIBE_SQL,
        "kg_sparql_minus": kgquery.SPARQL_MINUS_SQL,
        "kg_sparql_graph": kgquery.SPARQL_GRAPH_SQL,
        "kg_sparql_gold": _gold_triples_values_sql(
            "EXPECTED_SPARQL_GOLD", ["event", "actor", "name"],
            order="event, actor, name"),
        "kg_sparql_gold_agg": _gold_triples_values_sql(
            "EXPECTED_SPARQL_GOLD_AGG", ["page", "n_entities"],
            order="page"),
        "txt_token_counts": textstats.TOKEN_COUNTS_SQL,
        "txt_vocab": textstats.VOCAB_SQL,
        "txt_encode": textstats.ENCODE_SQL,
        "txt_lang_id": textstats.LANG_ID_SQL,
        "txt_quality": textstats.QUALITY_SQL,
        "txt_fingerprint": textstats.FINGERPRINT_SQL,
        "txt_top_terms": textstats.TOP_TERMS_SQL,
        "txt_length_quantiles": textstats.LENGTH_QUANTILES_SQL,
        "txt_train_test_split": textstats.TRAIN_TEST_SPLIT_SQL,
        "txt_token_batches": textstats.TOKEN_BATCHES_SQL,
        "txt_redact_pii": textstats.REDACT_PII_SQL,
        "rel_salted_join": """
            SELECT c.c_mktsegment, count(*) AS n_orders,
                   CAST(floor(sum(o.o_totalprice)) AS BIGINT) AS rev_fl
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
        """,
        "txt_postings": textstats.POSTINGS_SQL,
        "txt_bm25_topk": textstats.BM25_SQL,
        "txt_stratified_sample": textstats.STRATIFIED_SAMPLE_SQL,
        "txt_unigram_surprisal": textstats.UNIGRAM_SURPRISAL_SQL,
        "txt_bigram_surprisal": textstats.BIGRAM_SURPRISAL_SQL,
        "rel_bloom_semi_join": skew.BLOOM_JOIN_SQL,
        "txt_pack_sequences": textstats.PACK_SEQUENCES_SQL,
        "web_crawl_shards": weburl.CRAWL_SHARDS_SQL,
        "txt_chunk_windows": textstats.CHUNK_WINDOWS_SQL,
        "txt_contrastive_pairs": textstats.contrastive_sql(),
        "tbl_zorder_stats": layout.ZORDER_STATS_SQL,
        "tbl_bucketed_join": layout.BUCKETED_JOIN_SQL,
        "sim_quantized_recall": similarity.quantized_recall_sql(0, 10),
        "sim_hybrid_rrf": similarity.hybrid_rrf_sql(),
        "sim_kmeans_codebook": similarity.KMEANS_SQL,
        "evt_scd2_history": events.SCD2_SQL,
        "evt_json_props": events.JSON_PROPS_SQL,
        # TPC-H nation is fixed at 25 rows at every SF
        "kg_negative_samples": graph.negative_samples_sql(25),
        "kg_walk_corpus": graph.WALK_CORPUS_SQL,
        "kg_gnn_neighbor_mean": graph.NEIGHBOR_MEAN_SQL,
        "kg_char_sets": kgquery.CHAR_SETS_SQL,
        "kg_rdfs_entail": rdfs.rdfs_entail_sql(),
        "kg_owl_entail": rdfs.owl_entail_sql(),
        "kg_hits": graph.hits_sql(),
        "evt_covisitation": events.COVISITATION_SQL,
        "evt_trending": events.TRENDING_SQL,
        "evt_item_transitions": events.ITEM_TRANSITIONS_SQL,
        "txt_novelty": textstats.NOVELTY_SQL,
        "txt_phrase_search": textstats.PHRASE_SEARCH_SQL,
        "tbl_write_audit_publish": cdc.WAP_SQL,
        "sim_knn_classify": similarity.KNN_CLASSIFY_SQL,
        "txt_hll_by_lang": sketches.hll_by_lang_sql(),
        "tbl_snapshot_history": cdc.SNAPSHOT_HISTORY_SQL,
        "txt_dsir_weights": textstats.DSIR_SQL,
        "txt_cooc_pmi": textstats.COOC_PMI_SQL,
        "txt_percentile_filter": textstats.PERCENTILE_FILTER_SQL,
        "txt_curation_funnel": textstats.CURATION_FUNNEL_SQL,
        "kg_label_prop": graph.label_prop_sql(),
        "tbl_partition_prune": layout.PARTITION_PRUNE_SQL,
        "dedup_snm_pairs": dedup.SNM_SQL,
        "dedup_incremental": dedup.INCREMENTAL_NEARDUP_SQL,
        "txt_train_linear_probe": textstats.LINEAR_PROBE_SQL,
        "txt_domain_mix": textstats.domain_mix_sql(),
        # codec output is not SQL-expressible; frozen digest
        # (differential pytest vs direct zlib backs the freeze)
        "txt_compression_digest": _corpus_values_sql(
            "COMPRESSION_DIGEST",
            ["n_docs", "sum_raw", "sum_comp", "checksum"],
            order="n_docs"),
        "kg_shacl_report": kgquery.shacl_sql(),
        "kg_nt_export": kgquery.nt_export_sql(),
        # iterative h-index fixpoint is not SQL-expressible; frozen-
        # VALUES digest (differential pytest vs sequential peeling
        # backs the freeze)
        "kg_kcore": _corpus_values_sql(
            "KCORE_DIGEST", ["coreness", "n_nodes", "node_sum"],
            order="coreness"),
        # iterative merge loop is not SQL-expressible; frozen-VALUES
        # oracles (differential pytest vs an independent occurrence-
        # level implementation backs the freeze)
        "txt_bpe_merges": _corpus_values_sql(
            "BPE_MERGES", ["rank", "lhs", "rhs", "pair_freq"],
            order="rank"),
        "txt_bpe_encode_stats": _corpus_values_sql(
            "BPE_ENCODE_STATS",
            ["n_docs", "n_words", "sum_pieces", "checksum"],
            order="n_docs"),
        "txt_repetition": textstats.REPETITION_SQL,
        "txt_hash_classifier": textstats.HASH_CLASSIFIER_SQL,
        "txt_count_min": sketches.count_min_sql(),
        "txt_hll_distinct": sketches.hll_sql(),
        "evt_retention_cohorts": events.RETENTION_SQL,
        "kg_entity_pivot": kgquery.entity_property_table_sql(),
        "kg_bfs_reach": graph.BFS_REACH_SQL,
        "kg_triangles": graph.TRIANGLES_SQL,
        "kg_degree_profile": graph._degree_profile_sql(),
        "kg_common_neighbors": graph.COMMON_NEIGHBORS_SQL,
        "kg_merge_upsert": cdc.MERGE_UPSERT_SQL,
        "kg_snapshot_diff": cdc.SNAPSHOT_DIFF_SQL,
        "web_url_parse": weburl.URL_PARSE_SQL,
        "web_url_canon": weburl.URL_CANON_SQL,
        "web_domain_stats": weburl.DOMAIN_STATS_SQL,
        "web_corpus_filter": weburl.CORPUS_FILTER_SQL,
        "web_url_dedup": weburl.url_dedup_sql(),
        "web_page_links": weblinks.PAGE_LINKS_SQL,
        "web_host_graph": weblinks.HOST_GRAPH_SQL,
        "web_anchor_priors": weblinks.ANCHOR_PRIORS_SQL,
        "web_host_pagerank": _corpus_values_sql(
            "HOST_PAGERANK", ["host", "rank"], order="rank DESC, host"),
        "dedup_exact": dedup.EXACT_DUP_SQL,
        "txt_decontaminate": dedup.DECONTAMINATE_SQL,
        "dedup_repeated_spans": dedup.REPEATED_SPANS_SQL,
        "dedup_ngram_jaccard": dedup.NGRAM_JACCARD_SQL,
        # prefix filtering is EXACT (completeness theorem in the
        # docstring), so the all-pairs SQL is a strict oracle — unlike
        # the probabilistic LSH bound below
        "dedup_jaccard_prefix": dedup.NGRAM_JACCARD_SQL,
        # LSH candidates are exact-Jaccard verified, so output ⊆ exact set
        # always; equality additionally needs LSH recall 1.0 at t=0.8.
        # With 32 bands x 4 rows, P[miss] per true pair = (1-0.8^4)^32
        # ≈ 4.8e-8 — probabilistic, not guaranteed; an unlucky dataset can
        # legitimately fail this oracle (documented bound, accepted risk).
        "dedup_minhash_lsh": dedup.NGRAM_JACCARD_SQL,
        "dedup_embedding_cosine": dedup.EMB_NEARDUP_SQL,
        "dedup_group_representatives": dedup.DEDUP_GROUPS_SQL,
        "dedup_cluster_sizes": dedup.DEDUP_CLUSTER_SIZES_SQL,
        "sim_brute_force_topk": similarity.brute_force_topk_sql(0, 10),

        "tbl_schema_evolution": """
WITH c AS (
  SELECT c_custkey, CAST(round(c_acctbal * 100) AS BIGINT) AS cents,
         CASE WHEN c_custkey % 3 = 0 THEN c_mktsegment END AS tier,
         c_custkey % 3 = 0 AS in_v1
  FROM customer
)
SELECT 'latest' AS snap, tier, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(cents) AS BIGINT) AS cents
FROM c GROUP BY tier
UNION ALL
SELECT 'v0', NULL, CAST(count(*) AS BIGINT),
       CAST(sum(cents) AS BIGINT)
FROM c WHERE NOT in_v1
ORDER BY snap, tier NULLS FIRST
""",
        "rel_rollup_revenue": """
SELECT r_name, n_name,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS cents,
       CAST(GROUPING(r_name) * 2 + GROUPING(n_name) AS BIGINT) AS gid
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
ORDER BY r_name NULLS FIRST, n_name NULLS FIRST
""",
        "rel_q5_local_supplier": """
SELECT n_name,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (1000000 - CAST(round(l_discount * 1000000) AS BIGINT))) AS BIGINT) AS revenue_mc
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name ORDER BY revenue_mc DESC, n_name
""",
        "rel_q14_promo_share": """
WITH j AS (
  SELECT strftime(l_shipdate, '%Y-%m') AS month,
         CASE WHEN p_type = 'PROMO' THEN CAST(round(l_extendedprice * 100) AS BIGINT) * (1000000 - CAST(round(l_discount * 1000000) AS BIGINT)) ELSE 0 END AS promo,
         CAST(round(l_extendedprice * 100) AS BIGINT) * (1000000 - CAST(round(l_discount * 1000000) AS BIGINT)) AS rev
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1997-01-01'
)
SELECT month, CAST(sum(promo) AS BIGINT) AS promo_mc,
       CAST(sum(rev) AS BIGINT) AS total_mc,
       ((CAST(sum(promo) AS BIGINT) // 1000000) * 1000000)
         // (CAST(sum(rev) AS BIGINT) // 1000000) AS promo_ppm
FROM j GROUP BY month ORDER BY month
""",
        "rel_filter_agg": """
            SELECT l_returnflag, l_linestatus,
                   CAST(floor(sum(l_quantity)) AS BIGINT) AS sum_qty,
                   CAST(floor(sum(l_extendedprice * (1 - l_discount))) AS BIGINT) AS revenue_fl,
                   count(*) AS n
            FROM lineitem
            WHERE l_shipdate < TIMESTAMP '1997-01-01'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "evt_sessionize": events.SESSIONIZE_SQL,
        # the stateful streaming sessionizer closes every session via
        # the sentinel flush, so the complete-session SQL is its oracle
        "evt_sessionize_stateful": events.SESSIONIZE_SQL,
        # late-arriving duplicates (shifted ids, same text) must be
        # dropped: the committed unique set == the original corpus's
        # per-norm min-doc_id representatives
        "stream_view_click_join": stream_join.VIEW_CLICK_JOIN_SQL,
        "stream_windowed_counts": events.WINDOWED_COUNTS_SQL,
        "stream_dedup_within_wm": """
SELECT DISTINCT event_id, user_id, event_type
FROM events ORDER BY event_id
""",
        "stream_dedup_exact": r"""
            SELECT min(doc_id) AS doc_id
            FROM (SELECT doc_id,
                         regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS norm
                  FROM documents)
            GROUP BY norm ORDER BY doc_id
        """,
        "evt_windowed_counts": events.WINDOWED_COUNTS_SQL,
        "evt_asof_join": events.ASOF_JOIN_SQL,
        "evt_funnel_depth": events.FUNNEL_SQL,
        "evt_sliding_count": events.SLIDING_COUNT_SQL,
        "rel_join_window_topk": """
            WITH j AS (
              SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
                     row_number() OVER (PARTITION BY c.c_mktsegment
                                        ORDER BY o.o_totalprice DESC, o.o_orderkey ASC) AS rn
              FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            )
            SELECT c_mktsegment, rn, o_orderkey,
                   CAST(floor(o_totalprice) AS BIGINT) AS price_fl
            FROM j WHERE rn <= 3 ORDER BY c_mktsegment, rn
        """,
    }
