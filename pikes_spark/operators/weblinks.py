"""Hyperlink extraction and the link-derived web graph: per-page
anchor extraction from HTML, the host-level link graph, anchor-text
lexicalization priors, and host PageRank.

Why this family exists in a KG-construction engine: the reference's
entity-linking candidates come from DBpedia Spotlight models whose
surface->URI priors are themselves BUILT from hyperlink anchor text
(AnnotationPipeline.java:197-206,461-481 configures the Spotlight
candidate store; Spotlight's lexicalization statistics are Wikipedia
anchor counts). At crawl scale the same derivation runs over the
corpus itself: extract <a href> anchors, aggregate (surface, target)
counts, normalize to priors — that table is exactly the
``$PIKES_EL_DICT`` TSV contract (functions/el_dict.parse_el_tsv), so
the engine can bootstrap its own candidate dictionary from the crawl.
The host graph + PageRank side feeds source-quality weighting (the
Gopher/C4-style "trusted domain" signal) and crawl prioritization.

Determinism contract (same discipline as weburl.synth_urls): pages
carry a deterministic links <aside> derived from doc_id by md5
arithmetic that is expressible in BOTH engines. The Spark side does
the REAL work — synthesizes full page HTML (escaped body text + nav +
links aside) and parses anchors back out with regexp_extract_all —
while the DuckDB oracle re-derives the expected links directly from
the arithmetic, WITHOUT regex extraction. The two paths are
independent implementations, so the oracle checks the extractor
end-to-end rather than re-running the same regex on both sides.

Scale design (100 TB):
- extraction is map-only work fused into the parquet scan by
  whole-stage codegen — no shuffle touches raw HTML; the explode
  multiplies rows ~5x but carries only short link columns, never the
  page bytes;
- the host graph groupBy keys on (src_host, dst_host) — bounded by
  the crawl's SITE count, not its page count, and partial (map-side)
  aggregation collapses each partition's contribution to at most
  |hosts|^2 rows before the exchange;
- anchor priors key on surface text; hot surfaces ("here", nav
  boilerplate) are the classic skew — internal/boilerplate links are
  dropped before the aggregation and the window runs over the
  already-aggregated (surface, target) pairs, i.e. at most
  |vocabulary x targets| rows, not one row per mention;
- host PageRank runs on the HOST graph (|V| = sites, orders of
  magnitude below pages) — the standard trick that makes web-graph
  centrality tractable; the fixed-point integer kernel
  (graph.pagerank_int) keeps the result bit-deterministic under any
  partitioning, which is what lets the driver value-check it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .weburl import synth_urls
from .graph import pagerank_int

# targets live in a 199-page id space so (surface -> target) counts
# collide often enough at sf0.01 to make the priors non-trivial;
# 23 surfaces ("topic-0".."topic-22") over 199 targets gives ~9
# candidate targets per surface.
_N_TARGETS = 199
_N_SURFACES = 23
_N_HUBS = 19  # dst host index space; least(x,y) skews toward low ids


def _hexint(col, lo: int, hi: int):
    """Integer from md5-hex substring — Spark side of the idiom
    (DuckDB twin: CAST('0x' || substr(md5(..), lo, n) AS BIGINT))."""
    return F.conv(F.substring(col, lo, hi - lo + 1), 16, 10).cast("bigint")


def _tld(n):  # doc-id/target cycling, same as weburl.synth_urls
    return (F.when(n % 3 == 0, "com").when(n % 3 == 1, "org")
            .otherwise("net"))


def _src_host(did, source):
    """The synth_urls host (port-free), re-derived arithmetically."""
    return F.concat(F.lit("www"), (did % 7).cast("string"), F.lit("."),
                    source, F.lit("-site."), _tld(did))


def _link_exprs(did, k: int):
    """(dst_url, dst_host, anchor) for outlink k of page did."""
    h = F.md5(F.concat(did.cast("string"), F.lit(f":{k}")))
    x = _hexint(h, 1, 6)
    y = _hexint(h, 7, 12)
    t = x % _N_TARGETS
    hub = F.least(x % _N_HUBS, y % _N_HUBS)
    dst_host = F.concat(F.lit("www"), hub.cast("string"),
                        F.lit(".hub-site."), _tld(t))
    dst_url = F.concat(F.lit("https://"), dst_host, F.lit("/doc/"),
                       t.cast("string"))
    anchor = F.concat(F.lit("topic-"), (t % _N_SURFACES).cast("string"))
    return dst_url, dst_host, anchor


def _page_html(docs: DataFrame) -> DataFrame:
    """(doc_id, src_host, html): full page html — escaped body text
    wrapped in the standard boilerplate plus the deterministic
    3-link related-pages <aside>."""
    did = F.col("doc_id")
    body = F.replace(
        F.replace(F.replace(F.replace(F.col("text"), F.lit("&"),
                                      F.lit("&amp;")),
                            F.lit("<"), F.lit("&lt;")),
                  F.lit(">"), F.lit("&gt;")),
        F.lit("\n\n"), F.lit("</p><p>"))
    items = []
    for k in (1, 2, 3):
        dst_url, _dh, anchor = _link_exprs(did, k)
        items.append(F.concat(F.lit('<li><a href="'), dst_url,
                              F.lit('">'), anchor, F.lit("</a></li>")))
    html = F.concat(
        F.lit('<!DOCTYPE html><html><head><title></title></head><body>'
              '<nav><ul><li><a href="/">Home</a></li>'
              '<li><a href="/about">About</a></li></ul></nav>'
              "<main><article><p>"),
        body,
        F.lit("</p></article></main>"),
        F.lit('<aside id="rel"><ul>'), *items, F.lit("</ul></aside>"
              "<footer>&copy; 2026</footer></body></html>"))
    return docs.select(did.alias("doc_id"),
                       _src_host(did, F.col("source")).alias("src_host"),
                       html.alias("html"))


_HREF_RE = r'<a href="([^"]*)">'
_ANCHOR_RE = r'<a href="[^"]*">([^<]*)</a>'


def extract_links(pages: DataFrame) -> DataFrame:
    """Parse (doc_id, src_host, html) -> one row per anchor:
    (doc_id, link_no, anchor, dst_url, dst_host, internal).

    Real extraction: regexp_extract_all over the page bytes, href and
    anchor-text arrays zipped positionally, relative hrefs resolved
    against the page's own host. All JVM-side (codegen'd regex);
    the page html column is dropped before any shuffle."""
    hrefs = F.regexp_extract_all("html", F.lit(_HREF_RE), 1)
    texts = F.regexp_extract_all("html", F.lit(_ANCHOR_RE), 1)
    links = (pages
             .select("doc_id", "src_host",
                     F.posexplode(F.arrays_zip(hrefs.alias("href"),
                                               texts.alias("anchor")))
                     .alias("link_no", "lk"))
             .select("doc_id", "src_host",
                     F.col("link_no").cast("bigint").alias("link_no"),
                     F.col("lk.href").alias("href"),
                     F.col("lk.anchor").alias("anchor")))
    internal = ~F.col("href").startswith("http")
    dst_url = F.when(internal,
                     F.concat(F.lit("https://"), F.col("src_host"),
                              F.col("href"))).otherwise(F.col("href"))
    dst_host = F.when(internal, F.col("src_host")).otherwise(
        F.regexp_extract(dst_url, r"^https?://([^/?#]+)", 1))
    return links.select(
        "doc_id", "src_host", "link_no", "anchor",
        dst_url.alias("dst_url"), dst_host.alias("dst_host"),
        internal.alias("internal"))


def page_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: anchors extracted from the synthesized pages."""
    from .dedup import _documents
    docs = _documents(spark, sf_dir).select(
        "doc_id", "text", "source")
    docs = docs.repartition(max(spark.sparkContext.defaultParallelism, 8))
    return extract_links(_page_html(docs)).drop("src_host")


def host_graph(links: DataFrame) -> DataFrame:
    """Host-level link graph: external links only (nav/self-host
    boilerplate dropped — the standard link-graph hygiene step),
    one row per (src_host, dst_host) with link and page counts."""
    return (links.filter(~F.col("internal"))
            .groupBy("src_host", "dst_host")
            .agg(F.count("*").alias("n_links"),
                 F.countDistinct("doc_id").alias("n_pages")))


def host_graph_rel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import _documents
    docs = _documents(spark, sf_dir).select(
        "doc_id", "text", "source")
    return host_graph(extract_links(_page_html(docs)))


def anchor_priors(links: DataFrame) -> DataFrame:
    """(surface, dst_url, cnt, prior_ppm): anchor-text lexicalization
    statistics over external links — the Spotlight-style prior table.
    prior_ppm is integer parts-per-million (cnt * 1e6 div total per
    surface) so the value is bit-identical across engines (no float
    division in the compare path)."""
    from pyspark.sql.window import Window
    agg = (links.filter(~F.col("internal"))
           .groupBy(F.col("anchor").alias("surface"), "dst_url")
           .agg(F.count("*").alias("cnt")))
    total = F.sum("cnt").over(Window.partitionBy("surface"))
    return agg.select(
        "surface", "dst_url", "cnt",
        F.expr("cnt * 1000000").cast("bigint").alias("_num"),
        total.alias("_den")).select(
        "surface", "dst_url", "cnt",
        F.expr("_num div _den").alias("prior_ppm"))


def anchor_priors_rel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import _documents
    docs = _documents(spark, sf_dir).select(
        "doc_id", "text", "source")
    return anchor_priors(extract_links(_page_html(docs)))


def anchor_candidates(links: DataFrame) -> DataFrame:
    """Bridge to the entity-linking dictionary: the anchor-prior table
    reshaped to the candidates_df contract (surface, uri, prior, ctx)
    — operators/linking.py:35. prior = 0.95 * cnt/total per surface
    (the parse_el_tsv normalization); ctx = the URI path words, same
    stand-in used by candidates_df. Lets linking consume a dictionary
    BUILT FROM THE CRAWL instead of (or unioned with) the shipped
    TSV."""
    from pyspark.sql.window import Window
    agg = (links.filter(~F.col("internal"))
           .groupBy(F.lower("anchor").alias("surface"),
                    F.col("dst_url").alias("uri"))
           .agg(F.count("*").alias("cnt")))
    total = F.sum("cnt").over(Window.partitionBy("surface"))
    ctx = F.split(F.lower(F.regexp_extract("uri", r"([^/]+/[^/]+)$", 1)),
                  "/")
    return agg.select("surface", "uri",
                      (F.lit(0.95) * F.col("cnt") / total).alias("prior"),
                      ctx.alias("ctx"))


def host_pagerank(spark: SparkSession, sf_dir: str,
                  iters: int = 10) -> DataFrame:
    """Driver query: fixed-point integer PageRank over the host graph.
    Value-checkable (frozen expectations) because the integer kernel
    is partitioning-independent; the node set is the crawl's hosts,
    so every row is checked, not a top-k."""
    from .dedup import _documents
    docs = _documents(spark, sf_dir).select(
        "doc_id", "text", "source")
    edges = host_graph(extract_links(_page_html(docs))).select(
        F.col("src_host").alias("src"), F.col("dst_host").alias("dst"))
    ranks = pagerank_int(edges, iters=iters)
    return (ranks.select(F.col("node").alias("host"), "rank")
            .orderBy(F.desc("rank"), F.asc("host")))


# --- DuckDB oracles: links re-derived from the md5 arithmetic, ---
# --- independent of the Spark-side regex extraction.           ---

_ORACLE_LINKS = """
WITH src AS (
  SELECT doc_id,
    'www' || CAST(doc_id % 7 AS VARCHAR) || '.' || source || '-site.'
      || CASE doc_id % 3 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
              ELSE 'net' END AS src_host
  FROM documents
),
ext0 AS (
  SELECT doc_id, src_host, k,
    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
         || CAST(k AS VARCHAR)), 1, 6) AS BIGINT) AS x,
    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
         || CAST(k AS VARCHAR)), 7, 6) AS BIGINT) AS y
  FROM src, (SELECT unnest([1, 2, 3]) AS k)
),
ext AS (
  SELECT doc_id, src_host, CAST(k + 1 AS BIGINT) AS link_no,
    'topic-' || CAST((x % 199) % 23 AS VARCHAR) AS anchor,
    'https://www' || CAST(least(x % 19, y % 19) AS VARCHAR)
      || '.hub-site.'
      || CASE (x % 199) % 3 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
              ELSE 'net' END
      || '/doc/' || CAST(x % 199 AS VARCHAR) AS dst_url,
    'www' || CAST(least(x % 19, y % 19) AS VARCHAR) || '.hub-site.'
      || CASE (x % 199) % 3 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
              ELSE 'net' END AS dst_host,
    FALSE AS internal
  FROM ext0
),
nav AS (
  SELECT doc_id, src_host, CAST(0 AS BIGINT) AS link_no,
         'Home' AS anchor, 'https://' || src_host || '/' AS dst_url,
         src_host AS dst_host, TRUE AS internal FROM src
  UNION ALL
  SELECT doc_id, src_host, CAST(1 AS BIGINT), 'About',
         'https://' || src_host || '/about', src_host, TRUE FROM src
),
links AS (SELECT * FROM nav UNION ALL SELECT * FROM ext)
"""

PAGE_LINKS_SQL = _ORACLE_LINKS + """
SELECT doc_id, link_no, anchor, dst_url, dst_host, internal
FROM links ORDER BY doc_id, link_no
"""

HOST_GRAPH_SQL = _ORACLE_LINKS + """
SELECT src_host, dst_host, count(*) AS n_links,
       count(DISTINCT doc_id) AS n_pages
FROM links WHERE NOT internal
GROUP BY 1, 2 ORDER BY 1, 2
"""

ANCHOR_PRIORS_SQL = _ORACLE_LINKS + """
, agg AS (
  SELECT anchor AS surface, dst_url, count(*) AS cnt
  FROM links WHERE NOT internal GROUP BY 1, 2
)
SELECT surface, dst_url, cnt,
       CAST((cnt * 1000000) // SUM(cnt) OVER (PARTITION BY surface)
            AS BIGINT) AS prior_ppm
FROM agg ORDER BY surface, dst_url
"""
