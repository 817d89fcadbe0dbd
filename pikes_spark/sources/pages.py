"""The ``pages`` source table (url, warc_ts, html, text, lang).

The driver input_hint fixes this shape (Common-Crawl-style web pages
in an Iceberg table). In this sandbox we synthesize it
DETERMINISTICALLY from the driver-generated ``documents`` parquet:
every transformation below is expressible in both Spark and ANSI SQL,
so DuckDB oracles can re-derive the exact same pages — which is what
makes the byte-identical text-extraction invariant checkable.

Mapping (documents -> pages):
    url     = 'http://example.org/doc/' || doc_id
    warc_ts = TIMESTAMP '2026-01-01 00:00:00' + doc_id seconds
    html    = utf-8 bytes of deterministic boilerplate wrap of text
              (same wrap as functions.htmltext.wrap_html)
    text    = documents.text  (the extraction oracle)
    lang    = documents.lang

At deployment the table is a real Iceberg ``pages`` table; everything
downstream consumes the same 5-column contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.htmltext import _FOOTER, _NAV

_PRE_BODY = ("<!DOCTYPE html><html><head><title></title>"
             "<style>body{margin:0}</style></head><body>"
             + _NAV + "<main><article><p>")
_POST_BODY = ("</p></article></main>" + _FOOTER
              + "<script>var x=1;</script></body></html>")


def _escaped(col):
    return F.replace(F.replace(F.replace(col, F.lit("&"), F.lit("&amp;")),
                               F.lit("<"), F.lit("&lt;")),
                     F.lit(">"), F.lit("&gt;"))


def html_col(text_col):
    """Spark column: deterministic HTML wrap of text (binary).
    Matches functions.htmltext.wrap_html(text, title="") byte-for-byte."""
    body = F.replace(_escaped(text_col), F.lit("\n\n"), F.lit("</p><p>"))
    return F.encode(F.concat(F.lit(_PRE_BODY), body, F.lit(_POST_BODY)), "UTF-8")


def pages_from_documents(spark: SparkSession, sf_dir: str,
                         include_gold: bool = True) -> DataFrame:
    """documents parquet -> pages, plus the deterministic gold
    mini-corpus (sources.gold) so entity-bearing pages exist at every
    SF. Both halves use the same SQL-expressible derivation."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # the parquet is a single small file -> one scan task; without this
    # repartition the html synthesis (and everything pipelined onto the
    # scan) runs serially in that task. 2x parallelism gives scheduler
    # slack against uneven per-document cost downstream (annotate) —
    # this is the ONLY exchange the pages feed pays; callers must not
    # repartition again (the old pipeline re-exchange moved every html
    # payload a second time).
    docs = docs.repartition(
        2 * max(spark.sparkContext.defaultParallelism, 8))
    pages = docs.select(
        F.concat(F.lit("http://example.org/doc/"), F.col("doc_id").cast("string")).alias("url"),
        (F.to_timestamp(F.lit("2026-01-01 00:00:00"))
         + F.make_interval(secs=F.col("doc_id").cast("double"))).alias("warc_ts"),
        html_col(F.col("text")).alias("html"),
        F.col("text"),
        F.col("lang"),
    )
    if include_gold:
        from .gold import gold_pages_df
        pages = pages.unionByName(gold_pages_df(spark))
    return pages


def _pages_oracle_cte() -> str:
    from .gold import gold_union_sql
    return f"""
  SELECT 'http://example.org/doc/' || CAST(doc_id AS VARCHAR) AS url,
         TIMESTAMP '2026-01-01 00:00:00' + doc_id * INTERVAL 1 SECOND AS warc_ts,
         text, lang
  FROM documents
  UNION ALL
  {gold_union_sql()}
"""


# DuckDB-side equivalent of the pages derivation, as a CTE body; oracles
# embed this to compare against the Spark pipeline over the same rows.
PAGES_ORACLE_CTE = _pages_oracle_cte()
