"""Hyperlink extraction + link graph (operators/weblinks): real
regex extraction vs the independent arithmetic oracle, host-graph /
anchor-prior semantics, the EL-dictionary bridge, and host PageRank
sanity."""

import duckdb

from pyspark.sql import functions as F

from pikes_spark.operators import weblinks

SF = "/root/testdata/sf0.001"


def _oracle(sql):
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    return con.sql(sql).fetchall()


def test_extract_links_handcrafted(spark):
    html = ('<html><body><nav><a href="/">Home</a></nav>'
            '<p>a &lt;a href=&quot;x&quot;&gt; decoy</p>'
            '<a href="https://other.example/page">Other Page</a>'
            '</body></html>')
    df = spark.createDataFrame([(7, "me.example", html)],
                               "doc_id long, src_host string, html string")
    rows = {r["link_no"]: r for r in weblinks.extract_links(df).collect()}
    assert len(rows) == 2  # escaped decoy text is NOT an anchor
    assert rows[0]["anchor"] == "Home"
    assert rows[0]["internal"] is True
    assert rows[0]["dst_url"] == "https://me.example/"
    assert rows[0]["dst_host"] == "me.example"
    assert rows[1]["anchor"] == "Other Page"
    assert rows[1]["internal"] is False
    assert rows[1]["dst_host"] == "other.example"


def _rowset(df):
    return sorted(tuple(r) for r in df.collect())


def test_page_links_matches_independent_oracle(spark):
    """The regex-extraction path must equal the arithmetic derivation
    (two independent implementations of the same contract)."""
    got = _rowset(weblinks.page_links(spark, SF))
    exp = sorted(tuple(r) for r in _oracle(weblinks.PAGE_LINKS_SQL))
    assert got == exp
    # every page yields exactly 2 nav + 3 external links
    n_docs = len({t[0] for t in got})
    assert len(got) == 5 * n_docs


def test_host_graph_matches_oracle(spark):
    got = _rowset(weblinks.host_graph_rel(spark, SF))
    exp = sorted(tuple(r) for r in _oracle(weblinks.HOST_GRAPH_SQL))
    assert got == exp
    # boilerplate nav links never reach the graph
    assert all("-site." in s and "hub-site." in d for s, d, _n, _p in got)


def test_anchor_priors_matches_oracle(spark):
    got = _rowset(weblinks.anchor_priors_rel(spark, SF))
    exp = sorted(tuple(r) for r in _oracle(weblinks.ANCHOR_PRIORS_SQL))
    assert got == exp
    # ppm priors per surface sum to <= 1e6, short by at most one ppm
    # per target row (integer floor division)
    from collections import defaultdict
    sums = defaultdict(int)
    n_rows = defaultdict(int)
    for surface, _u, _c, ppm in got:
        sums[surface] += ppm
        n_rows[surface] += 1
    assert all(1e6 - n_rows[s] <= v <= 1e6 for s, v in sums.items())


def test_anchor_candidates_el_contract(spark):
    """The crawl-derived dictionary matches candidates_df's shape and
    normalization so linking can consume it directly."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text", "source")
    links = weblinks.extract_links(weblinks._page_html(docs))
    cand = weblinks.anchor_candidates(links)
    assert [f.name for f in cand.schema.fields] == \
        ["surface", "uri", "prior", "ctx"]
    rows = cand.collect()
    assert rows and all(0 < r["prior"] <= 0.95 for r in rows)
    by_surface = {}
    for r in rows:
        by_surface.setdefault(r["surface"], 0.0)
        by_surface[r["surface"]] += r["prior"]
    for total in by_surface.values():
        assert abs(total - 0.95) < 1e-9
    # the candidate frame joins against mentions exactly like the
    # shipped dictionary (same column contract as linking.candidates_df)
    from pikes_spark.operators.linking import candidates_df
    base = candidates_df(spark)
    assert [f.name for f in base.schema.fields] == \
        [f.name for f in cand.schema.fields]
    assert base.unionByName(cand).count() == base.count() + cand.count()


def test_host_pagerank_mass_and_determinism(spark):
    ranks = weblinks.host_pagerank(spark, SF, iters=4)
    rows = ranks.collect()
    assert rows and all(r["rank"] > 0 for r in rows)
    hosts = [r["host"] for r in rows]
    # hub hosts receive links from many sites -> they outrank leaves;
    # the skewed least(x,y) derivation makes low hub ids hottest
    top = hosts[0]
    assert "hub-site." in top
    # bit-determinism across partitionings (the property that makes
    # the frozen-value oracle possible)
    again = weblinks.host_pagerank(spark, SF, iters=4)
    assert [tuple(r) for r in rows] == [tuple(r) for r in again.collect()]
