"""Web-URL hygiene operators (operators/weburl): parse /
canonicalize / domain rollup semantics and plan shape."""

import duckdb
import pytest

from pikes_spark.operators import weburl

SF = "/root/testdata/sf0.001"


def _oracle(sql):
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    return con.sql(sql).fetchall()


def test_synth_matches_duckdb(spark):
    got = {r["doc_id"]: r["url"]
           for r in weburl.synth_urls(spark, SF).collect()}
    exp = dict(_oracle(weburl.synth_urls_sql()))
    assert got == exp
    # the synthesis actually exercises every canonicalization case
    urls = list(got.values())
    assert any("#" in u for u in urls)
    assert any(":443" in u for u in urls)
    assert any("utm_source" in u for u in urls)
    assert any("&ref=" in u for u in urls)
    assert any(u.split("?")[0].endswith("/") for u in urls if "?" in u)


def test_canonicalize_cases(spark):
    rows = {r["url"]: r["canon_url"]
            for r in weburl.url_canonicalize(spark, SF).collect()}
    for url, canon in rows.items():
        assert "#" not in canon
        assert ":443" not in canon
        assert "utm_" not in canon and "ref=" not in canon and \
            "fbclid" not in canon
        assert not canon.endswith("?") and not canon.endswith("&")
        # no trailing slash on a non-root path
        assert not (canon.endswith("/") and canon.count("/") > 3)
        # the id= payload parameter survives stripping
        if "id=" in url:
            assert "id=" in canon


def test_parse_fields(spark):
    rows = weburl.url_parse(spark, SF).collect()
    for r in rows:
        assert r["host"].startswith("www")
        assert ":" not in r["host"]
        assert r["domain"].endswith(("-site.com", "-site.org", "-site.net"))
        assert 0 <= r["path_depth"] <= 4  # 3 segments + optional trailing /
        assert 0 <= r["n_params"] <= 2


def test_domain_stats_consistency(spark):
    stats = weburl.domain_stats(spark, SF).collect()
    assert len(stats) > 3  # per-source registrable domains, not one blob
    n_docs = weburl.synth_urls(spark, SF).count()
    assert sum(r["n_pages"] for r in stats) == n_docs
    for r in stats:
        assert r["total_chars"] >= r["n_pages"]  # every doc non-empty


def test_corpus_filter_semantics(spark):
    rows = weburl.corpus_filter(spark, SF).collect()
    assert len(rows) == 500
    # every signal fires on this corpus (thresholds were calibrated so
    # none of the flags is dead weight)
    for flag in ("too_short", "low_stopword", "odd_tok_len", "weak_domain"):
        assert any(r[flag] for r in rows), f"{flag} never fires"
    assert any(r["keep"] for r in rows)
    for r in rows:
        assert r["keep"] == (not (r["too_short"] or r["low_stopword"]
                                  or r["odd_tok_len"] or r["weak_domain"]))
        assert r["too_short"] == (r["n_chars"] < 200)


def test_corpus_filter_matches_duckdb(spark):
    got = sorted(tuple(r) for r in weburl.corpus_filter(spark, SF).collect())
    exp = sorted(tuple(r) for r in _oracle(weburl.CORPUS_FILTER_SQL))
    assert got == exp


def test_corpus_filter_plan(spark):
    # domain-level weakness joins as a broadcast of the small rollup —
    # the per-page side must not shuffle for it
    plan = (weburl.corpus_filter(spark, SF)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "EvalPython" not in plan and "PythonUDF" not in plan


def test_plan_stays_jvm_side(spark):
    # the whole parse/canonicalize path must be Catalyst expressions:
    # no Python UDF (BatchEvalPython / ArrowEvalPython) in the plan
    for df in (weburl.url_parse(spark, SF),
               weburl.url_canonicalize(spark, SF),
               weburl.domain_stats(spark, SF)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan
        assert "PythonUDF" not in plan


def test_url_dedup_groups(spark):
    got = weburl.url_dedup_groups(spark, SF).collect()
    assert got, "canonicalization must produce collision groups"
    for r in got:
        assert r["group_size"] >= 2
        assert r["rep_doc_id"] <= r["doc_id"]
    # parity with the DuckDB formulation
    exp = sorted(tuple(r) for r in _oracle(weburl.url_dedup_sql()))
    assert sorted(tuple(r) for r in got) == exp
    # group members really canonicalize to the same URL
    import collections
    by_rep = collections.defaultdict(set)
    for r in got:
        by_rep[r["rep_doc_id"]].add(r["canon_url"])
    assert all(len(v) == 1 for v in by_rep.values())
