"""WARC container source (sources/warc): spec framing, gzip-member
handling, file reader, and the build->parse round trip."""

import gzip
from datetime import datetime

from pikes_spark.sources import warc

TS = datetime(2026, 1, 1, 0, 0, 0)


def _mk(url="http://e/1", html=b"<html>x</html>"):
    return (url, TS, html)


def test_parser_length_driven_framing(tmp_path):
    # payload contains the record magic — a split-based reader breaks,
    # a Content-Length-driven one must not
    evil = b"<html>WARC/1.0\r\n\r\nnot a record</html>"
    p = tmp_path / "a.warc"
    warc.write_warc([_mk(html=evil), _mk(url="http://e/2")], str(p))
    recs = list(warc.iter_warc_records(p.read_bytes()))
    assert len(recs) == 2
    headers, status, payload = recs[0]
    assert headers["warc-target-uri"] == "http://e/1"
    assert headers["warc-date"] == "2026-01-01T00:00:00Z"
    assert status == 200
    assert payload == evil


def test_parser_gzip_members(tmp_path):
    p = tmp_path / "a.warc.gz"
    warc.write_warc([_mk(), _mk(url="http://e/2")], str(p), gz=True)
    raw = p.read_bytes()
    # really two gzip members, not one stream
    assert raw.count(b"\x1f\x8b\x08") >= 2
    recs = list(warc.iter_warc_records(warc._gunzip_members(raw)))
    assert [h["warc-target-uri"] for h, _s, _p in recs] == \
        ["http://e/1", "http://e/2"]


def test_read_warc_files_plain_and_gz(spark, tmp_path):
    warc.write_warc([_mk(), _mk(url="http://e/2")],
                    str(tmp_path / "s1.warc"))
    warc.write_warc([_mk(url="http://e/3", html="<p>é</p>".encode())],
                    str(tmp_path / "s2.warc.gz"), gz=True)
    got = warc.read_warc_files(spark, str(tmp_path) + "/*").collect()
    by_url = {r["url"]: r for r in got}
    assert set(by_url) == {"http://e/1", "http://e/2", "http://e/3"}
    assert by_url["http://e/3"]["n_bytes"] == len("<p>é</p>".encode())
    assert all(r["status"] == 200 for r in got)


def test_round_trip_matches_pages(spark):
    """warc_read_pages recovers exactly one record per page with the
    page's own url/ts/byte-count (the oracle re-checks md5 at the
    driver; here we assert the join back to the pages table)."""
    from pikes_spark.sources.pages import pages_from_documents
    from pyspark.sql import functions as F
    sf = "/root/testdata/sf0.001"
    parsed = warc.warc_read_pages(spark, sf)
    pages = pages_from_documents(spark, sf).select(
        "url", F.octet_length("html").alias("exp_bytes"),
        F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss'Z'")
        .alias("exp_date"))
    joined = parsed.join(pages, "url", "full_outer")
    bad = joined.filter(
        (F.col("n_bytes") != F.col("exp_bytes"))
        | (F.col("warc_date_s") != F.col("exp_date"))
        | F.col("n_bytes").isNull() | F.col("exp_bytes").isNull())
    assert bad.count() == 0
    assert parsed.count() == pages.count()
