"""WARC ingest: the Common-Crawl container format in front of the
``pages`` table.

The north-star metric is scored "on Common-Crawl WARC sample"
(BASELINE.json) — at deployment the pages table is materialized FROM
crawl WARC files, so the engine needs a WARC reader, not just the
finished table. This module provides:

- a spec-correct WARC/1.0 response-record parser
  (``iter_warc_records``): CRLF-framed named headers, then exactly
  ``Content-Length`` bytes of HTTP block — length-driven slicing, so
  payloads containing the magic bytes can never split a record (the
  bug a naive ``split(b"WARC/1.0")`` reader has);
- a distributed reader (``read_warc_files``): one task per WARC file
  via ``binaryFile`` + an Arrow-batched ``mapInPandas`` running the
  parser. That layout IS Common Crawl's parallelism contract: a crawl
  segment is ~1 GB of per-record gzip members, whole-file assigned,
  so a 100 TB crawl is ~100k independent map tasks with no shuffle
  before extraction. Per-record gzip members (``.warc.gz``) are
  handled by multi-member decompression, exactly how CC ships them;
- a deterministic WARC synthesizer (``warc_shards`` /
  ``write_warc``): builds records from the pages derivation with
  JVM-side string expressions, so the DuckDB oracle can re-derive
  every (url, date, status, byte-count, payload-md5) the parser must
  recover — the round-trip driver query ``warc_read_pages`` checks
  the parser end-to-end against SQL that never touches WARC framing.

Reference tie-in: the reference consumes corpora through per-format
converter commands (SURVEY.md §2.1 S7 lists its 30+ converters); this
engine's single input contract is the pages table (input_hint), and
WARC is the one container that table arrives in at crawl scale.
"""

from __future__ import annotations

import gzip
import hashlib
import io
from datetime import datetime
from typing import Iterable, Iterator, Tuple

from pyspark.sql import DataFrame, SparkSession, functions as F

WARC_DATE_FMT = "%Y-%m-%dT%H:%M:%SZ"

# ---------------------------------------------------------------- build

_HTTP_HDR = ("HTTP/1.1 200 OK\r\nContent-Type: text/html; "
             "charset=utf-8\r\nContent-Length: ")


def warc_record_expr():
    """Spark string expression: one WARC/1.0 response record for a
    pages row (url, warc_ts, html). Pure Catalyst — the record bytes
    are deterministic, byte-lengths computed with octet_length so
    multi-byte text frames correctly."""
    html = F.decode("html", "UTF-8")
    http_block = F.concat(F.lit(_HTTP_HDR),
                          F.octet_length("html").cast("string"),
                          F.lit("\r\n\r\n"), html)
    return F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: "
              "<urn:pikes:"),
        F.col("url"),
        F.lit(">\r\nWARC-Date: "),
        F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss'Z'"),
        F.lit("\r\nWARC-Target-URI: "),
        F.col("url"),
        F.lit("\r\nContent-Type: application/http; msgtype=response"
              "\r\nContent-Length: "),
        F.octet_length(http_block).cast("string"),
        F.lit("\r\n\r\n"),
        http_block,
        F.lit("\r\n\r\n"))


def warc_shards(pages: DataFrame, n_shards: int = 8) -> DataFrame:
    """(shard, warc): pages assembled into n_shards WARC streams,
    records sorted by url within a shard so the bytes are
    deterministic under any partitioning. The groupBy here is test
    scaffolding (the sandbox has no crawl files); at deployment the
    crawler writes the shards and only the READER below runs."""
    rec = warc_record_expr().alias("rec")
    return (pages
            .select(F.pmod(F.xxhash64("url"), F.lit(n_shards))
                    .cast("bigint").alias("shard"),
                    F.struct(F.col("url"), rec).alias("u_rec"))
            .groupBy("shard")
            .agg(F.encode(
                F.array_join(
                    F.transform(F.sort_array(F.collect_list("u_rec")),
                                lambda s: s["rec"]), ""),
                "UTF-8").alias("warc")))


# ---------------------------------------------------------------- parse


def iter_warc_records(buf: bytes) -> Iterator[Tuple[dict, int, bytes]]:
    """Yield (warc_headers, http_status, payload) per record.

    Length-driven: after the named headers, exactly Content-Length
    bytes form the HTTP block; the HTTP payload is the block after
    its own header/body split. Tolerates leading/trailing record
    separators (CRLF CRLF) per WARC §4."""
    pos, n = 0, len(buf)
    while pos < n:
        if buf.startswith(b"\r\n", pos):
            pos += 2
            continue
        hdr_end = buf.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break
        lines = buf[pos:hdr_end].split(b"\r\n")
        if lines[0].strip() != b"WARC/1.0":
            raise ValueError(f"bad WARC version line: {lines[0]!r}")
        headers = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(b":")
            headers[k.strip().lower().decode("ascii")] = v.strip().decode(
                "utf-8", "replace")
        clen = int(headers["content-length"])
        block = buf[hdr_end + 4:hdr_end + 4 + clen]
        pos = hdr_end + 4 + clen
        status = 0
        payload = b""
        if headers.get("warc-type") == "response":
            he = block.find(b"\r\n\r\n")
            status_line = block[:he].split(b"\r\n", 1)[0]
            status = int(status_line.split()[1])
            payload = block[he + 4:]
        yield headers, status, payload


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a stream of concatenated gzip members (the CC
    .warc.gz layout: one member per record)."""
    out = io.BytesIO()
    with gzip.GzipFile(fileobj=io.BytesIO(data)) as g:
        # gzip module consumes successive members transparently
        while True:
            chunk = g.read(1 << 20)
            if not chunk:
                break
            out.write(chunk)
    return out.getvalue()


_PARSED_SCHEMA = ("url string, warc_date_s string, status bigint, "
                  "n_bytes bigint, html_md5 string")


def _parse_partition(frames, raw_col: str, gz_col: str | None):
    import pandas as pd
    for pdf in frames:
        rows = []
        for _, r in pdf.iterrows():
            data = bytes(r[raw_col])
            if gz_col is not None and str(r[gz_col]).endswith(".gz"):
                data = _gunzip_members(data)
            for headers, status, payload in iter_warc_records(data):
                rows.append((
                    headers["warc-target-uri"],
                    headers["warc-date"],
                    status,
                    len(payload),
                    hashlib.md5(payload).hexdigest()))
        yield pd.DataFrame(rows, columns=[
            "url", "warc_date_s", "status", "n_bytes", "html_md5"])


def parse_warc_df(shards: DataFrame, raw_col: str = "warc",
                  path_col: str | None = None) -> DataFrame:
    """Arrow-batched record parse of a (…, raw_col binary) frame."""
    return shards.mapInPandas(
        lambda it: _parse_partition(it, raw_col, path_col),
        schema=_PARSED_SCHEMA)


def read_warc_files(spark: SparkSession, path_glob: str) -> DataFrame:
    """Deployment reader: whole-file tasks over .warc / .warc.gz
    (binaryFile keeps one file per task — CC's unit of parallelism),
    parsed by the shared record iterator."""
    files = spark.read.format("binaryFile").load(path_glob).select(
        "path", "content")
    return parse_warc_df(files, raw_col="content", path_col="path")


def write_warc(records: Iterable[Tuple[str, datetime, bytes]],
               path: str, gz: bool = False) -> None:
    """Test scaffolding: write (url, ts, html) tuples as a WARC file,
    optionally as per-record gzip members (the CC layout)."""
    with open(path, "wb") as f:
        for url, ts, html in records:
            http = (_HTTP_HDR.encode() + str(len(html)).encode()
                    + b"\r\n\r\n" + html)
            rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
                   b"WARC-Record-ID: <urn:pikes:" + url.encode() + b">\r\n"
                   b"WARC-Date: " + ts.strftime(WARC_DATE_FMT).encode()
                   + b"\r\nWARC-Target-URI: " + url.encode() + b"\r\n"
                   b"Content-Type: application/http; msgtype=response\r\n"
                   b"Content-Length: " + str(len(http)).encode()
                   + b"\r\n\r\n" + http + b"\r\n\r\n")
            f.write(gzip.compress(rec) if gz else rec)


# ---------------------------------------------------------------- query


def warc_read_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: pages -> deterministic WARC shards -> parse back.
    The oracle re-derives (url, date, status, n_bytes, html_md5) from
    the pages SQL derivation WITHOUT any WARC framing, so the round
    trip checks the builder AND the parser."""
    from .pages import pages_from_documents
    pages = pages_from_documents(spark, sf_dir)
    return parse_warc_df(warc_shards(pages))
