"""WARC source: Common-Crawl-style archives -> pages table.

The reference crawls live folders (geodatacrawler/metadata.py); the
web-tier input is a directory of WARC archives, so the reader is
tested by encode/decode roundtrip — plain and per-record-gzip layouts,
request-record skipping, chunked bodies, truncation totality."""

from __future__ import annotations

import os

import pytest

from pygeodatacrawler_spark.sources.warc import (
    iter_warc_records,
    read_warc,
    warc_pages,
    write_warc_file,
)

RECS = [
    ("http://a.example.org/", "2024-01-02T03:04:05Z", 200, "text/html",
     b"<html><head><title>T</title></head><body><p>hello world</p>"
     b"<a href='/next'>n</a></body></html>"),
    ("http://a.example.org/miss", "2024-01-02T03:04:06Z", 404, "text/html",
     b"<html>not found</html>"),
    ("http://b.example.org/img", "2024-01-02T03:04:07Z", 200, "image/png",
     b"\x89PNG fake bytes"),
]


def _write(tmp_path, gz: bool):
    name = "part-0.warc.gz" if gz else "part-0.warc"
    p = os.path.join(str(tmp_path), name)
    write_warc_file(RECS, p, gzip_members=gz)
    return str(tmp_path)


@pytest.mark.parametrize("gz", [False, True])
def test_warc_roundtrip(spark, tmp_path, gz):
    d = _write(tmp_path, gz)
    rows = {r["url"]: r for r in read_warc(spark, d).collect()}
    assert set(rows) == {u for u, *_ in RECS}
    a = rows["http://a.example.org/"]
    assert bytes(a["html"]) == RECS[0][4]          # byte-identical body
    assert a["status"] == 200 and a["mime"] == "text/html"
    assert a["warc_ts"].isoformat().startswith("2024-01-02T03:04:05")
    assert rows["http://a.example.org/miss"]["status"] == 404
    assert rows["http://b.example.org/img"]["mime"] == "image/png"


def test_warc_pages_shape(spark, tmp_path):
    """warc_pages yields the north-rule input shape: 2xx text/html
    only, text extracted, lang attached."""
    d = _write(tmp_path, True)
    out = warc_pages(spark, d)
    assert out.columns == ["url", "warc_ts", "html", "text", "lang"]
    rows = out.collect()
    assert [r["url"] for r in rows] == ["http://a.example.org/"]
    assert "hello world" in rows[0]["text"]


def test_warc_parser_totality():
    """Request records skipped; chunked bodies de-chunked; truncated
    archives yield the records they had — never raise."""
    body = b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" \
           b"5\r\nhello\r\n6\r\n world\r\n0\r\n\r\n"
    req = (
        b"WARC/1.0\r\nWARC-Type: request\r\n"
        b"WARC-Target-URI: http://x/\r\n"
        b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        b"Content-Type: application/http; msgtype=request\r\n"
        b"Content-Length: 4\r\n\r\nGET \r\n\r\n"
    )
    resp = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: http://x/chunked\r\n"
        b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        b"Content-Type: application/http; msgtype=response\r\n"
        + f"Content-Length: {len(body)}\r\n\r\n".encode() + body + b"\r\n\r\n"
    )
    rows = list(iter_warc_records(req + resp))
    assert len(rows) == 1
    url, ts, html, status, mime = rows[0]
    assert url == "http://x/chunked" and html == b"hello world"
    # truncation at every byte offset: total, never raises
    blob = req + resp
    for cut in range(0, len(blob), 37):
        list(iter_warc_records(blob[:cut]))


def test_warc_drives_crawl_engine(spark, tmp_path):
    """WARC archive as the page store: seed -> follow links -> all
    linked pages visited, text byte-identical to the archive body's
    extraction."""
    import tempfile

    from pygeodatacrawler_spark.plans.crawl import CrawlEngine

    linked = [
        ("http://w.example.org/", "2024-05-01T00:00:00Z", 200, "text/html",
         b"<html><body>root <a href='/a'>a</a> <a href='/b'>b</a></body></html>"),
        ("http://w.example.org/a", "2024-05-01T00:00:01Z", 200, "text/html",
         b"<html><body>page a <a href='/b'>b</a></body></html>"),
        ("http://w.example.org/b", "2024-05-01T00:00:02Z", 200, "text/html",
         b"<html><body>leaf b</body></html>"),
    ]
    arc = os.path.join(str(tmp_path), "crawl.warc.gz")
    write_warc_file(linked, arc, gzip_members=True)
    pages = warc_pages(spark, str(tmp_path))

    eng = CrawlEngine(spark, tempfile.mkdtemp(), pages, robots=None,
                      host_budget=10)
    eng.init_from_seeds(
        spark.createDataFrame([("http://w.example.org/", 0)],
                              "url string, depth int")
    )
    eng.run(max_rounds=5)
    got = {
        r["canon_url"]: r["depth"]
        for r in eng.visits_view().select("canon_url", "depth").collect()
    }
    assert got == {
        "http://w.example.org/": 0,
        "http://w.example.org/a": 1,
        "http://w.example.org/b": 1,
    }


def test_warc_content_encoding_bodies():
    """HTTP payloads labeled Content-Encoding gzip/deflate decode to
    the original bytes (Common Crawl stores raw HTTP, compressed
    bodies included); a mislabeled uncompressed body passes through."""
    import gzip as _gzip
    import zlib as _zlib

    def rec(url, enc, body):
        http = (
            f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            f"Content-Encoding: {enc}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode() + body
        return (
            "WARC/1.0\r\nWARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\n"
            "WARC-Date: 2024-01-02T03:04:05Z\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode() + http + b"\r\n\r\n"

    plain = b"<html><body>compressed page</body></html>"
    data = (
        rec("http://g.org/", "gzip", _gzip.compress(plain))
        + rec("http://z.org/", "deflate", _zlib.compress(plain))
        + rec("http://r.org/", "deflate", _zlib.compress(plain)[2:-4])
        + rec("http://lie.org/", "gzip", plain)  # mislabeled
    )
    got = {r[0]: r[2] for r in iter_warc_records(data)}
    assert got["http://g.org/"] == plain
    assert got["http://z.org/"] == plain
    assert got["http://r.org/"] == plain  # raw-deflate fallback
    assert got["http://lie.org/"] == plain  # passthrough, no raise
