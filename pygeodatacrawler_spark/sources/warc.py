"""WARC source: Common-Crawl-style web archives -> the engine's pages
table (url, warc_ts, html [, status, mime]).

The reference crawls live folders/URLs (geodatacrawler/metadata.py
crawl loop); the web-deployment analog of "a folder of files" is a
directory of WARC archives — the format Common Crawl publishes. This
reader is dependency-free (stdlib zlib + email-style header parse) and
Spark-first:

- one archive file = one parse task (``binaryFile`` source; WARC
  members are not splittable mid-stream, and Common Crawl sizes
  archives ~1 GB precisely so file-granularity is the unit of
  parallelism — 64k files for a crawl segment saturates any cluster);
- records stream out of the task as Arrow batches; the raw archive
  bytes die in the task that parsed them (same discipline as the
  fused fetch+extract stage);
- ``.warc.gz`` is handled as what it actually is: CONCATENATED gzip
  members, one per record (ISO 28500 annex; Common Crawl layout), so
  a member boundary is also a record boundary. Plain ``.warc`` and
  whole-file gzip both parse through the same member walk.

Total on malformed input: truncated members, bad Content-Length,
non-HTTP records, and chunked bodies all degrade to skipped records
or best-effort bytes, never exceptions — at 100 TB there WILL be
corrupt archives and one bad file must not kill the job.
"""

from __future__ import annotations

import zlib
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = (
    "url string, warc_ts timestamp, html binary, status int, mime string"
)

_CRLF2 = b"\r\n\r\n"


def _gzip_members(data: bytes):
    """Yield decompressed gzip members from concatenated-member data
    (the .warc.gz layout). Total: a truncated tail member yields what
    it had and stops."""
    pos = 0
    while pos < len(data) and data[pos : pos + 2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=31)
        try:
            out = d.decompress(data[pos:])
        except zlib.error:
            return
        yield out
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            return
        pos += consumed


def _parse_headers(block: bytes) -> dict:
    """Case-insensitive header dict from a CRLF header block (the
    first line — WARC/1.0 or HTTP status — is kept under '')."""
    headers: dict[str, str] = {}
    lines = block.split(b"\r\n")
    if lines:
        headers[""] = lines[0].decode("latin-1", "replace").strip()
    for ln in lines[1:]:
        if b":" in ln:
            k, _, v = ln.partition(b":")
            headers[k.decode("latin-1", "replace").strip().lower()] = (
                v.decode("latin-1", "replace").strip()
            )
    return headers


def _dechunk(body: bytes) -> bytes:
    """Decode an HTTP chunked transfer encoding; best-effort on
    malformed chunks (returns what decoded so far)."""
    out, pos = [], 0
    while True:
        nl = body.find(b"\r\n", pos)
        if nl < 0:
            break
        try:
            size = int(body[pos:nl].split(b";")[0], 16)
        except ValueError:
            break
        if size == 0:
            break
        chunk = body[nl + 2 : nl + 2 + size]
        out.append(chunk)
        if len(chunk) < size:
            break
        pos = nl + 2 + size + 2
    return b"".join(out)


def _decompress_body(body: bytes) -> bytes:
    """Best-effort Content-Encoding decode (gzip / zlib / raw deflate
    — the three shapes real servers label 'gzip' or 'deflate'). A body
    that decodes to nothing or is not actually compressed passes
    through unchanged; truncated streams yield the bytes that did
    decode — at archive scale a mislabeled record must degrade, never
    raise."""
    for wbits in (47, -15):  # 47 = auto-detect zlib/gzip, -15 = raw
        d = zlib.decompressobj(wbits=wbits)
        try:
            out = d.decompress(body)
        except zlib.error:
            continue
        if out or not body:
            return out
    return body


def _warc_ts(value: str):
    try:
        return (
            datetime.fromisoformat(value.replace("Z", "+00:00"))
            .astimezone(timezone.utc)
            .replace(tzinfo=None)
        )
    except ValueError:
        return None


def _walk_records(data: bytes):
    """Total record walk shared by every WARC reader: yield
    (headers, payload) per record, tolerating stray separators, and
    stop cleanly on anything that breaks framing (no WARC/ magic,
    unterminated header block, unparsable Content-Length)."""
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate stray separators between records
        while pos < n and data[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if not data[pos : pos + 5] == b"WARC/":
            return
        hdr_end = data.find(_CRLF2, pos)
        if hdr_end < 0:
            return
        headers = _parse_headers(data[pos:hdr_end])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            return
        payload = data[hdr_end + 4 : hdr_end + 4 + length]
        pos = hdr_end + 4 + length
        yield headers, payload


def iter_warc_records(data: bytes):
    """Yield (url, warc_ts, html, status, mime) from one WARC stream's
    bytes (already decompressed). Only WARC-Type: response records
    with an HTTP payload yield rows; request/metadata/warcinfo records
    are skipped, exactly like Common Crawl consumers do."""
    for headers, payload in _walk_records(data):
        if headers.get("warc-type", "").lower() != "response":
            continue
        url = headers.get("warc-target-uri")
        ts = _warc_ts(headers.get("warc-date", ""))
        ctype = headers.get("content-type", "")
        if url is None:
            continue
        if "application/http" in ctype:
            http_end = payload.find(_CRLF2)
            if http_end < 0:
                continue
            http = _parse_headers(payload[:http_end])
            body = payload[http_end + 4 :]
            status_line = http.get("", "").split()
            try:
                status = int(status_line[1])
            except (IndexError, ValueError):
                status = None
            if "chunked" in http.get("transfer-encoding", "").lower():
                body = _dechunk(body)
            enc = http.get("content-encoding", "").lower()
            if "gzip" in enc or "deflate" in enc:
                body = _decompress_body(body)
            mime = http.get("content-type", "").split(";")[0].strip() or None
            yield (url, ts, body, status, mime)
        else:
            # resource record: payload IS the content
            yield (url, ts, payload, None, ctype.split(";")[0].strip() or None)


def iter_warc_typed(data: bytes, warc_type: str):
    """Yield (url, warc_ts, payload_text) from records of the given
    WARC-Type whose payload has no HTTP envelope — ``conversion``
    (WET extracted text) and ``metadata`` (WAT JSON). Rides the same
    ``_walk_records`` total walk; other record types are skipped."""
    for headers, payload in _walk_records(data):
        if headers.get("warc-type", "").lower() != warc_type:
            continue
        url = headers.get("warc-target-uri")
        if url is None:
            continue
        yield (
            url,
            _warc_ts(headers.get("warc-date", "")),
            payload.decode("utf-8", "replace"),
        )


def iter_warc_conversions(data: bytes):
    """WET layout: WARC-Type: conversion, payload IS the text."""
    return iter_warc_typed(data, "conversion")


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Directory (or glob) of .warc / .warc.gz -> DataFrame
    (url, warc_ts, html, status, mime).

    binaryFile scan (one row per archive) -> mapInPandas parse. The
    scan schema is pruned to (path, content); parallelism = number of
    archive files, the Common-Crawl unit of work.
    """
    import pandas as pd

    files = (
        spark.read.format("binaryFile")
        .load(path)
        .select("path", "content")
    )

    def _parse(pdf_iter):
        for pdf in pdf_iter:
            for content in pdf["content"]:
                data = bytes(content)
                rows = []
                if data[:2] == b"\x1f\x8b":
                    for member in _gzip_members(data):
                        rows.extend(iter_warc_records(member))
                else:
                    rows.extend(iter_warc_records(data))
                if rows:
                    yield pd.DataFrame(
                        rows,
                        columns=["url", "warc_ts", "html", "status", "mime"],
                    )

    return files.mapInPandas(_parse, schema=WARC_SCHEMA)


def warc_pages(spark: SparkSession, path: str) -> DataFrame:
    """WARC archives -> the north-rule input-table shape
    (url, warc_ts, html, text, lang): 2xx HTML responses, text
    extracted by the engine's vectorized extractor, lang by the
    n-gram identifier — ready to drop into CrawlEngine(pages=...)."""
    import pyspark.sql.functions as F

    from pygeodatacrawler_spark.functions.quality import lang_id
    from pygeodatacrawler_spark.functions.text import extract_text_udf

    ok = read_warc(spark, path).filter(
        (F.col("status") >= 200) & (F.col("status") < 300)
        & (F.coalesce(F.col("mime"), F.lit("text/html")) == "text/html")
    )
    return ok.select(
        "url",
        "warc_ts",
        "html",
        extract_text_udf(F.col("html")).alias("text"),
    ).withColumn("lang", lang_id(F.col("text")))


def write_warc_file(records, out_path: str, gzip_members: bool = False):
    """Test-fixture twin: write (url, ts_iso, status, mime, body) rows
    as a WARC file (optionally as concatenated per-record gzip members,
    the .warc.gz layout). Driver-side; exists so decode(encode(x))==x
    is assertable without external archives."""
    import gzip as _gzip

    chunks = []
    for url, ts_iso, status, mime, body in records:
        http = (
            f"HTTP/1.1 {status} X\r\nContent-Type: {mime}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode() + body
        rec = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {ts_iso}\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode() + http + b"\r\n\r\n"
        chunks.append(_gzip.compress(rec) if gzip_members else rec)
    with open(out_path, "wb") as f:
        f.write(b"".join(chunks))
