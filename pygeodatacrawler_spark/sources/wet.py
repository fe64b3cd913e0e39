"""WET sink/source: extracted-text archives, the Common-Crawl output
side of the WARC story.

Common Crawl publishes three artifact families per crawl: WARC (raw
responses — read by sources/warc.py), WAT (metadata JSON), and WET
(extracted plain text as ``WARC-Type: conversion`` records). A
training-data pipeline built on this engine consumes WARC and should
be able to EMIT WET, so a downstream consumer sees the exact layout
Common Crawl ships (the reference's export sink analog for the
web-deployment path — geodatacrawler/utils.py writes per-record
sidecar files; here one archive per partition, the scale-correct
unit).

Spark-first sink discipline:

- ``write_wet`` is a distributed sink, not a driver loop: each input
  partition renders its rows into ONE ``part-NNNNN.warc.wet[.gz]``
  member-gzip archive inside a ``mapInPandas`` task and yields a
  manifest row (path, n_records, n_bytes). The driver only collects
  the manifest (O(#partitions), never O(rows)).
- Writes are atomic per file (temp name + ``os.replace``) so a
  re-run/killed task never leaves a half archive — the same
  torn-write discipline as the snapshot tables.
- ``.gz`` output is CONCATENATED per-record gzip members (ISO 28500
  annex, the layout Common Crawl uses), so the archives this sink
  writes are splittable at record granularity by any compliant
  reader, including sources/warc.py's member walk.
- ``read_wet`` reuses the WARC parser with conversion-record
  semantics: payload IS the text (no HTTP envelope).

At 100 TB: the sink inherits the input's partitioning — repartition
upstream to the archive size you want (Common Crawl targets ~150 MB
per WET archive); there is no shuffle in the sink itself.
"""

from __future__ import annotations

import gzip
import os

from pyspark.sql import DataFrame, SparkSession

WET_MANIFEST_SCHEMA = "path string, n_records long, n_bytes long"
WET_SCHEMA = "url string, warc_ts timestamp, text string"

_SOFTWARE = "pygeodatacrawler-spark-wet/1.0"


def _render_wet_record(url: str, ts_iso: str, text_utf8: bytes) -> bytes:
    """One WARC-Type: conversion record, byte layout per ISO 28500
    (header block, CRLF CRLF, payload, CRLF CRLF)."""
    hdr = (
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {ts_iso}\r\n"
        "Content-Type: text/plain\r\n"
        f"Content-Length: {len(text_utf8)}\r\n\r\n"
    ).encode()
    return hdr + text_utf8 + b"\r\n\r\n"


def write_wet(
    df: DataFrame,
    out_dir: str,
    gzip_members: bool = True,
) -> list[dict]:
    """Write (url, warc_ts, text) rows as WET archives, one per input
    partition; returns the manifest (path, n_records, n_bytes per
    archive). The single collect is the sink's one action and is
    O(#partitions)."""
    import pandas as pd
    from pyspark import TaskContext

    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.wet.gz" if gzip_members else ".warc.wet"
    cols = df.select("url", "warc_ts", "text")

    def _write(pdf_iter):
        ctx = TaskContext.get()
        pid = ctx.partitionId()
        final = os.path.join(out_dir, f"part-{pid:05d}{ext}")
        # attempt number in the tmp name (round-6 advice fix): with
        # speculation or a zombie first attempt, two attempts of the
        # same partition would otherwise interleave writes into one
        # tmp file and os.replace would publish a corrupt archive;
        # per-attempt tmp + atomic rename keeps last-publisher-wins
        tmp = f"{final}.inprogress.{ctx.taskAttemptId()}"
        n = 0
        with open(tmp, "wb") as f:
            for pdf in pdf_iter:
                chunks = []
                for url, ts, text in zip(
                    pdf["url"], pdf["warc_ts"], pdf["text"]
                ):
                    ts_iso = (
                        pd.Timestamp(ts).strftime("%Y-%m-%dT%H:%M:%SZ")
                        if ts is not None and not pd.isna(ts)
                        else "1970-01-01T00:00:00Z"
                    )
                    rec = _render_wet_record(
                        str(url), ts_iso, str(text or "").encode("utf-8")
                    )
                    chunks.append(
                        gzip.compress(rec, mtime=0) if gzip_members else rec
                    )
                    n += 1
                f.write(b"".join(chunks))
        if n == 0:
            os.unlink(tmp)  # empty partition -> no archive
            return
        os.replace(tmp, final)
        yield pd.DataFrame(
            {
                "path": [final],
                "n_records": [n],
                "n_bytes": [os.path.getsize(final)],
            }
        )

    manifest = cols.mapInPandas(_write, schema=WET_MANIFEST_SCHEMA)
    return [r.asDict() for r in manifest.collect()]


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """Directory/glob of .warc.wet / .warc.wet.gz -> DataFrame
    (url, warc_ts, text). Same binaryFile-per-archive parallelism as
    read_warc; conversion-record payloads decode as UTF-8 text."""
    import pandas as pd

    from pygeodatacrawler_spark.sources.warc import (
        _gzip_members,
        iter_warc_conversions,
    )

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
                        rows.extend(iter_warc_conversions(member))
                else:
                    rows.extend(iter_warc_conversions(data))
                if rows:
                    yield pd.DataFrame(
                        rows, columns=["url", "warc_ts", "text"]
                    )

    return files.mapInPandas(_parse, schema=WET_SCHEMA)


WAT_SCHEMA = "url string, warc_ts timestamp, payload string"


def write_wat(
    df: DataFrame,
    out_dir: str,
    gzip_members: bool = True,
) -> list[dict]:
    """WAT sink — Common Crawl's third artifact: per-page metadata as
    ``WARC-Type: metadata`` records with a JSON payload. Columns
    beyond (url, warc_ts) are serialized JVM-side with ``to_json``
    (links arrays, status, lang — whatever the caller selected), so
    the Python task only wraps bytes in WARC headers; same
    one-archive-per-partition / atomic-rename / manifest discipline
    as write_wet."""
    import pandas as pd
    from pyspark import TaskContext
    from pyspark.sql import functions as F

    meta_cols = [
        c for c in df.columns if c not in ("url", "warc_ts")
    ]
    payload = df.select(
        "url",
        "warc_ts",
        F.to_json(F.struct(*meta_cols)).alias("_json"),
    )
    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.wat.gz" if gzip_members else ".warc.wat"

    def _write(pdf_iter):
        ctx = TaskContext.get()
        pid = ctx.partitionId()
        final = os.path.join(out_dir, f"part-{pid:05d}{ext}")
        # attempt number in the tmp name (round-6 advice fix): with
        # speculation or a zombie first attempt, two attempts of the
        # same partition would otherwise interleave writes into one
        # tmp file and os.replace would publish a corrupt archive;
        # per-attempt tmp + atomic rename keeps last-publisher-wins
        tmp = f"{final}.inprogress.{ctx.taskAttemptId()}"
        n = 0
        with open(tmp, "wb") as f:
            for pdf in pdf_iter:
                chunks = []
                for url, ts, js in zip(
                    pdf["url"], pdf["warc_ts"], pdf["_json"]
                ):
                    ts_iso = (
                        pd.Timestamp(ts).strftime("%Y-%m-%dT%H:%M:%SZ")
                        if ts is not None and not pd.isna(ts)
                        else "1970-01-01T00:00:00Z"
                    )
                    body = str(js).encode("utf-8")
                    hdr = (
                        "WARC/1.0\r\n"
                        "WARC-Type: metadata\r\n"
                        f"WARC-Target-URI: {url}\r\n"
                        f"WARC-Date: {ts_iso}\r\n"
                        "Content-Type: application/json\r\n"
                        f"Content-Length: {len(body)}\r\n\r\n"
                    ).encode()
                    rec = hdr + body + b"\r\n\r\n"
                    chunks.append(
                        gzip.compress(rec, mtime=0) if gzip_members else rec
                    )
                    n += 1
                f.write(b"".join(chunks))
        if n == 0:
            os.unlink(tmp)
            return
        os.replace(tmp, final)
        yield pd.DataFrame(
            {
                "path": [final],
                "n_records": [n],
                "n_bytes": [os.path.getsize(final)],
            }
        )

    manifest = payload.mapInPandas(_write, schema=WET_MANIFEST_SCHEMA)
    return [r.asDict() for r in manifest.collect()]


def read_wat(spark: SparkSession, path: str) -> DataFrame:
    """.warc.wat[.gz] archives -> (url, warc_ts, payload) with payload
    the metadata JSON string (parse downstream with from_json and the
    schema you wrote it with)."""
    import pandas as pd

    from pygeodatacrawler_spark.sources.warc import (
        _gzip_members,
        iter_warc_typed,
    )

    files = (
        spark.read.format("binaryFile").load(path).select("path", "content")
    )

    def _parse(pdf_iter):
        for pdf in pdf_iter:
            for content in pdf["content"]:
                data = bytes(content)
                rows = []
                if data[:2] == b"\x1f\x8b":
                    for member in _gzip_members(data):
                        rows.extend(iter_warc_typed(member, "metadata"))
                else:
                    rows.extend(iter_warc_typed(data, "metadata"))
                if rows:
                    yield pd.DataFrame(
                        rows, columns=["url", "warc_ts", "payload"]
                    )

    return files.mapInPandas(_parse, schema=WAT_SCHEMA)
