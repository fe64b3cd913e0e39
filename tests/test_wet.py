"""WET sink/source: extracted-text archives (WARC-Type: conversion).

The engine consumes Common-Crawl WARC (sources/warc.py) and must be
able to EMIT the matching WET layout — one member-gzip archive per
partition, written executor-side with an O(#partitions) manifest.
Checked by write->read roundtrip (both layouts), unicode payload
byte-identity, empty-partition elision, and the full WARC -> extract
-> WET -> read_wet pipeline."""

from __future__ import annotations

import glob
import gzip
import os
from datetime import datetime

import pytest

from pygeodatacrawler_spark.sources.warc import (
    iter_warc_conversions,
    write_warc_file,
)
from pygeodatacrawler_spark.sources.wet import read_wet, write_wet

ROWS = [
    ("http://a.example.org/", datetime(2024, 1, 2, 3, 4, 5),
     "hello world\nsecond line"),
    ("http://a.example.org/unicode", datetime(2024, 1, 2, 3, 4, 6),
     "café — naïve 你好"),
    ("http://b.example.org/empty", datetime(2024, 1, 2, 3, 4, 7), ""),
]


@pytest.mark.parametrize("gz", [False, True])
def test_wet_roundtrip(spark, tmp_path, gz):
    df = spark.createDataFrame(ROWS, "url string, warc_ts timestamp, text string")
    out = os.path.join(str(tmp_path), "wet")
    manifest = write_wet(df.repartition(2), out, gzip_members=gz)
    assert sum(m["n_records"] for m in manifest) == len(ROWS)
    for m in manifest:
        assert os.path.getsize(m["path"]) == m["n_bytes"]
        assert not m["path"].endswith(".inprogress")
    back = {r["url"]: r for r in read_wet(spark, out).collect()}
    assert set(back) == {u for u, _, _ in ROWS}
    for url, ts, text in ROWS:
        assert back[url]["text"] == text          # byte-identical text
        assert back[url]["warc_ts"] == ts


def test_wet_empty_partitions_elided(spark, tmp_path):
    df = spark.createDataFrame(
        ROWS[:1], "url string, warc_ts timestamp, text string"
    ).repartition(8)
    out = os.path.join(str(tmp_path), "wet")
    manifest = write_wet(df, out)
    # 1 row over 8 partitions -> exactly one archive, no empties
    assert len(manifest) == 1 and manifest[0]["n_records"] == 1
    assert len(os.listdir(out)) == 1
    assert glob.glob(os.path.join(out, "*.inprogress")) == []


def test_wet_members_are_valid_concatenated_gzip(spark, tmp_path):
    df = spark.createDataFrame(ROWS, "url string, warc_ts timestamp, text string")
    out = os.path.join(str(tmp_path), "wet")
    [m] = write_wet(df.coalesce(1), out, gzip_members=True)
    raw = open(m["path"], "rb").read()
    # the whole archive must ALSO decode as one gzip stream of
    # concatenated members (what `zcat` does), with each record
    # individually recoverable by the member walk
    whole = gzip.decompress(raw)
    recs = list(iter_warc_conversions(whole))
    assert [u for u, _, _ in recs] == [u for u, _, _ in ROWS]


def test_warc_to_wet_pipeline(spark, tmp_path):
    """Full path: WARC archive -> warc_pages (extract) -> write_wet ->
    read_wet; the text that comes back is byte-identical to the
    extractor's output."""
    from pygeodatacrawler_spark.sources.warc import warc_pages

    warc_dir = os.path.join(str(tmp_path), "warc")
    os.makedirs(warc_dir)
    write_warc_file(
        [
            ("http://a.example.org/", "2024-01-02T03:04:05Z", 200,
             "text/html",
             b"<html><body><p>hello</p><p>world</p></body></html>"),
            ("http://a.example.org/2", "2024-01-02T03:04:06Z", 200,
             "text/html", b"<html><body>two</body></html>"),
        ],
        os.path.join(warc_dir, "part-0.warc.gz"),
        gzip_members=True,
    )
    pages = warc_pages(spark, warc_dir)
    expected = {r["url"]: r["text"] for r in pages.collect()}
    out = os.path.join(str(tmp_path), "wet")
    write_wet(pages, out)
    back = {r["url"]: r["text"] for r in read_wet(spark, out).collect()}
    assert back == expected and len(back) == 2


def test_wat_roundtrip_with_links(spark, tmp_path):
    """WAT: metadata JSON records — links array and scalars serialized
    JVM-side, parseable back with from_json."""
    import pyspark.sql.functions as F

    from pygeodatacrawler_spark.sources.wet import read_wat, write_wat

    df = spark.createDataFrame(
        [
            ("http://a.example.org/", datetime(2024, 1, 2, 3, 4, 5),
             ["http://b.example.org/", "http://c.example.org/x"], 200, "en"),
            ("http://b.example.org/", datetime(2024, 1, 2, 3, 4, 6),
             [], 404, None),
        ],
        "url string, warc_ts timestamp, links array<string>, "
        "status int, lang string",
    )
    out = os.path.join(str(tmp_path), "wat")
    manifest = write_wat(df.repartition(2), out)
    assert sum(m["n_records"] for m in manifest) == 2
    back = read_wat(spark, out)
    parsed = back.select(
        "url",
        "warc_ts",
        F.from_json(
            "payload", "links array<string>, status int, lang string"
        ).alias("m"),
    ).select("url", "warc_ts", "m.links", "m.status", "m.lang")
    rows = {r["url"]: r for r in parsed.collect()}
    a = rows["http://a.example.org/"]
    assert a["links"] == ["http://b.example.org/", "http://c.example.org/x"]
    assert a["status"] == 200 and a["lang"] == "en"
    assert a["warc_ts"] == datetime(2024, 1, 2, 3, 4, 5)
    b = rows["http://b.example.org/"]
    assert b["status"] == 404 and b["lang"] is None and b["links"] == []


def test_crawl_records_to_wat(spark, tmp_path):
    """Engine records -> WAT metadata archives: the link graph
    survives the roundtrip."""
    import tempfile

    import pyspark.sql.functions as F

    from pygeodatacrawler_spark.fixtures import load_pages
    from pygeodatacrawler_spark.plans.crawl import CrawlEngine
    from pygeodatacrawler_spark.sources.wet import read_wat, write_wat

    pages, seeds, robots = load_pages(spark, n_pages=300, n_hosts=4)
    eng = CrawlEngine(
        spark, tempfile.mkdtemp(dir=str(tmp_path)), pages, robots,
        host_budget=40,
    )
    eng.init_from_seeds(seeds)
    eng.run(max_rounds=6)
    recs = eng.records.read().select(
        F.col("canon_url").alias("url"),
        F.current_timestamp().alias("warc_ts"),
        "links",
        "n_bytes",
    )
    want = {r["url"]: sorted(r["links"] or []) for r in recs.collect()}
    out = os.path.join(str(tmp_path), "wat")
    write_wat(recs, out)
    back = read_wat(spark, out).select(
        "url",
        F.from_json(
            "payload", "links array<string>, n_bytes long"
        ).alias("m"),
    )
    got = {r["url"]: sorted(r["m"]["links"] or []) for r in back.collect()}
    assert got == want and len(got) > 50
