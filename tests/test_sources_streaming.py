"""CSV dialect source, paginated source, export sink, streaming rounds."""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F

from pygeodatacrawler_spark.fixtures import load_pages
from pygeodatacrawler_spark.operators.harvest import harvest_metadata, valid_records
from pygeodatacrawler_spark.plans.crawl import CrawlEngine
from pygeodatacrawler_spark.sources.csv import read_csv_dialect
from pygeodatacrawler_spark.sources.export import export_records
from pygeodatacrawler_spark.sources.paginated import read_paginated
from pygeodatacrawler_spark.streaming.rounds import (
    seed_ingest_stream,
    windowed_page_counts,
)


def test_csv_dialects(spark, tmp_path):
    win = tmp_path / "win.csv"
    win.write_bytes("id;name;note\n1;Ana;\n2;José;x\n".encode("iso-8859-1"))
    df = read_csv_dialect(spark, str(win), sep=";", encoding="ISO-8859-1")
    rows = {r["id"]: r for r in df.collect()}
    assert rows["1"]["note"] == ""  # short-row padding with ''
    assert rows["2"]["name"] == "José"  # encoding honored


def test_paginated_source(spark):
    base = spark.range(0, 137).withColumnRenamed("id", "rec")

    def fetch(start: int, pagesize: int):
        page = base.filter(
            (F.col("rec") >= start - 1) & (F.col("rec") < start - 1 + pagesize)
        )
        return page

    out = read_paginated(fetch, pagesize=50, maxrecords=120)
    assert out.count() == 120  # maxrecords cap (O2)
    out2 = read_paginated(fetch, pagesize=50, maxrecords=500)
    assert out2.count() == 137  # exhaustion on short page


def test_export_profiles(spark):
    import json as _json
    from xml.etree import ElementTree as ET

    pages, _, _ = load_pages(spark, n_pages=60, n_hosts=3)
    recs = valid_records(harvest_metadata(pages))
    n = recs.count()

    js = export_records(recs, "json").collect()
    assert len(js) == n
    for r in js:
        assert r["filename"].endswith(".json")
        assert '"identifier"' in r["payload"]

    iso = export_records(recs, "iso19139").collect()
    assert len(iso) == n
    for r in iso:
        assert r["filename"].endswith(".xml")
        root = ET.fromstring(r["payload"])  # well-formed XML
        assert root.tag == "{http://www.isotc211.org/2005/gmd}MD_Metadata"
        assert (
            f"<gco:CharacterString>{r['identifier']}</gco:CharacterString>"
            in r["payload"]
        )
        assert "<gmd:EX_GeographicBoundingBox>" in r["payload"]

    for prof, top_keys in {
        "dcat": {"@type", "dct:identifier", "dcat:distribution"},
        "stac": {"type", "stac_version", "bbox", "geometry", "assets"},
        "oarec": {"id", "type", "geometry", "properties", "links"},
    }.items():
        rows = export_records(recs, prof).collect()
        assert len(rows) == n
        for r in rows:
            assert r["filename"].endswith(".json")
            doc = _json.loads(r["payload"])  # valid JSON
            assert top_keys <= set(doc)


def test_json_escape_control_chars(spark):
    """_js must produce VALID JSON for control characters in field
    values (newline/tab in a title were previously passed through raw),
    and the DuckDB oracle's SQL_JS_ESCAPE must produce byte-identical
    payload text."""
    import json as _json

    import duckdb

    from pygeodatacrawler_spark.entry_queries import SQL_JS_ESCAPE
    from pygeodatacrawler_spark.sources.export import _js

    nasty = [
        'line1\nline2\ttabbed "quoted" back\\slash',
        "cr\rlf\n mix \x08\x0c",
        "bell\x07 and \x01 controls \x1f end",
        "plain",
    ]
    df = spark.createDataFrame([(s,) for s in nasty], "title string")
    got = [r["e"] for r in df.select(_js(F.col("title")).alias("e")).collect()]
    for s, e in zip(nasty, got):
        # wrapping in quotes must yield valid JSON that round-trips the
        # text minus the stripped no-short-escape controls
        decoded = _json.loads('"' + e + '"')
        expect = "".join(
            ch for ch in s if ch >= " " or ch in "\b\t\n\f\r"
        )
        assert decoded == expect

    con = duckdb.connect()
    sql = ", ".join(
        SQL_JS_ESCAPE.format(x=f"${i + 1}") for i in range(len(nasty))
    )
    want = list(con.execute(f"select {sql}", nasty).fetchone())
    assert got == want


def test_windowed_page_counts_stream(spark, tmp_path):
    pages, _, _ = load_pages(spark, n_pages=200, n_hosts=5)
    src = str(tmp_path / "stream_src")
    pages.write.parquet(src)
    stream = spark.readStream.schema(pages.schema).parquet(src)
    agg = windowed_page_counts(stream, window="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("page_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select sum(n_pages) as n from page_counts").collect()[0]["n"]
    assert got == 200


def test_seed_ingest_stream(spark, tmp_path):
    pages, seeds, robots = load_pages(spark, n_pages=200, n_hosts=5)
    seed_dir = str(tmp_path / "seeds_src")
    seeds.write.json(seed_dir)
    workdir = str(tmp_path / "crawl")
    eng = CrawlEngine(spark, workdir, pages, robots, host_budget=20)
    stream = spark.readStream.schema("url string, depth int").json(seed_dir)
    q = seed_ingest_stream(
        stream, eng, rounds_per_batch=2,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)
    assert eng.frontier.read().filter(F.col("state") == "fetched").count() > 0
    # batch engine can resume from streaming-committed state and converge
    # (robots-filtered URLs legitimately stay pending forever)
    eng2 = CrawlEngine(spark, workdir, pages, robots, host_budget=20)
    eng2.run(max_rounds=30)
    eng3 = CrawlEngine(spark, workdir, pages, robots, host_budget=20)
    stats3 = eng3.run(max_rounds=5)
    assert stats3.urls_fetched == 0  # fully converged


def test_paginated_csw_filters(spark):
    # CSW intended-filter semantics (utils.py:385-397): the shorthand
    # dict maps through filterMapping to PropertyIsEqualTo pairs pushed
    # into EVERY page request. (The reference's own filter path crashes
    # on `constraints.push` and never reaches getrecords2 — the bug is
    # documented, not replicated.)
    from pygeodatacrawler_spark.sources.paginated import map_csw_filters

    assert map_csw_filters({"any": "soil", "title": "t", "dc:custom": "x"}) == [
        ("csw:AnyText", "soil"), ("dc:title", "t"), ("dc:custom", "x"),
    ]
    assert map_csw_filters(None) == []

    catalog = spark.range(0, 200).select(
        F.col("id").alias("rec"),
        F.when(F.col("id") % 4 == 0, "soil").otherwise("water").alias("subject"),
        F.concat(F.lit("rec-"), F.col("id")).alias("title"),
    )
    seen_constraints = []

    def fetch(start: int, pagesize: int, constraints=None):
        # a CSW applies constraints server-side, then paginates the
        # MATCHING record stream (startposition counts filtered rows)
        seen_constraints.append(constraints)
        page = catalog
        for key, value in constraints or []:
            col = {"dc:subject": "subject", "dc:title": "title"}[key]
            page = page.filter(F.col(col) == value)
        w_rows = page.orderBy("rec").collect()
        return spark.createDataFrame(
            w_rows[start - 1 : start - 1 + pagesize], page.schema
        ) if w_rows[start - 1 : start - 1 + pagesize] else None

    out = read_paginated(
        fetch, pagesize=20, maxrecords=45, filters={"keyword": "soil"}
    )
    rows = out.collect()
    assert len(rows) == 45  # cap still applies on the filtered stream
    assert all(r["subject"] == "soil" for r in rows)
    # every page request carried the mapped constraint
    assert all(c == [("dc:subject", "soil")] for c in seen_constraints)

    # exhaustion: only 50 soil records exist
    out2 = read_paginated(
        fetch, pagesize=20, maxrecords=500, filters={"keyword": "soil"}
    )
    assert out2.count() == 50


def test_seed_ingest_second_batch_not_stale(spark, tmp_path):
    # regression: the engine's incrementally-maintained frontier cache
    # must be dropped when the stream MERGEs seeds externally — with a
    # stale cache, micro-batch 2's seeds would never be crawled
    from pygeodatacrawler_spark.plans.crawl import CrawlEngine
    from pygeodatacrawler_spark.streaming.rounds import seed_ingest_stream

    pages, seeds, robots = load_pages(spark, n_pages=200, n_hosts=5)
    seed_dir = str(tmp_path / "seeds_src2")
    ckpt = str(tmp_path / "ckpt2")
    first = seeds.filter(~F.col("url").contains("host-004"))
    second = seeds.filter(F.col("url").contains("host-004"))
    assert second.count() >= 1
    first.coalesce(1).write.mode("overwrite").json(seed_dir)

    eng = CrawlEngine(
        spark, str(tmp_path / "crawl2"), pages, robots, host_budget=20
    )
    stream = spark.readStream.schema("url string, depth int").json(seed_dir)
    q = seed_ingest_stream(stream, eng, rounds_per_batch=2, checkpoint_dir=ckpt)
    q.awaitTermination(180)
    assert eng._frontier_df is not None  # engine cache is warm now

    # second batch: new seed file into the same source dir
    second.coalesce(1).write.mode("append").json(seed_dir)
    stream2 = spark.readStream.schema("url string, depth int").json(seed_dir)
    q2 = seed_ingest_stream(stream2, eng, rounds_per_batch=2, checkpoint_dir=ckpt)
    q2.awaitTermination(180)

    fetched_hosts = {
        r["registered_domain"]
        for r in eng.records.read().select("registered_domain").distinct().collect()
    }
    assert any("host-004" in h for h in fetched_hosts)
    # cache and disk agree after the external write + further rounds
    assert sorted(map(tuple, eng._frontier_df.collect())) == sorted(
        map(tuple, eng.frontier.read().collect())
    )
