"""Extractor determinism + UDF/py byte-identity (BASELINE per-row invariant)."""

from __future__ import annotations

import pyspark.sql.functions as F

from pygeodatacrawler_spark.fixtures import generate_pages
from pygeodatacrawler_spark.functions.text import (
    extract_links_py,
    extract_links_udf,
    extract_text_py,
    extract_text_udf,
)

HTML = (
    b"<html><head><title>T</title><script>var x=1;</script></head>"
    b"<!-- c --><body><p>Hello &amp; world</p>"
    b'<a href="/a.html">a</a><a href="b.html#frag">b</a>'
    b'<a href="mailto:x@y">m</a><a href="https://other.org/c">c</a>'
    b"<style>p{}</style></body></html>"
)


def test_extract_text():
    assert extract_text_py(HTML) == "T Hello & world a b m c"
    assert extract_text_py(None) is None
    assert extract_text_py(b"") == ""


def test_extract_links():
    links = extract_links_py(HTML, "https://h.org/d/page.html")
    # raw absolute hrefs — fragment stripping happens at canonicalization
    assert links == [
        "https://h.org/a.html",
        "https://h.org/d/b.html#frag",
        "https://other.org/c",
    ]
    assert extract_links_py(None, "https://h.org/") == []


def test_udf_matches_py(spark):
    pages, _, _ = generate_pages(n_pages=200, n_hosts=5)
    df = spark.createDataFrame(
        pages[["url", "html"]],
        schema="url string, html binary",
    )
    rows = df.select(
        "url",
        extract_text_udf(F.col("html")).alias("text"),
        extract_links_udf(F.col("html"), F.col("url")).alias("links"),
    ).collect()
    by_url = {r["url"]: r for r in rows}
    for _, p in pages.iterrows():
        r = by_url[p["url"]]
        assert r["text"] == extract_text_py(p["html"])  # byte-identical
        assert r["links"] == extract_links_py(p["html"], p["url"])


def test_fixture_text_column_is_extractor_output():
    pages, _, _ = generate_pages(n_pages=100, n_hosts=4)
    for _, p in pages.iterrows():
        assert p["text"] == extract_text_py(p["html"])


