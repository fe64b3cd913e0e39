"""Extractor determinism + UDF/py byte-identity (BASELINE per-row invariant)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

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




def test_c4_line_filters(spark):
    from pygeodatacrawler_spark.functions.quality import (
        c4_filtered_text,
        c4_keep_doc,
        c4_keep_lines,
        c4_kept_fraction,
    )

    doc = "\n".join(
        [
            "This is a proper sentence with enough words.",   # keep
            "Too short.",                                      # <5 words
            "No terminal punctuation here at all",             # no punct
            "Lorem ipsum dolor sit amet, consectetur elit.",   # lorem
            "A code line with braces { return 1; } stays out.",# brace
            "",                                                # empty
            'He said "this quoted sentence also counts fine."',# keep
            "Does a question with five words work?",           # keep
        ]
    )
    df = spark.createDataFrame([(doc,), ("",)], "text string")
    r = df.select(
        F.size(c4_keep_lines(F.col("text"))).alias("n"),
        F.round(c4_kept_fraction(F.col("text")), 4).alias("frac"),
        c4_keep_doc(F.col("text")).alias("keep"),
        c4_filtered_text(F.col("text")).alias("clean"),
    ).collect()
    full, empty = r
    assert full["n"] == 3
    assert full["frac"] == pytest.approx(round(3 / 7, 4))
    assert full["keep"] is True
    assert full["clean"].splitlines()[0].startswith("This is a proper")
    assert "Lorem ipsum" not in full["clean"] and "{" not in full["clean"]
    assert empty["n"] == 0 and empty["frac"] == 0.0 and empty["keep"] is False
