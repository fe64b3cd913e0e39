"""Property-based parity: random inputs through the Column expressions
and their *_py twins must agree — the engine↔oracle contract holds on
adversarial inputs, not just fixtures (hypothesis)."""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import given, settings, strategies as st

from pygeodatacrawler_spark.functions.text import extract_links_py, extract_text_py
from pygeodatacrawler_spark.functions.urls import (
    canonicalize_url,
    canonicalize_url_py,
    registered_domain,
    registered_domain_py,
    safe_filename,
    safe_filename_py,
    url_depth,
    url_depth_py,
)

_HOST = st.from_regex(r"[a-z]{1,8}(\.[a-z]{1,8}){1,3}", fullmatch=True)
_PATH = st.from_regex(r"(/[a-zA-Z0-9._~-]{0,10}){0,4}", fullmatch=True)
_QUERY = st.from_regex(
    r"(\?[a-zA-Z]{1,8}=[a-zA-Z0-9]{0,6}(&[a-zA-Z]{1,8}=[a-zA-Z0-9]{0,6}){0,3})?",
    fullmatch=True,
)
_FRAG = st.from_regex(r"(#[a-zA-Z0-9]{0,6})?", fullmatch=True)


@st.composite
def urls(draw):
    scheme = draw(st.sampled_from(["http", "https", "HTTP", "Https"]))
    return (
        f"{scheme}://{draw(_HOST)}{draw(_PATH)}{draw(_QUERY)}{draw(_FRAG)}"
    )


@settings(max_examples=8, deadline=None)
@given(st.lists(urls(), min_size=1, max_size=40))
def _check_urls(spark, batch):
    df = spark.createDataFrame([(u,) for u in batch], "url string")
    rows = df.select(
        canonicalize_url(F.col("url")).alias("c"),
        registered_domain(F.col("url")).alias("d"),
        url_depth(F.col("url")).alias("n"),
        safe_filename(F.col("url")).alias("f"),
    ).collect()
    for u, r in zip(batch, rows):
        assert r["c"] == canonicalize_url_py(u), u
        assert r["d"] == registered_domain_py(u), u
        assert r["n"] == url_depth_py(u), u
        assert r["f"] == safe_filename_py(u), u


def test_url_function_parity_property(spark):
    _check_urls(spark)


_HTML_BITS = st.lists(
    st.sampled_from(
        [
            b"<p>text&amp; more</p>",
            b'<a href="/x.html">x</a>',
            b'<a href="https://o.org/y?a=1#f">y</a>',
            b"<script>var x='<a href=\"/no\">';</script>",
            b"<!-- <a href='/not'>c</a> -->",
            b"<style>a{color:red}</style>",
            b"\xff\xfeodd bytes",
            b"<A HREF='/caps.html'>C</A>",
            b"<a href=''>empty</a>",
            b"plain words \xe2\x9c\x93",
        ]
    ),
    min_size=0,
    max_size=12,
)


@settings(max_examples=8, deadline=None)
@given(_HTML_BITS)
def _check_extract(spark, parts):
    html = b"<html><body>" + b"".join(parts) + b"</body></html>"
    df = spark.createDataFrame([("https://h.org/base/", html)], "url string, html binary")
    from pygeodatacrawler_spark.functions.text import (
        extract_links_udf,
        extract_text_udf,
    )

    row = df.select(
        extract_text_udf(F.col("html")).alias("t"),
        extract_links_udf(F.col("html"), F.col("url")).alias("l"),
    ).collect()[0]
    assert row["t"] == extract_text_py(html)
    assert row["l"] == extract_links_py(html, "https://h.org/base/")


def test_extractor_parity_property(spark):
    _check_extract(spark)
