"""Text and link extraction from raw HTML bytes.

This is the rebuild of the reference's per-file parse loop
(/root/reference/geodatacrawler/utils.py:26-180 ``indexFile``): one pure,
versioned extraction function over the ``html`` binary column, exposed
two ways with byte-identical results:

- ``extract_text_py`` / ``extract_links_py`` — plain Python, used by the
  sequential oracle and the fixture generator;
- ``extract_text_udf`` / ``extract_links_udf`` — Arrow-batched pandas
  UDFs wrapping the same functions, used in the distributed crawl.

Byte-identity per url is the BASELINE.json per-row invariant; the pytest
suite compares sha2 of both sides row by row. Determinism rules: bytes
in, utf-8 with replacement out, no locale, no library version drift
(stdlib only).
"""

from __future__ import annotations

import html as _htmllib
import re
from collections.abc import Iterator
from urllib.parse import urljoin

import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

EXTRACTOR_VERSION = 1

_COMMENT_RE = re.compile(rb"(?s)<!--.*?-->")
_SCRIPT_STYLE_RE = re.compile(rb"(?is)<(script|style)\b[^>]*>.*?</\1\s*>")
_TAG_RE = re.compile(rb"(?s)<[^>]*>")
_WS_RE = re.compile(r"\s+")
_HREF_RE = re.compile(rb"""(?is)<a\s[^>]*?href\s*=\s*["']([^"']+)["']""")


def extract_text_py(html: bytes | None) -> str | None:
    """Visible text of an HTML payload; pure function of the bytes."""
    if html is None:
        return None
    s = _COMMENT_RE.sub(b" ", html)
    s = _SCRIPT_STYLE_RE.sub(b" ", s)
    s = _TAG_RE.sub(b" ", s)
    txt = s.decode("utf-8", errors="replace")
    txt = _htmllib.unescape(txt)
    # identical to _WS_RE.sub(" ", txt).strip() — str.split() and
    # regex \s share one Unicode whitespace set (verified over every
    # codepoint) — but ~3.4x faster, and this line was 84% of the
    # whole extractor's CPU (the mega-round bench is extract-bound)
    return " ".join(txt.split())


# sitemap payload sniff: an XML root of urlset/sitemapindex within the
# head of the payload (namespace-prefix tolerant). HTML never matches,
# so the <a href> path below is byte-for-byte unchanged for pages.
_SITEMAP_SNIFF_RE = re.compile(rb"<\s*(?:[A-Za-z0-9._-]+:)?(?:urlset|sitemapindex)[\s>]")


def extract_links_py(html: bytes | None, base_url: str | None) -> list[str]:
    """Absolute http(s) hrefs, document order, first occurrence wins.

    Sitemap dispatch: a payload whose XML root is ``urlset`` or
    ``sitemapindex`` yields its ``<loc>`` URLs (page locations and/or
    child-sitemap locations) as the links instead of ``<a href>``
    extraction — so a crawl that fetches a sitemap (from robots.txt
    Sitemap lines or a seed) walks nested sitemapindex trees to every
    leaf URL with no special casing in the loop. Locs follow BFS
    depth+1 like any discovered link. Shared by the distributed
    extract stage and the sequential oracle, so crawl parity holds by
    construction."""
    if html is None or base_url is None:
        return []
    out: list[str] = []
    seen: set[str] = set()
    if _SITEMAP_SNIFF_RE.search(html[:1024]) or html[:2] == b"\x1f\x8b":
        # plain XML root sniff, or a gzip payload (the .xml.gz sitemap
        # convention — parse_sitemap_py decompresses and stays total;
        # a gzip blob that is NOT a sitemap yields kind=None and falls
        # through to href extraction, which finds nothing in it)
        from pygeodatacrawler_spark.functions.robots import parse_sitemap_py

        sm = parse_sitemap_py(html)
        if sm["kind"] is not None:
            for raw in [u for u, _ in sm["urls"]] + sm["sitemaps"]:
                absu = urljoin(base_url, raw.strip())
                if not absu.startswith(("http://", "https://")):
                    continue
                if absu not in seen:
                    seen.add(absu)
                    out.append(absu)
            return out
        # sniffed but malformed XML: fall through to href extraction
    for m in _HREF_RE.finditer(html):
        raw = m.group(1).decode("utf-8", errors="replace").strip()
        if not raw or raw.startswith(("javascript:", "mailto:", "data:")):
            continue
        absu = urljoin(base_url, raw)
        if not absu.startswith(("http://", "https://")):
            continue
        if absu not in seen:
            seen.add(absu)
            out.append(absu)
    return out


@pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return html.map(extract_text_py)


@pandas_udf(ArrayType(StringType()))
def extract_links_udf(html: pd.Series, base_url: pd.Series) -> pd.Series:
    return pd.Series(
        [extract_links_py(h, u) for h, u in zip(html, base_url)], dtype=object
    )


def extract_pages_batches(
    pdf_iter: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas body: (url, html) -> (url, text, links, n_bytes).

    One Arrow round-trip for both extractions (cheaper than two scalar
    UDFs when both columns are needed, which is every crawl round).
    """
    for pdf in pdf_iter:
        yield pd.DataFrame(
            {
                "url": pdf["url"],
                "text": pdf["html"].map(extract_text_py),
                "links": [
                    extract_links_py(h, u) for h, u in zip(pdf["html"], pdf["url"])
                ],
                "n_bytes": pdf["html"].map(lambda b: 0 if b is None else len(b)),
            }
        )


# schema for extract_pages_batches, importable by the crawl plan
EXTRACT_SCHEMA = (
    "url string, text string, links array<string>, n_bytes long"
)
