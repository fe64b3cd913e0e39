"""robots.txt (RFC 9309 subset) + sitemap.xml parsing, and the
end-to-end path: parsed rules -> broadcast robots table ->
apply_robots filtering the exact URLs the rules name."""

from __future__ import annotations

import pyspark.sql.functions as F

from pygeodatacrawler_spark.functions.robots import (
    parse_robots_py,
    parse_sitemap_py,
    robots_rules_row,
    robots_table,
    seeds_from_sitemaps,
)

ROBOTS = """\
# global comment
Sitemap: https://example.org/sitemap.xml

User-agent: googlebot
Disallow: /private/

User-agent: pygeodatacrawler
User-agent: otherbot
Disallow: /tmp/
Disallow: /*.pdf$
Allow: /tmp/ok/
Crawl-delay: 2.5

User-agent: *
Disallow: /all/
Sitemap: https://example.org/sitemap2.xml
"""


def test_group_selection_longest_ua_match():
    r = parse_robots_py(ROBOTS, "pygeodatacrawler/0.9")
    assert r["disallow"] == ["/tmp/", "/*.pdf$"]
    assert r["allow"] == ["/tmp/ok/"]
    assert r["crawl_delay"] == 2.5
    assert r["sitemaps"] == [
        "https://example.org/sitemap.xml",
        "https://example.org/sitemap2.xml",
    ]
    # unknown agent falls back to *
    star = parse_robots_py(ROBOTS, "randombot")
    assert star["disallow"] == ["/all/"] and star["crawl_delay"] is None
    # googlebot picks its specific group over *
    g = parse_robots_py(ROBOTS, "Googlebot-Image")
    assert g["disallow"] == ["/private/"]


def test_parse_totality_and_edge_lines():
    assert parse_robots_py(None)["disallow"] == []
    assert parse_robots_py(b"\xff\xfe garbage")["disallow"] == []
    # empty Disallow means allow-all; rules before any UA are ignored
    r = parse_robots_py("Disallow: /x/\nUser-agent: *\nDisallow:\n", "a")
    assert r["disallow"] == []


def test_parse_limit_500kib():
    # RFC 9309 §2.5: rules beyond the 500 KiB parse limit are ignored,
    # rules inside it survive; the cut lands on a line boundary
    from pygeodatacrawler_spark.functions.robots import ROBOTS_PARSE_LIMIT

    head = "User-agent: *\nDisallow: /early\n"
    filler = "# pad\n" * ((ROBOTS_PARSE_LIMIT - len(head)) // 6 + 1)
    tail = "Disallow: /late\n"
    r = parse_robots_py(head + filler + tail)
    assert r["disallow"] == ["/early"]
    # same for bytes input
    rb = parse_robots_py((head + filler + tail).encode())
    assert rb["disallow"] == ["/early"]


def test_parse_sitemap_gzip():
    import gzip

    gz = gzip.compress(SITEMAP)
    u = parse_sitemap_py(gz)
    assert u["kind"] == "urlset"
    assert [l for l, _ in u["urls"]] == [
        "https://example.org/a.html", "https://example.org/b.html",
    ]
    # truncated gzip stream is total
    assert parse_sitemap_py(gz[: len(gz) // 2])["kind"] is None
    # crawl-loop extractor dispatches the gzipped sitemap too
    from pygeodatacrawler_spark.functions.text import extract_links_py

    links = extract_links_py(gz, "https://example.org/sitemap.xml.gz")
    assert links == ["https://example.org/a.html", "https://example.org/b.html"]
    # a non-sitemap gzip blob yields no links (and doesn't crash)
    assert extract_links_py(gzip.compress(b"not xml"), "https://x.org/") == []


def test_rules_row_regex_semantics():
    row = robots_rules_row("example.org", ROBOTS)
    import re

    pat = re.compile(row["skip_pattern"])
    assert pat.search("https://www.example.org/tmp/page.html")
    assert pat.search("https://example.org/docs/file.pdf")  # /*.pdf$
    assert not pat.search("https://example.org/docs/file.pdf?x=1")  # $ anchored
    assert not pat.search("https://example.org/docs/page.html")
    assert row["crawl_delay"] == 2.5
    # no rules -> NULL pattern (apply_robots never filters)
    empty = robots_rules_row("clean.org", "User-agent: *\nDisallow:\n")
    assert empty["skip_pattern"] is None


def test_robots_table_feeds_apply_robots(spark):
    from pygeodatacrawler_spark.operators.frontier import apply_robots

    dim = spark.createDataFrame(
        [("example.org", ROBOTS), ("clean.org", "User-agent: *\nDisallow:\n")],
        "registered_domain string, robots_txt string",
    )
    rules = robots_table(dim).drop("sitemaps")
    frontier = spark.createDataFrame(
        [
            ("example.org", "https://www.example.org/tmp/a.html"),
            ("example.org", "https://www.example.org/tmp/ok/b.html"),
            ("example.org", "https://www.example.org/ok/a.html"),
            ("example.org", "https://www.example.org/x/doc.pdf"),
            ("clean.org", "https://clean.org/tmp/a.html"),
            ("missing.org", "https://missing.org/tmp/a.html"),
        ],
        "registered_domain string, canon_url string",
    )
    kept = {r["canon_url"] for r in apply_robots(frontier, rules).collect()}
    assert kept == {
        # Allow: /tmp/ok/ (len 8) beats Disallow: /tmp/ (len 5) — RFC
        # 9309 §2.2.2 longest-match enforced end-to-end
        "https://www.example.org/tmp/ok/b.html",
        "https://www.example.org/ok/a.html",
        "https://clean.org/tmp/a.html",
        "https://missing.org/tmp/a.html",
    }


def test_apply_robots_precedence_e2e(spark):
    """The verdict's done-criterion case: Disallow: /a + Allow: /a/b
    crawls /a/b and skips /a/c."""
    from pygeodatacrawler_spark.operators.frontier import apply_robots

    txt = "User-agent: *\nDisallow: /a\nAllow: /a/b\n"
    dim = spark.createDataFrame(
        [("site.org", txt)], "registered_domain string, robots_txt string"
    )
    frontier = spark.createDataFrame(
        [
            ("site.org", "https://site.org/a/b"),
            ("site.org", "https://site.org/a/b/deep.html"),
            ("site.org", "https://site.org/a/c"),
            ("site.org", "https://site.org/a"),
            ("site.org", "https://site.org/elsewhere"),
        ],
        "registered_domain string, canon_url string",
    )
    kept = {
        r["canon_url"]
        for r in apply_robots(frontier, robots_table(dim)).collect()
    }
    assert kept == {
        "https://site.org/a/b",
        "https://site.org/a/b/deep.html",
        "https://site.org/elsewhere",
    }


SITEMAP = b"""<?xml version="1.0"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://example.org/a.html</loc><lastmod>2024-01-02</lastmod></url>
  <url><loc>https://example.org/b.html</loc></url>
  <url><priority>0.5</priority></url>
</urlset>"""

SITEMAP_INDEX = b"""<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://example.org/sm1.xml</loc></sitemap>
  <sitemap><loc>https://example.org/sm2.xml</loc></sitemap>
</sitemapindex>"""


def test_parse_sitemap_variants():
    u = parse_sitemap_py(SITEMAP)
    assert u["kind"] == "urlset"
    assert u["urls"] == [
        ("https://example.org/a.html", "2024-01-02"),
        ("https://example.org/b.html", None),
    ]
    i = parse_sitemap_py(SITEMAP_INDEX)
    assert i["kind"] == "sitemapindex"
    assert i["sitemaps"] == [
        "https://example.org/sm1.xml", "https://example.org/sm2.xml",
    ]
    assert parse_sitemap_py(b"<broken")["kind"] is None
    assert parse_sitemap_py(None)["kind"] is None
    assert parse_sitemap_py(b"<other/>")["kind"] is None


def test_crawl_walks_nested_sitemap_tree(spark):
    """E2E: a crawl seeded on a sitemapindex fetches the child
    sitemaps it names, then the grandchild sitemap, then every leaf
    URL — and the sequential oracle (same shared extractor) reproduces
    the visit order exactly."""
    import tempfile

    import pandas as pd

    from pygeodatacrawler_spark.oracle.refcrawl import crawl_oracle
    from pygeodatacrawler_spark.plans.crawl import CrawlEngine

    base = "https://site.org"
    leaves = [f"{base}/leaf-{i}.html" for i in range(6)]

    def urlset(urls):
        locs = "".join(f"<url><loc>{u}</loc></url>" for u in urls)
        return (
            '<?xml version="1.0"?><urlset xmlns='
            '"http://www.sitemaps.org/schemas/sitemap/0.9">'
            f"{locs}</urlset>"
        ).encode()

    def smindex(urls):
        locs = "".join(f"<sitemap><loc>{u}</loc></sitemap>" for u in urls)
        return (
            '<?xml version="1.0"?><sitemapindex xmlns='
            '"http://www.sitemaps.org/schemas/sitemap/0.9">'
            f"{locs}</sitemapindex>"
        ).encode()

    docs = {
        f"{base}/sitemap_index.xml": smindex(
            [f"{base}/sm1.xml", f"{base}/sm2.xml"]
        ),
        f"{base}/sm1.xml": urlset(leaves[:3]),
        # nested: sm2 is ANOTHER index -> sm3 (3 levels total)
        f"{base}/sm2.xml": smindex([f"{base}/sm3.xml"]),
        f"{base}/sm3.xml": urlset(leaves[3:]),
    }
    for i, u in enumerate(leaves):
        docs[u] = f"<html><body><p>leaf {i}</p></body></html>".encode()

    pages_pd = pd.DataFrame({"url": list(docs), "html": list(docs.values())})
    seeds_pd = pd.DataFrame({"url": [f"{base}/sitemap_index.xml"], "depth": 0})
    pages = spark.createDataFrame(
        [(u, bytearray(b)) for u, b in docs.items()], "url string, html binary"
    )
    seeds = spark.createDataFrame([(f"{base}/sitemap_index.xml", 0)],
                                  "url string, depth int")
    with tempfile.TemporaryDirectory() as tmp:
        eng = CrawlEngine(spark, tmp, pages, host_budget=50)
        eng.init_from_seeds(seeds)
        eng.run(max_rounds=10)
        visits = eng.visits_view().collect()
    got_urls = {v["canon_url"] for v in visits}
    assert set(leaves) <= got_urls  # every leaf discovered + fetched
    assert len(got_urls) == len(docs)  # index + children + leaves
    oracle = crawl_oracle(pages_pd, seeds_pd, None, host_budget=50)
    got = sorted((v["round"], v["rank_in_round"], v["canon_url"]) for v in visits)
    want = sorted(
        (v["round"], v["rank_in_round"], v["canon_url"]) for v in oracle.visits
    )
    assert got == want


def test_seeds_from_sitemaps_spark(spark):
    df = spark.createDataFrame(
        [(SITEMAP.decode(),), (SITEMAP_INDEX.decode(),)],
        "sitemap_xml string",
    )
    rows = seeds_from_sitemaps(df).collect()
    urls = {r["url"] for r in rows}
    assert urls == {
        "https://example.org/a.html", "https://example.org/b.html",
        "https://example.org/sm1.xml", "https://example.org/sm2.xml",
    }
    assert all(r["depth"] == 0 for r in rows)
    mods = {r["url"]: r["lastmod"] for r in rows}
    assert mods["https://example.org/a.html"] == "2024-01-02"
