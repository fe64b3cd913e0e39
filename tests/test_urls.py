"""Column exprs and their *_py twins must agree byte-for-byte."""

from __future__ import annotations

import pyspark.sql.functions as F

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

URLS = [
    "https://www.host-001.org/page-3.html",
    "HTTPS://WWW.Host-001.ORG/page-3.html",
    "https://www.host-001.org/page-3.html?service=WMS&request=GetCapabilities",
    "https://www.host-001.org/page-3.html?map=x&SERVICE=wms&keep=1",
    "https://www.host-001.org/page-3.html#frag",
    "https://www.host-001.org",
    "https://www.host-001.org?request=GetCapabilities",
    "http://a.b.example.org/x/y/z.html?layers=a,b&version=1.3.0",
    "https://www.host-001.org/sub/page-5.html?exceptions=xml",
]


def test_canonicalize_parity(spark):
    df = spark.createDataFrame([(u,) for u in URLS], "url string")
    got = [
        r["c"]
        for r in df.select(canonicalize_url(F.col("url")).alias("c")).collect()
    ]
    want = [canonicalize_url_py(u) for u in URLS]
    assert got == want


def test_canonicalize_semantics():
    assert (
        canonicalize_url_py(
            "https://H.org/p.html?service=WMS&map=x&request=GetCap#f"
        )
        == "https://h.org/p.html?map=x"
    )
    assert canonicalize_url_py("https://H.org") == "https://h.org/"
    assert canonicalize_url_py("https://H.org?request=x") == "https://h.org/"


def test_registered_domain_parity(spark):
    df = spark.createDataFrame([(u,) for u in URLS], "url string")
    got = [
        r["d"]
        for r in df.select(registered_domain(F.col("url")).alias("d")).collect()
    ]
    want = [registered_domain_py(u) for u in URLS]
    assert got == want
    assert registered_domain_py("https://a.b.example.org/x") == "example.org"


def test_url_depth_parity(spark):
    df = spark.createDataFrame([(u,) for u in URLS], "url string")
    got = [r["d"] for r in df.select(url_depth(F.col("url")).alias("d")).collect()]
    want = [url_depth_py(u) for u in URLS]
    assert got == want


def test_safe_filename_parity(spark):
    names = ["a b(c)/d:e;f,g[h]~i#j", "plain", "x+y\\z%"]
    df = spark.createDataFrame([(n,) for n in names], "n string")
    got = [r["s"] for r in df.select(safe_filename(F.col("n")).alias("s")).collect()]
    want = [safe_filename_py(n) for n in names]
    assert got == want
    assert safe_filename_py("a b(c)") == "a-bc"  # "()" deleted, " " -> "-"


def test_registered_domain_public_suffix(spark):
    # multi-label public suffixes register at the third label (item:
    # co.uk-style hosts must not share a politeness/salt key)
    from pygeodatacrawler_spark.functions.urls import (
        host_registered_domain_py,
    )

    cases = {
        "https://www.example.co.uk/x": "example.co.uk",
        "https://a.b.shop.com.au/": "shop.com.au",
        "https://news.bbc.co.uk/": "bbc.co.uk",
        "https://www.example.de/": "example.de",
        "https://sub.city.go.jp/": "city.go.jp",
        "https://x.y.gouv.fr/": "y.gouv.fr",
        "https://plain.org/": "plain.org",
        "https://deep.k12.il/": "deep.k12.il",
    }
    for url, want in cases.items():
        assert registered_domain_py(url) == want, url
    assert host_registered_domain_py("WWW.Example.CO.UK") == "example.co.uk"
    assert host_registered_domain_py("localhost") == "localhost"

    import pyspark.sql.functions as F

    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = {
        r["url"]: r["d"]
        for r in df.select(
            "url", registered_domain(F.col("url")).alias("d")
        ).collect()
    }
    assert got == cases


def test_registered_domain_three_label_suffix(spark):
    # 3-label public suffixes register at the FOURTH label: two schools
    # under act.edu.au (or districts under k12.ca.us) are different
    # registrants and must NOT share a politeness/salt key
    from pygeodatacrawler_spark.functions.urls import (
        host_registered_domain_py,
    )

    cases = {
        "https://www.northside.act.edu.au/": "northside.act.edu.au",
        "https://library.southview.k12.ca.us/a": "southview.k12.ca.us",
        "https://www.example.lib.tx.us/": "example.lib.tx.us",
        "https://portal.health.nsw.gov.au/": "health.nsw.gov.au",
        # 2-label fallbacks unchanged
        "https://www.example.edu.au/": "example.edu.au",
        "https://www.ci.berkeley.ca.us/": "berkeley.ca.us",
    }
    for url, want in cases.items():
        assert registered_domain_py(url) == want, url

    import pyspark.sql.functions as F

    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = {
        r["url"]: r["d"]
        for r in df.select(
            "url", registered_domain(F.col("url")).alias("d")
        ).collect()
    }
    assert got == cases
    # distinct schools -> distinct keys; same school's subdomains merge
    a = host_registered_domain_py("www.alpha.act.edu.au")
    b = host_registered_domain_py("www.beta.act.edu.au")
    assert a != b
    assert host_registered_domain_py("mail.alpha.act.edu.au") == a
