"""Deterministic synthetic `pages` corpus (seed=42) per FIXTURES.md §1.

The Common-Crawl-style analog of the reference's demo/ tree: ~hosts with
link trees, ~10% ISO19139 metadata islands, ~10% Dublin-Core blocks, one
heavy host holding ~30% of all URLs (skew-salting exercise), and
query-string variant links (canonicalization exercise).

The ``text`` column is produced by the SAME extractor the engine uses
(functions/text.py), which *defines* the byte-identical-per-url
invariant; tests then verify the distributed extraction reproduces the
stored column sha-for-sha.

Everything derives from random.Random(seed) — identical corpus on any
machine, no wall clock, no external data.
"""

from __future__ import annotations

import random
import re
from datetime import datetime, timedelta

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from pygeodatacrawler_spark.functions.text import extract_text_py

WORDS = (
    "the quick crawl frontier spark shuffle partition robots fetch index "
    "metadata harvest record catalog layer extent keyword title abstract "
    "dataset service capability domain budget politeness snapshot lineage "
    "el la de que los las der die das und est une et les web page link"
).split()

BRANCHING = 4
T0 = datetime(2024, 1, 1, 0, 0, 0)

# Precomputed word pool for page bodies. Slicing a fixed pool is ONE
# memcpy per page where " ".join(rng.choices(WORDS, k)) was ~k string
# allocations — at bench scale the latter saturates DRAM bandwidth and
# caps multi-process scaling at ~0.6 on this box (32 generator
# processes each ran 1.63x slower than 8 did), charging the crawl
# loop's scaling number for the *data generator*, not the engine.
# Content is equivalent (same vocabulary, word-aligned windows, length
# still rng-drawn); determinism unchanged (pool is a module constant,
# offsets drawn from the per-page rng).
_POOL_WORDS = random.Random(0x5EED).choices(WORDS, k=120_000)
_POOL_OFFSETS = []
_acc = 0
for _w in _POOL_WORDS:
    _POOL_OFFSETS.append(_acc)
    _acc += len(_w) + 1
_POOL_OFFSETS.append(_acc)
_WORD_POOL = " ".join(_POOL_WORDS)


def _body_words(rng: random.Random, words_min: int, words_max: int) -> str:
    n = rng.randint(words_min, words_max)
    start = rng.randrange(len(_POOL_WORDS) - n)
    return _WORD_POOL[_POOL_OFFSETS[start] : _POOL_OFFSETS[start + n] - 1]


def _iso_island(host: str, j: int) -> str:
    return (
        '<div class="metadata"><MD_Metadata>'
        f"<fileIdentifier>{host}-ds-{j}</fileIdentifier>"
        f"<title>Dataset {j} of {host}</title>"
        f"<abstract>Synthetic ISO19139 island {j} for {host}</abstract>"
        f"<keyword>geo</keyword><keyword>crawl-{j % 5}</keyword>"
        f"<date>2024-0{(j % 9) + 1}-01</date>"
        "</MD_Metadata></div>"
    )


def _dc_block(host: str, j: int) -> str:
    return (
        "<oai_dc:dc>"
        f"<dc:identifier>{host}-dc-{j}</dc:identifier>"
        f"<dc:title>DC record {j} of {host}</dc:title>"
        f"<dc:description>Synthetic Dublin-Core block {j}</dc:description>"
        f"<dc:subject>web</dc:subject><dc:subject>dc-{j % 3}</dc:subject>"
        "</oai_dc:dc>"
    )


def _page_url(host: str, j: int) -> str:
    if j % 9 == 5:
        return f"https://{host}/sub/page-{j}.html"
    if j % 11 == 7:
        return f"https://{host}/tmp-page-{j}.html"
    return f"https://{host}/page-{j}.html"


def generate_pages(
    n_pages: int = 2000,
    n_hosts: int = 20,
    seed: int = 42,
    words_min: int = 20,
    words_max: int = 80,
) -> tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """Returns (pages, seeds, robots) as pandas frames.

    Host 0 is the heavy host (~30% of pages); the rest split evenly.
    Page j of a host links to its tree children (j*B+1..j*B+B), a few
    cross-host pages, and sometimes a query-variant of a child URL.
    """
    rng = random.Random(seed)
    # distinct registered domains (host-NNN.org) so per-host politeness,
    # budgets and skew salting actually discriminate between hosts
    hosts = [f"www.host-{i:03d}.org" for i in range(n_hosts)]
    heavy = max(1, int(n_pages * 0.3))
    rest = (n_pages - heavy) // max(1, n_hosts - 1)
    host_sizes = [heavy] + [rest] * (n_hosts - 1)

    rows = []
    for hi, (host, n) in enumerate(zip(hosts, host_sizes)):
        for j in range(n):
            url = _page_url(host, j)
            links = []
            for c in range(j * BRANCHING + 1, j * BRANCHING + 1 + BRANCHING):
                if c < n:
                    links.append(_page_url(host, c))
            # query-variant duplicate of the first child (canonicalization)
            if links and j % 6 == 2:
                links.append(links[0] + "?service=WMS&request=GetCapabilities")
            # cross-host links
            for _ in range(rng.randint(0, 2)):
                th = rng.randrange(n_hosts)
                tj = rng.randrange(max(1, host_sizes[th]))
                links.append(_page_url(hosts[th], tj))
            body_words = " ".join(
                rng.choices(WORDS, k=rng.randint(words_min, words_max))
            )
            island = ""
            if j % 10 == 3:
                island = _iso_island(host, j)
            elif j % 10 == 7:
                island = _dc_block(host, j)
            anchor_html = "".join(
                f'<a href="{l}">link {i}</a> ' for i, l in enumerate(links)
            )
            html = (
                f"<html><head><title>Page {j} of {host}</title>"
                "<script>var tracked = 1;</script></head>"
                "<!-- generated fixture -->"
                f"<body><h1>Page {j}</h1><p>{body_words}</p>"
                f"{island}{anchor_html}"
                "<style>p { color: black }</style></body></html>"
            ).encode("utf-8")
            ts = T0 + timedelta(seconds=(hi * 7919 + j * 13) % 2_000_000)
            rows.append(
                {
                    "url": url,
                    "warc_ts": ts,
                    "html": html,
                    "text": extract_text_py(html),
                    "lang": rng.choice(["eng", "spa", "deu", "fra"]),
                }
            )

    pages = pd.DataFrame(rows)
    seeds = pd.DataFrame(
        {"url": [f"https://{h}/page-0.html" for h in hosts], "depth": 0}
    )
    robots_rows = []
    for i, h in enumerate(hosts):
        robots_rows.append(
            {
                "registered_domain": f"host-{i:03d}.org",
                "skip_pattern": r"tmp-page" if i % 2 == 0 else None,
                "no_recurse_prefix": f"https://{h}/sub/" if i % 3 == 2 else None,
                "crawl_delay": 0.0,
                "max_pages": None,
            }
        )
    robots = pd.DataFrame(robots_rows).astype({"max_pages": "Int64"})
    return pages, seeds, robots


def _page_row(hi: int, j: int, hosts: list[str], host_sizes: list[int],
              rng: random.Random, words_min: int, words_max: int) -> dict:
    """One deterministic page row. ``rng`` must be seeded per page so the
    output is a pure function of (host index, page index) — identical
    whether generated on the driver or on any executor partitioning."""
    host = hosts[hi]
    n = host_sizes[hi]
    url = _page_url(host, j)
    links = [
        _page_url(host, c)
        for c in range(j * BRANCHING + 1, j * BRANCHING + 1 + BRANCHING)
        if c < n
    ]
    if links and j % 6 == 2:
        links.append(links[0] + "?service=WMS&request=GetCapabilities")
    for _ in range(rng.randint(0, 2)):
        th = rng.randrange(len(hosts))
        tj = rng.randrange(max(1, host_sizes[th]))
        links.append(_page_url(hosts[th], tj))
    body_words = _body_words(rng, words_min, words_max)
    island = ""
    if j % 10 == 3:
        island = _iso_island(host, j)
    elif j % 10 == 7:
        island = _dc_block(host, j)
    anchor_html = "".join(
        f'<a href="{l}">link {i}</a> ' for i, l in enumerate(links)
    )
    html = (
        f"<html><head><title>Page {j} of {host}</title>"
        "<script>var tracked = 1;</script></head>"
        "<!-- generated fixture -->"
        f"<body><h1>Page {j}</h1><p>{body_words}</p>"
        f"{island}{anchor_html}"
        "<style>p { color: black }</style></body></html>"
    ).encode("utf-8")
    ts = T0 + timedelta(seconds=(hi * 7919 + j * 13) % 2_000_000)
    return {
        "url": url,
        "warc_ts": ts,
        "html": html,
        "text": extract_text_py(html),
        "lang": ["eng", "spa", "deu", "fra"][(hi * 31 + j * 7) % 4],
    }


def generate_pages_distributed(
    spark: SparkSession,
    n_pages: int = 100_000,
    n_hosts: int = 60,
    seed: int = 42,
    words_min: int = 150,
    words_max: int = 400,
    seed_every: int | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Executor-side corpus generation for bench scale.

    Each page is a pure function of its global index (per-page seeded
    RNG), so the corpus is identical at any partitioning/parallelism —
    the property that makes the two-cluster-size scaling benchmark
    compare identical inputs. Driver never materializes the corpus.
    """
    hosts = [f"www.host-{i:03d}.org" for i in range(n_hosts)]
    heavy = max(1, int(n_pages * 0.3))
    rest = (n_pages - heavy) // max(1, n_hosts - 1)
    host_sizes = [heavy] + [rest] * (n_hosts - 1)
    offsets = []
    acc = 0
    for s in host_sizes:
        offsets.append(acc)
        acc += s
    total = acc

    def _gen(pdf_iter):
        import pandas as pd  # noqa: PLC0415 (executor-side import)

        for pdf in pdf_iter:
            rows = []
            for gid in pdf["id"]:
                gid = int(gid)
                # host index by offset bisection (few hosts -> linear ok)
                hi = 0
                for k in range(len(offsets) - 1, -1, -1):
                    if gid >= offsets[k]:
                        hi = k
                        break
                j = gid - offsets[hi]
                rng = random.Random((seed << 20) ^ gid)
                rows.append(
                    _page_row(hi, j, hosts, host_sizes, rng, words_min, words_max)
                )
            yield pd.DataFrame(rows)

    pages = (
        spark.range(0, total, 1, spark.sparkContext.defaultParallelism)
        .mapInPandas(
            _gen,
            schema="url string, warc_ts timestamp, html binary, text string, lang string",
        )
    )
    # seed_every=None: one root seed per host (deep-crawl shape, many
    # BFS rounds). seed_every=N: every Nth page of each host is a seed
    # (wide-recrawl shape — few rounds with production-sized batches,
    # the steady-state regime of a 10^10-URL frontier).
    if seed_every is None:
        seed_urls = [f"https://{h}/page-0.html" for h in hosts]
    else:
        seed_urls = [
            _page_url(h, j)
            for hi, h in enumerate(hosts)
            for j in range(0, host_sizes[hi], seed_every)
        ]
    seeds = spark.createDataFrame(
        pd.DataFrame({"url": seed_urls, "depth": 0}),
        schema="url string, depth int",
    )
    robots_rows = [
        {
            "registered_domain": f"host-{i:03d}.org",
            "skip_pattern": r"tmp-page" if i % 2 == 0 else None,
            "no_recurse_prefix": f"https://{h}/sub/" if i % 3 == 2 else None,
            "crawl_delay": 0.0,
            "max_pages": None,
        }
        for i, h in enumerate(hosts)
    ]
    robots_pd = pd.DataFrame(robots_rows)
    robots = spark.createDataFrame(
        robots_pd.astype(object).where(robots_pd.notna(), None),
        schema=(
            "registered_domain string, skip_pattern string, "
            "no_recurse_prefix string, crawl_delay double, max_pages int"
        ),
    )
    return pages, seeds, robots


_URL_J = re.compile(r"host-(\d+)\.org/(?:sub/)?(?:tmp-)?page-(\d+)\.html$")


def make_fetch_fn(
    n_pages: int,
    n_hosts: int,
    seed: int = 42,
    words_min: int = 150,
    words_max: int = 400,
):
    """Per-URL fetch stand-in: a mapInPandas body (url) -> (url, html)
    that REGENERATES the page from the URL alone.

    Every fixture page is a pure function of (host index, page index),
    both of which the URL encodes — so fetching is per-URL compute
    (synthesize + parse), exactly the cost shape of a real HTTP fetch,
    with NO page-store scan. The join-against-store fetch costs
    O(corpus) per round (the whole store streams past the probe), which
    is an artifact of the stand-in, not of the crawl design; this
    variant keeps the round cost O(batch) like production. Bytes are
    identical to the stored corpus (asserted by test), so parity,
    determinism and resume behave identically in both modes.
    """
    hosts = [f"www.host-{i:03d}.org" for i in range(n_hosts)]
    heavy = max(1, int(n_pages * 0.3))
    rest = (n_pages - heavy) // max(1, n_hosts - 1)
    host_sizes = [heavy] + [rest] * (n_hosts - 1)
    offsets = []
    acc = 0
    for s in host_sizes:
        offsets.append(acc)
        acc += s

    def _fetch(pdf_iter):
        import pandas as pd  # noqa: PLC0415 (executor-side import)

        for pdf in pdf_iter:
            out_urls, out_html = [], []
            for url in pdf["url"]:
                m = _URL_J.search(url)
                if not m:
                    continue  # 404 analog: no such page
                hi, j = int(m.group(1)), int(m.group(2))
                if hi >= n_hosts or j >= host_sizes[hi]:
                    continue
                if _page_url(hosts[hi], j) != url:
                    continue  # e.g. tmp-page name for a plain-page index
                gid = offsets[hi] + j
                rng = random.Random((seed << 20) ^ gid)
                row = _page_row(
                    hi, j, hosts, host_sizes, rng, words_min, words_max
                )
                out_urls.append(url)
                out_html.append(row["html"])
            yield pd.DataFrame({"url": out_urls, "html": out_html})

    return _fetch


def load_pages(
    spark: SparkSession,
    n_pages: int = 2000,
    n_hosts: int = 20,
    seed: int = 42,
    words_min: int = 20,
    words_max: int = 80,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    pages_pd, seeds_pd, robots_pd = generate_pages(
        n_pages, n_hosts, seed, words_min, words_max
    )
    # cache the fixture page store: without it every crawl round's
    # pages-probe job re-ships the whole pandas frame from the driver
    # (LocalTableScan); a real deployment reads a parquet/Iceberg store
    # where the probe is a pruned scan. Fixture sizes are <=100MB.
    pages = spark.createDataFrame(
        pages_pd,
        schema="url string, warc_ts timestamp, html binary, text string, lang string",
    ).cache()
    seeds = spark.createDataFrame(seeds_pd, schema="url string, depth int")
    robots = spark.createDataFrame(
        robots_pd.astype(object).where(robots_pd.notna(), None),
        schema=(
            "registered_domain string, skip_pattern string, "
            "no_recurse_prefix string, crawl_delay double, max_pages int"
        ),
    )
    return pages, seeds, robots
