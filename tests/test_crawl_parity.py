"""Engine ↔ sequential-oracle parity: visit order, URL-seen membership,
byte-identical extracted text (BASELINE.json north-rule invariants)."""

from __future__ import annotations

import tempfile

import pyspark.sql.functions as F
import pytest

from pygeodatacrawler_spark.fixtures import generate_pages, load_pages
from pygeodatacrawler_spark.oracle.refcrawl import crawl_oracle
from pygeodatacrawler_spark.plans.crawl import CrawlEngine

N_PAGES = 600
N_HOSTS = 10
BUDGET = 25


@pytest.fixture(scope="module")
def crawl_result(spark):
    pages, seeds, robots = load_pages(spark, n_pages=N_PAGES, n_hosts=N_HOSTS)
    pages_pd, seeds_pd, robots_pd = generate_pages(n_pages=N_PAGES, n_hosts=N_HOSTS)
    with tempfile.TemporaryDirectory() as tmp:
        eng = CrawlEngine(
            spark, tmp, pages, robots, host_budget=BUDGET, bloom_buckets=8
        )
        eng.init_from_seeds(seeds)
        eng.run(max_rounds=30)
        visits = eng.visits_view().collect()
        frontier = eng.frontier.read().collect()
        records = eng.records.read().collect()
        lineage = eng.lineage_df().collect()
    oracle = crawl_oracle(
        pages_pd, seeds_pd, robots_pd, host_budget=BUDGET, max_rounds=30
    )
    return visits, frontier, records, lineage, oracle


def test_visit_order_parity(crawl_result):
    visits, _, _, _, oracle = crawl_result
    got = sorted(
        [(v["round"], v["rank_in_round"], v["canon_url"]) for v in visits]
    )
    want = sorted(
        [(v["round"], v["rank_in_round"], v["canon_url"]) for v in oracle.visits]
    )
    assert got == want


def test_seen_membership_parity(crawl_result):
    _, frontier, _, _, oracle = crawl_result
    got = {r["canon_url"] for r in frontier}
    assert got == oracle.seen


def test_extracted_text_byte_identical(crawl_result):
    _, _, records, _, oracle = crawl_result
    got = {r["canon_url"]: r["text_sha2"] for r in records}
    assert got == oracle.text_sha


def test_allow_precedence_crawl_parity(spark):
    """Engine ↔ oracle parity with a robots table that carries Allow
    rules: RFC 9309 longest-match must give the same visit order and
    seen set on both sides, and the allowed exception URLs must
    actually be crawled."""
    from pygeodatacrawler_spark.functions.robots import (
        ROBOTS_TABLE_SCHEMA,
        robots_rules_row,
    )

    import pandas as pd

    n_pages, n_hosts = 300, 6
    pages, seeds, _ = load_pages(spark, n_pages=n_pages, n_hosts=n_hosts)
    pages_pd, seeds_pd, _ = generate_pages(n_pages=n_pages, n_hosts=n_hosts)
    txt = "User-agent: *\nDisallow: /tmp-page\nAllow: /tmp-page-18\n"
    rows = [
        robots_rules_row(f"host-{i:03d}.org", txt if i % 2 == 0 else None)
        for i in range(n_hosts)
    ]
    robots = spark.createDataFrame(rows, ROBOTS_TABLE_SCHEMA)
    robots_pd = pd.DataFrame(rows)
    with tempfile.TemporaryDirectory() as tmp:
        eng = CrawlEngine(spark, tmp, pages, robots, host_budget=BUDGET)
        eng.init_from_seeds(seeds)
        eng.run(max_rounds=30)
        visits = eng.visits_view().collect()
        fetched = {
            v["canon_url"]
            for v in visits
        }
    oracle = crawl_oracle(
        pages_pd, seeds_pd, robots_pd, host_budget=BUDGET, max_rounds=30
    )
    got = sorted((v["round"], v["rank_in_round"], v["canon_url"]) for v in visits)
    want = sorted(
        (v["round"], v["rank_in_round"], v["canon_url"]) for v in oracle.visits
    )
    assert got == want
    # the Allow exception was actually crawled on a Disallow'd host,
    # and other tmp-pages on that host were not
    host0_tmp = {u for u in fetched if "host-000" in u and "tmp-page" in u}
    assert host0_tmp == {"https://www.host-000.org/tmp-page-18.html"}


def test_lineage_written(crawl_result):
    _, _, _, lineage, oracle = crawl_result
    assert len(lineage) >= 1
    assert sum(l["rows_in"] for l in lineage) == oracle.fetched
    for l in lineage:
        assert l["skew"] >= 1.0
        assert l["wall_s"] > 0
        # fetch-latency histogram (Observation piggyback): buckets cover
        # every record of the round; stand-in latencies are 20..200ms +
        # 1000ms for misses, so nothing may land below 20 -> bucket sums
        # match rows_in exactly
        assert sum(l["lat_hist"]) == l["rows_in"]
        assert l["lat_mean"] is None or l["lat_mean"] > 0
