"""Freshness-driven recrawl: adaptive interval math (unit) and the
engine's flip-to-pending pass (e2e: refetch happens, history
accumulates, intervals grow on unchanged content)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from pygeodatacrawler_spark.operators.recrawl import recrawl_due


def _hist(spark, rows):
    return spark.createDataFrame(
        rows, "url_hash long, round int, text_sha2 string"
    )


def test_recrawl_interval_math(spark):
    recs = _hist(
        spark,
        [
            (1, 0, "a"), (1, 4, "a"),            # unchanged once -> 8
            (2, 0, "a"), (2, 4, "b"),            # changed -> base 4
            (3, 0, "a"),                          # single fetch -> base 4
            (4, 0, "a"), (4, 2, "a"), (4, 6, "a"), (4, 14, "a"),
            # three unchanged pairs -> 4*2^3=32, capped at 16
        ],
    )
    due = {
        r["url_hash"]: r
        for r in recrawl_due(
            recs, current_round=100, base_interval=4, max_interval=16
        ).collect()
    }
    assert due[1]["unchanged_streak"] == 1 and due[1]["interval"] == 8
    assert due[2]["unchanged_streak"] == 0 and due[2]["interval"] == 4
    assert due[3]["unchanged_streak"] == 0 and due[3]["interval"] == 4
    assert due[4]["unchanged_streak"] == 3 and due[4]["interval"] == 16
    assert due[1]["last_round"] == 4 and due[4]["last_round"] == 14


def test_recrawl_due_gate(spark):
    recs = _hist(spark, [(1, 10, "a"), (2, 2, "a")])
    # at round 12: url 2 (10+... last 2 + 4 <= 12) due, url 1 (10+4=14) not
    due = [
        r["url_hash"]
        for r in recrawl_due(recs, current_round=12, base_interval=4).collect()
    ]
    assert due == [2]


def test_engine_recrawl_roundtrip(spark, tmp_path):
    import tempfile

    from pygeodatacrawler_spark.fixtures import load_pages
    from pygeodatacrawler_spark.plans.crawl import CrawlEngine

    pages, seeds, robots = load_pages(spark, n_pages=200, n_hosts=4)
    wd = tempfile.mkdtemp(dir=str(tmp_path))
    eng = CrawlEngine(spark, wd, pages, robots, host_budget=60)
    eng.init_from_seeds(seeds)
    eng.run(max_rounds=10)
    recs0 = eng.records.read()
    n0 = recs0.count()
    n_urls = recs0.select("url_hash").distinct().count()
    assert n0 == n_urls  # one fetch each so far

    # robots-blocked discoveries stay pending forever; they are not
    # "due" (never fetched) and must survive the flip untouched
    pending0 = (
        eng.frontier.read().filter(F.col("state") == "pending").count()
    )

    # base_interval=1: every fetched URL is immediately due
    flipped = eng.enqueue_recrawl(base_interval=1)
    assert flipped == n_urls
    pending = eng.frontier.read().filter(F.col("state") == "pending").count()
    assert pending == n_urls + pending0

    eng2 = CrawlEngine(spark, wd, pages, robots, host_budget=60)
    eng2.run(max_rounds=10)
    recs1 = eng2.records.read()
    assert recs1.count() == 2 * n_urls  # full second sweep, no dupes beyond
    per_url = recs1.groupBy("url_hash").count()
    assert per_url.filter(F.col("count") != 2).count() == 0

    # store unchanged -> every URL now has an unchanged pair; at the
    # current round nothing is due under a grown interval until 2x
    # base rounds elapse
    cur = eng2.resume_round()
    due_now = recrawl_due(recs1, cur, base_interval=1000).count()
    assert due_now == 0
    streaks = recrawl_due(recs1, cur + 10_000, base_interval=1)
    assert streaks.filter(F.col("unchanged_streak") != 1).count() == 0


def _seeds(spark, rows):
    return spark.createDataFrame(rows, "url string, lastmod string")


def test_sitemap_delta_semantics(spark):
    from pygeodatacrawler_spark.operators.recrawl import sitemap_delta

    prev = _seeds(
        spark,
        [
            ("http://h.org/a", "2024-01-01"),
            ("http://h.org/b", "2024-01-01T00:00:00Z"),
            ("http://h.org/c", "2024-01-01"),
            ("http://h.org/d", None),
            ("http://h.org/e", "garbage"),
            ("http://h.org/f", "garbage"),
        ],
    )
    cur = _seeds(
        spark,
        [
            ("http://h.org/a", "2024-02-01"),           # advanced -> due
            ("http://h.org/b", "2024-01-01T00:00:00Z"),  # equal -> not due
            ("http://h.org/c", "2023-12-01"),           # went BACK -> not due
            ("http://h.org/d", "2024-01-05"),           # appeared -> due
            ("http://h.org/e", "other-garbage"),        # text diff -> due
            ("http://h.org/f", "garbage"),              # same garbage -> no
            ("http://h.org/new", None),                 # new url -> due
        ],
    )
    got = {r["url"]: r for r in sitemap_delta(prev, cur).collect()}
    assert set(got) == {
        "http://h.org/a", "http://h.org/d", "http://h.org/e",
        "http://h.org/new",
    }
    assert got["http://h.org/new"]["is_new"]
    assert not got["http://h.org/a"]["is_new"]
    assert got["http://h.org/a"]["prev_lastmod"] == "2024-01-01"


def test_engine_sitemap_changes_and_robots_refresh(spark, tmp_path):
    import tempfile

    from pygeodatacrawler_spark.fixtures import load_pages
    from pygeodatacrawler_spark.plans.crawl import CrawlEngine

    pages, seeds, robots = load_pages(spark, n_pages=150, n_hosts=3)
    wd = tempfile.mkdtemp(dir=str(tmp_path))
    eng = CrawlEngine(spark, wd, pages, robots, host_budget=60)
    eng.init_from_seeds(seeds)
    eng.run(max_rounds=10)
    fetched = [
        r["canon_url"]
        for r in eng.frontier.read()
        .filter(F.col("state") == "fetched")
        .orderBy("canon_url")
        .limit(3)
        .collect()
    ]
    n0 = eng.records.read().count()

    prev = _seeds(spark, [(u, "2024-01-01") for u in fetched])
    cur = _seeds(
        spark,
        [
            (fetched[0], "2024-03-01"),      # advanced -> refetch
            (fetched[1], "2024-01-01"),      # unchanged
            (fetched[2], "2024-01-01"),      # unchanged
            ("http://nowhere.example/x", "2024-03-01"),  # not in frontier
        ],
    )
    flipped = eng.enqueue_sitemap_changes(prev, cur)
    assert flipped == 1

    eng2 = CrawlEngine(spark, wd, pages, robots, host_budget=60)
    eng2.run(max_rounds=5)
    recs = eng2.records.read()
    assert recs.count() == n0 + 1
    refetched = (
        recs.groupBy("url_hash").count().filter(F.col("count") == 2)
    )
    assert refetched.count() == 1

    # RFC 9309 2.4 cache refresh: swap in a block-everything table and
    # flip a URL back to pending — the next run must not fetch it
    import pyspark.sql.functions as SF

    block_all = robots.withColumn("skip_pattern", SF.lit("."))
    eng2.refresh_robots(block_all)
    again = eng2.enqueue_sitemap_changes(
        prev, _seeds(spark, [(fetched[0], "2024-06-01")])
    )
    assert again == 1
    before = eng2.stats.urls_fetched  # stats accumulate per instance
    eng2.run(max_rounds=5)
    assert eng2.stats.urls_fetched == before  # blocked -> nothing fetched
    assert eng2.records.read().count() == n0 + 1
