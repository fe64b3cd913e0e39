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
