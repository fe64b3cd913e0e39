"""Crawl-loop integration of trap defense and rank-weighted budgets:
an exploding low-diversity URL space stops receiving fetch budget
once flagged (and kill/resume stays deterministic, since the trap
table is a pure function of committed records), and host_priority
scales per-host budgets through pick_batch."""

from __future__ import annotations

import os
from datetime import datetime

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pygeodatacrawler_spark.plans.crawl import CrawlEngine

TS = datetime(2024, 1, 2, 3, 4, 5)


def _trap_corpus(spark):
    """good.org: 4 distinct pages. trap.org: a binary calendar tree of
    200 structurally-identical pages (node k links to 2k+1, 2k+2), all
    extracting to the same text."""
    rows = []

    def page(url, body_html, text_hint):
        rows.append((url, TS, body_html.encode(), text_hint, "en"))

    kids = ["a", "b", "c"]
    page(
        "http://good.org/",
        "<html><body><p>welcome</p>"
        + "".join(f"<a href='http://good.org/{k}'>{k}</a>" for k in kids)
        + "</body></html>",
        "welcome",
    )
    for k in kids:
        page(
            f"http://good.org/{k}",
            f"<html><body><p>article {k} body text</p></body></html>",
            f"article {k}",
        )
    for k in range(200):
        links = "".join(
            f"<a href='http://trap.org/cal/{c}/{c * 7}/'>next</a>"
            for c in (2 * k + 1, 2 * k + 2)
            if c < 200
        )
        page(
            f"http://trap.org/cal/{k}/{k * 7}/",
            f"<html><body><p>empty calendar</p>{links}</body></html>",
            "empty calendar",
        )
    pages = spark.createDataFrame(
        pd.DataFrame(
            rows, columns=["url", "warc_ts", "html", "text", "lang"]
        ),
        schema="url string, warc_ts timestamp, html binary, text string, lang string",
    ).cache()
    seeds = spark.createDataFrame(
        [("http://good.org/", 0), ("http://trap.org/cal/0/0/", 0)],
        "url string, depth int",
    )
    return pages, seeds


def _trap_fetch_count(eng) -> int:
    return (
        eng.visits_view()
        .filter(F.col("canon_url").startswith("http://trap.org/"))
        .count()
    )


def test_trap_filter_cuts_explosion(spark, tmp_path):
    pages, seeds = _trap_corpus(spark)

    off = CrawlEngine(
        spark, os.path.join(str(tmp_path), "off"), pages, None, host_budget=500
    )
    off.init_from_seeds(seeds)
    off.run(max_rounds=20)
    assert _trap_fetch_count(off) == 200  # unprotected: whole tree

    on = CrawlEngine(
        spark, os.path.join(str(tmp_path), "on"), pages, None,
        host_budget=500, trap_every=2, trap_min_urls=20,
        trap_max_diversity=0.1,
    )
    on.init_from_seeds(seeds)
    on.run(max_rounds=20)
    # tree doubles per round: 1+2+...+32 = 63 fetched before the
    # round-6 boundary flags the template; nothing after
    n_trap = _trap_fetch_count(on)
    assert n_trap == 63
    # healthy host untouched by the trap machinery
    good = (
        on.visits_view()
        .filter(F.col("canon_url").startswith("http://good.org/"))
        .count()
    )
    assert good == 4


def test_trap_filter_resume_deterministic(spark, tmp_path):
    pages, seeds = _trap_corpus(spark)
    opts = dict(
        host_budget=500, trap_every=2, trap_min_urls=20,
        trap_max_diversity=0.1,
    )

    solid = CrawlEngine(
        spark, os.path.join(str(tmp_path), "solid"), pages, None, **opts
    )
    solid.init_from_seeds(seeds)
    solid.run(max_rounds=20)

    wd = os.path.join(str(tmp_path), "killed")
    first = CrawlEngine(spark, wd, pages, None, **opts)
    first.init_from_seeds(seeds)
    first.run(max_rounds=5)  # killed mid-crawl (post-flag rounds remain)
    resumed = CrawlEngine(spark, wd, pages, None, **opts)
    resumed.run(max_rounds=20)

    a = sorted(
        (r["canon_url"], r["round"])
        for r in solid.visits_view().collect()
    )
    b = sorted(
        (r["canon_url"], r["round"])
        for r in resumed.visits_view().collect()
    )
    assert a == b


def test_host_priority_budget_shaping(spark):
    from pygeodatacrawler_spark.operators.frontier import pick_batch

    rows = [
        (f"http://{h}/p{i}", f"http://{h}/p{i}", h, 1, i)
        for h in ("a.org", "b.org", "c.org")
        for i in range(10)
    ]
    frontier = spark.createDataFrame(
        rows,
        "url string, canon_url string, registered_domain string, "
        "depth int, discovery_ts long",
    )
    prio = spark.createDataFrame(
        [("a.org", 0.5), ("b.org", 2.0)],
        "registered_domain string, budget_factor double",
    )
    got = (
        pick_batch(frontier, None, host_budget=4, host_priority=prio)
        .groupBy("registered_domain")
        .count()
        .collect()
    )
    by = {r["registered_domain"]: r["count"] for r in got}
    # a: floor(4*0.5)=2, b: floor(4*2)=8, c (no row): default 4
    assert by == {"a.org": 2, "b.org": 8, "c.org": 4}


def test_budget_factors_from_pagerank(spark):
    from pygeodatacrawler_spark.operators.linkrank import (
        budget_factors_from_pagerank,
    )

    ranks = spark.createDataFrame(
        [("a", 0.1), ("b", 0.3), ("c", 0.5)], "host string, rank double"
    )
    f = {
        r["registered_domain"]: r["budget_factor"]
        for r in budget_factors_from_pagerank(ranks, lo=0.5, hi=2.0).collect()
    }
    assert f["a"] == pytest.approx(0.5)
    assert f["b"] == pytest.approx(1.25)
    assert f["c"] == pytest.approx(2.0)
    # degenerate all-equal ranks -> neutral factor
    same = spark.createDataFrame(
        [("a", 0.5), ("b", 0.5)], "host string, rank double"
    )
    g = {
        r["registered_domain"]: r["budget_factor"]
        for r in budget_factors_from_pagerank(same).collect()
    }
    assert g == {"a": 1.0, "b": 1.0}
