"""Fused rounds (levels_per_commit=2): N BFS levels per snapshot
commit must produce BYTE-IDENTICAL crawl state to N sequential
single-level rounds — same records (rounds, text hashes), same visit
ordering, same final frontier — while writing half the snapshots."""

from __future__ import annotations

import tempfile

import pyspark.sql.functions as F

from pygeodatacrawler_spark.fixtures import load_pages
from pygeodatacrawler_spark.plans.crawl import CrawlEngine

N_PAGES = 500
N_HOSTS = 8
BUDGET = 30


def _run(spark, levels):
    pages, seeds, robots = load_pages(spark, n_pages=N_PAGES, n_hosts=N_HOSTS)
    with tempfile.TemporaryDirectory() as tmp:
        eng = CrawlEngine(
            spark, tmp, pages, robots, host_budget=BUDGET,
            bloom_buckets=8, levels_per_commit=levels, fuse_min_batch=0,
        )
        eng.init_from_seeds(seeds)
        stats = eng.run(max_rounds=30)
        visits = sorted(
            (v["round"], v["rank_in_round"], v["canon_url"])
            for v in eng.visits_view().collect()
        )
        records = sorted(
            (r["round"], r["canon_url"], r["text_sha2"], r["depth"])
            for r in eng.records.read().collect()
        )
        frontier = sorted(
            (r["url_hash"], r["canon_url"], r["state"], r["depth"],
             r["discovery_ts"])
            for r in eng.frontier.read().collect()
        )
        n_commits = len(eng.stats.lineage)
    return stats, visits, records, frontier, n_commits


def test_fused_levels_identical_state(spark):
    s1, v1, r1, f1, c1 = _run(spark, levels=1)
    s2, v2, r2, f2, c2 = _run(spark, levels=2)
    assert v1 == v2          # visit ordering identical
    assert r1 == r2          # records identical (incl. round stamps)
    assert f1 == f2          # final frontier identical
    assert s1.urls_fetched == s2.urls_fetched
    assert s1.urls_discovered == s2.urls_discovered
    assert s1.rounds == s2.rounds  # BFS levels counted, not commits
    # the point of fusing: about half the commits
    assert c2 <= (c1 + 1) // 2 + 1


def test_fused_resume_round_advances_by_levels(spark):
    pages, seeds, robots = load_pages(spark, n_pages=200, n_hosts=4)
    with tempfile.TemporaryDirectory() as tmp:
        eng = CrawlEngine(
            spark, tmp, pages, robots, host_budget=20,
            levels_per_commit=2, fuse_min_batch=0,
        )
        eng.init_from_seeds(seeds)
        res = eng.run_round(0)
        assert res["levels"] == 2
        # a fresh engine over the same workdir resumes AFTER both levels
        eng2 = CrawlEngine(
            spark, tmp, pages, robots, host_budget=20,
            levels_per_commit=2, fuse_min_batch=0,
        )
        assert eng2.resume_round() == 2
