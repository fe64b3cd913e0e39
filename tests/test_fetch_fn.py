"""Per-URL fetch mode (fixtures.make_fetch_fn): the O(batch) fetch
stand-in must be indistinguishable from the join-against-store mode —
same bytes per URL, same crawl tables — so the scaling bench's use of
it measures the same system the parity tests pin."""

from __future__ import annotations

import tempfile

import pandas as pd
import pyspark.sql.functions as F

from pygeodatacrawler_spark.fixtures import (
    generate_pages_distributed,
    make_fetch_fn,
)
from pygeodatacrawler_spark.plans.crawl import CrawlEngine

N_PAGES, N_HOSTS = 800, 10


def _corpus(spark):
    return generate_pages_distributed(
        spark, n_pages=N_PAGES, n_hosts=N_HOSTS, words_min=20, words_max=80
    )


def test_fetch_fn_bytes_match_store(spark):
    pages, _, _ = _corpus(spark)
    sample = pages.limit(60).select("url", "html").collect()
    fetch = make_fetch_fn(N_PAGES, N_HOSTS, words_min=20, words_max=80)
    pdf = pd.DataFrame({"url": [r["url"] for r in sample]})
    out = pd.concat(list(fetch(iter([pdf]))))
    got = dict(zip(out["url"], out["html"]))
    assert len(got) == len(sample)
    for r in sample:
        assert bytes(got[r["url"]]) == bytes(r["html"])  # byte-identical


def test_fetch_fn_unknown_url_is_404(spark):
    fetch = make_fetch_fn(N_PAGES, N_HOSTS, words_min=20, words_max=80)
    pdf = pd.DataFrame(
        {
            "url": [
                "https://www.host-000.org/page-999999.html",  # out of range
                "https://www.other.org/page-1.html",  # unknown host
                "https://www.host-000.org/nothing.txt",  # unparseable
            ]
        }
    )
    out = pd.concat(list(fetch(iter([pdf]))))
    assert len(out) == 0


def test_fetch_fn_crawl_matches_store_crawl(spark):
    pages, seeds, robots = _corpus(spark)
    pages = pages.cache()
    fetch = make_fetch_fn(N_PAGES, N_HOSTS, words_min=20, words_max=80)

    eng_store = CrawlEngine(
        spark, tempfile.mkdtemp(), pages, robots, host_budget=60
    )
    eng_store.init_from_seeds(seeds)
    s1 = eng_store.run(max_rounds=8)

    eng_fn = CrawlEngine(
        spark, tempfile.mkdtemp(), None, robots, host_budget=60, fetch_fn=fetch
    )
    eng_fn.init_from_seeds(seeds)
    s2 = eng_fn.run(max_rounds=8)

    assert s1.urls_fetched == s2.urls_fetched and s1.rounds == s2.rounds
    a = {
        (r["canon_url"], r["text_sha2"])
        for r in eng_store.records.read().select("canon_url", "text_sha2").collect()
    }
    b = {
        (r["canon_url"], r["text_sha2"])
        for r in eng_fn.records.read().select("canon_url", "text_sha2").collect()
    }
    assert a == b  # identical fetched set + identical extracted bytes
    order = ["round", "rank_in_round"]
    va = [
        (r["canon_url"], r["depth"])
        for r in eng_store.visits_view().orderBy(*order).collect()
    ]
    vb = [
        (r["canon_url"], r["depth"])
        for r in eng_fn.visits_view().orderBy(*order).collect()
    ]
    assert va == vb  # identical visit order
    pages.unpersist()


def test_incremental_bloom_path_matches_exact(spark):
    # bloom forced ON (threshold 0): round 1 full-builds, every later
    # round folds only the frontier delta (capacity-doubling rebuilds
    # excepted) — final tables must equal the plain anti-join engine's
    pages, seeds, robots = _corpus(spark)
    fetch = make_fetch_fn(N_PAGES, N_HOSTS, words_min=20, words_max=80)

    eng_exact = CrawlEngine(
        spark, tempfile.mkdtemp(), None, robots, host_budget=60, fetch_fn=fetch
    )
    eng_exact.init_from_seeds(seeds)
    s1 = eng_exact.run(max_rounds=8)

    eng_bloom = CrawlEngine(
        spark, tempfile.mkdtemp(), None, robots, host_budget=60,
        fetch_fn=fetch, bloom_min_frontier=0, bloom_buckets=4,
    )
    eng_bloom.init_from_seeds(seeds)
    s2 = eng_bloom.run(max_rounds=8)

    assert s1.urls_fetched == s2.urls_fetched and s1.rounds == s2.rounds
    a = {
        (r["url_hash"], r["state"])
        for r in eng_exact.frontier.read().select("url_hash", "state").collect()
    }
    b = {
        (r["url_hash"], r["state"])
        for r in eng_bloom.frontier.read().select("url_hash", "state").collect()
    }
    assert a == b
