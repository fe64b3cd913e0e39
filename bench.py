"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value", "unit": "sec", "queries": {name: sec},
"sf": ...}. Also reports crawl-loop throughput (URLs fetched+deduped
per second) on the synthetic pages corpus — the north-rule metric.

The two-cluster-size scaling protocol (local[8] vs local[32]) lives in
tools/bench_scaling.py; its results go to BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "pricing_summary",
    "market_share",
    "topk_per_group",
    "first_match",
    "tumbling_window",
    "sessionize",
    "dedup_exact",
    "minhash_signature",
    "ngram_jaccard",
    "simhash",
    "ann_topk",
    "lang_id",
    "quality",
    "fingerprint",
    "canonicalize",
    "crawl_bfs",
]

# crawl corpus sized relative to sf (pages ~ lineitem rows / 10)
CRAWL_PAGES = {"0.001": 600, "0.01": 6000, "0.1": 20000}


def _sf_from_dir(sf_dir: str) -> str:
    base = os.path.basename(sf_dir.rstrip("/"))
    return base[2:] if base.startswith("sf") else base


def run_query(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = _sf_from_dir(sf_dir)

    from pygeodatacrawler_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("bench", master=f"local[{cpus}]")
    qs = entrymod.queries()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        df = qs[name](spark, sf_dir)
        df.count()  # warm plan+scan once so timing is the operator, not JIT
        t0 = time.monotonic()
        run_query(df)
        timings[name] = round(time.monotonic() - t0, 3)

    # crawl throughput: full frontier loop on the synthetic pages corpus
    from pygeodatacrawler_spark.fixtures import load_pages
    from pygeodatacrawler_spark.plans.crawl import CrawlEngine

    n_pages = CRAWL_PAGES.get(sf, 6000)
    pages, seeds, robots = load_pages(spark, n_pages=n_pages, n_hosts=40)
    pages = pages.cache()
    pages.count()
    with tempfile.TemporaryDirectory() as tmp:
        eng = CrawlEngine(
            spark, tmp, pages, robots, host_budget=2000, bloom_buckets=16,
            # 2 BFS levels per snapshot commit: state is byte-identical
            # to sequential rounds (tests/test_crawl_fused.py) but the
            # per-commit floor is paid half as often
            levels_per_commit=int(os.environ.get("SPARK_GRAFT_LEVELS", "2")),
        )
        eng.init_from_seeds(seeds)
        t0 = time.monotonic()
        stats = eng.run(max_rounds=50)
        crawl_wall = time.monotonic() - t0
    timings["crawl_loop"] = round(crawl_wall, 3)
    urls_per_sec = stats.urls_fetched / crawl_wall if crawl_wall else 0.0

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_plus_crawl_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "crawl": {
                    "pages": n_pages,
                    "urls_fetched": stats.urls_fetched,
                    "urls_discovered": stats.urls_discovered,
                    "rounds": stats.rounds,
                    "urls_per_sec": round(urls_per_sec, 1),
                },
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
