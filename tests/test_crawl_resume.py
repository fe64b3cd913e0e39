"""Kill/resume determinism (north rule): a crawl interrupted after k
rounds and resumed by a fresh engine converges to tables identical to
an uninterrupted run."""

from __future__ import annotations

import tempfile

from pygeodatacrawler_spark.fixtures import load_pages
from pygeodatacrawler_spark.plans.crawl import CrawlEngine

N_PAGES = 400
N_HOSTS = 6
BUDGET = 20


def _final_state(spark, pages, seeds, robots, interrupt: bool):
    with tempfile.TemporaryDirectory() as tmp:
        eng = CrawlEngine(spark, tmp, pages, robots, host_budget=BUDGET)
        eng.init_from_seeds(seeds)
        if interrupt:
            eng.run(max_rounds=2)  # "killed" after 2 committed rounds
            eng2 = CrawlEngine(spark, tmp, pages, robots, host_budget=BUDGET)
            eng2.run(max_rounds=50)
            final = eng2
        else:
            eng.run(max_rounds=50)
            final = eng
        vis = sorted(
            (r["round"], r["rank_in_round"], r["canon_url"])
            for r in final.visits_view().collect()
        )
        fro = sorted(
            (r["url_hash"], r["state"]) for r in final.frontier.read().collect()
        )
        rec = sorted(
            (r["canon_url"], r["text_sha2"]) for r in final.records.read().collect()
        )
        return vis, fro, rec


def test_resume_is_deterministic(spark):
    pages, seeds, robots = load_pages(spark, n_pages=N_PAGES, n_hosts=N_HOSTS)
    full = _final_state(spark, pages, seeds, robots, interrupt=False)
    resumed = _final_state(spark, pages, seeds, robots, interrupt=True)
    assert full[0] == resumed[0]  # visit order
    assert full[1] == resumed[1]  # frontier states
    assert full[2] == resumed[2]  # records + text hashes
