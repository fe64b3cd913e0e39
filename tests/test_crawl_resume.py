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


class _Boom(RuntimeError):
    pass


def _crash_mid_round(spark, pages, seeds, robots, tmp, crash_point: str):
    """Run 1 clean round, then crash round 2 mid-commit: either after
    the records append but before the frontier merge ('after_records')
    or after both table writes but before the lineage line
    ('before_lineage') — the two non-atomic windows ADVICE.md flags."""
    eng = CrawlEngine(spark, tmp, pages, robots, host_budget=BUDGET)
    eng.init_from_seeds(seeds)
    eng.run(max_rounds=1)

    crasher = CrawlEngine(spark, tmp, pages, robots, host_budget=BUDGET)
    if crash_point == "after_records":
        crasher.frontier.merge_upsert = lambda *a, **k: (_ for _ in ()).throw(
            _Boom()
        )
    else:
        orig = crasher._append_lineage

        def _boom(line):
            if line["round"] >= 1:
                raise _Boom()
            orig(line)

        crasher._append_lineage = _boom
    try:
        crasher.run(max_rounds=5)
    except _Boom:
        pass
    else:  # pragma: no cover
        raise AssertionError("crash did not fire")


def _collect_state(eng):
    vis = sorted(
        (r["round"], r["rank_in_round"], r["canon_url"])
        for r in eng.visits_view().collect()
    )
    fro = sorted((r["url_hash"], r["state"]) for r in eng.frontier.read().collect())
    rec = sorted(
        (r["canon_url"], r["text_sha2"]) for r in eng.records.read().collect()
    )
    return vis, fro, rec


def test_mid_round_crash_replays_identically(spark):
    """A crash between the frontier merge, the records append, and the
    lineage commit must not double-append records or advance frontier
    state for an uncommitted round: reconcile() rolls the partial writes
    back and the replay converges to the uninterrupted run."""
    pages, seeds, robots = load_pages(spark, n_pages=N_PAGES, n_hosts=N_HOSTS)
    full = _final_state(spark, pages, seeds, robots, interrupt=False)
    for crash_point in ("after_records", "before_lineage"):
        with tempfile.TemporaryDirectory() as tmp:
            _crash_mid_round(spark, pages, seeds, robots, tmp, crash_point)
            fresh = CrawlEngine(spark, tmp, pages, robots, host_budget=BUDGET)
            fresh.run(max_rounds=50)
            assert _collect_state(fresh) == full, crash_point


def test_incremental_frontier_cache_matches_disk_resolve(spark):
    # The engine maintains the resolved frontier incrementally
    # (broadcast state-flip + delta union) instead of re-running the
    # merge-on-read window every round; the invariant is that the
    # cached state ALWAYS equals what SnapshotTable.read() resolves
    # from disk — checked here mid-run (between compactions) and at
    # convergence (after at least one compaction refresh).
    pages, seeds, robots = load_pages(spark, n_pages=N_PAGES, n_hosts=N_HOSTS)
    with tempfile.TemporaryDirectory() as tmp:
        eng = CrawlEngine(spark, tmp, pages, robots, host_budget=BUDGET)
        eng.frontier.compact_every = 4  # force a compaction mid-run
        eng.init_from_seeds(seeds)
        eng.run(max_rounds=3)
        mid_cache = sorted(map(tuple, eng._frontier_df.collect()))
        mid_disk = sorted(map(tuple, eng.frontier.read().collect()))
        assert mid_cache == mid_disk and len(mid_cache) > 0
        stats = eng.run(max_rounds=50)
        assert stats.rounds > 4  # crossed a compaction refresh
        end_cache = sorted(map(tuple, eng._frontier_df.collect()))
        end_disk = sorted(map(tuple, eng.frontier.read().collect()))
        assert end_cache == end_disk
