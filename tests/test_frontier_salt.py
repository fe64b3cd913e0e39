"""Fused politeness + salt semantics (operators/frontier.py pick_batch):
one exchange carries rank, budget cap, and the salt decision."""

from __future__ import annotations

import pyspark.sql.functions as F

from pygeodatacrawler_spark.operators.frontier import pick_batch


def _frontier(spark, hosts):
    # hosts: dict name -> n pending rows
    rows = [
        (
            f"https://{h}/p{i}.html",
            f"https://{h}/p{i}.html",
            h,
            i % 3,
            0,
            "pending",
        )
        for h, n in hosts.items()
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows,
        "url string, canon_url string, registered_domain string, "
        "depth int, discovery_ts long, state string",
    )


def test_budget_cap_and_rank(spark):
    f = _frontier(spark, {"a.org": 30, "b.org": 5})
    out = pick_batch(f, host_budget=10).collect()
    per = {}
    for r in out:
        per.setdefault(r["registered_domain"], []).append(r["host_rank"])
    assert sorted(per["a.org"]) == list(range(1, 11))  # capped at budget
    assert sorted(per["b.org"]) == list(range(1, 6))


def test_salt_widths_scale_with_capped_batch(spark):
    f = _frontier(spark, {"heavy.org": 5000, "mid.org": 1200, "small.org": 300})
    out = pick_batch(
        f, host_budget=3000, salt_threshold=1000, salt_buckets=64
    ).collect()
    salts = {}
    for r in out:
        salts.setdefault(r["registered_domain"], set()).add(r["salt"])
    # heavy capped at 3000 -> ceil(3000/500)=6 salt buckets
    assert len(salts["heavy.org"]) == 6
    assert max(salts["heavy.org"]) <= 5
    # mid (1200 rows) above threshold -> ceil(1200/500)=3 buckets
    assert len(salts["mid.org"]) == 3
    # small host stays unsalted and co-located
    assert salts["small.org"] == {0}
    # budget cap still exact under salting
    assert sum(1 for r in out if r["registered_domain"] == "heavy.org") == 3000


def test_delay_free_hosts_slice_below_threshold(spark):
    robots = spark.createDataFrame(
        [
            ("paced.org", None, None, 1.5, None),
            ("free.org", None, None, 0.0, None),
        ],
        "registered_domain string, skip_pattern string, "
        "no_recurse_prefix string, crawl_delay double, max_pages int",
    )
    f = _frontier(spark, {"paced.org": 2000, "free.org": 2000})
    out = pick_batch(
        f, robots, host_budget=2500, salt_threshold=100_000, salt_buckets=64
    ).collect()
    salts = {}
    for r in out:
        salts.setdefault(r["registered_domain"], set()).add(r["salt"])
    # neither host crosses the heavy threshold; the delay-free one is
    # sliced anyway (co-location only buys pacing), the paced one is
    # kept in one task so per-host delay spacing stays enforceable
    assert salts["paced.org"] == {0}
    assert len(salts["free.org"]) == 4  # ceil(2000/500)
