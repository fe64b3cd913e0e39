"""Host-graph link analysis: PageRank for crawl prioritization.

The engine's frontier priority is (depth, host-budget, discovery_ts)
— the reference's traversal order re-expressed (mapfile.py:116,
metadata.py:108 walk folders depth-first in name order). A web
frontier at 10^10 URLs additionally wants an IMPORTANCE signal so
fetch budget goes to well-linked hosts first (the classic
crawl-ordering result: PageRank/OPIC-ordered crawling front-loads
high-value pages). This module computes PageRank over the HOST graph
— hosts, not URLs, because (a) the host graph is ~4 orders of
magnitude smaller (10^6-10^7 hosts for 10^10 URLs: it fits the
standard iterative-join pattern without checkpoint pressure), and
(b) politeness already schedules per host, so a per-host prior is
the natural unit the scheduler can consume.

Scale shape:

- Edges are aggregated once (groupBy src,dst + weight) and CACHED;
  each power iteration is ONE shuffle (the edge-join) followed by a
  groupBy(dst) with map-side partial sums. Pre-repartitioning edges
  and ranks on the join key keeps every iteration's exchange reused
  from the cache.
- Dangling mass (hosts with no outlinks) is redistributed uniformly
  each iteration via a scalar aggregate — without it ranks leak and
  the vector no longer sums to 1 (the standard correction).
- Fixed iteration count, no driver-side convergence loop over
  .collect(): K=10-20 iterations is the published operating point;
  each iteration materializes via localCheckpoint to cut the lineage
  chain that otherwise grows linearly and blows analysis time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pygeodatacrawler_spark.functions.urls import url_host


def host_edges(records: DataFrame, key: str = "host") -> DataFrame:
    """(url, links[]) records -> weighted host-graph edges
    (src, dst, weight). Self-loops are dropped (a host linking to
    itself carries no cross-host endorsement); weight = number of
    links, later normalized by the src's total outweight.
    ``key='domain'`` aggregates on registered_domain instead — the
    politeness/budget key, so ranks line up with the scheduler."""
    from pygeodatacrawler_spark.functions.urls import registered_domain

    key_fn = registered_domain if key == "domain" else url_host
    e = records.select(
        key_fn(F.col("url")).alias("src"),
        F.explode("links").alias("link"),
    ).select("src", key_fn(F.col("link")).alias("dst"))
    return (
        e.filter(
            (F.col("src") != "") & (F.col("dst") != "")
            & (F.col("src") != F.col("dst"))
        )
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("weight"))
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    partitions: int | None = None,
) -> DataFrame:
    """Weighted PageRank over (src, dst, weight) -> (host, rank);
    ranks sum to 1. Deterministic: fixed iteration count, no RNG."""
    spark = edges.sparkSession
    n_part = partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    hosts = (
        edges.select(F.col("src").alias("host"))
        .union(edges.select(F.col("dst").alias("host")))
        .distinct()
        .repartition(n_part, "host")
        .cache()
    )
    n = hosts.count()  # also materializes the cache
    if n == 0:
        return spark.createDataFrame([], "host string, rank double")

    # out-weight-normalized transition edges, partitioned on the join
    # key once; every iteration reuses this layout from cache
    out_w = edges.groupBy("src").agg(F.sum("weight").alias("out_w"))
    trans = (
        edges.join(out_w, "src")
        .select(
            F.col("src").alias("host"),
            "dst",
            (F.col("weight") / F.col("out_w")).alias("p"),
        )
        .repartition(n_part, "host")
        .cache()
    )
    trans.count()

    src_hosts = trans.select("host").distinct().cache()
    src_hosts.count()

    ranks = hosts.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for _ in range(iterations):
        contrib = (
            ranks.join(trans, "host")
            .groupBy(F.col("dst").alias("host"))
            .agg(F.sum(F.col("rank") * F.col("p")).alias("in_rank"))
        )
        # dangling hosts (no outgoing transition rows) spread their
        # mass uniformly: (1 - mass that transitions)/n, computed
        # INSIDE the plan (scalar aggregate cross-joined back) so each
        # iteration stays one job with no driver round-trip
        dangling = ranks.join(src_hosts, "host").agg(
            ((F.lit(1.0) - F.coalesce(F.sum("rank"), F.lit(0.0))) / n).alias(
                "dangling"
            )
        )
        ranks = (
            hosts.join(contrib, "host", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "host",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("in_rank"), F.lit(0.0))
                        + F.col("dangling")
                    )
                ).alias("rank"),
            )
            .repartition(n_part, "host")
            .localCheckpoint(eager=True)
        )
    trans.unpersist()
    hosts.unpersist()
    src_hosts.unpersist()
    return ranks


def budget_factors_from_pagerank(
    ranks: DataFrame,
    lo: float = 0.5,
    hi: float = 2.0,
) -> DataFrame:
    """(host, rank) -> (registered_domain, budget_factor) for
    pick_batch's rank-weighted budgets: min-max scale ranks into
    [lo, hi] (degenerate all-equal case -> 1.0). Crawl-ordering use:
    rank from crawl k-1 shapes crawl k's per-host budgets, the
    standard prioritized-recrawl pattern.

    The join key pick_batch uses is registered_domain, so host-keyed
    ranks (the ``host_edges`` default) are folded onto the politeness
    key here — each host's rank mass sums into its registered domain
    (PSL-aware, identity for already-domain-keyed or dot-less hosts).
    Without this fold a host-keyed table would miss every
    registered_domain row and silently weight nothing."""
    from pygeodatacrawler_spark.functions.urls import host_registered_domain

    dom = (
        ranks.select(
            host_registered_domain(F.col("host")).alias("registered_domain"),
            "rank",
        )
        .groupBy("registered_domain")
        .agg(F.sum("rank").alias("rank"))
    )
    mm = dom.agg(
        F.min("rank").alias("mn"), F.max("rank").alias("mx")
    )
    return (
        dom.crossJoin(F.broadcast(mm))
        .select(
            "registered_domain",
            F.when(F.col("mx") > F.col("mn"),
                   F.lit(lo) + (F.col("rank") - F.col("mn"))
                   / (F.col("mx") - F.col("mn")) * (hi - lo))
            .otherwise(F.lit(1.0))
            .alias("budget_factor"),
        )
    )


def pagerank_py(
    edges: list[tuple[str, str, int]],
    iterations: int = 10,
    damping: float = 0.85,
) -> dict[str, float]:
    """Sequential twin of pagerank() for parity tests — same dangling
    redistribution, same iteration structure."""
    hosts = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    n = len(hosts)
    if n == 0:
        return {}
    out_w: dict[str, float] = {}
    for s, _, w in edges:
        out_w[s] = out_w.get(s, 0.0) + w
    rank = {h: 1.0 / n for h in hosts}
    base = (1.0 - damping) / n
    for _ in range(iterations):
        moved = sum(rank[h] for h in hosts if h in out_w)
        dangling = (1.0 - moved) / n
        contrib = {h: 0.0 for h in hosts}
        for s, d, w in edges:
            contrib[d] += rank[s] * (w / out_w[s])
        rank = {
            h: base + damping * (contrib[h] + dangling) for h in hosts
        }
    return rank
