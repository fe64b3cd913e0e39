"""Politeness scheduler: pick each round's fetch batch from the frontier.

Re-expresses the reference's traversal discipline (DFS with
skip-subfolders/skip-files regexes and harvest caps,
/root/reference/geodatacrawler/metadata.py:104-121, utils.py:355-357)
as declarative DataFrame ops over the frontier table:

1. policy filter — broadcast-join the robots table on registered_domain,
   drop URLs matching skip_pattern / under a no_recurse_prefix;
2. priority rank — row_number per registered_domain ordered by
   (depth, discovery_ts, canon_url): the (depth, host-budget,
   discovery_ts) priority queue of the north rule, with the canon_url
   tie-break that makes runs and resumes deterministic;
3. budget cap — rank <= per-host batch budget (token bucket);
4. skew salting — hosts whose pending count exceeds a heavy-hitter
   threshold get a salt column so the fetch stage's partitions stay
   balanced (AQE rebalances joins, not this sink-side batch skew).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F

DEFAULT_HOST_BUDGET = 100


def apply_robots(frontier: DataFrame, robots: DataFrame) -> DataFrame:
    """Filter the frontier by per-domain politeness rules.

    robots(registered_domain, skip_pattern, no_recurse_prefix,
    crawl_delay, max_pages[, allow_pattern, disallow_rules,
    allow_rules]) is small (one row per domain) -> broadcast.
    A NULL rule never filters (hosts without rules are unrestricted).

    Allow precedence (RFC 9309 §2.2.2), when the table carries the
    robots.txt-derived columns: the matching rule with the most octets
    wins, Allow winning ties. Tiered so the hot path stays one
    ``rlike``: no Disallow match -> keep; Disallow match with no Allow
    match -> drop; only when BOTH combined patterns match does the
    per-rule ``aggregate``-over-structs longest-match comparison run —
    per-domain rule arrays live in the broadcast row, so the compare
    never shuffles. Tables without the allow columns (the reference's
    folder-config path, fixtures) keep the Disallow-only semantics.

    Scope: a robots table carrying a ``host`` column (built by
    ``fetch_robots_table(scope="host")``) is joined on the URL's
    hostname — the RFC 9309 §2.3 per-authority scope, so
    ``api.example.org`` and ``www.example.org`` each get their own
    rules. Otherwise the join key is ``registered_domain`` (the
    engine's politeness key — one rule set per domain, the documented
    approximation). Either table is dimension-sized -> broadcast.
    """
    if "host" in robots.columns:
        from pygeodatacrawler_spark.functions.urls import url_host

        f = (
            frontier.withColumn("__rhost", url_host(F.col("canon_url")))
            .join(
                F.broadcast(robots.withColumnRenamed("host", "__rhost")),
                "__rhost",
                "left",
            )
            .drop("__rhost")
        )
    else:
        f = frontier.join(F.broadcast(robots), "registered_domain", "left")
    # rules test the CANONICAL url on both engine and oracle sides — the
    # raw link text can differ per discoverer for one canonical URL
    url = F.col("canon_url")
    disallow_hit = F.col("skip_pattern").isNotNull() & F.regexp_like(
        url, F.col("skip_pattern")
    )
    if "allow_rules" in robots.columns:

        def _best(rules_col):
            # longest-match priority of the URL over one rule array
            return F.aggregate(
                rules_col,
                F.lit(-1),
                lambda acc, r: F.greatest(
                    acc,
                    F.when(
                        (r["prio"] > acc) & F.regexp_like(url, r["rx"]),
                        r["prio"],
                    ).otherwise(F.lit(-1)),
                ),
            )

        allow_hit = F.col("allow_pattern").isNotNull() & F.regexp_like(
            url, F.col("allow_pattern")
        )
        pass_robots = F.when(~disallow_hit, F.lit(True)).otherwise(
            allow_hit
            & (_best(F.col("allow_rules")) >= _best(F.col("disallow_rules")))
        )
    else:
        pass_robots = ~disallow_hit
    keep = pass_robots & (
        F.col("no_recurse_prefix").isNull()
        | ~F.col("canon_url").startswith(F.col("no_recurse_prefix"))
    )
    return f.filter(keep).drop(
        "skip_pattern", "no_recurse_prefix", "allow_pattern",
        "disallow_rules", "allow_rules", "sitemaps",
    )


def pick_batch(
    frontier: DataFrame,
    robots: DataFrame | None = None,
    host_budget: int = DEFAULT_HOST_BUDGET,
    salt_threshold: int | None = None,
    salt_buckets: int = 64,
    host_priority: DataFrame | None = None,
) -> DataFrame:
    """One round's fetch batch: politeness-filtered, priority-ranked,
    budget-capped per registered_domain.

    Expects frontier columns (url, canon_url, registered_domain, depth,
    discovery_ts). Adds ``host_rank``. Uses a window (one shuffle on
    registered_domain); the host cap bounds any single host's
    contribution, so post-filter partitions are naturally de-skewed.

    ``salt_threshold`` fuses heavy-host salting into the SAME exchange:
    the per-host pending count rides an unordered window over the
    identical partition spec (Catalyst plans both window operators over
    one shuffle), so the salt decision costs no aggregate and no join —
    this replaced a groupBy + broadcast-join pair that added two stages
    to every crawl round. The post-cap batch size of a host is
    least(pending, budget), which reproduces exactly what counting the
    capped batch (the old salt_heavy_hosts input) measured.
    """
    f = frontier
    budget_col = F.lit(host_budget)
    if robots is not None:
        f = apply_robots(f, robots)
        budget_col = F.least(
            F.coalesce(F.col("max_pages"), F.lit(host_budget)), F.lit(host_budget)
        )
    if host_priority is not None:
        # rank-weighted budgets (e.g. budget_factors_from_pagerank):
        # high-value hosts get proportionally more of each round —
        # broadcast join, the priority table is O(#hosts)
        f = f.join(
            F.broadcast(
                host_priority.select("registered_domain", "budget_factor")
            ),
            "registered_domain",
            "left",
        )
        budget_col = F.greatest(
            F.lit(1),
            F.floor(
                budget_col * F.coalesce(F.col("budget_factor"), F.lit(1.0))
            ).cast("int"),
        )
    w = Window.partitionBy("registered_domain").orderBy(
        "depth", "discovery_ts", "canon_url"
    )
    out = (
        f.withColumn("_budget", budget_col)
        .withColumn("host_rank", F.row_number().over(w))
    )
    if salt_threshold is not None:
        n_host = F.count("*").over(Window.partitionBy("registered_domain"))
        host_batch = F.least(n_host, F.col("_budget"))
        # salt width scales with the host's capped batch (one salt
        # slice ~rows_per_salt rows, capped at salt_buckets): a fixed
        # 8-way salt left a 50k-URL heavy host in 6k-row straggler
        # tasks that owned the fetch stage's tail (measured skew ~10 at
        # 32 cores); sizing the spread to the data keeps the stage
        # balanced at any budget. (domain, salt) pairs stay atomic, so
        # politeness co-location is untouched for hosts that need it.
        # Hosts with NO crawl delay need no co-location at all (pacing
        # is the only reason to keep a host in one task), so any
        # delay-free host above a couple of slices is spread too —
        # without this, each ~2k-row host is an atomic task and the
        # fetch stage tail idles most of a 32-core stage.
        rows_per_salt = 500
        delay = (
            F.col("crawl_delay")
            if robots is not None
            else F.lit(None).cast("double")
        )
        no_delay = delay.isNull() | (delay <= 0)
        buckets = F.least(
            F.ceil(host_batch / rows_per_salt), F.lit(salt_buckets)
        ).cast("long")
        out = out.withColumn(
            "salt",
            F.when(
                (host_batch > salt_threshold)
                | (no_delay & (host_batch > 2 * rows_per_salt)),
                F.pmod(F.xxhash64("canon_url"), buckets).cast("int"),
            ).otherwise(F.lit(0)),
        )
    return (
        out.filter(F.col("host_rank") <= F.col("_budget"))
        .drop("_budget", "max_pages", "crawl_delay", "budget_factor")
    )


def repartition_for_fetch(
    batch: DataFrame,
    num_partitions: int | None = None,
    est_rows: int | None = None,
    rows_per_task: int = 256,
) -> DataFrame:
    """Pin partitions before the CPU-bound extract UDF.

    Explicit partition count: an unpinned repartition lets AQE coalesce
    tiny batches onto 1-2 tasks and serialize the Python workers. 3x the
    core count, not 1x: with one task per core a single straggler host
    leaves cores idle at the stage tail (measured 2x on extract).

    ``est_rows`` (the engine passes the previous round's batch size —
    already known from parquet footers, no extra job) scales the width
    DOWN for small rounds: 96 tasks of ~15 URLs each are pure
    scheduling overhead and measurably anti-scale the loop at high core
    counts; the floor of one task per core keeps every core fed, the
    3x-cores ceiling keeps straggler smoothing for big rounds.
    Expects a ``salt`` column (0 for unsalted hosts)."""
    cores = batch.sparkSession.sparkContext.defaultParallelism
    if num_partitions is None:
        num_partitions = 3 * cores
        if est_rows is not None:
            num_partitions = max(
                cores, min(3 * cores, est_rows // rows_per_task + 1)
            )
    return batch.repartition(num_partitions, "registered_domain", "salt")
