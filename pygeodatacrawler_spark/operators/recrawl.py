"""Freshness-driven recrawl scheduling (Cho & Garcia-Molina style
adaptive revisit intervals).

The reference crawls a folder once per invocation and relies on
"sidecar exists" to skip work (metadata.py:430); re-runs re-harvest
what changed on disk. A web crawler must decide WHEN to revisit: the
classic policy doubles a page's revisit interval each time a fetch
finds it unchanged and resets it on change, bounding wasted fetches
on static pages while tracking fast-moving ones.

Everything derives from the records log the engine already writes —
each fetch appended (url_hash, round, text_sha2), so change history
is a groupBy away:

- ONE shuffle (groupBy url_hash) builds the per-URL fetch history as
  a sorted struct array; the unchanged-streak (consecutive trailing
  fetches with equal sha) computes INSIDE the row with zip_with +
  aggregate — no self-join, no window over the full log.
- interval = min(base * 2^streak, max_interval); due when
  last_round + interval <= current_round.
- The engine re-enqueues due URLs as an O(due) frontier delta with
  state='pending' (last-writer-wins merge flips them), committed via
  the same lineage path as a streaming seed merge — resume-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def recrawl_due(
    records: DataFrame,
    current_round: int,
    base_interval: int = 4,
    max_interval: int = 64,
) -> DataFrame:
    """Records log (url_hash, round, text_sha2, ...) -> URLs due for a
    revisit at ``current_round``: (url_hash, last_round,
    unchanged_streak, interval). Deterministic; one shuffle."""
    hist = records.groupBy("url_hash").agg(
        F.reverse(
            F.array_sort(
                F.collect_list(F.struct("round", "text_sha2"))
            )
        ).alias("h")
    )
    n = F.size(F.col("h"))
    # pairwise equality of consecutive fetches, newest first; the
    # unchanged streak is the length of the leading all-true prefix.
    # Both slices are exactly n-1 long so zip_with never null-pads.
    eqs = F.zip_with(
        F.slice(F.col("h"), 1, F.greatest(n - 1, F.lit(0))),
        F.slice(F.col("h"), 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: a["text_sha2"] == b["text_sha2"],
    )
    streak = F.aggregate(
        eqs,
        F.struct(F.lit(0).alias("cnt"), F.lit(False).alias("stop")),
        lambda acc, x: F.struct(
            F.when(acc["stop"] | ~x, acc["cnt"]).otherwise(acc["cnt"] + 1).alias(
                "cnt"
            ),
            (acc["stop"] | ~x).alias("stop"),
        ),
        lambda acc: acc["cnt"],
    )
    out = hist.select(
        "url_hash",
        F.col("h").getItem(0).getField("round").alias("last_round"),
        streak.alias("unchanged_streak"),
    ).withColumn(
        "interval",
        F.least(
            F.lit(base_interval)
            * F.pow(
                F.lit(2.0), F.least(F.col("unchanged_streak"), F.lit(20))
            ).cast("long"),
            F.lit(max_interval),
        ),
    )
    return out.filter(
        F.col("last_round") + F.col("interval") <= F.lit(current_round)
    )


def sitemap_delta(prev: DataFrame, cur: DataFrame) -> DataFrame:
    """Two sitemap-seed snapshots (url, .., lastmod — the shape
    ``seeds_from_sitemaps`` emits) -> rows of ``cur`` that changed
    since ``prev``: the URL is new, its <lastmod> advanced, or its
    lastmod is unparsable but textually different (conservative:
    unknown change dates re-fetch rather than go stale). This is the
    sitemaps-protocol freshness signal — publishers bump <lastmod>
    precisely so crawlers re-fetch — and it complements the
    fetch-history policy in ``recrawl_due``: lastmod triggers on the
    PUBLISHER's claim, the streak policy on OBSERVED change.

    One broadcast-size join (sitemap tables are dimension-sized next
    to the frontier); lastmod parses with try_cast so W3C date-only
    and full-datetime forms both work and garbage degrades to the
    textual-difference rule instead of an ANSI cast error.

    Returns (url, lastmod, prev_lastmod, is_new).
    """
    p = prev.select(
        "url",
        F.col("lastmod").alias("prev_lastmod"),
        F.lit(True).alias("_in_prev"),
    )
    j = cur.select("url", "lastmod").join(p, "url", "left")
    cts = F.col("lastmod").try_cast("timestamp")
    pts = F.col("prev_lastmod").try_cast("timestamp")
    is_new = F.col("_in_prev").isNull()
    advanced = cts.isNotNull() & (pts.isNull() | (cts > pts))
    text_diff = cts.isNull() & (
        F.coalesce(F.col("lastmod"), F.lit(""))
        != F.coalesce(F.col("prev_lastmod"), F.lit(""))
    )
    return (
        j.filter(is_new | advanced | text_diff)
        .select("url", "lastmod", "prev_lastmod", is_new.alias("is_new"))
    )
