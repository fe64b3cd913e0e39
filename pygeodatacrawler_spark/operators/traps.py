"""Crawl-trap detection: URL-template explosion with low content
diversity.

The reference's folder crawl cannot loop (filesystems are finite);
a web frontier can — calendar pages, session-id mills, faceted
search, and cycle-generating CGIs mint unbounded URL spaces that are
structurally one page. The classic defense (Heritrix's "path-ology"
rules, IRLbot's budgeted spam control) is statistical: group URLs by
structural template, flag templates whose URL count explodes while
their CONTENT barely varies, and stop spending fetch budget there.

Spark shape (scale notes for the 10^10-URL frontier):

- ``trap_candidates`` is ONE shuffle: groupBy(template) with map-side
  partial aggregation (count + approx_count_distinct over the content
  hash are both algebraic). Template cardinality is tiny relative to
  URL count — that asymmetry IS the signal — so the reduce side is
  cheap and the flagged output is a small table.
- ``apply_trap_filter`` is a broadcast LEFT ANTI join on the computed
  template column: zero shuffle on the (huge) frontier side, same
  plan shape as apply_robots.
- Content diversity uses approx_count_distinct (HLL, mergeable) —
  an exact distinct over 10^10 hashes would shuffle every hash; the
  trap decision only needs "distinct pages ≪ URLs", well within HLL
  error.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pygeodatacrawler_spark.functions.urls import url_template


def trap_candidates(
    pages: DataFrame,
    url_col: str = "url",
    content_col: str | None = "text",
    min_urls: int = 100,
    max_diversity: float = 0.1,
    exact: bool = False,
) -> DataFrame:
    """Templates that look like traps: >= ``min_urls`` fetched URLs
    whose distinct-content ratio is <= ``max_diversity``. With
    ``content_col=None`` the diversity gate is skipped (pure URL-count
    explosion, usable on an unfetched frontier). ``exact=True`` swaps
    the HLL for COUNT(DISTINCT) — portable-oracle mode for small
    inputs; the HLL default is the 10^10-URL path (mergeable, no
    per-hash shuffle). Returns (template, n_urls, n_distinct,
    diversity) sorted for stable inspection."""
    tpl = pages.select(
        url_template(F.col(url_col)).alias("template"),
        *(
            [F.sha2(F.coalesce(F.col(content_col), F.lit("")), 256).alias("_h")]
            if content_col is not None
            else []
        ),
    )
    aggs = [F.count(F.lit(1)).alias("n_urls")]
    if content_col is not None and exact:
        aggs.append(F.countDistinct("_h").alias("n_distinct"))
    elif content_col is not None:
        aggs.append(F.approx_count_distinct("_h").alias("n_distinct"))
    else:
        aggs.append(F.lit(None).cast("long").alias("n_distinct"))
    g = tpl.groupBy("template").agg(*aggs)
    g = g.withColumn(
        "diversity",
        F.when(
            F.col("n_distinct").isNotNull(),
            F.col("n_distinct") / F.col("n_urls"),
        ).cast("double"),
    )
    flagged = g.filter(F.col("n_urls") >= min_urls)
    if content_col is not None:
        flagged = flagged.filter(F.col("diversity") <= max_diversity)
    return flagged.orderBy("template")


def apply_trap_filter(
    frontier: DataFrame,
    traps: DataFrame,
    url_col: str = "canon_url",
) -> DataFrame:
    """Drop frontier URLs whose template is in the flagged set —
    broadcast anti-join, no shuffle on the frontier side."""
    keyed = frontier.withColumn("_tpl", url_template(F.col(url_col)))
    return (
        keyed.join(
            F.broadcast(traps.select(F.col("template").alias("_tpl"))),
            on="_tpl",
            how="left_anti",
        ).drop("_tpl")
    )
