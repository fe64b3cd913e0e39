"""Crawl-trap detection: URL-template explosion + low content
diversity, with a DuckDB self-oracle for the aggregation semantics
and a plan check that the frontier-side filter stays broadcast."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from pygeodatacrawler_spark.functions.urls import url_template, url_template_py
from pygeodatacrawler_spark.operators.traps import (
    apply_trap_filter,
    trap_candidates,
)


def _corpus():
    rows = []
    # calendar trap: 300 URLs, all the same page text
    for y in (2022, 2023, 2024):
        for d in range(100):
            rows.append(
                (f"http://trap.example.org/cal/{y}/{d:03d}/", "empty calendar")
            )
    # session-id mill: 150 URLs, 3 distinct texts
    for s in range(150):
        rows.append(
            (
                f"http://trap.example.org/view?sid=sess{s:08d}&item={s % 3}",
                f"item {s % 3}",
            )
        )
    # healthy article section: 120 URLs, all distinct content
    for i in range(120):
        rows.append((f"http://good.example.org/post/{i}", f"article {i} body"))
    # tiny section, below min_urls
    for i in range(5):
        rows.append((f"http://good.example.org/tag/{i}", "tag page"))
    return rows


def test_url_template_column_matches_py(spark):
    urls = [u for u, _ in _corpus()[:50]] + [
        "http://a.ex/item/550e8400-e29b-41d4-a716-446655440000",
        "http://a.ex/plain/path",
        "http://a.ex/?b=2&a=1",
        "http://a.ex/x#frag",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [
        r["t"] for r in df.select(url_template(F.col("url")).alias("t")).collect()
    ]
    assert got == [url_template_py(u) for u in urls]


def test_trap_candidates_flags_traps_only(spark):
    df = spark.createDataFrame(_corpus(), "url string, text string")
    flagged = trap_candidates(df, min_urls=100, max_diversity=0.1).collect()
    tpls = [r["template"] for r in flagged]
    assert tpls == [
        "trap.example.org/cal/~d/~d/",
        "trap.example.org/view?item&sid",
    ]
    by = {r["template"]: r for r in flagged}
    assert by["trap.example.org/cal/~d/~d/"]["n_urls"] == 300
    # HLL estimate of 1 distinct text is exact at this cardinality
    assert by["trap.example.org/cal/~d/~d/"]["n_distinct"] == 1
    assert by["trap.example.org/view?item&sid"]["n_urls"] == 150


def test_trap_candidates_duckdb_oracle(spark):
    """Same grouping in DuckDB over the python-twin templates; exact
    COUNT(DISTINCT) replaces the HLL — at these cardinalities the two
    agree exactly, which is itself the HLL-accuracy assertion."""
    corpus = _corpus()
    df = spark.createDataFrame(corpus, "url string, text string")
    got = {
        (r["template"], r["n_urls"], r["n_distinct"])
        for r in trap_candidates(df, min_urls=100, max_diversity=0.1).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (template VARCHAR, text VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)",
        [(url_template_py(u), txt) for u, txt in corpus],
    )
    want = {
        tuple(r)
        for r in con.execute(
            """
            SELECT template, COUNT(*) AS n_urls,
                   COUNT(DISTINCT text) AS n_distinct
            FROM t GROUP BY template
            HAVING COUNT(*) >= 100
               AND COUNT(DISTINCT text) * 1.0 / COUNT(*) <= 0.1
            ORDER BY template
            """
        ).fetchall()
    }
    assert got == want


def test_url_count_only_mode(spark):
    df = spark.createDataFrame(_corpus(), "url string, text string")
    flagged = trap_candidates(df, content_col=None, min_urls=100).collect()
    # without the diversity gate the healthy 120-post section is
    # flagged too — the gate is what separates busy from trapped
    assert [r["template"] for r in flagged] == [
        "good.example.org/post/~d",
        "trap.example.org/cal/~d/~d/",
        "trap.example.org/view?item&sid",
    ]
    assert all(r["n_distinct"] is None for r in flagged)


def test_apply_trap_filter_broadcast_anti(spark):
    df = spark.createDataFrame(_corpus(), "url string, text string")
    traps = trap_candidates(df, min_urls=100, max_diversity=0.1)
    frontier = df.select(F.col("url").alias("canon_url"))
    kept = apply_trap_filter(frontier, traps)
    assert kept.count() == 125  # 120 posts + 5 tags survive
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
