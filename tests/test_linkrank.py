"""Host-graph PageRank: Spark iterative-join implementation vs the
sequential twin, mass conservation, dangling redistribution, and the
classic closed-form two-node check."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pygeodatacrawler_spark.operators.linkrank import (
    host_edges,
    pagerank,
    pagerank_py,
)

EDGES = [
    ("a.org", "b.org", 3),
    ("a.org", "c.org", 1),
    ("b.org", "c.org", 2),
    ("c.org", "a.org", 1),
    ("d.org", "a.org", 5),  # d has outlinks; e is dangling
    ("a.org", "e.org", 1),
]


def _spark_ranks(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string, weight long")
    return {r["host"]: r["rank"] for r in pagerank(df, **kw).collect()}


def test_matches_sequential_twin(spark):
    got = _spark_ranks(spark, EDGES, iterations=12)
    want = pagerank_py(EDGES, iterations=12)
    assert set(got) == set(want)
    for h in want:
        assert got[h] == pytest.approx(want[h], abs=1e-9)


def test_mass_conserved_and_ordering(spark):
    got = _spark_ranks(spark, EDGES, iterations=12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    # a receives links from c AND the heavy d edge -> top host;
    # dangling e only receives 1/5 of a's outweight -> bottom half
    assert max(got, key=got.get) == "a.org"
    assert got["b.org"] > got["e.org"]


def test_two_node_closed_form(spark):
    # a<->b symmetric: rank = 0.5 each, any damping, exactly
    got = _spark_ranks(
        spark, [("a", "b", 1), ("b", "a", 1)], iterations=5
    )
    assert got["a"] == pytest.approx(0.5, abs=1e-12)
    assert got["b"] == pytest.approx(0.5, abs=1e-12)


def test_all_dangling_uniform(spark):
    # one edge a->b, b dangling: mass keeps cycling through the
    # uniform redistribution; ranks stay a valid distribution
    got = _spark_ranks(spark, [("a", "b", 1)], iterations=10)
    want = pagerank_py([("a", "b", 1)], iterations=10)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    for h in want:
        assert got[h] == pytest.approx(want[h], abs=1e-9)
    assert got["b"] > got["a"]  # b receives everything a has


def test_host_edges_from_records(spark):
    recs = spark.createDataFrame(
        [
            ("http://a.org/x", ["http://b.org/1", "http://b.org/2",
                                "http://a.org/self", "not a url"]),
            ("http://a.org/y", ["http://b.org/3"]),
            ("http://b.org/z", ["http://a.org/"]),
        ],
        "url string, links array<string>",
    )
    e = {(r["src"], r["dst"]): r["weight"] for r in host_edges(recs).collect()}
    # self-link and unparseable link dropped; a->b aggregated to 3
    assert e == {("a.org", "b.org"): 3, ("b.org", "a.org"): 1}
