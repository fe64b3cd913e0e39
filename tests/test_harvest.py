"""Metadata harvest: sniff parity, checkId cascade, config inheritance
(empty-never-clobbers), catalog rollup + render determinism."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from pygeodatacrawler_spark.fixtures import generate_pages, load_pages
from pygeodatacrawler_spark.functions.metadata import sniff_metadata_py
from pygeodatacrawler_spark.operators.harvest import (
    apply_config,
    harvest_metadata,
    render_catalog,
    summarize_catalog,
    valid_records,
)


def test_sniff_py_kinds():
    pages, _, _ = generate_pages(n_pages=120, n_hosts=3)
    kinds = {sniff_metadata_py(h)["kind"] for h in pages["html"]}
    assert kinds == {"iso19139", "dublin-core", "html"}
    iso = [
        sniff_metadata_py(h)
        for h in pages["html"]
        if b"<MD_Metadata>" in h
    ]
    assert all(r["identifier"] and r["title"] and r["keywords"] for r in iso)
    assert sniff_metadata_py(None)["kind"] is None


@pytest.fixture(scope="module")
def harvested(spark):
    pages, _, _ = load_pages(spark, n_pages=300, n_hosts=6)
    return harvest_metadata(pages).cache(), pages


def test_harvest_parity_with_py(harvested, spark):
    records, pages = harvested
    got = {r["canon_url"]: r for r in records.collect()}
    pages_pd = pages.toPandas()
    assert len(got) == len(pages_pd)
    for _, p in pages_pd.iterrows():
        want = sniff_metadata_py(p["html"])
        r = got[p["url"]]  # fixture urls are already canonical
        assert r["kind"] == want["kind"]
        assert r["title"] == want["title"]
        assert list(r["keywords"] or []) == want["keywords"]
        if want["identifier"]:
            assert r["identifier"] == want["identifier"]
        else:
            assert r["identifier"].startswith("id-")  # checkId sha2 tail


def test_config_inheritance(harvested, spark):
    records, _ = harvested
    config = spark.createDataFrame(
        [
            ("https://www.host-000.org/", "Host0 default", "Host0 abstract", ["cfg"]),
            ("https://www.host-000.org/sub/", "Host0 sub", None, ["sub"]),
            ("", "Global default", "", ["global"]),
        ],
        "prefix string, title string, abstract string, keywords array<string>",
    )
    merged = apply_config(records, config).cache()
    assert merged.count() == records.count()  # longest-prefix join stays 1:1
    rows = {r["canon_url"]: r for r in merged.collect()}
    # html pages have no sniffed title? they do (html <title>) — so config
    # title must NOT clobber; keywords are unioned
    for cu, r in rows.items():
        if cu.startswith("https://www.host-000.org/sub/"):
            assert "sub" in r["keywords"]
        elif cu.startswith("https://www.host-000.org/"):
            assert "cfg" in r["keywords"]
        else:
            assert "global" in r["keywords"]
        assert r["title"] is not None and r["title"] != ""
    # empty-never-clobbers: abstract empty in config root must not wipe
    iso = [r for r in rows.values() if r["kind"] == "iso19139"]
    assert all(r["abstract"] for r in iso)


def test_catalog_rollup_and_render(harvested):
    records, _ = harvested
    valid = valid_records(records)
    summary = {r["registered_domain"]: r for r in summarize_catalog(valid).collect()}
    assert all(r["n_records"] > 0 for r in summary.values())
    rendered = render_catalog(valid).collect()
    assert {r["registered_domain"] for r in rendered} == set(summary)
    for r in rendered:
        assert r["catalog"].startswith(f"CATALOG {r['registered_domain']}")
        assert r["catalog"].count("LAYER") == r["n_layers"]
        assert r["n_layers"] == summary[r["registered_domain"]]["n_records"]
    # determinism: second render byte-identical
    again = {r["registered_domain"]: r["catalog"] for r in render_catalog(valid).collect()}
    assert all(again[r["registered_domain"]] == r["catalog"] for r in rendered)


def test_contact_split_and_map(spark):
    """A4: split on ';'/' and ', safeFileName keys, email routing,
    last-role-wins on key collision, folded into the MCF contact map."""
    from pygeodatacrawler_spark.operators.harvest import contact_entries, contact_map

    df = spark.createDataFrame(
        [
            (1, "Jane Roe and Li Wei", "ACME Press", "jane@x.org;Jane Roe"),
            (2, "", "Solo Org", None),
        ],
        "rec long, author string, publisher string, creator string",
    )
    rows = {
        (r["rec"], r["contact_key"]): r
        for r in contact_entries(df, "rec").collect()
    }
    # creator re-lists Jane Roe -> the later role wins
    assert rows[(1, "Jane-Roe")]["role"] == "creator"
    assert rows[(1, "Jane-Roe")]["individualname"] == "Jane Roe"
    assert rows[(1, "Li-Wei")]["role"] == "author"
    assert rows[(1, "jane@x.org")]["email"] == "jane@x.org"
    assert rows[(1, "jane@x.org")]["individualname"] is None
    assert rows[(2, "Solo-Org")]["role"] == "publisher"
    assert (2, "") not in rows  # empties dropped

    maps = {
        r["rec"]: r["contact"]
        for r in contact_map(contact_entries(df, "rec"), "rec").collect()
    }
    assert set(maps[1].keys()) == {"ACME-Press", "Jane-Roe", "Li-Wei", "jane@x.org"}
    assert maps[1]["Jane-Roe"]["role"] == "creator"
    assert maps[2]["Solo-Org"]["individualname"] == "Solo Org"
