"""Dependency-free media decoders (S4/S6): decode(encode(x)) == x,
totality on malformed bytes, both TIFF byte orders."""

from __future__ import annotations

from pygeodatacrawler_spark.functions.media_codecs import (
    decode_geotiff,
    decode_xlsx,
    encode_geotiff_fixture,
    encode_xlsx_fixture,
)


def test_geotiff_roundtrip_both_endians():
    for bo in ("<", ">"):
        b = encode_geotiff_fixture(
            width=1024, height=768, n_bands=4,
            ulx=-180.0, uly=90.0, xres=0.1, yres=-0.05,
            epsg=4326, projected=False, nodata=255.0, byte_order=bo,
        )
        got = decode_geotiff(b)
        assert got["width"] == 1024 and got["height"] == 768
        assert got["n_bands"] == 4
        assert got["epsg"] == "EPSG:4326"
        assert got["nodata"] == 255.0
        # reference bounds math (utils.py:67-70): [ulx, lry, lrx, uly]
        assert got["bounds"] == [-180.0, 90.0 - 768 * 0.05, -180.0 + 1024 * 0.1, 90.0]


def test_geotiff_projected_geokey_and_no_optionals():
    b = encode_geotiff_fixture(
        width=10, height=10, epsg=32633, projected=True
    )
    assert decode_geotiff(b)["epsg"] == "EPSG:32633"
    b2 = encode_geotiff_fixture(width=7, height=9, epsg=None)
    got = decode_geotiff(b2)
    assert got["epsg"] is None and got["nodata"] is None
    assert (got["width"], got["height"]) == (7, 9)


def test_geotiff_malformed_is_total():
    for payload in (None, b"", b"II", b"not a tiff at all", b"MM\x00\x2a\xff"):
        got = decode_geotiff(payload)
        assert got["width"] is None and got["bounds"] is None
    # valid header, truncated IFD
    good = encode_geotiff_fixture(width=5, height=5)
    assert decode_geotiff(good[:20])["width"] is None


def test_xlsx_roundtrip():
    b = encode_xlsx_fixture(
        title="Soil map & legend",
        creator="pyGeoDataCrawler",
        subject="soils",
        description="d <escaped>",
        keywords="soil, map",
        sheets=["data", "meta", "legend"],
    )
    got = decode_xlsx(b)
    assert got["title"] == "Soil map & legend"
    assert got["creator"] == "pyGeoDataCrawler"
    assert got["subject"] == "soils"
    assert got["description"] == "d <escaped>"
    assert got["keywords"] == "soil, map"
    assert got["sheets"] == ["data", "meta", "legend"]


def test_xlsx_malformed_is_total():
    for payload in (None, b"", b"PK\x03\x04 truncated", b"not a zip"):
        got = decode_xlsx(payload)
        assert got["title"] is None and got["sheets"] is None


def test_xlsx_fixture_is_deterministic():
    a = encode_xlsx_fixture(title="t", sheets=["x"])
    b = encode_xlsx_fixture(title="t", sheets=["x"])
    assert a == b  # fixed zip timestamps: pure function of inputs
