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


def test_geojson_decode():
    import json

    from pygeodatacrawler_spark.functions.media_codecs import decode_geojson

    fc = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "geometry": {
                    "type": "MultiPolygon",
                    "coordinates": [[[[0, 0], [4, 0], [4, 3], [0, 0]]]],
                },
                "properties": {"name": "a", "area": 6.0, "cnt": 2},
            },
            {
                "type": "Feature",
                "geometry": {"type": "Point", "coordinates": [-1.5, 7.25]},
                "properties": {"name": "b", "area": 0.0, "cnt": 1},
            },
        ],
    }
    got = decode_geojson(json.dumps(fc).encode())
    # OGR bucket of the FIRST layer geometry (utils.py:132-141)
    assert got["geomtype"] == "surface"
    assert got["n_features"] == 2
    assert got["attrs"] == "name:String,area:Real,cnt:Integer"
    assert got["bounds"] == [-1.5, 0.0, 4.0, 7.25]

    single = {"type": "Feature", "geometry": {"type": "LineString",
              "coordinates": [[1, 2], [3, 4]]}, "properties": {}}
    got2 = decode_geojson(json.dumps(single).encode())
    assert got2["geomtype"] == "curve" and got2["n_features"] == 1
    assert got2["bounds"] == [1.0, 2.0, 3.0, 4.0]

    for bad in (None, b"", b"not json", b'{"type": "Topology"}'):
        assert decode_geojson(bad)["n_features"] is None


def test_shapefile_roundtrip():
    from pygeodatacrawler_spark.functions.media_codecs import (
        decode_shapefile,
        encode_shapefile_fixture,
    )

    b = encode_shapefile_fixture(
        shp_type=5, n_features=7, bounds=(-10.0, -5.0, 10.5, 5.25)
    )
    got = decode_shapefile(b)
    assert got["geomtype"] == "surface"
    assert got["n_features"] == 7
    assert got["bounds"] == [-10.0, -5.0, 10.5, 5.25]

    assert decode_shapefile(encode_shapefile_fixture(shp_type=13))["geomtype"] == "curve"
    assert decode_shapefile(encode_shapefile_fixture(shp_type=8))["geomtype"] == "point"
    for bad in (None, b"", b"\x00" * 100, b"PK shortfile"):
        assert decode_shapefile(bad)["n_features"] is None


def test_dbf_roundtrip():
    from pygeodatacrawler_spark.functions.media_codecs import (
        decode_dbf,
        encode_dbf_fixture,
    )

    b = encode_dbf_fixture(
        [("name", "C", 32, 0), ("depth", "N", 12, 4), ("count", "N", 6, 0),
         ("ratio", "F", 10, 2), ("when", "D", 8, 0), ("flag", "L", 1, 0)],
        n_records=42,
    )
    got = decode_dbf(b)
    assert got["n_features"] == 42
    assert got["attrs"] == (
        "name:String,depth:Real,count:Integer,ratio:Real,when:Date,flag:String"
    )
    for bad in (None, b"", b"\x03" + b"\x00" * 40):
        assert decode_dbf(bad)["attrs"] is None


def test_decoders_total_on_arbitrary_bytes():
    # fuzz: a crawl survives any truncated/corrupt download — every
    # decoder must return its none-shape, never raise, on random bytes
    # and on valid fixtures truncated at every prefix length
    from hypothesis import given, settings, strategies as st

    from pygeodatacrawler_spark.functions.media_codecs import (
        decode_dbf,
        decode_geojson,
        decode_geotiff,
        decode_shapefile,
        decode_xlsx,
        encode_dbf_fixture,
        encode_geotiff_fixture,
        encode_shapefile_fixture,
        encode_xlsx_fixture,
    )

    decoders = [
        decode_geotiff, decode_xlsx, decode_geojson,
        decode_shapefile, decode_dbf,
    ]

    @settings(max_examples=150, deadline=None)
    @given(st.binary(min_size=0, max_size=400))
    def fuzz(payload):
        for dec in decoders:
            out = dec(payload)
            assert isinstance(out, dict)

    fuzz()

    fixtures = [
        encode_geotiff_fixture(width=9, height=9, epsg=4326, nodata=1.0),
        encode_xlsx_fixture(title="t", sheets=["a"]),
        encode_shapefile_fixture(shp_type=3, n_features=2),
        encode_dbf_fixture([("f", "C", 10, 0)], n_records=3),
    ]
    for fx in fixtures:
        for cut in range(0, len(fx), 7):
            for dec in decoders:
                assert isinstance(dec(fx[:cut]), dict)
