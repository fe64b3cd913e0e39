"""Decoder parity against the reference repo's OWN demo files and its
own pytest assertions (/root/reference/tests/test_geodatacrawler.py):
point.yml must get geomtype 'point' with first attribute 'FID'; the
grid rasters' band stats are pinned in test_band_stats. Here: the
vector/xlsx/geojson decoders on the very files the reference indexes.
All tests skip when the reference checkout is absent."""

from __future__ import annotations

import os

import pytest

from pygeodatacrawler_spark.functions.media_codecs import (
    decode_dbf,
    decode_geojson,
    decode_geotiff,
    decode_shapefile,
    decode_xlsx,
)

DEMO = "/root/reference/demo"

pytestmark = pytest.mark.skipif(
    not os.path.exists(DEMO), reason="no reference demo checkout"
)


def _read(path: str) -> bytes:
    with open(path, "rb") as f:
        return f.read()


def test_vector_shapefiles_geomtype_buckets():
    # the reference's own golden (test_geodatacrawler.py:12-13):
    # point -> geomtype 'point', first attribute named 'FID'
    cases = {"point": "point", "line": "curve", "polygon": "surface"}
    for name, want in cases.items():
        shp = decode_shapefile(_read(f"{DEMO}/vector/{name}.shp"))
        assert shp["geomtype"] == want, name
        assert shp["n_features"] == 3
        dbf = decode_dbf(_read(f"{DEMO}/vector/{name}.dbf"))
        assert dbf["attrs"].split(",")[0].split(":")[0] == "FID"
        assert dbf["n_features"] == 3
    # point bbox is around Greenwich/London
    shp = decode_shapefile(_read(f"{DEMO}/vector/point.shp"))
    minx, miny, maxx, maxy = shp["bounds"]
    assert 0.0 <= minx <= maxx <= 0.5 and 51.0 <= miny <= maxy <= 52.0


def test_various_kenya_shapefile():
    m = decode_shapefile(
        _read(f"{DEMO}/various/kenya_continental_shelf_2019.shp")
    )
    assert m["geomtype"] == "surface" and m["n_features"] == 1
    minx, miny, maxx, maxy = m["bounds"]
    assert 39.0 < minx < maxx < 42.0 and -5.0 < miny < maxy < -1.5


def test_various_xlsx_properties():
    # the parseExcel surface (utils.py:416-423) on the real workbook
    x = decode_xlsx(_read(f"{DEMO}/various/aSimpleExcel.xlsx"))
    assert x["creator"] == "Genuchten, Paul van"
    assert x["sheets"] == ["users", "groups"]
    assert x["created"].startswith("2015-06-05")


def test_various_marine_areas_geojson():
    g = decode_geojson(_read(f"{DEMO}/various/marine_areas.geojson"))
    assert g["geomtype"] == "point" and g["n_features"] == 24
    assert g["attrs"].startswith("FID1:Integer")
    minx, miny, maxx, maxy = g["bounds"]
    assert 39.0 < minx < maxx < 42.0 and -5.0 < miny < maxy < -2.0


def test_vector_maize_raster():
    m = decode_geotiff(_read(f"{DEMO}/vector/maize.tif"))
    assert (m["width"], m["height"], m["n_bands"]) == (2268, 1980, 1)
    assert m["epsg"] == "EPSG:32736" and m["nodata"] == 255.0
    # binary presence mask: every valid pixel is 1
    assert m["band_min"] == [1.0] and m["band_max"] == [1.0]


def test_various_geopackage():
    from pygeodatacrawler_spark.functions.media_codecs import decode_gpkg

    g = decode_gpkg(_read(f"{DEMO}/various/kenya-soil.gpkg"))
    assert g["layer"] == "soils"
    assert g["geomtype"] == "surface"  # MultiPolygon -> surface bucket
    assert g["n_features"] == 3259
    assert g["epsg"] == "EPSG:4326"
    assert g["attrs"].startswith("AREA:Real,PERIMETER:Real")
    minx, miny, maxx, maxy = g["bounds"]
    assert 33.0 < minx < maxx < 42.0 and -5.0 < miny < maxy < 6.0
    assert decode_gpkg(b"not sqlite")["layer"] is None
    assert decode_gpkg(None)["layer"] is None


def test_various_parquet_footer():
    from pygeodatacrawler_spark.functions.media_codecs import (
        decode_parquet_meta,
    )

    m = decode_parquet_meta(_read(f"{DEMO}/various/example.parquet"))
    assert m["n_features"] == 5
    assert m["attrs"].startswith("pop_est:double,continent:string")
    assert "geometry:binary" in m["attrs"]
    assert decode_parquet_meta(b"PAR1junk")["n_features"] is None
    assert decode_parquet_meta(None)["n_features"] is None


def test_vector_vrt():
    from pygeodatacrawler_spark.functions.media_codecs import decode_vrt

    v = decode_vrt(_read(f"{DEMO}/vector/cities.vrt"))
    assert v == {
        "layer": "cities", "geomtype": "point",
        "src": "./cities.csv", "srs": "WGS84",
    }
    assert decode_vrt(b"<notvrt/>")["layer"] is None
    assert decode_vrt(b"\x00\x01")["layer"] is None
