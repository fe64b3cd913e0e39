"""sidecar_join (J1), cascade_match (J3), media decode plumbing."""

from __future__ import annotations

import pyspark.sql.functions as F

from pygeodatacrawler_spark.operators.joins import cascade_match, sidecar_join
from pygeodatacrawler_spark.operators.media import decode_media


def test_sidecar_join_priority(spark):
    records = spark.createDataFrame([("a",), ("b",), ("c",)], "base string")
    files = spark.createDataFrame(
        [("a", "shp"), ("a", "tif"), ("a", "csv"), ("b", "csv")],
        "base string, ext string",
    )
    out = sidecar_join(records, files, "base", "ext", ["tif", "shp", "csv"])
    got = {r["base"]: r["ext"] for r in out.collect()}
    assert got == {"a": "tif", "b": "csv", "c": None}  # priority + unmatched


def test_cascade_match_stages(spark):
    left = spark.createDataFrame([(1,), (2,), (3,), (4,)], "k long")
    s1 = spark.createDataFrame([(1, "one-a"), (1, "one-b")], "k long, name string")
    s2 = spark.createDataFrame([(1, "x"), (2, "two")], "k long, name string")
    s3 = spark.createDataFrame([(3, "three")], "k long, name string")
    cond = F.col("l.k") == F.col("r.k")
    out = cascade_match(
        left, "k", [("s1", s1, cond), ("s2", s2, cond), ("s3", s3, cond)], "name"
    )
    got = {r["k"]: (r["matched"], r["match_stage"]) for r in out.collect()}
    assert got == {
        1: ("one-a", "s1"),  # stage 1 wins, min-name within stage
        2: ("two", "s2"),
        3: ("three", "s3"),
        4: (None, None),
    }


def test_media_decode_plumbing(spark):
    from pygeodatacrawler_spark.functions.media_codecs import (
        encode_geotiff_fixture,
        encode_xlsx_fixture,
    )
    from pygeodatacrawler_spark.operators.media import XLSX_TYPE

    tif = encode_geotiff_fixture(
        width=64, height=32, n_bands=3, ulx=5.0, uly=52.0,
        xres=0.5, yres=-0.25, epsg=28992, projected=True, nodata=-9999.0,
    )
    xls = encode_xlsx_fixture(title="T", creator="C", sheets=["a", "b"])
    df = spark.createDataFrame(
        [
            (1, bytearray(tif), "image/tiff"),
            (2, bytearray(xls), XLSX_TYPE),
            (3, b"\x01" * 10, "image/png"),  # no decoder for this type
            (4, None, "audio/wav"),
            (5, b"garbage not a tiff", "image/tiff"),
        ],
        "id long, payload binary, media_type string",
    )
    got = {r["id"]: r for r in decode_media(df, "payload", "media_type", "id").collect()}
    t = got[1]
    assert (t["width"], t["height"], t["n_bands"]) == (64, 32, 3)
    assert t["epsg"] == "EPSG:28992" and t["nodata"] == -9999.0
    assert list(t["bounds"]) == [5.0, 52.0 - 32 * 0.25, 5.0 + 64 * 0.5, 52.0]
    x = got[2]
    assert x["title"] == "T" and x["creator"] == "C" and x["n_sheets"] == 2
    assert got[3]["n_bytes"] == 10 and got[3]["width"] is None
    assert got[4]["n_bytes"] == 0 and got[4]["width"] is None
    assert got[5]["width"] is None  # malformed payload -> None, no raise
