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
    df = spark.createDataFrame(
        [(1, b"\x01" * 10, "image/png"), (2, None, "audio/wav")],
        "id long, payload binary, media_type string",
    )
    got = {r["id"]: r for r in decode_media(df, "payload", "media_type", "id").collect()}
    assert got[1]["n_bytes"] == 10 and got[1]["width"] == 11 and got[1]["height"] == 11
    assert got[2]["n_bytes"] == 0 and got[2]["width"] is None
