"""ISO19139 depth + CSW unwrap (C16) and DC->MCF normalization (C13),
mirroring the reference's importer behavior (reference
tests/test_metadata.py:17-52 pins CSW GetRecordByIdResponse unwrap;
schemas/iso19139/__init__.py:71-161 is the nested field mapping)."""

from __future__ import annotations

from pygeodatacrawler_spark.functions.metadata import sniff_metadata_py

_ISO_NESTED = b"""<csw:GetRecordByIdResponse xmlns:csw="http://www.opengis.net/cat/csw/2.0.2">
<gmd:MD_Metadata xmlns:gmd="http://www.isotc211.org/2005/gmd" xmlns:gco="http://www.isotc211.org/2005/gco">
<gmd:fileIdentifier><gco:CharacterString>abc-123</gco:CharacterString></gmd:fileIdentifier>
<gmd:hierarchyLevel><gmd:MD_ScopeCode codeListValue="series">series</gmd:MD_ScopeCode></gmd:hierarchyLevel>
<gmd:dateStamp><gco:DateTime>2020-01-02T03:04:05</gco:DateTime></gmd:dateStamp>
<gmd:identificationInfo><gmd:MD_DataIdentification>
<gmd:citation><gmd:CI_Citation><gmd:title><gco:CharacterString>My Title</gco:CharacterString></gmd:title></gmd:CI_Citation></gmd:citation>
<gmd:abstract><gco:CharacterString>An abstract.</gco:CharacterString></gmd:abstract>
<gmd:descriptiveKeywords><gmd:MD_Keywords>
<gmd:keyword><gco:CharacterString>soil</gco:CharacterString></gmd:keyword>
<gmd:keyword><gco:CharacterString>water</gco:CharacterString></gmd:keyword>
</gmd:MD_Keywords></gmd:descriptiveKeywords>
<gmd:extent><gmd:EX_Extent><gmd:geographicElement><gmd:EX_GeographicBoundingBox>
<gmd:westBoundLongitude><gco:Decimal>-5.5</gco:Decimal></gmd:westBoundLongitude>
<gmd:eastBoundLongitude><gco:Decimal>9.5</gco:Decimal></gmd:eastBoundLongitude>
<gmd:southBoundLatitude><gco:Decimal>41.0</gco:Decimal></gmd:southBoundLatitude>
<gmd:northBoundLatitude><gco:Decimal>51.5</gco:Decimal></gmd:northBoundLatitude>
</gmd:EX_GeographicBoundingBox></gmd:geographicElement></gmd:EX_Extent></gmd:extent>
</gmd:MD_DataIdentification></gmd:identificationInfo>
</gmd:MD_Metadata></csw:GetRecordByIdResponse>"""


def test_csw_wrapped_iso_unwraps_nested_fields():
    r = sniff_metadata_py(_ISO_NESTED)
    assert r == {
        "kind": "iso19139",
        "identifier": "abc-123",
        "title": "My Title",
        "abstract": "An abstract.",
        "keywords": ["soil", "water"],
        "datestamp": "2020-01-02T03:04:05",
        "hierarchylevel": "series",
        "bbox": [-5.5, 41.0, 9.5, 51.5],
    }


def test_plain_island_still_parses():
    legacy = (
        b"<html><MD_Metadata><fileIdentifier>x1</fileIdentifier>"
        b"<title>T</title><abstract>A</abstract><keyword>k1</keyword>"
        b"<date>2021-01-01</date></MD_Metadata></html>"
    )
    r = sniff_metadata_py(legacy)
    assert r["kind"] == "iso19139"
    assert r["identifier"] == "x1"
    assert r["keywords"] == ["k1"]
    assert r["datestamp"] == "2021-01-01"
    assert r["hierarchylevel"] == "dataset"  # owslib/parseDC default
    assert r["bbox"] == []


def test_keyword_tag_does_not_swallow_keywords_container():
    # 'keyword' must not match the <MD_Keywords>/<keywords> container
    doc = (
        b"<MD_Metadata><keywords><keyword>a</keyword>"
        b"<keyword>b</keyword></keywords></MD_Metadata>"
    )
    assert sniff_metadata_py(doc)["keywords"] == ["a", "b"]


def test_partial_bbox_is_dropped():
    doc = (
        b"<MD_Metadata><title>t</title>"
        b"<westBoundLongitude><gco:Decimal>1.0</gco:Decimal></westBoundLongitude>"
        b"</MD_Metadata>"
    )
    assert sniff_metadata_py(doc)["bbox"] == []


def test_geo_and_mapfile_columns(spark):
    import pyspark.sql.functions as F

    from pygeodatacrawler_spark.functions.geo import crs2code, reproject_bounds
    from pygeodatacrawler_spark.functions.mapfile import hexcolor

    df = spark.createDataFrame(
        [
            ("EPSG:4326",),
            ("urn:ogc:def:crs:EPSG::28992",),
            ('GEOGCS["WGS 84",AUTHORITY["EPSG","4326"]]',),
            # root authority = LAST node, like OSR GetAuthorityCode(None)
            (
                'PROJCS["RD",GEOGCS["Amersfoort",AUTHORITY["EPSG","4289"]],'
                'AUTHORITY["EPSG","28992"]]',
            ),
            ("http://www.opengis.net/def/crs/EPSG/0/3857",),
            ("not a crs",),
            (None,),
        ],
        "crs string",
    )
    got = [r.code for r in df.select(crs2code(F.col("crs")).alias("code")).collect()]
    assert got == [
        "EPSG:4326", "EPSG:28992", "EPSG:4326", "EPSG:28992", "EPSG:3857",
        "", "",
    ]

    pt = spark.range(1).select(
        reproject_bounds(
            F.lit(0.0), F.lit(0.0), F.lit(180.0), F.lit(85.051128779806604)
        ).alias("b")
    ).collect()[0]["b"]
    assert abs(pt[0]) < 1e-6 and abs(pt[1]) < 1e-6
    assert abs(pt[2] - 20037508.342789244) < 1e-3
    assert abs(pt[3] - 20037508.342789244) < 1.0  # web-mercator square corner

    hx = spark.createDataFrame(
        [("255 128 0",), ("#AABBCC",), ("",), (None,)], "c string"
    ).select(hexcolor(F.col("c")).alias("h")).collect()
    assert [r.h for r in hx] == ["#ff8000", "#AABBCC", "#CCCCCC", "#CCCCCC"]


def test_ms_styler_optional_columns(spark):
    # Optional args must accept real Columns: `x or F.lit(None)` would
    # bool() the Column and raise CANNOT_CONVERT_COLUMN_INTO_BOOL.
    import pyspark.sql.functions as F

    from pygeodatacrawler_spark.functions.mapfile import ms_styler

    df = spark.createDataFrame(
        [
            ("point", "#ff0000", "0 0 0", "star", 7.0, 2.0),
            ("polygon", None, None, None, None, None),
            ("hexagon", "#ff0000", None, None, None, None),
        ],
        "g string, c string, lc string, sym string, sz double, w double",
    )
    out = df.select(
        ms_styler(
            F.col("g"), F.col("c"), F.col("lc"),
            F.col("sym"), F.col("sz"), F.col("w"),
        ).alias("s")
    ).collect()
    assert out[0].s == (
        'SYMBOL "star"\nCOLOR "#ff0000"\nSIZE 7.0\n'
        'OUTLINECOLOR "#000000"\nOUTLINEWIDTH 0.1\n'
    )
    assert out[1].s == 'COLOR "#eeeeee"\nOUTLINECOLOR "#232323"\nOUTLINEWIDTH 0.1\n'
    # unknown geomtype renders literal 'None' like the reference f-string
    assert out[2].s == "None"


def test_crs_fuzzy_and_utm(spark):
    import pyspark.sql.functions as F

    from pygeodatacrawler_spark.functions.geo import crs2code, reproject_bounds

    # FindMatches-style fuzzy recovery (utils.py:219-227) on WKT with
    # no authority nodes; longest registry name wins
    df = spark.createDataFrame(
        [
            ('PROJCS["WGS 84 / UTM zone 33N",GEOGCS["WGS 84",DATUM["WGS_1984"]]]',),
            ('GEOGCS["WGS 84",DATUM["WGS_1984"]]',),
            ("Amersfoort / RD New",),
            ("Amersfoort",),
            ("ETRS89 / UTM zone 32N",),
            ("not a known crs",),
        ],
        "crs string",
    )
    got = [r.code for r in df.select(crs2code(F.col("crs")).alias("code")).collect()]
    assert got == [
        "EPSG:32633", "EPSG:4326", "EPSG:28992", "EPSG:4289", "EPSG:25832", "",
    ]

    # UTM forward pinned on published control points (CN Tower 17N;
    # central-meridian anchor 33N), inverse closes the roundtrip
    pt = spark.range(1).select(
        reproject_bounds(
            F.lit(-79.387139), F.lit(43.642567), F.lit(15.0), F.lit(0.0),
            4326, 32617,
        ).alias("b")
    ).collect()[0]["b"]
    assert abs(pt[0] - 630084.30) < 0.05
    assert abs(pt[1] - 4833438.59) < 0.05

    anchor = spark.range(1).select(
        reproject_bounds(
            F.lit(15.0), F.lit(0.0), F.lit(16.0), F.lit(45.0), 4326, 32633
        ).alias("b")
    ).collect()[0]["b"]
    assert abs(anchor[0] - 500000.0) < 1e-6 and abs(anchor[1]) < 1e-6

    rt = spark.range(1).select(
        reproject_bounds(
            F.lit(anchor[0]), F.lit(anchor[1]),
            F.lit(anchor[2]), F.lit(anchor[3]),
            32633, 4326,
        ).alias("b")
    ).collect()[0]["b"]
    for got_v, want_v in zip(rt, [15.0, 0.0, 16.0, 45.0]):
        assert abs(got_v - want_v) < 1e-7

    # southern hemisphere false northing
    s = spark.range(1).select(
        reproject_bounds(
            F.lit(151.2153), F.lit(-33.8568), F.lit(151.2153), F.lit(-33.8568),
            4326, 32756,
        ).alias("b")
    ).collect()[0]["b"]
    assert abs(s[0] - 334900.57) < 0.05 and abs(s[1] - 6252288.75) < 0.05

    import pytest as _pytest

    # 21781 (Swiss oblique Mercator) stays outside the closed-form
    # set — 2154 (LCC) and 28992 (oblique stereographic) both moved to
    # supported in round 4
    with _pytest.raises(ValueError):
        reproject_bounds(F.lit(0), F.lit(0), F.lit(1), F.lit(1), 4326, 21781)


def test_mode1_class_block_single_quotes(spark):
    # reference mode-1 (equal-width) blocks quote NAME/GROUP with
    # SINGLE quotes (mapfile.py:419-425); dict modes use double quotes
    from pygeodatacrawler_spark.functions.mapfile import (
        equal_width_classes,
        render_class_block,
    )

    bounds = spark.createDataFrame([("L1", 0.0, 8.0)], "layer string, mn double, mx double")
    cls = equal_width_classes(bounds, "pixel", colors=("#ff0000", "#00ff00"))
    blocks = render_class_block(cls, "grid", name_quote="'").collect()
    b0 = next(r["class_block"] for r in blocks if r["idx"] == 0)
    assert b0.startswith("CLASS\nNAME '0.0000 - 4.0000'\nGROUP 'Default'\n")
    assert 'NAME "' not in b0
    assert 'COLOR "#ff0000"' in b0  # STYLE body keeps double quotes
