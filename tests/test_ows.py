"""WMS layer fan-out + 3-stage layer matching (checkOWSLayer
utils.py:307-349, owsCapabilities2md utils.py:798-850)."""

from __future__ import annotations

import pyspark.sql.functions as F

from pygeodatacrawler_spark.operators.ows import layer_explode, match_ows_layers

CAPS = (
    '{"identification":{"title":"Geo Service","abstract":"A","'
    'accessconstraints":"none","fees":"none"},'
    '"provider":{"name":"Prov","url":"https://p.org"},'
    '"layers":['
    '{"name":"","title":"unnamed group"},'
    '{"name":"rivers","title":"","keywords":["water"],'
    '"bbox":[0.0,0.0,10.0,20.0],'
    '"metadataUrls":[{"url":"https://cat/md-abc123","format":"text/xml"}]},'
    '{"name":"Lakes","title":"Lake layer","keywords":[]}'
    "]}"
)


def _layers(spark):
    df = spark.createDataFrame(
        [("https://svc/wms", CAPS)], "service_url string, capabilities string"
    )
    return layer_explode(df)


def test_layer_explode(spark):
    rows = {r["layer_name"]: r for r in _layers(spark).collect()}
    # unnamed group layer dropped
    assert set(rows) == {"rivers", "Lakes"}
    # empty layer title falls back to the service title
    assert rows["rivers"]["layer_title"] == "Geo Service"
    assert rows["Lakes"]["layer_title"] == "Lake layer"
    assert rows["rivers"]["provider_name"] == "Prov"
    assert rows["rivers"]["metadataUrls"][0]["url"] == "https://cat/md-abc123"
    assert rows["rivers"]["bbox"] == [0.0, 0.0, 10.0, 20.0]
    assert rows["Lakes"]["metadataUrls"] == []


def _match(spark, name=None, identifier=None, title=None):
    req = spark.createDataFrame(
        [(1, "https://svc/wms", name, identifier, title)],
        "request_id long, service_url string, name string, "
        "identifier string, title string",
    )
    return match_ows_layers(_layers(spark), req).collect()


def test_all_pseudo_layer_selects_everything(spark):
    got = _match(spark, name="ALL")
    assert {r["layer_name"] for r in got} == {"rivers", "Lakes"}
    assert all(r["stage"] == 1 for r in got)


def test_name_match_case_insensitive_multi(spark):
    got = _match(spark, name="LAKES,nothere")
    assert [r["layer_name"] for r in got] == ["Lakes"]


def test_identifier_matches_metadataurl_containment(spark):
    got = _match(spark, identifier="abc123")
    assert [r["layer_name"] for r in got] == ["rivers"]
    assert got[0]["stage"] == 2


def test_title_stage_and_priority(spark):
    # title matches Lakes (stage 3) but name matches rivers (stage 1):
    # first stage with a match wins
    got = _match(spark, name="rivers", title="lake layer")
    assert [r["layer_name"] for r in got] == ["rivers"]
    got2 = _match(spark, title=" LAKE LAYER ")
    assert [r["layer_name"] for r in got2] == ["Lakes"]
    assert got2[0]["stage"] == 3


def test_no_match_empty(spark):
    assert _match(spark, name="nope", identifier="zz", title="zz") == []