"""DOI resolution cascade goldens — field mappings mirror the
reference's parseDataCite/parseCrossref/DOIContactstoMCF/DOIRelations
(/root/reference/geodatacrawler/utils.py:462-663) on crafted responses."""

from __future__ import annotations

import pyspark.sql.functions as F

from pygeodatacrawler_spark.operators.doi import resolve_doi

DC_RESP = (
    '{"data":[{"attributes":{'
    '"titles":[{"title":"Soil grid"}],'
    '"descriptions":[{"description":"A soil dataset"}],'
    '"creators":[{"name":"Ada Lovelace","affiliation":["Analytical"],'
    '"nameIdentifiers":[{"nameIdentifier":"https://orcid.org/1"}]},'
    '{"familyName":"Curie"}],'
    '"contributors":[{"name":"Ada Lovelace","contributorType":"Editor"}],'
    '"licenses":[{"title":"CC-BY-4.0"}],'
    '"rightsList":[{"rightsIdentifier":"cc0"},{"rightsURI":"https://r/2"}],'
    '"dates":[{"date":"2019-05-01","dateType":"Issued"}],'
    '"publicationYear":2020,'
    '"subjects":[{"subject":"soil"},{"subject":"grid"}],'
    '"types":{"resourceTypeGeneral":"Dataset","resourceType":"grid"},'
    '"relatedIdentifiers":['
    '{"relatedIdentifier":"x","relatedIdentifierType":"URL"},'
    '{"relatedIdentifier":"10.1/rel","relatedIdentifierType":"DOI",'
    '"relationType":"IsSupplementTo"}]'
    "}}]}"
)
CR_RESP = (
    '{"message":{"type":"journal-article","title":["A paper"],'
    '"abstract":"jats:Deep jats:stuff","publisher":"ACME",'
    '"created":{"date-time":"2021-01-01T00:00:00Z"},'
    '"published":{"date-parts":[[2021,3,2]]},'
    '"license":[{"URL":"https://lic/x"}],'
    '"author":[{"given":"Grace","family":"Hopper",'
    '"affiliation":[{"Name":"Navy"}]}],'
    '"indexed":{"date-time":"2022-02-02T00:00:00Z"}}}'
)
BT_RESP = "@misc{my+key(1), title = {Bib title}, abstract = {Bib abs}}"


def _resolve(spark, url, dc=None, cr=None, bt=None):
    df = spark.createDataFrame(
        [(url, dc, cr, bt)],
        "url string, datacite_resp string, crossref_resp string, bibtex_resp string",
    )
    return resolve_doi(df).select("doi", "resolve_stage", "mcf").collect()[0]


def test_datacite_golden(spark):
    r = _resolve(spark, "https://doi.org/10.5281/zen.1?x=1", dc=DC_RESP)
    assert r["doi"] == "10.5281/zen.1?x=1"
    assert r["resolve_stage"] == "datacite"
    mcf = r["mcf"]
    # identifier: safeFileName of host+path (scheme/query stripped)
    assert mcf["metadata"]["identifier"] == "doi.org-10.5281-zen.1"
    assert mcf["metadata"]["hierarchylevel"] == "dataset"
    assert mcf["identification"]["title"] == "Soil grid"
    assert mcf["identification"]["abstract"] == "A soil dataset"
    assert mcf["identification"]["license_name"] == "CC-BY-4.0"
    # last rightsList entry wins; rightsURI preferred
    assert mcf["identification"]["rights"] == "https://r/2"
    # subjects quirk: the LAST subject wins
    assert mcf["identification"]["keywords"] == ["grid"]
    assert mcf["identification"]["dates"]["issued"] == "2019-05-01"
    assert mcf["identification"]["dates"]["publication"] == "2020"
    # contacts: key = safeFileName(name or org); Ada appears as creator
    # then contributor -> last writer wins (role Editor); Curie via
    # familyName fallback (name empty)
    c = mcf["contact"]
    assert set(c.keys()) == {"Ada-Lovelace", "Curie"}
    assert c["Ada-Lovelace"]["role"] == "Editor"
    assert c["Curie"]["individualname"] == "Curie"
    # distribution: contentUrl + r{original index} for DOI relations
    d = mcf["distribution"]
    assert d["contentUrl"]["url"] == "https://doi.org/10.5281/zen.1?x=1"
    assert d["r1"]["url"] == "https://doi.org/10.1/rel"
    assert d["r1"]["title"] == "IsSupplementTo"
    assert "r0" not in d  # URL-type relation skipped, index preserved
    assert mcf["spatial"]["type"] == "grid"


def test_crossref_golden_and_datacite_invalid(spark):
    dc_empty_title = DC_RESP.replace('"title":"Soil grid"', '"title":""')
    r = _resolve(spark, "https://doi.org/10.9/x", dc=dc_empty_title, cr=CR_RESP)
    assert r["resolve_stage"] == "crossref"
    mcf = r["mcf"]
    assert mcf["metadata"]["identifier"] == "10.9/x"
    assert mcf["metadata"]["dataseturi"] == "http://doi.org/10.9/x"
    assert mcf["metadata"]["datestamp"] == "2022-02-02T00:00:00Z"
    assert mcf["identification"]["title"] == "A paper"
    assert mcf["identification"]["abstract"] == "Deep stuff"  # jats: stripped
    assert mcf["identification"]["dates"]["publication"] == "2021-3-2"
    assert mcf["identification"]["license_url"] == "https://lic/x"
    c = mcf["contact"]
    assert c["publisher"]["organization"] == "ACME"
    assert c["author1"]["individualname"] == "Grace Hopper"
    assert c["author1"]["organization"] == "Navy"
    d = mcf["distribution"]
    assert d["primary"]["url"] == "http://doi.org/10.9/x"  # resource absent
    assert d["primary"]["type"] == "application/pdf"


def test_blocklist_skips_valid_datacite(spark):
    r = _resolve(spark, "https://doi.org/10.1016/j.x", dc=DC_RESP, cr=CR_RESP)
    assert r["resolve_stage"] == "crossref"  # 10.1016 never hits DataCite


def test_bibtex_fallback_golden(spark):
    r = _resolve(spark, "https://doi.org/10.9/y", bt=BT_RESP)
    assert r["resolve_stage"] == "bibtex"
    mcf = r["mcf"]
    # safeFileName on the entry key: '+' and '()' deleted
    assert mcf["metadata"]["identifier"] == "mykey1"
    assert mcf["metadata"]["hierarchylevel"] == "misc"
    assert mcf["identification"]["title"] == "Bib title"
    assert mcf["identification"]["abstract"] == "Bib abs"
    assert mcf["contact"] == {}


def test_non_http_and_unresolvable(spark):
    r = _resolve(spark, "ftp://doi.org/10.9/z", dc=DC_RESP)
    assert r["resolve_stage"] is None and r["mcf"] is None
    r2 = _resolve(spark, "https://example.org/page")
    assert r2["doi"] is None and r2["resolve_stage"] is None