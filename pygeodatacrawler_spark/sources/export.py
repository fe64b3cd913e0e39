"""Export sink (S11): render MCF records to catalog profiles.

The reference renders each record through pygeometa output schemas
(/root/reference/geodatacrawler/metadata.py:199-230): ISO19139 XML by
default, or the ``dcat`` / ``stac`` / ``oarec-record`` JSON schemas
when ``--profile`` selects them, writing to
``safeFileName(identifier) + ('.xml'|'.json')``. This module
re-expresses that render pass as deterministic string-building Column
expressions (format_string / concat — JVM-side, whole-stage-codegen,
no UDF, no template engine), covering the MCF fields the reference's
crawl actually populates: identifier, title, abstract, keywords,
datestamp/creation, contact (organization+email), license, one
distribution (url/name/type), and the geographic extent.

Every renderer is oracle-portable: DuckDB can assemble byte-identical
payloads with ``||`` concatenation (entry_queries.SQL_EXPORT_RENDER).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

from pygeodatacrawler_spark.functions.urls import safe_filename

PROFILES = ("iso19139", "dcat", "stac", "oarec", "json")

#: columns every renderer expects on the input records
MCF_COLUMNS = (
    "identifier", "title", "abstract", "keywords", "datestamp", "creation",
    "contact_org", "contact_email", "license", "dist_url", "dist_name",
    "dist_type", "minx", "miny", "maxx", "maxy",
)


def _s(name: str) -> Column:
    return F.coalesce(F.col(name), F.lit(""))


def _xml(c: Column) -> Column:
    """Minimal XML text escape (&, <, > — the set ElementTree escapes)."""
    c = F.regexp_replace(c, "&", "&amp;")
    c = F.regexp_replace(c, "<", "&lt;")
    return F.regexp_replace(c, ">", "&gt;")


def _js(c: Column) -> Column:
    """JSON string escape: backslash and double quote, then the RFC
    8259 short escapes for the C0 controls that have them (\\b \\t \\n
    \\f \\r); the remaining controls (U+0000–07, 0B, 0E–1F) are
    stripped — they carry no text and a \\u00XX hex render is not
    expressible as a column expression. Mirrored verbatim by the
    DuckDB oracle (entry_queries._sql_export_render) so payload parity
    is byte-exact."""
    c = F.regexp_replace(F.regexp_replace(c, r"\\", r"\\\\"), '"', '\\\\"')
    for ch, esc in (
        ("\u0008", r"\\b"), ("\t", r"\\t"), ("\n", r"\\n"),
        ("\u000c", r"\\f"), ("\r", r"\\r"),
    ):
        c = F.regexp_replace(c, ch, esc)
    return F.regexp_replace(
        c, "[\u0000-\u0007\u000b\u000e-\u001f]", ""
    )


def _dec6(name: str) -> Column:
    """Fixed 6-dp decimal rendering — identical in Spark and DuckDB."""
    return F.col(name).cast("decimal(38,6)").cast("string")


def _kw_xml() -> Column:
    return F.when(
        F.size(F.col("keywords")) > 0,
        F.concat(
            F.lit("<gmd:keyword><gco:CharacterString>"),
            F.array_join(
                F.transform(F.col("keywords"), _xml),
                "</gco:CharacterString></gmd:keyword>"
                "<gmd:keyword><gco:CharacterString>",
            ),
            F.lit("</gco:CharacterString></gmd:keyword>"),
        ),
    ).otherwise(F.lit(""))


def _kw_json() -> Column:
    return F.when(
        F.size(F.col("keywords")) > 0,
        F.concat(
            F.lit('["'),
            F.array_join(F.transform(F.col("keywords"), _js), '","'),
            F.lit('"]'),
        ),
    ).otherwise(F.lit("[]"))


def ensure_mcf(records: DataFrame) -> DataFrame:
    """Fill any missing MCF columns with neutral defaults so every
    renderer analyses — the analog of the reference's coreMetadata
    default-merge before read_mcf (metadata.py:180-196)."""
    out = records
    for c in MCF_COLUMNS:
        if c in out.columns:
            continue
        if c == "keywords":
            out = out.withColumn(c, F.array().cast("array<string>"))
        elif c in ("minx", "miny", "maxx", "maxy"):
            out = out.withColumn(c, F.lit(0.0))
        else:
            out = out.withColumn(c, F.lit(None).cast("string"))
    for c in ("minx", "miny", "maxx", "maxy"):
        out = out.withColumn(c, F.coalesce(F.col(c).cast("double"), F.lit(0.0)))
    out = out.withColumn(
        "keywords", F.coalesce(F.col("keywords"), F.array().cast("array<string>"))
    )
    return out


def render_iso19139(records: DataFrame) -> Column:
    """ISO19139 XML covering the pygeometa template nodes the
    reference's MCFs populate (metadata.py:218-219 default branch)."""
    dist = F.when(
        F.col("dist_url").isNotNull(),
        F.concat(
            F.lit(
                "<gmd:distributionInfo><gmd:MD_Distribution>"
                "<gmd:transferOptions><gmd:CI_OnlineResource>"
                "<gmd:linkage><gmd:URL>"
            ),
            _xml(_s("dist_url")),
            F.lit("</gmd:URL></gmd:linkage><gmd:name><gco:CharacterString>"),
            _xml(_s("dist_name")),
            F.lit(
                "</gco:CharacterString></gmd:name>"
                "<gmd:protocol><gco:CharacterString>"
            ),
            _xml(_s("dist_type")),
            F.lit(
                "</gco:CharacterString></gmd:protocol>"
                "</gmd:CI_OnlineResource></gmd:transferOptions>"
                "</gmd:MD_Distribution></gmd:distributionInfo>"
            ),
        ),
    ).otherwise(F.lit(""))
    return F.concat(
        F.lit(
            '<gmd:MD_Metadata'
            ' xmlns:gmd="http://www.isotc211.org/2005/gmd"'
            ' xmlns:gco="http://www.isotc211.org/2005/gco">'
            "<gmd:fileIdentifier><gco:CharacterString>"
        ),
        _xml(_s("identifier")),
        F.lit(
            "</gco:CharacterString></gmd:fileIdentifier>"
            "<gmd:hierarchyLevel><gmd:MD_ScopeCode>dataset"
            "</gmd:MD_ScopeCode></gmd:hierarchyLevel>"
            "<gmd:contact><gmd:CI_ResponsibleParty>"
            "<gmd:organisationName><gco:CharacterString>"
        ),
        _xml(_s("contact_org")),
        F.lit(
            "</gco:CharacterString></gmd:organisationName>"
            "<gmd:electronicMailAddress><gco:CharacterString>"
        ),
        _xml(_s("contact_email")),
        F.lit(
            "</gco:CharacterString></gmd:electronicMailAddress>"
            "</gmd:CI_ResponsibleParty></gmd:contact>"
            "<gmd:dateStamp><gco:Date>"
        ),
        _s("datestamp"),
        F.lit(
            "</gco:Date></gmd:dateStamp>"
            "<gmd:identificationInfo><gmd:MD_DataIdentification>"
            "<gmd:title><gco:CharacterString>"
        ),
        _xml(_s("title")),
        F.lit(
            "</gco:CharacterString></gmd:title>"
            "<gmd:abstract><gco:CharacterString>"
        ),
        _xml(_s("abstract")),
        F.lit(
            "</gco:CharacterString></gmd:abstract>"
            "<gmd:descriptiveKeywords>"
        ),
        _kw_xml(),
        F.lit(
            "</gmd:descriptiveKeywords>"
            "<gmd:resourceConstraints><gmd:MD_LegalConstraints>"
            "<gmd:otherConstraints><gco:CharacterString>"
        ),
        _xml(_s("license")),
        F.lit(
            "</gco:CharacterString></gmd:otherConstraints>"
            "</gmd:MD_LegalConstraints></gmd:resourceConstraints>"
            "<gmd:extent><gmd:EX_GeographicBoundingBox>"
            "<gmd:westBoundLongitude><gco:Decimal>"
        ),
        _dec6("minx"),
        F.lit("</gco:Decimal></gmd:westBoundLongitude>"
              "<gmd:eastBoundLongitude><gco:Decimal>"),
        _dec6("maxx"),
        F.lit("</gco:Decimal></gmd:eastBoundLongitude>"
              "<gmd:southBoundLatitude><gco:Decimal>"),
        _dec6("miny"),
        F.lit("</gco:Decimal></gmd:southBoundLatitude>"
              "<gmd:northBoundLatitude><gco:Decimal>"),
        _dec6("maxy"),
        F.lit(
            "</gco:Decimal></gmd:northBoundLatitude>"
            "</gmd:EX_GeographicBoundingBox></gmd:extent>"
            "</gmd:MD_DataIdentification></gmd:identificationInfo>"
        ),
        dist,
        F.lit("</gmd:MD_Metadata>"),
    )


def _bbox_json() -> Column:
    return F.concat(
        F.lit("["), _dec6("minx"), F.lit(","), _dec6("miny"), F.lit(","),
        _dec6("maxx"), F.lit(","), _dec6("maxy"), F.lit("]"),
    )


def _bbox_polygon() -> Column:
    """GeoJSON Polygon ring of the extent (closed, counter-clockwise)."""
    def pt(x: str, y: str) -> list[Column]:
        return [F.lit("["), _dec6(x), F.lit(","), _dec6(y), F.lit("]")]

    return F.concat(
        F.lit('{"type":"Polygon","coordinates":[['),
        *pt("minx", "miny"), F.lit(","),
        *pt("maxx", "miny"), F.lit(","),
        *pt("maxx", "maxy"), F.lit(","),
        *pt("minx", "maxy"), F.lit(","),
        *pt("minx", "miny"),
        F.lit("]]}"),
    )


def render_dcat(records: DataFrame) -> Column:
    """DCAT JSON — the DCATOutputSchema field set (metadata.py:213-215)."""
    dist = F.when(
        F.col("dist_url").isNotNull(),
        F.concat(
            F.lit('[{"@type":"dcat:Distribution","dcat:accessURL":"'),
            _js(_s("dist_url")),
            F.lit('","dct:title":"'), _js(_s("dist_name")),
            F.lit('","dct:format":"'), _js(_s("dist_type")),
            F.lit('"}]'),
        ),
    ).otherwise(F.lit("[]"))
    return F.concat(
        F.lit('{"@type":"dcat:Dataset","dct:identifier":"'),
        _js(_s("identifier")),
        F.lit('","dct:title":"'), _js(_s("title")),
        F.lit('","dct:description":"'), _js(_s("abstract")),
        F.lit('","dcat:keyword":'), _kw_json(),
        F.lit(',"dct:issued":"'), _s("creation"),
        F.lit('","dct:modified":"'), _s("datestamp"),
        F.lit('","dct:license":"'), _js(_s("license")),
        F.lit('","dcat:contactPoint":{"vcard:fn":"'),
        _js(_s("contact_org")),
        F.lit('","vcard:hasEmail":"'), _js(_s("contact_email")),
        F.lit('"},"dcat:distribution":'), dist,
        F.lit(',"dct:spatial":{"bbox":'), _bbox_json(), F.lit("}}"),
    )


def render_stac(records: DataFrame) -> Column:
    """STAC Item JSON — the STACItemOutputSchema field set
    (metadata.py:206-209)."""
    assets = F.when(
        F.col("dist_url").isNotNull(),
        F.concat(
            F.lit('{"data":{"href":"'), _js(_s("dist_url")),
            F.lit('","title":"'), _js(_s("dist_name")), F.lit('"}}'),
        ),
    ).otherwise(F.lit("{}"))
    return F.concat(
        F.lit('{"type":"Feature","stac_version":"1.0.0","id":"'),
        _js(_s("identifier")),
        F.lit('","bbox":'), _bbox_json(),
        F.lit(',"geometry":'), _bbox_polygon(),
        F.lit(',"properties":{"title":"'), _js(_s("title")),
        F.lit('","description":"'), _js(_s("abstract")),
        F.lit('","datetime":"'), _s("datestamp"),
        F.lit('T00:00:00Z","created":"'), _s("creation"),
        F.lit('"},"links":[],"assets":'), assets, F.lit("}"),
    )


def render_oarec(records: DataFrame) -> Column:
    """OGC API Records JSON — the OGCAPIRecordOutputSchema field set
    (metadata.py:210-212)."""
    links = F.when(
        F.col("dist_url").isNotNull(),
        F.concat(
            F.lit('[{"href":"'), _js(_s("dist_url")),
            F.lit('","rel":"item","title":"'), _js(_s("dist_name")),
            F.lit('"}]'),
        ),
    ).otherwise(F.lit("[]"))
    return F.concat(
        F.lit('{"id":"'), _js(_s("identifier")),
        F.lit('","type":"Feature","geometry":'), _bbox_polygon(),
        F.lit(',"properties":{"type":"dataset","title":"'),
        _js(_s("title")),
        F.lit('","description":"'), _js(_s("abstract")),
        F.lit('","keywords":'), _kw_json(),
        F.lit(',"created":"'), _s("creation"),
        F.lit('","updated":"'), _s("datestamp"),
        F.lit('","contactPoint":"'), _js(_s("contact_org")),
        F.lit('","license":"'), _js(_s("license")),
        F.lit('"},"links":'), links, F.lit("}"),
    )


_RENDERERS = {
    "iso19139": (render_iso19139, "xml"),
    "dcat": (render_dcat, "json"),
    "stac": (render_stac, "json"),
    "oarec": (render_oarec, "json"),
}


def export_records(records: DataFrame, profile: str = "iso19139") -> DataFrame:
    """records -> (identifier, filename, profile, payload).

    ``filename`` follows the reference exactly:
    ``safeFileName(identifier) + '.' + ('xml'|'json')``
    (metadata.py:221-228).
    """
    if profile not in PROFILES:
        raise ValueError(f"unknown profile {profile!r}; use one of {PROFILES}")
    records = ensure_mcf(records)
    if profile == "json":  # legacy raw-struct dump (round-2 behaviour)
        payload = F.to_json(F.struct(*MCF_COLUMNS))
        ext = "json"
    else:
        renderer, ext = _RENDERERS[profile]
        payload = renderer(records)
    return records.select(
        "identifier",
        F.concat(
            safe_filename(F.col("identifier")), F.lit(f".{ext}")
        ).alias("filename"),
        F.lit(profile).alias("profile"),
        payload.alias("payload"),
    )


def write_exports(
    records: DataFrame, out_dir: str, profile: str = "iso19139"
) -> None:
    """Partitioned-by-profile parquet sink of rendered records."""
    export_records(records, profile).write.mode("append").partitionBy(
        "profile"
    ).parquet(out_dir)
