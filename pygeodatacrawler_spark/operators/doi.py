"""DOI -> DataCite -> Crossref -> bibtex metadata resolution cascade.

Rebuilds the reference's remote-enrichment path (fetchMetadata
/root/reference/geodatacrawler/utils.py:509-562, parseDataCite
utils.py:632-663, parseCrossref utils.py:583-630, DOIContactstoMCF
utils.py:475-487, DOIRelations utils.py:462-473, valideMD
utils.py:502-507) as pure Column expressions over ALREADY-FETCHED API
response payloads: ``from_json`` with the full response schemas, then a
``when``-chained short-circuit — a stage's parse is used only when the
earlier stage produced no valid record (valid = non-empty title AND
identifier), mirroring the reference's try/except ladder. The prefix
blocklist (``doi-prefix-not-in-datacite``, __init__.py:15) skips the
DataCite stage entirely for known-absent registrants.

At crawl scale the response columns come from the fetch stage
(mapInPandas HTTP in production, the pages-store join in the sandbox);
resolution itself is JVM-side, codegen'd, zero Python. The nested
record shape (contact/distribution as open-key maps) is the full MCF
form of SURVEY §1.2 — contact keys are ``safeFileName(name or org)``
with dict-style last-writer-wins (spark.sql.mapKeyDedupPolicy).

The bibtex fallback is a deterministic regex field-extractor (the
reference uses bibtexparser, absent here); it captures the entry key,
type and ``field = {value}`` pairs the tests pin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

from pygeodatacrawler_spark.functions.urls import safe_filename

# registrant prefixes known to be absent from DataCite — skip the
# lookup (reference __init__.py:15, checked at utils.py:523-524)
DOI_PREFIX_NOT_IN_DATACITE = [
    "10.1002", "10.1007", "10.1016", "10.1038",
    "10.1039", "10.1051", "10.1021", "10.1029",
]

# ---------------------------------------------------------------- schemas
# Full response schemas (public API shapes), so every field the
# reference's parsers touch is typed — absent keys read as NULL.
_DC_PERSON = (
    "struct<name:string, familyName:string, givenName:string, "
    "affiliation:array<string>, contributorType:string, "
    "nameIdentifiers:array<struct<nameIdentifier:string, "
    "nameIdentifierScheme:string>>>"
)
DATACITE_SCHEMA = (
    "struct<data:array<struct<id:string, type:string, attributes:struct<"
    "doi:string, "
    "titles:array<struct<title:string, lang:string>>, "
    "descriptions:array<struct<description:string, descriptionType:string>>, "
    f"creators:array<{_DC_PERSON}>, "
    f"contributors:array<{_DC_PERSON}>, "
    "licenses:array<struct<title:string>>, "
    "rightsList:array<struct<rightsURI:string, rightsIdentifier:string>>, "
    "dates:array<struct<date:string, dateType:string>>, "
    "publicationYear:bigint, "
    "subjects:array<struct<subject:string>>, "
    "types:struct<resourceTypeGeneral:string, resourceType:string>, "
    "relatedIdentifiers:array<struct<relatedIdentifier:string, "
    "relatedIdentifierType:string, relationType:string>>, "
    "url:string, publisher:string"
    ">>>>"
)

CROSSREF_SCHEMA = (
    "struct<message:struct<"
    "type:string, title:array<string>, abstract:string, language:string, "
    "publisher:string, ORCID:string, "
    "indexed:struct<`date-time`:string>, "
    "created:struct<`date-time`:string>, "
    "published:struct<`date-parts`:array<array<int>>>, "
    "`published-online`:struct<`date-parts`:array<array<int>>>, "
    "license:array<struct<URL:string>>, "
    "`short-container-title`:array<string>, "
    "author:array<struct<given:string, family:string, "
    "affiliation:array<struct<Name:string>>>>, "
    "resource:struct<primary:struct<URL:string>>"
    ">>"
)

# The nested MCF record (SURVEY §1.2): fixed structs for the closed
# sections, open-key maps for contact/distribution.
CONTACT_TYPE = (
    "struct<individualname:string, role:string, organization:string, url:string>"
)
DIST_TYPE = "struct<url:string, type:string, title:string, name:string>"
MCF_NESTED_SCHEMA = (
    "struct<"
    "metadata:struct<identifier:string, language:string, "
    "hierarchylevel:string, dataseturi:string, datestamp:string>, "
    "identification:struct<title:string, abstract:string, language:string, "
    "license_name:string, license_url:string, rights:string, "
    "keywords:array<string>, dates:map<string,string>>, "
    f"contact:map<string,{CONTACT_TYPE}>, "
    f"distribution:map<string,{DIST_TYPE}>, "
    "spatial:struct<type:string>"
    ">"
)


def _s(x) -> Column:
    return F.coalesce(x, F.lit(""))


def doi_of(url: Column) -> Column:
    """The DOI suffix after 'doi.org/' (utils.py:520: split().pop())."""
    return F.when(
        url.contains("doi.org/"),
        F.regexp_extract(url, r"doi\.org/(.*)$", 1),
    )


def doi_prefix(url: Column) -> Column:
    return F.split(doi_of(url), "/")[0]


def valide_md(mcf: Column) -> Column:
    """valideMD (utils.py:502-507): non-empty title AND identifier."""
    return (_s(mcf["identification"]["title"]) != "") & (
        _s(mcf["metadata"]["identifier"]) != ""
    )


# ---------------------------------------------------------------- DataCite
def parse_datacite(resp: Column, url: Column) -> Column:
    """DataCite query response -> nested MCF (parseDataCite
    utils.py:632-663). NULL when the response is missing/empty."""
    parsed = F.from_json(resp, DATACITE_SCHEMA)
    attrs = parsed["data"][0]["attributes"]

    # DOIContactstoMCF (utils.py:475-487): key safeFileName(name or
    # org); skipped when both empty; last writer wins on key collision
    people = F.concat(
        F.coalesce(attrs["creators"], F.array()),
        F.coalesce(attrs["contributors"], F.array()),
    )
    contact_entries = F.filter(
        F.transform(
            people,
            lambda c: F.struct(
                safe_filename(
                    F.coalesce(
                        F.nullif(_s(F.coalesce(c["name"], c["familyName"])), F.lit("")),
                        c["affiliation"][0],
                    )
                ).alias("key"),
                F.struct(
                    _s(F.coalesce(c["name"], c["familyName"])).alias("individualname"),
                    _s(c["contributorType"]).alias("role"),
                    _s(c["affiliation"][0]).alias("organization"),
                    _s(c["nameIdentifiers"][0]["nameIdentifier"]).alias("url"),
                ).alias("value"),
            ),
        ),
        lambda e: e["key"].isNotNull() & (e["key"] != ""),
    )
    contact = F.map_from_entries(contact_entries)

    # DOIRelations (utils.py:462-473): contentUrl + r{i} for DOI rels,
    # i = the ORIGINAL enumerate index over all relations
    rels = F.coalesce(attrs["relatedIdentifiers"], F.array())
    rel_entries = F.filter(
        F.transform(
            rels,
            lambda r, i: F.when(
                (_s(r["relatedIdentifierType"]) == "DOI")
                & (_s(r["relatedIdentifier"]) != ""),
                F.struct(
                    F.concat(F.lit("r"), i.cast("string")).alias("key"),
                    F.struct(
                        F.concat(
                            F.lit("https://doi.org/"), r["relatedIdentifier"]
                        ).alias("url"),
                        F.lit("WWW:LINK").alias("type"),
                        _s(r["relationType"]).alias("title"),
                        F.lit(None).cast("string").alias("name"),
                    ).alias("value"),
                ),
            ),
        ),
        lambda e: e.isNotNull(),
    )
    distribution = F.map_concat(
        F.create_map(
            F.lit("contentUrl"),
            F.struct(
                url.alias("url"),
                F.lit("WWW:LINK").alias("type"),
                F.lit("Link").alias("title"),
                F.lit(None).cast("string").alias("name"),
            ),
        ),
        F.map_from_entries(rel_entries),
    )

    # dates: {dateType.lower(): date} then publication=publicationYear
    date_entries = F.transform(
        F.coalesce(attrs["dates"], F.array()),
        lambda d: F.struct(
            F.lower(F.coalesce(d["dateType"], F.lit("creation"))).alias("key"),
            _s(d["date"]).alias("value"),
        ),
    )
    dates = F.when(
        attrs["publicationYear"].isNotNull(),
        F.map_concat(
            F.map_from_entries(date_entries),
            F.create_map(
                F.lit("publication"), attrs["publicationYear"].cast("string")
            ),
        ),
    ).otherwise(F.map_from_entries(date_entries))

    # subjects quirk (utils.py:654-657): LAST subject wins as keywords
    last_subject = F.element_at(attrs["subjects"], -1)["subject"]
    keywords = F.when(
        last_subject.isNotNull(), F.array(last_subject)
    ).otherwise(F.array().cast("array<string>"))

    # rights: LAST rightsList entry wins (utils.py:651-652)
    last_rights = F.element_at(attrs["rightsList"], -1)
    rights = F.coalesce(last_rights["rightsURI"], last_rights["rightsIdentifier"])

    mcf = F.struct(
        F.struct(
            safe_filename(
                F.regexp_replace(
                    F.regexp_replace(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://", ""),
                    r"\?.*$",
                    "",
                )
            ).alias("identifier"),
            F.lit(None).cast("string").alias("language"),
            F.lower(
                F.coalesce(attrs["types"]["resourceTypeGeneral"], F.lit("dataset"))
            ).alias("hierarchylevel"),
            F.lit(None).cast("string").alias("dataseturi"),
            F.lit(None).cast("string").alias("datestamp"),
        ).alias("metadata"),
        F.struct(
            _s(attrs["titles"][0]["title"]).alias("title"),
            _s(attrs["descriptions"][0]["description"]).alias("abstract"),
            F.lit(None).cast("string").alias("language"),
            _s(attrs["licenses"][0]["title"]).alias("license_name"),
            F.lit(None).cast("string").alias("license_url"),
            rights.alias("rights"),
            keywords.alias("keywords"),
            dates.alias("dates"),
        ).alias("identification"),
        contact.alias("contact"),
        distribution.alias("distribution"),
        F.struct(_s(attrs["types"]["resourceType"]).alias("type")).alias("spatial"),
    )
    return F.when(parsed["data"][0].isNotNull(), mcf)


# ---------------------------------------------------------------- Crossref
def parse_crossref(resp: Column, doi: Column) -> Column:
    """Crossref works response -> nested MCF (parseCrossref
    utils.py:583-630). NULL when there is no message object."""
    parsed = F.from_json(resp, CROSSREF_SCHEMA)
    msg = parsed["message"]
    published = F.coalesce(msg["published"], msg["published-online"])
    # str(date-parts) string surgery (utils.py:600):
    # [[2021, 3, 2]] -> '2021-3-2'
    pub_date = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.coalesce(
                    published["date-parts"].cast("string"), F.lit("[]")
                ),
                r"\[", "",
            ),
            r", ", "-",
        ),
        r"\]", "",
    )

    authors = F.coalesce(msg["author"], F.array())
    author_entries = F.transform(
        authors,
        lambda a, i: F.struct(
            F.concat(F.lit("author"), (i + 1).cast("string")).alias("key"),
            F.struct(
                F.concat_ws(" ", _s(a["given"]), _s(a["family"])).alias(
                    "individualname"
                ),
                F.lit("author").alias("role"),
                _s(a["affiliation"][0]["Name"]).alias("organization"),
                _s(msg["ORCID"]).alias("url"),  # message-level, as in ref
            ).alias("value"),
        ),
    )
    contact = F.map_concat(
        F.create_map(
            F.lit("publisher"),
            F.struct(
                F.lit(None).cast("string").alias("individualname"),
                F.lit("publisher").alias("role"),
                _s(msg["publisher"]).alias("organization"),
                F.lit(None).cast("string").alias("url"),
            ),
        ),
        F.map_from_entries(author_entries),
    )

    default_url = F.concat(F.lit("http://doi.org/"), doi)
    distribution = F.create_map(
        F.lit("primary"),
        F.struct(
            F.coalesce(msg["resource"]["primary"]["URL"], default_url).alias("url"),
            F.lit("application/pdf").alias("type"),
            F.lit(None).cast("string").alias("title"),
            _s(msg["title"][0]).alias("name"),
        ),
    )

    mcf = F.struct(
        F.struct(
            doi.alias("identifier"),
            F.lit("eng").alias("language"),
            F.coalesce(msg["type"], F.lit("journal-article")).alias(
                "hierarchylevel"
            ),
            default_url.alias("dataseturi"),
            _s(msg["indexed"]["date-time"]).alias("datestamp"),
        ).alias("metadata"),
        F.struct(
            _s(msg["title"][0]).alias("title"),
            F.regexp_replace(_s(msg["abstract"]), "jats:", "").alias("abstract"),
            _s(msg["language"]).alias("language"),
            F.lit("").alias("license_name"),
            _s(msg["license"][0]["URL"]).alias("license_url"),
            F.lit(None).cast("string").alias("rights"),
            F.coalesce(
                msg["short-container-title"], F.array().cast("array<string>")
            ).alias("keywords"),
            F.map_from_entries(
                F.array(
                    F.struct(
                        F.lit("creation").alias("key"),
                        _s(msg["created"]["date-time"]).alias("value"),
                    ),
                    F.struct(
                        F.lit("publication").alias("key"), pub_date.alias("value")
                    ),
                )
            ).alias("dates"),
        ).alias("identification"),
        contact.alias("contact"),
        distribution.alias("distribution"),
        F.struct(F.lit(None).cast("string").alias("type")).alias("spatial"),
    )
    return F.when(msg.isNotNull(), mcf)


# ---------------------------------------------------------------- bibtex
def parse_bibtex(resp: Column, url: Column) -> Column:
    """Bibtex fallback (utils.py:548-562): entry key -> identifier,
    entry type -> hierarchylevel, title/abstract fields when present;
    title falls back to safeFileName of the DOI tail, like the
    reference's parseDC(md, title-default) call."""
    key = F.regexp_extract(resp, r"@\w+\s*\{\s*([^,\s]+)\s*,", 1)
    entry_type = F.lower(F.regexp_extract(resp, r"@(\w+)\s*\{", 1))

    def field(name: str) -> Column:
        return F.regexp_extract(resp, name + r"\s*=\s*\{([^}]*)\}", 1)

    title = F.coalesce(
        F.nullif(field("title"), F.lit("")),
        safe_filename(doi_of(url)),
    )
    mcf = F.struct(
        F.struct(
            safe_filename(key).alias("identifier"),
            F.lit(None).cast("string").alias("language"),
            entry_type.alias("hierarchylevel"),
            F.lit(None).cast("string").alias("dataseturi"),
            F.lit(None).cast("string").alias("datestamp"),
        ).alias("metadata"),
        F.struct(
            title.alias("title"),
            _s(F.nullif(field("abstract"), F.lit(""))).alias("abstract"),
            F.lit(None).cast("string").alias("language"),
            F.lit(None).cast("string").alias("license_name"),
            F.lit(None).cast("string").alias("license_url"),
            F.lit(None).cast("string").alias("rights"),
            F.array().cast("array<string>").alias("keywords"),
            F.map_from_entries(
                F.array().cast("array<struct<key:string,value:string>>")
            ).alias("dates"),
        ).alias("identification"),
        F.map_from_entries(
            F.array().cast(f"array<struct<key:string,value:{CONTACT_TYPE}>>")
        ).alias("contact"),
        F.map_from_entries(
            F.array().cast(f"array<struct<key:string,value:{DIST_TYPE}>>")
        ).alias("distribution"),
        F.struct(F.lit(None).cast("string").alias("type")).alias("spatial"),
    )
    return F.when(key != "", mcf)


# ---------------------------------------------------------------- cascade
def resolve_doi(
    df: DataFrame,
    url_col: str = "url",
    datacite_col: str = "datacite_resp",
    crossref_col: str = "crossref_resp",
    bibtex_col: str = "bibtex_resp",
    blocklist: list[str] | None = None,
) -> DataFrame:
    """Adds ``doi``, ``resolve_stage`` and the nested ``mcf`` struct.

    Short-circuit order = the reference's try ladder (utils.py:509-562):
    DataCite (unless the registrant prefix is blocklisted) -> Crossref
    -> bibtex; a later stage applies only while the record so far fails
    valideMD. Non-http(s)/non-DOI urls resolve to NULL (utils.py:514).
    The blocklist is a literal isin — constant-folded, no join.
    """
    blocklist = DOI_PREFIX_NOT_IN_DATACITE if blocklist is None else blocklist
    url = F.col(url_col)
    doi = doi_of(url)
    is_http = url.startswith("http") | url.startswith("//")
    dc_allowed = ~doi_prefix(url).isin(blocklist)

    # Stage each parse as an explicit column (round 6): the ok-flags
    # and the mcf pick reference every parse 3-5 times, and from_json
    # is a CodegenFallback expression whose repeats are not reliably
    # subexpression-eliminated — the cascade re-parsed each JSON body
    # several times per row. Referenced-more-than-once non-cheap
    # aliases are exactly what CollapseProject refuses to re-inline,
    # so the staged projection guarantees one parse per source per
    # row. Same columns, same values.
    staged = df.select(
        "*",
        parse_datacite(F.col(datacite_col), url).alias("_dc"),
        parse_crossref(F.col(crossref_col), doi).alias("_cr"),
        parse_bibtex(F.col(bibtex_col), url).alias("_bt"),
    )
    dc = F.col("_dc")
    cr = F.col("_cr")
    bt = F.col("_bt")

    dc_ok = is_http & doi.isNotNull() & dc_allowed & dc.isNotNull() & valide_md(dc)
    cr_ok = is_http & doi.isNotNull() & cr.isNotNull() & valide_md(cr)
    bt_ok = is_http & doi.isNotNull() & bt.isNotNull() & valide_md(bt)

    stage = (
        F.when(dc_ok, F.lit("datacite"))
        .when(cr_ok, F.lit("crossref"))
        .when(bt_ok, F.lit("bibtex"))
    )
    mcf = F.when(dc_ok, dc).when(cr_ok, cr).when(bt_ok, bt)
    return (
        staged.withColumn("doi", doi)
        .withColumn("resolve_stage", stage)
        .withColumn("mcf", mcf)
        .drop("_dc", "_cr", "_bt")
    )
