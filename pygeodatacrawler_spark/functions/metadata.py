"""Metadata sniffing: ISO19139 / Dublin-Core / HTML-title extraction
from page payloads, plus the checkId cascade and dict-merge semantics.

Rebuilds the reference's metadata harvest (parseISO
/root/reference/geodatacrawler/utils.py:771-796, parseDC
utils.py:688-769, XML sniff metadata.py:137-170, checkId
metadata.py:543-560, dict_merge utils.py:183-204) as:

- ``sniff_metadata_py`` — pure function bytes -> MCF-shaped dict, used
  by the sequential oracle;
- ``sniff_metadata_udf`` — the same function Arrow-batched over the
  html binary column (the north rule's geospatial-metadata UDF);
- ``check_id`` — the identifier cascade as a Column expression with a
  deterministic sha2 tail instead of the reference's uuid1()
  (determinism under retries, SURVEY §7 hard-part 6);
- ``merge_field`` — dict_merge's empty-never-clobbers rule
  (utils.py:199-202) as coalesce(nullif(trim(new),''), old).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column
import pyspark.sql.functions as F

MCF_SCHEMA = (
    "kind string, identifier string, title string, abstract string, "
    "keywords array<string>, datestamp string, hierarchylevel string, "
    "bbox array<double>"
)

# namespace-prefix-tolerant tag matching: real ISO19139 ships as
# <gmd:MD_Metadata ...> with gco:CharacterString leaf wrappers
# (reference importer: schemas/iso19139/__init__.py:92-94 via owslib
# xpath; CSW unwrap utils.py:771-786)
_NS = rb"(?:[A-Za-z][\w.-]*:)?"


def _block(data: bytes, tag: str) -> bytes | None:
    t = tag.encode()
    # (?=[\s>]) pins the tag-name end: 'keyword' must not match the
    # <keywords> container, 'date' not <dateStamp>
    m = re.search(
        rb"(?s)<" + _NS + t + rb"(?=[\s>])[^>]*>(.*?)</" + _NS + t + rb">",
        data,
    )
    return m.group(1) if m else None


_CHARSTRING = re.compile(
    rb"(?s)<" + _NS
    + rb"(CharacterString|DateTime|Date|Decimal|Real)(?=[\s>])"
    rb"[^>]*>(.*?)</" + _NS + rb"\1>"
)


def _text(block: bytes | None) -> str | None:
    """Leaf text with gco:CharacterString/Date/Decimal unwrapping."""
    if block is None:
        return None
    m = _CHARSTRING.search(block)
    if m:
        block = m.group(2)
    s = block.decode("utf-8", errors="replace").strip()
    return s if s else None


def _tag(block: bytes, tag: str) -> str | None:
    return _text(_block(block, tag))


def _tags(block: bytes, tag: str) -> list[str]:
    t = tag.encode()
    out = []
    for m in re.finditer(
        rb"(?s)<" + _NS + t + rb"(?=[\s>])[^>]*>(.*?)</" + _NS + t + rb">",
        block,
    ):
        s = _text(m.group(1))
        if s is not None:
            out.append(s)
    return out


_ISO_BLOCK = re.compile(
    rb"(?s)<" + _NS + rb"MD_Metadata(?=[\s>])[^>]*>(.*?)</"
    + _NS + rb"MD_Metadata>"
)
_DC_BLOCK = re.compile(rb"(?s)<oai_dc:dc[^>]*>(.*?)</oai_dc:dc>")
_HTML_TITLE = re.compile(rb"(?is)<title[^>]*>(.*?)</title>")
_SCOPE = re.compile(
    rb"(?s)<" + _NS + rb"MD_ScopeCode(?=[\s>])[^>]*?"
    rb'(?:codeListValue="([^"]*)"[^>]*>|>)(.*?)</' + _NS + rb"MD_ScopeCode>"
)


def _float_or_none(s: str | None) -> float | None:
    try:
        return float(s) if s is not None else None
    except ValueError:
        return None


def _iso_bbox(b: bytes) -> list[float]:
    """EX_GeographicBoundingBox -> [minx,miny,maxx,maxy] like the
    importer's extents.spatial bbox (iso19139/__init__.py:121-130)."""
    vals = [
        _float_or_none(_tag(b, t))
        for t in (
            "westBoundLongitude",
            "southBoundLatitude",
            "eastBoundLongitude",
            "northBoundLatitude",
        )
    ]
    return [] if any(v is None for v in vals) else vals


def sniff_metadata_py(html: bytes | None) -> dict:
    """Classify and extract the page's embedded metadata record.

    Sniff order mirrors the reference's extension/content dispatch
    (metadata.py:137-170): ISO19139 island first (including the CSW
    GetRecordByIdResponse wrapper, parseISO utils.py:771-786 — the
    MD_Metadata element inside the response is the record), then
    Dublin-Core, else plain HTML (title only). Namespace prefixes and
    gco:CharacterString / gco:Date / gco:Decimal leaf wrappers are
    normalized away, matching the owslib importer's xpath behavior
    (schemas/iso19139/__init__.py:71-161). Pure function of the bytes.
    """
    empty = {
        "kind": None,
        "identifier": None,
        "title": None,
        "abstract": None,
        "keywords": [],
        "datestamp": None,
        "hierarchylevel": None,
        "bbox": [],
    }
    if html is None:
        return empty
    m = _ISO_BLOCK.search(html)
    if m:
        b = m.group(1)
        sc = _SCOPE.search(b)
        level = None
        if sc:
            level = (sc.group(1) or sc.group(2) or b"").decode(
                "utf-8", errors="replace"
            ).strip() or None
        return {
            "kind": "iso19139",
            "identifier": _tag(b, "fileIdentifier"),
            "title": _tag(b, "title"),
            "abstract": _tag(b, "abstract"),
            "keywords": _tags(b, "keyword"),
            "datestamp": _tag(b, "dateStamp") or _tag(b, "date"),
            # hierarchy defaults to dataset like parseDC/owslib
            "hierarchylevel": level or "dataset",
            "bbox": _iso_bbox(b),
        }
    m = _DC_BLOCK.search(html)
    if m:
        b = m.group(1)
        return {
            **empty,
            "kind": "dublin-core",
            "identifier": _tag(b, "dc:identifier"),
            "title": _tag(b, "dc:title"),
            "abstract": _tag(b, "dc:description"),
            "keywords": _tags(b, "dc:subject"),
            "datestamp": _tag(b, "dc:date"),
            "hierarchylevel": "dataset",
        }
    t = _HTML_TITLE.search(html)
    return {
        **empty,
        "kind": "html",
        "title": t.group(1).decode("utf-8", errors="replace").strip() if t else None,
    }


def sniff_metadata_batches(
    pdf_iter: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas body: (url|canon_url, html) -> url + MCF columns."""
    for pdf in pdf_iter:
        key = "canon_url" if "canon_url" in pdf.columns else "url"
        recs = [sniff_metadata_py(h) for h in pdf["html"]]
        out = pd.DataFrame(recs)
        out.insert(0, key, pdf[key].values)
        yield out


def sniff_schema(key: str = "canon_url") -> str:
    return f"{key} string, {MCF_SCHEMA}"


def check_id(
    identifier: Column, dataseturi: Column, canon_url: Column
) -> Column:
    """checkId cascade (metadata.py:543-560): existing id -> DOI tail ->
    deterministic hash of the canonical URL (replaces uuid1())."""
    doi_tail = F.regexp_extract(dataseturi, r"doi\.org/(.+)$", 1)
    return F.coalesce(
        F.nullif(F.trim(identifier), F.lit("")),
        F.nullif(doi_tail, F.lit("")),
        F.concat(F.lit("id-"), F.substring(F.sha2(canon_url, 256), 1, 16)),
    )


def _nonempty(c: Column) -> Column:
    return F.nullif(F.trim(F.coalesce(c, F.lit(""))), F.lit(""))


def parse_dc_fields(
    dct: dict[str, Column], fname: Column, safe_name: Column
) -> dict[str, Column]:
    """parseDC's DC -> MCF normalization as Column expressions (C13,
    utils.py:688-769). ``dct`` maps DC keys (title, name, identifier,
    description, abstract, modified, year, created, license, copyright,
    url) to Columns; missing keys behave as '' (the reference's
    25-key default-fill, utils.py:691-696). ``safe_name`` is
    safe_filename(title) for the identifier fallback.

    Returns flat named Columns (license split url-vs-name per
    utils.py:748-752; distribution www row per utils.py:766-768;
    hierarchylevel fixed 'dataset').
    """
    g = lambda k: _nonempty(dct.get(k, F.lit(None)))  # noqa: E731
    title = F.coalesce(g("name"), g("title"), fname)
    identifier = F.coalesce(g("identifier"), safe_name)
    lic = g("license")
    is_url = lic.startswith("http")
    return {
        "title": title,
        "identifier": identifier,
        # identifier that is a URL doubles as dataseturi (utils.py:710-711)
        "dataseturi": F.when(identifier.startswith("http"), identifier),
        "abstract": F.concat_ws(
            " ",
            *[
                x
                for x in [g("description"), g("abstract")]
            ],
        ),
        "datestamp": F.coalesce(g("modified"), g("year")),
        "creation": F.coalesce(g("created"), g("year")),
        "rights": F.coalesce(g("copyright"), F.lit("")),
        "license_url": F.when(is_url, lic),
        "license_name": F.when(~F.coalesce(is_url, F.lit(False)), lic),
        "hierarchylevel": F.lit("dataset"),
        "dist_url": g("url"),
        "dist_name": F.when(g("url").isNotNull(), fname),
        "dist_type": F.when(g("url").isNotNull(), F.lit("www")),
    }


def merge_field(new: Column, old: Column) -> Column:
    """dict_merge empty-never-clobbers (utils.py:199-202): an empty or
    whitespace incoming value never overwrites a non-empty existing."""
    return F.coalesce(F.nullif(F.trim(new), F.lit("")), old)
