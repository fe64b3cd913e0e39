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
    "keywords array<string>, datestamp string"
)

_ISO_BLOCK = re.compile(rb"(?s)<MD_Metadata>(.*?)</MD_Metadata>")
_DC_BLOCK = re.compile(rb"(?s)<oai_dc:dc>(.*?)</oai_dc:dc>")
_HTML_TITLE = re.compile(rb"(?is)<title[^>]*>(.*?)</title>")


def _tag(block: bytes, tag: str) -> str | None:
    m = re.search(
        rb"(?s)<" + tag.encode() + rb">(.*?)</" + tag.encode() + rb">", block
    )
    return m.group(1).decode("utf-8", errors="replace").strip() if m else None


def _tags(block: bytes, tag: str) -> list[str]:
    return [
        m.group(1).decode("utf-8", errors="replace").strip()
        for m in re.finditer(
            rb"(?s)<" + tag.encode() + rb">(.*?)</" + tag.encode() + rb">", block
        )
    ]


def sniff_metadata_py(html: bytes | None) -> dict:
    """Classify and extract the page's embedded metadata record.

    Sniff order mirrors the reference's extension/content dispatch
    (metadata.py:137-170): ISO19139 island first, then Dublin-Core,
    else plain HTML (title only). Pure function of the bytes.
    """
    empty = {
        "kind": None,
        "identifier": None,
        "title": None,
        "abstract": None,
        "keywords": [],
        "datestamp": None,
    }
    if html is None:
        return empty
    m = _ISO_BLOCK.search(html)
    if m:
        b = m.group(1)
        return {
            "kind": "iso19139",
            "identifier": _tag(b, "fileIdentifier"),
            "title": _tag(b, "title"),
            "abstract": _tag(b, "abstract"),
            "keywords": _tags(b, "keyword"),
            "datestamp": _tag(b, "date"),
        }
    m = _DC_BLOCK.search(html)
    if m:
        b = m.group(1)
        return {
            "kind": "dublin-core",
            "identifier": _tag(b, "dc:identifier"),
            "title": _tag(b, "dc:title"),
            "abstract": _tag(b, "dc:description"),
            "keywords": _tags(b, "dc:subject"),
            "datestamp": _tag(b, "dc:date"),
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


def merge_field(new: Column, old: Column) -> Column:
    """dict_merge empty-never-clobbers (utils.py:199-202): an empty or
    whitespace incoming value never overwrites a non-empty existing."""
    return F.coalesce(F.nullif(F.trim(new), F.lit("")), old)
