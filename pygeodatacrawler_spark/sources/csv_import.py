"""CSV-template import pipeline (S3 + C17 end-to-end).

The reference's ``crawl-metadata --mode=import-csv`` (importCsv,
/root/reference/geodatacrawler/metadata.py:464-540) renders each CSV
row through a Jinja2 template into an MCF YAML record, routes it to a
cluster subfolder, applies checkId and the clip-to-32 /
extend-if-under-8 filename rule, and writes one ``.yml`` per row.

Spark-first decomposition:

- CSV dialects/short-row padding: sources/csv.py (built-in reader).
- Template render + YAML parse: ONE Arrow-batched mapInPandas pass
  (Jinja2 when importable, else a deterministic ``{{ md['k'] }}`` /
  ``{{ md.get('k','d') }}`` mini-renderer with identical output for
  the template subset the reference ships). The parsed record travels
  as a JSON column; flat fields needed by later column logic
  (identifier, abstract, contact letters) are lifted out.
- checkId + filename rule: pure Column expressions (clip/extend with
  the reference's double-dash quirk and unidecode-equivalent NFKD
  fold, metadata.py:525-534).
- Cluster routing + per-record .yml sink: foreachPartition writer —
  the sidecar-file sink shape (S10); at table scale the same frame
  appends to a records table instead.
"""

from __future__ import annotations

import json
import os
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

from pygeodatacrawler_spark.functions.metadata import check_id
from pygeodatacrawler_spark.functions.urls import ascii_fold, safe_filename

# the packaged default template's SHAPE (templates/csv.j2): identifier,
# language, title, abstract from the row dict with defaults
DEFAULT_TEMPLATE = """mcf:
    version: 1.0

metadata:
    identifier: "{{ md.get('id','') }}"
    language: "{{ md.get('language','eng') }}"
    charset: utf8
    hierarchylevel: dataset

identification:
    language: "{{ md.get('language','eng') }}"
    title: "{{ md.get('title','') }}"
    abstract: "{{ md.get('abstract','') }}"
"""

_MINI_GET = re.compile(r"\{\{\s*md\.get\(\s*'([^']*)'\s*,\s*'([^']*)'\s*\)\s*\}\}")
_MINI_IDX = re.compile(r"\{\{\s*md\['([^']*)'\]\s*\}\}")


def _render_mini(template: str, md: dict) -> str:
    """Fallback renderer for the two expression forms the reference's
    shipped templates use; byte-identical to Jinja2 on that subset."""
    out = _MINI_GET.sub(lambda m: str(md.get(m.group(1), m.group(2))), template)
    return _MINI_IDX.sub(lambda m: str(md.get(m.group(1), "")), out)


def _renderer(template: str):
    try:
        from jinja2 import Environment

        tpl = Environment().from_string(template)
        return lambda md: tpl.render(md=md)
    except ImportError:  # pragma: no cover - jinja2 is present here
        return lambda md: _render_mini(template, md)


IMPORT_FIELDS = (
    "cluster string, identifier string, title string, abstract string, "
    "contact_letters string, record_json string"
)


def render_csv_records(
    rows: DataFrame,
    template: str | None = None,
    cluster_field: str | None = None,
) -> DataFrame:
    """CSV rows -> rendered+parsed MCF records (one Arrow pass).

    Output: cluster (the routing field's value, '' when unset),
    identifier/title/abstract (flat, for the column-expr stages),
    contact_letters (the extend-filename source: abstract, overridden
    by each contact's organization-or-individualname in order — LAST
    contact wins, metadata.py:529-532), record_json (full record for
    the sink). Rows whose render fails to parse are dropped, like the
    reference's try/except-continue.
    """
    template = DEFAULT_TEMPLATE if template is None else template
    cols = rows.columns
    out_cols = [
        "cluster", "identifier", "title", "abstract",
        "contact_letters", "record_json",
    ]

    def _render(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import yaml

        render = _renderer(template)
        for pdf in pdf_iter:
            out = []
            for _, row in pdf.iterrows():
                md = {c: ("" if pd.isna(row[c]) else str(row[c])) for c in cols}
                try:
                    rec = yaml.safe_load(render(md))
                except Exception:
                    rec = None
                if not isinstance(rec, dict):
                    continue
                ident = rec.get("identification") or {}
                letters = ident.get("abstract")
                for c in (rec.get("contact") or {}).values():
                    letters = c.get("organization", c.get("individualname", "None"))
                out.append(
                    {
                        "cluster": md.get(cluster_field, "") if cluster_field else "",
                        "identifier": (rec.get("metadata") or {}).get("identifier"),
                        "title": ident.get("title"),
                        "abstract": ident.get("abstract"),
                        "contact_letters": letters,
                        "record_json": json.dumps(rec, ensure_ascii=False),
                    }
                )
            yield pd.DataFrame(out, columns=out_cols)

    return rows.mapInPandas(_render, schema=IMPORT_FIELDS)


def import_filename(identifier: Column, letters: Column) -> Column:
    """The output-filename rule (metadata.py:527-534) as Column exprs:
    safeFileName + ascii fold; clip to 32 chars; if shorter than 8,
    extend with '--' + first 16 chars of the folded letters (the
    reference's ``fn+'-'+'-'+safeFileName(letters)[:16]``)."""
    fn = ascii_fold(safe_filename(identifier))
    ext = F.substring(
        ascii_fold(safe_filename(F.coalesce(letters, F.lit("None")))), 1, 16
    )
    return (
        F.when(F.length(fn) > 32, F.substring(fn, 1, 32))
        .when(F.length(fn) < 8, F.concat(fn, F.lit("--"), ext))
        .otherwise(fn)
    )


def import_csv_records(
    rows: DataFrame,
    template: str | None = None,
    cluster_field: str | None = None,
    prefix: str = "",
) -> DataFrame:
    """Full import pipeline: render -> checkId -> filename -> cluster.

    Returns (cluster, filename, identifier, title, abstract,
    record_json); pair with :func:`write_import_yml` for the per-file
    sink, or append to a records table at scale.
    """
    rendered = render_csv_records(rows, template, cluster_field)
    ident = check_id(
        F.col("identifier"),
        F.lit(""),
        F.concat(F.lit(prefix), F.coalesce(F.col("title"), F.lit(""))),
    )
    return rendered.withColumn("identifier", ident).withColumn(
        "filename",
        F.concat(
            import_filename(F.col("identifier"), F.col("contact_letters")),
            F.lit(".yml"),
        ),
    )


def write_import_yml(records: DataFrame, out_dir: str) -> None:
    """Per-record .yml sink with cluster subfolder routing. The writer
    patches the checkId-derived identifier back into the record before
    dumping, like the reference mutating yMcf in place."""

    def _write(rows) -> None:
        import yaml

        for row in rows:
            d = json.loads(row["record_json"])
            d.setdefault("metadata", {})["identifier"] = row["identifier"]
            fldr = (
                os.path.join(out_dir, row["cluster"])
                if row["cluster"]
                else out_dir
            )
            os.makedirs(fldr, exist_ok=True)
            with open(os.path.join(fldr, row["filename"]), "w") as f:
                yaml.safe_dump(d, f, sort_keys=False, allow_unicode=True)

    records.foreachPartition(_write)
