"""Export sink (S11): render MCF records to catalog profiles.

The reference renders each record to ISO19139 XML / DCAT / STAC JSON
(/root/reference/geodatacrawler/metadata.py:199-230) with the output
filename from safeFileName(identifier). Here: profile rendering is a
pure column expression (to_json / format_string — JVM-side, no UDF),
the filename is functions.urls.safe_filename, and the sink is a
partitioned parquet/text write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

from pygeodatacrawler_spark.functions.urls import safe_filename

PROFILES = ("json", "xml")


def _render_json(rec: Column) -> Column:
    return F.to_json(rec)


def _render_xml(rec: Column) -> Column:
    # minimal deterministic ISO19139-shaped rendering
    return F.format_string(
        "<MD_Metadata><fileIdentifier>%s</fileIdentifier>"
        "<title>%s</title><abstract>%s</abstract>"
        "<keywords>%s</keywords><date>%s</date></MD_Metadata>",
        rec.getField("identifier"),
        F.coalesce(rec.getField("title"), F.lit("")),
        F.coalesce(rec.getField("abstract"), F.lit("")),
        F.array_join(F.coalesce(rec.getField("keywords"), F.array()), ","),
        F.coalesce(rec.getField("datestamp"), F.lit("")),
    )


def export_records(records: DataFrame, profile: str = "json") -> DataFrame:
    """records -> (identifier, filename, profile, payload)."""
    if profile not in PROFILES:
        raise ValueError(f"unknown profile {profile!r}; use one of {PROFILES}")
    rec = F.struct(
        "identifier", "title", "abstract", "keywords", "datestamp"
    )
    payload = _render_json(rec) if profile == "json" else _render_xml(rec)
    return records.select(
        "identifier",
        F.concat(
            safe_filename(F.col("identifier")), F.lit(f".{profile}")
        ).alias("filename"),
        F.lit(profile).alias("profile"),
        payload.alias("payload"),
    )


def write_exports(records: DataFrame, out_dir: str, profile: str = "json") -> None:
    """Partitioned-by-profile parquet sink of rendered records."""
    export_records(records, profile).write.mode("append").partitionBy(
        "profile"
    ).parquet(out_dir)
