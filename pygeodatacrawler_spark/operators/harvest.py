"""Metadata harvest pass: sniff -> identify -> inherit config -> export.

The batch rebuild of the reference's `crawl-metadata` update/export modes
(/root/reference/geodatacrawler/metadata.py:172-425) and `crawl-maps`
aggregation (mapfile.py:59-336):

- ``harvest_metadata``  — pages -> MCF record rows (sniff UDF + checkId);
- ``apply_config``      — hierarchical per-prefix config inheritance
  (J5, merge_folder_metadata metadata.py:562-574) as a broadcast
  longest-prefix join with dict_merge's empty-never-clobbers rule;
- ``summarize_catalog`` — per-domain rollup (A1 bbox-union shape, A3
  keyword collect, A5 count gating);
- ``render_catalog``    — grouped applyInPandas producing one rendered
  catalog document per domain (S12 mapfile sink shape), deterministic.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F

from pygeodatacrawler_spark.functions.metadata import (
    check_id,
    merge_field,
    sniff_metadata_batches,
    sniff_schema,
)
from pygeodatacrawler_spark.functions.urls import (
    canonicalize_url,
    registered_domain,
    safe_filename,
)

CONTACT_ROLE_COLS = ["author", "publisher", "creator"]


def contact_entries(
    df: DataFrame, id_col: str, role_cols: list[str] | None = None
) -> DataFrame:
    """A4 contact split (parseDC utils.py:715-728): multi-valued
    author/publisher/creator strings split on ';' and ' and ', one
    contact per name, keyed by safeFileName(name); '@' in the value
    routes it to the email field.

    Output: one row per surviving (id, contact_key) — when the same key
    appears under several role columns, the LAST one wins (Python dict
    assignment order; the reference's role-rerun quirk at utils.py:722
    — every earlier name re-assigned on later iterations — is a latent
    bug SURVEY §4 says not to replicate). ``contact_map`` folds these
    rows into the nested-MCF map column.
    """
    role_cols = CONTACT_ROLE_COLS if role_cols is None else role_cols

    # closure factory, NOT a default-arg lambda: pyspark treats a
    # two-parameter transform lambda as (element, index)
    def _tag(role: str):
        return lambda x: F.struct(F.trim(x).alias("name"), F.lit(role).alias("role"))

    per_role = [
        F.transform(
            F.split(
                F.regexp_replace(F.coalesce(F.col(c), F.lit("")), " and ", ";"), ";"
            ),
            _tag(c),
        )
        for c in role_cols
    ]
    exploded = (
        df.select(
            F.col(id_col),
            F.posexplode(
                F.filter(
                    F.flatten(F.array(*per_role)), lambda e: e["name"] != ""
                )
            ).alias("pos", "e"),
        )
        .select(
            id_col,
            "pos",
            safe_filename(F.col("e.name")).alias("contact_key"),
            F.col("e.name").alias("name"),
            F.col("e.role").alias("role"),
        )
    )
    w = Window.partitionBy(id_col, "contact_key").orderBy(F.col("pos").desc())
    return (
        exploded.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            id_col,
            "contact_key",
            F.when(F.col("name").contains("@"), F.col("name")).alias("email"),
            F.when(~F.col("name").contains("@"), F.col("name")).alias(
                "individualname"
            ),
            "role",
        )
    )


def contact_map(entries: DataFrame, id_col: str) -> DataFrame:
    """Fold contact_entries rows into the nested-MCF contact map:
    map_from_entries(collect_list(...)) per record, entries sorted by
    key for deterministic map order."""
    e = F.struct(
        F.col("contact_key").alias("key"),
        F.struct("email", "individualname", "role").alias("value"),
    )
    return entries.groupBy(id_col).agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(e))
        ).alias("contact")
    )


def harvest_metadata(pages: DataFrame) -> DataFrame:
    """pages(url, html, ...) -> one MCF record per page.

    Sniffing is one Arrow pass; identifier derivation and domain are
    Catalyst expressions on top (UDF stays minimal — §4 barrier rule).
    """
    canon = pages.select(
        canonicalize_url(F.col("url")).alias("canon_url"), "html"
    )
    sniffed = canon.mapInPandas(
        sniff_metadata_batches, schema=sniff_schema("canon_url")
    )
    return sniffed.select(
        "canon_url",
        registered_domain(F.col("canon_url")).alias("registered_domain"),
        "kind",
        check_id(F.col("identifier"), F.lit(""), F.col("canon_url")).alias(
            "identifier"
        ),
        "title",
        "abstract",
        "keywords",
        "datestamp",
    )


def apply_config(records: DataFrame, config: DataFrame) -> DataFrame:
    """Inherit defaults from the longest matching config prefix.

    config(prefix, title, abstract, keywords) is small (one row per
    host/section) -> broadcast. Record values win unless empty
    (dict_merge asymmetry, utils.py:199-202); keywords are unioned
    (A3/U3 semantics).
    """
    cfg = config.select(
        F.col("prefix"),
        F.col("title").alias("cfg_title"),
        F.col("abstract").alias("cfg_abstract"),
        F.col("keywords").alias("cfg_keywords"),
    )
    joined = records.join(
        F.broadcast(cfg), records["canon_url"].startswith(cfg["prefix"]), "left"
    )
    # longest prefix wins; deterministic tie-break on the prefix itself
    w = Window.partitionBy("canon_url").orderBy(
        F.length("prefix").desc(), F.col("prefix")
    )
    best = (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return best.select(
        "canon_url",
        "registered_domain",
        "kind",
        "identifier",
        merge_field(F.col("title"), F.col("cfg_title")).alias("title"),
        merge_field(F.col("abstract"), F.col("cfg_abstract")).alias("abstract"),
        F.array_sort(
            F.array_distinct(
                F.concat(
                    F.coalesce(F.col("keywords"), F.array()),
                    F.coalesce(F.col("cfg_keywords"), F.array()),
                )
            )
        ).alias("keywords"),
        "datestamp",
    )


def valid_records(records: DataFrame) -> DataFrame:
    """F8 validity filter (valideMD utils.py:502-507): non-empty title
    AND identifier."""
    return records.filter(
        (F.length(F.coalesce(F.col("title"), F.lit(""))) > 0)
        & (F.length(F.coalesce(F.col("identifier"), F.lit(""))) > 0)
    )


def summarize_catalog(records: DataFrame) -> DataFrame:
    """Per-domain rollup: record count, distinct sorted keyword union,
    datestamp range — the mapfile header aggregation (A1/A3/A5)."""
    return (
        records.groupBy("registered_domain")
        .agg(
            F.count("*").alias("n_records"),
            F.array_join(
                F.array_sort(F.array_distinct(F.flatten(F.collect_list("keywords")))),
                ",",
            ).alias("all_keywords"),
            F.min("datestamp").alias("min_date"),
            F.max("datestamp").alias("max_date"),
        )
        .filter(F.col("n_records") > 0)  # A5 layer-count gating
    )


CATALOG_SCHEMA = "registered_domain string, n_layers int, catalog string"


def render_catalog(records: DataFrame) -> DataFrame:
    """One rendered catalog document per domain (the .map-per-folder
    sink, mapfile.py:320-334), via grouped applyInPandas. Layer order is
    lexicographic on canon_url — the reference's sorted-glob order
    (mapfile.py:115-116)."""

    def _render(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("canon_url")
        lines = [f"CATALOG {key[0]}"]
        for _, r in pdf.iterrows():
            kws = ",".join(r["keywords"]) if r["keywords"] is not None else ""
            lines.append(
                f"  LAYER id={r['identifier']} kind={r['kind']} "
                f"title={r['title'] or ''!r} keywords=[{kws}]"
            )
        lines.append("END")
        return pd.DataFrame(
            [
                {
                    "registered_domain": key[0],
                    "n_layers": len(pdf),
                    "catalog": "\n".join(lines),
                }
            ]
        )

    return records.groupBy("registered_domain").applyInPandas(
        _render, schema=CATALOG_SCHEMA
    )
