"""OWS (WMS) capabilities: per-layer fan-out and layer matching.

Rebuilds owsCapabilities2md (/root/reference/geodatacrawler/
utils.py:798-850) and checkOWSLayer's layer-selection stages
(utils.py:307-349) set-at-a-time:

- ``layer_explode`` — a capabilities document (one per service, parsed
  with ``from_json``) fans out to one row per NAMED layer (the
  reference skips unnamed group layers, utils.py:833); service-level
  identification/provider fields are carried onto every row and the
  layer title falls back to the service title.
- ``match_ows_layers`` — the 3-stage matcher: (1) requested layer
  name(s), comma-split, case-insensitive, with the ``ALL``
  pseudo-layer selecting every layer of the service (U4); (2) record
  identifier contained in a layer metadataUrl (the containment join of
  J3); (3) case/space-insensitive title against layer name or title.
  Per request the FIRST stage with >=1 match wins, and that stage's
  whole match set fans out (checkOWSLayer returns matchedLayers, not
  one layer). Every stage is an independent join the optimizer can
  broadcast; stage priority resolves with one min-stage window.

The remote metadataUrl fetch inside prepCapabsResponse composes with
operators/doi.resolve_doi (the fetch stage supplies the response
columns); it is not re-run here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F

WMS_CAPS_SCHEMA = (
    "struct<"
    "identification:struct<title:string, abstract:string, "
    "keywords:array<string>, accessconstraints:string, fees:string>, "
    "provider:struct<name:string, url:string, email:string>, "
    "layers:array<struct<name:string, title:string, abstract:string, "
    "keywords:array<string>, bbox:array<double>, "
    "metadataUrls:array<struct<url:string, format:string>>>>"
    ">"
)


def layer_explode(
    df: DataFrame, caps_col: str = "capabilities", key_col: str = "service_url"
) -> DataFrame:
    """(key, capabilities json) -> one row per named layer.

    Column layout mirrors the lyrmd dict the reference builds: service
    identification + provider as distributor contact, then per-layer
    name/title/abstract/keywords/bbox/metadataUrls. ``layer.title or
    service title`` fallback as in utils.py:838 (the reference's
    ``lyrmd['name']`` there is a latent KeyError; the intended service
    title is used)."""
    parsed = F.from_json(F.col(caps_col), WMS_CAPS_SCHEMA)
    svc = df.select(
        F.col(key_col),
        parsed["identification"]["title"].alias("service_title"),
        parsed["identification"]["abstract"].alias("service_abstract"),
        parsed["identification"]["accessconstraints"].alias("accessconstraints"),
        parsed["identification"]["fees"].alias("fees"),
        parsed["provider"]["name"].alias("provider_name"),
        parsed["provider"]["url"].alias("provider_url"),
        F.explode_outer(parsed["layers"]).alias("layer"),
    )
    named = svc.filter(
        F.col("layer").isNotNull()
        & F.col("layer.name").isNotNull()
        & (F.col("layer.name") != "")
    )
    return named.select(
        key_col,
        "service_title",
        "service_abstract",
        "accessconstraints",
        "fees",
        "provider_name",
        "provider_url",
        F.col("layer.name").alias("layer_name"),
        F.coalesce(
            F.nullif(F.col("layer.title"), F.lit("")), F.col("service_title")
        ).alias("layer_title"),
        F.col("layer.abstract").alias("layer_abstract"),
        F.coalesce(F.col("layer.keywords"), F.array().cast("array<string>")).alias(
            "layer_keywords"
        ),
        F.col("layer.bbox").alias("bbox"),
        F.coalesce(
            F.col("layer.metadataUrls"),
            F.array().cast("array<struct<url:string,format:string>>"),
        ).alias("metadataUrls"),
    )


def match_ows_layers(
    layers: DataFrame,
    requests: DataFrame,
    request_key: str = "request_id",
    service_col: str = "service_url",
) -> DataFrame:
    """requests(request_id, service_url, name, identifier, title) ->
    matched layer rows, first-stage-wins per request.

    Stage 1: ``name`` comma-split (the ``layers=`` query-param
    convention arrives pre-extracted in ``name``); ``ALL`` selects the
    whole service. Stage 2: ``identifier`` substring of any
    metadataUrl. Stage 3: title equality against layer name/title,
    lowercased+trimmed. Output keeps the stage for auditability.
    """
    req = requests.select(
        request_key,
        F.col(service_col).alias("_svc"),
        F.split(F.upper(F.coalesce(F.col("name"), F.lit(""))), ",").alias("_names"),
        F.col("identifier").alias("_ident"),
        F.lower(F.trim(F.coalesce(F.col("title"), F.lit("")))).alias("_title"),
    )
    lyr = layers.alias("l")
    r = req.alias("r")
    svc_eq = F.col(f"r._svc") == F.col(f"l.{service_col}")

    s1 = r.join(
        lyr,
        svc_eq
        & (
            F.array_contains(F.col("r._names"), "ALL")
            | F.array_contains(F.col("r._names"), F.upper(F.col("l.layer_name")))
        ),
    ).withColumn("stage", F.lit(1))
    s2 = r.join(
        lyr,
        svc_eq
        & F.col("r._ident").isNotNull()
        & (F.col("r._ident") != "")
        & F.exists(
            F.col("l.metadataUrls"),
            lambda u: u["url"].contains(F.col("r._ident")),
        ),
    ).withColumn("stage", F.lit(2))
    s3 = r.join(
        lyr,
        svc_eq
        & (F.col("r._title") != "")
        & (
            (F.lower(F.trim(F.col("l.layer_name"))) == F.col("r._title"))
            | (F.lower(F.trim(F.col("l.layer_title"))) == F.col("r._title"))
        ),
    ).withColumn("stage", F.lit(3))

    all_matches = s1.unionByName(s2).unionByName(s3)
    w = Window.partitionBy(request_key)
    return (
        all_matches.withColumn("_best", F.min("stage").over(w))
        .filter(F.col("stage") == F.col("_best"))
        .drop("_best", "_svc", "_names", "_ident", "_title")
    )
