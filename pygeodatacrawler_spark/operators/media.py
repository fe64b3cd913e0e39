"""Multimodal columns: opaque binary payloads + typed metadata (S4/S6).

Images/rasters/spreadsheets travel as BinaryType columns; decode runs
as one Arrow-batched mapInPandas pass (map-only, inherits input
partitioning — payload bytes never shuffle). Two REAL dependency-free
decoders (functions/media_codecs.py):

- ``image/tiff``  -> GeoTIFF IFD parse: width/height/bands, EPSG from
  the GeoKeyDirectory, nodata, bounds via the reference's
  geotransform math (utils.py:59-116);
- ``application/vnd.openxmlformats-officedocument.spreadsheetml.sheet``
  -> core properties + sheet list, the ``parseExcel`` surface
  (utils.py:416-423);
- ``image/png`` -> full pixel decode (chunks, zlib, all five scanline
  filters): per-band min/max with GDAL's paletted-index + tRNS-nodata
  semantics — reproduces the reference demo's .aux.xml statistics;
- ``application/geo+json`` / ``application/x-esri-shape`` /
  ``application/geopackage+sqlite3`` (stdlib sqlite3.deserialize over
  gpkg_contents/gpkg_geometry_columns) /
  ``application/vnd.apache.parquet`` (pyarrow footer-only) (S5) -> the
  OGR layer introspection subset (utils.py:118-158): feature count,
  mcf geomtype bucket, attribute name:type list, bounds, EPSG.

Any other media type yields byte-level metadata only (n_bytes; format
fields null) — an honest "no decoder for this type", not a fake.
Formats that genuinely need native libs (JPEG, audio, video codecs)
slot in as new branches the same way.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from pygeodatacrawler_spark.functions.media_codecs import (
    decode_dbf,
    decode_geojson,
    decode_geotiff,
    decode_gpkg,
    decode_parquet_meta,
    decode_png,
    decode_shapefile,
    decode_xlsx,
)

XLSX_TYPE = "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet"
PNG_TYPE = "image/png"
GEOJSON_TYPE = "application/geo+json"
SHAPEFILE_TYPE = "application/x-esri-shape"
DBF_TYPE = "application/x-dbf"
GPKG_TYPE = "application/geopackage+sqlite3"
PARQUET_TYPE = "application/vnd.apache.parquet"

MEDIA_META_SCHEMA = (
    "media_type string, n_bytes long, width int, height int, "
    "n_bands int, epsg string, nodata double, bounds array<double>, "
    "band_min array<double>, band_max array<double>, "
    "title string, creator string, keywords string, n_sheets int, "
    "geomtype string, n_features int, attrs string"
)

_META_KEYS = [
    "width", "height", "n_bands", "epsg", "nodata", "bounds",
    "band_min", "band_max",
    "title", "creator", "keywords", "n_sheets",
    "geomtype", "n_features", "attrs",
]


def _decode_one(payload, media_type: str) -> dict:
    meta = dict.fromkeys(_META_KEYS)
    payload = bytes(payload) if payload is not None else None
    meta["media_type"] = media_type
    meta["n_bytes"] = 0 if payload is None else len(payload)
    if media_type == "image/tiff":
        meta.update(decode_geotiff(payload))
    elif media_type == PNG_TYPE:
        png = decode_png(payload)
        meta.update({k: png[k] for k in (
            "width", "height", "n_bands", "nodata", "band_min", "band_max"
        )})
    elif media_type == XLSX_TYPE:
        x = decode_xlsx(payload)
        meta.update(
            title=x["title"], creator=x["creator"], keywords=x["keywords"],
            n_sheets=None if x["sheets"] is None else len(x["sheets"]),
        )
    elif media_type == GEOJSON_TYPE:
        meta.update(decode_geojson(payload))
    elif media_type == SHAPEFILE_TYPE:
        meta.update(decode_shapefile(payload))
    elif media_type == DBF_TYPE:
        meta.update(decode_dbf(payload))
    elif media_type == GPKG_TYPE:
        g = decode_gpkg(payload)
        meta.update({k: g[k] for k in (
            "geomtype", "n_features", "attrs", "bounds", "epsg"
        )})
    elif media_type == PARQUET_TYPE:
        meta.update(decode_parquet_meta(payload))
    return meta


def decode_media(
    df: DataFrame, payload_col: str, media_type_col: str, id_col: str
) -> DataFrame:
    """(id, payload binary, media_type) -> id + decoded metadata.

    One Arrow pass; output partitioning inherits the input (map-only).
    """

    def _decode(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdf_iter:
            metas = [
                _decode_one(p, m)
                for p, m in zip(pdf[payload_col], pdf[media_type_col])
            ]
            out = pd.DataFrame(
                metas, columns=["media_type", "n_bytes"] + _META_KEYS
            )
            out["n_sheets"] = out["n_sheets"].astype("Int64")
            out["width"] = out["width"].astype("Int64")
            out["height"] = out["height"].astype("Int64")
            out["n_bands"] = out["n_bands"].astype("Int64")
            out["n_features"] = out["n_features"].astype("Int64")
            out.insert(0, id_col, pdf[id_col].values)
            yield out

    return df.select(id_col, payload_col, media_type_col).mapInPandas(
        _decode, schema=f"{id_col} long, {MEDIA_META_SCHEMA}"
    )
