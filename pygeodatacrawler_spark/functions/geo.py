"""CRS identification and bounds reprojection (C4/C5) without geo libs.

The reference shells out to GDAL/OSR: ``crs2code``
(/root/reference/geodatacrawler/utils.py:207-229) asks OSR for the
authority code of a parsed SpatialReference, and ``reprojectBounds``
(utils.py:240-256) builds a CoordinateTransformation to a target EPSG.
Neither GDAL nor pyproj exists in this environment, so this module
implements the pure-math subset as JVM-side Column expressions:

- ``crs2code``: recover ``AUTH:code`` from the textual forms OSR itself
  round-trips — ``EPSG:n`` / ``epsg:n``, OGC URNs
  (``urn:ogc:def:crs:EPSG::n``), OGC CRS URLs
  (``http://www.opengis.net/def/crs/EPSG/0/n``), WKT1
  (``AUTHORITY["EPSG","n"]``) and WKT2 (``ID["EPSG",n]``) authority
  nodes, and the ``CRS84`` alias. For WKT the ROOT authority node is
  the LAST one in the string (nested GEOGCS/DATUM carry their own),
  matching ``GetAuthorityCode(None)``; we therefore take the last
  regex match, not the first. Unrecognised input -> '' like the
  reference's failure path.
- ``reproject_bounds``: the EPSG:4326 <-> EPSG:3857 (spherical web
  mercator) transform pair as closed-form Column math — the one
  transform the reference applies in practice (mapfile extents to web
  mercator). Other CRS pairs raise, explicitly.

Everything here is whole-stage-codegen'd (regexp + trig built-ins, no
UDF) and oracle-portable: DuckDB evaluates the same regexes and the
same formulas.
"""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F

WEB_MERCATOR_R = 6378137.0

# one regex per textual CRS form OSR identifies; order = trust order
_URN = r"urn:ogc:def:crs:([A-Za-z]+)::?(\d+)"
_URL = r"opengis\.net/def/crs/([A-Za-z]+)/[\d.]+/(\d+)"
_WKT1 = r'AUTHORITY\["([A-Za-z]+)",\s*"(\d+)"\]'
_WKT2 = r'ID\["([A-Za-z]+)",\s*(\d+)\]'
_PLAIN = r"^([A-Za-z]+):(\d+)$"


def _last_match(crs: Column, pattern: str) -> Column:
    """AUTH:code from the LAST occurrence of pattern (root authority)."""
    auths = F.regexp_extract_all(crs, F.lit(pattern), 1)
    codes = F.regexp_extract_all(crs, F.lit(pattern), 2)
    return F.when(
        F.size(auths) > 0,
        F.concat(
            F.upper(F.element_at(auths, -1)),
            F.lit(":"),
            F.element_at(codes, -1),
        ),
    )


def crs2code(crs: Column) -> Column:
    """Authority code ('EPSG:4326') from a CRS string, '' if unknown.

    Mirrors crs2code's contract (utils.py:207-229): authoritative
    ``AUTH:code`` when identifiable, empty string otherwise (including
    null input — the reference returns '' for None).
    """
    s = F.trim(crs)
    plain = F.when(
        F.regexp_extract(s, _PLAIN, 2) != "",
        F.concat(
            F.upper(F.regexp_extract(s, _PLAIN, 1)),
            F.lit(":"),
            F.regexp_extract(s, _PLAIN, 2),
        ),
    )
    crs84 = F.when(s.rlike(r"(?i)\bCRS84\b"), F.lit("OGC:CRS84"))
    return F.coalesce(
        plain,
        _last_match(s, _URN),
        _last_match(s, _URL),
        crs84,
        # WKT2 before WKT1: a WKT2 string may embed no AUTHORITY nodes
        _last_match(s, _WKT2),
        _last_match(s, _WKT1),
        F.lit(""),
    )


def _fwd_x(lon: Column) -> Column:
    return F.radians(lon) * WEB_MERCATOR_R


def _fwd_y(lat: Column) -> Column:
    # R * ln(tan(pi/4 + lat/2))
    return F.log(F.tan(F.lit(0.25) * F.pi() + F.radians(lat) / 2)) * WEB_MERCATOR_R


def _inv_lon(x: Column) -> Column:
    return F.degrees(x / WEB_MERCATOR_R)


def _inv_lat(y: Column) -> Column:
    # degrees(2*atan(exp(y/R)) - pi/2)
    return F.degrees(2 * F.atan(F.exp(y / WEB_MERCATOR_R)) - F.pi() / 2)


def reproject_bounds(
    minx: Column, miny: Column, maxx: Column, maxy: Column,
    source: int = 4326, target: int = 3857,
) -> Column:
    """[minx,miny,maxx,maxy] reprojected source->target (C5).

    Transforms the two corner points like reprojectBounds
    (utils.py:240-256: TransformPoint on (minx,miny) and (maxx,maxy)
    with traditional GIS axis order). Supported pairs: 4326<->3857
    closed-form; identity for source==target.
    """
    if source == target:
        return F.array(
            minx.cast("double"), miny.cast("double"),
            maxx.cast("double"), maxy.cast("double"),
        )
    if (source, target) == (4326, 3857):
        return F.array(_fwd_x(minx), _fwd_y(miny), _fwd_x(maxx), _fwd_y(maxy))
    if (source, target) == (3857, 4326):
        return F.array(
            _inv_lon(minx), _inv_lat(miny), _inv_lon(maxx), _inv_lat(maxy)
        )
    raise ValueError(
        f"unsupported CRS pair {source}->{target}; "
        "closed-form subset is 4326<->3857 (no GDAL in this environment)"
    )
