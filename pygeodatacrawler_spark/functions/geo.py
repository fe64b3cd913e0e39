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
- ``crs2code`` fuzzy fallback: the reference's ``FindMatches`` path
  (utils.py:219-227 — OSR fuzzy-matches a WKT with no authority nodes
  and accepts candidates with >=50% confidence) re-expressed as an
  embedded registry of ~50 common EPSG CRS/datum names: the
  normalized CRS text must CONTAIN a full registry name (the
  high-confidence analog of the >=50% contract — a whole-name hit,
  never a token overlap), most-specific (longest) name wins, plus
  generic UTM-zone patterns. Authority nodes always take precedence,
  mirroring AutoIdentifyEPSG running before FindMatches.
- ``reproject_bounds``: the EPSG:4326 <-> EPSG:3857 (spherical web
  mercator) pair AND the 4326 <-> UTM family (EPSG 326xx/327xx WGS84,
  258xx ETRS89, 269xx NAD83) via the standard transverse-mercator
  series (Snyder 1987, eqs 3-21/8-9..8-17; the same truncation proj's
  default tmerc uses — sub-mm inside a zone) AND the most-hit conic
  targets as closed-form Column math (EPSG Guidance Note 7-2):
  Lambert conformal conic 2SP (2154 Lambert-93, 3034 LCC Europe,
  3978 Canada Atlas), Albers equal-area (5070 Conus, 3577 Australian),
  Lambert azimuthal equal-area (3035 LAEA Europe), and oblique
  stereographic (28992 Amersfoort / RD New — validated against the
  GN7-2 worked example to the mm), plus the national transverse-
  mercator grids 27700 British National Grid (validated against the
  Ordnance Survey worked example to the mm), 2193 NZTM2000, 3006
  SWEREF99 TM, 2180 Poland CS92. Other CRS pairs raise, explicitly. NOTE for roundtrips: the conic inverse
  iterates, so feed it COLUMN REFERENCES (stage the forward result
  through a select) — passing the raw forward expression replicates
  that subtree once per reference.

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


# fuzzy registry: (EPSG code, normalized CRS/datum names). Matching is
# whole-name containment on the normalized input (lowercase, '_' -> ' ',
# whitespace collapsed); the chain below sorts by name length so the
# most specific name wins ('amersfoort / rd new' before 'amersfoort') —
# the analog of taking OSR FindMatches' best >=50%-confidence candidate.
_FUZZY_NAMES: list[tuple[int, str]] = [
    (4326, "wgs 84"), (4326, "wgs84"), (4326, "wgs 1984"),
    (4326, "world geodetic system 1984"),
    (3857, "pseudo mercator"), (3857, "web mercator"),
    (3857, "popular visualisation crs"),
    (4258, "etrs89"), (4258, "etrs 89"),
    (4258, "european terrestrial reference system 1989"),
    (4269, "nad83"), (4269, "north american datum 1983"),
    (4267, "nad27"), (4267, "north american datum 1927"),
    (4230, "ed50"), (4230, "european datum 1950"),
    (4284, "pulkovo 1942"),
    (2056, "ch1903+ / lv95"), (21781, "ch1903 / lv03"), (4149, "ch1903"),
    (28992, "amersfoort / rd new"), (28992, "rd new"), (4289, "amersfoort"),
    (27700, "osgb 1936 / british national grid"),
    (27700, "british national grid"), (4277, "osgb 1936"), (4277, "osgb36"),
    (2154, "rgf93 / lambert 93"), (2154, "lambert 93"), (4171, "rgf93"),
    (3035, "laea europe"), (3034, "lcc europe"),
    (31370, "belgian lambert 72"), (4313, "belge 1972"),
    (5514, "s jtsk / krovak east north"), (4156, "s jtsk"),
    (3577, "gda94 / australian albers"), (4283, "gda94"),
    (2193, "new zealand transverse mercator"), (4167, "nzgd2000"),
    (5070, "nad83 / conus albers"),
    (4674, "sirgas 2000"), (4618, "sad69"),
    (4301, "tokyo"), (4612, "jgd2000"), (4668, "jgd2011"),
    (4490, "cgcs2000"),
    (102100, "esri web mercator"),
    # round-4 widening: more of the names OSR FindMatches resolves in
    # practice (national grids, continental equal-area/conformal CRS,
    # common geographic datums)
    (4936, "etrs89 cartesian"),
    (3857, "spherical mercator"),
    (4979, "wgs 84 3d"), (4978, "wgs 84 geocentric"),
    (3413, "nsidc sea ice polar stereographic north"),
    (3976, "nsidc sea ice polar stereographic south"),
    (3031, "antarctic polar stereographic"),
    (3995, "arctic polar stereographic"),
    (3034, "etrs89 lcc"), (3035, "etrs89 laea"),
    (3034, "etrs89 / lcc europe"), (3035, "etrs89 / laea europe"),
    (2154, "rgf93 v1 / lambert 93"),
    (27572, "ntf (paris) / lambert zone ii"), (27572, "lambert zone ii"),
    (4807, "ntf (paris)"), (4275, "ntf"),
    (23030, "ed50 / utm zone 30n"), (23031, "ed50 / utm zone 31n"),
    (23032, "ed50 / utm zone 32n"),
    (25830, "etrs89 / utm zone 30n"),  # common fully-spelled forms
    (25831, "etrs89 / utm zone 31n"), (25832, "etrs89 / utm zone 32n"),
    (25833, "etrs89 / utm zone 33n"),
    (31466, "dhdn / 3-degree gauss-kruger zone 2"),
    (31467, "dhdn / 3-degree gauss-kruger zone 3"),
    (31468, "dhdn / 3-degree gauss-kruger zone 4"),
    (4314, "dhdn"), (4312, "mgi"), (31287, "mgi / austria lambert"),
    (21781, "swiss oblique mercator"),
    (2056, "ch1903+"),
    (3006, "sweref99 tm"), (4619, "sweref99"),
    (25884, "etrs89 / tm baltic93"),
    (3067, "etrs89 / tm35fin"), (2393, "kkj / finland uniform coordinate system"),
    (4123, "kkj"),
    (32633, "wgs 84 / utm 33n"),
    (5514, "krovak east north"), (5513, "krovak"),
    (2180, "etrs89 / poland cs92"), (2180, "puwg 1992"), (2180, "puwg-92"),
    (3120, "puwg 1965"),
    (23700, "eov"), (23700, "hd72 / eov"), (4237, "hd72"),
    (28355, "gda94 / mga zone 55"), (28356, "gda94 / mga zone 56"),
    (7844, "gda2020"), (7855, "gda2020 / mga zone 55"),
    (2039, "israel 1993 / israeli tm grid"), (4141, "israel 1993"),
    (32661, "wgs 84 / ups north"), (32761, "wgs 84 / ups south"),
    (4171, "rgf93 v1"),
    (26717, "nad27 / utm zone 17n"), (26917, "nad83 / utm zone 17n"),
    (3347, "nad83 / statistics canada lambert"),
    (3978, "nad83 / canada atlas lambert"),
    (3979, "nad83(csrs) / canada atlas lambert"), (4617, "nad83(csrs)"),
    (5070, "conus albers"),
    (5071, "nad83(hartn) / conus albers"),
    (6350, "nad83(2011) / conus albers"), (6318, "nad83(2011)"),
    (3310, "nad83 / california albers"),
    (2163, "us national atlas equal area"),
    (5072, "nad83(nsrs2007) / conus albers"),
    (29902, "tm65 / irish grid"), (4299, "tm65"),
    (2157, "irenet95 / irish transverse mercator"), (4173, "irenet95"),
    (27700, "ordnance survey great britain 1936"),
    (4324, "wgs 72be"), (4322, "wgs 72"), (4760, "wgs 66"),
    (3112, "gda94 / geoscience australia lambert"),
    (28992, "rijksdriehoek"),
    (31370, "belge 1972 / belgian lambert 72"),
    (3812, "etrs89 / belgian lambert 2008"),
    (2056, "lv95"), (21781, "lv03"),
    (5243, "etrs89 / lcc germany (e-n)"),
    (4258, "european terrestrial reference system"),
    (4230, "ed 50"),
    (3763, "etrs89 / portugal tm06"),
    (2169, "luxembourg 1930 / gauss"), (4181, "luxembourg 1930"),
    (27391, "ngo 1948 (oslo) / norway zone 1"), (4817, "ngo 1948 (oslo)"),
    (25884, "etrs89 / tm baltic"),
    (3301, "estonian coordinate system of 1997"), (4180, "est97"),
    (3346, "lks94 / lithuania tm"), (4669, "lks94"),
    (3059, "lks92 / latvia tm"), (4661, "lks92"),
]

# generic zone families: normalized-name regex with the zone number as
# group 1, EPSG code = base + zone
_FUZZY_ZONES: list[tuple[str, int]] = [
    (r"wgs 84 / utm zone (\d{1,2})n", 32600),
    (r"wgs 84 / utm zone (\d{1,2})s", 32700),
    (r"etrs89 / utm zone (\d{1,2})n", 25800),
    (r"nad83 / utm zone (\d{1,2})n", 26900),
    (r"sirgas 2000 / utm zone (\d{1,2})s", 31960),
    (r"gda94 / mga zone (\d{1,2})", 28300),
    # round-5: ladders now reprojectable via PROJ_DEFS
    (r"rgf93(?: v1)? / cc(\d{2})", 3900),
    (r"dhdn / 3-degree gauss-kruger zone (\d)", 31464),
    (r"etrs89 / poland cs2000 zone (\d)", 2171),
]


def _normalize_crs_text(crs: Column) -> Column:
    s = F.lower(F.regexp_replace(crs, r"[_\s]+", " "))
    return F.trim(F.regexp_replace(s, r"\s*/\s*", " / "))


def crs2code_fuzzy(crs: Column) -> Column:
    """FindMatches subset (utils.py:219-227): EPSG code recovered from
    well-known CRS/datum NAMES when no authority node exists. NULL when
    nothing matches (callers coalesce to '')."""
    s = _normalize_crs_text(crs)
    branches = []
    for pattern, base in _FUZZY_ZONES:
        zone = F.regexp_extract(s, pattern, 1)
        branches.append(
            F.when(
                zone != "",
                F.concat(F.lit("EPSG:"), (F.lit(base) + zone.cast("int")).cast("string")),
            )
        )
    import re as _re

    for code, name in sorted(_FUZZY_NAMES, key=lambda t: -len(t[1])):
        if len(name) <= 5:
            # short names (eov, kkj, ntf, ed50, lv95...) are real
            # substrings of unrelated words — require word boundaries,
            # the high-confidence analog a 3-letter FindMatches hit
            # would need anyway
            cond = s.rlike(
                r"(?<![a-z0-9])" + _re.escape(name) + r"(?![a-z0-9])"
            )
        else:
            cond = s.contains(name)
        branches.append(F.when(cond, F.lit(f"EPSG:{code}")))
    return F.coalesce(*branches)


def crs2code(crs: Column) -> Column:
    """Authority code ('EPSG:4326') from a CRS string, '' if unknown.

    Mirrors crs2code's contract (utils.py:207-229): authoritative
    ``AUTH:code`` when identifiable; otherwise the FindMatches-style
    fuzzy name lookup (>=50%-confidence analog: whole-registry-name
    containment); empty string when neither applies (including null
    input — the reference returns '' for None).
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
        crs2code_fuzzy(s),
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


# -- transverse mercator (UTM family) ---------------------------------------

_WGS84 = (6378137.0, 1.0 / 298.257223563)
_GRS80 = (6378137.0, 1.0 / 298.257222101)
TM_K0 = 0.9996
TM_FE = 500000.0


def utm_params(code: int) -> tuple[float, float, float, float] | None:
    """(a, f, lon0_deg, false_northing) for an EPSG UTM code, else None.

    Families: 326xx WGS84 N, 327xx WGS84 S, 258xx ETRS89/GRS80 N,
    269xx NAD83/GRS80 N — the zones the reference reaches via proj.
    """
    if 32601 <= code <= 32660:
        zone, south, (a, f) = code - 32600, False, _WGS84
    elif 32701 <= code <= 32760:
        zone, south, (a, f) = code - 32700, True, _WGS84
    elif 25828 <= code <= 25838:
        zone, south, (a, f) = code - 25800, False, _GRS80
    elif 26901 <= code <= 26923:
        zone, south, (a, f) = code - 26900, False, _GRS80
    else:
        return None
    return a, f, float(zone * 6 - 183), 10000000.0 if south else 0.0


def _tm_m0(a: float, e2: float, lat0: float) -> float:
    """Meridional arc M(lat0) — the constant subtracted for grids whose
    natural origin is off the equator (OSGB's 49N)."""
    e4, e6 = e2 * e2, e2 * e2 * e2
    p0 = _math.radians(lat0)
    return a * (
        (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * p0
        - (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * _math.sin(2 * p0)
        + (15 * e4 / 256 + 45 * e6 / 1024) * _math.sin(4 * p0)
        - (35 * e6 / 3072) * _math.sin(6 * p0)
    )


def tm_forward(
    lon: Column, lat: Column, a: float, f: float, lon0: float, fn: float,
    k0: float = TM_K0, fe: float = TM_FE, lat0: float = 0.0,
) -> tuple[Column, Column]:
    """Geographic -> transverse-mercator easting/northing (Snyder 1987
    eqs 8-9..8-15 + 3-21 for M): the series proj's default tmerc
    matches to sub-mm inside a UTM zone. ``k0``/``fe``/``lat0``
    default to the UTM values; national grids (OSGB, NZTM, SWEREF99
    TM, Poland CS92) pass their own."""
    e2 = f * (2 - f)
    e4, e6 = e2 * e2, e2 * e2 * e2
    ep2 = e2 / (1 - e2)
    m0 = _tm_m0(a, e2, lat0) if lat0 else 0.0
    phi = F.radians(lat)
    dlam = F.radians(lon - F.lit(lon0))
    sinp, cosp, tanp = F.sin(phi), F.cos(phi), F.tan(phi)
    n_rad = a / F.sqrt(1 - e2 * sinp * sinp)
    t = tanp * tanp
    c = ep2 * cosp * cosp
    aa = dlam * cosp
    m = a * (
        (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * phi
        - (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * F.sin(2 * phi)
        + (15 * e4 / 256 + 45 * e6 / 1024) * F.sin(4 * phi)
        - (35 * e6 / 3072) * F.sin(6 * phi)
    )
    x = fe + k0 * n_rad * (
        aa
        + (1 - t + c) * aa**3 / 6
        + (5 - 18 * t + t * t + 72 * c - 58 * ep2) * aa**5 / 120
    )
    y = fn + k0 * (
        m
        - m0
        + n_rad
        * tanp
        * (
            aa * aa / 2
            + (5 - t + 9 * c + 4 * c * c) * aa**4 / 24
            + (61 - 58 * t + t * t + 600 * c - 330 * ep2) * aa**6 / 720
        )
    )
    return x, y


def tm_inverse(
    x: Column, y: Column, a: float, f: float, lon0: float, fn: float,
    k0: float = TM_K0, fe: float = TM_FE, lat0: float = 0.0,
) -> tuple[Column, Column]:
    """Transverse-mercator -> geographic (Snyder eqs 8-16..8-25)."""
    import math

    e2 = f * (2 - f)
    e4, e6 = e2 * e2, e2 * e2 * e2
    ep2 = e2 / (1 - e2)
    e1 = (1 - math.sqrt(1 - e2)) / (1 + math.sqrt(1 - e2))
    m0 = _tm_m0(a, e2, lat0) if lat0 else 0.0
    m = (y - F.lit(fn)) / k0 + m0
    mu = m / (a * (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256))
    phi1 = (
        mu
        + (3 * e1 / 2 - 27 * e1**3 / 32) * F.sin(2 * mu)
        + (21 * e1**2 / 16 - 55 * e1**4 / 32) * F.sin(4 * mu)
        + (151 * e1**3 / 96) * F.sin(6 * mu)
        + (1097 * e1**4 / 512) * F.sin(8 * mu)
    )
    sin1, cos1, tan1 = F.sin(phi1), F.cos(phi1), F.tan(phi1)
    c1 = ep2 * cos1 * cos1
    t1 = tan1 * tan1
    n1 = a / F.sqrt(1 - e2 * sin1 * sin1)
    r1 = a * (1 - e2) / F.pow(1 - e2 * sin1 * sin1, 1.5)
    d = (x - F.lit(fe)) / (n1 * k0)
    lat = F.degrees(
        phi1
        - (n1 * tan1 / r1)
        * (
            d * d / 2
            - (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * ep2) * d**4 / 24
            + (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * ep2 - 3 * c1 * c1)
            * d**6
            / 720
        )
    )
    lon = F.lit(lon0) + F.degrees(
        (
            d
            - (1 + 2 * t1 + c1) * d**3 / 6
            + (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * ep2 + 24 * t1 * t1)
            * d**5
            / 120
        )
        / cos1
    )
    return lon, lat


# -- conic families: LCC 2SP, Albers equal-area, LAEA ----------------------
#
# The reference reaches these through proj (utils.py:240-256 builds a
# CoordinateTransformation to an arbitrary target EPSG). The most-hit
# European/CONUS targets are closed-form (EPSG Guidance Note 7-2 /
# Snyder 1987): constants (n, F, rho0, ...) are plain Python floats
# computed once driver-side; only t(phi)/q(phi)/theta are per-row
# Column math, all codegen'd built-ins.

import math as _math

_AIRY1830 = (6377563.396, 1.0 / 299.3249646)
_BESSEL = (6377397.155, 1.0 / 299.1528128)

# -- THE projection-parameter table ------------------------------------------
#
# One (EPSG code -> family, ellipsoid, params) registry: identification
# (crs2code) implying reprojectability is a property of THIS table, not
# of scattered per-family dicts. Param layout per family:
#   lcc2sp : (ellipsoid, lat0, lon0, lat1, lat2, FE, FN)
#   albers : (ellipsoid, lat0, lon0, lat1, lat2, FE, FN)
#   laea   : (ellipsoid, lat0, lon0, FE, FN)
#   tm     : (ellipsoid, lat0, lon0, k0, FE, FN)
#   stereo : (ellipsoid, lat0, lon0, k0, FE, FN)   (oblique, GN7-2 §1.3.7.1)
# All parameters are the public EPSG registry definitions. Systematic
# national grid families (UTM-style zone ladders, Gauss-Krüger, the
# RGF93 conic conformal zones) are generated from their published
# zone formulas. Polar-aspect LAEA (317x) and spherical LAEA (2163)
# need different closed forms than the oblique GN7-2 ellipsoidal case
# and are deliberately absent.
PROJ_DEFS: dict[int, tuple[str, tuple]] = {
    # Lambert conformal conic, 2SP
    2154: ("lcc2sp", (_GRS80, 46.5, 3.0, 44.0, 49.0, 700000.0, 6600000.0)),    # RGF93 / Lambert-93
    3034: ("lcc2sp", (_GRS80, 52.0, 10.0, 35.0, 65.0, 4000000.0, 2800000.0)),  # ETRS89 / LCC Europe
    3978: ("lcc2sp", (_GRS80, 49.0, -95.0, 49.0, 77.0, 0.0, 0.0)),             # NAD83 / Canada Atlas Lambert
    # RGF93 / CC42..CC50 conic-conformal zones (EPSG 3942-3950):
    # lat0 = 42..50, parallels lat0 +/- 0.75, lon0 3, FE 1.7e6,
    # FN (lat0-42)*1e6 + 1.2e6
    **{
        3900 + l: (
            "lcc2sp",
            (_GRS80, float(l), 3.0, l - 0.75, l + 0.75,
             1700000.0, (l - 42) * 1e6 + 1200000.0),
        )
        for l in range(42, 51)
    },
    # Albers equal-area
    5070: ("albers", (_GRS80, 23.0, -96.0, 29.5, 45.5, 0.0, 0.0)),     # NAD83 / Conus Albers
    3577: ("albers", (_GRS80, 0.0, 132.0, -18.0, -36.0, 0.0, 0.0)),    # GDA94 / Australian Albers
    3310: ("albers", (_GRS80, 0.0, -120.0, 34.0, 40.5, 0.0, -4000000.0)),  # NAD83 / California Albers
    # Lambert azimuthal equal-area (oblique ellipsoidal)
    3035: ("laea", (_GRS80, 52.0, 10.0, 4321000.0, 3210000.0)),        # ETRS89 / LAEA Europe
    # national transverse-mercator grids
    27700: ("tm", (_AIRY1830, 49.0, -2.0, 0.9996012717, 400000.0, -100000.0)),  # OSGB 1936 / British National Grid
    2193: ("tm", (_GRS80, 0.0, 173.0, 0.9996, 1600000.0, 10000000.0)),          # NZGD2000 / NZTM2000
    3006: ("tm", (_GRS80, 0.0, 15.0, 0.9996, 500000.0, 0.0)),                   # SWEREF99 TM
    2180: ("tm", (_GRS80, 0.0, 19.0, 0.9993, 500000.0, -5300000.0)),            # ETRS89 / Poland CS92
    3067: ("tm", (_GRS80, 0.0, 27.0, 0.9996, 500000.0, 0.0)),                   # ETRS89 / TM35FIN
    # ETRS89 / UTM zones 28N-38N (EPSG 25828-25838)
    **{
        25800 + z: ("tm", (_GRS80, 0.0, float(6 * z - 183), 0.9996, 500000.0, 0.0))
        for z in range(28, 39)
    },
    # NAD83 / UTM zones 1N-23N (EPSG 26901-26923)
    **{
        26900 + z: ("tm", (_GRS80, 0.0, float(6 * z - 183), 0.9996, 500000.0, 0.0))
        for z in range(1, 24)
    },
    # GDA94 / MGA zones 49-56 (EPSG 28349-28356, southern hemisphere)
    **{
        28300 + z: (
            "tm",
            (_GRS80, 0.0, float(6 * z - 183), 0.9996, 500000.0, 10000000.0),
        )
        for z in range(49, 57)
    },
    # DHDN / Gauss-Krüger zones 2-5 (EPSG 31466-31469): Bessel 1841,
    # lon0 = 3*zone, k0 = 1, FE = zone*1e6 + 500000
    **{
        31464 + z: (
            "tm",
            (_BESSEL, 0.0, float(3 * z), 1.0, z * 1e6 + 500000.0, 0.0),
        )
        for z in range(2, 6)
    },
    # ETRS89 / Poland CS2000 zones 5-8 (EPSG 2176-2179): lon0 = 3*zone,
    # k0 = 0.999923, FE = zone*1e6 + 500000
    **{
        2171 + z: (
            "tm",
            (_GRS80, 0.0, float(3 * z), 0.999923, z * 1e6 + 500000.0, 0.0),
        )
        for z in range(5, 9)
    },
    # oblique stereographic
    28992: ("stereo", (
        _BESSEL,
        52.0 + 9.0 / 60 + 22.178 / 3600, 5.0 + 23.0 / 60 + 15.5 / 3600,
        0.9999079, 155000.0, 463000.0,
    )),  # Amersfoort / RD New
}

# per-family views of the registry (the downstream constants functions
# key on these; membership in PROJ_DEFS IS the supported set)
_LCC2SP_DEFS: dict[int, tuple] = {
    c: p for c, (fam, p) in PROJ_DEFS.items() if fam == "lcc2sp"
}
_ALBERS_DEFS: dict[int, tuple] = {
    c: p for c, (fam, p) in PROJ_DEFS.items() if fam == "albers"
}
_LAEA_DEFS: dict[int, tuple] = {
    c: p for c, (fam, p) in PROJ_DEFS.items() if fam == "laea"
}
_TM_NATIONAL_DEFS: dict[int, tuple] = {
    c: p for c, (fam, p) in PROJ_DEFS.items() if fam == "tm"
}


def tm_national_params(code: int):
    """(a, f, lon0, fn, k0, fe, lat0) for a national TM grid, else None."""
    d = _TM_NATIONAL_DEFS.get(code)
    if d is None:
        return None
    (a, f), lat0, lon0, k0, fe, fn = d
    return a, f, lon0, fn, k0, fe, lat0


def tm_national_forward_py(lon: float, lat: float, code: int) -> tuple[float, float]:
    """Pure-Python mirror of tm_forward for the national grids (shared
    constants/series) — property tests and oracle-SQL control literals."""
    a, f, lon0, fn, k0, fe, lat0 = tm_national_params(code)
    e2 = f * (2 - f)
    e4, e6 = e2 * e2, e2 ** 3
    ep2 = e2 / (1 - e2)
    m0 = _tm_m0(a, e2, lat0) if lat0 else 0.0
    phi = _math.radians(lat)
    dlam = _math.radians(lon - lon0)
    sp, cp, tp = _math.sin(phi), _math.cos(phi), _math.tan(phi)
    n = a / _math.sqrt(1 - e2 * sp * sp)
    t, c, aa = tp * tp, ep2 * cp * cp, dlam * cp
    m = a * (
        (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * phi
        - (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * _math.sin(2 * phi)
        + (15 * e4 / 256 + 45 * e6 / 1024) * _math.sin(4 * phi)
        - (35 * e6 / 3072) * _math.sin(6 * phi)
    )
    x = fe + k0 * n * (
        aa + (1 - t + c) * aa ** 3 / 6
        + (5 - 18 * t + t * t + 72 * c - 58 * ep2) * aa ** 5 / 120
    )
    y = fn + k0 * (
        m - m0 + n * tp * (
            aa * aa / 2 + (5 - t + 9 * c + 4 * c * c) * aa ** 4 / 24
            + (61 - 58 * t + t * t + 600 * c - 330 * ep2) * aa ** 6 / 720
        )
    )
    return x, y


def _lcc_m(phi: float, e2: float) -> float:
    return _math.cos(phi) / _math.sqrt(1 - e2 * _math.sin(phi) ** 2)


def _lcc_t_f(phi: float, e: float) -> float:
    return _math.tan(_math.pi / 4 - phi / 2) / (
        (1 - e * _math.sin(phi)) / (1 + e * _math.sin(phi))
    ) ** (e / 2)


def lcc_constants(code: int) -> dict:
    """Driver-side LCC 2SP projection constants (EPSG GN7-2 §1.3.1.1)."""
    (a, f), lat0, lon0, lat1, lat2, fe, fn = _LCC2SP_DEFS[code]
    e2 = f * (2 - f)
    e = _math.sqrt(e2)
    p0, p1, p2 = map(_math.radians, (lat0, lat1, lat2))
    m1, m2 = _lcc_m(p1, e2), _lcc_m(p2, e2)
    t0, t1, t2 = (_lcc_t_f(p, e) for p in (p0, p1, p2))
    n = (_math.log(m1) - _math.log(m2)) / (_math.log(t1) - _math.log(t2))
    big_f = m1 / (n * t1**n)
    rho0 = a * big_f * t0**n
    return dict(a=a, e=e, e2=e2, lon0=lon0, n=n, aF=a * big_f,
                rho0=rho0, fe=fe, fn=fn)


def _col_t(phi: Column, e: float) -> Column:
    """t(phi) as a Column (same operation order as :func:`_lcc_t_f`)."""
    s = F.sin(phi)
    return F.tan(F.pi() / 4 - phi / 2) / F.pow(
        (1 - e * s) / (1 + e * s), e / 2
    )


def lcc_forward(lon: Column, lat: Column, code: int) -> tuple[Column, Column]:
    """Geographic -> LCC 2SP easting/northing (EPSG GN7-2)."""
    k = lcc_constants(code)
    t = _col_t(F.radians(lat), k["e"])
    rho = k["aF"] * F.pow(t, k["n"])
    theta = k["n"] * F.radians(lon - F.lit(k["lon0"]))
    return (
        k["fe"] + rho * F.sin(theta),
        k["fn"] + k["rho0"] - rho * F.cos(theta),
    )


def _phi_from_t(t: Column, e: float) -> Column:
    """Conformal latitude inverse: phi from t by fixed-point iteration
    (EPSG GN7-2). Contraction ~e^2/2 per step: 4 steps reach ~1e-12 rad
    from a ~3e-3 rad spherical start. Kept minimal on purpose — each
    step references phi twice, so the expression tree grows 2^steps."""
    phi = F.pi() / 2 - 2 * F.atan(t)
    for _ in range(4):
        s = F.sin(phi)
        phi = F.pi() / 2 - 2 * F.atan(
            t * F.pow((1 - e * s) / (1 + e * s), e / 2)
        )
    return phi


def lcc_inverse(x: Column, y: Column, code: int) -> tuple[Column, Column]:
    k = lcc_constants(code)
    dx, dy = x - F.lit(k["fe"]), F.lit(k["rho0"]) - (y - F.lit(k["fn"]))
    sgn = 1.0 if k["n"] >= 0 else -1.0
    rho = sgn * F.sqrt(dx * dx + dy * dy)
    t = F.pow(rho / k["aF"], 1.0 / k["n"])
    theta = F.atan2(sgn * dx, sgn * dy)
    lat = F.degrees(_phi_from_t(t, k["e"]))
    lon = F.degrees(theta / k["n"]) + F.lit(k["lon0"])
    return lon, lat


def _auth_q(phi: float, e: float) -> float:
    s = _math.sin(phi)
    return (1 - e * e) * (
        s / (1 - e * e * s * s)
        - (1 / (2 * e)) * _math.log((1 - e * s) / (1 + e * s))
    )


def _col_q(phi: Column, e: float) -> Column:
    s = F.sin(phi)
    return (1 - e * e) * (
        s / (1 - e * e * s * s)
        - (1 / (2 * e)) * F.log((1 - e * s) / (1 + e * s))
    )


def _beta_to_phi(beta: Column, e2: float) -> Column:
    """Authalic -> geodetic latitude series (Snyder 1987 eq 3-18)."""
    e4, e6 = e2 * e2, e2 * e2 * e2
    return (
        beta
        + (e2 / 3 + 31 * e4 / 180 + 517 * e6 / 5040) * F.sin(2 * beta)
        + (23 * e4 / 360 + 251 * e6 / 3780) * F.sin(4 * beta)
        + (761 * e6 / 45360) * F.sin(6 * beta)
    )


def albers_constants(code: int) -> dict:
    """Driver-side Albers equal-area conic constants (Snyder eqs 14-3..14-6)."""
    (a, f), lat0, lon0, lat1, lat2, fe, fn = _ALBERS_DEFS[code]
    e2 = f * (2 - f)
    e = _math.sqrt(e2)
    p0, p1, p2 = map(_math.radians, (lat0, lat1, lat2))
    m1, m2 = _lcc_m(p1, e2), _lcc_m(p2, e2)
    q0, q1, q2 = (_auth_q(p, e) for p in (p0, p1, p2))
    n = (m1 * m1 - m2 * m2) / (q2 - q1)
    c = m1 * m1 + n * q1
    rho0 = a * _math.sqrt(c - n * q0) / n
    qp = _auth_q(_math.pi / 2, e)
    return dict(a=a, e=e, e2=e2, lon0=lon0, n=n, c=c, rho0=rho0,
                qp=qp, fe=fe, fn=fn)


def albers_forward(lon: Column, lat: Column, code: int) -> tuple[Column, Column]:
    k = albers_constants(code)
    q = _col_q(F.radians(lat), k["e"])
    rho = k["a"] * F.sqrt(k["c"] - k["n"] * q) / k["n"]
    theta = k["n"] * F.radians(lon - F.lit(k["lon0"]))
    return (
        k["fe"] + rho * F.sin(theta),
        k["fn"] + k["rho0"] - rho * F.cos(theta),
    )


def albers_inverse(x: Column, y: Column, code: int) -> tuple[Column, Column]:
    k = albers_constants(code)
    dx, dy = x - F.lit(k["fe"]), F.lit(k["rho0"]) - (y - F.lit(k["fn"]))
    sgn = 1.0 if k["n"] >= 0 else -1.0
    rho = sgn * F.sqrt(dx * dx + dy * dy)
    q = (k["c"] - F.pow(rho * k["n"] / k["a"], F.lit(2.0))) / k["n"]
    beta = F.asin(q / k["qp"])
    lat = F.degrees(_beta_to_phi(beta, k["e2"]))
    lon = F.lit(k["lon0"]) + F.degrees(F.atan2(sgn * dx, sgn * dy) / k["n"])
    return lon, lat


def laea_constants(code: int) -> dict:
    """Driver-side Lambert azimuthal equal-area constants (EPSG GN7-2 §1.3.3.2)."""
    (a, f), lat0, lon0, fe, fn = _LAEA_DEFS[code]
    e2 = f * (2 - f)
    e = _math.sqrt(e2)
    p0 = _math.radians(lat0)
    qp = _auth_q(_math.pi / 2, e)
    q0 = _auth_q(p0, e)
    beta0 = _math.asin(q0 / qp)
    rq = a * _math.sqrt(qp / 2)
    m0 = _lcc_m(p0, e2)
    d = a * m0 / (rq * _math.cos(beta0))
    return dict(a=a, e=e, e2=e2, lon0=lon0, qp=qp, beta0=beta0, rq=rq,
                d=d, fe=fe, fn=fn)


def laea_forward(lon: Column, lat: Column, code: int) -> tuple[Column, Column]:
    k = laea_constants(code)
    beta = F.asin(_col_q(F.radians(lat), k["e"]) / k["qp"])
    dlam = F.radians(lon - F.lit(k["lon0"]))
    sb0, cb0 = _math.sin(k["beta0"]), _math.cos(k["beta0"])
    b = k["rq"] * F.sqrt(
        2.0 / (1 + sb0 * F.sin(beta) + cb0 * F.cos(beta) * F.cos(dlam))
    )
    return (
        k["fe"] + b * k["d"] * F.cos(beta) * F.sin(dlam),
        k["fn"] + (b / k["d"]) * (cb0 * F.sin(beta) - sb0 * F.cos(beta) * F.cos(dlam)),
    )


def laea_inverse(x: Column, y: Column, code: int) -> tuple[Column, Column]:
    k = laea_constants(code)
    sb0, cb0 = _math.sin(k["beta0"]), _math.cos(k["beta0"])
    ex, ny = (x - F.lit(k["fe"])) / k["d"], (y - F.lit(k["fn"])) * k["d"]
    rho = F.sqrt(ex * ex + ny * ny)
    c = 2 * F.asin(rho / (2 * k["rq"]))
    beta = F.asin(F.cos(c) * sb0 + ny * F.sin(c) * cb0 / rho)
    lat = F.degrees(_beta_to_phi(beta, k["e2"]))
    lon = F.lit(k["lon0"]) + F.degrees(
        F.atan2(ex * F.sin(c), rho * cb0 * F.cos(c) - ny * sb0 * F.sin(c))
    )
    return lon, lat


# -- oblique stereographic (RD New) -----------------------------------------

# (ellipsoid, lat0, lon0, k0, FE, FN) — view of PROJ_DEFS
_OBL_STEREO_DEFS: dict[int, tuple] = {
    c: p for c, (fam, p) in PROJ_DEFS.items() if fam == "stereo"
}


def stereo_constants(code: int) -> dict:
    """Driver-side oblique-stereographic constants (EPSG GN7-2 §1.3.7.1:
    the double-projection via the conformal sphere; RD New is GN7-2's
    own worked example for this method)."""
    (a, f), lat0, lon0, k0, fe, fn = _OBL_STEREO_DEFS[code]
    e2 = f * (2 - f)
    e = _math.sqrt(e2)
    p0 = _math.radians(lat0)
    sp0 = _math.sin(p0)
    rho0 = a * (1 - e2) / (1 - e2 * sp0 * sp0) ** 1.5
    nu0 = a / _math.sqrt(1 - e2 * sp0 * sp0)
    r = _math.sqrt(rho0 * nu0)
    n = _math.sqrt(1 + e2 * _math.cos(p0) ** 4 / (1 - e2))
    s1 = (1 + sp0) / (1 - sp0)
    s2 = (1 - e * sp0) / (1 + e * sp0)
    w1 = (s1 * s2**e) ** n
    sin_chi0 = (w1 - 1) / (w1 + 1)
    c = (n + sp0) * (1 - sin_chi0) / ((n - sp0) * (1 + sin_chi0))
    w2 = c * w1
    chi0 = _math.asin((w2 - 1) / (w2 + 1))
    return dict(a=a, e=e, e2=e2, lon0=_math.radians(lon0), k0=k0, fe=fe,
                fn=fn, r=r, n=n, c=c, chi0=chi0)


def stereo_forward(lon: Column, lat: Column, code: int) -> tuple[Column, Column]:
    k = stereo_constants(code)
    phi = F.radians(lat)
    lam = F.radians(lon)
    sp = F.sin(phi)
    sa = (1 + sp) / (1 - sp)
    sb = (1 - k["e"] * sp) / (1 + k["e"] * sp)
    w = k["c"] * F.pow(sa * F.pow(sb, k["e"]), k["n"])
    chi = F.asin((w - 1) / (w + 1))
    sx0, cx0 = _math.sin(k["chi0"]), _math.cos(k["chi0"])
    # Lambda - lon0 == n*(lam - lon0); computed directly so the oracle
    # SQL evaluates the bit-identical operation order
    dl = k["n"] * (lam - k["lon0"])
    b = 1 + F.sin(chi) * sx0 + F.cos(chi) * cx0 * F.cos(dl)
    return (
        k["fe"] + 2 * k["r"] * k["k0"] * F.cos(chi) * F.sin(dl) / b,
        k["fn"] + 2 * k["r"] * k["k0"] * (F.sin(chi) * cx0 - F.cos(chi) * sx0 * F.cos(dl)) / b,
    )


def stereo_inverse(x: Column, y: Column, code: int) -> tuple[Column, Column]:
    """Oblique-stereographic inverse (EPSG GN7-2 §1.3.7.1). The phi
    recovery uses the isometric-latitude FIXED-POINT form
    (phi = 2 atan(e^psi ((1+e sin phi)/(1-e sin phi))^(e/2)) - pi/2),
    which references phi only TWICE per unrolled step — a Newton step
    references it ~5x, and each reference replicates the whole
    upstream subtree in Catalyst, making 4 Newton steps a ~600x
    expression blowup (measured: 9 s of plan build for this family
    alone). 4 fixed-point steps (contraction ~e^2/2) reach ~1e-11 deg.
    Feed COLUMN REFERENCES for roundtrips."""
    k = stereo_constants(code)
    ex, ny = x - F.lit(k["fe"]), y - F.lit(k["fn"])
    g = 2 * k["r"] * k["k0"] * _math.tan(_math.pi / 4 - k["chi0"] / 2)
    h = 4 * k["r"] * k["k0"] * _math.tan(k["chi0"]) + g
    i = F.atan2(ex, h + ny)
    j = F.atan2(ex, g - ny) - i
    chi = k["chi0"] + 2 * F.atan((ny - ex * F.tan(j / 2)) / (2 * k["r"] * k["k0"]))
    lam = j + 2 * i + k["lon0"]
    lon = F.degrees((lam - k["lon0"]) / k["n"] + k["lon0"])
    psi = (
        F.log((1 + F.sin(chi)) / (k["c"] * (1 - F.sin(chi)))) / (2 * k["n"])
    )
    phi = 2 * F.atan(F.exp(psi)) - F.pi() / 2
    for _ in range(4):
        s = F.sin(phi)
        phi = 2 * F.atan(
            F.exp(psi) * F.pow((1 + k["e"] * s) / (1 - k["e"] * s), k["e"] / 2)
        ) - F.pi() / 2
    return lon, F.degrees(phi)


def _forward_py(lon: float, lat: float, code: int) -> tuple[float, float]:
    """Pure-Python mirror of the conic forward Column math (same constants,
    same operation order). Used by property tests and to generate oracle-SQL
    control-point literals — NOT a second implementation: it shares
    :func:`lcc_constants`/:func:`albers_constants`/:func:`laea_constants`."""
    if code in _LCC2SP_DEFS:
        k = lcc_constants(code)
        t = _lcc_t_f(_math.radians(lat), k["e"])
        rho = k["aF"] * t ** k["n"]
        th = k["n"] * _math.radians(lon - k["lon0"])
        return k["fe"] + rho * _math.sin(th), k["fn"] + k["rho0"] - rho * _math.cos(th)
    if code in _ALBERS_DEFS:
        k = albers_constants(code)
        q = _auth_q(_math.radians(lat), k["e"])
        rho = k["a"] * _math.sqrt(k["c"] - k["n"] * q) / k["n"]
        th = k["n"] * _math.radians(lon - k["lon0"])
        return k["fe"] + rho * _math.sin(th), k["fn"] + k["rho0"] - rho * _math.cos(th)
    if code in _LAEA_DEFS:
        k = laea_constants(code)
        beta = _math.asin(_auth_q(_math.radians(lat), k["e"]) / k["qp"])
        dlam = _math.radians(lon - k["lon0"])
        sb0, cb0 = _math.sin(k["beta0"]), _math.cos(k["beta0"])
        b = k["rq"] * _math.sqrt(
            2.0 / (1 + sb0 * _math.sin(beta) + cb0 * _math.cos(beta) * _math.cos(dlam))
        )
        return (
            k["fe"] + b * k["d"] * _math.cos(beta) * _math.sin(dlam),
            k["fn"] + (b / k["d"]) * (cb0 * _math.sin(beta) - sb0 * _math.cos(beta) * _math.cos(dlam)),
        )
    if code in _OBL_STEREO_DEFS:
        k = stereo_constants(code)
        phi, lam = _math.radians(lat), _math.radians(lon)
        big_l = k["n"] * (lam - k["lon0"]) + k["lon0"]
        sp = _math.sin(phi)
        w = k["c"] * (
            ((1 + sp) / (1 - sp))
            * ((1 - k["e"] * sp) / (1 + k["e"] * sp)) ** k["e"]
        ) ** k["n"]
        chi = _math.asin((w - 1) / (w + 1))
        sx0, cx0 = _math.sin(k["chi0"]), _math.cos(k["chi0"])
        dl = big_l - k["lon0"]
        b = 1 + _math.sin(chi) * sx0 + _math.cos(chi) * cx0 * _math.cos(dl)
        return (
            k["fe"] + 2 * k["r"] * k["k0"] * _math.cos(chi) * _math.sin(dl) / b,
            k["fn"] + 2 * k["r"] * k["k0"]
            * (_math.sin(chi) * cx0 - _math.cos(chi) * sx0 * _math.cos(dl)) / b,
        )
    raise ValueError(f"no conic family for EPSG:{code}")


_CONIC_FWD = {
    **{c: (lambda lo, la, c=c: lcc_forward(lo, la, c)) for c in _LCC2SP_DEFS},
    **{c: (lambda lo, la, c=c: albers_forward(lo, la, c)) for c in _ALBERS_DEFS},
    **{c: (lambda lo, la, c=c: laea_forward(lo, la, c)) for c in _LAEA_DEFS},
    **{c: (lambda lo, la, c=c: stereo_forward(lo, la, c)) for c in _OBL_STEREO_DEFS},
}
_CONIC_INV = {
    **{c: (lambda x, y, c=c: lcc_inverse(x, y, c)) for c in _LCC2SP_DEFS},
    **{c: (lambda x, y, c=c: albers_inverse(x, y, c)) for c in _ALBERS_DEFS},
    **{c: (lambda x, y, c=c: laea_inverse(x, y, c)) for c in _LAEA_DEFS},
    **{c: (lambda x, y, c=c: stereo_inverse(x, y, c)) for c in _OBL_STEREO_DEFS},
}


def reproject_bounds(
    minx: Column, miny: Column, maxx: Column, maxy: Column,
    source: int = 4326, target: int = 3857,
) -> Column:
    """[minx,miny,maxx,maxy] reprojected source->target (C5).

    Transforms the two corner points like reprojectBounds
    (utils.py:240-256: TransformPoint on (minx,miny) and (maxx,maxy)
    with traditional GIS axis order). Supported pairs: 4326<->3857 and
    4326<->UTM (:func:`utm_params` families) closed-form; identity for
    source==target. Other pairs raise, explicitly.
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
    if source == 4326 and (p := utm_params(target)) is not None:
        x0, y0 = tm_forward(minx, miny, *p)
        x1, y1 = tm_forward(maxx, maxy, *p)
        return F.array(x0, y0, x1, y1)
    if target == 4326 and (p := utm_params(source)) is not None:
        lon0, lat0 = tm_inverse(minx, miny, *p)
        lon1, lat1 = tm_inverse(maxx, maxy, *p)
        return F.array(lon0, lat0, lon1, lat1)
    if source == 4326 and (p := tm_national_params(target)) is not None:
        x0, y0 = tm_forward(minx, miny, *p)
        x1, y1 = tm_forward(maxx, maxy, *p)
        return F.array(x0, y0, x1, y1)
    if target == 4326 and (p := tm_national_params(source)) is not None:
        lon0, lat0 = tm_inverse(minx, miny, *p)
        lon1, lat1 = tm_inverse(maxx, maxy, *p)
        return F.array(lon0, lat0, lon1, lat1)
    if source == 4326 and target in _CONIC_FWD:
        x0, y0 = _CONIC_FWD[target](minx, miny)
        x1, y1 = _CONIC_FWD[target](maxx, maxy)
        return F.array(x0, y0, x1, y1)
    if target == 4326 and source in _CONIC_INV:
        lon0, lat0 = _CONIC_INV[source](minx, miny)
        lon1, lat1 = _CONIC_INV[source](maxx, maxy)
        return F.array(lon0, lat0, lon1, lat1)
    raise ValueError(
        f"unsupported CRS pair {source}->{target}; closed-form subset is "
        "4326<->3857, 4326<->UTM (326xx/327xx), and 4326<->every code in "
        f"geo.PROJ_DEFS ({len(PROJ_DEFS)} codes: LCC-2SP incl. RGF93 CC "
        "zones, Albers, LAEA 3035, RD-New 28992, and the national "
        "TM/Gauss-Krueger/UTM grid ladders) — no GDAL in this environment"
    )
