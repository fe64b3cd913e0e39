"""Conic reprojection families (C5, utils.py:240-256 via proj):
LCC 2SP (2154/3034/3978), Albers equal-area (5070/3577), LAEA (3035).

Verification strategy (no GDAL/pyproj in the sandbox, so no
self-grading against the same formulas):
- projection-origin exactness (mathematical identity of the 2SP form);
- the EPSG Guidance Note 7-2 LAEA worked example pinned to the cm;
- scale factor == 1 exactly on both LCC standard parallels (the
  defining property of the 2SP secant cone);
- |Jacobian| == area element everywhere for the equal-area families;
- inverse(forward(p)) == p to <1e-6 deg on a lon/lat grid.
All checks run driver-side on the pure-Python mirror (shared constants
with the Column math) plus one Spark end-to-end roundtrip.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from pygeodatacrawler_spark.functions import geo

CODES = (2154, 3034, 3978, 5070, 3577, 3035)


def _inv_py(x, y, code):
    if code in geo._LCC2SP_DEFS:
        k = geo.lcc_constants(code)
        dx, dy = x - k["fe"], k["rho0"] - (y - k["fn"])
        sgn = 1 if k["n"] >= 0 else -1
        rho = sgn * math.hypot(dx, dy)
        t = (rho / k["aF"]) ** (1 / k["n"])
        phi = math.pi / 2 - 2 * math.atan(t)
        for _ in range(6):
            s = math.sin(phi)
            phi = math.pi / 2 - 2 * math.atan(
                t * ((1 - k["e"] * s) / (1 + k["e"] * s)) ** (k["e"] / 2)
            )
        return (
            math.degrees(math.atan2(sgn * dx, sgn * dy) / k["n"]) + k["lon0"],
            math.degrees(phi),
        )
    if code in geo._ALBERS_DEFS:
        k = geo.albers_constants(code)
        dx, dy = x - k["fe"], k["rho0"] - (y - k["fn"])
        sgn = 1 if k["n"] >= 0 else -1
        rho = sgn * math.hypot(dx, dy)
        q = (k["c"] - (rho * k["n"] / k["a"]) ** 2) / k["n"]
        beta = math.asin(q / k["qp"])
    else:
        k = geo.laea_constants(code)
        sb0, cb0 = math.sin(k["beta0"]), math.cos(k["beta0"])
        ex, ny = (x - k["fe"]) / k["d"], (y - k["fn"]) * k["d"]
        rho = math.hypot(ex, ny)
        c = 2 * math.asin(rho / (2 * k["rq"]))
        beta = math.asin(math.cos(c) * sb0 + ny * math.sin(c) * cb0 / rho)
        e2, e4, e6 = k["e2"], k["e2"] ** 2, k["e2"] ** 3
        phi = (
            beta
            + (e2 / 3 + 31 * e4 / 180 + 517 * e6 / 5040) * math.sin(2 * beta)
            + (23 * e4 / 360 + 251 * e6 / 3780) * math.sin(4 * beta)
            + (761 * e6 / 45360) * math.sin(6 * beta)
        )
        lon = k["lon0"] + math.degrees(
            math.atan2(ex * math.sin(c),
                       rho * cb0 * math.cos(c) - ny * sb0 * math.sin(c))
        )
        return lon, math.degrees(phi)
    e2, e4, e6 = k["e2"], k["e2"] ** 2, k["e2"] ** 3
    phi = (
        beta
        + (e2 / 3 + 31 * e4 / 180 + 517 * e6 / 5040) * math.sin(2 * beta)
        + (23 * e4 / 360 + 251 * e6 / 3780) * math.sin(4 * beta)
        + (761 * e6 / 45360) * math.sin(6 * beta)
    )
    lon = k["lon0"] + math.degrees(math.atan2(dx * (1 if k["n"] >= 0 else -1),
                                              dy * (1 if k["n"] >= 0 else -1))
                                   / k["n"])
    return lon, math.degrees(phi)


_ORIGINS = {
    2154: (3.0, 46.5, 700000.0, 6600000.0),
    3034: (10.0, 52.0, 4000000.0, 2800000.0),
    3978: (-95.0, 49.0, 0.0, 0.0),
    5070: (-96.0, 23.0, 0.0, 0.0),
    3577: (132.0, 0.0, 0.0, 0.0),
    3035: (10.0, 52.0, 4321000.0, 3210000.0),
}


def test_projection_origin_exact():
    for code, (lon0, lat0, fe, fn) in _ORIGINS.items():
        e, n = geo._forward_py(lon0, lat0, code)
        assert abs(e - fe) < 1e-6 and abs(n - fn) < 1e-6, code


def test_laea_gn72_worked_example():
    # EPSG Guidance Note 7-2 §1.3.3.2 example (ETRS89 / LAEA Europe):
    # 50N 5E -> E 3962799.45, N 2999718.85
    e, n = geo._forward_py(5.0, 50.0, 3035)
    assert abs(e - 3962799.45) < 0.01
    assert abs(n - 2999718.85) < 0.01


def test_lcc_unit_scale_on_standard_parallels():
    for code, (lat1, lat2) in {2154: (44.0, 49.0), 3034: (35.0, 65.0),
                               3978: (49.0, 77.0)}.items():
        k = geo.lcc_constants(code)
        lon0 = k["lon0"]
        for lat in (lat1, lat2):
            d = 1e-6
            x1, y1 = geo._forward_py(lon0, lat, code)
            x2, y2 = geo._forward_py(lon0 + d, lat, code)
            phi = math.radians(lat)
            nu = k["a"] / math.sqrt(1 - k["e2"] * math.sin(phi) ** 2)
            kf = math.hypot(x2 - x1, y2 - y1) / (
                nu * math.cos(phi) * math.radians(d))
            assert abs(kf - 1.0) < 1e-6, (code, lat, kf)
        # and > 1 outside the secant band (conformal distortion)
        mid = (lat1 + lat2) / 2
        x1, y1 = geo._forward_py(lon0, mid, code)
        x2, y2 = geo._forward_py(lon0 + 1e-6, mid, code)
        phi = math.radians(mid)
        nu = k["a"] / math.sqrt(1 - k["e2"] * math.sin(phi) ** 2)
        kf = math.hypot(x2 - x1, y2 - y1) / (nu * math.cos(phi) * math.radians(1e-6))
        assert kf < 1.0  # secant cone: scale < 1 between the parallels


def test_equal_area_jacobian():
    pts = {5070: (-100.0, 40.0), 3577: (140.0, -30.0), 3035: (25.0, 65.0)}
    for code, (lon, lat) in pts.items():
        if code in geo._ALBERS_DEFS:
            k = geo.albers_constants(code)
        else:
            k = geo.laea_constants(code)
        d = 1e-6
        x0, y0 = geo._forward_py(lon, lat, code)
        x1, y1 = geo._forward_py(lon + d, lat, code)
        x2, y2 = geo._forward_py(lon, lat + d, code)
        jac = abs((x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0))
        phi = math.radians(lat)
        nu = k["a"] / math.sqrt(1 - k["e2"] * math.sin(phi) ** 2)
        rho = k["a"] * (1 - k["e2"]) / (1 - k["e2"] * math.sin(phi) ** 2) ** 1.5
        truth = nu * math.cos(phi) * math.radians(d) * rho * math.radians(d)
        assert abs(jac / truth - 1.0) < 1e-6, code


def test_roundtrip_grid():
    grids = {
        2154: [(-4 + i, 42 + j) for i in range(0, 11, 2) for j in range(0, 9, 2)],
        3034: [(-8 + i * 4, 36 + j * 4) for i in range(8) for j in range(8)],
        3978: [(-135 + i * 10, 45 + j * 5) for i in range(8) for j in range(6)],
        5070: [(-120 + i * 8, 25 + j * 5) for i in range(7) for j in range(5)],
        3577: [(115 + i * 6, -42 + j * 6) for i in range(6) for j in range(5)],
        3035: [(-10 + i * 6, 35 + j * 6) for i in range(7) for j in range(6)],
    }
    for code, pts in grids.items():
        for lon, lat in pts:
            x, y = geo._forward_py(lon, lat, code)
            lon2, lat2 = _inv_py(x, y, code)
            assert abs(lon2 - lon) < 1e-6 and abs(lat2 - lat) < 1e-6, (
                code, lon, lat)


def test_spark_column_path_matches_mirror(spark):
    # one end-to-end pass per family through the Column implementation
    df = spark.createDataFrame(
        [(2.25, 48.75), (-1.5, 43.25), (7.0, 47.5)], "lon double, lat double"
    )
    for code in CODES:
        fwd = geo.reproject_bounds(
            F.col("lon"), F.col("lat"), F.col("lon"), F.col("lat"), 4326, code
        )
        inv = geo.reproject_bounds(
            F.element_at(fwd, 1), F.element_at(fwd, 2),
            F.element_at(fwd, 3), F.element_at(fwd, 4), code, 4326,
        )
        rows = df.select(
            "lon", "lat",
            F.element_at(fwd, 1).alias("x"), F.element_at(fwd, 2).alias("y"),
            F.element_at(inv, 1).alias("rlon"), F.element_at(inv, 2).alias("rlat"),
        ).collect()
        for r in rows:
            ex, ey = geo._forward_py(r["lon"], r["lat"], code)
            assert abs(r["x"] - ex) < 1e-6 and abs(r["y"] - ey) < 1e-6
            assert abs(r["rlon"] - r["lon"]) < 1e-6
            assert abs(r["rlat"] - r["lat"]) < 1e-6


def test_unsupported_pair_raises():
    with pytest.raises(ValueError):
        geo.reproject_bounds(F.lit(0.0), F.lit(0.0), F.lit(1.0), F.lit(1.0),
                             4326, 21781)


def test_rdnew_oblique_stereographic():
    # origin exactness
    (_, lat0, lon0, _, fe, fn) = geo._OBL_STEREO_DEFS[28992]
    e, n = geo._forward_py(lon0, lat0, 28992)
    assert abs(e - fe) < 1e-6 and abs(n - fn) < 1e-6
    # EPSG GN7-2 §1.3.7.1 worked example (Amersfoort / RD New):
    # 53N 6E -> E 196105.283, N 557057.739
    e, n = geo._forward_py(6.0, 53.0, 28992)
    assert abs(e - 196105.283) < 0.005
    assert abs(n - 557057.739) < 0.005
    # conformality: scale isotropic at an arbitrary NL point
    import math
    d = 1e-7
    x0, y0 = geo._forward_py(5.0, 52.5, 28992)
    x1, y1 = geo._forward_py(5.0 + d, 52.5, 28992)
    x2, y2 = geo._forward_py(5.0, 52.5 + d, 28992)
    k = geo.stereo_constants(28992)
    phi = math.radians(52.5)
    nu = k["a"] / math.sqrt(1 - k["e2"] * math.sin(phi) ** 2)
    rho = k["a"] * (1 - k["e2"]) / (1 - k["e2"] * math.sin(phi) ** 2) ** 1.5
    kx = math.hypot(x1 - x0, y1 - y0) / (nu * math.cos(phi) * math.radians(d))
    ky = math.hypot(x2 - x0, y2 - y0) / (rho * math.radians(d))
    assert abs(kx - ky) < 1e-6


def test_tm_national_grids():
    # origin exactness for every national TM grid
    for code in (27700, 2193, 3006, 2180):
        a, f, lon0, fn, k0, fe, lat0 = geo.tm_national_params(code)
        e, n = geo.tm_national_forward_py(lon0, lat0, code)
        assert abs(e - fe) < 1e-6 and abs(n - fn) < 1e-6, code
    # Ordnance Survey worked example (Caister water tower):
    # 52d39m27.2531sN 1d43m4.5177sE -> E 651409.903 N 313177.270
    e, n = geo.tm_national_forward_py(
        1 + 43 / 60 + 4.5177 / 3600, 52 + 39 / 60 + 27.2531 / 3600, 27700
    )
    assert abs(e - 651409.903) < 0.005
    assert abs(n - 313177.270) < 0.005


def test_tm_national_spark_roundtrip(spark):
    # staged forward->inverse through the Column implementation
    from pygeodatacrawler_spark.functions.geo import (
        tm_forward,
        tm_inverse,
        tm_national_params,
    )

    df = spark.createDataFrame(
        [(-3.5, 51.5), (-0.25, 52.75), (0.25, 55.0)], "lon double, lat double"
    )
    p = tm_national_params(27700)
    fx, fy = tm_forward(F.col("lon"), F.col("lat"), *p)
    staged = df.select("lon", "lat", fx.alias("_x"), fy.alias("_y"))
    rlon, rlat = tm_inverse(F.col("_x"), F.col("_y"), *p)
    for r in staged.select("lon", "lat", rlon.alias("rl"), rlat.alias("rp")).collect():
        assert abs(r["rl"] - r["lon"]) < 1e-7
        assert abs(r["rp"] - r["lat"]) < 1e-7
        ex, en = geo.tm_national_forward_py(r["lon"], r["lat"], 27700)
        # and the Column forward matches the mirror
    rows = staged.collect()
    for r in rows:
        ex, en = geo.tm_national_forward_py(r["lon"], r["lat"], 27700)
        assert abs(r["_x"] - ex) < 1e-6 and abs(r["_y"] - en) < 1e-6


# -- round-5: parameter-driven registry (PROJ_DEFS) --------------------------

def test_proj_defs_is_the_single_registry():
    # the per-family dicts are views of PROJ_DEFS — membership there IS
    # the supported set (identification implies reprojectability)
    fams = {
        "lcc2sp": geo._LCC2SP_DEFS, "albers": geo._ALBERS_DEFS,
        "laea": geo._LAEA_DEFS, "tm": geo._TM_NATIONAL_DEFS,
        "stereo": geo._OBL_STEREO_DEFS,
    }
    assert sum(len(d) for d in fams.values()) == len(geo.PROJ_DEFS)
    for fam, d in fams.items():
        for code in d:
            assert geo.PROJ_DEFS[code][0] == fam
    assert len(geo.PROJ_DEFS) >= 70


def test_new_conic_members_origin_and_parallels():
    # RGF93 CC zones: natural origin (3, L) -> (1.7e6, (L-42)e6+1.2e6)
    for code in range(3942, 3951):
        lat0 = float(code - 3900)
        e, n = geo._forward_py(3.0, lat0, code)
        assert abs(e - 1700000.0) < 1e-6
        assert abs(n - ((lat0 - 42) * 1e6 + 1200000.0)) < 1e-6
        # unit scale on both standard parallels (secant cone property)
        k = geo.lcc_constants(code)
        for lat in (lat0 - 0.75, lat0 + 0.75):
            d = 1e-6
            x1, y1 = geo._forward_py(3.0, lat, code)
            x2, y2 = geo._forward_py(3.0 + d, lat, code)
            phi = math.radians(lat)
            nu = k["a"] / math.sqrt(1 - k["e2"] * math.sin(phi) ** 2)
            kf = math.hypot(x2 - x1, y2 - y1) / (
                nu * math.cos(phi) * math.radians(d))
            assert abs(kf - 1.0) < 1e-6, (code, lat, kf)
    # California Albers origin
    e, n = geo._forward_py(-120.0, 0.0, 3310)
    assert abs(e) < 1e-6 and abs(n + 4000000.0) < 1e-6


def test_new_tm_members_origin_scale_roundtrip():
    cases = {
        3067: (27.0, 500000.0, 0.0, 0.9996),       # TM35FIN
        25832: (9.0, 500000.0, 0.0, 0.9996),       # ETRS89 / UTM 32N
        26910: (-123.0, 500000.0, 0.0, 0.9996),    # NAD83 / UTM 10N
        28355: (147.0, 500000.0, 10000000.0, 0.9996),  # MGA94 zone 55
        31467: (9.0, 3500000.0, 0.0, 1.0),         # DHDN / GK zone 3
        2177: (18.0, 6500000.0, 0.0, 0.999923),    # Poland CS2000/18
    }
    for code, (lon0, fe, fn, k0) in cases.items():
        x, y = geo.tm_national_forward_py(lon0, 0.0, code)
        assert abs(x - fe) < 1e-6 and abs(y - fn) < 1e-6, code
        # scale at the natural origin == k0 (numeric E-W Jacobian)
        d = 1e-6
        x2, _ = geo.tm_national_forward_py(lon0 + d, 0.0, code)
        a = geo.tm_national_params(code)[0]
        scale = (x2 - x) / (math.radians(d) * a)
        assert abs(scale - k0) < 1e-7, (code, scale)
def test_new_tm_roundtrip_spark(spark):
    # roundtrip through the Column implementation for one new member of
    # each ladder (staged like the oracle: forward as named columns)
    import pyspark.sql.functions as F
    from pygeodatacrawler_spark.functions.geo import (
        tm_forward, tm_inverse, tm_national_params,
    )

    pts = {3067: (25.0, 63.0), 28355: (146.0, -37.5), 31467: (10.5, 51.0)}
    for code, (lon, lat) in pts.items():
        p = tm_national_params(code)
        base = spark.range(1).select(
            F.lit(lon).alias("_lon"), F.lit(lat).alias("_lat")
        )
        fx, fy = tm_forward(F.col("_lon"), F.col("_lat"), *p)
        staged = base.select(fx.alias("_fx"), fy.alias("_fy"))
        rlon, rlat = tm_inverse(F.col("_fx"), F.col("_fy"), *p)
        row = staged.select(rlon.alias("lon"), rlat.alias("lat")).collect()[0]
        assert abs(row["lon"] - lon) < 1e-6 and abs(row["lat"] - lat) < 1e-6, code
