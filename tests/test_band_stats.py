"""Per-band raster statistics (S4/A2): the reference's
``srcband.ComputeStatistics(0)`` pass (utils.py:73-88) recomputed from
strip data — fixture roundtrips over every supported layout, and the
reference repo's own demo GeoTIFF pinned to its published golden
values (tests/test_geodatacrawler.py:19-20: band[0] min 2566 max
6598)."""

from __future__ import annotations

import os

import pytest

from pygeodatacrawler_spark.functions.media_codecs import (
    band_dimensions,
    decode_geotiff,
    encode_geotiff_fixture,
)

REF_GRID = "/root/reference/demo/grid"


def test_band_stats_all_layouts():
    for comp in ("none", "deflate"):
        for pred in (1, 2):
            for planar in (1, 2):
                for bo in ("<", ">"):
                    b = encode_geotiff_fixture(
                        width=7, height=5, n_bands=3, nodata=4.0,
                        byte_order=bo, band_base=100,
                        compression=comp, predictor=pred,
                        planar=planar, rows_per_strip=2,
                    )
                    m = decode_geotiff(b)
                    # ramp 100b..100b+34 per band, (0,0) is nodata
                    assert m["band_min"] == [101.0, 201.0, 301.0], (
                        comp, pred, planar, bo)
                    assert m["band_max"] == [134.0, 234.0, 334.0]


def test_band_stats_single_pixel_and_headeronly():
    m = decode_geotiff(
        encode_geotiff_fixture(width=1, height=1, n_bands=2,
                               nodata=9.0, band_base=50)
    )
    # single pixel: the nodata pixel is not written, ramp value stands
    assert m["band_min"] == [50.0, 100.0]
    assert m["band_max"] == [50.0, 100.0]
    # header-only tiff (round-3 fixtures): no stats, not wrong stats
    m2 = decode_geotiff(encode_geotiff_fixture(width=3, height=2))
    assert m2["band_min"] is None and m2["band_max"] is None
    assert m2["width"] == 3


def test_band_stats_all_nodata_band():
    # every pixel nodata -> that band reports None like GDAL's failed
    # ComputeStatistics, never a fabricated number
    b = encode_geotiff_fixture(width=1, height=2, n_bands=1,
                               nodata=7.0, band_base=100)
    import numpy as np  # craft: overwrite both pixels with nodata

    m = decode_geotiff(b)
    assert m["band_min"] == [101.0]  # sanity: normal fixture first
    # all-nodata variant: base ramp replaced via a 1x1 raster whose
    # single pixel IS nodata (nodata_pixel skipped only when wh==1,
    # so force it through a 2-pixel custom payload)
    raw = bytearray(b)
    # find the uncompressed strip (tail of file): 2 uint16 little-endian
    vals = np.frombuffer(bytes(raw[-4:]), dtype="<u2").copy()
    vals[:] = 7
    raw[-4:] = vals.tobytes()
    m2 = decode_geotiff(bytes(raw))
    assert m2["band_min"] == [None] and m2["band_max"] == [None]


def test_band_dimensions_reference_shape():
    b = encode_geotiff_fixture(width=4, height=3, n_bands=2,
                               nodata=3.0, band_base=10)
    dims = band_dimensions(decode_geotiff(b))
    assert dims == [
        {"name": "", "min": 11.0, "max": 21.0, "nodata": 3, "units": ""},
        {"name": "", "min": 21.0, "max": 31.0, "nodata": 3, "units": ""},
    ]


@pytest.mark.skipif(not os.path.exists(REF_GRID), reason="no reference demo")
def test_reference_demo_golden():
    """The reference's own pytest golden (test_geodatacrawler.py:19-20):
    demo/grid/00002.tif band 0 has min 2566, max 6598."""
    with open(f"{REF_GRID}/00002.tif", "rb") as f:
        m = decode_geotiff(f.read())
    assert m["width"] == 200 and m["height"] == 200 and m["n_bands"] == 4
    assert m["epsg"] == "EPSG:32736"
    dims = band_dimensions(m)
    assert dims[0]["min"] == 2566
    assert dims[0]["max"] == 6598
    assert dims[0]["nodata"] == -32768


def test_png_decode_reference_golden():
    """home.png vs the reference's GDAL statistics sidecar
    (demo/grid/home.png.aux.xml): band 1 min 1, max 253,
    mean 101.31386861314 — paletted indices with tRNS index 0 as
    nodata, exactly GDAL's reading."""
    import os

    import pytest

    from pygeodatacrawler_spark.functions.media_codecs import decode_png

    p = "/root/reference/demo/grid/home.png"
    if not os.path.exists(p):
        pytest.skip("no reference demo")
    with open(p, "rb") as f:
        m = decode_png(f.read())
    assert (m["width"], m["height"], m["n_bands"]) == (33, 34, 1)
    assert m["nodata"] == 0.0
    assert m["band_min"] == [1.0] and m["band_max"] == [253.0]
    assert abs(m["band_mean"][0] - 101.31386861314) < 1e-9


def test_png_fixture_filters_and_totality():
    from pygeodatacrawler_spark.functions.media_codecs import (
        decode_png,
        encode_png_fixture,
    )

    for ct in (0, 2):
        for ft in (0, 1, 2):
            m = decode_png(encode_png_fixture(9, 7, ctype=ct, base=10,
                                              filter_type=ft))
            nb = 1 if ct == 0 else 3
            assert m["n_bands"] == nb
            assert m["band_min"] == [float(10 * (k + 1)) for k in range(nb)]
            assert m["band_max"] == [float(10 * (k + 1) + 62) for k in range(nb)]
    assert decode_png(b"not a png")["width"] is None
    assert decode_png(None)["width"] is None
    # truncated-after-header: honest header facts, no stats, no raise
    b = encode_png_fixture(5, 4)
    m = decode_png(b[:40])
    assert m["width"] == 5 and m["band_min"] is None


@pytest.mark.skipif(not os.path.exists(REF_GRID), reason="no reference demo")
def test_reference_demo_goldens_all_rasters():
    """Every demo raster with a shipped GDAL .aux.xml statistics
    sidecar must reproduce it exactly: 00002_mod.tif (strip, single
    band: min 2566 max 10000) and era5-temperature_2m.tif (TILED
    512x512 deflate+predictor int16, 56% nodata: min 2853 max 2966)."""
    with open(f"{REF_GRID}/00002_mod.tif", "rb") as f:
        m = decode_geotiff(f.read())
    assert m["n_bands"] == 1
    assert m["band_min"] == [2566.0] and m["band_max"] == [10000.0]

    with open(f"{REF_GRID}/era5-temperature_2m.tif", "rb") as f:
        m = decode_geotiff(f.read())
    assert (m["width"], m["height"], m["n_bands"]) == (2271, 1990, 1)
    assert m["epsg"] == "EPSG:32736" and m["nodata"] == -32768.0
    assert m["band_min"] == [2853.0] and m["band_max"] == [2966.0]

    with open(f"{REF_GRID}/00003.tif", "rb") as f:
        m = decode_geotiff(f.read())
    assert m["n_bands"] == 4 and m["band_min"][0] == 1658.0
