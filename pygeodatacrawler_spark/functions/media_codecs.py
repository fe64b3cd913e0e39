"""Dependency-free media decoders: GeoTIFF headers and XLSX properties.

Round-2 shipped the multimodal plumbing with a documented fake decode
because the sandbox lacks GDAL/openpyxl. These are the real parses for
the two formats that need no native libraries at all:

- **GeoTIFF** (S4): the raster facts the reference pulls from
  ``gdal.Open`` (/root/reference/geodatacrawler/utils.py:59-116) —
  width/height (TIFF tags 256/257), band count (277), the
  geotransform from ModelTiepoint+ModelPixelScale (33922/33550), the
  CRS from the GeoKeyDirectory (34735: GeographicType/ProjectedCSType
  geokeys), GDAL_NODATA (42113) — are plain struct-unpacking of the
  TIFF IFD; no pixel decode is needed because the reference's bounds
  math (utils.py:67-70) only uses the geotransform:
  ``lrx = ulx + XSize*xres; lry = uly + YSize*yres;
  bounds = [ulx, lry, lrx, uly]``.
- **XLSX** (S6): the reference's ``parseExcel`` returns
  ``load_workbook(file).properties.__dict__`` (utils.py:416-423);
  xlsx is a zip of XML, so docProps/core.xml (Dublin-Core properties,
  the same fields openpyxl exposes) and xl/workbook.xml (sheet names)
  parse with stdlib zipfile+ElementTree.

Each decoder has an ``encode_*_fixture`` twin that synthesizes valid
bytes from scalar inputs, so tests and the DuckDB oracle can assert
``decode(encode(x)) == x`` end-to-end through the binary column.
Decoders are total: malformed payloads return ``None`` fields, never
raise (a crawl must survive a truncated download).
"""

from __future__ import annotations

import io
import struct
import zipfile
from xml.etree import ElementTree as ET

# -- GeoTIFF ----------------------------------------------------------------

_TIFF_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 12: 8}
_T_ASCII, _T_SHORT, _T_LONG, _T_DOUBLE = 2, 3, 4, 12

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_STRIP_OFFSETS = 273
_TAG_SAMPLES = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_PLANAR = 284
_TAG_PREDICTOR = 317
_TAG_SAMPLE_FORMAT = 339
_TAG_TILE_WIDTH = 322
_TAG_TILE_LENGTH = 323
_TAG_TILE_OFFSETS = 324
_TAG_TILE_COUNTS = 325
_TAG_PIXEL_SCALE = 33550
_TAG_TIEPOINT = 33922
_TAG_GEOKEYS = 34735
_TAG_GDAL_NODATA = 42113

_GEOKEY_MODEL_TYPE = 1024
_GEOKEY_GEOGRAPHIC = 2048
_GEOKEY_PROJECTED = 3072


def decode_geotiff(payload: bytes | None) -> dict:
    """TIFF IFD -> raster metadata; pure function of the bytes.

    Returns width, height, n_bands, epsg ('EPSG:nnnn' or None), nodata,
    and bounds [minx, miny, maxx, maxy] via the reference's
    geotransform math. Handles II and MM byte orders, inline and
    offset-stored values. Malformed input -> all-None fields.
    """
    none = {
        "width": None, "height": None, "n_bands": None,
        "epsg": None, "nodata": None, "bounds": None,
        "band_min": None, "band_max": None,
    }
    if not payload or len(payload) < 8:
        return none
    try:
        bo = {b"II": "<", b"MM": ">"}.get(payload[:2])
        if bo is None or struct.unpack(bo + "H", payload[2:4])[0] != 42:
            return none
        (ifd_off,) = struct.unpack(bo + "I", payload[4:8])
        (n_entries,) = struct.unpack(bo + "H", payload[ifd_off : ifd_off + 2])
        tags: dict[int, tuple] = {}
        for i in range(n_entries):
            off = ifd_off + 2 + 12 * i
            tag, typ, cnt = struct.unpack(bo + "HHI", payload[off : off + 8])
            size = _TIFF_TYPE_SIZES.get(typ, 0) * cnt
            if size == 0:
                continue
            if size <= 4:
                raw = payload[off + 8 : off + 8 + size]
            else:
                (voff,) = struct.unpack(bo + "I", payload[off + 8 : off + 12])
                raw = payload[voff : voff + size]
            if typ == _T_SHORT:
                tags[tag] = struct.unpack(bo + f"{cnt}H", raw)
            elif typ == _T_LONG:
                tags[tag] = struct.unpack(bo + f"{cnt}I", raw)
            elif typ == _T_DOUBLE:
                tags[tag] = struct.unpack(bo + f"{cnt}d", raw)
            elif typ == _T_ASCII:
                tags[tag] = (raw.rstrip(b"\x00").decode("ascii", "replace"),)

        width = int(tags[_TAG_WIDTH][0]) if _TAG_WIDTH in tags else None
        height = int(tags[_TAG_HEIGHT][0]) if _TAG_HEIGHT in tags else None
        n_bands = int(tags[_TAG_SAMPLES][0]) if _TAG_SAMPLES in tags else 1

        epsg = None
        if _TAG_GEOKEYS in tags:
            gk = tags[_TAG_GEOKEYS]
            n_keys = int(gk[3])
            keys = {
                int(gk[4 + 4 * k]): int(gk[7 + 4 * k])
                for k in range(n_keys)
                if int(gk[5 + 4 * k]) == 0  # value stored inline
            }
            code = keys.get(_GEOKEY_PROJECTED) or keys.get(_GEOKEY_GEOGRAPHIC)
            if code:
                epsg = f"EPSG:{code}"

        nodata = None
        if _TAG_GDAL_NODATA in tags:
            try:
                nodata = float(tags[_TAG_GDAL_NODATA][0])
            except ValueError:
                nodata = None

        bounds = None
        if (
            _TAG_PIXEL_SCALE in tags
            and _TAG_TIEPOINT in tags
            and width is not None
            and height is not None
        ):
            sx, sy = tags[_TAG_PIXEL_SCALE][0], tags[_TAG_PIXEL_SCALE][1]
            tp = tags[_TAG_TIEPOINT]
            # GDAL geotransform from a raster->model tiepoint + scale:
            # ulx/uly are the tiepoint pulled back to pixel (0,0);
            # yres is negative (north-up), matching gdal.GetGeoTransform
            ulx = tp[3] - tp[0] * sx
            uly = tp[4] + tp[1] * sy
            xres, yres = sx, -sy
            # reference bounds math (utils.py:67-70, 92)
            lrx = ulx + width * xres
            lry = uly + height * yres
            bounds = [float(ulx), float(lry), float(lrx), float(uly)]

        band_min, band_max = _band_stats(
            payload, bo, tags, width, height, n_bands, nodata
        )

        return {
            "width": width, "height": height, "n_bands": n_bands,
            "epsg": epsg, "nodata": nodata, "bounds": bounds,
            "band_min": band_min, "band_max": band_max,
        }
    except (struct.error, IndexError, KeyError):
        return none


def _band_stats(
    payload: bytes,
    bo: str,
    tags: dict[int, tuple],
    width: int | None,
    height: int | None,
    n_bands: int,
    nodata: float | None,
) -> tuple[list | None, list | None]:
    """Per-band pixel min/max — the reference's
    ``srcband.ComputeStatistics(0)`` pass (utils.py:73-88), computed
    directly from the strip data with stdlib zlib + numpy.

    Supported layouts: strip- OR tile-organized TIFF, uncompressed (1)
    or deflate (8/32946), predictor none/horizontal (1/2), chunky or
    planar (284), uniform 8/16/32/64-bit uint/int/float samples. Edge
    tiles are clipped to the image region before stats (their padding
    is junk). Anything else (LZW, JPEG, float-predictor) ->
    (None, None): an honest "no stats", never a wrong number.
    ``nodata`` pixels (and float NaNs) are excluded, like GDAL
    statistics.
    """
    tiled = _TAG_TILE_OFFSETS in tags and _TAG_TILE_COUNTS in tags
    if (
        not tiled
        and (_TAG_STRIP_OFFSETS not in tags or _TAG_STRIP_COUNTS not in tags)
    ) or not width or not height:
        return None, None
    comp = int(tags.get(_TAG_COMPRESSION, (1,))[0])
    pred = int(tags.get(_TAG_PREDICTOR, (1,))[0])
    planar = int(tags.get(_TAG_PLANAR, (1,))[0])
    bits_t = tags.get(_TAG_BITS, (8,) * n_bands)
    fmt_t = tags.get(_TAG_SAMPLE_FORMAT, (1,) * n_bands)
    bits, sfmt = int(bits_t[0]), int(fmt_t[0])
    if not (
        all(int(b) == bits for b in bits_t)
        and all(int(f) == sfmt for f in fmt_t)
        and comp in (1, 8, 32946)
        and pred in (1, 2)
        and planar in (1, 2)
        and bits in (8, 16, 32, 64)
        and sfmt in (1, 2, 3)
        and not (pred == 2 and sfmt == 3)
        and not (sfmt == 3 and bits < 32)
    ):
        return None, None
    import zlib

    import numpy as np

    dt = np.dtype(f"{bo}{ {1: 'u', 2: 'i', 3: 'f'}[sfmt] }{bits // 8}")
    if tiled:
        offs, cnts = tags[_TAG_TILE_OFFSETS], tags[_TAG_TILE_COUNTS]
        tw = int(tags[_TAG_TILE_WIDTH][0])
        tl = int(tags[_TAG_TILE_LENGTH][0])
        if tw <= 0 or tl <= 0:
            return None, None
        tiles_across = (width + tw - 1) // tw
        tiles_per_band = tiles_across * ((height + tl - 1) // tl)
    else:
        offs, cnts = tags[_TAG_STRIP_OFFSETS], tags[_TAG_STRIP_COUNTS]
        rps = int(tags.get(_TAG_ROWS_PER_STRIP, (height,))[0]) or height
        strips_per_band = (height + rps - 1) // rps
    mins: list = [None] * n_bands
    maxs: list = [None] * n_bands

    def _feed(band: int, vals) -> None:
        if nodata is not None:
            vals = vals[vals != nodata]
        if sfmt == 3:
            vals = vals[~np.isnan(vals)]
        if vals.size == 0:
            return
        lo, hi = float(vals.min()), float(vals.max())
        if mins[band] is None or lo < mins[band]:
            mins[band] = lo
        if maxs[band] is None or hi > maxs[band]:
            maxs[band] = hi

    try:
        for si, (o, c) in enumerate(zip(offs, cnts)):
            raw = payload[int(o) : int(o) + int(c)]
            if len(raw) != int(c):
                return None, None
            if comp in (8, 32946):
                raw = zlib.decompress(raw)
            arr = np.frombuffer(raw, dtype=dt)
            if tiled:
                # tile geometry: clip the right/bottom edge padding to
                # the image region BEFORE stats (predictor first — it
                # runs over the tile's full padded rows)
                ti = si % tiles_per_band
                band0 = si // tiles_per_band
                if band0 >= (n_bands if planar == 2 else 1):
                    return None, None
                ty, tx = divmod(ti, tiles_across)
                nb_t = n_bands if planar == 1 else 1
                if arr.size != tw * tl * nb_t:
                    return None, None
                rows = arr.reshape(tl, tw, nb_t)
                if pred == 2:
                    rows = np.cumsum(rows, axis=1, dtype=rows.dtype)
                vrows = min(tl, height - ty * tl)
                vcols = min(tw, width - tx * tw)
                if vrows <= 0 or vcols <= 0:
                    return None, None
                rows = rows[:vrows, :vcols, :]
                if planar == 1:
                    for b in range(n_bands):
                        _feed(b, rows[:, :, b].ravel())
                else:
                    _feed(band0, rows.ravel())
                continue
            if planar == 1:
                if arr.size % (width * n_bands):
                    return None, None
                rows = arr.reshape(-1, width, n_bands)
                if pred == 2:
                    rows = np.cumsum(rows, axis=1, dtype=rows.dtype)
                for b in range(n_bands):
                    _feed(b, rows[:, :, b].ravel())
            else:
                band = si // strips_per_band
                if band >= n_bands or arr.size % width:
                    return None, None
                rows = arr.reshape(-1, width)
                if pred == 2:
                    rows = np.cumsum(rows, axis=1, dtype=rows.dtype)
                _feed(band, rows.ravel())
    except (zlib.error, ValueError):
        return None, None
    return mins, maxs


def band_dimensions(meta: dict) -> list[dict] | None:
    """Assemble the reference's per-band ``dimensions`` list
    (utils.py:82-88: ``{name, min, max, nodata, units}``) from a
    :func:`decode_geotiff` result. name/units are '' like
    ``GetDescription()``/``GetUnitType()`` on bare rasters; nodata is
    int-cast like the reference's ``int(srcband.GetNoDataValue())``."""
    if meta.get("n_bands") is None:
        return None
    mins = meta.get("band_min") or [None] * meta["n_bands"]
    maxs = meta.get("band_max") or [None] * meta["n_bands"]
    nodata = meta.get("nodata")
    return [
        {
            "name": "",
            "min": mins[b],
            "max": maxs[b],
            "nodata": int(nodata) if nodata is not None else None,
            "units": "",
        }
        for b in range(meta["n_bands"])
    ]


def encode_geotiff_fixture(
    width: int,
    height: int,
    n_bands: int = 1,
    ulx: float = 0.0,
    uly: float = 0.0,
    xres: float = 1.0,
    yres: float = -1.0,
    epsg: int | None = 4326,
    projected: bool = False,
    nodata: float | None = None,
    byte_order: str = "<",
    band_base: int | None = None,
    compression: str = "none",
    predictor: int = 1,
    planar: int = 1,
    rows_per_strip: int | None = None,
) -> bytes:
    """Valid GeoTIFF bytes for fixtures.

    Header-only by default (round-3 behaviour). With ``band_base`` set,
    real uint16 strip pixel data is written: band ``b`` (0-based) holds
    the ramp ``band_base*(b+1) + r*width + c``; when ``nodata`` is set
    and the raster has >1 pixel, pixel (0,0) of every band is the
    nodata value — so per-band min/max are closed-form for the oracle.
    ``compression``: 'none' | 'deflate'; ``predictor`` 1|2 (horizontal
    differencing); ``planar`` 1 (chunky) | 2 (per-band strips).
    """
    bo = byte_order
    entries: list[tuple[int, int, int, bytes]] = [
        (_TAG_WIDTH, _T_LONG, 1, struct.pack(bo + "I", width)),
        (_TAG_HEIGHT, _T_LONG, 1, struct.pack(bo + "I", height)),
        (_TAG_SAMPLES, _T_SHORT, 1, struct.pack(bo + "H", n_bands)),
        (
            _TAG_PIXEL_SCALE, _T_DOUBLE, 3,
            struct.pack(bo + "3d", xres, -yres, 0.0),
        ),
        (
            _TAG_TIEPOINT, _T_DOUBLE, 6,
            struct.pack(bo + "6d", 0.0, 0.0, 0.0, ulx, uly, 0.0),
        ),
    ]
    if epsg is not None:
        key_id = _GEOKEY_PROJECTED if projected else _GEOKEY_GEOGRAPHIC
        model = 1 if projected else 2
        gk = (1, 1, 0, 2, _GEOKEY_MODEL_TYPE, 0, 1, model, key_id, 0, 1, epsg)
        entries.append(
            (_TAG_GEOKEYS, _T_SHORT, len(gk), struct.pack(bo + f"{len(gk)}H", *gk))
        )
    if nodata is not None:
        s = f"{nodata:g}".encode("ascii") + b"\x00"
        entries.append((_TAG_GDAL_NODATA, _T_ASCII, len(s), s))

    strips: list[bytes] = []
    if band_base is not None:
        import zlib

        import numpy as np

        px = np.empty((height, width, n_bands), dtype=bo + "u2")
        ramp = (np.arange(height * width) % 65536).reshape(height, width)
        for b in range(n_bands):
            px[:, :, b] = (band_base * (b + 1) + ramp) % 65536
        if nodata is not None and height * width > 1:
            px[0, 0, :] = int(nodata)
        rps = rows_per_strip or max(1, height // 3)

        def _enc(rows: "np.ndarray") -> bytes:
            # rows shape (r, width, nb) or (r, width) for planar
            if predictor == 2:
                rows = rows.astype(bo + "i8")
                rows = np.concatenate(
                    [rows[:, :1], np.diff(rows, axis=1)], axis=1
                ).astype(bo + "u2")
            raw = rows.tobytes()
            return zlib.compress(raw) if compression == "deflate" else raw

        if planar == 1:
            for r0 in range(0, height, rps):
                strips.append(_enc(px[r0 : r0 + rps]))
        else:
            for b in range(n_bands):
                for r0 in range(0, height, rps):
                    strips.append(_enc(px[r0 : r0 + rps, :, b]))
        comp_code = 8 if compression == "deflate" else 1
        entries += [
            (_TAG_BITS, _T_SHORT, n_bands,
             struct.pack(bo + f"{n_bands}H", *([16] * n_bands))),
            (_TAG_COMPRESSION, _T_SHORT, 1, struct.pack(bo + "H", comp_code)),
            (_TAG_ROWS_PER_STRIP, _T_LONG, 1, struct.pack(bo + "I", rps)),
            (_TAG_PLANAR, _T_SHORT, 1, struct.pack(bo + "H", planar)),
            (_TAG_SAMPLE_FORMAT, _T_SHORT, n_bands,
             struct.pack(bo + f"{n_bands}H", *([1] * n_bands))),
            (_TAG_STRIP_COUNTS, _T_LONG, len(strips),
             struct.pack(bo + f"{len(strips)}I", *[len(s) for s in strips])),
        ]
        if predictor == 2:
            entries.append(
                (_TAG_PREDICTOR, _T_SHORT, 1, struct.pack(bo + "H", 2))
            )

    entries.sort(key=lambda e: e[0])  # TIFF requires ascending tag order
    n_entries = len(entries) + (1 if strips else 0)
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * n_entries + 4

    # lay out the value tail first so strip offsets are known
    tail = b""
    packed: list[tuple[int, int, int, bytes, int | None]] = []
    for tag, typ, cnt, raw in entries:
        if len(raw) <= 4:
            packed.append((tag, typ, cnt, raw, None))
        else:
            packed.append((tag, typ, cnt, b"", data_off + len(tail)))
            tail += raw
    if strips:
        strip_offs = []
        base = data_off + len(tail) + 4 * len(strips)
        pos = base
        for s in strips:
            strip_offs.append(pos)
            pos += len(s)
        raw = struct.pack(bo + f"{len(strips)}I", *strip_offs)
        if len(raw) <= 4:
            packed.append((_TAG_STRIP_OFFSETS, _T_LONG, len(strips), raw, None))
            tail += b"\x00" * 4  # keep the reserved offset slot stable
        else:
            packed.append(
                (_TAG_STRIP_OFFSETS, _T_LONG, len(strips), b"",
                 data_off + len(tail))
            )
            tail += raw
        packed.sort(key=lambda e: e[0])

    out = io.BytesIO()
    out.write((b"II" if bo == "<" else b"MM") + struct.pack(bo + "HI", 42, ifd_off))
    out.write(struct.pack(bo + "H", n_entries))
    for tag, typ, cnt, raw, voff in packed:
        out.write(struct.pack(bo + "HHI", tag, typ, cnt))
        if voff is None:
            out.write(raw.ljust(4, b"\x00"))
        else:
            out.write(struct.pack(bo + "I", voff))
    out.write(struct.pack(bo + "I", 0))  # next-IFD pointer: none
    out.write(tail)
    for s in strips:
        out.write(s)
    return out.getvalue()


# -- PNG (S4: the reference's GRID_FILE_TYPES include png; GDAL reads
# paletted PNGs as one index band with the tRNS entry as nodata — see
# demo/grid/home.png + its GDAL .aux.xml statistics sidecar) ----------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# samples per pixel by color type: gray, -, RGB, palette, gray+A, -, RGBA
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png(payload: bytes | None) -> dict:
    """PNG -> raster metadata + per-band pixel min/max/mean.

    Pure stdlib/numpy: chunk walk, zlib IDAT, scanline filter reversal
    (all five filter types). Supported: 8/16-bit, color types
    0/2/3/4/6, interlace 0. Paletted images report ONE band of palette
    indices with the first fully-transparent tRNS index as nodata —
    exactly how GDAL indexes them (the reference's home.png golden:
    min 1, max 253 excluding the transparent index). Alpha==0 pixels
    are excluded from color-band stats like GDAL's mask. Malformed or
    unsupported input -> all-None fields, never a raise.
    """
    none = {
        "width": None, "height": None, "n_bands": None, "nodata": None,
        "band_min": None, "band_max": None, "band_mean": None,
    }
    if not payload or not payload.startswith(_PNG_SIG):
        return none
    try:
        import zlib

        import numpy as np

        pos = 8
        ihdr = None
        idat = bytearray()
        trns = None
        while pos + 8 <= len(payload):
            (ln,), typ = struct.unpack(">I", payload[pos : pos + 4]), payload[
                pos + 4 : pos + 8
            ]
            data = payload[pos + 8 : pos + 8 + ln]
            if typ == b"IHDR":
                ihdr = struct.unpack(">IIBBBBB", data[:13])
            elif typ == b"IDAT":
                idat += data
            elif typ == b"tRNS":
                trns = data
            elif typ == b"IEND":
                break
            pos += 12 + ln
        if ihdr is None:
            return none
        w, h, depth, ctype, comp, filt, interlace = ihdr
        meta = {**none, "width": int(w), "height": int(h)}
        ch = _PNG_CHANNELS.get(ctype)
        meta["n_bands"] = ch if ctype != 3 else 1
        if (
            ch is None or comp != 0 or filt != 0 or interlace != 0
            or depth not in (8, 16) or not idat or w == 0 or h == 0
        ):
            return meta  # header facts only, honest no-stats
        raw = zlib.decompress(bytes(idat))
        bpp = ch * depth // 8  # filter unit: bytes per pixel
        stride = w * bpp
        if len(raw) < h * (stride + 1):
            return meta
        out = np.zeros((h, stride), dtype=np.uint8)
        prev = np.zeros(stride, dtype=np.uint8)
        o = 0
        for r in range(h):
            ftype = raw[o]
            line = np.frombuffer(raw[o + 1 : o + 1 + stride], dtype=np.uint8)
            o += 1 + stride
            if ftype == 0:
                cur = line.copy()
            elif ftype == 2:  # Up
                cur = (line + prev).astype(np.uint8)
            else:  # Sub/Average/Paeth need the left pixel: sequential
                cur = np.empty(stride, dtype=np.uint8)
                for i in range(stride):
                    x = int(line[i])
                    a = int(cur[i - bpp]) if i >= bpp else 0
                    b = int(prev[i])
                    if ftype == 1:
                        x += a
                    elif ftype == 3:
                        x += (a + b) // 2
                    elif ftype == 4:
                        c = int(prev[i - bpp]) if i >= bpp else 0
                        p = a + b - c
                        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                        x += a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur[i] = x & 0xFF
            out[r] = cur
            prev = cur
        if depth == 16:
            px = out.reshape(h, w, ch, 2)
            samples = (
                px[..., 0].astype(np.uint16) << 8 | px[..., 1]
            ).reshape(h * w, ch)
        else:
            samples = out.reshape(h * w, ch)

        nodata = None
        if ctype == 3:
            # first fully transparent palette index == GDAL's nodata
            if trns:
                zeros = [i for i, a in enumerate(trns) if a == 0]
                if zeros:
                    nodata = float(zeros[0])
            vals = samples[:, 0].astype(np.float64)
            if nodata is not None:
                vals = vals[vals != nodata]
            bands = [vals]
        elif ctype in (4, 6):
            alpha = samples[:, -1]
            mask = alpha != 0
            bands = [samples[mask, b].astype(np.float64) for b in range(ch - 1)]
            meta["n_bands"] = ch - 1  # alpha is the mask, not a data band
        else:
            bands = [samples[:, b].astype(np.float64) for b in range(ch)]
        meta["nodata"] = nodata
        meta["band_min"] = [float(v.min()) if v.size else None for v in bands]
        meta["band_max"] = [float(v.max()) if v.size else None for v in bands]
        meta["band_mean"] = [
            float(v.mean()) if v.size else None for v in bands
        ]
        return meta
    except (struct.error, ValueError, Exception):  # noqa: BLE001 — total
        return none


def encode_png_fixture(
    width: int,
    height: int,
    ctype: int = 0,
    base: int = 10,
    filter_type: int = 0,
) -> bytes:
    """Minimal valid PNG for fixtures: gray8 (ctype 0) or RGB8 (2) with
    a deterministic ramp pixel(r,c,b) = base*(b+1) + (r*width+c) % 200,
    encoded with one filter type for decode coverage."""
    import zlib

    import numpy as np

    ch = _PNG_CHANNELS[ctype]
    px = np.empty((height, width, ch), dtype=np.uint8)
    ramp = (np.arange(height * width) % 200).reshape(height, width)
    for b in range(ch):
        px[:, :, b] = (base * (b + 1) + ramp) % 256
    flat = px.reshape(height, width * ch)
    bpp = ch
    lines = bytearray()
    prev = np.zeros(width * ch, dtype=np.uint8)
    for r in range(height):
        cur = flat[r]
        if filter_type == 0:
            enc = cur
        elif filter_type == 2:
            enc = (cur - prev).astype(np.uint8)
        elif filter_type == 1:
            shifted = np.concatenate([np.zeros(bpp, np.uint8), cur[:-bpp]])
            enc = (cur - shifted).astype(np.uint8)
        else:
            raise ValueError("fixture supports filters 0/1/2")
        lines += bytes([filter_type]) + enc.tobytes()
        prev = cur

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, ctype, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines)))
        + chunk(b"IEND", b"")
    )


# -- OGR VRT (S5: the reference's demo indexes cities.vrt — a small
# XML wrapper naming a source file, geometry type and SRS) ------------------


def decode_vrt(payload: bytes | None) -> dict:
    """OGR VRT XML -> first layer's name, mcf geomtype bucket (from
    ``wkbPoint``-style GeometryType), SRS text resolved via crs
    normalization downstream, and the referenced source file name.
    Total on malformed XML."""
    none = {"layer": None, "geomtype": None, "src": None, "srs": None}
    if not payload:
        return none
    try:
        root = ET.fromstring(payload)
        if root.tag != "OGRVRTDataSource":
            return none
        layer = root.find("OGRVRTLayer")
        if layer is None:
            return none
        gt = layer.findtext("GeometryType") or ""
        src = (layer.findtext("SrcDataSource") or "").strip()
        return {
            "layer": layer.get("name"),
            "geomtype": _mcf_geomtype(gt.removeprefix("wkb")),
            "src": src or None,
            "srs": (layer.findtext("LayerSRS") or "").strip() or None,
        }
    except ET.ParseError:
        return none


# -- GeoPackage (S5: OGR's GPKG driver surface — a GeoPackage is a
# SQLite file with gpkg_contents / gpkg_geometry_columns metadata
# tables, so stdlib sqlite3.deserialize introspects it without OGR) --------


def decode_gpkg(payload: bytes | None) -> dict:
    """GeoPackage -> the OGR layer introspection subset the reference
    reads (utils.py:118-158): first features layer's name, mcf geomtype
    bucket, feature count, attribute name:type list, bounds, EPSG.
    Total: malformed/non-sqlite input -> all-None fields."""
    none = {
        "layer": None, "geomtype": None, "n_features": None,
        "attrs": None, "bounds": None, "epsg": None,
    }
    if not payload or not payload.startswith(b"SQLite format 3\x00"):
        return none
    import sqlite3

    try:
        con = sqlite3.connect(":memory:")
        try:
            con.deserialize(payload)
            row = con.execute(
                "select table_name, min_x, min_y, max_x, max_y, srs_id "
                "from gpkg_contents where data_type='features' "
                "order by table_name limit 1"
            ).fetchone()
            if row is None:
                return none
            table, minx, miny, maxx, maxy, srs = row
            geom = con.execute(
                "select geometry_type_name from gpkg_geometry_columns "
                "where table_name = ?", (table,)
            ).fetchone()
            n = con.execute(
                f'select count(*) from "{table}"'  # noqa: S608 — name from gpkg_contents
            ).fetchone()[0]
            cols = con.execute(f'pragma table_info("{table}")').fetchall()
            # attribute list like the OGR defn: skip pk + geometry column
            geom_cols = {
                r[0] for r in con.execute(
                    "select column_name from gpkg_geometry_columns "
                    "where table_name = ?", (table,)
                )
            }
            type_map = {
                "INTEGER": "Integer", "MEDIUMINT": "Integer",
                "DOUBLE": "Real", "REAL": "Real", "FLOAT": "Real",
                "TEXT": "String", "DATE": "Date", "DATETIME": "DateTime",
                "BOOLEAN": "Integer", "BLOB": "Binary",
            }
            attrs = ",".join(
                f"{name}:{type_map.get(str(ctype).upper(), str(ctype))}"
                for _, name, ctype, *_ in cols
                if name not in geom_cols and name != "fid"
            )
            bounds = (
                [float(minx), float(miny), float(maxx), float(maxy)]
                if None not in (minx, miny, maxx, maxy)
                else None
            )
            return {
                "layer": table,
                "geomtype": _mcf_geomtype(geom[0] if geom else None),
                "n_features": int(n),
                "attrs": attrs or None,
                "bounds": bounds,
                "epsg": f"EPSG:{int(srs)}" if srs is not None and int(srs) > 0 else None,
            }
        finally:
            con.close()
    except Exception:  # noqa: BLE001 — decoders are total
        return none


def decode_parquet_meta(payload: bytes | None) -> dict:
    """Parquet -> row count + column name:type list from the footer
    only (pyarrow metadata read, no data materialization)."""
    none = {"n_features": None, "attrs": None}
    if not payload or len(payload) < 8 or payload[:4] != b"PAR1":
        return none
    try:
        import io as _io

        import pyarrow.parquet as _pq

        pf = _pq.ParquetFile(_io.BytesIO(payload))
        schema = pf.schema_arrow
        return {
            "n_features": int(pf.metadata.num_rows),
            "attrs": ",".join(
                f"{f.name}:{f.type}" for f in schema
            ) or None,
        }
    except Exception:  # noqa: BLE001
        return none


# -- vector: GeoJSON + ESRI Shapefile (S5) ----------------------------------

# the reference's OGR geometry-type buckets (utils.py:132-141):
# mcf types curve / surface / point / complex
_CURVE_TYPES = {
    "linestring", "line string", "polyline", "line", "curve",
    "multiline", "multilinestring", "wkblinestring",
}
_SURFACE_TYPES = {"polygon", "multipolygon", "surface"}
_POINT_TYPES = {"point", "multipoint"}


def _mcf_geomtype(name: str | None) -> str:
    n = (name or "").lower()
    if n in _CURVE_TYPES:
        return "curve"
    if n in _SURFACE_TYPES:
        return "surface"
    if n in _POINT_TYPES:
        return "point"
    return "complex"


def _geojson_bbox(geom, acc: list) -> None:
    """Recursive coordinate min/max (any nesting depth)."""
    if isinstance(geom, (int, float)):
        return
    if (
        isinstance(geom, list)
        and len(geom) >= 2
        and all(isinstance(v, (int, float)) for v in geom[:2])
    ):
        x, y = float(geom[0]), float(geom[1])
        if acc[0] is None or x < acc[0]:
            acc[0] = x
        if acc[1] is None or y < acc[1]:
            acc[1] = y
        if acc[2] is None or x > acc[2]:
            acc[2] = x
        if acc[3] is None or y > acc[3]:
            acc[3] = y
        return
    if isinstance(geom, list):
        for g in geom:
            _geojson_bbox(g, acc)


def decode_geojson(payload: bytes | None) -> dict:
    """GeoJSON -> the vector facts the reference reads off OGR
    (utils.py:118-158): feature count, mcf geomtype bucket, attribute
    name:type list (from the first feature's properties, like OGR's
    layer definition), bounds [minx, miny, maxx, maxy]."""
    import json as _json

    none = {"geomtype": None, "n_features": None, "attrs": None, "bounds": None}
    if not payload:
        return none
    try:
        doc = _json.loads(payload.decode("utf-8"))
    except (UnicodeDecodeError, ValueError):
        return none
    if not isinstance(doc, dict):
        return none
    if doc.get("type") == "FeatureCollection":
        feats = doc.get("features") or []
    elif doc.get("type") == "Feature":
        feats = [doc]
    else:
        return none
    geoms = [f.get("geometry") for f in feats if isinstance(f, dict)]
    geoms = [g for g in geoms if isinstance(g, dict)]
    gtype = _mcf_geomtype(geoms[0].get("type")) if geoms else "complex"
    props = next(
        (
            f["properties"]
            for f in feats
            if isinstance(f, dict) and isinstance(f.get("properties"), dict)
        ),
        {},
    )
    _TYPE = {str: "String", int: "Integer", float: "Real", bool: "Integer"}
    attrs = ",".join(
        f"{k}:{_TYPE.get(type(v), 'String')}" for k, v in props.items()
    )
    acc: list = [None, None, None, None]
    for g in geoms:
        _geojson_bbox(g.get("coordinates"), acc)
    bounds = None if acc[0] is None else [float(v) for v in acc]
    return {
        "geomtype": gtype,
        "n_features": len(feats),
        "attrs": attrs or None,
        "bounds": bounds,
    }


# shapefile shape-type ids -> type names (ESRI whitepaper, public)
_SHP_TYPES = {
    0: "null", 1: "point", 3: "polyline", 5: "polygon", 8: "multipoint",
    11: "point", 13: "polyline", 15: "polygon", 18: "multipoint",
    21: "point", 23: "polyline", 25: "polygon", 28: "multipoint",
    31: "complex",
}


def decode_shapefile(payload: bytes | None) -> dict:
    """.shp main-file parse: the 100-byte header (magic 9994, shape
    type, bbox) + a record-header walk for the feature count — the
    subset of OGR's layer introspection a header scan can answer."""
    none = {"geomtype": None, "n_features": None, "attrs": None, "bounds": None}
    if not payload or len(payload) < 100:
        return none
    try:
        if struct.unpack(">i", payload[0:4])[0] != 9994:
            return none
        (file_len_words,) = struct.unpack(">i", payload[24:28])
        (shp_type,) = struct.unpack("<i", payload[32:36])
        minx, miny, maxx, maxy = struct.unpack("<4d", payload[36:68])
        n = 0
        off = 100
        end = min(len(payload), file_len_words * 2)
        while off + 8 <= end:
            (content_words,) = struct.unpack(">i", payload[off + 4 : off + 8])
            if content_words < 0:
                break
            off += 8 + content_words * 2
            n += 1
        return {
            "geomtype": _mcf_geomtype(_SHP_TYPES.get(shp_type, "complex")),
            "n_features": n,
            "attrs": None,  # field defs live in the .dbf sidecar
            "bounds": [minx, miny, maxx, maxy],
        }
    except struct.error:
        return none


def decode_dbf(payload: bytes | None) -> dict:
    """.dbf sidecar parse: record count + field name:type list — the
    other half of OGR's layer introspection (utils.py:150-153 reads
    ``GetFieldCount``/``GetFieldDefn`` off the layer, which OGR sources
    from this header). Type mapping follows OGR's dBase rules:
    C->String, N->Integer (Real when decimals>0 or width>9), F->Real,
    D->Date, L/M->String."""
    none = {"n_features": None, "attrs": None}
    if not payload or len(payload) < 33:
        return none
    try:
        n_records = struct.unpack("<I", payload[4:8])[0]
        fields = []
        off = 32
        while off + 32 <= len(payload) and payload[off] != 0x0D:
            raw_name = payload[off : off + 11].split(b"\x00")[0]
            ftype = chr(payload[off + 11])
            width = payload[off + 16]
            decimals = payload[off + 17]
            if ftype == "C":
                t = "String"
            elif ftype == "N":
                t = "Real" if decimals > 0 or width > 9 else "Integer"
            elif ftype == "F":
                t = "Real"
            elif ftype == "D":
                t = "Date"
            else:  # L, M, unknown
                t = "String"
            fields.append(f"{raw_name.decode('ascii', 'replace')}:{t}")
            off += 32
        if not fields:
            return none
        return {"n_features": n_records, "attrs": ",".join(fields)}
    except (struct.error, IndexError):
        return none


def encode_dbf_fixture(
    fields: list[tuple[str, str, int, int]], n_records: int = 0
) -> bytes:
    """Minimal .dbf header bytes: (name, type_char, width, decimals)."""
    out = io.BytesIO()
    header_size = 32 + 32 * len(fields) + 1
    record_size = 1 + sum(w for _, _, w, _ in fields)
    out.write(
        struct.pack(
            "<BBBBIHH20x", 0x03, 24, 1, 1, n_records, header_size, record_size
        )
    )
    for name, tchar, width, dec in fields:
        out.write(
            name.encode("ascii")[:11].ljust(11, b"\x00")
            + tchar.encode("ascii")
            + b"\x00" * 4
            + bytes([width, dec])
            + b"\x00" * 14
        )
    out.write(b"\x0d")
    return out.getvalue()


def encode_shapefile_fixture(
    shp_type: int = 1,
    n_features: int = 3,
    bounds: tuple[float, float, float, float] = (0.0, 0.0, 1.0, 1.0),
) -> bytes:
    """Minimal valid .shp bytes: header + n point records."""
    rec = struct.pack("<i", 1) + struct.pack("<2d", bounds[0], bounds[1])
    body = b"".join(
        struct.pack(">ii", i + 1, len(rec) // 2) + rec
        for i in range(n_features)
    )
    header = (
        struct.pack(">i", 9994)
        + b"\x00" * 20
        + struct.pack(">i", (100 + len(body)) // 2)
        + struct.pack("<ii", 1000, shp_type)
        + struct.pack("<4d", *bounds)
        + struct.pack("<4d", 0.0, 0.0, 0.0, 0.0)
    )
    return header + body


# -- XLSX -------------------------------------------------------------------

_NS_CP = "http://schemas.openxmlformats.org/package/2006/metadata/core-properties"
_NS_DC = "http://purl.org/dc/elements/1.1/"
_NS_DCT = "http://purl.org/dc/terms/"
_NS_MAIN = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_NS_CT = "http://schemas.openxmlformats.org/package/2006/content-types"
_NS_REL = "http://schemas.openxmlformats.org/package/2006/relationships"


def decode_xlsx(payload: bytes | None) -> dict:
    """docProps/core.xml + xl/workbook.xml -> the properties subset the
    reference reads off ``load_workbook(file).properties.__dict__``
    (utils.py:416-423). Malformed/absent parts -> None fields."""
    out = {
        "title": None, "creator": None, "subject": None,
        "description": None, "keywords": None, "lastModifiedBy": None,
        "created": None, "modified": None, "sheets": None,
    }
    if not payload:
        return out
    try:
        zf = zipfile.ZipFile(io.BytesIO(payload))
    except (zipfile.BadZipFile, OSError):
        return out
    with zf:
        names = set(zf.namelist())
        if "docProps/core.xml" in names:
            try:
                root = ET.fromstring(zf.read("docProps/core.xml"))
                fields = {
                    "title": f"{{{_NS_DC}}}title",
                    "creator": f"{{{_NS_DC}}}creator",
                    "subject": f"{{{_NS_DC}}}subject",
                    "description": f"{{{_NS_DC}}}description",
                    "keywords": f"{{{_NS_CP}}}keywords",
                    "lastModifiedBy": f"{{{_NS_CP}}}lastModifiedBy",
                    "created": f"{{{_NS_DCT}}}created",
                    "modified": f"{{{_NS_DCT}}}modified",
                }
                for key, tag in fields.items():
                    el = root.find(tag)
                    if el is not None and el.text:
                        out[key] = el.text
            except ET.ParseError:
                pass
        if "xl/workbook.xml" in names:
            try:
                root = ET.fromstring(zf.read("xl/workbook.xml"))
                out["sheets"] = [
                    s.get("name") or ""
                    for s in root.iter(f"{{{_NS_MAIN}}}sheet")
                ]
            except ET.ParseError:
                pass
    return out


def encode_xlsx_fixture(
    title: str | None = None,
    creator: str | None = None,
    subject: str | None = None,
    description: str | None = None,
    keywords: str | None = None,
    sheets: list[str] | None = None,
    created: str = "2024-01-01T00:00:00Z",
) -> bytes:
    """Minimal xlsx zip (core props + workbook) for fixtures/oracles."""
    sheets = sheets if sheets is not None else ["Sheet1"]

    def _el(tag: str, text: str | None) -> str:
        if text is None:
            return ""
        name = tag.split("}")[-1]
        pre = {"title": "dc", "creator": "dc", "subject": "dc",
               "description": "dc", "keywords": "cp",
               "created": "dcterms", "modified": "dcterms"}[name]
        extra = ' xsi:type="dcterms:W3CDTF"' if pre == "dcterms" else ""
        esc = (
            text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        )
        return f"<{pre}:{name}{extra}>{esc}</{pre}:{name}>"

    core = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<cp:coreProperties xmlns:cp="{_NS_CP}" xmlns:dc="{_NS_DC}" '
        f'xmlns:dcterms="{_NS_DCT}" '
        'xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance">'
        + _el("title", title) + _el("creator", creator)
        + _el("subject", subject) + _el("description", description)
        + _el("keywords", keywords) + _el("created", created)
        + "</cp:coreProperties>"
    )
    sheet_xml = "".join(
        f'<sheet name="{s}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
        for i, s in enumerate(sheets)
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{_NS_MAIN}" xmlns:r='
        '"http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f"<sheets>{sheet_xml}</sheets></workbook>"
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Types xmlns="{_NS_CT}">'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.'
        'openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/docProps/core.xml" ContentType="application/vnd.'
        'openxmlformats-package.core-properties+xml"/>'
        "</Types>"
    )
    rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{_NS_REL}">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
        '<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/'
        'package/2006/relationships/metadata/core-properties" '
        'Target="docProps/core.xml"/>'
        "</Relationships>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        # fixed date_time: fixture bytes are a pure function of inputs
        for name, data in [
            ("[Content_Types].xml", content_types),
            ("_rels/.rels", rels),
            ("docProps/core.xml", core),
            ("xl/workbook.xml", workbook),
        ]:
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zf.writestr(zi, data)
    return buf.getvalue()
