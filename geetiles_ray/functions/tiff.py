"""Minimal GeoTIFF writer/reader, pure Python/numpy (no rasterio/tifffile in
this environment).

Writes single-strip, uncompressed, contiguous (PlanarConfig=1) baseline TIFF
with the GeoTIFF ModelPixelScale / ModelTiepoint tags and per-band names in
ImageDescription — enough for the reference's per-tile GeoTIFF layout
(gee.py:338-360: multi-band uint8/uint16/int16/float32 arrays with band
descriptions and a geo transform) to round-trip, and readable by GDAL/QGIS.

Supported dtypes: uint8, uint16, int16, float32 (the four the reference's
dataset plugins choose — SURVEY.md §1.2).
"""

from __future__ import annotations

import json
import struct

import numpy as np

_DTYPES = {
    "uint8": (8, 1), "uint16": (16, 1), "int16": (16, 2), "float32": (32, 3),
}
_SAMPLEFORMAT_TO_DTYPE = {(8, 1): "uint8", (16, 1): "uint16",
                          (16, 2): "int16", (32, 3): "float32"}

# TIFF tag ids
_T_WIDTH, _T_HEIGHT = 256, 257
_T_BITS, _T_COMPRESSION, _T_PHOTO = 258, 259, 262
_T_DESC = 270
_T_STRIP_OFFSETS, _T_SPP, _T_ROWS_PER_STRIP, _T_STRIP_COUNTS = 273, 277, 278, 279
_T_PLANAR, _T_SAMPLEFORMAT = 284, 339
_T_MODEL_PIXEL_SCALE, _T_MODEL_TIEPOINT = 33550, 33922


def write_tiff(path: str, array: np.ndarray, bounds=None,
               band_names: list[str] | None = None) -> None:
    """array: (H, W) or (H, W, C); bounds: (minx, miny, maxx, maxy) in the
    CRS (assumed EPSG:4326, the reference's storage CRS)."""
    a = np.asarray(array)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    dt = str(a.dtype)
    if dt not in _DTYPES:
        raise ValueError(f"unsupported dtype {dt}")
    bits, fmt = _DTYPES[dt]

    desc = json.dumps({"band_names": band_names or [f"b{i}" for i in range(c)]}
                      ).encode() + b"\x00"
    data = np.ascontiguousarray(a).tobytes()

    tags = []  # (tag, type, count, value_or_bytes)

    def short(v): return (3, 1, v)
    def long_(v): return (4, 1, v)

    entries = [
        (_T_WIDTH, *long_(w)), (_T_HEIGHT, *long_(h)),
        (_T_BITS, 3, c, [bits] * c),
        (_T_COMPRESSION, *short(1)), (_T_PHOTO, *short(1)),
        (_T_DESC, 2, len(desc), desc),
        (_T_STRIP_OFFSETS, 4, 1, None),  # patched later
        (_T_SPP, *short(c)), (_T_ROWS_PER_STRIP, *long_(h)),
        (_T_STRIP_COUNTS, 4, 1, len(data)),
        (_T_PLANAR, *short(1)),
        (_T_SAMPLEFORMAT, 3, c, [fmt] * c),
    ]
    if bounds is not None:
        minx, miny, maxx, maxy = bounds
        sx = (maxx - minx) / w
        sy = (maxy - miny) / h
        entries.append((_T_MODEL_PIXEL_SCALE, 12, 3, [sx, sy, 0.0]))
        # tiepoint: raster (0,0) ↔ model (minx, maxy)
        entries.append((_T_MODEL_TIEPOINT, 12, 6, [0, 0, 0, minx, maxy, 0]))
    entries.sort(key=lambda e: e[0])

    header = struct.pack("<2sHI", b"II", 42, 8)
    n = len(entries)
    ifd_size = 2 + n * 12 + 4
    extra_off = 8 + ifd_size
    extra = bytearray()

    def enc_values(ttype, count, value):
        if ttype == 2:
            return bytes(value)
        if ttype == 3:
            vals = value if isinstance(value, list) else [value]
            return b"".join(struct.pack("<H", v) for v in vals)
        if ttype == 4:
            vals = value if isinstance(value, list) else [value]
            return b"".join(struct.pack("<I", v) for v in vals)
        if ttype == 12:
            return b"".join(struct.pack("<d", float(v)) for v in value)
        raise ValueError(ttype)

    type_size = {2: 1, 3: 2, 4: 4, 12: 8}
    ifd = struct.pack("<H", n)
    patch = {}
    for tag, ttype, count, value in entries:
        if tag == _T_STRIP_OFFSETS:
            data_off_placeholder = 0
            ifd += struct.pack("<HHII", tag, ttype, count, data_off_placeholder)
            patch[tag] = len(ifd) - 4
            continue
        raw = enc_values(ttype, count, value)
        if len(raw) <= 4:
            ifd += struct.pack("<HHI", tag, ttype, count) + raw.ljust(4, b"\x00")
        else:
            ifd += struct.pack("<HHII", tag, ttype, count, extra_off + len(extra))
            extra += raw
    ifd += struct.pack("<I", 0)  # next IFD

    data_off = extra_off + len(extra)
    ifd = bytearray(ifd)
    off_pos = None
    # re-walk to patch strip offset
    pos = 2
    for _ in range(n):
        tag = struct.unpack_from("<H", ifd, pos)[0]
        if tag == _T_STRIP_OFFSETS:
            struct.pack_into("<I", ifd, pos + 8, data_off)
        pos += 12

    with open(path, "wb") as f:
        f.write(header)
        f.write(ifd)
        f.write(extra)
        f.write(data)


def read_tiff(path: str):
    """Returns (array (H,W,C), bounds or None, band_names)."""
    with open(path, "rb") as f:
        buf = f.read()
    order, magic, ifd_off = struct.unpack_from("<2sHI", buf, 0)
    if order != b"II" or magic != 42:
        raise ValueError("not a little-endian TIFF")
    n = struct.unpack_from("<H", buf, ifd_off)[0]
    tags = {}
    type_size = {1: 1, 2: 1, 3: 2, 4: 4, 12: 8}
    type_fmt = {3: "<H", 4: "<I", 12: "<d"}
    for i in range(n):
        pos = ifd_off + 2 + i * 12
        tag, ttype, count = struct.unpack_from("<HHI", buf, pos)
        size = type_size.get(ttype, 1) * count
        if size <= 4:
            off = pos + 8
        else:
            off = struct.unpack_from("<I", buf, pos + 8)[0]
        if ttype == 2:
            tags[tag] = buf[off:off + count]
        else:
            fmt = type_fmt[ttype]
            step = type_size[ttype]
            tags[tag] = [struct.unpack_from(fmt, buf, off + j * step)[0]
                         for j in range(count)]
    w, h = tags[_T_WIDTH][0], tags[_T_HEIGHT][0]
    c = tags.get(_T_SPP, [1])[0]
    bits = tags[_T_BITS][0]
    fmt = tags.get(_T_SAMPLEFORMAT, [1])[0]
    dtype = _SAMPLEFORMAT_TO_DTYPE[(bits, fmt)]
    off = tags[_T_STRIP_OFFSETS][0]
    count = tags[_T_STRIP_COUNTS][0]
    a = np.frombuffer(buf, dtype=dtype, count=h * w * c, offset=off).reshape(h, w, c)
    bounds = None
    if _T_MODEL_PIXEL_SCALE in tags and _T_MODEL_TIEPOINT in tags:
        sx, sy, _ = tags[_T_MODEL_PIXEL_SCALE]
        _, _, _, ox, oy, _ = tags[_T_MODEL_TIEPOINT]
        bounds = (ox, oy - sy * h, ox + sx * w, oy)
    band_names = None
    if _T_DESC in tags:
        try:
            band_names = json.loads(tags[_T_DESC].rstrip(b"\x00").decode())["band_names"]
        except Exception:
            band_names = None
    return a.copy(), bounds, band_names
