"""Minimal ESRI Shapefile polygon reader (S4 — cmds.py:377-381 reads the
foreign admin shapefile with geopandas and REQUIRES EPSG:4326).

This sandbox has no geopandas/fiona, and the format itself is a simple
public binary layout (ESRI Shapefile Technical Description, 1998): a 100-byte
header then length-prefixed records; polygon records (shape type 5) are
``(box, num_parts, num_points, part offsets, xy points)`` little-endian
doubles. We parse exterior rings only (first ring per record — parity with
how the reference uses foreign shapes: one geometry per row, holes never
queried), plus the ``.dbf`` (dBASE III) attribute table for the id/name
columns, and the ``.prj`` check that stands in for the reference's
``crs == 4326`` assertion.

Scale note: a shapefile is a single un-splittable file, so the read itself
is one task; rows land in a Dataset and every downstream stage is parallel.
The foreign side in J1/J2 is broadcast (small), so this is never the
bottleneck.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pyarrow as pa
import ray.data

SHAPE_POLYGON = 5
SHAPE_NULL = 0


def read_shp_rings(path: str) -> list[np.ndarray | None]:
    """.shp → list of exterior rings ((n,2) float64, closed), None for null
    shapes. Record order == file order (the reference's row order)."""
    with open(path, "rb") as f:
        data = f.read()
    if len(data) < 100 or struct.unpack(">i", data[0:4])[0] != 9994:
        raise ValueError(f"{path}: not a shapefile (bad magic)")
    shape_type = struct.unpack("<i", data[32:36])[0]
    if shape_type not in (SHAPE_POLYGON, SHAPE_NULL):
        raise ValueError(f"{path}: shape type {shape_type}, only polygon (5) supported")
    rings: list[np.ndarray | None] = []
    off = 100
    n = len(data)
    while off + 8 <= n:
        content_len_words = struct.unpack(">i", data[off + 4:off + 8])[0]
        rec = data[off + 8:off + 8 + content_len_words * 2]
        off += 8 + content_len_words * 2
        rtype = struct.unpack("<i", rec[0:4])[0]
        if rtype == SHAPE_NULL:
            rings.append(None)
            continue
        if rtype != SHAPE_POLYGON:
            raise ValueError(f"record shape type {rtype} != polygon")
        num_parts, num_points = struct.unpack("<ii", rec[36:44])
        parts = np.frombuffer(rec, dtype="<i4", count=num_parts, offset=44)
        pts = np.frombuffer(rec, dtype="<f8", count=num_points * 2,
                            offset=44 + 4 * num_parts).reshape(num_points, 2)
        end = parts[1] if num_parts > 1 else num_points
        ring = np.array(pts[parts[0]:end], dtype=np.float64)
        if not np.array_equal(ring[0], ring[-1]):
            ring = np.vstack([ring, ring[:1]])
        rings.append(ring)
    return rings


def read_dbf(path: str) -> dict[str, list]:
    """.dbf (dBASE III) → {column: values}. C fields → str, N/F → float
    (int when no decimals), else raw str."""
    with open(path, "rb") as f:
        data = f.read()
    n_records = struct.unpack("<I", data[4:8])[0]
    header_len, record_len = struct.unpack("<HH", data[8:12])
    fields = []
    off = 32
    while data[off] != 0x0D:
        name = data[off:off + 11].split(b"\x00")[0].decode("ascii")
        ftype = chr(data[off + 11])
        flen = data[off + 16]
        fdec = data[off + 17]
        fields.append((name, ftype, flen, fdec))
        off += 32
    cols: dict[str, list] = {name: [] for name, *_ in fields}
    for i in range(n_records):
        rec = data[header_len + i * record_len: header_len + (i + 1) * record_len]
        pos = 1  # skip deletion flag
        for name, ftype, flen, fdec in fields:
            raw = rec[pos:pos + flen]
            pos += flen
            s = raw.decode("latin-1").strip()
            if ftype in ("N", "F") and s:
                cols[name].append(float(s) if (fdec or "." in s) else int(s))
            elif ftype in ("N", "F"):
                cols[name].append(None)
            else:
                cols[name].append(s)
    return cols


def check_prj_is_4326(path: str) -> None:
    """The reference refuses shapefiles not in EPSG:4326 (cmds.py:379-381);
    same policy, from the WKT in .prj (missing .prj → accept, like gpd does
    when crs is None... no: reference would see crs None ≠ 4326 → raise)."""
    if not os.path.exists(path):
        raise ValueError(f"{path}: no .prj — cannot confirm EPSG:4326 "
                         "(reference requires crs 4326, cmds.py:379-381)")
    txt = open(path, encoding="latin-1").read().upper()
    is_4326 = '"EPSG","4326"' in txt.replace(" ", "") or (
        txt.lstrip().startswith("GEOGCS") and
        ("WGS_1984" in txt or "WGS 84" in txt))
    if not is_4326:
        raise ValueError(f"{path}: CRS is not EPSG:4326")


def read_shapefile(path: str) -> ray.data.Dataset:
    """.shp(+.dbf/.prj) → Dataset of (wkb, minx..maxy, attributes…) foreign
    rows, ready for the J1/J2 broadcast join (stages/joins.py)."""
    from ..functions import geom

    base = path[:-4] if path.lower().endswith(".shp") else path
    check_prj_is_4326(base + ".prj")
    rings = read_shp_rings(base + ".shp")
    cols: dict[str, list] = {}
    if os.path.exists(base + ".dbf"):
        cols = read_dbf(base + ".dbf")
        for name, vals in cols.items():
            if len(vals) != len(rings):
                raise ValueError(f".dbf rows {len(vals)} != .shp records {len(rings)}")
    keep = [i for i, r in enumerate(rings) if r is not None]
    out: dict[str, object] = {
        "wkb": pa.array([geom.ring_to_wkb(rings[i]) for i in keep],
                        type=pa.binary()),
    }
    bounds = np.array([geom.bounds(rings[i]) for i in keep], dtype=np.float64) \
        if keep else np.zeros((0, 4))
    for j, name in enumerate(["minx", "miny", "maxx", "maxy"]):
        out[name] = pa.array(bounds[:, j])
    for name, vals in cols.items():
        out[name] = pa.array([vals[i] for i in keep])
    return ray.data.from_arrow(pa.table(out))


def write_shapefile(rings: list[np.ndarray], path: str,
                    attrs: dict[str, list] | None = None) -> None:
    """Tiny polygon .shp/.shx/.dbf/.prj writer — exists so tests can build
    real fixtures without geopandas (and as the inverse sink)."""
    base = path[:-4] if path.lower().endswith(".shp") else path
    recs = []
    gminx = gminy = np.inf
    gmaxx = gmaxy = -np.inf
    for i, ring in enumerate(rings):
        minx, miny = ring.min(axis=0)
        maxx, maxy = ring.max(axis=0)
        gminx, gminy = min(gminx, minx), min(gminy, miny)
        gmaxx, gmaxy = max(gmaxx, maxx), max(gmaxy, maxy)
        content = struct.pack("<i", SHAPE_POLYGON)
        content += struct.pack("<4d", minx, miny, maxx, maxy)
        content += struct.pack("<ii", 1, len(ring))
        content += struct.pack("<i", 0)
        content += ring.astype("<f8").tobytes()
        recs.append(struct.pack(">ii", i + 1, len(content) // 2) + content)
    body = b"".join(recs)
    header = struct.pack(">iiiiii", 9994, 0, 0, 0, 0, 0)
    header += struct.pack(">i", (100 + len(body)) // 2)
    header += struct.pack("<ii", 1000, SHAPE_POLYGON)
    header += struct.pack("<4d", gminx, gminy, gmaxx, gmaxy)
    header += struct.pack("<4d", 0, 0, 0, 0)
    with open(base + ".shp", "wb") as f:
        f.write(header + body)
    # .shx index
    shx_body = b""
    off_words = 50
    for r in recs:
        shx_body += struct.pack(">ii", off_words, (len(r) - 8) // 2)
        off_words += len(r) // 2
    with open(base + ".shx", "wb") as f:
        f.write(header[:24] + struct.pack(">i", (100 + len(shx_body)) // 2)
                + header[28:] + shx_body)
    # .dbf
    attrs = attrs or {"FID": list(range(len(rings)))}
    names = list(attrs)
    flen = 18
    fdesc = b""
    for name in names:
        fdesc += name.encode("ascii")[:10].ljust(11, b"\x00") + b"C" + b"\x00" * 4 \
            + bytes([flen, 0]) + b"\x00" * 14
    hdr_len = 32 + 32 * len(names) + 1
    rec_len = 1 + flen * len(names)
    dbf = struct.pack("<B3BIHH20x", 3, 24, 1, 1, len(rings), hdr_len, rec_len)
    dbf += fdesc + b"\x0d"
    for i in range(len(rings)):
        dbf += b" " + b"".join(
            str(attrs[nm][i]).encode("latin-1")[:flen].ljust(flen, b" ")
            for nm in names)
    with open(base + ".dbf", "wb") as f:
        f.write(dbf + b"\x1a")
    with open(base + ".prj", "w") as f:
        f.write('GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,'
                '298.257223563]],PRIMEM["Greenwich",0],UNIT["degree",'
                '0.0174532925199433],AUTHORITY["EPSG","4326"]]')
