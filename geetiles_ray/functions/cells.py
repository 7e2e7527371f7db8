"""H3/S2-style spatial cell index, pure numpy, deterministic.

A uint64 Morton (Z-order) cell id over equal-angle lon/lat bins:
resolution ``r`` divides the world into 2^r × 2^r cells (lon spans 360°,
lat 180°); the id interleaves the lon/lat bin bits and stores the
resolution in the top 6 bits so ids from different resolutions never
collide. This plays the role H3 plays in the north rule: the shuffle /
co-location key for page→tile assignment and spatial joins
(BASELINE.json north_star; SURVEY.md §2.4 graft row).

Why not real H3/S2: neither library exists in this environment; an
equal-angle Morton grid preserves the properties the engine needs —
deterministic point→cell, cheap cell-range covers of bboxes, spatial
locality of nearby ids (good for range partitioning) — with ~30 lines.
"""

from __future__ import annotations

import numpy as np

MAX_RES = 28  # 2^28 bins per axis ≈ 1.3e-6 deg ≈ 0.15 m at the equator


def _part1by1(x: np.ndarray) -> np.ndarray:
    """Spread the low 28 bits of x so there is a 0 bit between each."""
    x = x.astype(np.uint64) & np.uint64(0x0FFFFFFF)
    x = (x | (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
    return x


def _compact1by1(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64) & np.uint64(0x5555555555555555)
    x = (x | (x >> np.uint64(1))) & np.uint64(0x3333333333333333)
    x = (x | (x >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x >> np.uint64(16))) & np.uint64(0x0FFFFFFF)
    return x


def lonlat_bins(lon, lat, res: int) -> tuple[np.ndarray, np.ndarray]:
    n = np.uint64(1) << np.uint64(res)
    fx = (np.asarray(lon, dtype=np.float64) + 180.0) / 360.0
    fy = (np.asarray(lat, dtype=np.float64) + 90.0) / 180.0
    bx = np.clip((fx * float(n)).astype(np.int64), 0, int(n) - 1).astype(np.uint64)
    by = np.clip((fy * float(n)).astype(np.int64), 0, int(n) - 1).astype(np.uint64)
    return bx, by


def cell_of(lon, lat, res: int) -> np.ndarray:
    """Vectorized point → cell id at resolution ``res`` (0..28)."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in [0, {MAX_RES}]")
    bx, by = lonlat_bins(lon, lat, res)
    morton = _part1by1(bx) | (_part1by1(by) << np.uint64(1))
    return (np.uint64(res) << np.uint64(58)) | morton


def cell_bounds(cell_id, res: int | None = None):
    """Cell id(s) → (minlon, minlat, maxlon, maxlat) arrays."""
    cid = np.asarray(cell_id, dtype=np.uint64)
    r = (cid >> np.uint64(58)).astype(np.int64) if res is None else np.full(cid.shape, res)
    morton = cid & ((np.uint64(1) << np.uint64(58)) - np.uint64(1))
    bx = _compact1by1(morton).astype(np.float64)
    by = _compact1by1(morton >> np.uint64(1)).astype(np.float64)
    n = np.power(2.0, r.astype(np.float64))
    minlon = bx / n * 360.0 - 180.0
    minlat = by / n * 180.0 - 90.0
    return minlon, minlat, minlon + 360.0 / n, minlat + 180.0 / n


def cells_covering_bbox(minx: float, miny: float, maxx: float, maxy: float, res: int) -> np.ndarray:
    """All cell ids at ``res`` whose cells intersect the bbox. Used to map a
    tile polygon to its candidate cells for the cell-equi-join path."""
    n = np.uint64(1) << np.uint64(res)
    bx0, by0 = lonlat_bins(minx, miny, res)
    bx1, by1 = lonlat_bins(np.nextafter(maxx, -np.inf), np.nextafter(maxy, -np.inf), res)
    bx1 = np.maximum(bx0, bx1)
    by1 = np.maximum(by0, by1)
    xs = np.arange(int(bx0), int(bx1) + 1, dtype=np.uint64)
    ys = np.arange(int(by0), int(by1) + 1, dtype=np.uint64)
    gx, gy = np.meshgrid(xs, ys)
    morton = _part1by1(gx.ravel()) | (_part1by1(gy.ravel()) << np.uint64(1))
    return (np.uint64(res) << np.uint64(58)) | morton


def pick_resolution(tile_span_deg: float) -> int:
    """Smallest resolution whose cell is still >= the tile span, so each tile
    maps to at most ~4 cells (tiles are smaller than or comparable to cells)."""
    for r in range(MAX_RES, -1, -1):
        if 360.0 / (1 << r) >= tile_span_deg:
            return r
    return 0
