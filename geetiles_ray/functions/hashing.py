"""Deterministic content hashes for tiles and tilesets.

Reproduces the reference identifier algorithm bit-for-bit
(/root/reference/geetiles/utils.py:232-250):

    s = str(np.r_[region.envelope.boundary.coords].round(5))
    k = int(sha256(s).hexdigest(), 16) % 10**15
    identifier = hex(k)[2:].zfill(13)

The "envelope boundary coords" of a polygon are the 5 corner points of its
axis-aligned bounding box, starting at (minx, miny) and travelling
counter-clockwise, closing back at (minx, miny) — GEOS envelope ring order.

The string form is numpy's default ``str()`` of an (N, 2) float64 array under
default printoptions; we pin printoptions explicitly so the hash is stable
regardless of caller configuration.
"""

from __future__ import annotations

import hashlib

import numpy as np

_PRINT_OPTS = dict(
    precision=8, suppress=False, floatmode="maxprec", threshold=1000,
    edgeitems=3, linewidth=75, sign="-",
)


def envelope_boundary_coords(minx: float, miny: float, maxx: float, maxy: float) -> np.ndarray:
    """5 closed-ring corner points of the bbox, GEOS envelope order (CCW from
    (minx,miny)). Matches shapely ``polygon.envelope.boundary.coords``."""
    return np.array(
        [[minx, miny], [maxx, miny], [maxx, maxy], [minx, maxy], [minx, miny]],
        dtype=np.float64,
    )


def region_hash_from_bounds(minx: float, miny: float, maxx: float, maxy: float) -> str:
    """Identifier of a geometry from its bounds (utils.py:232-240 parity)."""
    coords = envelope_boundary_coords(minx, miny, maxx, maxy)
    with np.printoptions(**_PRINT_OPTS):
        s = str(coords.round(5))
    k = int(hashlib.sha256(s.encode("utf-8")).hexdigest(), 16) % 10**15
    return hex(k)[2:].zfill(13)


def region_hash(coords: np.ndarray) -> str:
    """Identifier of a polygon given its exterior ring coords (N,2)."""
    c = np.asarray(coords, dtype=np.float64)
    return region_hash_from_bounds(
        c[:, 0].min(), c[:, 1].min(), c[:, 0].max(), c[:, 1].max()
    )


def region_hashes_from_bounds_arrays(
    minx: np.ndarray, miny: np.ndarray, maxx: np.ndarray, maxy: np.ndarray
) -> np.ndarray:
    """Vectorized-over-rows identifier computation (hashlib per row; the
    string formatting dominates, ~3 us/row — fine inside map_batches)."""
    n = len(minx)
    out = np.empty(n, dtype=object)
    for i in range(n):
        out[i] = region_hash_from_bounds(minx[i], miny[i], maxx[i], maxy[i])
    return out


def regionlist_hash(identifiers) -> str:
    """Order-dependent hash of a sequence of tile identifiers
    (utils.py:242-250 parity): sha256 of space-joined per-region hashes.

    NB ordering matters — callers must pass identifiers in tileset row
    order (the reference hashes in file order; we sort by a stable key
    before calling this, see tileset.py).
    """
    s = " ".join(identifiers)
    k = int(hashlib.sha256(s.encode("utf-8")).hexdigest(), 16) % 10**15
    return hex(k)[2:].zfill(13)
