"""Concave hull (alpha-shape) — pure-numpy reimplementation of the
reference's boundary surface (utils.py:45-92: ``concave_hull`` =
alphashape(points, 1.0) over flattened geometry boundary coords;
``get_boundary`` = chunked hulls-of-hulls over a tileset).

No scipy/shapely in this environment, so the Delaunay triangulation is a
Bowyer–Watson incremental build (O(n·t), fine for the ≤ a few thousand
boundary points per chunk the reference feeds alphashape — it splits
tilesets into 1000-geometry chunks for exactly this reason,
utils.py:81-86). The alpha filter keeps triangles with circumradius
< 1/alpha (the alphashape library's criterion); boundary edges (used by
exactly one kept triangle) are stitched into closed rings.

Driver-side by design, like the reference: the hull is a lazy whole-
tileset attribute computed from a bounded point set (chunk hulls first,
then a hull of the chunk-hull points), not a per-row transform.
"""

from __future__ import annotations

import numpy as np


def _circumcircle(a: np.ndarray, b: np.ndarray, c: np.ndarray):
    """(center, radius²) of triangle abc's circumcircle; degenerate →
    (None, inf)."""
    d = 2.0 * (a[0] * (b[1] - c[1]) + b[0] * (c[1] - a[1])
               + c[0] * (a[1] - b[1]))
    if abs(d) < 1e-300:
        return None, np.inf
    a2 = a[0] ** 2 + a[1] ** 2
    b2 = b[0] ** 2 + b[1] ** 2
    c2 = c[0] ** 2 + c[1] ** 2
    ux = (a2 * (b[1] - c[1]) + b2 * (c[1] - a[1]) + c2 * (a[1] - b[1])) / d
    uy = (a2 * (c[0] - b[0]) + b2 * (a[0] - c[0]) + c2 * (b[0] - a[0])) / d
    center = np.array([ux, uy])
    r2 = ((a - center) ** 2).sum()
    return center, r2


def delaunay(points: np.ndarray) -> list[tuple[int, int, int]]:
    """Bowyer–Watson Delaunay triangulation. Returns index triples into
    ``points``. Duplicated points must be removed by the caller."""
    pts = np.asarray(points, dtype=np.float64)
    n = len(pts)
    if n < 3:
        return []
    # super-triangle enclosing all points
    cx, cy = pts[:, 0].mean(), pts[:, 1].mean()
    span = max(pts[:, 0].ptp(), pts[:, 1].ptp(), 1e-9) * 100.0
    sup = np.array([[cx - 2 * span, cy - span], [cx + 2 * span, cy - span],
                    [cx, cy + 2 * span]])
    allp = np.vstack([pts, sup])
    tris: list[tuple[int, int, int]] = [(n, n + 1, n + 2)]
    centers = [_circumcircle(allp[n], allp[n + 1], allp[n + 2])]

    for i in range(n):
        p = allp[i]
        # triangles whose circumcircle contains p (vectorized over tris)
        cs = np.array([c[0] if c[0] is not None else [np.inf, np.inf]
                       for c in centers])
        r2 = np.array([c[1] for c in centers])
        bad_mask = ((p[None, :] - cs) ** 2).sum(axis=1) < r2
        bad = np.nonzero(bad_mask)[0]
        if len(bad) == 0:
            continue
        # polygonal hole boundary = edges of bad triangles not shared twice
        edge_count: dict[tuple[int, int], int] = {}
        for t in bad:
            a, b, c = tris[t]
            for e in ((a, b), (b, c), (c, a)):
                k = (min(e), max(e))
                edge_count[k] = edge_count.get(k, 0) + 1
        hole = [e for e, cnt in edge_count.items() if cnt == 1]
        keep = [j for j in range(len(tris)) if not bad_mask[j]]
        tris = [tris[j] for j in keep]
        centers = [centers[j] for j in keep]
        for (a, b) in hole:
            tris.append((a, b, i))
            centers.append(_circumcircle(allp[a], allp[b], allp[i]))
    # drop triangles touching the super-triangle
    return [t for t in tris if max(t) < n]


def alpha_shape(points: np.ndarray, alpha: float = 1.0) -> list[np.ndarray]:
    """Alpha-shape of a point set: Delaunay triangles with circumradius
    < 1/alpha, boundary edges stitched into closed rings. Returns a list
    of closed (N, 2) rings (outer boundaries and holes; disjoint regions
    give several rings), largest-area first. Falls back to the convex
    hull (alpha → 0) when the filter would eat everything — the
    alphashape library returns an empty polygon there, which no caller of
    the reference ever wants for a real tileset."""
    pts = np.unique(np.asarray(points, dtype=np.float64), axis=0)
    if len(pts) < 3:
        return []
    tris = delaunay(pts)
    if not tris:
        return []
    rmax2 = (1.0 / alpha) ** 2 if alpha > 0 else np.inf
    kept = [t for t in tris
            if _circumcircle(pts[t[0]], pts[t[1]], pts[t[2]])[1] < rmax2]
    if not kept:
        kept = tris  # convex-hull fallback
    # boundary edges: used by exactly one kept triangle
    edge_count: dict[tuple[int, int], int] = {}
    for a, b, c in kept:
        for e in ((a, b), (b, c), (c, a)):
            k = (min(e), max(e))
            edge_count[k] = edge_count.get(k, 0) + 1
    boundary = [e for e, cnt in edge_count.items() if cnt == 1]
    # stitch edges into cycles
    adj: dict[int, list[int]] = {}
    for a, b in boundary:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    seen_e: set[tuple[int, int]] = set()
    rings: list[np.ndarray] = []
    for a0, b0 in boundary:
        if (a0, b0) in seen_e:
            continue
        cycle = [a0, b0]
        seen_e.add((a0, b0))
        cur, prev = b0, a0
        while True:
            nxts = [v for v in adj[cur]
                    if (min(cur, v), max(cur, v)) not in seen_e]
            if not nxts:
                break
            nxt = nxts[0]
            seen_e.add((min(cur, nxt), max(cur, nxt)))
            if nxt == cycle[0]:
                break
            cycle.append(nxt)
            prev, cur = cur, nxt
        if len(cycle) >= 3:
            ring = pts[np.array(cycle)]
            rings.append(np.vstack([ring, ring[:1]]))
    from . import geom as geommod

    rings.sort(key=lambda r: -geommod.shoelace_area(r))
    return rings


def concave_hull(rings: list[np.ndarray], alpha: float = 1.0) -> list[np.ndarray]:
    """Reference ``concave_hull`` (utils.py:44-68): pool every boundary
    coordinate of the input rings (multipart inputs should be flattened to
    rings by the caller — utils.flatten_geom analogue) and alpha-shape
    them."""
    coords = np.vstack([np.asarray(r, dtype=np.float64) for r in rings])
    return alpha_shape(coords, alpha)


def get_boundary(rings: list[np.ndarray], alpha: float = 1.0,
                 chunk: int = 1000) -> list[np.ndarray]:
    """Reference ``get_boundary`` (utils.py:70-92): chunk the tileset's
    rings (1000 per chunk), concave-hull each chunk, then concave-hull
    the chunk hulls. Bounds the per-triangulation point count no matter
    the tileset size; the chunk pass is embarrassingly parallel if ever
    needed (driver-side here, as in the reference)."""
    hulls: list[np.ndarray] = []
    for i in range(0, len(rings), chunk):
        hulls.extend(concave_hull(rings[i:i + chunk], alpha))
    if not hulls:
        return []
    return concave_hull(hulls, alpha)
