"""Unit tests for the pure-numpy core: hashing, CRS, geometry, cells."""

import hashlib

import numpy as np
import pytest

from geetiles_ray.functions import cells, crs, geom, hashing


class TestHashing:
    def test_reference_formula_parity(self):
        """Reproduce the reference algorithm literally (utils.py:232-240):
        str(round(envelope_coords, 5)) → sha256 → mod 10^15 → 13-hex."""
        coords = hashing.envelope_boundary_coords(5.8, 49.4, 6.6, 50.2)
        s = str(coords.round(5))
        k = int(hashlib.sha256(s.encode("utf-8")).hexdigest(), 16) % 10**15
        expect = hex(k)[2:].zfill(13)
        assert hashing.region_hash_from_bounds(5.8, 49.4, 6.6, 50.2) == expect
        assert len(expect) == 13

    def test_hash_independent_of_ring_start(self):
        r1 = geom.box_ring(0, 0, 2, 1)
        r2 = np.roll(r1[:-1], 2, axis=0)
        r2 = np.vstack([r2, r2[:1]])
        assert hashing.region_hash(r1) == hashing.region_hash(r2)

    def test_regionlist_hash_order_dependent(self):
        assert hashing.regionlist_hash(["a", "b"]) != hashing.regionlist_hash(["b", "a"])

    def test_stability_golden(self):
        # frozen goldens: a changed hash algorithm breaks tile-id parity
        assert hashing.region_hash_from_bounds(0, 0, 2, 1) == "1ba4ff2790dca"
        assert hashing.regionlist_hash(["abc", "def"]) == "05b6d02f79f62"


class TestCRS:
    def test_known_anchor(self):
        # UTM zone 31 at (0E, 0N): published easting 166021.443 m
        e, n = crs.lonlat_to_utm(0.0, 0.0, 31, True)
        assert abs(e - 166021.443) < 0.01
        assert abs(n) < 1e-6

    def test_central_meridian_scale(self):
        # on the central meridian, easting = 500000 and northing ≈ k0 * arc length
        e, _ = crs.lonlat_to_utm(9.0, 45.0, 32, True)
        assert abs(e - 500000.0) < 1e-6

    def test_roundtrip(self):
        rng = np.random.default_rng(42)
        lon = rng.uniform(5.0, 8.0, 1000)
        lat = rng.uniform(-80, 84, 1000)
        e, n = crs.lonlat_to_utm(lon, lat, 31, True)
        lon2, lat2 = crs.utm_to_lonlat(e, n, 31, True)
        np.testing.assert_allclose(lon2, lon, atol=1e-11)
        np.testing.assert_allclose(lat2, lat, atol=1e-11)

    def test_southern_hemisphere(self):
        e, n = crs.lonlat_to_utm(-58.4, -34.6, 21, False)  # Buenos Aires zone 21S
        assert 0 < n < 10_000_000
        lon2, lat2 = crs.utm_to_lonlat(e, n, 21, False)
        assert abs(lon2 - -58.4) < 1e-9 and abs(lat2 - -34.6) < 1e-9

    def test_zone_lookup(self):
        assert crs.utm_epsg(6.13, 49.61) == 32632
        assert crs.utm_epsg(-58.4, -34.6) == 32721


class TestGeom:
    def test_wkb_roundtrip(self):
        r = geom.box_ring(1.5, -2.0, 3.25, 4.0)
        np.testing.assert_array_equal(geom.wkb_to_ring(geom.ring_to_wkb(r)), r)

    def test_shoelace(self):
        assert geom.shoelace_area(geom.box_ring(0, 0, 2, 3)) == 6.0

    def test_pip(self):
        L = np.array([[0, 0], [3, 0], [3, 1], [1, 1], [1, 3], [0, 3], [0, 0]], float)
        px = np.array([0.5, 2.0, 2.0, 0.5])
        py = np.array([0.5, 0.5, 2.0, 2.0])
        np.testing.assert_array_equal(
            geom.points_in_ring(px, py, L), [True, True, False, True])

    def test_clip_concave(self):
        L = np.array([[0, 0], [3, 0], [3, 1], [1, 1], [1, 3], [0, 3], [0, 0]], float)
        assert geom.box_clip_area(L, 0.5, 0.5, 2.5, 2.5) == pytest.approx(1.75)
        assert geom.clip_ring_to_box(L, 10, 10, 11, 11) is None

    def test_intersection_area_box_vs_concave(self):
        L = np.array([[0, 0], [3, 0], [3, 1], [1, 1], [1, 3], [0, 3], [0, 0]], float)
        box = geom.box_ring(0.5, 0.5, 2.5, 2.5)
        assert geom.intersection_area(box, L) == pytest.approx(1.75)

    def test_convex_clip(self):
        tri = np.array([[0, 0], [4, 0], [0, 4], [0, 0]], float)
        assert geom._convex_clip_area(tri, geom.box_ring(1, 1, 3, 3)) == pytest.approx(2.0)

    def test_triangulate_partition(self):
        # triangles of a concave ring must partition it: areas sum exactly
        U = np.array([[0, 0], [5, 0], [5, 4], [4, 4], [4, 1], [1, 1],
                      [1, 4], [0, 4], [0, 0]], float)
        tris = geom.triangulate_ring(U)
        assert sum(geom.shoelace_area(np.vstack([t, t[:1]])) for t in tris) \
            == pytest.approx(geom.shoelace_area(U))

    @staticmethod
    def _raster_overlap(a, b, n=800):
        minx = min(a[:, 0].min(), b[:, 0].min())
        maxx = max(a[:, 0].max(), b[:, 0].max())
        miny = min(a[:, 1].min(), b[:, 1].min())
        maxy = max(a[:, 1].max(), b[:, 1].max())
        xs = np.linspace(minx, maxx, n)
        ys = np.linspace(miny, maxy, n)
        gx, gy = np.meshgrid(xs, ys)
        px, py = gx.ravel(), gy.ravel()
        ina = geom.points_in_ring(px, py, a)
        inb = geom.points_in_ring(px, py, b)
        cell = ((maxx - minx) / (n - 1)) * ((maxy - miny) / (n - 1))
        return (ina & inb).sum() * cell

    def test_concave_concave_intersection_vs_raster(self):
        # L-shape vs U-shape (both concave) — exact area must agree with a
        # brute-force rasterized estimate within grid resolution
        L = np.array([[0, 0], [3, 0], [3, 1], [1, 1], [1, 3], [0, 3],
                      [0, 0]], float)
        U = np.array([[-0.5, -0.5], [3.5, -0.5], [3.5, 2.5], [2.5, 2.5],
                      [2.5, 0.5], [0.5, 0.5], [0.5, 2.5], [-0.5, 2.5],
                      [-0.5, -0.5]], float)
        exact = geom.intersection_area(L, U)
        approx = self._raster_overlap(L, U)
        assert exact == pytest.approx(approx, rel=0.02)
        # symmetry
        assert geom.intersection_area(U, L) == pytest.approx(exact)

    def test_alpha_shape_excludes_notch(self):
        from geetiles_ray.functions import hull
        xs, ys = np.meshgrid(np.linspace(0, 4, 17), np.linspace(0, 4, 17))
        pts = np.column_stack([xs.ravel(), ys.ravel()])
        pts = pts[~((pts[:, 0] > 2) & (pts[:, 1] > 2))]  # L-shape cloud
        rings = hull.alpha_shape(pts, alpha=1.0)
        assert len(rings) >= 1
        r = rings[0]
        area = geom.shoelace_area(r)
        assert 11.0 < area < 13.5          # L ≈ 12; convex hull would be 14
        assert not geom.points_in_ring(
            np.array([3.2]), np.array([3.2]), r)[0]   # notch excluded
        x, y = pts[:, 0], pts[:, 1]
        arm = ((x > 0.3) & (x < 3.7) & (y > 0.3) & (y < 1.7)) \
            | ((x > 0.3) & (x < 1.7) & (y > 0.3) & (y < 3.7))
        inner = pts[arm]  # strictly interior to the L's arms
        assert geom.points_in_ring(inner[:, 0], inner[:, 1], r).all()

    def test_alpha_shape_convex_fallback(self):
        from geetiles_ray.functions import hull
        # 3 far-apart points: every triangle fails alpha=1 → convex fallback
        pts = np.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0]])
        rings = hull.alpha_shape(pts, alpha=1.0)
        assert len(rings) == 1
        assert geom.shoelace_area(rings[0]) == pytest.approx(50.0)

    def test_tileset_region(self):
        from geetiles_ray.sources import tileset as tsmod
        from geetiles_ray.functions import hull  # noqa: F401
        import ray.data
        from geetiles_ray.pipelines import flagship
        tiles = flagship.build_fixture_tileset(5000.0)
        rings = tsmod.tileset_region(tiles, alpha=1.0)
        assert len(rings) >= 1
        boundary = rings[0]
        df = tiles.to_pandas()
        # every tile center must be inside (or on) the tileset boundary
        inside = geom.points_in_ring(df.clon.to_numpy(), df.clat.to_numpy(),
                                     boundary)
        assert inside.mean() > 0.98
        # hull area is at least the summed covered area (in degrees²,
        # compare against bbox-sum proxy) and not absurdly larger
        hull_area = geom.shoelace_area(boundary)
        covered = ((df.maxx - df.minx) * (df.maxy - df.miny)).sum()
        assert hull_area >= 0.9 * covered
        assert hull_area <= 2.0 * covered

    def test_concave_concave_disjoint_and_contained(self):
        L = np.array([[0, 0], [3, 0], [3, 1], [1, 1], [1, 3], [0, 3],
                      [0, 0]], float)
        far = L + np.array([100.0, 100.0])
        assert geom.intersection_area(L, far) == pytest.approx(0.0)
        # small concave ring fully inside the L's bottom arm
        small = np.array([[0.2, 0.2], [2.8, 0.2], [2.8, 0.8], [1.5, 0.8],
                          [1.5, 0.6], [0.4, 0.6], [0.4, 0.8], [0.2, 0.8],
                          [0.2, 0.2]], float)
        assert geom.intersection_area(L, small) == pytest.approx(
            geom.shoelace_area(small))

    def test_centroids(self):
        r = geom.box_ring(0, 0, 2, 4)
        assert geom.ring_centroid(r) == (1.0, 2.0)
        assert geom.envelope_centroid(r) == (0.8, 1.6)  # closing point double-counted,
        # exactly as the reference's envelope-boundary mean (partitions.py:323)


class TestCells:
    def test_roundtrip_bounds(self):
        lon, lat = 6.13, 49.61
        cid = cells.cell_of(lon, lat, 12)
        minlon, minlat, maxlon, maxlat = cells.cell_bounds(cid)
        assert minlon <= lon < maxlon and minlat <= lat < maxlat

    def test_vectorized_matches_scalar(self):
        rng = np.random.default_rng(0)
        lon = rng.uniform(-180, 180, 200)
        lat = rng.uniform(-90, 90, 200)
        vec = cells.cell_of(lon, lat, 9)
        for i in range(0, 200, 37):
            assert cells.cell_of(lon[i], lat[i], 9) == vec[i]

    def test_cover_contains_point_cell(self):
        cov = set(cells.cells_covering_bbox(5.9, 49.4, 6.5, 50.2, 10).tolist())
        assert int(cells.cell_of(6.1, 49.8, 10)) in cov

    def test_resolutions_disjoint(self):
        c1 = cells.cell_of(0.0, 0.0, 5)
        c2 = cells.cell_of(0.0, 0.0, 6)
        assert c1 != c2

    def test_pick_resolution(self):
        r = cells.pick_resolution(0.05)
        assert 360.0 / (1 << r) >= 0.05 > 360.0 / (1 << (r + 1))


class TestGeomProperties:
    """Property-based checks (hypothesis) over random star-shaped simple
    polygons — symmetry, self-intersection identity, triangulation
    partition, and box-clip consistency of the pure-numpy geometry core."""

    @staticmethod
    def _star(seed, n=None, cx=0.0, cy=0.0):
        rng = np.random.default_rng(seed)
        n = n or int(rng.integers(4, 12))
        # jittered evenly-spaced angles: strictly increasing, every gap
        # < pi, winds once around the center → the star polygon is simple
        # for ANY radii (a free-sorted-angles generator is NOT — a >pi
        # angular gap lets the closing chord cross the chain)
        ang = 2 * np.pi * (np.arange(n) + rng.uniform(0.05, 0.95, n)) / n
        rad = rng.uniform(0.5, 2.0, n)
        ring = np.column_stack([cx + rad * np.cos(ang),
                                cy + rad * np.sin(ang)])
        return np.vstack([ring, ring[:1]])

    def test_self_intersection_is_area(self):
        from hypothesis import given, settings, strategies as st

        @settings(max_examples=30, deadline=None)
        @given(st.integers(0, 10_000))
        def check(seed):
            a = self._star(seed)
            assert geom.intersection_area(a, a) == pytest.approx(
                geom.shoelace_area(a), rel=1e-9)

        check()

    def test_symmetry_and_bounds(self):
        from hypothesis import given, settings, strategies as st

        @settings(max_examples=30, deadline=None)
        @given(st.integers(0, 10_000), st.integers(0, 10_000),
               st.floats(-1.5, 1.5), st.floats(-1.5, 1.5))
        def check(s1, s2, dx, dy):
            a = self._star(s1)
            b = self._star(s2, cx=dx, cy=dy)
            ab = geom.intersection_area(a, b)
            ba = geom.intersection_area(b, a)
            assert ab == pytest.approx(ba, rel=1e-6, abs=1e-9)
            assert -1e-9 <= ab <= min(geom.shoelace_area(a),
                                      geom.shoelace_area(b)) + 1e-9

        check()

    def test_triangulation_partitions_area(self):
        from hypothesis import given, settings, strategies as st

        @settings(max_examples=30, deadline=None)
        @given(st.integers(0, 10_000))
        def check(seed):
            a = self._star(seed)
            tris = geom.triangulate_ring(a)
            total = sum(geom.shoelace_area(np.vstack([t, t[:1]]))
                        for t in tris)
            assert total == pytest.approx(geom.shoelace_area(a), rel=1e-9)

        check()

    def test_clip_to_own_bbox_is_identity(self):
        from hypothesis import given, settings, strategies as st

        @settings(max_examples=30, deadline=None)
        @given(st.integers(0, 10_000))
        def check(seed):
            a = self._star(seed)
            minx, miny, maxx, maxy = geom.bounds(a)
            assert geom.box_clip_area(a, minx, miny, maxx, maxy) == \
                pytest.approx(geom.shoelace_area(a), rel=1e-9)

        check()
