"""CLI integration: each subcommand end-to-end on tmp dirs (the reference's
geet workflow, main.py:7-94, driven through our argparse surface)."""

import glob
import os

import pytest

from geetiles_ray import cli


@pytest.fixture(scope="module")
def aoi_wkt(tmp_path_factory):
    p = tmp_path_factory.mktemp("aoi") / "aoi.wkt"
    p.write_text("POLYGON ((5.8 49.45, 6.5 49.45, 6.5 49.8, 6.2 49.8, "
                 "6.2 50.1, 5.8 50.1, 5.8 49.45))")
    return str(p)


@pytest.fixture(scope="module")
def grid_dir(tmp_path_factory, aoi_wkt):
    d = str(tmp_path_factory.mktemp("out"))
    cli.main(["grid", "--aoi_wkt_file", aoi_wkt, "--chip_size_meters", "8000",
              "--aoi_name", "luxel", "--dest_dir", d])
    return d


class TestCli:
    def test_grid_writes_hash_named_tileset(self, grid_dir):
        paths = glob.glob(os.path.join(grid_dir, "luxel_partitions_aschips_*"))
        assert len(paths) == 1

    def test_download_lp_split(self, grid_dir):
        tiles_file = glob.glob(os.path.join(grid_dir, "luxel_partitions_aschips_*"))[0]
        cli.main(["download", "--tiles_file", tiles_file,
                  "--dataset_def", "worldcoverlike",
                  "--pixels_lonlat", "(20,20)"])
        dataset_dir = os.path.join(tiles_file, "worldcoverlike")
        assert os.path.exists(os.path.join(dataset_dir, ".dataset_def.py"))
        assert glob.glob(os.path.join(dataset_dir, "*.tif"))
        cli.main(["lp.compute", "--tiles_file", tiles_file,
                  "--labels_dataset_def", "worldcoverlike"])
        assert glob.glob(os.path.join(tiles_file, "worldcoverlike_proportions", "*"))
        cli.main(["split", "--tiles_file", tiles_file, "--nbands", "6",
                  "--angle", "0", "--train_pct", ".5", "--test_pct", ".3",
                  "--val_pct", ".2"])
        assert os.path.exists(tiles_file.rstrip("/") + "_splits.csv")

    def test_ingest_resume(self, tmp_path):
        dest = str(tmp_path / "ingest")
        cli.main(["ingest", "--n_pages", "5000", "--dest_dir", dest,
                  "--n_partitions", "8", "--chip_size_meters", "20000"])
        manifests = glob.glob(os.path.join(dest, "_manifest_*.json"))
        assert len(manifests) == 8
        import json
        m = json.load(open(manifests[0]))
        assert m["status"] == "done" and m["rows"] > 0 and "input_fingerprint" in m
        # resume: second run skips everything (manifests unchanged mtime)
        before = {p: os.path.getmtime(p) for p in manifests}
        cli.main(["ingest", "--n_pages", "5000", "--dest_dir", dest,
                  "--n_partitions", "8", "--chip_size_meters", "20000"])
        after = {p: os.path.getmtime(p) for p in manifests}
        assert before == after

    def test_mosaic_blockgrid(self, grid_dir):
        # shortest match = the tileset itself, not _withsplits/_splits.csv
        tiles_file = min(glob.glob(
            os.path.join(grid_dir, "luxel_partitions_aschips_*")), key=len)
        cli.main(["mosaic", "--tiles_file", tiles_file,
                  "--dataset_name", "worldcoverlike", "--block_px", "64"])
        out = os.path.join(tiles_file, "worldcoverlike_mosaic_blocks")
        assert glob.glob(os.path.join(out, "*.tif"))

    def test_mosaic_fromvals(self, tmp_path):
        import json

        fc = {"type": "FeatureCollection", "features": [
            {"type": "Feature", "properties": {"value": v},
             "geometry": {"type": "Polygon", "coordinates": [[
                 [x, 0.0], [x + 1.0, 0.0], [x + 1.0, 1.0],
                 [x, 1.0], [x, 0.0]]]}}
            for x, v in [(0.0, 2.5), (1.0, 4.5)]]}
        tf = str(tmp_path / "vals.geojson")
        json.dump(fc, open(tf, "w"))
        dest = str(tmp_path / "vals_mosaic.tif")
        cli.main(["mosaic.fromvals", "--tiles_file", tf, "--dest_file", dest,
                  "--pixels_per_degree", "20"])
        from geetiles_ray.functions import tiff

        arr, bounds, _ = tiff.read_tiff(dest)
        assert arr.shape == (20, 40, 1)
        assert sorted(set(arr.ravel().tolist())) == [2.5, 4.5]
        assert bounds == pytest.approx((0.0, 0.0, 2.0, 1.0))

    def test_aois(self, tmp_path, capsys):
        cli.main(["aois", "--showall"])
        out = capsys.readouterr().out
        assert "luxbox" in out and "luxel" in out
        dest = str(tmp_path / "luxbox.wkt")
        cli.main(["aois", "--extract", "luxbox", "--dest_file", dest])
        from geetiles_ray.functions import wkt

        ring = wkt.load_exterior(open(dest).read())
        assert ring.shape[1] == 2 and len(ring) >= 5

    def test_download_radarobslike_full_protocol(self, grid_dir, capsys):
        """The full hook chain in ONE definition through the CLI download
        verb (the reference's s1grdobs workflow, defs/s1grdobs.py:40-178):
        band-split render (SizeCapExceeded → render_bands per band set),
        on_error='nodata' dead-letter rows → .nodata sentinel files, and
        must_rewrite vetoing the skip_if_exists resume for truncated
        outputs."""
        import numpy as np

        from geetiles_ray.functions import geom, tiff
        from geetiles_ray.plugins import RadarObsLike, _tile_seed

        tiles_file = min(glob.glob(
            os.path.join(grid_dir, "luxel_partitions_aschips_*")), key=len)
        # (100,100) float32 × 3 bands = 120 kB > MAX_REQUEST_BYTES=80 kB →
        # every tile goes through the band-split path (1 band per fetch:
        # 1.5 × 40 kB padded per-band size fits, two don't)
        cli.main(["download", "--tiles_file", tiles_file,
                  "--dataset_def", "radarobslike",
                  "--pixels_lonlat", "(100,100)"])
        out = capsys.readouterr().out
        dataset_dir = os.path.join(tiles_file, "radarobslike")

        rows = cli._load_tiles(tiles_file).select_columns(
            ["identifier", "wkb"]).take_all()
        expect_nodata = {r["identifier"] for r in rows
                         if _tile_seed(r["identifier"])
                         % RadarObsLike.NODATA_MOD == 0}
        assert expect_nodata and len(expect_nodata) < len(rows)
        # dead-letter: exactly the no-observation tiles got .nodata
        # sentinels and no tif; everything else got a real tif
        got_nodata = {os.path.basename(p)[:-len(".tif.nodata")] for p in
                      glob.glob(os.path.join(dataset_dir, "*.tif.nodata"))}
        assert got_nodata == expect_nodata
        # (the metrics line is best-effort — fire-and-forget flushes may
        # land after the snapshot read — so assert the write count, which
        # the writer returns synchronously)
        assert f"wrote {len(rows) - len(expect_nodata)} tiles" in out
        for r in rows:
            tif = os.path.join(dataset_dir, r["identifier"] + ".tif")
            assert os.path.exists(tif) != (r["identifier"] in expect_nodata)

        # band-split restitch parity: the written pixels equal a direct
        # all-bands render_bands call (band order VV, VH, angle preserved)
        probe = next(r for r in rows if r["identifier"] not in expect_nodata)
        arr, _, band_names = tiff.read_tiff(
            os.path.join(dataset_dir, probe["identifier"] + ".tif"))
        assert band_names == RadarObsLike.BANDS
        plugin = RadarObsLike()
        want = plugin.render_bands(probe["identifier"],
                                   geom.wkb_to_ring(probe["wkb"]),
                                   (100, 100), RadarObsLike.BANDS)
        np.testing.assert_array_equal(arr, want.astype(np.float32))

        # must_rewrite resume: truncate one tif below MIN_COMPLETE_BYTES;
        # a second run rewrites ONLY it and skips every intact file
        victim = os.path.join(dataset_dir, probe["identifier"] + ".tif")
        open(victim, "wb").write(b"trunc")
        intact = {p: os.path.getmtime(p) for p in
                  glob.glob(os.path.join(dataset_dir, "*.tif"))
                  if p != victim}
        cli.main(["download", "--tiles_file", tiles_file,
                  "--dataset_def", "radarobslike",
                  "--pixels_lonlat", "(100,100)", "--skip_if_exists"])
        assert "wrote 1 tiles" in capsys.readouterr().out
        assert os.path.getsize(victim) > RadarObsLike.MIN_COMPLETE_BYTES
        arr2, _, _ = tiff.read_tiff(victim)
        np.testing.assert_array_equal(arr2, want.astype(np.float32))
        assert {p: os.path.getmtime(p) for p in intact} == intact

    def test_cleanup(self, grid_dir, capsys):
        tiles_file = min(glob.glob(
            os.path.join(grid_dir, "luxel_partitions_aschips_*")), key=len)
        wc = os.path.join(tiles_file, "worldcoverlike")
        bad = os.path.join(wc, "corrupt.tif")
        open(bad, "wb").write(b"junk")
        cli.main(["cleanup", "--basedir", wc])
        assert not os.path.exists(bad)
        assert "removed 1 files" in capsys.readouterr().out
