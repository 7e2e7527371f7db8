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

    def test_cleanup(self, grid_dir, capsys):
        tiles_file = min(glob.glob(
            os.path.join(grid_dir, "luxel_partitions_aschips_*")), key=len)
        wc = os.path.join(tiles_file, "worldcoverlike")
        bad = os.path.join(wc, "corrupt.tif")
        open(bad, "wb").write(b"junk")
        cli.main(["cleanup", "--basedir", wc])
        assert not os.path.exists(bad)
        assert "removed 1 files" in capsys.readouterr().out
