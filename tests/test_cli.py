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
